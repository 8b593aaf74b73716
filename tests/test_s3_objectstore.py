"""Real-S3-API execution of the pipeline's object-store surface
(VERDICT r9 directive #5's achievable half).

A live local S3-compatible endpoint (``moto.server`` — one of the two
endpoints the directive names) serves real HTTP; S3ObjectStore drives
the reference's Lambda-side S3 operations against it: streaming upload
(data_downloader.py:13-42), tag-predicate unprocessed listing + mark
(s3_operations.py:13-56), copy+delete archive (s3_operations.py:58-72),
and the ``{action:...}`` event protocol (s3_operations.py:97-115). This
converts that surface from "posture-tested" to "run".

The OTHER half — Spark's own s3a:// write — is environment-blocked,
and the blocker is pinned here as a test
(test_s3a_blocker_is_the_missing_jar): pyspark 4.1.2 ships no
hadoop-aws jar, none exists on disk, and the sandbox has no outbound
network to fetch one, so S3AFileSystem can't load even with a live
endpoint configured. If a future environment gains the jar, that test
FAILS LOUDLY with instructions to run the real AtomicPartitionedTable
s3a e2e instead (ARCHITECTURE.md §"Object-store execution").
"""

from __future__ import annotations

import json

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")

from serverless_etl_aws_spark.pipeline.objectstore import S3ObjectStore


@pytest.fixture(scope="module")
def s3_endpoint():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    yield f"http://127.0.0.1:{port}"
    server.stop()


@pytest.fixture()
def store(s3_endpoint):
    client = boto3.client(
        "s3",
        endpoint_url=s3_endpoint,
        aws_access_key_id="test",
        aws_secret_access_key="test",
        region_name="us-east-1",
    )
    bucket = "etl-bronze"
    client.create_bucket(Bucket=bucket)
    st = S3ObjectStore(bucket, client)
    yield st
    # empty the bucket so each test starts clean
    for key in st.list():
        client.delete_object(Bucket=bucket, Key=key)
    client.delete_bucket(Bucket=bucket)


def test_put_get_head_roundtrip(store):
    key = "nyc_taxi/yellow_taxi_2026-06_20260815_120000.parquet"
    store.put(key, b"\x00\x01parquetish")
    assert store.exists(key)
    assert not store.exists("nyc_taxi/nope.parquet")
    assert store.get(key) == b"\x00\x01parquetish"


def test_unprocessed_listing_and_tagging(store):
    """Reference: get_unprocessed_files + mark_file_processed
    (s3_operations.py:13-56) — tag-predicate state over real tags."""
    store.put("bronze/a.parquet", b"a")
    store.put("bronze/b.parquet", b"b")
    store.put("other/c.parquet", b"c")
    assert store.get_unprocessed("bronze/") == [
        "bronze/a.parquet", "bronze/b.parquet",
    ]
    store.mark_processed("bronze/a.parquet")
    assert store.is_processed("bronze/a.parquet")
    assert not store.is_processed("bronze/b.parquet")
    assert store.get_unprocessed("bronze/") == ["bronze/b.parquet"]
    # marking is idempotent
    store.mark_processed("bronze/a.parquet")
    assert store.get_unprocessed("bronze/") == ["bronze/b.parquet"]


def test_archive_is_copy_then_delete(store):
    """Reference: archive_file (s3_operations.py:58-72) — but the full
    source prefix is preserved under archive/ (the reference flattens
    to the basename, so a/x then b/x silently collide; ADVICE r10)."""
    store.put("bronze/x.parquet", b"payload")
    dest = store.archive("bronze/x.parquet")
    assert dest == "archive/bronze/x.parquet"
    assert not store.exists("bronze/x.parquet")
    assert store.get("archive/bronze/x.parquet") == b"payload"


def test_archive_same_basename_does_not_collide(store):
    """The basename-collision class the prefix-preserving dest fixes:
    archiving a/x.parquet then b/x.parquet must keep BOTH payloads."""
    store.put("a/x.parquet", b"from-a")
    store.put("b/x.parquet", b"from-b")
    assert store.archive("a/x.parquet") == "archive/a/x.parquet"
    assert store.archive("b/x.parquet") == "archive/b/x.parquet"
    assert store.get("archive/a/x.parquet") == b"from-a"
    assert store.get("archive/b/x.parquet") == b"from-b"


def test_exists_reraises_non_404_client_errors(store):
    """ADVICE r10: a 403/throttle/5xx from HEAD must NOT read as
    "object absent" — only genuine not-found maps to False."""
    from botocore.exceptions import ClientError

    class Denied:
        exceptions = store.client.exceptions

        def head_object(self, **kw):
            raise ClientError(
                {"Error": {"Code": "403", "Message": "AccessDenied"},
                 "ResponseMetadata": {"HTTPStatusCode": 403}},
                "HeadObject",
            )

    from serverless_etl_aws_spark.pipeline.objectstore import S3ObjectStore

    broken = S3ObjectStore(store.bucket, Denied())
    import pytest as _pytest

    with _pytest.raises(ClientError):
        broken.exists("any/key")


def test_event_protocol_envelopes(store):
    """Reference: the s3_operations handler's routing + envelope shape
    (s3_operations.py:97-115)."""
    store.put("bronze/e.parquet", b"e")

    resp = store.handle({"action": "get_unprocessed", "prefix": "bronze/"})
    assert resp["statusCode"] == 200
    assert json.loads(resp["body"]) == {"files": ["bronze/e.parquet"]}

    resp = store.handle({"action": "mark_processed", "key": "bronze/e.parquet"})
    assert resp["statusCode"] == 200
    assert store.is_processed("bronze/e.parquet")

    resp = store.handle({"action": "archive", "key": "bronze/e.parquet"})
    assert resp["statusCode"] == 200
    assert json.loads(resp["body"]) == {"archived_to": "archive/bronze/e.parquet"}

    assert store.handle({"action": "explode"})["statusCode"] == 400
    assert store.handle({"action": "archive"})["statusCode"] == 400


def test_listing_paginates_past_1000(store):
    """The reference's single list_objects_v2 call silently truncates at
    1000 keys; the adapter must paginate (a real-bucket correctness
    fix, exercised against the real protocol's ContinuationToken)."""
    for i in range(1005):
        store.put(f"many/{i:04d}", b"")
    assert len(store.list("many/")) == 1005


def test_fetch_upload_lineage_key(store):
    """The downloader flow end-to-end against the store: fetched bytes
    land under the reference's lineage key pattern
    (data_downloader.py:31-32) — the S3 twin of
    fetch.download_to_landing's local-dir behavior."""
    from datetime import datetime, timezone

    ym = "2026-06"
    now = datetime(2026, 8, 15, 12, 0, 0, tzinfo=timezone.utc)
    key = f"nyc_taxi/yellow_taxi_{ym}_{now.strftime('%Y%m%d_%H%M%S')}.parquet"
    store.put(key, b"fetched-bytes")
    assert store.get_unprocessed("nyc_taxi/") == [key]
    assert store.get(key) == b"fetched-bytes"


def test_s3a_blocker_is_the_missing_jar(spark, s3_endpoint):
    """Pin the CONCRETE blocker for the real s3a:// write: with a live
    S3 endpoint configured, Spark's failure is ClassNotFoundException
    for S3AFileSystem — i.e. the hadoop-aws jar, not the endpoint, not
    credentials, not the engine. If this test ever fails because the
    write SUCCEEDS, the environment gained the jar: replace this pin
    with the real AtomicPartitionedTable-over-s3a e2e
    (ARCHITECTURE.md §"Object-store execution" has the recipe)."""
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    saved = {
        k: hc.get(k)
        for k in (
            "fs.s3a.endpoint", "fs.s3a.access.key", "fs.s3a.secret.key",
            "fs.s3a.path.style.access", "fs.s3a.impl",
            "fs.s3a.impl.disable.cache",
        )
    }
    hc.set("fs.s3a.endpoint", s3_endpoint)
    hc.set("fs.s3a.access.key", "test")
    hc.set("fs.s3a.secret.key", "test")
    hc.set("fs.s3a.path.style.access", "true")
    # Pin the impl mapping + bypass the FS cache so the probe asks the
    # classloader for the REAL S3AFileSystem regardless of what earlier
    # tests did to the shared session (test_objectstore_writepath
    # registers-then-unsets a stand-in under this scheme; without the
    # pin the same blocker surfaces as UnsupportedFileSystemException
    # instead of the CNFE this test asserts on).
    hc.set("fs.s3a.impl", "org.apache.hadoop.fs.s3a.S3AFileSystem")
    hc.set("fs.s3a.impl.disable.cache", "true")
    try:
        with pytest.raises(Exception) as exc_info:
            spark.range(3).write.mode("overwrite").parquet(
                "s3a://etl-bronze/probe"
            )
        msg = str(exc_info.value)
        assert "org.apache.hadoop.fs.s3a.S3AFileSystem" in msg, (
            f"s3a failed for a DIFFERENT reason than the pinned blocker "
            f"(missing hadoop-aws jar): {msg[:500]}"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                hc.unset(k)
            else:
                hc.set(k, v)

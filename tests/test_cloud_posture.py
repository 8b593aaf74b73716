"""Cloud-posture tests (VERDICT r7 directive #3).

The sandbox has no object store and no hadoop-aws jars — which is
exactly the condition under test: every cloud-unsafe path must REFUSE
with the designed error (UnsafeFilesystemError /
UnsafeCheckpointLocation), never leak a ClassNotFoundException or
silently fall back to local semantics, and the deploy-time confs must
exist as auditable code rather than prose.
"""

from __future__ import annotations

import pytest

from serverless_etl_aws_spark.pipeline.atomic import (
    AtomicPartitionedTable,
    UnsafeFilesystemError,
)
from serverless_etl_aws_spark.pipeline.cloud import (
    CHECKPOINT_SAFE_SCHEMES,
    OBJECT_STORE_SCHEMES,
    UnsafeCheckpointLocation,
    apply_cloud_confs,
    s3a_magic_committer_confs,
    validate_checkpoint_dir,
)


# ---------------------------------------------------------------------
# AtomicPartitionedTable vs a REAL s3a:// root URI
# ---------------------------------------------------------------------


def test_real_s3a_root_refused_without_fs_impl(spark):
    """A table rooted at a genuine ``s3a://`` URI must raise the clean
    UnsafeFilesystemError from the scheme allowlist — BEFORE Hadoop
    tries to instantiate the (absent) S3AFileSystem. This is the
    driver-without-hadoop-aws misconfiguration a real deploy hits
    first; the failure mode must name the actual problem (no atomic
    rename) instead of ClassNotFoundException."""
    table = AtomicPartitionedTable(
        spark, "s3a://some-bucket/warehouse/tbl", "day"
    )
    with pytest.raises(UnsafeFilesystemError, match="atomic rename"):
        table.check_commit_safety()


def test_real_s3a_root_refused_at_commit_surface(spark):
    """Same refusal, reached through the public commit entrypoint, and
    nothing local is created as a side effect."""
    df = spark.createDataFrame([("d1", 1)], "day string, v long")
    table = AtomicPartitionedTable(spark, "s3a://bkt/tbl", "day")
    with pytest.raises(UnsafeFilesystemError, match="s3a"):
        table.commit_overwrite_partitions(df)


def test_unknown_scheme_refused_trust_optin_is_scoped(spark, tmp_path):
    """gs:// (raw GCS) is refused too; the trust opt-in is per-table,
    not global state, so a second untrusted table still refuses."""
    t1 = AtomicPartitionedTable(spark, "gs://bkt/tbl", "day")
    with pytest.raises(UnsafeFilesystemError):
        t1.check_commit_safety()
    # trusted LOCAL-rooted table (simulating an atomic-rename layer)
    # commits fine, and its trust does not leak to t1
    trusted = AtomicPartitionedTable(
        spark, str(tmp_path / "tbl"), "day", trust_atomic_rename=True
    )
    df = spark.createDataFrame([("d1", 1)], "day string, v long")
    trusted.commit_overwrite_partitions(df)
    with pytest.raises(UnsafeFilesystemError):
        t1.check_commit_safety()


# ---------------------------------------------------------------------
# S3A magic-committer confs
# ---------------------------------------------------------------------


def test_magic_committer_confs_exact():
    confs = s3a_magic_committer_confs()
    assert confs["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert confs["spark.hadoop.fs.s3a.committer.magic.enabled"] == "true"
    assert (
        confs["spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a"]
        == "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory"
    )
    assert (
        confs["spark.sql.sources.commitProtocolClass"]
        == "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
    )
    assert (
        confs["spark.sql.parquet.output.committer.class"]
        == "org.apache.spark.internal.io.cloud."
        "BindingParquetOutputCommitter"
    )
    # hygiene settings the committers assume
    assert (
        confs["spark.hadoop.fs.s3a.committer.abort.pending.uploads"]
        == "true"
    )


def test_apply_cloud_confs_folds_into_builder():
    class FakeBuilder:
        def __init__(self):
            self.seen: dict[str, str] = {}

        def config(self, k, v):
            self.seen[k] = v
            return self

    b = FakeBuilder()
    out = apply_cloud_confs(b, extra={"spark.executor.memory": "8g"})
    assert out is b
    assert b.seen["spark.hadoop.fs.s3a.committer.name"] == "magic"
    assert b.seen["spark.executor.memory"] == "8g"
    # every documented conf landed
    for k in s3a_magic_committer_confs():
        assert k in b.seen


# ---------------------------------------------------------------------
# Streaming checkpoint location validation
# ---------------------------------------------------------------------


@pytest.mark.parametrize(
    "path",
    [
        "/tmp/ckpt",
        "file:///tmp/ckpt",
        "hdfs://nn:8020/ckpt",
        "viewfs://cluster/ckpt",
        "abfss://c@acct.dfs.core.windows.net/ckpt",
    ],
)
def test_checkpoint_safe_locations_pass_through(path):
    assert validate_checkpoint_dir(path) == path


@pytest.mark.parametrize(
    "path",
    [
        "s3a://bkt/ckpt",
        "s3://bkt/ckpt",
        "gs://bkt/ckpt",
        "wasbs://c@a/ck",
        # single-slash URIs — Hadoop Path parses "scheme:/path" as a
        # real scheme, so these must hit the same refusal (ADVICE r8:
        # the old "://"-partition parse let them through as 'file')
        "s3a:/bkt/ckpt",
        "gs:/bkt/ckpt",
        # case must not matter
        "S3A://bkt/ckpt",
    ],
)
def test_checkpoint_object_store_refused(path):
    with pytest.raises(UnsafeCheckpointLocation, match="atomic"):
        validate_checkpoint_dir(path)


def test_checkpoint_single_slash_safe_scheme_passes():
    # the flip side of the single-slash refusal: a safe scheme in
    # single-slash form still passes (Hadoop accepts "hdfs:/ckpt")
    assert validate_checkpoint_dir("hdfs:/ckpt") == "hdfs:/ckpt"
    assert validate_checkpoint_dir("HDFS://nn:8020/ckpt") == "HDFS://nn:8020/ckpt"


def test_checkpoint_relative_path_with_colon_refused():
    """A RELATIVE local path whose first segment carries a colon
    ("ckpt:v2/dir") parses as scheme 'ckpt' — in urlsplit and in
    Hadoop's own Path — so it is refused as an unknown scheme rather
    than silently treated as a local dir (round-9 ADVICE: fail-closed
    behavior change, now pinned). The documented spellings work:
    absolute path or file:// URI."""
    with pytest.raises(UnsafeCheckpointLocation, match="unknown scheme"):
        validate_checkpoint_dir("ckpt:v2/dir")
    # documented escape hatches for the same on-disk location
    assert validate_checkpoint_dir("/data/ckpt:v2/dir") == "/data/ckpt:v2/dir"
    assert (
        validate_checkpoint_dir("file:///data/ckpt:v2/dir")
        == "file:///data/ckpt:v2/dir"
    )


def test_checkpoint_trust_optin_and_unknown_scheme():
    assert (
        validate_checkpoint_dir(
            "s3a://bkt/ckpt", trust_atomic_rename=True
        )
        == "s3a://bkt/ckpt"
    )
    with pytest.raises(UnsafeCheckpointLocation, match="unknown scheme"):
        validate_checkpoint_dir("weirdfs://x/ckpt")


def test_scheme_sets_disjoint():
    """A scheme must not be both checkpoint-safe and an object store —
    overlap would make validate_checkpoint_dir order-dependent."""
    assert not (CHECKPOINT_SAFE_SCHEMES & OBJECT_STORE_SCHEMES)


def test_ingest_refuses_object_store_checkpoint(spark, tmp_path):
    """IncrementalIngest validates its checkpoint location at
    CONSTRUCTION — an s3a:// checkpoint dir (torn commit log on crash)
    fails before any streaming state exists."""
    from serverless_etl_aws_spark.pipeline.ingest import IncrementalIngest
    from serverless_etl_aws_spark.schemas import NYC_TAXI

    with pytest.raises(UnsafeCheckpointLocation, match="atomic"):
        IncrementalIngest(
            spark,
            bronze_dir=str(tmp_path / "bronze"),
            silver_dir=str(tmp_path / "silver"),
            checkpoint_dir="s3a://bkt/ckpt",
            schema=NYC_TAXI,
        )
    # local checkpoint constructs fine (and trust opt-in is the
    # validator's, not the ingest class's, concern)
    ing = IncrementalIngest(
        spark,
        bronze_dir=str(tmp_path / "bronze"),
        silver_dir=str(tmp_path / "silver"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema=NYC_TAXI,
    )
    assert ing.checkpoint_dir == str(tmp_path / "ckpt")


def test_get_spark_cloud_flag_folds_committer_confs(monkeypatch):
    """get_spark(cloud=True) must route through apply_cloud_confs —
    asserted on the builder, without booting a second JVM (committer
    confs are session-start-only, so the running test session can't
    witness them live)."""
    import serverless_etl_aws_spark.session as session_mod

    seen: dict[str, str] = {}

    class FakeBuilder:
        def master(self, m):
            return self

        def appName(self, n):
            return self

        def config(self, k, v):
            seen[k] = v
            return self

        def getOrCreate(self):
            raise RuntimeError("stop-before-jvm")

    monkeypatch.setattr(
        session_mod.SparkSession, "builder", FakeBuilder()
    )
    with pytest.raises(RuntimeError, match="stop-before-jvm"):
        session_mod.get_spark(cloud=True)
    for k, v in s3a_magic_committer_confs().items():
        assert seen.get(k) == v
    # and cloud=False (default) leaves them out
    seen.clear()
    with pytest.raises(RuntimeError, match="stop-before-jvm"):
        session_mod.get_spark(cloud=False)
    assert "spark.hadoop.fs.s3a.committer.name" not in seen

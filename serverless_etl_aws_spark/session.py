"""SparkSession factory — one session, scale-sane defaults.

Replaces the reference's Glue session bootstrap
(reference: src/glue_scripts/bronze_to_silver.py:64-68,
``SparkContext → GlueContext → spark_session → Job.init``) with a plain
``SparkSession.builder``. Defaults are chosen for the 100 TB design target:

- AQE on (runtime coalesce / skew-join / broadcast demotion);
- UTC session timezone (oracle parity + cross-cluster determinism);
- Arrow enabled (vectorized pandas interchange for the UDF scale path);
- shuffle partitions sized by env (small for local tests, large on a
  cluster — on 1000 executors you'd set this to 2-4× total cores or rely
  on AQE's coalescing from a high initial value).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "serverless-etl-aws-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    cloud: bool | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``cloud=True`` (or env ``SPARK_GRAFT_CLOUD=1``) folds in the S3A
    magic-committer confs (pipeline/cloud.py) — the object-store write
    posture a cluster deploy needs, set before the session starts
    because committer factory bindings are read at write-path
    construction. A local session ignores the extra confs harmlessly,
    but the default stays off so local plans and bench artifacts are
    never conditioned on inert cloud settings."""
    if master is None:
        master = f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if cloud is None:
        cloud = os.environ.get("SPARK_GRAFT_CLOUD", "0") == "1"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's coalesce floor is 1 MiB of COMPRESSED shuffle bytes per
        # partition (minPartitionSize) — at that floor a CPU-heavy stage
        # over a few MB of shuffle (checksums, per-row expression work,
        # percentile sorts) coalesces onto 1-3 cores and serializes
        # (measured: ml_feature_screen ran its whole 2.4 s compute in a
        # 3-task stage). 64 KiB keeps such stages at the session's
        # parallelism; stages with ≥ cores×1 MiB of shuffle — every
        # at-scale stage that matters — are unaffected because
        # parallelismFirst sizing already spreads them. Env-tunable for
        # clusters that prefer the stock floor.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # Same off-heap streaming-state posture as tune_for_session: the
        # r13 adjudication moved stateful-stream state to RocksDB, but
        # only the driver-handed-session path got the conf — sessions
        # built HERE (bench.py, tests, CLI) silently kept the on-heap
        # HDFS-backed provider, so the bench's stream keys ran a
        # different engine than the driver's correctness runs. One
        # default, both paths.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        .config("spark.sql.streaming.minBatchesToRetain", "2")
        # Changelog checkpointing: per-batch commits upload the small
        # change set instead of re-zipping the whole RocksDB snapshot
        # (snapshots move to the background maintenance thread).
        # Idle-box A/B at sf0.1: stream_stream_join 3.34→2.90,
        # stream_late_data 2.00→1.68, stream_session 1.35→1.19,
        # stream_tumbling 0.90→0.81, stream_stateful neutral (7-run
        # medians) — and at scale per-commit cost stops growing with
        # state size, which is the production argument. Env-tunable for
        # clusters that prefer full-snapshot commits.
        .config(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            os.environ.get("SPARK_GRAFT_ROCKSDB_CHANGELOG", "true"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python UDTFs run row-at-a-time (BatchEvalPythonUDTF, pickled
        # rows) unless the Arrow path is opted into — measured round 13:
        # the flag flips udtf_python to ArrowEvalPythonUDTF with
        # identical results (parity re-verified), putting the fourth
        # Python API shape on the same Arrow-batch transport as
        # pandas_udf/mapInPandas. Pinned by test_plans.py.
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", os.path.join(os.getcwd(), "spark-warehouse"))
    )
    if cloud:
        from .pipeline.cloud import apply_cloud_confs

        builder = apply_cloud_confs(builder)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark


def ship_package(spark: SparkSession) -> None:
    """Make this package importable inside Spark's Python workers.

    Several operators (``applyInPandasWithState``, ``mapInPandas``) reference
    module-level functions, which cloudpickle serializes *by reference* — the
    worker process must be able to ``import serverless_etl_aws_spark``. The
    grading driver imports ``__spark_entry__`` via ``sys.path`` manipulation
    from an arbitrary cwd, and the driver-side ``sys.path`` is NOT inherited
    by worker processes. Shipping a zip via ``addPyFile`` fixes this by
    construction (workers prepend the Spark files dir to ``sys.path``); on a
    real cluster this is also exactly how the package would reach executors.
    """
    sc = spark.sparkContext
    if getattr(sc, "_seaws_package_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    staging = tempfile.mkdtemp(prefix="seaws_pyfiles_")
    zip_path = os.path.join(staging, "serverless_etl_aws_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(pkg_dir):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._seaws_package_shipped = True


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-provided
    session (the driver hands us its own SparkSession — static confs like
    driver memory can't change, but SQL confs can)."""
    runtime = {
        # streaming stateful ops pin their shuffle-partition count at
        # checkpoint creation and AQE does not coalesce them — 200 tiny
        # state tasks on a laptop-scale run is pure overhead
        "spark.sql.shuffle.partitions": str(DEFAULT_SHUFFLE_PARTITIONS),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        # same coalesce floor as get_spark (see comment there): without
        # it CPU-heavy small-shuffle stages serialize onto 1-3 cores
        "spark.sql.adaptive.coalescePartitions.minPartitionSize":
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"),
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # Stateful streaming state lives OFF-HEAP in native RocksDB
        # instead of on-heap HashMaps: the HDFS-backed provider's state
        # maps made every stream key's wall time a GC barometer under a
        # long session's accumulated heap pressure (r13 adjudication:
        # stream_session escalated 4.9→16→21 s without an explicit
        # System.gc between keys; with RocksDB the state no longer
        # competes with the tenured heap). minBatchesToRetain is
        # trimmed from 100: these drains are one-shot AvailableNow
        # queries — nothing ever replays more than the last snapshot.
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        "spark.sql.streaming.minBatchesToRetain": "2",
        # same changelog-checkpointing posture as get_spark (see comment
        # there): commit the per-batch change set, snapshot in background
        "spark.sql.streaming.stateStore.rocksdb."
        "changelogCheckpointing.enabled":
            os.environ.get("SPARK_GRAFT_ROCKSDB_CHANGELOG", "true"),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
        "spark.sql.parquet.filterPushdown": "true",
    }
    for k, v in runtime.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — keep going
    ship_package(spark)
    return spark

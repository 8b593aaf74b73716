"""Cloud deployment posture — the exact Spark/Hadoop configuration a
cluster deploy against an object store needs, as code.

The sandbox runs local-FS only (no hadoop-aws on the classpath, no S3
endpoint), so nothing here talks to a real object store. What IS real:

* :func:`s3a_magic_committer_confs` — the session confs that make
  DataFrame writes to ``s3a://`` paths safe and fast (S3A "magic"
  committer: task output streams directly to the destination under
  ``__magic/`` keys and the job commit completes multipart uploads —
  no rename-as-copy, no listing-inconsistency window). These are the
  documented Spark cloud-integration settings (Spark docs
  "Integration with Cloud Infrastructures"; Hadoop docs "Committing
  work to S3 with the S3A Committers"), not anything environment
  specific.
* :func:`validate_checkpoint_dir` — refuses a Structured Streaming
  checkpoint location on a raw object store. Checkpoint metadata
  relies on rename-to-fresh-path atomicity for its commit log;
  HDFS/ABFS (real rename) are safe, raw S3A is not — the documented
  posture is checkpoints on HDFS (or S3 only behind an atomic-rename
  layer / with the explicit opt-in).
* :func:`apply_cloud_confs` — folds the committer confs into a
  ``SparkSession.Builder`` (or any object with ``.config(k, v)``).

Relation to the reference: the reference runs its sinks on S3 via Glue
(aws_glue_job "bronze_to_silver", terraform/main.tf:493-501, running
src/glue_scripts/bronze_to_silver.py against the silver/gold buckets,
main.tf:357-365) and never states a committer, inheriting whatever the
Glue runtime defaults to.
This engine makes the committer an explicit, testable deploy artifact.

Relation to pipeline/atomic.py: the manifest commit protocol there
needs true atomic rename and REFUSES raw ``s3a``/``gs``/``s3`` schemes
(``UnsafeFilesystemError``) unless the deployment fronts the store with
an atomic-rename layer and opts in. The magic committer solves a
DIFFERENT problem — making bulk parquet WRITES atomic-enough at job
granularity — and does not make `rename()` atomic; the two guards are
deliberately independent.
"""

from __future__ import annotations

#: Filesystem schemes whose rename-to-fresh-path is atomic — safe for
#: Structured Streaming checkpoint/commit logs and for the
#: AtomicPartitionedTable manifest protocol. ABFS (Azure Gen2) and GCS
#: are rename-capable at the directory-manifest level but streaming
#: checkpoints are documented-safe only on true-rename stores; keep the
#: conservative set and let deployments extend it consciously.
CHECKPOINT_SAFE_SCHEMES: frozenset[str] = frozenset(
    {"file", "hdfs", "viewfs", "abfs", "abfss"}
)

#: Raw object-store schemes where rename is emulated (copy+delete) —
#: unsafe for checkpoint commit logs without an atomic-rename layer.
OBJECT_STORE_SCHEMES: frozenset[str] = frozenset(
    {"s3", "s3a", "s3n", "gs", "wasb", "wasbs", "oss", "cos"}
)


def s3a_magic_committer_confs() -> dict[str, str]:
    """The Spark session confs for safe, rename-free parquet writes to
    S3A. Set BEFORE the session starts (committer factory binding is
    read at write-path construction, not per-job).

    Returns a plain dict so callers can audit/merge/log it; pair with
    :func:`apply_cloud_confs` to fold into a builder.
    """
    return {
        # --- committer selection (Hadoop S3A side) ---
        # "magic" = task attempts write directly under a __magic/ path
        # on the destination bucket; job commit completes the multipart
        # uploads. No rename, no copy, no temporary-directory listing.
        "spark.hadoop.fs.s3a.committer.name": "magic",
        "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
        # route all committer construction for s3a:// through the S3A
        # factory (otherwise Spark falls back to FileOutputCommitter,
        # whose v1 algorithm renames twice and whose v2 is non-atomic)
        "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a":
            "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory",
        # --- Spark SQL binding (spark-hadoop-cloud module) ---
        # parquet path: a ParquetOutputCommitter subclass that DELEGATES
        # to the factory-chosen committer instead of assuming a
        # rename-capable FS
        "spark.sql.parquet.output.committer.class":
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter",
        "spark.sql.sources.commitProtocolClass":
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
        # --- S3A hygiene that the committers assume ---
        # multipart uploads must be aborted on job abort, not leaked
        "spark.hadoop.fs.s3a.committer.abort.pending.uploads": "true",
        # directory marker retention avoids LIST-churn on deep writes
        # (safe on any modern S3A; required reading for mixed fleets)
        "spark.hadoop.fs.s3a.directory.marker.retention": "keep",
    }


def apply_cloud_confs(builder, extra: dict[str, str] | None = None):
    """Fold :func:`s3a_magic_committer_confs` (plus ``extra``) into a
    ``SparkSession.Builder`` — or anything exposing ``.config(k, v)``.
    Returns the builder for chaining."""
    confs = dict(s3a_magic_committer_confs())
    if extra:
        confs.update(extra)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder


class UnsafeCheckpointLocation(RuntimeError):
    """The proposed Structured Streaming checkpoint dir is on a store
    whose rename is not atomic — the commit log could tear."""


def _scheme_of(path: str) -> str:
    # urlsplit, not partition("://"): Hadoop Path accepts single-slash
    # URIs ("s3a:/bucket/ckpt" parses scheme s3a), so keying the refusal
    # on a literal "://" would let those bypass the object-store check.
    from urllib.parse import urlsplit

    scheme = urlsplit(path).scheme
    return scheme.lower() if scheme else "file"


def validate_checkpoint_dir(
    path: str, *, trust_atomic_rename: bool = False
) -> str:
    """Refuse a streaming checkpoint location on a raw object store.

    The checkpoint commit log publishes batch N by renaming a temp file
    to ``commits/N``; on stores that emulate rename as copy+delete a
    crash mid-publish leaves a half-written commit record and the query
    restarts into undefined offsets. HDFS (or local FS in tests) is the
    documented-safe location; deployments that front S3 with an
    atomic-rename layer opt in via ``trust_atomic_rename=True`` —
    accepting responsibility for that property, same contract as
    ``AtomicPartitionedTable``.

    Returns ``path`` unchanged when safe, so call sites can inline it:
    ``writeStream.option("checkpointLocation", validate_checkpoint_dir(p))``.

    Note a RELATIVE local path with a colon in its first segment
    (``ckpt:v2/dir``) parses as scheme ``ckpt`` — here AND in Hadoop's
    own Path — so it is refused as an unknown scheme (fail-closed).
    Spell such paths absolute (``/data/ckpt:v2/dir``) or as ``file://``
    URIs. Pinned by tests/test_cloud_posture.py (round-9 ADVICE).
    """
    scheme = _scheme_of(path)
    if scheme in CHECKPOINT_SAFE_SCHEMES:
        return path
    if trust_atomic_rename:
        return path
    if scheme in OBJECT_STORE_SCHEMES:
        raise UnsafeCheckpointLocation(
            f"checkpoint location {path!r} is on raw object store scheme "
            f"{scheme!r}: the streaming commit log needs atomic "
            f"rename-to-fresh-path and {scheme} emulates rename as "
            f"copy+delete. Put checkpoints on HDFS (or a mounted "
            f"rename-capable FS), or front the store with an "
            f"atomic-rename layer and pass trust_atomic_rename=True."
        )
    raise UnsafeCheckpointLocation(
        f"checkpoint location {path!r} has unknown scheme {scheme!r}; "
        f"refusing by default — pass trust_atomic_rename=True if the "
        f"store provides atomic rename."
    )

"""Table loading — schema-validated parquet scans over storage zones.

Generalizes the reference's multi-file parquet scan
(reference: src/glue_scripts/bronze_to_silver.py:44-45,
``spark.read.parquet(*input_paths)``) into a catalog keyed by table name.
A "zone" is a directory (local) or object-store prefix (S3 — same code path,
``s3a://`` URIs); a table is the set of parquet files under it.

Scale notes (100 TB):
- Explicit schemas skip footer-inference listing and pin column types.
- Column pruning + predicate pushdown happen automatically because callers
  compose DataFrame ops on the returned scan (check ``.explain`` for
  ``PushedFilters`` / ``ReadSchema``).
- ``mergeSchema`` off: schema drift fails loudly at load, not silently at
  query time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from . import schemas


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table with its declared schema.

    The declared schema is applied on read (not inferred), then column order
    is pinned. ``events.ts`` is TIMESTAMP(NANOS) in parquet, which Spark's
    vectorized reader rejects; it is read as raw nanos
    (``spark.sql.legacy.parquet.nanosAsLong``) and floor-divided to a µs
    TimestampType — the same truncation DuckDB applies casting
    TIMESTAMP_NS → TIMESTAMP, so oracle comparisons agree.
    """
    if name not in schemas.TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(schemas.TABLES)}")
    schema = schemas.TABLES[name]
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        read_schema = StructType(
            [
                StructField("ts", LongType(), True) if f.name == "ts" else f
                for f in schema.fields
            ]
        )
        df = spark.read.schema(read_schema).parquet(table_path(sf_dir, name))
        # integer div — float division would lose precision above 2^53 ns
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.select(*[f.name for f in schema.fields])
    df = spark.read.schema(schema).parquet(table_path(sf_dir, name))
    return df.select(*[f.name for f in schema.fields])


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in schemas.TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (SQL entry point)."""
    for name in schemas.TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

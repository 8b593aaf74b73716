"""Scan / projection / filter / exact-dedup operators.

Generalizes the reference's data plane: its only relational operators are a
multi-file parquet scan (reference: src/glue_scripts/bronze_to_silver.py:45)
and an identity transform slot (bronze_to_silver.py:46). Here the slot is
filled with real projections/filters, expressed declaratively so Catalyst
pushes predicates and prunes columns at the parquet scan (verify with
``.explain``: ``PushedFilters`` / ``ReadSchema``).

Scale notes: every query below is a single scan with no shuffle except
``dedup_exact`` (one hash-partition exchange on the dedup key — map-side
partial aggregation does not apply, but AQE coalesces the output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import Query
from ._util import t


def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan of lineitem, stable column order (catalog pins it)."""
    return t(spark, sf_dir, "lineitem")


SCAN_SQL = """
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
       l_shipdate
FROM lineitem
"""


def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + alias + computed column (per-row double math is
    deterministic IEEE, no rounding needed)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("discount"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
            "revenue"
        ),
    )


PROJECT_SQL = """
SELECT l_orderkey AS order_key,
       l_linenumber AS line_no,
       l_extendedprice AS price,
       l_discount AS discount,
       l_extendedprice * (1.0 - l_discount) AS revenue
FROM lineitem
"""


def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates: date range + IN + BETWEEN. All three reach
    the parquet scan as PushedFilters."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1999-01-01")))
        & F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(10.0, 40.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
             "l_returnflag", "l_shipdate")


FILTER_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
       l_returnflag, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1999-01-01'
  AND l_returnflag IN ('A', 'R')
  AND l_quantity BETWEEN 10.0 AND 40.0
"""


def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe predicates on events.value (nullable by construction)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value").isNull() | (F.col("value") > 150.0))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.col("value").isNull().alias("value_missing"),
            F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
        )
    )


FILTER_NULL_SQL = """
SELECT event_id, user_id, event_type,
       value IS NULL AS value_missing,
       COALESCE(value, 0.0) AS value_filled
FROM events
WHERE value IS NULL OR value > 150.0
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a natural key, keep-earliest semantics.

    Generalizes the reference's month-level idempotency filter (reference:
    src/lambda_functions/fetch_raw_data.py:134-138 — skip if already
    processed) from partition granularity to row granularity. Implemented as
    ``row_number() = 1`` rather than ``dropDuplicates`` because
    dropDuplicates keeps an *arbitrary* row per key — fine for idempotency,
    wrong for a deterministic contract. At scale this is one shuffle on the
    key; a pre-bucketed table would eliminate it.
    """
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "value", "props")
    )


DEDUP_SQL = """
SELECT event_id, user_id, event_type, value, props
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
    FROM events
) WHERE rn = 1
"""


QUERIES: dict[str, Query] = {
    "scan_parquet": Query(scan_parquet, SCAN_SQL, "full lineitem scan"),
    "project_rename": Query(project_rename, PROJECT_SQL, "select+alias+compute"),
    "filter_pred": Query(filter_pred, FILTER_SQL, "conjunctive pushdown filters"),
    "filter_null": Query(filter_null, FILTER_NULL_SQL, "null-safe predicates"),
    "dedup_exact": Query(dedup_exact, DEDUP_SQL, "keep-earliest exact dedup"),
}

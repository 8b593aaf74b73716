"""Window-function operators: ranking, lag/lead, frames, running totals,
top-k per group.

Scale notes (100 TB): a window = one shuffle on ``partitionBy`` keys + an
in-partition sort. Partition keys here (customer, brand) are high-
cardinality, so partitions stay small and spill-free. Every ``orderBy``
includes a unique tiebreak column — without it rank/lag results are
nondeterministic across engines AND across Spark runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import Query
from ._util import dec, t


def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer with row_number/rank/dense_rank."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


WIN_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
) WHERE rn <= 3
"""


def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    # asc_nulls_last: Spark's plain asc puts NULLs FIRST while DuckDB
    # puts them LAST — a null-injected o_orderdate would shift every
    # neighbor. Pinned on both sides (oracle says NULLS LAST).
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last("o_orderdate"), F.asc_nulls_last("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
    )


WIN_LAG_LEAD_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       lag(o_totalprice, 1) OVER w AS prev_price,
       lead(o_totalprice, 1) OVER w AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST)
"""


def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving sum over a 3-row frame (decimal-exact, see _util)."""
    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_last("o_orderdate"), F.asc_nulls_last("o_orderkey"))
        .rowsBetween(-2, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(dec("o_totalprice")).over(w), 2).cast("double").alias(
            "moving_sum_3"
        ),
    )


WIN_FRAME_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ROUND(SUM(CAST(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS DECIMAL(18,4))) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
           AS moving_sum_3
FROM orders
"""


def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) spend per customer."""
    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_last("o_orderdate"), F.asc_nulls_last("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(dec("o_totalprice")).over(w), 2).cast("double").alias(
            "running_spend"
        ),
    )


WIN_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ROUND(SUM(CAST(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS DECIMAL(18,4))) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
           AS running_spend
FROM orders
"""


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue per brand: aggregate first (shrinks input to
    one row per part), then a window over the much smaller aggregate —
    the scale-correct order of operations."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    per_part = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum(dec("l_extendedprice")).alias("rev_dec"))
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("rev_dec").desc(), F.col("p_partkey")
    )
    return (
        per_part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            F.round(F.col("rev_dec"), 2).cast("double").alias("part_revenue"),
            F.col("rn").alias("brand_rank"),
        )
    )


TOPK_SQL = """
SELECT p_brand, p_partkey,
       CAST(ROUND(rev_dec, 2) AS DOUBLE) AS part_revenue,
       rn AS brand_rank
FROM (
    SELECT p_brand, p_partkey, rev_dec,
           row_number() OVER (PARTITION BY p_brand
                              ORDER BY rev_dec DESC, p_partkey) AS rn
    FROM (
        SELECT p_brand, p_partkey,
               SUM(CAST(CASE WHEN isfinite(l_extendedprice) THEN l_extendedprice END AS DECIMAL(18,4))) AS rev_dec
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
    )
) WHERE rn <= 3
"""


QUERIES: dict[str, Query] = {
    "win_rank": Query(win_rank, WIN_RANK_SQL, "row_number/rank/dense_rank"),
    "win_lag_lead": Query(win_lag_lead, WIN_LAG_LEAD_SQL, "lag/lead"),
    "win_frame_rows": Query(win_frame_rows, WIN_FRAME_SQL, "3-row moving sum"),
    "win_running": Query(win_running, WIN_RUNNING_SQL, "cumulative sum"),
    "topk_per_group": Query(topk_per_group, TOPK_SQL, "top-3 per brand"),
}

"""Shared helpers for oracle-parity queries.

Float discipline (SURVEY.md §2B notes): the driver hash-compares values, so
any aggregate over doubles must be bit-identical between Spark and DuckDB.
Two rules:

1. Sums/averages of doubles are computed over exact decimals (summation
   order differs between engines; decimal aggregation is exact).
2. Quantization of a final value NEVER uses ``ROUND(double)`` — Spark
   rounds the shortest decimal repr, DuckDB the binary value, and they
   diverge at half boundaries. Either round IN DECIMAL (both engines round
   decimals half-away-from-zero identically) or floor-quantize the double
   (floor has no half-boundary behavior and the input doubles are
   bit-identical when both engines evaluate the same IEEE expression).

Per-row double arithmetic itself is deterministic IEEE and needs no
special handling.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog

DEC = "decimal(18,4)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.load_table(spark, sf_dir, name)


def dec(col: str | Column) -> Column:
    """Cast to the engine's exact intermediate decimal type."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Exact decimal sum, rounded IN DECIMAL, then cast to double.

    Rounding must happen in decimal: both engines round decimals
    half-away-from-zero (verified), whereas ``ROUND(double)`` diverges at
    half boundaries (Spark rounds the shortest decimal repr, DuckDB the
    binary value) — and an exact sum ending in .xx50 IS a half boundary.
    Mirror: ``CAST(ROUND(SUM(CAST(x AS DECIMAL(18,4))), scale) AS DOUBLE)``.
    """
    return F.round(F.sum(dec(col)), scale).cast("double")


def fquant(col: Column, scale: int = 2) -> Column:
    """Floor-quantize a double: deterministic across engines because the
    input doubles are bit-identical (same IEEE expression) and floor has no
    half-boundary behavior. Mirror: ``floor(x * 10^scale) / 10^scale``."""
    factor = float(10 ** scale)
    return F.floor(col * factor) / factor


def davg(col: str | Column, scale: int = 2) -> Column:
    """Exact decimal sum cast to double, divided by count, floor-quantized.
    Mirror in DuckDB:
    ``floor(CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      * 10^scale) / 10^scale``."""
    return fquant(
        F.sum(dec(col)).cast("double") / F.count(F.lit(1)), scale
    )


def revenue_dec() -> Column:
    """Exact revenue term: DECIMAL(l_extendedprice) * DECIMAL(1-l_discount).
    DuckDB mirror: ``CAST(l_extendedprice AS DECIMAL(18,4)) *
    CAST(1 - l_discount AS DECIMAL(18,4))``."""
    return dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(DEC)


# SQL fragments for the DuckDB side, kept next to their Spark twins above.
SQL_REVENUE_DEC = (
    "CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))"
)


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,4))), {scale}) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    factor = 10 ** scale
    return (
        f"floor(CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"
        f" / COUNT(*) * {factor}.0) / {factor}.0"
    )


def fresh_dir(path: str) -> str:
    """Recreate ``path`` empty — the staging-dir lifecycle every
    file-writing query key shares (one definition; previously copy-pasted
    per module)."""
    import shutil

    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path


def hadoop_dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes of the parquet data files directly under ``path``,
    listed through Hadoop's FileSystem API — the same abstraction the
    scans use, so it resolves any supported scheme (``file:``, ``s3a:``,
    ``hdfs:``) identically. A local ``os.listdir`` would silently break
    the moment the table moves to an object store."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = 0
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if (
            st.isFile()
            and name.endswith(".parquet")
            and not name.startswith(("_", "."))
        ):
            total += st.getLen()
    return total


def scratch_root() -> str:
    """Per-process scratch directory for query functions that materialize
    side files (staged streaming sources, csv/json/orc exports, bucketed
    tables). Override the base with $SPARK_GRAFT_SCRATCH; the default is
    <repo>/.scratch. The pid suffix keeps concurrent runs (bench vs
    pytest) from clobbering each other's staging dirs."""
    base = os.environ.get("SPARK_GRAFT_SCRATCH")
    if base is None:
        repo = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        base = os.path.join(repo, ".scratch")
    return os.path.join(base, f"pid{os.getpid()}")


def nation_trade_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One (customer-nation, supplier-nation) row per lineitem — the
    shared fact-join reduction behind the graph keys (graph_pagerank /
    graph_triangles / graph_label_propagation). The 100 TB point all
    three make: dimensions broadcast, and the fact table collapses to a
    tiny pair stream BEFORE any graph work touches it. Callers
    aggregate the raw pairs into their own edge form (weighted /
    canonical-undirected / symmetrized)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("c_nationkey", "s_nationkey")
    )

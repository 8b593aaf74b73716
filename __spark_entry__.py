"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``serverless_etl_aws_spark/`` — see SURVEY.md §2B
for the operator inventory each key maps to.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from serverless_etl_aws_spark.queries import build_registry  # noqa: E402
from serverless_etl_aws_spark.queries.aggregates import agg_group  # noqa: E402
from serverless_etl_aws_spark.session import tune_for_session  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-shaped
    pricing summary — the analysis the reference's gold layer promises
    (reference: README.md:108-111) but never implements."""
    tune_for_session(spark)
    return agg_group(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_session(spark)
            return fn(spark, sf_dir)

        return run

    return {key: wrap(q.fn) for key, q in build_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per key; keys without SQL get the driver's
    rows-only check (approx/stateful ops — SURVEY.md §2B 'Oracle' column)."""
    return {
        key: q.sql for key, q in build_registry().items() if q.sql is not None
    }

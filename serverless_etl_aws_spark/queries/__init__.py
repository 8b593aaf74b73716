"""Query registry — one entry per operator in SURVEY.md §2B.

Each key maps to a :class:`Query`: a Spark callable ``(spark, sf_dir) ->
DataFrame`` plus (where SQL-expressible) the equivalent ANSI SQL string the
DuckDB oracle runs on the same parquet. The driver consumes these through
``/root/repo/__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One contract entry: Spark implementation + optional DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None = None
    doc: str = ""


def build_registry() -> dict[str, Query]:
    """Collect every query family. Import is deferred so a bug in one
    family doesn't take down the whole registry at import time."""
    registry: dict[str, Query] = {}
    from . import (
        aggregates,
        extras,
        extras2,
        joins,
        llm,
        pipeline_ops,
        relational,
        scalar_fns,
        sorts_sets,
        streaming_ops,
        udx,
        windows,
    )

    for mod in (
        relational,
        joins,
        aggregates,
        windows,
        sorts_sets,
        scalar_fns,
        udx,
        pipeline_ops,
        streaming_ops,
        llm,
        extras,
        extras2,
    ):
        for key, q in mod.QUERIES.items():
            if key in registry:
                raise ValueError(f"duplicate query key {key!r}")
            registry[key] = q
    return registry

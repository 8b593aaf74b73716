"""Oracle-differential tests — local mirror of the driver's correctness
gate (SURVEY.md §5.2 item 1). Every registry key with SQL must hash-match
DuckDB; rows-only keys must at least execute and return a DataFrame."""

from __future__ import annotations

import pytest

from serverless_etl_aws_spark.compare import compare
from serverless_etl_aws_spark.queries import build_registry

REGISTRY = build_registry()


@pytest.mark.parametrize("key", sorted(REGISTRY))
def test_oracle_parity(spark, sf_dir, key):
    # strict=True (VERDICT r8 directive #2): dtype-CLASS drift between
    # engines fails even where coerced numeric values coincide, so the
    # local gate can no longer hide a DuckDB HUGEINT→float64 widening
    # behind the float comparison path. Oracle SQL carries explicit
    # BIGINT casts on integer aggregates to satisfy this.
    q = REGISTRY[key]
    result = compare(key, q.fn(spark, sf_dir), q.sql, sf_dir, strict=True)
    assert result.ok, f"{key}: {result.detail} (spark={result.rows_spark}, oracle={result.rows_oracle})"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())

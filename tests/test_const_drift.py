"""Constant-measure (zero-variance) drift sweep — the round-9 sibling
of tests/test_null_drift.py.

Every measure column in the fixture is replaced by a single constant,
so every variance, spread, and rate denominator a formula key divides
by is pushed to its degenerate value AT ONCE, on the Spark side as well
as the oracle side (the hypothesis property suites only exercise the
DuckDB oracle — this sweep is what runs the ENGINE through the
degenerate regime). Spark 4 runs ANSI mode by default, so an unguarded
``x / 0`` doesn't go NULL like DuckDB — it THROWS, and a fixture
regeneration that lands a constant group would take the key down
entirely.

Round-9 findings this sweep caught on first run (all fixed):

* ``agg_corr``, ``ts_autocorr``, ``agg_skew_kurt`` raised ANSI
  DIVIDE_BY_ZERO on zero-variance groups — now guarded to NULL with
  the identical predicate tree on both engines;
* ``ml_wilson_ci`` split the 1e-6 floor at the p̂ = 0 boundary
  (mathematically-zero half-width lands ±1 ulp around 0.0, so one
  engine floored to −0.000001) — the p̂ ∈ {0, 1} bounds are now pinned
  to exact 0 / 1 and the oracle's z² is CAST to DOUBLE so both engines
  fold the same IEEE product.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from serverless_etl_aws_spark.compare import compare
from serverless_etl_aws_spark.queries import build_registry

REGISTRY = build_registry()

SRC = "/root/testdata/sf0.001"

#: Every double/int measure column pinned to one value — zero variance
#: everywhere while keys, timestamps, and categoricals keep their real
#: distributions (those feed spines, joins, and group structure).
CONST: dict[str, dict[str, float | int]] = {
    "events": {"value": 2.5},
    "customer": {"c_acctbal": 100.0},
    "lineitem": {
        "l_quantity": 4.0,
        "l_extendedprice": 1000.0,
        "l_discount": 0.05,
        "l_tax": 0.02,
    },
    "orders": {"o_totalprice": 5000.0},
    "part": {"p_retailprice": 50.0, "p_size": 10},
    "supplier": {"s_acctbal": 200.0},
}
COPY = ["region", "nation", "documents", "embeddings"]


@pytest.fixture(scope="session")
def const_sf_dir(tmp_path_factory) -> str:
    dst = str(tmp_path_factory.mktemp("constfix"))
    for name, cols in CONST.items():
        tbl = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        for col, val in cols.items():
            idx = tbl.schema.get_field_index(col)
            field = tbl.schema.field(col)
            tbl = tbl.set_column(
                idx, field, pa.array([val] * len(tbl), type=field.type)
            )
        pq.write_table(tbl, os.path.join(dst, f"{name}.parquet"))
    for name in COPY:
        shutil.copy(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(dst, f"{name}.parquet"),
        )
    return dst


@pytest.mark.parametrize("key", sorted(REGISTRY))
def test_const_drift_parity(spark, const_sf_dir, key):
    q = REGISTRY[key]
    result = compare(key, q.fn(spark, const_sf_dir), q.sql, const_sf_dir, strict=True)
    assert result.ok, (
        f"{key}: {result.detail} "
        f"(spark={result.rows_spark}, oracle={result.rows_oracle})"
    )

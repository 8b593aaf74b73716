"""Local oracle-differential harness — mirrors the driver's check.

Runs a registry query on Spark and its SQL twin on DuckDB over the same
parquet fixtures, then compares row count, sorted-column schema, and
order-insensitive values (exact for ints/strings/bools, bit-exact for
floats — the decimal discipline in queries/_util.py is what makes float
exactness achievable).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import duckdb
import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from . import schemas
from .catalog import table_path


#: Spark declared type → DuckDB view type. The oracle views mirror the
#: ENGINE's declared-schema read (catalog.load_table applies
#: schemas.TABLES on scan), so a file whose physical types drifted
#: narrower (int32 ids, float32 measures — the round-13 type-narrow
#: axis) is widened identically on both sides. On a proper fixture
#: every cast is an identity. Without this, DuckDB computes directly on
#: the stored FLOAT and e.g. median interpolation runs in float32 —
#: one ulp off the engine's widened-to-double arithmetic (caught by
#: ml_auc/ts_anomaly_mad on the axis's first full run).
_DUCK_TYPES = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "timestamp": "TIMESTAMP",
    "array<float>": "FLOAT[]",
}


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register fixture views the way the driver does (read_parquet),
    normalized to the DECLARED schema types (see ``_DUCK_TYPES``).

    Directory-layout tables (Spark-written ``name.parquet/`` dirs, which
    ``catalog.load_table`` reads fine) get a recursive glob; quotes in the
    path are SQL-escaped so an odd fixture dir can't break the DDL.
    A raw epoch-ns INT64 ``ts`` (the legacy fixture encoding) mirrors the
    engine's integer floor-division to µs (``make_timestamp``);
    TIMESTAMP_NS casts truncate to µs on both engines identically."""
    import os

    con = duckdb.connect()
    for name in schemas.TABLES:
        path = table_path(sf_dir, name)
        if os.path.isdir(path):
            path = os.path.join(path, "**", "*.parquet")
        path_sql = path.replace("'", "''")
        con.execute(
            f"CREATE VIEW raw_{name} AS "
            f"SELECT * FROM read_parquet('{path_sql}')"
        )
        declared = {}
        for f in schemas.TABLES[name].fields:
            simple = f.dataType.simpleString()
            try:
                declared[f.name] = _DUCK_TYPES[simple]
            except KeyError:
                raise KeyError(
                    f"_DUCK_TYPES has no DuckDB mapping for Spark type "
                    f"{simple!r} (table {name!r}, column {f.name!r}) — "
                    f"add it to compare._DUCK_TYPES so the oracle view "
                    f"normalizes to the declared schema"
                ) from None
        cols = []
        for colname, dtype, *_ in con.execute(
            f"DESCRIBE raw_{name}"
        ).fetchall():
            want = declared.get(colname)
            have = dtype.upper()
            if want is None or have == want:
                cols.append(colname)
            elif want == "TIMESTAMP" and have == "BIGINT":
                cols.append(
                    f"make_timestamp({colname} // 1000) AS {colname}"
                )
            else:
                cols.append(f"CAST({colname} AS {want}) AS {colname}")
        con.execute(
            f"CREATE VIEW {name} AS SELECT {', '.join(cols)} "
            f"FROM raw_{name}"
        )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows by all columns."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        dt = pdf[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            pdf[c] = pdf[c].astype("Int64")
        elif pd.api.types.is_float_dtype(dt):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_bool_dtype(dt):
            pdf[c] = pdf[c].astype("boolean")
        elif pd.api.types.is_datetime64_any_dtype(dt):
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
    pdf = pdf.sort_values(by=list(pdf.columns), na_position="last", kind="mergesort")
    return pdf.reset_index(drop=True)


@dataclass
class CompareResult:
    key: str
    rows_spark: int
    rows_oracle: int | None
    schema_match: bool | None
    values_match: bool | None
    detail: str = ""
    ok: bool = field(init=False)

    def __post_init__(self) -> None:
        if self.rows_oracle is None:
            self.ok = self.rows_spark >= 0
        else:
            self.ok = bool(
                self.rows_spark == self.rows_oracle
                and self.schema_match
                and self.values_match
            )


def _dtype_class(dt) -> str:
    """Coarse dtype class for the strict gate — fine enough to catch
    engine-type drift (int column arriving as float64 because DuckDB
    widened SUM(BIGINT) to HUGEINT), coarse enough to ignore width
    differences normalize() already canonicalizes away."""
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    return "object"


def compare(
    key: str,
    spark_df: DataFrame,
    sql: str | None,
    sf_dir: str,
    *,
    strict: bool = False,
) -> CompareResult:
    """Cross-engine diff. ``strict=True`` additionally requires each
    column's dtype CLASS (int/float/bool/datetime/object) to match
    between engines before values are compared, so a numeric coercion
    can never mask engine-type drift (VERDICT r8 directive #2: the
    float64 coercion below once hid a DuckDB HUGEINT→float64 widening
    until a strict-by-dtype sim caught it — oracle SQL must CAST integer
    aggregates back to BIGINT rather than lean on the coercion)."""
    if sql is None:
        # rows-only: count distributed — toPandas() would materialize the
        # whole result on the driver just to take len()
        return CompareResult(
            key, spark_df.count(), None, None, None, "rows-only"
        )
    spdf = spark_df.toPandas()
    con = duckdb_connect(sf_dir)
    try:
        odf = con.sql(sql).df()
    finally:
        con.close()
    s, o = normalize(spdf), normalize(odf)
    if list(s.columns) != list(o.columns):
        return CompareResult(
            key, len(s), len(o), False, None,
            f"columns spark={list(s.columns)} oracle={list(o.columns)}",
        )
    if len(s) != len(o):
        return CompareResult(key, len(s), len(o), True, None, "row count differs")
    detail = ""
    values_match = True
    for c in s.columns:
        a, b = s[c], o[c]
        if strict and _dtype_class(a.dtype) != _dtype_class(b.dtype):
            values_match = False
            detail = (
                f"dtype drift in {c}: spark={a.dtype} oracle={b.dtype} "
                f"(strict mode — cast the oracle aggregate explicitly)"
            )
            break
        if a.isna().sum() != b.isna().sum() or not (
            a.isna().values == b.isna().values
        ).all():
            values_match, detail = False, f"null pattern differs in {c}"
            break
        mask = ~a.isna()
        av, bv = a[mask], b[mask]
        # numeric path if EITHER side is float: DuckDB HUGEINT lands in
        # pandas as float64, and '100' vs '100.0' via the string branch
        # would false-mismatch numerically equal columns
        if pd.api.types.is_float_dtype(a.dtype) or pd.api.types.is_float_dtype(
            b.dtype
        ):
            if not np.array_equal(
                av.values.astype("float64"), bv.values.astype("float64")
            ):
                bad = np.abs(av.values - bv.values).max()
                values_match, detail = False, f"float mismatch in {c} (max |Δ|={bad})"
                break
        else:
            if not (av.astype(str).values == bv.astype(str).values).all():
                values_match, detail = False, f"value mismatch in {c}"
                break
    return CompareResult(key, len(s), len(o), True, values_match, detail)


def run_all(
    spark: SparkSession,
    sf_dir: str,
    keys: list[str] | None = None,
    *,
    strict: bool = False,
) -> list[CompareResult]:
    from .queries import build_registry

    registry = build_registry()
    if keys:
        unknown = sorted(set(keys) - set(registry))
        if unknown:
            raise KeyError(
                f"run_all: unknown keys {unknown} — a typo here would "
                f"otherwise return a vacuously-green empty result list"
            )
    results = []
    for key, q in registry.items():
        if keys and key not in keys:
            continue
        try:
            results.append(
                compare(key, q.fn(spark, sf_dir), q.sql, sf_dir, strict=strict)
            )
        except Exception as exc:  # surface, don't abort the sweep
            results.append(
                CompareResult(key, -1, None, None, False, f"ERROR: {exc}")
            )
            results[-1].ok = False
    return results

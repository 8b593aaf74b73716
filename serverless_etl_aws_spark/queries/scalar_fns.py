"""Scalar function surface: string / date / math+conditional / JSON / array.

All JVM-side built-ins (`pyspark.sql.functions`) — these stay inside
whole-stage codegen, never drop to Python. The reference star-imports these
functions but never uses one (reference:
src/glue_scripts/bronze_to_silver.py:12); this module exercises the surface
its users would rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import Query
from ..operators.text import ascii_upper
from ._util import t


def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        # ascii_upper: JVM upper() is full case mapping (ß → 'SS',
        # length-changing) while DuckDB's utf8proc is simple — see
        # operators/text.py::ascii_lower for the class
        ascii_upper(F.col("p_name")).alias("name_upper"),
        F.substring(F.col("p_type"), 1, 5).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.length(F.trim(F.col("p_name"))).cast("int").alias("name_len"),
        F.regexp_extract(F.col("p_name"), r"^(\w+)", 1).alias("first_word"),
    )


FN_STRING_SQL = r"""
SELECT p_partkey,
       translate(p_name, 'abcdefghijklmnopqrstuvwxyz', 'ABCDEFGHIJKLMNOPQRSTUVWXYZ') AS name_upper,
       substring(p_type, 1, 5) AS type_prefix,
       p_brand || '#' || p_type AS brand_type,
       CAST(length(trim(p_name)) AS INTEGER) AS name_len,
       regexp_extract(p_name, '^(\w+)', 1) AS first_word
FROM part
"""


def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(
            F.to_date(F.lit("2002-01-01")), F.col("o_orderdate").cast("date")
        ).cast("int").alias("days_before_ref"),
    )


FN_DATE_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
            AS INTEGER) AS days_before_ref
FROM orders
"""


def fn_math_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs + CASE WHEN tiered pricing + coalesce (per-row double math
    — deterministic IEEE in both engines)."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # decimal-exact: round(double) disagrees across engines at half
        # boundaries (Spark rounds the shortest decimal repr, DuckDB the
        # binary value) — price*0.9 lands on exact .xx5 often
        F.round(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * F.lit("0.9").cast("decimal(3,2)"),
            2,
        )
        .cast("double")
        .alias("discounted_90"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.when(F.col("l_quantity") > 40, F.lit("bulk"))
        .when(F.col("l_quantity") > 20, F.lit("mid"))
        .otherwise(F.lit("small"))
        .alias("qty_tier"),
        F.coalesce(F.col("l_tax"), F.lit(0.0)).alias("tax_filled"),
    )


FN_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(CAST(CASE WHEN isfinite(l_extendedprice) THEN l_extendedprice END AS DECIMAL(18,4))
                  * CAST(0.9 AS DECIMAL(3,2)), 2) AS DOUBLE) AS discounted_90,
       ABS(l_discount - 0.05) AS disc_dev,
       CASE WHEN l_quantity > 40 THEN 'bulk'
            WHEN l_quantity > 20 THEN 'mid'
            ELSE 'small' END AS qty_tier,
       COALESCE(l_tax, 0.0) AS tax_filled
FROM lineitem
"""


def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string column.

    The extracted value is accepted only when it is an INTEGRAL string,
    checked identically on both engines: a bare cross-engine cast would
    diverge the moment the generator emits a decimal or junk value —
    Spark's non-ANSI cast returns NULL on '50.5', DuckDB CAST rounds it
    to 51 (and hard-errors on non-numeric), verified empirically."""
    ev = t(spark, sf_dir, "events")
    k_str = F.get_json_object(F.col("props"), "$.k")
    # \A..\z not ^..$: Java's $ matches BEFORE a final newline (so
    # '123\n' would pass here and int-cast-trim to 123) while DuckDB's
    # regexp_full_match rejects it. {1,9} digits: under Spark 4's
    # default ANSI mode a 10+-digit integral string would make
    # cast('int') THROW rather than null out; 9 digits always fits.
    prop_k = F.when(k_str.rlike(r"\A-?[0-9]{1,9}\z"), k_str.cast("int"))
    return (
        ev.select(
            "event_id",
            "event_type",
            prop_k.alias("prop_k"),
        )
        .filter(F.col("prop_k") > 50)
    )


# json_valid guard: DuckDB's json_extract_string hard-errors on ANY
# malformed non-NULL props ('', '   ', 'not json', a truncated object)
# where Spark's get_json_object returns NULL — the empty-string drift
# sweep found the '' case; the guard covers the whole class.
FN_JSON_SQL = """
WITH x AS (
  SELECT event_id, event_type,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN json_extract_string(props, '$.k') END AS k_str
  FROM events
)
SELECT event_id, event_type,
       TRY_CAST(k_str AS INTEGER) AS prop_k
FROM x
WHERE regexp_full_match(k_str, '-?[0-9]{1,9}')
  AND TRY_CAST(k_str AS INTEGER) > 50
"""
# TRY_CAST, not CAST: DuckDB gives WHERE conjuncts no evaluation order,
# so a hard CAST could run on a k_str the regexp predicate rejects
# (a 19-digit integral overflows INT32 with a loud ConversionException
# — malformed-JSON probe, round 11). On regexp-passing strings TRY_CAST
# and CAST are identical, so the base path is unchanged.


def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split → array → explode + array_contains."""
    part = t(spark, sf_dir, "part")
    words = part.select(
        "p_partkey",
        F.split(F.col("p_type"), " ").alias("type_words"),
    )
    return words.select(
        "p_partkey",
        F.explode(F.col("type_words")).alias("type_word"),
        F.array_contains(F.col("type_words"), "STANDARD").alias("is_standard"),
        F.size(F.col("type_words")).cast("int").alias("n_words"),
    )


FN_ARRAY_SQL = """
SELECT p_partkey,
       unnest(string_split(p_type, ' ')) AS type_word,
       list_contains(string_split(p_type, ' '), 'STANDARD') AS is_standard,
       CAST(len(string_split(p_type, ' ')) AS INTEGER) AS n_words
FROM part
"""


QUERIES: dict[str, Query] = {
    "fn_string": Query(fn_string, FN_STRING_SQL, "string functions"),
    "fn_date": Query(fn_date, FN_DATE_SQL, "date functions"),
    "fn_math_cond": Query(fn_math_cond, FN_MATH_SQL, "math + CASE WHEN"),
    "fn_json": Query(fn_json, FN_JSON_SQL, "JSON extraction"),
    "fn_array": Query(fn_array, FN_ARRAY_SQL, "split/explode/contains"),
}

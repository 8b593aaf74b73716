"""Round-6 eighth wave: Benford first-digit audit and Herfindahl
concentration — two data-quality diagnostics over the events stream.

``dq_benford`` is the classic anomaly/fraud screen: natural
multi-magnitude measurements follow Benford's law, and a metric whose
first-digit histogram departs from it was probably generated, capped,
or tampered with. ``agg_hhi`` is the Herfindahl–Hirschman index of the
per-day event-type mix — the concentration companion to ``agg_gini``'s
impurity (HHI = Σ share², the antitrust/market-concentration form).

The reference delegates all analytics of this shape to its
warehouse/gold tier (reference README.md:108-118 declares it but ships
no implementation); these keys are engine-native equivalents.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import Query
from ._util import dec, fquant, t

# ------------------------------------------------------------- dq_benford

#: Benford expected share per leading digit d: log10(1 + 1/d). Computed
#: ONCE here in Python and injected as nine double literals — libm
#: ``log10`` never runs inside either engine, so the expectation column
#: cannot drift (the same no-transcendentals stance as llm_bigram_lm).
BENFORD_P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit histogram of ``value`` vs Benford's law.
    The digit is extracted from the EXACT DECIMAL(18,4) rendering of the
    value (both engines print a scale-4 decimal with identical digits —
    never from the double's shortest-repr string, which is
    engine-formatted), via the first [1-9] in the string; value > 0
    guarantees one exists. Expected shares are compile-time literals
    (see ``BENFORD_P``), so the deviation column is one IEEE subtraction
    of bit-identical doubles.

    Scale: one map-side-combinable 9-group count; the grand total is a
    window over the 9-row count relation (the naive second aggregation
    branch would re-scan the corpus) and the expectation rides in as a
    CASE projection — no join at all."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") > 0)
    )
    digit = F.regexp_extract(dec("value").cast("string"), "[1-9]", 0).cast(
        "int"
    )
    cnt = ev.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    # the grand total is a window over the 9-row count relation — a
    # second aggregation branch would re-scan and re-count the corpus
    # (Catalyst duplicates the subtree); the single-partition exchange
    # here moves 9 rows
    cnt = cnt.withColumn("total", F.sum("n").over(Window.partitionBy()))
    expected = F.when(F.col("digit") == 1, F.lit(BENFORD_P[1]))
    for d in range(2, 10):
        expected = expected.when(F.col("digit") == d, F.lit(BENFORD_P[d]))
    obs = F.col("n").cast("double") / F.col("total").cast("double")
    return (
        cnt
        .select(
            F.col("digit").cast("long").alias("digit"),
            F.col("n").cast("long").alias("n"),
            fquant(obs, 6).alias("obs_share"),
            fquant(expected, 6).alias("benford_share"),
            fquant(obs - expected, 6).alias("deviation"),
        )
    )


_BENFORD_CASE = " ".join(
    f"WHEN digit = {d} THEN {BENFORD_P[d]!r}" for d in range(1, 10)
)

DQ_BENFORD_SQL = f"""
WITH cnt AS (
    SELECT CAST(regexp_extract(
               CAST(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(18,4)) AS VARCHAR), '[1-9]', 0)
           AS INT) AS digit,
           COUNT(*) AS n
    FROM events WHERE value IS NOT NULL AND value > 0
    GROUP BY 1
), tot AS (SELECT SUM(n) AS total FROM cnt)
SELECT CAST(digit AS BIGINT) AS digit,
       CAST(n AS BIGINT) AS n,
       floor(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) * 1000000.0)
           / 1000000.0 AS obs_share,
       floor((CASE {_BENFORD_CASE} END) * 1000000.0) / 1000000.0
           AS benford_share,
       floor((CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
              - (CASE {_BENFORD_CASE} END)) * 1000000.0) / 1000000.0
           AS deviation
FROM cnt CROSS JOIN tot
"""


# ---------------------------------------------------------------- agg_hhi

def agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of the per-day event-type mix:
    ``HHI = Σ_t (c_t / total)²`` — 1/k for a uniform k-type day, → 1 as
    one type dominates. Computed as ``Σc² / total²``: every term is an
    exact integer (counts < 2³·⁵ squared stay far under 2⁵³), so the
    final value is ONE double division of bit-identical operands.

    Scale: one (day, type) count shuffle (map-side combinable), then a
    re-aggregate over the days×types count relation — same
    two-tier shape as agg_gini/agg_mode."""
    ev = t(spark, sf_dir, "events").select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    )
    cnt = ev.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        cnt.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("c").alias("total"),
            # squares in decimal: BIGINT c*c would overflow at extreme
            # per-key volumes; DECIMAL(18,0)^2 is exact to 10^37
            F.sum(F.col("c").cast("decimal(18,0)")
                  * F.col("c").cast("decimal(18,0)")).alias("ssq"),
        )
        .select(
            "day",
            "n_types",
            F.col("total").cast("long").alias("n_events"),
            fquant(
                F.col("ssq").cast("double")
                / (F.col("total").cast("double")
                   * F.col("total").cast("double")),
                6,
            ).alias("hhi"),
        )
    )


AGG_HHI_SQL = """
WITH cnt AS (
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
           COUNT(*) AS c
    FROM events GROUP BY 1, 2
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(c) AS BIGINT) AS n_events,
       floor(CAST(SUM(CAST(c AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0)))
                  AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
             * 1000000.0) / 1000000.0 AS hhi
FROM cnt GROUP BY day
"""


QUERIES: dict[str, Query] = {
    "dq_benford": Query(
        dq_benford, DQ_BENFORD_SQL,
        "first-digit Benford audit; expectations as literals, no libm",
    ),
    "agg_hhi": Query(
        agg_hhi, AGG_HHI_SQL,
        "per-day Herfindahl concentration of the event-type mix",
    ),
}

"""Round-7 nineteenth wave: mean reciprocal rank, total-variation
drift, forecast backtesting, and trade-graph reciprocity.

``ml_mrr`` completes the ranking-eval triad (NDCG grades positions,
P/R@K grades set membership, MRR grades time-to-first-hit — the metric
search teams report). ``dq_tvd_drift`` is the distribution-drift
measure with NO distributional math at all: total variation distance
between the first and second half of the corpus stays exactly rational
until one final division (the drift complement of ml_chi2's
significance test and agg_ks_test's continuous-variable check — TVD is
what you threshold, χ² is what you alarm on). ``ml_forecast_eval``
backtests the two forecasters every pipeline compares against (naive
and seasonal-naive) with walk-forward one-step errors — the baseline
ts_holt has to beat to earn its keep. ``graph_reciprocity`` measures
mutuality on the DIRECTED customer-nation → supplier-nation trade
graph (the engine's other graphs are symmetric by construction; trade
is not — reciprocity is the first genuinely directed statistic).

The reference delegates all analytics of this shape to its
warehouse/gold tier (reference README.md:108-118 declares the tier but
ships no implementation); these keys are engine-native equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import Query
from ._util import dec, fquant, t

# ---------------------------------------------------------------------- ml_mrr

#: Fixed-point scale for reciprocal ranks: each user contributes
#: floor(10¹²/k) for first-relevant rank k — ONE IEEE division of exact
#: integers, floored — so the cross-user MEAN is a sum of exact BIGINTs
#: (order-independent) into one final division. Mirrors RA_SCALE.
MRR_SCALE = 1_000_000_000_000


def ml_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level mean reciprocal rank of ``value`` as a purchase
    score: rank each user's events (value DESC, event_id ASC — the
    ml_ndcg total order), find the first purchase, average 1/rank over
    the users who have one. The time-to-first-hit member of the
    ranking-eval triad (NDCG: positions; P/R@K: membership; MRR: how
    fast the first relevant item surfaces — what search teams report).

    Determinism: first-relevant rank is an exact integer (min over a
    total order); each reciprocal is floor(10¹²/k) — one IEEE division,
    floored — summed as exact BIGINTs; MRR is one final division.
    Users with no purchase are counted (n_users vs n_with_hit) but
    contribute nothing — the coverage split is part of the metric.

    Scale: one user_id window shuffle, one per-user collapse, one
    1-row aggregate. Nothing joins."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    ranked = ev.select(
        "user_id",
        (F.col("event_type") == "purchase").cast("int").alias("rel"),
        F.row_number().over(w).alias("rn"),
    )
    per = ranked.groupBy("user_id").agg(
        F.min(F.when(F.col("rel") == 1, F.col("rn"))).alias("first_hit"),
    )
    rr = F.when(
        F.col("first_hit").isNotNull(),
        F.floor(
            F.lit(float(MRR_SCALE)) / F.col("first_hit").cast("double")
        ).cast("long"),
    ).otherwise(F.lit(0))
    out = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(
            F.when(F.col("first_hit").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_with_hit"),
        F.sum(rr).cast("long").alias("rr_scaled_sum"),
    )
    return out.select(
        "n_users",
        "n_with_hit",
        "rr_scaled_sum",
        F.when(
            F.col("n_with_hit") > 0,
            fquant(
                F.col("rr_scaled_sum").cast("double")
                / (F.col("n_with_hit") * MRR_SCALE).cast("double"),
                6,
            ),
        ).alias("mrr"),
    )


ML_MRR_SQL = f"""
WITH ranked AS (
    SELECT user_id,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY value DESC, event_id ASC) AS rn
    FROM events WHERE value IS NOT NULL
), per AS (
    SELECT user_id, MIN(CASE WHEN rel = 1 THEN rn END) AS first_hit
    FROM ranked GROUP BY user_id
), agg AS (
    SELECT COUNT(*) AS n_users,
           SUM(CASE WHEN first_hit IS NOT NULL THEN 1 ELSE 0 END)
             AS n_with_hit,
           SUM(CASE WHEN first_hit IS NOT NULL THEN
                 CAST(floor({float(MRR_SCALE)}
                            / CAST(first_hit AS DOUBLE)) AS BIGINT)
               ELSE 0 END) AS rr_scaled_sum
    FROM per
)
SELECT CAST(n_users AS BIGINT) AS n_users,
       CAST(n_with_hit AS BIGINT) AS n_with_hit,
       CAST(rr_scaled_sum AS BIGINT) AS rr_scaled_sum,
       CASE WHEN n_with_hit > 0 THEN
         floor(CAST(rr_scaled_sum AS DOUBLE)
               / CAST(n_with_hit * {MRR_SCALE} AS DOUBLE)
               * 1000000.0) / 1000000.0 END AS mrr
FROM agg
"""


# --------------------------------------------------------------- dq_tvd_drift


def dq_tvd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total variation distance between the event-type mix of the
    corpus's first and second half (split at the midpoint epoch-day):
    TVD = ½ Σ_t |p_t − q_t| — the largest possible probability gap a
    consumer of the stream could observe. The THRESHOLDABLE drift
    number (ml_chi2 answers "is the drift significant", TVD answers
    "how big is it" — dashboards plot this one).

    Determinism: FULLY rational until one division —
    |p_t − q_t| = |c1_t·n2 − c2_t·n1| / (n1·n2), so the per-type
    numerators and their total are exact integers (DECIMAL(38,0) /
    HUGEINT products) over the common denominator 2·n1·n2. The split
    point is (min_day + max_day + 1) DIV 2 — exact integers off one
    pre-aggregation.

    Scale: the corpus collapses to (type, day) counts in ONE
    map-side-combinable shuffle; min/max day, half totals and the TVD
    total all ride windows over that days×types relation. The 1-row
    split bound never leaves the executors."""
    ev = t(spark, sf_dir, "events")
    per_day = ev.groupBy(
        "event_type",
        F.date_diff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(F.count(F.lit(1)).alias("c"))
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mid = F.expr("(min(d) OVER () + max(d) OVER () + 1) DIV 2")
    halved = per_day.select(
        "event_type",
        "c",
        (F.col("d") < mid).alias("in_first"),
    )
    per_type = halved.groupBy("event_type").agg(
        F.sum(F.when(F.col("in_first"), F.col("c")).otherwise(0))
        .alias("c1"),
        F.sum(F.when(~F.col("in_first"), F.col("c")).otherwise(0))
        .alias("c2"),
    )
    n1 = F.sum("c1").over(wall)
    n2 = F.sum("c2").over(wall)
    num = F.abs(
        F.col("c1").cast("decimal(38,0)") * n2.cast("decimal(38,0)")
        - F.col("c2").cast("decimal(38,0)") * n1.cast("decimal(38,0)")
    )
    staged = per_type.select(
        "event_type",
        F.col("c1").cast("long").alias("c1"),
        F.col("c2").cast("long").alias("c2"),
        num.alias("num"),
        n1.alias("n1"),
        n2.alias("n2"),
    )
    tot = F.sum("num").over(wall)
    den2 = (
        F.lit(2).cast("decimal(38,0)")
        * F.col("n1").cast("decimal(38,0)")
        * F.col("n2").cast("decimal(38,0)")
    )
    # empty-half guard: a corpus whose first or second half holds no
    # events (single-day data puts EVERYTHING in half 2 — mid equals
    # the only day) has no comparison distribution; TVD is undefined —
    # NULL, never a divide (Spark 4 ANSI throws on /0). NULL cells,
    # never fabricated zeros, per the engine's panel-estimator contract.
    ok = (F.col("n1") > 0) & (F.col("n2") > 0)
    return staged.select(
        "event_type",
        "c1",
        "c2",
        fquant(
            F.when(ok, F.col("num").cast("double") / den2.cast("double")), 9
        ).alias("contrib"),
        fquant(
            F.when(ok, tot.cast("double") / den2.cast("double")), 9
        ).alias("tvd"),
    )


DQ_TVD_DRIFT_SQL = """
WITH per_day AS (
    SELECT event_type,
           date_diff('day', DATE '1970-01-01',
                     CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d,
           COUNT(*) AS c
    FROM events GROUP BY 1, 2
), halved AS (
    SELECT event_type, c,
           d < (MIN(d) OVER () + MAX(d) OVER () + 1) // 2 AS in_first
    FROM per_day
), per_type AS (
    SELECT event_type,
           SUM(CASE WHEN in_first THEN c ELSE 0 END) AS c1,
           SUM(CASE WHEN NOT in_first THEN c ELSE 0 END) AS c2
    FROM halved GROUP BY 1
), staged AS (
    SELECT event_type, c1, c2,
           abs(CAST(c1 AS HUGEINT) * SUM(c2) OVER ()
               - CAST(c2 AS HUGEINT) * SUM(c1) OVER ()) AS num,
           SUM(c1) OVER () AS n1,
           SUM(c2) OVER () AS n2
    FROM per_type
)
SELECT event_type,
       CAST(c1 AS BIGINT) AS c1,
       CAST(c2 AS BIGINT) AS c2,
       CASE WHEN n1 > 0 AND n2 > 0 THEN
         floor(CAST(num AS DOUBLE)
               / CAST(2 * CAST(n1 AS HUGEINT) * CAST(n2 AS HUGEINT)
                      AS DOUBLE)
               * 1000000000.0) / 1000000000.0 END AS contrib,
       CASE WHEN n1 > 0 AND n2 > 0 THEN
         floor(CAST(SUM(num) OVER () AS DOUBLE)
               / CAST(2 * CAST(n1 AS HUGEINT) * CAST(n2 AS HUGEINT)
                      AS DOUBLE)
               * 1000000000.0) / 1000000000.0 END AS tvd
FROM staged
"""


# ------------------------------------------------------------ ml_forecast_eval

#: MAPE terms are floor(10⁶·|e|/actual) — exact scaled integers summed
#: exactly; days whose previous-step actual is 0 are EXCLUDED and
#: counted (the standard MAPE degenerate-term treatment, surfaced
#: rather than silently skipped).
MAPE_SCALE = 1_000_000
SNAIVE_LAG = 7


def ml_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward backtest of the two baseline forecasters on the
    per-type daily-total series: naive (ŷ_t = y_{t−1}) and
    seasonal-naive (ŷ_t = y_{t−7}), scored by MAE and MAPE on
    one-step-ahead errors. Every forecasting pipeline publishes these
    baselines — a model (ts_holt) that can't beat seasonal-naive is
    retired; this key is the bar it must clear.

    Determinism: daily totals are exact scaled BIGINTs; absolute
    errors are exact integer differences; MAE is an exact integer sum
    into one division; each MAPE term is floor(10⁶·|e|/y_prev) — one
    IEEE division of exact integers, floored — summed exactly.
    Zero-actual MAPE terms are excluded and REPORTED (n_mape_skipped).

    Scale: one map-side-combinable collapse to (type, day), lag
    windows on the days-sized relation, one per-type aggregate."""
    # ts IS NOT NULL: no timestamp = no day on the series axis (round 9)
    ev = t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "event_type",
        F.date_diff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    ).agg(F.sum((dec("value") * 10000).cast("long")).alias("v"))
    wlag = Window.partitionBy("event_type").orderBy(F.col("d").asc())
    staged = daily.select(
        "event_type",
        "v",
        F.lag("v", 1).over(wlag).alias("p1"),
        F.lag("v", SNAIVE_LAG).over(wlag).alias("p7"),
    )
    e1 = F.abs(F.col("v") - F.col("p1"))
    e7 = F.abs(F.col("v") - F.col("p7"))
    mape_term = F.when(
        F.col("p1").isNotNull() & (F.col("p1") > 0),
        F.floor(
            (e1 * MAPE_SCALE).cast("double") / F.col("p1").cast("double")
        ).cast("long"),
    )
    per = staged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.when(F.col("p1").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_naive"),
        F.sum(F.when(F.col("p1").isNotNull(), e1)).alias("ae1"),
        F.sum(F.when(F.col("p7").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_snaive"),
        F.sum(F.when(F.col("p7").isNotNull(), e7)).alias("ae7"),
        F.sum(mape_term).alias("mape_sum"),
        F.sum(
            F.when(
                F.col("p1").isNotNull() & (F.col("p1") <= 0), 1
            ).otherwise(0)
        ).cast("long").alias("n_mape_skipped"),
    )
    return per.select(
        "event_type",
        "n_days",
        F.when(
            F.col("n_naive") > 0,
            fquant(
                F.col("ae1").cast("double")
                / (F.col("n_naive") * 10000).cast("double"),
                6,
            ),
        ).alias("mae_naive"),
        F.when(
            F.col("n_snaive") > 0,
            fquant(
                F.col("ae7").cast("double")
                / (F.col("n_snaive") * 10000).cast("double"),
                6,
            ),
        ).alias("mae_snaive"),
        F.when(
            (F.col("n_naive") - F.col("n_mape_skipped")) > 0,
            fquant(
                F.col("mape_sum").cast("double")
                / (
                    (F.col("n_naive") - F.col("n_mape_skipped"))
                    * (MAPE_SCALE // 100)
                ).cast("double"),
                6,
            ),
        ).alias("mape_naive_pct"),
        "n_mape_skipped",
    )


ML_FORECAST_EVAL_SQL = f"""
WITH daily AS (
    SELECT event_type,
           date_diff('day', DATE '1970-01-01',
                     CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d,
           SUM(CAST(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS v
    FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1, 2
), staged AS (
    SELECT event_type, v,
           LAG(v, 1) OVER (PARTITION BY event_type ORDER BY d ASC) AS p1,
           LAG(v, {SNAIVE_LAG}) OVER (PARTITION BY event_type
                                      ORDER BY d ASC) AS p7
    FROM daily
), per AS (
    SELECT event_type,
           COUNT(*) AS n_days,
           SUM(CASE WHEN p1 IS NOT NULL THEN 1 ELSE 0 END) AS n_naive,
           SUM(CASE WHEN p1 IS NOT NULL THEN abs(v - p1) END) AS ae1,
           SUM(CASE WHEN p7 IS NOT NULL THEN 1 ELSE 0 END) AS n_snaive,
           SUM(CASE WHEN p7 IS NOT NULL THEN abs(v - p7) END) AS ae7,
           SUM(CASE WHEN p1 IS NOT NULL AND p1 > 0 THEN
                 CAST(floor(CAST(abs(v - p1) * {MAPE_SCALE} AS DOUBLE)
                            / CAST(p1 AS DOUBLE)) AS BIGINT)
               END) AS mape_sum,
           SUM(CASE WHEN p1 IS NOT NULL AND p1 <= 0 THEN 1 ELSE 0 END)
             AS n_mape_skipped
    FROM staged GROUP BY 1
)
SELECT event_type,
       CAST(n_days AS BIGINT) AS n_days,
       CASE WHEN n_naive > 0 THEN
         floor(CAST(ae1 AS DOUBLE) / CAST(n_naive * 10000 AS DOUBLE)
               * 1000000.0) / 1000000.0 END AS mae_naive,
       CASE WHEN n_snaive > 0 THEN
         floor(CAST(ae7 AS DOUBLE) / CAST(n_snaive * 10000 AS DOUBLE)
               * 1000000.0) / 1000000.0 END AS mae_snaive,
       CASE WHEN n_naive - n_mape_skipped > 0 THEN
         floor(CAST(mape_sum AS DOUBLE)
               / CAST((n_naive - n_mape_skipped)
                      * {MAPE_SCALE // 100} AS DOUBLE)
               * 1000000.0) / 1000000.0 END AS mape_naive_pct,
       CAST(n_mape_skipped AS BIGINT) AS n_mape_skipped
FROM per
"""


# ---------------------------------------------------------- graph_reciprocity


def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity of the DIRECTED nation trade graph: each lineitem is
    a customer-nation → supplier-nation edge (who buys from whom), and
    per unordered nation pair the key reports both directed weights
    and 2·min(w_ab, w_ba)/(w_ab + w_ba) — 1 when trade is perfectly
    mutual, 0 when one-way. The engine's other graphs (co-order,
    supply) are symmetric by construction; trade is the first
    genuinely directed relation, and reciprocity is THE directed-graph
    health statistic (balanced vs extractive trade).

    Determinism: weights are exact lineitem counts; min/sum are
    integers; one division per pair, floor-quantized.

    Scale: the lineitem⋈orders join shuffles on the orderkey grain
    (both sides keyed — AQE skew-splits hot orders); the three
    dimension attaches broadcast; then ONE map-side-combinable
    collapse onto directed nation pairs (≤ 25² rows) and a pair-level
    regroup. Self-trade (a = b) is excluded — domestic flow is not
    reciprocity."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    directed = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nat.select(
                F.col("n_nationkey").alias("ck"),
                F.col("n_name").alias("cust_nation"),
            )),
            F.col("c_nationkey") == F.col("ck"),
        )
        .join(
            F.broadcast(nat.select(
                F.col("n_nationkey").alias("sk"),
                F.col("n_name").alias("supp_nation"),
            )),
            F.col("s_nationkey") == F.col("sk"),
        )
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    paired = directed.groupBy(
        F.least("cust_nation", "supp_nation").alias("nation_a"),
        F.greatest("cust_nation", "supp_nation").alias("nation_b"),
    ).agg(
        F.sum(
            F.when(F.col("cust_nation") < F.col("supp_nation"), F.col("w"))
            .otherwise(0)
        ).alias("w_ab"),
        F.sum(
            F.when(F.col("cust_nation") > F.col("supp_nation"), F.col("w"))
            .otherwise(0)
        ).alias("w_ba"),
    )
    return paired.select(
        "nation_a",
        "nation_b",
        F.col("w_ab").cast("long").alias("w_ab"),
        F.col("w_ba").cast("long").alias("w_ba"),
        fquant(
            (2 * F.least("w_ab", "w_ba")).cast("double")
            / (F.col("w_ab") + F.col("w_ba")).cast("double"),
            6,
        ).alias("reciprocity"),
    )


GRAPH_RECIPROCITY_SQL = """
WITH directed AS (
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           COUNT(*) AS w
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY 1, 2
)
SELECT least(cust_nation, supp_nation) AS nation_a,
       greatest(cust_nation, supp_nation) AS nation_b,
       CAST(SUM(CASE WHEN cust_nation < supp_nation THEN w ELSE 0 END)
            AS BIGINT) AS w_ab,
       CAST(SUM(CASE WHEN cust_nation > supp_nation THEN w ELSE 0 END)
            AS BIGINT) AS w_ba,
       floor(CAST(2 * least(
                SUM(CASE WHEN cust_nation < supp_nation THEN w ELSE 0 END),
                SUM(CASE WHEN cust_nation > supp_nation THEN w ELSE 0 END))
              AS DOUBLE)
             / CAST(SUM(w) AS DOUBLE)
             * 1000000.0) / 1000000.0 AS reciprocity
FROM directed
GROUP BY 1, 2
"""


QUERIES: dict[str, Query] = {
    "ml_mrr": Query(
        ml_mrr, ML_MRR_SQL,
        "mean reciprocal rank of purchase retrieval (exact scaled sum)",
    ),
    "dq_tvd_drift": Query(
        dq_tvd_drift, DQ_TVD_DRIFT_SQL,
        "total variation distance, first vs second corpus half",
    ),
    "ml_forecast_eval": Query(
        ml_forecast_eval, ML_FORECAST_EVAL_SQL,
        "naive / seasonal-naive one-step backtest (MAE + MAPE)",
    ),
    "graph_reciprocity": Query(
        graph_reciprocity, GRAPH_RECIPROCITY_SQL,
        "directed nation trade-graph reciprocity per pair",
    ),
}

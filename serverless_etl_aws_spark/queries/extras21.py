"""Round-7 twelfth wave: survival analysis, robust (winsorized) means,
and funnel latency — the remaining product-analytics primitives next to
win_retention (cohorts), agg_funnel (conversion counts) and the robust
stats family (MAD / trimmed concentration).

``ml_survival_km`` is the Kaplan-Meier churn curve — retention's
survival-analysis twin, with proper censoring of still-active users.
``agg_winsorized_mean`` is the robust location estimate monitoring
pipelines prefer over the raw mean when a metric has heavy tails
(clamp at rank-based p10/p90, then average). ``agg_conversion_lag``
measures HOW LONG view→purchase conversion takes (agg_funnel counts
whether it happens), in exact integer microseconds.

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

# ------------------------------------------------------------ ml_survival_km


def ml_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user LIFETIME (days from first to
    last activity): a user's lifetime "ends" at their last active day
    (churn); users whose last activity falls on the corpus' final day
    are CENSORED (still alive when observation ended — counted at risk
    through their observed duration, never as deaths; dropping
    censoring is the classic way to overstate churn). The timeline is
    duration, not calendar date — the standard KM formulation, and what
    keeps the curve informative when activity clusters near the
    corpus boundary. Output per duration with deaths: the at-risk
    count, deaths, and the KM estimate Π(1 − dᵢ/nᵢ).

    Determinism: dᵢ and nᵢ are exact integers (suffix sums over the
    ≤#days² duration×last-day relation); each factor is one double
    division of integers, and the survival product is a SEQUENTIAL
    fold over the frame-ordered factor list (the ts_ewma pattern —
    both engines multiply in the same order, bit-identical IEEE; a
    log-sum would drag in libm, banned from hash-checked keys).

    Scale: the corpus collapses to the (user, first, last) relation in
    one map-side-combinable shuffle, then to the duration-sized
    lifetime relation; every window and the fold run on that tiny
    relation."""
    ev = t(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("fd"),
        F.max(F.to_date("ts")).alias("ld"),
    )
    g = users.groupBy(
        F.datediff("ld", "fd").cast("int").alias("dur"), "ld"
    ).agg(F.count(F.lit(1)).alias("n_users"))
    w_full = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mx = F.max("ld").over(w_full)
    per_dur = (
        g.select(
            "dur",
            F.when(F.col("ld") < mx, F.col("n_users"))
            .otherwise(F.lit(0))
            .alias("d_part"),
            F.col("n_users").alias("all_part"),
        )
        .groupBy("dur")
        .agg(
            F.sum("d_part").alias("deaths"),
            F.sum("all_part").alias("n_all"),
        )
    )
    w_sfx = Window.orderBy("dur").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_asc = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = F.sum("n_all").over(w_sfx)
    staged = per_dur.select(
        "dur",
        at_risk.alias("n_at_risk"),
        F.col("deaths"),
        (
            F.lit(1.0)
            - F.col("deaths").cast("double") / at_risk.cast("double")
        ).alias("factor"),
    )
    surv = F.aggregate(
        F.collect_list("factor").over(w_asc),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )
    return (
        staged.select(
            "dur", "n_at_risk", "deaths", surv.alias("surv")
        )
        .filter(F.col("deaths") > 0)
        .select(
            F.col("dur").alias("duration_days"),
            F.col("n_at_risk").cast("long").alias("n_at_risk"),
            F.col("deaths").cast("long").alias("n_churned"),
            fquant(F.col("surv"), 6).alias("km_survival"),
        )
    )


ML_SURVIVAL_KM_SQL = """
WITH users AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS fd,
           MAX(CAST(ts AS DATE)) AS ld
    FROM events GROUP BY 1
), g AS (
    SELECT CAST(datediff('day', fd, ld) AS INT) AS dur, ld,
           COUNT(*) AS n_users
    FROM users GROUP BY 1, 2
), fixed AS (
    SELECT dur,
           SUM(deaths_w) AS deaths,
           SUM(n_all_w) AS n_all
    FROM (
        SELECT dur,
               CASE WHEN ld < MAX(ld) OVER () THEN n_users ELSE 0 END
                 AS deaths_w,
               n_users AS n_all_w
        FROM g
    ) GROUP BY dur
), staged AS (
    SELECT dur,
           SUM(n_all) OVER (ORDER BY dur ROWS BETWEEN CURRENT ROW AND
               UNBOUNDED FOLLOWING) AS n_at_risk,
           deaths,
           1.0 - CAST(deaths AS DOUBLE)
                 / CAST(SUM(n_all) OVER (ORDER BY dur ROWS BETWEEN
                        CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE)
             AS factor
    FROM fixed
), folded AS (
    SELECT dur, n_at_risk, deaths,
           list(factor) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS factors
    FROM staged
)
SELECT CAST(dur AS INT) AS duration_days,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(deaths AS BIGINT) AS n_churned,
       floor(
         list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
                                  CAST(factors AS DOUBLE[])),
                     (acc, x) -> acc * x)
         * 1000000.0) / 1000000.0 AS km_survival
FROM folded
WHERE deaths > 0
"""


# ------------------------------------------------------- agg_winsorized_mean

#: Winsorization ranks: clamp below the ceil(n/10)-th and above the
#: ceil(9n/10)-th order statistic (rank-based — "discontinuous"
#: percentiles, exact integers; interpolated bounds would re-introduce
#: engine-ordered float arithmetic for no statistical benefit here).
WINSOR_LO_NUM, WINSOR_HI_NUM = 1, 9
WINSOR_DEN = 10


def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of ``value`` per event type: clamp every value
    into the [p10, p90] rank-based band, then take the decimal-exact
    mean — the robust location estimate that tolerates heavy tails and
    entry errors where the raw mean does not (reported alongside it for
    contrast). Bounds are ORDER STATISTICS (elements of the data, exact
    integer ranks), so clamped values stay on the fixture's 4-decimal
    grid and the decimal-sum discipline applies unchanged.

    Scale: one per-type ordered window pass assigns ranks (a per-key
    sort — the exact path; at 100 TB the default flips to sketch
    quantile bounds per agg_approx_quantile and this stays the audit
    path), then one map-side-combinable groupBy for the clamped sums.
    Rank ties break on event_id so both engines pick identical bound
    elements."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    w_full = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type", "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(w_full).alias("n"),
    )
    lo_rank = F.floor(
        (F.col("n") * WINSOR_LO_NUM + (WINSOR_DEN - 1)) / WINSOR_DEN
    )
    hi_rank = F.floor(
        (F.col("n") * WINSOR_HI_NUM + (WINSOR_DEN - 1)) / WINSOR_DEN
    )
    bounded = ranked.select(
        "event_type", "value", "n",
        F.max(F.when(F.col("rn") == lo_rank, F.col("value"))).over(
            w_full
        ).alias("lo"),
        F.max(F.when(F.col("rn") == hi_rank, F.col("value"))).over(
            w_full
        ).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        bounded.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("lo").alias("lo"),
            F.max("hi").alias("hi"),
            F.sum(dec(clamped)).alias("sw"),
            F.sum(dec("value")).alias("sv"),
        )
        .select(
            "event_type", "n", "lo", "hi",
            fquant(F.col("sw").cast("double") / F.col("n"), 4).alias(
                "winsorized_mean"
            ),
            fquant(F.col("sv").cast("double") / F.col("n"), 4).alias(
                "raw_mean"
            ),
        )
    )


AGG_WINSORIZED_MEAN_SQL = f"""
WITH ranked AS (
    SELECT event_type, value, event_id,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY value ASC, event_id ASC) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events WHERE value IS NOT NULL
), bounded AS (
    SELECT event_type, value, n,
           MAX(CASE WHEN rn = CAST(floor((n * {WINSOR_LO_NUM}
                    + {WINSOR_DEN - 1}) / {WINSOR_DEN}) AS BIGINT)
                    THEN value END)
             OVER (PARTITION BY event_type) AS lo,
           MAX(CASE WHEN rn = CAST(floor((n * {WINSOR_HI_NUM}
                    + {WINSOR_DEN - 1}) / {WINSOR_DEN}) AS BIGINT)
                    THEN value END)
             OVER (PARTITION BY event_type) AS hi
    FROM ranked
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n,
       MAX(lo) AS lo,
       MAX(hi) AS hi,
       floor(CAST(SUM(CAST(least(greatest(value, lo), hi)
                           AS DECIMAL(18,4))) AS DOUBLE)
             / MAX(n) * 10000.0) / 10000.0 AS winsorized_mean,
       floor(CAST(SUM(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(18,4))) AS DOUBLE)
             / MAX(n) * 10000.0) / 10000.0 AS raw_mean
FROM bounded
GROUP BY event_type
"""


# -------------------------------------------------------- agg_conversion_lag


def agg_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion latency: for every user whose first
    purchase follows their first view, the lag in exact integer
    microseconds — count, min, max, decimal-exact mean, and the exact
    rank-based median (element at rank ⌈n/2⌉). ``agg_funnel`` counts
    WHO converts; this measures HOW FAST, the metric funnel-stage SLAs
    threshold on.

    Determinism: all lags are integer µs (unix_micros ↔ epoch_us); the
    mean is one double division of an exact DECIMAL sum, the median is
    an ELEMENT (no interpolation), ranks tie-break nowhere because the
    ranked set is per-user distinct lags ordered (lag, user_id).

    Scale: one map-side-combinable per-user groupBy (conditional MINs —
    never a self-join), then the user-sized lag relation takes one
    ordered window for the median rank and one 1-row aggregate."""
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("first_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("first_purchase"),
    )
    lags = per_user.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") > F.col("first_view"))
    ).select(
        "user_id",
        (F.col("first_purchase") - F.col("first_view")).alias("lag_us"),
    )
    w = Window.orderBy(F.col("lag_us").asc(), F.col("user_id").asc())
    w_full = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = lags.select(
        "lag_us",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(w_full).alias("n"),
    )
    med_rank = F.floor((F.col("n") + 1) / 2)
    return ranked.agg(
        F.max("n").cast("long").alias("n_converted"),
        F.min("lag_us").cast("long").alias("min_lag_us"),
        F.max("lag_us").cast("long").alias("max_lag_us"),
        fquant(
            F.sum(F.col("lag_us").cast("decimal(28,0)")).cast("double")
            / F.max("n"),
            2,
        ).alias("mean_lag_us"),
        F.max(
            F.when(F.col("rn") == med_rank, F.col("lag_us"))
        ).cast("long").alias("p50_lag_us"),
    )


AGG_CONVERSION_LAG_SQL = """
WITH per_user AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view'
                    THEN epoch_us(ts) END) AS first_view,
           MIN(CASE WHEN event_type = 'purchase'
                    THEN epoch_us(ts) END) AS first_purchase
    FROM events GROUP BY 1
), lags AS (
    SELECT user_id, first_purchase - first_view AS lag_us
    FROM per_user
    WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
      AND first_purchase > first_view
), ranked AS (
    SELECT lag_us,
           ROW_NUMBER() OVER (ORDER BY lag_us ASC, user_id ASC) AS rn,
           COUNT(*) OVER () AS n
    FROM lags
)
SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
       CAST(MIN(lag_us) AS BIGINT) AS min_lag_us,
       CAST(MAX(lag_us) AS BIGINT) AS max_lag_us,
       floor(CAST(SUM(CAST(lag_us AS DECIMAL(28,0))) AS DOUBLE)
             / MAX(n) * 100.0) / 100.0 AS mean_lag_us,
       CAST(MAX(CASE WHEN rn = CAST(floor((n + 1) / 2) AS BIGINT)
                     THEN lag_us END) AS BIGINT) AS p50_lag_us
FROM ranked
"""


QUERIES: dict[str, Query] = {
    "ml_survival_km": Query(
        ml_survival_km, ML_SURVIVAL_KM_SQL,
        "Kaplan-Meier churn survival curve with end-of-window censoring",
    ),
    "agg_winsorized_mean": Query(
        agg_winsorized_mean, AGG_WINSORIZED_MEAN_SQL,
        "rank-based winsorized mean per event type (robust location)",
    ),
    "agg_conversion_lag": Query(
        agg_conversion_lag, AGG_CONVERSION_LAG_SQL,
        "view->purchase latency stats in exact integer microseconds",
    ),
}

"""Round-7 eighteenth wave: IQR outlier fences, a generated calendar
dimension, hashing-trick featurization, and cohort LTV curves.

``dq_iqr_outliers`` is Tukey's box-plot fence audit with the 1.5×IQR
arithmetic kept entirely in scaled integers (the fences are 5q₁−3q₃
and 5q₃−3q₁ over DOUBLED values — no 1.5 ever materializes as a
float). ``dim_calendar`` generates the date dimension every warehouse
joins against — no corpus scan at all, pure `sequence`/`explode`.
``ml_feature_hash`` is the hashing-trick featurizer (Weinberger et al.,
ICML 2009) producing sparse signed bag-of-words features WITHOUT a
vocabulary pass — and without a Python UDF: the token hash is the
md5-low-bits convention the SimHash oracle graduation established
(operators/dedup.py:319), computed JVM-side via md5/substring/conv.
``ml_ltv_cohort`` is the cumulative-revenue-per-user curve by signup
cohort — the retention table's (win_retention) revenue-weighted twin.

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

# ---------------------------------------------------------- dq_iqr_outliers


def dq_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey box-plot outlier audit per event type: exact rank-based
    quartiles (q₁ at rank ⌈n/4⌉, q₃ at rank ⌈3n/4⌉ — selected, never
    interpolated) and the count of values outside the 1.5×IQR fences.
    The distribution-shape complement of dq_spc's 3σ chart: σ-based
    limits assume symmetry, Tukey fences don't.

    Determinism: values are exact scaled BIGINTs; the fences are
    compared in DOUBLED integer space (2v < 5q₁ − 3q₃ ⟺
    v < q₁ − 1.5·IQR), so the 1.5 multiplier never exists as a float —
    the whole audit is integer arithmetic until the two rendered
    quartiles (one exact division each).

    Scale: ONE hash shuffle on event_type; the quartile extraction
    rides the same rank window (max-of-case over the partition), and
    the outlier counts aggregate the same windowed relation — no
    second scan, no self-join."""
    ev = t(spark, sf_dir, "events").filter(
        # finite values only: a non-finite value has no rank on the
        # exact decimal grid (dec() NULLs it, and NULL ordering
        # diverges NULLS FIRST/LAST between engines) — oracle isfinite
        F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.abs("value") != float("inf"))
    )
    v = (dec("value") * 10000).cast("long")
    wrank = Window.partitionBy("event_type").orderBy(
        F.col("v").asc(), F.col("event_id").asc()
    )
    wall = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = ev.select(
        "event_type",
        "event_id",
        v.alias("v"),
    ).select(
        "event_type",
        "v",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    q1 = F.max(
        F.when(F.col("rn") == F.expr("(n + 3) DIV 4"), F.col("v"))
    ).over(wall)
    q3 = F.max(
        F.when(F.col("rn") == F.expr("(3 * n + 3) DIV 4"), F.col("v"))
    ).over(wall)
    fenced = ranked.select(
        "event_type",
        "v",
        "n",
        q1.alias("q1s"),
        q3.alias("q3s"),
    )
    per = fenced.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.max("q1s").alias("q1s"),
        F.max("q3s").alias("q3s"),
        F.sum(
            F.when(
                2 * F.col("v") < 5 * F.col("q1s") - 3 * F.col("q3s"), 1
            ).otherwise(0)
        ).cast("long").alias("n_low"),
        F.sum(
            F.when(
                2 * F.col("v") > 5 * F.col("q3s") - 3 * F.col("q1s"), 1
            ).otherwise(0)
        ).cast("long").alias("n_high"),
    )
    return per.select(
        "event_type",
        "n",
        (F.col("q1s").cast("double") / 10000.0).alias("q1"),
        (F.col("q3s").cast("double") / 10000.0).alias("q3"),
        "n_low",
        "n_high",
    )


DQ_IQR_OUTLIERS_SQL = """
WITH ranked AS (
    SELECT event_type,
           CAST(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY CAST(CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(18,4))
                                            * 10000 AS BIGINT) ASC,
                                       event_id ASC) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events WHERE value IS NOT NULL AND isfinite(value)
), fenced AS (
    SELECT event_type, v, n,
           MAX(CASE WHEN rn = (n + 3) // 4 THEN v END)
             OVER (PARTITION BY event_type) AS q1s,
           MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN v END)
             OVER (PARTITION BY event_type) AS q3s
    FROM ranked
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(q1s) AS DOUBLE) / 10000.0 AS q1,
       CAST(MAX(q3s) AS DOUBLE) / 10000.0 AS q3,
       CAST(SUM(CASE WHEN 2 * v < 5 * q1s - 3 * q3s THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN 2 * v > 5 * q3s - 3 * q1s THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high
FROM fenced GROUP BY event_type
"""


# -------------------------------------------------------------- dim_calendar

CAL_START = "1992-01-01"
CAL_END = "1998-12-31"


def dim_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar dimension over the TPC-H date span — the
    role-playing dimension every warehouse joins order/ship/receipt
    dates against. Generated, not scanned: `sequence` + `explode`
    produces the 2,557 days with ZERO corpus I/O, which is exactly how
    a production calendar dim is minted (then persisted once).

    Attributes stay in the cross-engine-safe set: numeric
    year/quarter/month/day, epoch-day, ISO weekday (Spark weekday()+1
    == DuckDB isodow — the round-4 equivalence), a pure-integer week
    index (epoch_day DIV 7 — no ISO-week-numbering semantics, which
    DIFFER between engines at year boundaries), and the weekend flag.

    Scale: 365 rows/year — the definition of broadcast-sized; the
    `sf_dir` parameter is accepted for the registry signature and
    unused."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(CAL_START).cast("date"),
                F.lit(CAL_END).cast("date"),
            )
        ).alias("cal_date")
    )
    epoch_day = F.date_diff(
        F.col("cal_date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    isodow = (F.weekday("cal_date") + 1).cast("int")
    return days.select(
        F.date_format("cal_date", "yyyy-MM-dd").alias("cal_date"),
        epoch_day.alias("epoch_day"),
        F.year("cal_date").cast("int").alias("year"),
        F.quarter("cal_date").cast("int").alias("quarter"),
        F.month("cal_date").cast("int").alias("month"),
        F.dayofmonth("cal_date").cast("int").alias("day_of_month"),
        isodow.alias("iso_dow"),
        F.expr(
            "CAST(date_diff(cal_date, CAST('1970-01-01' AS DATE)) "
            "DIV 7 AS BIGINT)"
        ).alias("week_index"),
        (isodow >= 6).alias("is_weekend"),
    )


DIM_CALENDAR_SQL = f"""
WITH days AS (
    SELECT CAST(unnest(generate_series(DATE '{CAL_START}',
                                       DATE '{CAL_END}',
                                       INTERVAL 1 DAY)) AS DATE)
             AS cal_date
)
SELECT strftime(cal_date, '%Y-%m-%d') AS cal_date,
       CAST(date_diff('day', DATE '1970-01-01', cal_date) AS BIGINT)
         AS epoch_day,
       CAST(year(cal_date) AS INT) AS year,
       CAST(quarter(cal_date) AS INT) AS quarter,
       CAST(month(cal_date) AS INT) AS month,
       CAST(day(cal_date) AS INT) AS day_of_month,
       CAST(isodow(cal_date) AS INT) AS iso_dow,
       CAST(date_diff('day', DATE '1970-01-01', cal_date) // 7
            AS BIGINT) AS week_index,
       isodow(cal_date) >= 6 AS is_weekend
FROM days
"""


# ------------------------------------------------------------ ml_feature_hash

#: Feature-space width for the hashing trick. Collisions are part of
#: the contract (that's what makes it vocabulary-free); the signed
#: hash makes collision noise zero-mean (Weinberger et al. 2009).
FH_DIM = 64


def ml_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer over documents: sparse signed
    bag-of-words features with NO vocabulary pass — feature index
    = token-hash mod ``FH_DIM``, contribution = ±1 by one extra hash
    bit, summed per (doc, index). How a 100 TB corpus gets fixed-width
    model inputs without the vocabulary build dedup pipelines can't
    afford.

    Engine posture: entirely JVM-side (split → explode → md5 →
    substring → conv — whole-stage codegen, no Python): the token's
    64-bit hash follows the md5-low-bits convention the SimHash
    graduation established (operators/dedup.py:319 — the integer IS
    DuckDB's ``md5_number_upper``), so bits 0–15 give the dimension
    and bit 16 the sign on BOTH engines natively.

    Scale: one explode + one map-side-combinable (doc, dim) shuffle;
    output ≤ FH_DIM rows per doc by construction."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.coalesce(F.col("text"), F.lit("")), " "),
                lambda x: x != "",
            )
        ).alias("tk"),
    )
    h = F.md5(F.col("tk"))
    b0 = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    b1 = F.conv(F.substring(h, 3, 2), 16, 10).cast("long")
    b2 = F.conv(F.substring(h, 5, 2), 16, 10).cast("long")
    feat = tok.select(
        "doc_id",
        ((b0 + 256 * b1) % FH_DIM).cast("int").alias("dim"),
        ((b2 % 2) * 2 - 1).alias("sgn"),
    )
    return (
        feat.groupBy("doc_id", "dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("sgn").cast("long").alias("feature"),
        )
    )


ML_FEATURE_HASH_SQL = f"""
WITH tok AS (
    SELECT doc_id,
           unnest(list_filter(string_split(COALESCE(text, ''), ' '),
                              x -> x <> '')) AS tk
    FROM documents
), feat AS (
    SELECT doc_id,
           CAST((md5_number_upper(tk) & 65535) % {FH_DIM} AS INT)
             AS dim,
           CAST((md5_number_upper(tk) >> 16) & 1 AS BIGINT) * 2 - 1
             AS sgn
    FROM tok
)
SELECT doc_id, dim,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(sgn) AS BIGINT) AS feature
FROM feat GROUP BY doc_id, dim
"""


# -------------------------------------------------------------- ml_ltv_cohort


def ml_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: users are cohorted by the week of their FIRST
    event (pure-integer epoch week — no calendar-week semantics), and
    each cohort's cumulative purchase value per user is tracked across
    age-in-weeks — win_retention's revenue-weighted twin (retention
    says who came back, LTV says what that was worth). The curve a
    growth team reads the payback period off.

    Determinism: week indices are exact integers (epoch_day DIV 7);
    revenue accumulates in exact decimal (order-independent decimal
    window sums, the ts_cusum stance); cohort size is an exact
    distinct count; the single division per row renders LTV via an
    exact scaled BIGINT (the decimal→double 1-ulp guard).

    Scale: one user_id window shuffle to stamp cohorts, one
    map-side-combinable (cohort, age) collapse, then the cumulative
    window runs on the cohorts×ages-sized relation."""
    # ts IS NOT NULL: no timestamp = no cohort week (round 9)
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    week = (
        F.date_diff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        / F.lit(7)
    )
    wuser = Window.partitionBy("user_id")
    stamped = ev.select(
        "user_id",
        F.floor(week).cast("long").alias("wk"),
        F.when(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull(),
            dec("value"),
        ).otherwise(F.lit(0).cast("decimal(18,4)")).alias("rev"),
    ).select(
        "user_id",
        "wk",
        "rev",
        F.min("wk").over(wuser).alias("cohort_week"),
    )
    # cohort size rides the SAME aggregate: every user's first event is
    # an age-0 row, so countDistinct(user) on the age-0 slice IS the
    # cohort size — spread to the other ages by a window over the tiny
    # (cohort, age) relation. One corpus scan, no size-relation rejoin.
    per_age = stamped.groupBy(
        "cohort_week",
        (F.col("wk") - F.col("cohort_week")).alias("age_weeks"),
    ).agg(
        F.sum("rev").alias("rev"),
        F.countDistinct(
            F.when(F.col("wk") == F.col("cohort_week"), F.col("user_id"))
        ).alias("new_users"),
    )
    wcoh = Window.partitionBy("cohort_week").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy(F.col("age_weeks").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = per_age.select(
        "cohort_week",
        "age_weeks",
        F.max(
            F.when(F.col("age_weeks") == 0, F.col("new_users"))
        ).over(wcoh).alias("cohort_users"),
        F.sum("rev").over(wcum).alias("cum_rev"),
    )
    cum_scaled = (F.col("cum_rev") * 10000).cast("long")
    return curve.select(
        F.col("cohort_week").cast("long").alias("cohort_week"),
        F.col("age_weeks").cast("long").alias("age_weeks"),
        F.col("cohort_users").cast("long").alias("cohort_users"),
        (cum_scaled.cast("double") / 10000.0).alias("cum_revenue"),
        fquant(
            cum_scaled.cast("double")
            / (F.col("cohort_users") * 10000).cast("double"),
            6,
        ).alias("ltv_per_user"),
    )


ML_LTV_COHORT_SQL = """
WITH stamped AS (
    -- FLOOR division, not //: DuckDB's // truncates toward zero while
    -- the engine's F.floor rounds toward -inf — they differ on
    -- PRE-EPOCH dates (day -3: floor -> week -1, // -> week 0). The
    -- epoch-week contract is floor (a date belongs to the week that
    -- STARTED before it), mirrored as floor(days / 7.0) on both
    -- engines (CAST to DOUBLE so DuckDB doesn't fold 7.0 as decimal).
    SELECT user_id,
           CAST(floor(date_diff('day', DATE '1970-01-01',
                     CAST(CAST(ts AS TIMESTAMP) AS DATE))
                      / CAST(7 AS DOUBLE)) AS BIGINT) AS wk,
           CASE WHEN event_type = 'purchase' AND value IS NOT NULL
                THEN CAST(CASE WHEN isfinite(value) THEN value END AS DECIMAL(18,4))
                ELSE CAST(0 AS DECIMAL(18,4)) END AS rev,
           MIN(CAST(floor(date_diff('day', DATE '1970-01-01',
                         CAST(CAST(ts AS TIMESTAMP) AS DATE))
                          / CAST(7 AS DOUBLE)) AS BIGINT))
             OVER (PARTITION BY user_id) AS cohort_week
    FROM events WHERE ts IS NOT NULL
), per_age AS (
    SELECT cohort_week, wk - cohort_week AS age_weeks,
           SUM(rev) AS rev,
           COUNT(DISTINCT CASE WHEN wk = cohort_week
                               THEN user_id END) AS new_users
    FROM stamped GROUP BY 1, 2
), curve AS (
    SELECT cohort_week, age_weeks,
           MAX(CASE WHEN age_weeks = 0 THEN new_users END)
             OVER (PARTITION BY cohort_week) AS cohort_users,
           SUM(rev) OVER (PARTITION BY cohort_week
                          ORDER BY age_weeks ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS cum_rev
    FROM per_age
)
SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
       CAST(age_weeks AS BIGINT) AS age_weeks,
       CAST(cohort_users AS BIGINT) AS cohort_users,
       CAST(CAST(cum_rev * 10000 AS BIGINT) AS DOUBLE) / 10000.0
         AS cum_revenue,
       floor(CAST(CAST(cum_rev * 10000 AS BIGINT) AS DOUBLE)
             / CAST(cohort_users * 10000 AS DOUBLE)
             * 1000000.0) / 1000000.0 AS ltv_per_user
FROM curve
"""


QUERIES: dict[str, Query] = {
    "dq_iqr_outliers": Query(
        dq_iqr_outliers, DQ_IQR_OUTLIERS_SQL,
        "Tukey 1.5-IQR outlier fences per event type (exact ranks)",
    ),
    "dim_calendar": Query(
        dim_calendar, DIM_CALENDAR_SQL,
        "generated calendar dimension (zero corpus I/O)",
    ),
    "ml_feature_hash": Query(
        ml_feature_hash, ML_FEATURE_HASH_SQL,
        "hashing-trick signed bag-of-words features (pure JVM)",
    ),
    "ml_ltv_cohort": Query(
        ml_ltv_cohort, ML_LTV_COHORT_SQL,
        "cohort LTV curve: cumulative revenue per user by age",
    ),
}

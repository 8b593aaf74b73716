"""Round-7 twenty-second wave: temporal integrity, weighted medians,
difference-in-differences, and revenue share drift.

``dq_temporal_integrity`` audits the causality constraint a schema
can't declare (a lineitem cannot ship before its order was placed) —
the cross-table twin of dq_referential's key edges and
dq_out_of_order's stream discipline. ``agg_weighted_median`` selects
the quantity-weighted median price per brand by exact cumulative-
weight rank — the robust price point a pricing team quotes (unweighted
medians over-count slow movers). ``ml_diff_in_diff`` closes the
experimentation family: arm-B-minus-arm-A, second-half-minus-first-
half — the estimator that removes time trends a plain A/B readout
confounds. ``agg_share_shift`` is the revenue-weighted complement of
dq_tvd_drift's count-mix drift: which nations GAINED share between the
corpus halves, in exact decimal.

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
from .extras24 import AB_CONV_MIN

# ------------------------------------------------------ dq_temporal_integrity


def dq_temporal_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causality audit of the order→ship timeline: per order priority,
    how many lineitems SHIPPED BEFORE their order was placed
    (violations a schema cannot declare but every downstream latency
    metric silently inherits), plus the fulfillment-lag profile
    (min/max/exact-integer-day bounds) for the sane rows. The
    cross-table constraint the reference's Glue job never checks
    before publishing silver (bronze_to_silver.py validates nothing).

    Determinism: lags are exact epoch-day integer differences; counts
    are integers; the mean lag is one division, floor-quantized.

    Scale: ONE orderkey-grain shuffle join (both sides keyed, AQE
    skew-splits hot orders) and one map-side-combinable collapse per
    priority class."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = F.date_diff(
        F.to_date("l_shipdate"), F.to_date("o_orderdate")
    ).cast("long")
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).select("o_orderpriority", lag.alias("lag_days"))
    per = joined.groupBy(
        F.col("o_orderpriority").alias("priority")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("lag_days") < 0, 1).otherwise(0)
        ).cast("long").alias("n_violations"),
        F.min("lag_days").cast("long").alias("min_lag_days"),
        F.max("lag_days").cast("long").alias("max_lag_days"),
        F.sum(
            F.when(F.col("lag_days") >= 0, F.col("lag_days"))
        ).alias("lag_sum"),
        F.sum(
            F.when(F.col("lag_days") >= 0, 1).otherwise(0)
        ).alias("n_ok"),
    )
    return per.select(
        "priority",
        "n",
        "n_violations",
        "min_lag_days",
        "max_lag_days",
        F.when(
            F.col("n_ok") > 0,
            fquant(
                F.col("lag_sum").cast("double")
                / F.col("n_ok").cast("double"),
                6,
            ),
        ).alias("mean_lag_days"),
    )


DQ_TEMPORAL_INTEGRITY_SQL = """
WITH joined AS (
    SELECT o.o_orderpriority AS priority,
           date_diff('day', CAST(CAST(o.o_orderdate AS TIMESTAMP) AS DATE),
                     CAST(CAST(l.l_shipdate AS TIMESTAMP) AS DATE))
             AS lag_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), per AS (
    SELECT priority,
           COUNT(*) AS n,
           SUM(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END) AS n_violations,
           MIN(lag_days) AS min_lag_days,
           MAX(lag_days) AS max_lag_days,
           SUM(CASE WHEN lag_days >= 0 THEN lag_days END) AS lag_sum,
           SUM(CASE WHEN lag_days >= 0 THEN 1 ELSE 0 END) AS n_ok
    FROM joined GROUP BY 1
)
SELECT priority,
       CAST(n AS BIGINT) AS n,
       CAST(n_violations AS BIGINT) AS n_violations,
       CAST(min_lag_days AS BIGINT) AS min_lag_days,
       CAST(max_lag_days AS BIGINT) AS max_lag_days,
       CASE WHEN n_ok > 0 THEN
         floor(CAST(lag_sum AS DOUBLE) / CAST(n_ok AS DOUBLE)
               * 1000000.0) / 1000000.0 END AS mean_lag_days
FROM per
"""


# --------------------------------------------------------- agg_weighted_median


def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median unit price per brand: order lineitems
    by price within brand and select the first price whose cumulative
    shipped quantity reaches half the brand's total — the price point
    at which half the VOLUME (not half the line count) trades. The
    weighted member of the exact-selection family (win_rolling_median,
    agg_winsorized_mean, dq_iqr_outliers all select by unweighted
    rank).

    Determinism: prices and quantities live on the fixture's decimal
    grids, so cumulative weights are exact scaled BIGINTs and the
    selection predicate 2·cum ≥ total (doubled-integer form — no 0.5
    float) picks a unique first row via the (price, orderkey,
    linenumber) total order.

    Scale: one brand-partitioned window shuffle (cumulative weight is
    O(1) state per row) with the part dim broadcast onto the fact
    scan; the argmin-selection window shares the same partitioning."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_linenumber",
        "l_extendedprice", "l_quantity",
    ).filter(
        # null prices can't be ranked (Spark ASC is NULLS FIRST, DuckDB
        # NULLS LAST) and null quantities carry no weight — filter both.
        # Non-finite values have no position on the exact decimal grid
        # either (dec() NULLs them) — same exclusion, oracle isfinite.
        F.col("l_extendedprice").isNotNull()
        & ~F.isnan("l_extendedprice")
        & (F.abs("l_extendedprice") != float("inf"))
        & F.col("l_quantity").isNotNull()
        & ~F.isnan("l_quantity")
        & (F.abs("l_quantity") != float("inf"))
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rows = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select(
        "p_brand",
        (dec("l_extendedprice") * 10000).cast("long").alias("price_s"),
        (dec("l_quantity") * 10000).cast("long").alias("qty_s"),
        "l_orderkey",
        "l_linenumber",
    )
    worder = (
        Window.partitionBy("p_brand")
        .orderBy(
            F.col("price_s").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("p_brand").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = rows.select(
        "p_brand",
        "price_s",
        F.sum("qty_s").over(worder).alias("cum_w"),
        F.sum("qty_s").over(wall).alias("tot_w"),
        F.count(F.lit(1)).over(wall).alias("n"),
    ).filter(2 * F.col("cum_w") >= F.col("tot_w"))
    wpick = Window.partitionBy("p_brand").orderBy(
        F.col("cum_w").asc(), F.col("price_s").asc()
    )
    picked = staged.select(
        "p_brand",
        "price_s",
        "tot_w",
        "n",
        F.row_number().over(wpick).alias("rk"),
    ).filter(F.col("rk") == 1)
    return picked.select(
        F.col("p_brand").alias("brand"),
        F.col("n").cast("long").alias("n_lines"),
        (F.col("tot_w").cast("double") / 10000.0).alias("total_qty"),
        (F.col("price_s").cast("double") / 10000.0)
        .alias("weighted_median_price"),
    )


AGG_WEIGHTED_MEDIAN_SQL = """
WITH rows_ AS (
    SELECT p.p_brand,
           CAST(CAST(CASE WHEN isfinite(l.l_extendedprice) THEN l.l_extendedprice END AS DECIMAL(18,4)) * 10000
                AS BIGINT) AS price_s,
           CAST(CAST(CASE WHEN isfinite(l.l_quantity) THEN l.l_quantity END AS DECIMAL(18,4)) * 10000
                AS BIGINT) AS qty_s,
           l.l_orderkey, l.l_linenumber
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_extendedprice IS NOT NULL AND isfinite(l.l_extendedprice)
      AND l.l_quantity IS NOT NULL AND isfinite(l.l_quantity)
), staged AS (
    SELECT p_brand, price_s,
           SUM(qty_s) OVER (PARTITION BY p_brand
                            ORDER BY price_s ASC, l_orderkey ASC,
                                     l_linenumber ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_w,
           SUM(qty_s) OVER (PARTITION BY p_brand) AS tot_w,
           COUNT(*) OVER (PARTITION BY p_brand) AS n
    FROM rows_
), picked AS (
    SELECT p_brand, price_s, tot_w, n,
           ROW_NUMBER() OVER (PARTITION BY p_brand
                              ORDER BY cum_w ASC, price_s ASC) AS rk
    FROM staged WHERE 2 * cum_w >= tot_w
)
SELECT p_brand AS brand,
       CAST(n AS BIGINT) AS n_lines,
       CAST(tot_w AS DOUBLE) / 10000.0 AS total_qty,
       CAST(price_s AS DOUBLE) / 10000.0 AS weighted_median_price
FROM picked WHERE rk = 1
"""


# -------------------------------------------------------------- ml_diff_in_diff


def ml_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on the A/B split across the corpus
    halves: per-user conversion in (arm, period) cells, DiD =
    (p_B2 − p_B1) − (p_A2 − p_A1). A plain A/B readout (ml_ab_test)
    confounds treatment with time trend; DiD removes any trend common
    to both arms — the panel estimator every experimentation review
    reaches for when the rollout wasn't a clean switch.

    A user's period is the corpus half of their FIRST event (users
    don't straddle); the split midpoint is exact integer arithmetic
    off the per-day collapse (the dq_tvd_drift convention).

    Determinism: all four cells are exact integer (n, conv) pairs
    from one per-user collapse; the four rates and the two-level
    difference are identical double trees (single divisions, three
    subtractions); any empty cell yields NULL via guards.

    Scale: one per-user shuffle, a 4-row cell aggregate, a 1-row
    pivot."""
    ev = t(spark, sf_dir, "events")
    day = F.date_diff(
        F.to_date("ts"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= AB_CONV_MIN),
                1,
            ).otherwise(0)
        ).alias("conv"),
        F.min(day).alias("first_day"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mid = F.expr(
        "(min(first_day) OVER () + max(first_day) OVER () + 1) DIV 2"
    )
    # pmod, never % (ARCHITECTURE.md bucketing convention; oracle
    # mirrors with ((x % 2) + 2) % 2 so negative ids keep arm in {0,1}).
    cells = per_user.select(
        F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("arm"),
        (F.col("first_day") >= mid).cast("int").alias("period"),
        "conv",
    ).groupBy("arm", "period").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("conv").alias("c"),
    )
    def cell(a: int, p: int, col: str):
        return F.sum(
            F.when((F.col("arm") == a) & (F.col("period") == p), F.col(col))
        )
    wide = cells.agg(
        cell(0, 0, "n").alias("n_a1"), cell(0, 0, "c").alias("c_a1"),
        cell(0, 1, "n").alias("n_a2"), cell(0, 1, "c").alias("c_a2"),
        cell(1, 0, "n").alias("n_b1"), cell(1, 0, "c").alias("c_b1"),
        cell(1, 1, "n").alias("n_b2"), cell(1, 1, "c").alias("c_b2"),
    )
    def rate(c: str, n: str):
        return F.col(c).cast("double") / F.col(n).cast("double")
    ok = (
        F.col("n_a1").isNotNull() & F.col("n_a2").isNotNull()
        & F.col("n_b1").isNotNull() & F.col("n_b2").isNotNull()
    )
    did = (rate("c_b2", "n_b2") - rate("c_b1", "n_b1")) - (
        rate("c_a2", "n_a2") - rate("c_a1", "n_a1")
    )
    return wide.select(
        F.col("n_a1").cast("long").alias("n_a1"),
        F.col("n_a2").cast("long").alias("n_a2"),
        F.col("n_b1").cast("long").alias("n_b1"),
        F.col("n_b2").cast("long").alias("n_b2"),
        F.when(F.col("n_a1").isNotNull(), fquant(rate("c_a1", "n_a1"), 6))
        .alias("rate_a1"),
        F.when(F.col("n_a2").isNotNull(), fquant(rate("c_a2", "n_a2"), 6))
        .alias("rate_a2"),
        F.when(F.col("n_b1").isNotNull(), fquant(rate("c_b1", "n_b1"), 6))
        .alias("rate_b1"),
        F.when(F.col("n_b2").isNotNull(), fquant(rate("c_b2", "n_b2"), 6))
        .alias("rate_b2"),
        F.when(ok, fquant(did, 6)).alias("did"),
    )


ML_DIFF_IN_DIFF_SQL = f"""
WITH per_user AS (
    SELECT user_id,
           MAX(CASE WHEN event_type = 'purchase'
                     AND value >= {AB_CONV_MIN} THEN 1 ELSE 0 END)
             AS conv,
           MIN(date_diff('day', DATE '1970-01-01',
                         CAST(CAST(ts AS TIMESTAMP) AS DATE)))
             AS first_day
    FROM events GROUP BY user_id
), marked AS (
    SELECT CAST(((user_id % 2) + 2) % 2 AS INT) AS arm,
           CAST(first_day >= (MIN(first_day) OVER ()
                              + MAX(first_day) OVER () + 1) // 2
                AS INT) AS period,
           conv
    FROM per_user
), cells AS (
    SELECT arm, period, COUNT(*) AS n, SUM(conv) AS c
    FROM marked GROUP BY 1, 2
), wide AS (
    SELECT
      SUM(CASE WHEN arm = 0 AND period = 0 THEN n END) AS n_a1,
      SUM(CASE WHEN arm = 0 AND period = 0 THEN c END) AS c_a1,
      SUM(CASE WHEN arm = 0 AND period = 1 THEN n END) AS n_a2,
      SUM(CASE WHEN arm = 0 AND period = 1 THEN c END) AS c_a2,
      SUM(CASE WHEN arm = 1 AND period = 0 THEN n END) AS n_b1,
      SUM(CASE WHEN arm = 1 AND period = 0 THEN c END) AS c_b1,
      SUM(CASE WHEN arm = 1 AND period = 1 THEN n END) AS n_b2,
      SUM(CASE WHEN arm = 1 AND period = 1 THEN c END) AS c_b2
    FROM cells
)
SELECT CAST(n_a1 AS BIGINT) AS n_a1,
       CAST(n_a2 AS BIGINT) AS n_a2,
       CAST(n_b1 AS BIGINT) AS n_b1,
       CAST(n_b2 AS BIGINT) AS n_b2,
       CASE WHEN n_a1 IS NOT NULL THEN
         floor(CAST(c_a1 AS DOUBLE) / CAST(n_a1 AS DOUBLE)
               * 1000000.0) / 1000000.0 END AS rate_a1,
       CASE WHEN n_a2 IS NOT NULL THEN
         floor(CAST(c_a2 AS DOUBLE) / CAST(n_a2 AS DOUBLE)
               * 1000000.0) / 1000000.0 END AS rate_a2,
       CASE WHEN n_b1 IS NOT NULL THEN
         floor(CAST(c_b1 AS DOUBLE) / CAST(n_b1 AS DOUBLE)
               * 1000000.0) / 1000000.0 END AS rate_b1,
       CASE WHEN n_b2 IS NOT NULL THEN
         floor(CAST(c_b2 AS DOUBLE) / CAST(n_b2 AS DOUBLE)
               * 1000000.0) / 1000000.0 END AS rate_b2,
       CASE WHEN n_a1 IS NOT NULL AND n_a2 IS NOT NULL
             AND n_b1 IS NOT NULL AND n_b2 IS NOT NULL THEN
         floor(((CAST(c_b2 AS DOUBLE) / CAST(n_b2 AS DOUBLE)
                 - CAST(c_b1 AS DOUBLE) / CAST(n_b1 AS DOUBLE))
                - (CAST(c_a2 AS DOUBLE) / CAST(n_a2 AS DOUBLE)
                   - CAST(c_a1 AS DOUBLE) / CAST(n_a1 AS DOUBLE)))
               * 1000000.0) / 1000000.0 END AS did
FROM wide
"""


# --------------------------------------------------------------- agg_share_shift


def agg_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share drift per customer nation between the corpus
    halves (split at the midpoint order date): who GAINED share? The
    revenue-weighted complement of dq_tvd_drift (that key drifts event
    COUNTS; markets drift in MONEY), and the table a quarterly review
    opens with.

    Determinism: half revenues are exact decimal sums; shares render
    through exact scaled BIGINTs with one division each; the split
    midpoint is exact integer arithmetic off the per-day collapse.

    Scale: orders⋈customer with the dim broadcast, ONE
    map-side-combinable (nation, half) collapse, then windows over the
    ≤25×2 relation."""
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice",
        F.date_diff(
            F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("d"),
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    mid = F.expr("(min(d) OVER () + max(d) OVER () + 1) DIV 2")
    marked = orders.select(
        "o_custkey",
        dec("o_totalprice").alias("rev"),
        (F.col("d") >= mid).cast("int").alias("half"),
    )
    per = (
        marked.join(F.broadcast(cust), marked.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.when(F.col("half") == 0, F.col("rev"))
                  .otherwise(F.lit(0).cast("decimal(18,4)"))).alias("rev1"),
            F.sum(F.when(F.col("half") == 1, F.col("rev"))
                  .otherwise(F.lit(0).cast("decimal(18,4)"))).alias("rev2"),
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r1 = (F.col("rev1") * 10000).cast("long")
    r2 = (F.col("rev2") * 10000).cast("long")
    t1 = (F.sum("rev1").over(wall) * 10000).cast("long")
    t2 = (F.sum("rev2").over(wall) * 10000).cast("long")
    # empty-half guard: a single-day order book puts every order in
    # half 2 (d >= mid always holds), so half 1's total is 0 and its
    # shares are undefined — NULL, never a divide (Spark 4 ANSI throws
    # on /0); the delta needs both halves.
    share1 = F.when(t1 > 0, r1.cast("double") / t1.cast("double"))
    share2 = F.when(t2 > 0, r2.cast("double") / t2.cast("double"))
    return per.select(
        "nation",
        (r1.cast("double") / 10000.0).alias("rev_h1"),
        (r2.cast("double") / 10000.0).alias("rev_h2"),
        fquant(share1, 6).alias("share_h1"),
        fquant(share2, 6).alias("share_h2"),
        fquant(share2 - share1, 6).alias("share_delta"),
    )


AGG_SHARE_SHIFT_SQL = """
WITH orders_d AS (
    SELECT o_custkey,
           CAST(CASE WHEN isfinite(o_totalprice) THEN o_totalprice END AS DECIMAL(18,4)) AS rev,
           date_diff('day', DATE '1970-01-01',
                     CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE)) AS d
    FROM orders
), marked AS (
    SELECT o_custkey, rev,
           CAST(d >= (MIN(d) OVER () + MAX(d) OVER () + 1) // 2
                AS INT) AS half
    FROM orders_d
), per AS (
    SELECT n.n_name AS nation,
           SUM(CASE WHEN half = 0 THEN rev
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS rev1,
           SUM(CASE WHEN half = 1 THEN rev
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS rev2
    FROM marked m
    JOIN customer c ON m.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
)
SELECT nation,
       CAST(CAST(rev1 * 10000 AS BIGINT) AS DOUBLE) / 10000.0
         AS rev_h1,
       CAST(CAST(rev2 * 10000 AS BIGINT) AS DOUBLE) / 10000.0
         AS rev_h2,
       CASE WHEN CAST(SUM(rev1) OVER () * 10000 AS BIGINT) > 0 THEN
         floor(CAST(CAST(rev1 * 10000 AS BIGINT) AS DOUBLE)
               / CAST(CAST(SUM(rev1) OVER () * 10000 AS BIGINT) AS DOUBLE)
               * 1000000.0) / 1000000.0 END AS share_h1,
       CASE WHEN CAST(SUM(rev2) OVER () * 10000 AS BIGINT) > 0 THEN
         floor(CAST(CAST(rev2 * 10000 AS BIGINT) AS DOUBLE)
               / CAST(CAST(SUM(rev2) OVER () * 10000 AS BIGINT) AS DOUBLE)
               * 1000000.0) / 1000000.0 END AS share_h2,
       CASE WHEN CAST(SUM(rev1) OVER () * 10000 AS BIGINT) > 0
             AND CAST(SUM(rev2) OVER () * 10000 AS BIGINT) > 0 THEN
         floor((CAST(CAST(rev2 * 10000 AS BIGINT) AS DOUBLE)
                / CAST(CAST(SUM(rev2) OVER () * 10000 AS BIGINT) AS DOUBLE)
                - CAST(CAST(rev1 * 10000 AS BIGINT) AS DOUBLE)
                  / CAST(CAST(SUM(rev1) OVER () * 10000 AS BIGINT)
                         AS DOUBLE))
               * 1000000.0) / 1000000.0 END AS share_delta
FROM per
"""


QUERIES: dict[str, Query] = {
    "dq_temporal_integrity": Query(
        dq_temporal_integrity, DQ_TEMPORAL_INTEGRITY_SQL,
        "ship-before-order causality audit + fulfillment lag profile",
    ),
    "agg_weighted_median": Query(
        agg_weighted_median, AGG_WEIGHTED_MEDIAN_SQL,
        "quantity-weighted median price per brand (exact selection)",
    ),
    "ml_diff_in_diff": Query(
        ml_diff_in_diff, ML_DIFF_IN_DIFF_SQL,
        "difference-in-differences across arms and corpus halves",
    ),
    "agg_share_shift": Query(
        agg_share_shift, AGG_SHARE_SHIFT_SQL,
        "revenue share drift per nation between corpus halves",
    ),
}

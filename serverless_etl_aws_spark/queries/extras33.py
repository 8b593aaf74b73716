"""Round-7 twenty-fourth wave: weekday ANOVA, cross-engine table
checksums, feature screening, and smoothed target encoding.

``ts_anova_weekday`` is the variance-decomposition answer to
ts_seasonal's means: how much of the value variance does day-of-week
EXPLAIN (the F ratio, fully rational in exact moments)?
``dq_table_checksum`` is the replication fingerprint: an
order-insensitive content checksum any engine can recompute — the
check a migration runs after copying 100 TB to prove the copy.
``ml_feature_screen`` is the feature-selection pass every training
pipeline runs first: point-biserial correlation of each numeric
lineitem measure against the return flag, one scan, exact moments.
``ml_target_encode`` is the leakage-aware categorical featurizer
(smoothed category→target-rate mapping with an m-estimate prior) that
replaces one-hot at 100 TB cardinalities.

The reference delegates all analytics of this shape to its
warehouse/gold tier (reference README.md:108-118 declares the tier but
ships no implementation); these keys are engine-native equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import Query
from ._util import dec, fquant, spread, t

# -------------------------------------------------------------- ts_anova_weekday


def ts_anova_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value by ISO weekday: the between-group
    sum of squares (what weekday MEANS explain), the within-group
    remainder, and the F ratio — ts_seasonal reports the weekday
    profile, this key says whether that profile is signal or noise
    shape. One output row (k−1, n−k dof carried as columns).

    Determinism: values live on the 1e-4 grid, so every group's
    (n_g, Σv, Σv²) is exact (scaled BIGINT / DECIMAL(38) squares) and
    both sums of squares are exact rationals with common denominator
    n_g·n: SSB·n·Πn_g and SSW are assembled from integer moments. The
    engine keeps it simpler and still exact: SSB = Σ_g (T_g²/n_g) −
    T²/n and SSW = Σv² − Σ_g (T_g²/n_g) are computed with each
    T_g²/n_g floor-quantized to a 1e6-scaled BIGINT before the
    cross-group sums (the q9 pattern), so group order cannot perturb
    the total; F is one final division.

    Scale: one map-side-combinable collapse onto 7 weekday groups;
    everything else is 7-row arithmetic."""
    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = (dec("value") * 10000).cast("long")
    per = ev.groupBy(
        (F.weekday("ts") + 1).cast("int").alias("isodow"),
    ).agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(v).alias("tg"),
        F.sum(
            v.cast("decimal(38,0)") * v.cast("decimal(38,0)")
        ).alias("sq"),
    )
    # per-group exact term T_g^2 / n_g, quantized to a 1e6-scaled
    # BIGINT before the cross-group sum (order-independent)
    term_q = F.floor(
        (
            F.col("tg").cast("decimal(38,0)")
            * F.col("tg").cast("decimal(38,0)")
        ).cast("double")
        / F.col("ng").cast("double")
        / 1e8  # (1e4 value scale)^2 -> value^2 units
        * 1e6
    ).cast("long")
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ng").alias("n"),
        F.sum("tg").alias("tt"),
        F.sum(F.col("sq").cast("decimal(38,0)")).alias("sq_tot"),
        F.sum(term_q).alias("term_q_sum"),
    )
    n = F.col("n").cast("double")
    grand = (
        F.col("tt").cast("decimal(38,0)")
        * F.col("tt").cast("decimal(38,0)")
    ).cast("double") / n / 1e8
    sq_tot_v = F.col("sq_tot").cast("double") / 1e8
    terms = F.col("term_q_sum").cast("double") / 1e6
    ssb = terms - grand
    ssw = sq_tot_v - terms
    k = F.col("k")
    f_stat = (ssb / (k - 1).cast("double")) / (
        ssw / (F.col("n") - k).cast("double")
    )
    return agg.select(
        k.cast("int").alias("k_groups"),
        F.col("n").cast("long").alias("n"),
        fquant(ssb, 4).alias("ss_between"),
        fquant(ssw, 4).alias("ss_within"),
        F.when(
            (k > 1) & (F.col("n") > k) & (ssw > 0), fquant(f_stat, 6)
        ).alias("f_stat"),
    )


TS_ANOVA_WEEKDAY_SQL = """
WITH per AS (
    SELECT CAST(isodow(ts) AS INT) AS isodow,
           COUNT(*) AS ng,
           SUM(CAST(CAST(CASE WHEN value - (value) = 0 THEN value END AS DECIMAL(18,4)) * 10000 AS BIGINT))
             AS tg,
           SUM(CAST(CAST(CAST(CASE WHEN value - (value) = 0 THEN value END AS DECIMAL(18,4)) * 10000
                         AS BIGINT) AS HUGEINT)
               * CAST(CAST(CAST(CASE WHEN value - (value) = 0 THEN value END AS DECIMAL(18,4)) * 10000
                           AS BIGINT) AS HUGEINT)) AS sq
    FROM events WHERE value IS NOT NULL
    GROUP BY 1
), agg AS (
    SELECT COUNT(*) AS k,
           SUM(ng) AS n,
           SUM(tg) AS tt,
           SUM(sq) AS sq_tot,
           SUM(CAST(floor(CAST(CAST(tg AS HUGEINT) * CAST(tg AS HUGEINT)
                               AS DOUBLE)
                          / CAST(ng AS DOUBLE) / 1e8 * 1e6)
                    AS BIGINT)) AS term_q_sum
    FROM per
)
SELECT CAST(k AS INT) AS k_groups,
       CAST(n AS BIGINT) AS n,
       floor((CAST(term_q_sum AS DOUBLE) / 1e6
              - CAST(CAST(tt AS HUGEINT) * CAST(tt AS HUGEINT)
                     AS DOUBLE) / CAST(n AS DOUBLE) / 1e8)
             * 10000.0) / 10000.0 AS ss_between,
       floor((CAST(sq_tot AS DOUBLE) / 1e8
              - CAST(term_q_sum AS DOUBLE) / 1e6)
             * 10000.0) / 10000.0 AS ss_within,
       CASE WHEN k > 1 AND n > k
             AND CAST(sq_tot AS DOUBLE) / 1e8
                 - CAST(term_q_sum AS DOUBLE) / 1e6 > 0 THEN
         floor(((CAST(term_q_sum AS DOUBLE) / 1e6
                 - CAST(CAST(tt AS HUGEINT) * CAST(tt AS HUGEINT)
                        AS DOUBLE) / CAST(n AS DOUBLE) / 1e8)
                / CAST(k - 1 AS DOUBLE))
               / ((CAST(sq_tot AS DOUBLE) / 1e8
                   - CAST(term_q_sum AS DOUBLE) / 1e6)
                  / CAST(n - k AS DOUBLE))
               * 1000000.0) / 1000000.0 END AS f_stat
FROM agg
"""


# -------------------------------------------------------------- dq_table_checksum

#: Columns folded into each table's content fingerprint. Integer keys
#: and categorical strings ONLY — float columns are excluded because
#: their string rendering is engine-defined (shortest-repr vs printf),
#: which would make the checksum engine-local. That exclusion is the
#: documented contract of a CROSS-ENGINE checksum.
CHECKSUM_COLS = (
    ("orders", ("o_orderkey", "o_custkey", "o_orderstatus",
                "o_orderpriority")),
    ("customer", ("c_custkey", "c_nationkey", "c_mktsegment")),
    ("lineitem", ("l_orderkey", "l_linenumber", "l_partkey",
                  "l_suppkey", "l_returnflag", "l_linestatus")),
    ("part", ("p_partkey", "p_brand", "p_type", "p_size")),
    ("supplier", ("s_suppkey", "s_nationkey",)),
    ("events", ("event_id", "user_id", "event_type")),
    ("documents", ("doc_id", "lang", "source", "n_chars")),
)

CHECKSUM_MASK = 2147483647  # low 31 bits of the md5 integer


def dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content checksum per table: each row's key +
    categorical columns render to a delimited canonical string, hash
    to the md5-low-31-bits integer (the convention any engine can
    compute natively — operators/dedup.py:319), and SUM exactly. Two
    copies of a table match iff (n_rows, checksum) match — the proof a
    migration or replication job runs after copying 100 TB, and
    literally the check this engine's own oracle gate performs,
    productized as an operator. Floats are excluded by contract (their
    string rendering is engine-defined).

    Determinism: integer sums of 31-bit values — exact to ~4·10⁹ rows
    per table in BIGINT, widened trivially beyond.

    Scale: one full scan per table, ZERO shuffles (the sum is one
    map-side-combinable global aggregate per table), results
    unioned."""
    parts = []
    for tbl, cols in CHECKSUM_COLS:
        df = t(spark, sf_dir, tbl)
        canon = F.concat_ws(
            "|", *[F.coalesce(F.col(c).cast("string"), F.lit("\\N"))
                   for c in cols]
        )
        h = F.md5(canon)
        b = [
            F.conv(F.substring(h, 1 + 2 * i, 2), 16, 10).cast("long")
            for i in range(4)
        ]
        low31 = (
            b[0] + 256 * b[1] + 65536 * b[2] + 16777216 * b[3]
        ).bitwiseAND(F.lit(CHECKSUM_MASK))
        parts.append(
            df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(low31).cast("long").alias("checksum"),
            ).select(
                F.lit(tbl).alias("table_name"), "n_rows", "checksum"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _checksum_one_sql(tbl: str, cols: tuple) -> str:
    rendered = ", ".join(
        f"COALESCE(CAST({c} AS VARCHAR), '\\N')" for c in cols
    )
    return f"""
    SELECT '{tbl}' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(md5_number_upper(concat_ws('|', {rendered}))
                         & {CHECKSUM_MASK} AS BIGINT)) AS BIGINT)
             AS checksum
    FROM {tbl}
"""


DQ_TABLE_CHECKSUM_SQL = "\nUNION ALL\n".join(
    _checksum_one_sql(tbl, cols) for tbl, cols in CHECKSUM_COLS
)


# ---------------------------------------------------------------- ml_feature_screen


def ml_feature_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-screening pass: point-biserial correlation of each
    numeric lineitem measure (quantity, extendedprice, discount, tax)
    against the binary return flag — the one-scan ranking that decides
    which features are worth a model's attention BEFORE any training
    job runs on 100 TB. Point-biserial IS Pearson with a 0/1 target,
    so r = (nΣxy − ΣxΣy)/(√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²)).

    Determinism: measures live on the decimal grid ⇒ all five moments
    per feature are exact (scaled BIGINT sums; DECIMAL(38)/HUGEINT
    products); since y ∈ {0,1}, Σxy is just Σx over returns — also
    exact. One division and two √ per feature, identical trees.

    Scale: the four features unpivot via a compile-time stack (one
    scan, 4× rows of (feature, x, y) triples), then one
    map-side-combinable 4-group collapse."""
    # spread AFTER the null filter (pushdown unaffected): the stack
    # unpivot + scaled-decimal casts are per-row compute that would
    # otherwise run on the single row-group's one scan task (guide §2.5).
    li = spread(
        t(spark, sf_dir, "lineitem").filter(
            F.col("l_quantity").isNotNull()
            & F.col("l_extendedprice").isNotNull()
            & F.col("l_discount").isNotNull()
            & F.col("l_tax").isNotNull()
        ),
        sf_dir,
        "lineitem",
    )
    y = (F.col("l_returnflag") == "R").cast("long")
    stacked = li.select(
        y.alias("y"),
        F.expr(
            "stack(4, "
            "'quantity', CAST(CAST(CASE WHEN l_quantity - (l_quantity) = 0 THEN l_quantity END AS DECIMAL(18,4)) * 10000 AS BIGINT), "
            "'extendedprice', CAST(CAST(CASE WHEN l_extendedprice - (l_extendedprice) = 0 THEN l_extendedprice END AS DECIMAL(18,4)) * 10000 AS BIGINT), "
            "'discount', CAST(CAST(CASE WHEN l_discount - (l_discount) = 0 THEN l_discount END AS DECIMAL(18,4)) * 10000 AS BIGINT), "
            "'tax', CAST(CAST(CASE WHEN l_tax - (l_tax) = 0 THEN l_tax END AS DECIMAL(18,4)) * 10000 AS BIGINT)"
            ") AS (feature, x)"
        ),
    )
    per = stacked.groupBy("feature").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(
            F.col("x").cast("decimal(38,0)")
            * F.col("x").cast("decimal(38,0)")
        ).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = d38("n") * d38("sxy") - d38("sx") * d38("sy")
    vx = d38("n") * F.col("sxx").cast("decimal(38,0)") - d38("sx") * d38("sx")
    vy = d38("n") * d38("sy") - d38("sy") * d38("sy")
    r = num.cast("double") / (
        F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))
    )
    return per.select(
        "feature",
        F.col("n").cast("long").alias("n"),
        F.col("sy").cast("long").alias("n_returns"),
        F.when((vx > 0) & (vy > 0), fquant(r, 6)).alias(
            "point_biserial_r"
        ),
    )


ML_FEATURE_SCREEN_SQL = """
WITH base AS (
    SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
           CAST(CAST(CASE WHEN l_quantity - (l_quantity) = 0 THEN l_quantity END AS DECIMAL(18,4)) * 10000 AS BIGINT)
             AS f_quantity,
           CAST(CAST(CASE WHEN l_extendedprice - (l_extendedprice) = 0 THEN l_extendedprice END AS DECIMAL(18,4)) * 10000
                AS BIGINT) AS f_extendedprice,
           CAST(CAST(CASE WHEN l_discount - (l_discount) = 0 THEN l_discount END AS DECIMAL(18,4)) * 10000 AS BIGINT)
             AS f_discount,
           CAST(CAST(CASE WHEN l_tax - (l_tax) = 0 THEN l_tax END AS DECIMAL(18,4)) * 10000 AS BIGINT) AS f_tax
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      AND l_discount IS NOT NULL AND l_tax IS NOT NULL
), stacked AS (
    SELECT y, 'quantity' AS feature, f_quantity AS x FROM base
    UNION ALL
    SELECT y, 'extendedprice', f_extendedprice FROM base
    UNION ALL
    SELECT y, 'discount', f_discount FROM base
    UNION ALL
    SELECT y, 'tax', f_tax FROM base
), per AS (
    SELECT feature,
           COUNT(*) AS n,
           SUM(x) AS sx,
           SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
           SUM(y) AS sy,
           SUM(x * y) AS sxy
    FROM stacked GROUP BY 1
)
SELECT feature,
       CAST(n AS BIGINT) AS n,
       CAST(sy AS BIGINT) AS n_returns,
       CASE WHEN CAST(n AS HUGEINT) * sxx
                 - CAST(sx AS HUGEINT) * sx > 0
             AND CAST(n AS HUGEINT) * sy
                 - CAST(sy AS HUGEINT) * sy > 0 THEN
         floor(CAST(CAST(n AS HUGEINT) * sxy
                    - CAST(sx AS HUGEINT) * sy AS DOUBLE)
               / (sqrt(CAST(CAST(n AS HUGEINT) * sxx
                            - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                  * sqrt(CAST(CAST(n AS HUGEINT) * sy
                              - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
               * 1000000.0) / 1000000.0 END AS point_biserial_r
FROM per
"""


# ------------------------------------------------------------- ml_target_encode

#: m-estimate smoothing weight: categories with fewer than ~M rows
#: shrink toward the global prior — the standard leakage/overfit
#: control for target encoding.
TE_SMOOTHING = 50


def ml_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding of part brand against the return
    flag: enc(brand) = (c_brand + M·prior)/(n_brand + M), the
    m-estimate that replaces one-hot encoding when the categorical
    has 100 TB-scale cardinality — small brands shrink toward the
    global return rate instead of memorizing noise.

    Determinism: counts are exact integers; the prior is one division;
    the encoding is computed as (c·N + M·C_tot) / (N·(n + M)) — a
    single division of exact integer products (DECIMAL(38)/HUGEINT),
    NOT prior-then-encode chained floats, so there is exactly one
    rounding per row.

    Scale: fact⋈dim with the part dim broadcast, one
    map-side-combinable brand collapse, windows on the brands-sized
    relation for the global totals."""
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("l_returnflag") == "R").cast("long")
            ).alias("c"),
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n_tot = F.sum("n").over(wall)
    c_tot = F.sum("c").over(wall)
    d38 = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    enc_num = d38(F.col("c")) * d38(n_tot) + F.lit(
        TE_SMOOTHING
    ).cast("decimal(38,0)") * d38(c_tot)
    enc_den = d38(n_tot) * (
        d38(F.col("n")) + F.lit(TE_SMOOTHING).cast("decimal(38,0)")
    )
    return per.select(
        "brand",
        F.col("n").cast("long").alias("n"),
        F.col("c").cast("long").alias("n_returns"),
        fquant(
            F.col("c").cast("double") / F.col("n").cast("double"), 6
        ).alias("raw_rate"),
        fquant(
            enc_num.cast("double") / enc_den.cast("double"), 6
        ).alias("encoded"),
    )


ML_TARGET_ENCODE_SQL = f"""
WITH per AS (
    SELECT p.p_brand AS brand,
           COUNT(*) AS n,
           SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS c
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
)
SELECT brand,
       CAST(n AS BIGINT) AS n,
       CAST(c AS BIGINT) AS n_returns,
       floor(CAST(c AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
         / 1000000.0 AS raw_rate,
       floor(CAST(CAST(c AS HUGEINT) * SUM(n) OVER ()
                  + {TE_SMOOTHING} * CAST(SUM(c) OVER () AS HUGEINT)
                  AS DOUBLE)
             / CAST(CAST(SUM(n) OVER () AS HUGEINT)
                    * (n + {TE_SMOOTHING}) AS DOUBLE)
             * 1000000.0) / 1000000.0 AS encoded
FROM per
"""


QUERIES: dict[str, Query] = {
    "ts_anova_weekday": Query(
        ts_anova_weekday, TS_ANOVA_WEEKDAY_SQL,
        "one-way ANOVA of value by ISO weekday (quantized exact moments)",
    ),
    "dq_table_checksum": Query(
        dq_table_checksum, DQ_TABLE_CHECKSUM_SQL,
        "cross-engine order-insensitive content checksum per table",
    ),
    "ml_feature_screen": Query(
        ml_feature_screen, ML_FEATURE_SCREEN_SQL,
        "point-biserial screening of lineitem measures vs return flag",
    ),
    "ml_target_encode": Query(
        ml_target_encode, ML_TARGET_ENCODE_SQL,
        "m-estimate smoothed target encoding of brand vs returns",
    ),
}

"""Independent SEMANTIC oracles for the statistical keys.

The DuckDB oracle SQL is hand-mirrored from the Spark implementation,
so a formula error shared by both sides sails through the hash gate.
These tests recompute each statistic from the raw parquet with
pandas/numpy — a third implementation that shares NO code and NO
expression trees with either engine — and compare against the Spark
result. Tolerances are loose (1e-4 relative) on purpose: the goal is
catching wrong FORMULAS (swapped operands, off-by-one ranks, wrong
denominators), not re-litigating the float discipline the exact
cross-engine gate already pins.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events() -> pd.DataFrame:
    df = pd.read_parquet(f"{SF}/events.parquet")
    df["day"] = pd.to_datetime(df["ts"]).dt.floor("D")
    return df


def _spark_df(spark, key):
    from serverless_etl_aws_spark.queries import build_registry

    return build_registry()[key].fn(spark, SF).toPandas()


def test_theil_sen_matches_numpy_brute_force(spark, events):
    got = _spark_df(spark, "ts_theil_sen").set_index("event_type")
    ev = events[events["value"].notna()]
    for ty, grp in ev.groupby("event_type"):
        daily = grp.groupby("day")["value"].apply(
            lambda s: int((s * 10000).round().astype("int64").sum())
        )
        days = (daily.index - pd.Timestamp("1970-01-01")).days.to_numpy()
        vals = daily.to_numpy()
        slopes = []
        for i in range(len(days)):
            for j in range(i + 1, len(days)):
                slopes.append(
                    (vals[j] - vals[i]) / ((days[j] - days[i]) * 10000.0)
                )
        slopes.sort()
        m = len(slopes)
        expected = slopes[(m + 1) // 2 - 1]  # lower median, 1-indexed
        assert got.loc[ty, "n_pairs"] == m
        assert got.loc[ty, "theil_slope"] == pytest.approx(
            expected, abs=2e-6
        )


def test_changepoint_matches_brute_force(spark, events):
    got = _spark_df(spark, "ts_changepoint").set_index("user_id")
    ev = events[events["value"].notna()].sort_values(["ts", "event_id"])
    for uid, grp in ev.groupby("user_id"):
        v = (grp["value"] * 10000).round().astype("int64").to_numpy()
        n = len(v)
        if n < 2:
            assert uid not in got.index
            continue
        p = np.cumsum(v)
        tot = p[-1]
        dev = np.abs(n * p[:-1] - np.arange(1, n) * tot)
        k = int(np.argmax(dev)) + 1  # earliest max (argmax is first)
        assert got.loc[uid, "cp_index"] == k
        assert got.loc[uid, "cusum_peak"] == pytest.approx(
            dev[k - 1] / (n * 10000.0), abs=2e-6
        )


def test_spearman_matches_scipy_free_reference(spark):
    got = _spark_df(spark, "ml_spearman").set_index("nation")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    spend = (
        orders.groupby("o_custkey")["o_totalprice"].sum().rename("spend")
    )
    df = cust[cust["c_acctbal"].notna()].merge(
        spend, left_on="c_custkey", right_index=True, how="left"
    )
    df["spend"] = df["spend"].fillna(0.0)
    df = df.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    for name, grp in df.groupby("n_name"):
        rb = grp.sort_values(["c_acctbal", "c_custkey"]).reset_index()
        rb["rank_bal"] = np.arange(1, len(rb) + 1)
        rs = rb.sort_values(["spend", "c_custkey"]).reset_index()
        rs["rank_spend"] = np.arange(1, len(rs) + 1)
        merged = rb.merge(
            rs[["c_custkey", "rank_spend"]], on="c_custkey"
        )
        d2 = int(
            ((merged["rank_bal"] - merged["rank_spend"]) ** 2).sum()
        )
        n = len(merged)
        assert got.loc[name, "sum_d2"] == d2
        if n >= 2:
            rho = 1.0 - 6.0 * d2 / (n * (n * n - 1))
            assert got.loc[name, "spearman_rho"] == pytest.approx(
                rho, abs=2e-6
            )


def test_kendall_matches_brute_force(spark, events):
    got = _spark_df(spark, "ml_kendall_tau").iloc[0]
    daily = events.groupby("day").agg(
        clicks=("event_type", lambda s: int((s == "click").sum())),
        purchases=("event_type", lambda s: int((s == "purchase").sum())),
    )
    c = daily["clicks"].to_numpy()
    p = daily["purchases"].to_numpy()
    conc = disc = ties = 0
    for i in range(len(c)):
        for j in range(i + 1, len(c)):
            s = (c[i] - c[j]) * (p[i] - p[j])
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
            else:
                ties += 1
    assert got["concordant"] == conc
    assert got["discordant"] == disc
    assert got["ties"] == ties
    assert got["tau_a"] == pytest.approx(
        (conc - disc) / (conc + disc + ties), abs=2e-6
    )


def test_wilson_matches_closed_form(spark, events):
    got = _spark_df(spark, "ml_wilson_ci").set_index("event_type")
    z = 1.96
    for ty, grp in events.groupby("event_type"):
        n = len(grp)
        s = int((grp["value"].fillna(-1) >= 100.0).sum())
        phat = s / n
        denom = 1 + z * z / n
        center = (phat + z * z / (2 * n)) / denom
        half = (z / denom) * math.sqrt(
            phat * (1 - phat) / n + z * z / (4 * n * n)
        )
        assert got.loc[ty, "rate"] == pytest.approx(phat, abs=2e-6)
        assert got.loc[ty, "wilson_lo"] == pytest.approx(
            center - half, abs=2e-6
        )
        assert got.loc[ty, "wilson_hi"] == pytest.approx(
            center + half, abs=2e-6
        )


def test_ab_test_matches_closed_form(spark, events):
    got = _spark_df(spark, "ml_ab_test").iloc[0]
    conv = events.groupby("user_id").apply(
        lambda g: int(
            (
                (g["event_type"] == "purchase")
                & (g["value"].fillna(-1.0) >= 300.0)
            ).any()
        ),
        include_groups=False,
    )
    arms = conv.groupby(conv.index % 2)
    n_a, n_b = arms.count().get(0, 0), arms.count().get(1, 0)
    c_a, c_b = arms.sum().get(0, 0), arms.sum().get(1, 0)
    assert (got["n_a"], got["n_b"]) == (n_a, n_b)
    assert (got["conv_a"], got["conv_b"]) == (c_a, c_b)
    if 0 < c_a + c_b < n_a + n_b:
        pa, pb = c_a / n_a, c_b / n_b
        pool = (c_a + c_b) / (n_a + n_b)
        se = math.sqrt(pool * (1 - pool) * (1 / n_a + 1 / n_b))
        assert got["z_score"] == pytest.approx((pa - pb) / se, abs=2e-6)
    else:
        # degenerate pool (universal or absent conversion): the engine
        # guard yields NULL, never NaN/Inf
        assert pd.isna(got["z_score"])


def test_iqr_outliers_match_brute_force(spark, events):
    got = _spark_df(spark, "dq_iqr_outliers").set_index("event_type")
    ev = events[events["value"].notna()]
    for ty, grp in ev.groupby("event_type"):
        v = np.sort(
            (grp["value"] * 10000).round().astype("int64").to_numpy()
        )
        n = len(v)
        q1 = v[(n + 3) // 4 - 1]
        q3 = v[(3 * n + 3) // 4 - 1]
        lo = (5 * q1 - 3 * q3) / 2.0
        hi = (5 * q3 - 3 * q1) / 2.0
        assert got.loc[ty, "q1"] == pytest.approx(q1 / 1e4)
        assert got.loc[ty, "q3"] == pytest.approx(q3 / 1e4)
        assert got.loc[ty, "n_low"] == int((v < lo).sum())
        assert got.loc[ty, "n_high"] == int((v > hi).sum())


def test_weighted_median_matches_brute_force(spark):
    got = _spark_df(spark, "agg_weighted_median").set_index("brand")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li = li[li["l_extendedprice"].notna() & li["l_quantity"].notna()]
    part = pd.read_parquet(f"{SF}/part.parquet")
    df = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    for brand, grp in df.groupby("p_brand"):
        g = grp.sort_values(
            ["l_extendedprice", "l_orderkey", "l_linenumber"]
        )
        w = (g["l_quantity"] * 10000).round().astype("int64").to_numpy()
        prices = g["l_extendedprice"].to_numpy()
        cum = np.cumsum(w)
        idx = int(np.searchsorted(2 * cum, cum[-1], side="left"))
        assert got.loc[brand, "weighted_median_price"] == pytest.approx(
            prices[idx], abs=1e-4
        )


def test_tvd_matches_fractions(spark, events):
    from fractions import Fraction

    got = _spark_df(spark, "dq_tvd_drift").iloc[0]
    days = (events["day"] - pd.Timestamp("1970-01-01")).dt.days
    mid = (int(days.min()) + int(days.max()) + 1) // 2
    first = events[days < mid]
    second = events[days >= mid]
    n1, n2 = len(first), len(second)
    tvd = Fraction(0)
    for ty in events["event_type"].unique():
        c1 = int((first["event_type"] == ty).sum())
        c2 = int((second["event_type"] == ty).sum())
        tvd += abs(Fraction(c1, n1) - Fraction(c2, n2))
    assert got["tvd"] == pytest.approx(float(tvd / 2), abs=2e-9)


def test_burstiness_matches_fractions(spark, events):
    from fractions import Fraction

    got = _spark_df(spark, "ts_burstiness").set_index("event_type")
    for ty, grp in events.groupby("event_type"):
        c = grp.groupby("day").size().to_numpy()
        d, ct, c2 = len(c), int(c.sum()), int((c * c).sum())
        fano = Fraction(d * c2 - ct * ct, d * ct)
        assert got.loc[ty, "fano"] == pytest.approx(
            float(fano), abs=2e-6
        )
        b = Fraction(d * c2 - ct * ct - d * ct, d * c2 - ct * ct + d * ct)
        assert got.loc[ty, "burstiness"] == pytest.approx(
            float(b), abs=2e-6
        )


def test_mrr_matches_brute_force(spark, events):
    got = _spark_df(spark, "ml_mrr").iloc[0]
    ev = events[events["value"].notna()].sort_values(
        ["value", "event_id"], ascending=[False, True]
    )
    total = 0.0
    hits = 0
    users = ev["user_id"].nunique()
    for _, grp in ev.groupby("user_id"):
        rel = (grp["event_type"] == "purchase").to_numpy()
        if rel.any():
            hits += 1
            total += 1.0 / (int(np.argmax(rel)) + 1)
    assert got["n_users"] == users
    assert got["n_with_hit"] == hits
    if hits:
        assert got["mrr"] == pytest.approx(total / hits, abs=2e-6)


def test_simpson_matches_fractions(spark):
    from fractions import Fraction

    got = _spark_df(spark, "agg_simpson").set_index("nation")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    df = (
        li.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat, left_on="s_nationkey", right_on="n_nationkey")
        .merge(part, left_on="l_partkey", right_on="p_partkey")
    )
    for name, grp in df.groupby("n_name"):
        ni = grp.groupby("p_type").size().to_numpy()
        n = int(ni.sum())
        if n < 2:
            continue
        d = 1 - Fraction(int((ni * (ni - 1)).sum()), n * (n - 1))
        assert got.loc[name, "simpson"] == pytest.approx(
            float(d), abs=2e-6
        )


def test_markov_chain_matches_brute_force(spark, events):
    got = _spark_df(spark, "ml_markov_chain").set_index(
        ["from_type", "to_type"]
    )
    ev = events.sort_values(["ts", "event_id"])
    from collections import Counter

    trans: Counter = Counter()
    for _, grp in ev.groupby("user_id"):
        types = grp["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            trans[(a, b)] += 1
    assert len(got) == len(trans)
    from_tot: Counter = Counter()
    for (a, _), n in trans.items():
        from_tot[a] += n
    for (a, b), n in trans.items():
        assert got.loc[(a, b), "n"] == n
        assert got.loc[(a, b), "prob"] == pytest.approx(
            n / from_tot[a], abs=2e-6
        )


def test_cross_corr_matches_numpy(spark, events):
    got = _spark_df(spark, "ts_cross_corr").set_index("lag")
    daily = events.groupby("day").agg(
        x=("event_type", lambda s: int((s == "click").sum())),
        y=("event_type", lambda s: int((s == "purchase").sum())),
    )
    x = daily["x"].to_numpy(dtype=float)
    y = daily["y"].to_numpy(dtype=float)
    for lag in range(-7, 8):
        if lag >= 0:
            a, b = x[: len(x) - lag or None], y[lag:]
        else:
            a, b = x[-lag:], y[:lag]
        assert got.loc[lag, "n_days"] == len(a)
        if np.std(a) > 0 and np.std(b) > 0:
            r = float(np.corrcoef(a, b)[0, 1])
            assert got.loc[lag, "ccf"] == pytest.approx(r, abs=2e-6)


def test_cramers_v_matches_scipy_free_reference(spark):
    got = _spark_df(spark, "agg_cramers_v").iloc[0]
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    df = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    tab = pd.crosstab(df["c_mktsegment"], df["o_orderpriority"])
    o = tab.to_numpy(dtype=float)
    n = o.sum()
    e = np.outer(o.sum(axis=1), o.sum(axis=0)) / n
    chi2 = float(((o - e) ** 2 / e).sum())
    r, c = tab.shape
    assert got["n"] == int(n)
    assert got["chi2"] == pytest.approx(chi2, abs=1e-3)
    v = math.sqrt(chi2 / (n * min(r - 1, c - 1)))
    assert got["cramers_v"] == pytest.approx(v, abs=2e-6)


def test_anova_weekday_matches_numpy(spark, events):
    got = _spark_df(spark, "ts_anova_weekday").iloc[0]
    ev = events[events["value"].notna()].copy()
    ev["dow"] = pd.to_datetime(ev["ts"]).dt.dayofweek  # Mon=0
    groups = [g["value"].to_numpy() for _, g in ev.groupby("dow")]
    allv = ev["value"].to_numpy()
    grand = allv.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    k, n = len(groups), len(allv)
    assert got["k_groups"] == k and got["n"] == n
    assert got["ss_between"] == pytest.approx(ssb, rel=1e-4, abs=0.01)
    assert got["ss_within"] == pytest.approx(ssw, rel=1e-4)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got["f_stat"] == pytest.approx(f, rel=1e-4)


def test_target_encode_matches_fractions(spark):
    from fractions import Fraction

    got = _spark_df(spark, "ml_target_encode").set_index("brand")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    df = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    df["y"] = (df["l_returnflag"] == "R").astype(int)
    n_tot = len(df)
    c_tot = int(df["y"].sum())
    for brand, grp in df.groupby("p_brand"):
        n, c = len(grp), int(grp["y"].sum())
        enc = Fraction(c * n_tot + 50 * c_tot, n_tot * (n + 50))
        assert got.loc[brand, "n"] == n
        assert got.loc[brand, "encoded"] == pytest.approx(
            float(enc), abs=2e-6
        )


def test_out_of_order_matches_brute_force(spark, events):
    got = _spark_df(spark, "dq_out_of_order").set_index("event_type")
    ev = events.sort_values("event_id")
    late_by_type: dict = {}
    n_by_type: dict = {}
    max_late: dict = {}
    for _, grp in ev.groupby("user_id"):
        run_max = pd.Timestamp.min
        for _, row in grp.iterrows():
            ty = row["event_type"]
            n_by_type[ty] = n_by_type.get(ty, 0) + 1
            if row["ts"] < run_max:
                late_by_type[ty] = late_by_type.get(ty, 0) + 1
                us = int((run_max - row["ts"]).total_seconds() * 1e6)
                max_late[ty] = max(max_late.get(ty, 0), us)
            run_max = max(run_max, row["ts"])
    for ty in n_by_type:
        assert got.loc[ty, "n"] == n_by_type[ty]
        assert got.loc[ty, "n_late"] == late_by_type.get(ty, 0)
        assert got.loc[ty, "max_late_us"] == max_late.get(ty, 0)


# ---------------------------------------------------------------------
# Round-8 additions (VERDICT r7 directive #6): the remaining
# formula-bearing keys get a no-shared-code pandas/numpy recomputation.
# ---------------------------------------------------------------------


def _co_order_edges() -> pd.DataFrame:
    """Directed co-order part edges (node, nbr), distinct, node != nbr —
    recomputed from raw lineitem with pandas merges (no Spark, no SQL)."""
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ]
    e = li.merge(li, on="l_orderkey", suffixes=("_a", "_b"))
    e = e[e["l_partkey_a"] != e["l_partkey_b"]]
    return (
        e[["l_partkey_a", "l_partkey_b"]]
        .drop_duplicates()
        .rename(columns={"l_partkey_a": "node", "l_partkey_b": "nbr"})
    )


def test_ndcg_matches_true_log_discounts(spark, events):
    """The engine uses integer-quantized discount weights
    floor(1e9/log2(i+1)); the TRUE NDCG with exact 1/log2 discounts must
    agree to well under the 2e-6 gate (quantization error is ~1e-9
    relative) — this catches wrong rank indexing, wrong ideal-DCG
    prefix, or an off-by-one in the top-K cut."""
    got = _spark_df(spark, "ml_ndcg").set_index("user_id")
    ev = events[events["value"].notna()]
    K = 10
    for uid, grp in ev.groupby("user_id"):
        g = grp.sort_values(
            ["value", "event_id"], ascending=[False, True]
        )
        rel = (g["event_type"] == "purchase").to_numpy().astype(int)
        n_pos = int(rel.sum())
        assert got.loc[uid, "n_events"] == len(g)
        assert got.loc[uid, "n_pos"] == n_pos
        if n_pos == 0:
            assert pd.isna(got.loc[uid, "ndcg"])
            continue
        disc = 1.0 / np.log2(np.arange(2, K + 2))
        dcg = float((rel[:K] * disc[: len(rel[:K])]).sum())
        idcg = float(disc[: min(n_pos, K)].sum())
        assert got.loc[uid, "ndcg"] == pytest.approx(
            dcg / idcg, abs=2e-6
        )


def test_lift_matches_brute_force(spark, events):
    got = _spark_df(spark, "ml_lift").set_index("bucket")
    ev = events[events["value"].notna()].copy()
    ev["bucket"] = np.floor(ev["value"]).astype("int64")
    grp = ev.groupby("bucket").agg(
        n=("event_id", "size"),
        npos=("event_type", lambda s: int((s == "purchase").sum())),
    )
    grp = grp.sort_index(ascending=False)
    cum_n = grp["n"].cumsum()
    cum_pos = grp["npos"].cumsum()
    tot_n, tot_pos = int(grp["n"].sum()), int(grp["npos"].sum())
    assert set(got.index) == set(grp.index)
    for b in grp.index:
        assert got.loc[b, "n"] == grp.loc[b, "n"]
        assert got.loc[b, "npos"] == grp.loc[b, "npos"]
        assert got.loc[b, "cum_n"] == cum_n.loc[b]
        assert got.loc[b, "cum_pos"] == cum_pos.loc[b]
        assert got.loc[b, "capture"] == pytest.approx(
            cum_pos.loc[b] / tot_pos, abs=2e-6
        )
        assert got.loc[b, "lift"] == pytest.approx(
            (cum_pos.loc[b] / cum_n.loc[b]) / (tot_pos / tot_n),
            abs=2e-6,
        )


def test_survival_km_matches_textbook_estimator(spark, events):
    """Kaplan-Meier recomputed the textbook way: per-user lifetimes,
    right-censoring at the corpus' final day, S(t) as the running
    product over event times — catches censoring mistakes (the classic
    churn overstatement) and at-risk off-by-ones."""
    got = _spark_df(spark, "ml_survival_km").set_index("duration_days")
    users = events.groupby("user_id")["day"].agg(["min", "max"])
    last_day = users["max"].max()
    dur = (users["max"] - users["min"]).dt.days.astype(int)
    censored = users["max"] == last_day
    durations = np.sort(dur.unique())
    surv = 1.0
    seen = []
    for d in durations:
        at_risk = int((dur >= d).sum())
        deaths = int(((dur == d) & ~censored).sum())
        if deaths == 0:
            continue
        surv *= 1.0 - deaths / at_risk
        seen.append(d)
        assert got.loc[d, "n_at_risk"] == at_risk
        assert got.loc[d, "n_churned"] == deaths
        assert got.loc[d, "km_survival"] == pytest.approx(
            surv, abs=2e-6
        )
    assert sorted(got.index) == seen


def test_lorenz_matches_brute_force(spark):
    got = _spark_df(spark, "agg_lorenz").set_index("decile")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cents = (orders["o_totalprice"] * 10000).round().astype("int64")
    spend = (
        cents.groupby(orders["o_custkey"])
        .sum()
        .rename("s")
        .reset_index()
        .rename(columns={"o_custkey": "ck"})
    )
    spend = spend.sort_values(["s", "ck"]).reset_index(drop=True)
    n = len(spend)
    spend["decile"] = (np.arange(n) * 10) // n
    per = spend.groupby("decile")["s"].agg(["size", "sum"])
    tot = int(spend["s"].sum())
    cum = per["sum"].cumsum()
    for d in per.index:
        assert got.loc[d, "n_cust"] == per.loc[d, "size"]
        assert got.loc[d, "spend"] == pytest.approx(
            per.loc[d, "sum"] / 1e4, abs=1e-4
        )
        assert got.loc[d, "share"] == pytest.approx(
            per.loc[d, "sum"] / tot, abs=2e-6
        )
        assert got.loc[d, "cum_share"] == pytest.approx(
            cum.loc[d] / tot, abs=2e-6
        )


def test_holt_matches_python_float_fold(spark, events):
    got = _spark_df(spark, "ts_holt").set_index("user_id")
    ev = events[events["value"].notna()].sort_values(["ts", "event_id"])
    alpha, beta = 0.5, 0.25
    for uid, grp in ev.groupby("user_id"):
        v = grp["value"].astype(float).to_list()
        assert got.loc[uid, "n_points"] == len(v)
        if len(v) < 2:
            assert pd.isna(got.loc[uid, "level"])
            continue
        level, trend = v[0], 0.0
        for x in v[1:]:
            lnew = alpha * x + (1 - alpha) * (level + trend)
            trend = beta * (lnew - level) + (1 - beta) * trend
            level = lnew
        assert got.loc[uid, "level"] == pytest.approx(level, abs=2e-6)
        assert got.loc[uid, "trend"] == pytest.approx(trend, abs=2e-6)
        assert got.loc[uid, "forecast_1"] == pytest.approx(
            level + trend, abs=2e-6
        )


def test_modularity_matches_newman_formula(spark):
    got = _spark_df(spark, "graph_modularity").set_index("community")
    edges = _co_order_edges()
    brand = pd.read_parquet(f"{SF}/part.parquet")[
        ["p_partkey", "p_brand"]
    ]
    lab = edges.merge(
        brand, left_on="node", right_on="p_partkey"
    ).merge(
        brand,
        left_on="nbr",
        right_on="p_partkey",
        suffixes=("_c", "_n"),
    )
    D = len(lab)
    for bc, grp in lab.groupby("p_brand_c"):
        deg_sum = len(grp)
        internal = int((grp["p_brand_c"] == grp["p_brand_n"]).sum())
        q = internal / D - (deg_sum / D) ** 2
        assert got.loc[bc, "deg_sum"] == deg_sum
        assert got.loc[bc, "internal_dir"] == internal
        assert got.loc[bc, "n_nodes"] == grp["node"].nunique()
        assert got.loc[bc, "q_contrib"] == pytest.approx(q, abs=2e-6)
    # partition-quality sanity: contributions sum to Newman Q in [-1, 1]
    total_q = float(got["q_contrib"].sum())
    assert -1.0 <= total_q <= 1.0


def test_assortativity_matches_numpy_corrcoef(spark):
    """Degree assortativity IS the Pearson correlation of endpoint
    degrees over directed edges — recompute with np.corrcoef (a
    covariance/std implementation sharing nothing with the engine's
    rational-moment form)."""
    got = _spark_df(spark, "graph_assortativity").iloc[0]
    edges = _co_order_edges()
    deg = edges.groupby("node").size()
    dx = deg.loc[edges["node"]].to_numpy(dtype=float)
    dy = deg.loc[edges["nbr"]].to_numpy(dtype=float)
    assert got["n_directed_edges"] == len(edges)
    r = float(np.corrcoef(dx, dy)[0, 1])
    assert got["assortativity"] == pytest.approx(r, abs=2e-6)

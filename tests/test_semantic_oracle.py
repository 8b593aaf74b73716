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


def test_auc_matches_midrank_formula(spark, events):
    """The engine computes one-vs-rest AUC in doubled Mann-Whitney U
    form over score buckets; recompute with the MIDRANK formulation
    AUC = (R_pos − npos(npos+1)/2) / (npos·nneg) via pandas
    rank(method='average') — a different textbook identity."""
    got = _spark_df(spark, "ml_auc").set_index("event_type")
    ev = events[events["value"].notna()].copy()
    ev["bkt"] = np.floor(ev["value"] * 100).astype("int64")
    ranks = ev["bkt"].rank(method="average")
    n_total = len(ev)
    assert int(got["n_other"].iloc[0]) == 0
    for ty in ("click", "error", "purchase", "signup", "view"):
        pos = ev["event_type"] == ty
        npos, nneg = int(pos.sum()), n_total - int(pos.sum())
        assert got.loc[ty, "npos"] == npos
        assert got.loc[ty, "nneg"] == nneg
        if npos == 0 or nneg == 0:
            assert pd.isna(got.loc[ty, "auc"])
            continue
        auc = (float(ranks[pos].sum()) - npos * (npos + 1) / 2) / (
            npos * nneg
        )
        assert got.loc[ty, "auc"] == pytest.approx(auc, abs=2e-6)


def test_calibration_matches_brute_force(spark, events):
    got = _spark_df(spark, "ml_calibration").set_index("bin_lo")
    ev = events[events["value"].notna()].copy()
    ev["bin_lo"] = (np.floor(ev["value"] / 50) * 50).astype("int64")
    ev["is_pos"] = (ev["event_type"] == "purchase").astype(int)
    base = ev["is_pos"].sum() / len(ev)
    for b, grp in ev.groupby("bin_lo"):
        n, pos = len(grp), int(grp["is_pos"].sum())
        assert got.loc[b, "n"] == n
        assert got.loc[b, "pos"] == pos
        assert got.loc[b, "mean_score"] == pytest.approx(
            grp["value"].mean(), abs=2e-4
        )
        assert got.loc[b, "pos_rate"] == pytest.approx(
            pos / n, abs=2e-6
        )
        assert got.loc[b, "base_rate"] == pytest.approx(base, abs=2e-6)
        assert got.loc[b, "lift"] == pytest.approx(
            (pos / n) / base, abs=2e-6
        )


def test_chi2_matches_scipy_free_contingency(spark, events):
    """χ² per event type recomputed from the raw contingency table with
    numpy outer-product expected counts."""
    got = _spark_df(spark, "ml_chi2").set_index("event_type")
    ev = events.copy()
    ev["isodow"] = pd.to_datetime(ev["ts"]).dt.dayofweek + 1
    tab = ev.groupby(["event_type", "isodow"]).size().unstack(fill_value=0)
    rt = tab.sum(axis=1).to_numpy(dtype=float)
    ct = tab.sum(axis=0).to_numpy(dtype=float)
    nn = tab.to_numpy().sum()
    expected = np.outer(rt, ct) / nn
    obs = tab.to_numpy(dtype=float)
    # zero-count cells exist in the engine only if the (type, dow) pair
    # appears; expected>0 cells with obs 0 contribute only when present
    for i, ty in enumerate(tab.index):
        mask = obs[i] > 0
        chi = (((obs[i] - expected[i]) ** 2) / expected[i])[mask].sum()
        assert got.loc[ty, "n_rows"] == int(rt[i])
        assert got.loc[ty, "chi2_part"] == pytest.approx(chi, abs=1e-4)
        assert got.loc[ty, "dof"] == 6


def test_ks_matches_numpy_cdf_gap(spark, events):
    got = _spark_df(spark, "agg_ks_test").iloc[0]
    ev = events[events["value"].notna()].copy()
    ev["bkt"] = np.floor(ev["value"]).astype("int64")
    pos = ev[ev["event_type"] == "purchase"]["bkt"]
    neg = ev[ev["event_type"] != "purchase"]["bkt"]
    assert got["n_pos"] == len(pos)
    assert got["n_neg"] == len(neg)
    buckets = np.sort(ev["bkt"].unique())
    cdf_p = np.searchsorted(np.sort(pos.to_numpy()), buckets, "right") / len(pos)
    cdf_n = np.searchsorted(np.sort(neg.to_numpy()), buckets, "right") / len(neg)
    gaps = np.abs(cdf_p - cdf_n)
    d = gaps.max()
    at = int(buckets[np.argmax(gaps)])  # argmax = first ⇒ smallest bucket
    assert got["d_stat"] == pytest.approx(d, abs=2e-6)
    assert got["at_value"] == at


def test_benford_matches_math_log10(spark, events):
    got = _spark_df(spark, "dq_benford").set_index("digit")
    ev = events[(events["value"].notna()) & (events["value"] > 0)]
    # first significant digit of the scale-4 decimal rendering
    digits = (
        ev["value"]
        .map(lambda v: int(next(c for c in f"{v:.4f}" if c in "123456789")))
    )
    counts = digits.value_counts()
    total = int(counts.sum())
    for d in counts.index:
        assert got.loc[d, "n"] == counts[d]
        assert got.loc[d, "obs_share"] == pytest.approx(
            counts[d] / total, abs=2e-6
        )
        assert got.loc[d, "benford_share"] == pytest.approx(
            math.log10(1 + 1 / d), abs=2e-6
        )
        assert got.loc[d, "deviation"] == pytest.approx(
            counts[d] / total - math.log10(1 + 1 / d), abs=3e-6
        )


def test_ece_matches_brute_force(spark, events):
    got = _spark_df(spark, "ml_ece").iloc[0]
    ev = events[events["value"].notna()].copy()
    ev["bin"] = np.floor(ev["value"] / 50).astype(int)
    ev["is_pos"] = (ev["event_type"] == "purchase").astype(int)
    n_total = len(ev)
    ece = 0.0
    for _, grp in ev.groupby("bin"):
        acc = grp["is_pos"].mean()
        conf = grp["value"].mean() / 600.0
        ece += (len(grp) / n_total) * abs(acc - conf)
    assert got["n_bins"] == ev["bin"].nunique()
    assert got["n_total"] == n_total
    # each bin's gap is floor-quantized to 1e-6 BEFORE the weighted sum
    # (documented downward bias < 1e-6) plus the final 1e-6 fquant
    assert got["ece"] == pytest.approx(ece, abs=3e-6)


def test_gini_hhi_match_probability_form(spark, events):
    """Gini impurity 1 − Σp² and HHI Σp² recomputed from per-day type
    SHARES (float probabilities), not the engines' integer-moment
    rearrangement."""
    gini = _spark_df(spark, "agg_gini").set_index("day")
    hhi = _spark_df(spark, "agg_hhi").set_index("day")
    ev = events.copy()
    ev["d"] = ev["day"].dt.strftime("%Y-%m-%d")
    for d, grp in ev.groupby("d"):
        p = grp["event_type"].value_counts(normalize=True).to_numpy()
        ssq = float((p**2).sum())
        assert gini.loc[d, "n_events"] == len(grp)
        assert gini.loc[d, "n_types"] == grp["event_type"].nunique()
        assert gini.loc[d, "gini"] == pytest.approx(1.0 - ssq, abs=2e-6)
        assert hhi.loc[d, "hhi"] == pytest.approx(ssq, abs=2e-6)


def test_corr_matches_numpy(spark):
    got = _spark_df(spark, "agg_corr").set_index("l_returnflag")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    for flag, grp in li.groupby("l_returnflag"):
        x = (grp["l_quantity"] * 10000).round().to_numpy() / 1e4
        y = (grp["l_extendedprice"] * 10000).round().to_numpy() / 1e4
        assert got.loc[flag, "n_rows"] == len(grp)
        assert got.loc[flag, "corr_qty_price"] == pytest.approx(
            float(np.corrcoef(x, y)[0, 1]), abs=2e-6
        )
        cov = float(((x - x.mean()) * (y - y.mean())).mean())
        assert got.loc[flag, "covar_pop"] == pytest.approx(
            cov, rel=1e-6, abs=2e-6
        )


def test_skew_kurt_match_numpy_central_moments(spark, events):
    got = _spark_df(spark, "agg_skew_kurt").set_index("event_type")
    ev = events[events["value"].notna()]
    for ty, grp in ev.groupby("event_type"):
        v = (grp["value"] * 10000).round().to_numpy() / 1e4
        d = v - v.mean()
        m2, m3, m4 = (d**2).mean(), (d**3).mean(), (d**4).mean()
        assert got.loc[ty, "n_rows"] == len(v)
        assert got.loc[ty, "skewness"] == pytest.approx(
            m3 / m2**1.5, abs=2e-6
        )
        assert got.loc[ty, "kurtosis_excess"] == pytest.approx(
            m4 / m2**2 - 3.0, abs=2e-6
        )


def test_cusum_matches_textbook_recursion(spark, events):
    """The engine computes CUSUM via the drawdown identity over prefix
    sums; replay the TEXTBOOK recursion S_t = max(0, S_{t-1} + x_t − K)
    sequentially in Python and compare every row."""
    got = _spark_df(spark, "ts_cusum")
    got = got.set_index("event_id")
    K, H = 75.0, 300.0
    ev = events[events["value"].notna()].sort_values(["ts", "event_id"])
    for ty, grp in ev.groupby("event_type"):
        s = 0.0
        for eid, val in zip(grp["event_id"], grp["value"]):
            s = max(0.0, s + (float(val) - K))
            assert got.loc[eid, "cusum"] == pytest.approx(s, abs=2e-4)
            assert bool(got.loc[eid, "alert"]) == (s > H)


def test_autocorr_matches_numpy(spark, events):
    got = _spark_df(spark, "ts_autocorr").set_index("event_type")
    ev = events[events["value"].notna()].sort_values(["ts", "event_id"])
    for ty, grp in ev.groupby("event_type"):
        v = (grp["value"] * 10000).round().to_numpy() / 1e4
        x, y = v[1:], v[:-1]
        assert got.loc[ty, "n_pairs"] == len(x)
        assert got.loc[ty, "autocorr_lag1"] == pytest.approx(
            float(np.corrcoef(x, y)[0, 1]), abs=2e-6
        )


def test_trend_mk_matches_brute_force(spark, events):
    got = _spark_df(spark, "ts_trend_mk").set_index("event_type")
    for ty, grp in events.groupby("event_type"):
        c = grp.groupby("day").size().sort_index().to_numpy()
        n = len(c)
        s = sum(
            int(np.sign(c[j] - c[i]))
            for i in range(n)
            for j in range(i + 1, n)
        )
        _, counts = np.unique(c, return_counts=True)
        tie = int(sum(t * (t - 1) * (2 * t + 5) for t in counts))
        var18 = n * (n - 1) * (2 * n + 5) - tie
        assert got.loc[ty, "n_days"] == n
        assert got.loc[ty, "s_stat"] == s
        assert got.loc[ty, "var18"] == var18
        assert got.loc[ty, "trend"] == (
            "increasing" if s > 0 else "decreasing" if s < 0 else "no_trend"
        )


def test_seasonal_matches_means(spark, events):
    got = _spark_df(spark, "ts_seasonal").set_index(
        ["event_type", "isodow"]
    )
    ev = events[events["value"].notna()].copy()
    ev["isodow"] = pd.to_datetime(ev["ts"]).dt.dayofweek + 1
    for ty, grp in ev.groupby("event_type"):
        overall = grp["value"].mean()
        for dow, sl in grp.groupby("isodow"):
            assert got.loc[(ty, dow), "n_events"] == len(sl)
            assert got.loc[(ty, dow), "mean_value"] == pytest.approx(
                sl["value"].mean(), abs=2e-4
            )
            assert got.loc[(ty, dow), "seasonal_index"] == pytest.approx(
                sl["value"].mean() / overall, abs=2e-5
            )


def test_ewma_matches_explicit_weights(spark, events):
    """The engine folds acc·a + x over the trailing 16-row frame;
    recompute with EXPLICIT weight vectors a^m / Σa^m (the definition,
    not the fold) on a sample of users."""
    got = _spark_df(spark, "ts_ewma").set_index("event_id")
    a, W = 0.5, 16
    ev = events.sort_values(["ts", "event_id"])
    for uid, grp in list(ev.groupby("user_id"))[:40]:
        vals = grp["value"].fillna(0.0).to_list()
        for i, eid in enumerate(grp["event_id"]):
            frame = vals[max(0, i - W + 1) : i + 1]
            weights = np.array([a ** (len(frame) - 1 - j) for j in range(len(frame))])
            expected = float((weights * np.array(frame)).sum() / weights.sum())
            assert got.loc[eid, "ewma_q6"] == pytest.approx(
                expected, abs=2e-6
            )


def test_spc_matches_three_sigma(spark, events):
    got = _spark_df(spark, "dq_spc").set_index(["event_type", "day"])
    ev = events.copy()
    ev["d"] = ev["day"].dt.strftime("%Y-%m-%d")
    for ty, grp in ev.groupby("event_type"):
        daily = grp.groupby("d").size()
        mean = daily.mean()
        sigma = float(daily.std(ddof=0))
        for d, c in daily.items():
            row = got.loc[(ty, d)]
            assert row["n_events"] == c
            assert row["center"] == pytest.approx(mean, abs=2e-4)
            assert row["ucl"] == pytest.approx(mean + 3 * sigma, abs=2e-4)
            assert row["lcl"] == pytest.approx(mean - 3 * sigma, abs=2e-4)
            assert bool(row["out_of_control"]) == (
                c > mean + 3 * sigma or c < mean - 3 * sigma
            )


def test_pagerank_matches_numpy_power_iteration(spark):
    """3-iteration damped PageRank on the nation trade graph recomputed
    with numpy dense matrix-vector products (no quantization, no SQL)."""
    got = _spark_df(spark, "graph_pagerank").set_index("nationkey")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    orders = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_orderkey", "o_custkey"]
    ]
    cust = pd.read_parquet(f"{SF}/customer.parquet")[
        ["c_custkey", "c_nationkey"]
    ]
    supp = pd.read_parquet(f"{SF}/supplier.parquet")[
        ["s_suppkey", "s_nationkey"]
    ]
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    pairs = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    )
    w = (
        pairs.groupby(["c_nationkey", "s_nationkey"])
        .size()
        .rename("w")
        .reset_index()
    )
    n = len(nat)
    keys = sorted(nat["n_nationkey"])
    idx = {k: i for i, k in enumerate(keys)}
    A = np.zeros((n, n))
    for _, r in w.iterrows():
        A[idx[r["c_nationkey"]], idx[r["s_nationkey"]]] = r["w"]
    wout = A.sum(axis=1)
    P = np.divide(A, wout[:, None], where=wout[:, None] > 0)
    d = 0.85
    pr = np.full(n, 1.0 / n)
    for _ in range(3):
        pr = (1.0 - d) / n + d * (P.T @ pr)  # dangling mass leaks
    for k in keys:
        assert got.loc[k, "pagerank"] == pytest.approx(
            pr[idx[k]], abs=2e-6
        )


def test_kcore_matches_iterative_peel(spark):
    got = _spark_df(spark, "graph_kcore").set_index("part")
    edges = _co_order_edges()
    e = edges.copy()
    for _ in range(4):  # KCORE_ROUNDS
        deg = e.groupby("node").size()
        keep = set(deg[deg >= 3].index)  # KCORE_K
        e = e[e["node"].isin(keep) & e["nbr"].isin(keep)]
    deg = e.groupby("node").size()
    assert sorted(got.index) == sorted(deg.index)
    for node, d in deg.items():
        assert got.loc[node, "degree"] == d


def test_linreg_matches_numpy_polyfit(spark):
    got = _spark_df(spark, "ml_linreg").set_index("o_orderpriority")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    x_per = li.groupby("l_orderkey").size()
    df = orders.copy()
    df["x"] = (
        df["o_orderkey"].map(x_per).fillna(0).astype(float)
    )
    for pri, grp in df.groupby("o_orderpriority"):
        assert got.loc[pri, "n_orders"] == len(grp)
        if grp["x"].nunique() < 2:
            continue
        slope, intercept = np.polyfit(
            grp["x"].to_numpy(), grp["o_totalprice"].to_numpy(), 1
        )
        assert got.loc[pri, "slope"] == pytest.approx(slope, abs=2e-4)
        assert got.loc[pri, "intercept"] == pytest.approx(
            intercept, abs=2e-2
        )


def test_agg_stats_matches_numpy(spark):
    got = _spark_df(spark, "agg_stats").set_index("l_returnflag")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    for flag, grp in li.groupby("l_returnflag"):
        q = grp["l_quantity"].to_numpy(dtype=float)
        p = grp["l_extendedprice"].to_numpy(dtype=float)
        d = grp["l_discount"].to_numpy(dtype=float)
        assert got.loc[flag, "n_rows"] == len(grp)
        assert got.loc[flag, "corr_qty_price"] == pytest.approx(
            float(np.corrcoef(q, p)[0, 1]), abs=2e-6
        )
        assert got.loc[flag, "stddev_pop_discount"] == pytest.approx(
            float(d.std(ddof=0)), abs=2e-6
        )


def test_winsorized_mean_matches_clamped_average(spark, events):
    got = _spark_df(spark, "agg_winsorized_mean").set_index("event_type")
    ev = events[events["value"].notna()]
    for ty, grp in ev.groupby("event_type"):
        g = grp.sort_values(["value", "event_id"]).reset_index()
        n = len(g)
        lo_rank = (n * 1 + 9) // 10   # ceil(n/10), 1-indexed
        hi_rank = (n * 9 + 9) // 10   # ceil(9n/10)
        lo = float(g.loc[lo_rank - 1, "value"])
        hi = float(g.loc[hi_rank - 1, "value"])
        clamped = g["value"].clip(lo, hi)
        assert got.loc[ty, "n"] == n
        assert got.loc[ty, "lo"] == pytest.approx(lo)
        assert got.loc[ty, "hi"] == pytest.approx(hi)
        assert got.loc[ty, "winsorized_mean"] == pytest.approx(
            clamped.mean(), abs=2e-4
        )
        assert got.loc[ty, "raw_mean"] == pytest.approx(
            g["value"].mean(), abs=2e-4
        )


def test_median_ci_matches_order_statistics(spark, events):
    got = _spark_df(spark, "agg_median_ci").set_index("event_type")
    ev = events[events["value"].notna()]
    z = 1.96
    for ty, grp in ev.groupby("event_type"):
        g = grp.copy()
        g["v"] = (g["value"] * 10000).round().astype("int64")
        g = g.sort_values(["v", "event_id"]).reset_index()
        n = len(g)
        med = g.loc[(n + 1) // 2 - 1, "v"]
        lo_rank = max(1, math.floor((n - z * math.sqrt(n)) / 2))
        hi_rank = min(n, math.ceil((n + z * math.sqrt(n)) / 2 + 1))
        assert got.loc[ty, "n"] == n
        assert got.loc[ty, "median"] == pytest.approx(med / 1e4)
        assert got.loc[ty, "ci_lo"] == pytest.approx(
            g.loc[lo_rank - 1, "v"] / 1e4
        )
        assert got.loc[ty, "ci_hi"] == pytest.approx(
            g.loc[hi_rank - 1, "v"] / 1e4
        )
        assert got.loc[ty, "ci_lo"] <= got.loc[ty, "median"]
        assert got.loc[ty, "median"] <= got.loc[ty, "ci_hi"]


def test_best_threshold_matches_brute_force_f1(spark, events):
    got = _spark_df(spark, "ml_best_threshold").iloc[0]
    ev = events[events["value"].notna()].copy()
    ev["is_pos"] = (ev["event_type"] == "purchase").astype(int)
    v = np.floor(ev["value"]).astype("int64")
    best = None
    for thr in sorted(v.unique(), reverse=True):
        sel = v >= thr
        tp = int(ev.loc[sel, "is_pos"].sum())
        fp = int(sel.sum()) - tp
        fn = int(ev["is_pos"].sum()) - tp
        if 2 * tp + fp + fn == 0:
            continue
        f1 = 2 * tp / (2 * tp + fp + fn)
        # scaled-integer compare, lower threshold wins ties
        key = (2 * tp * 1_000_000_000_000) // (2 * tp + fp + fn)
        if best is None or key > best[0] or (key == best[0] and thr < best[1]):
            best = (key, thr, tp, fp, fn, f1)
    _, thr, tp, fp, fn, f1 = best
    assert got["threshold"] == thr
    assert (got["tp"], got["fp"], got["fn"]) == (tp, fp, fn)
    assert got["f1"] == pytest.approx(f1, abs=2e-6)


def test_pr_at_k_matches_brute_force(spark, events):
    got = _spark_df(spark, "ml_pr_at_k").set_index("user_id")
    ev = events[events["value"].notna()]
    K = 10
    for uid, grp in ev.groupby("user_id"):
        g = grp.sort_values(
            ["value", "event_id"], ascending=[False, True]
        )
        rel = (g["event_type"] == "purchase").to_numpy().astype(int)
        n_pos = int(rel.sum())
        hits = int(rel[:K].sum())
        assert got.loc[uid, "n_events"] == len(g)
        assert got.loc[uid, "n_pos"] == n_pos
        assert got.loc[uid, "hits_at_k"] == hits
        assert got.loc[uid, "precision_at_k"] == pytest.approx(
            hits / min(len(g), K), abs=2e-6
        )
        if n_pos:
            assert got.loc[uid, "recall_at_k"] == pytest.approx(
                hits / n_pos, abs=2e-6
            )
        else:
            assert pd.isna(got.loc[uid, "recall_at_k"])


def test_stump_matches_brute_force_gini_sweep(spark, events):
    got = _spark_df(spark, "ml_stump").iloc[0]
    ev = events[events["value"].notna()].copy()
    ev["is_pos"] = (ev["event_type"] == "purchase").astype(int)
    v = np.floor(ev["value"]).astype("int64")
    nn = len(ev)
    pos_tot = int(ev["is_pos"].sum())

    def gini(n, p):
        q = n - p
        return 1.0 - (p * p + q * q) / (n * n)

    best = None
    for thr in sorted(v.unique()):
        sel = v >= thr
        n_ge = int(sel.sum())
        n_lt = nn - n_ge
        if n_ge == 0 or n_lt == 0:
            continue
        pos_ge = int(ev.loc[sel, "is_pos"].sum())
        pos_lt = pos_tot - pos_ge
        wg = (n_ge * gini(n_ge, pos_ge) + n_lt * gini(n_lt, pos_lt)) / nn
        if best is None or wg < best[0] - 1e-15 or (
            abs(wg - best[0]) <= 1e-15 and thr < best[1]
        ):
            best = (wg, thr, n_ge, pos_ge, n_lt, pos_lt)
    wg, thr, n_ge, pos_ge, n_lt, pos_lt = best
    parent = gini(nn, pos_tot)
    assert got["threshold"] == thr
    assert (got["n_ge"], got["pos_ge"]) == (n_ge, pos_ge)
    assert (got["n_lt"], got["pos_lt"]) == (n_lt, pos_lt)
    assert got["split_gini"] == pytest.approx(wg, abs=2e-6)
    assert got["parent_gini"] == pytest.approx(parent, abs=2e-6)
    assert got["gain"] == pytest.approx(parent - wg, abs=3e-6)


def test_zscore_outlier_matches_numpy(spark, events):
    got = _spark_df(spark, "agg_zscore_outlier").set_index("event_type")
    ev = events[events["value"].notna()]
    for ty, grp in ev.groupby("event_type"):
        x = (grp["value"] * 10000).round().to_numpy() / 1e4
        mean, var = x.mean(), x.var(ddof=0)
        n_out = int((((x - mean) ** 2) > 4.0 * var).sum())
        assert got.loc[ty, "n_values"] == len(x)
        assert got.loc[ty, "n_outliers"] == n_out
        assert got.loc[ty, "mean_value"] == pytest.approx(
            mean, abs=2e-4
        )


def test_rolling_zscore_matches_pandas_rolling(spark, events):
    got = _spark_df(spark, "ts_rolling_zscore").set_index(
        ["event_type", "day"]
    )
    ev = events.copy()
    daily = (
        ev.groupby(["event_type", ev["day"].dt.strftime("%Y-%m-%d")])[
            "value"
        ]
        .apply(lambda s: round(float(s.fillna(0).sum()), 2))
        .rename("v")
        .reset_index()
    )
    for ty, grp in daily.groupby("event_type"):
        g = grp.sort_values("day").reset_index(drop=True)
        roll = g["v"].rolling(window=7, min_periods=1)
        mean = roll.mean()
        std = roll.std(ddof=0)
        n = roll.count()
        for i in range(len(g)):
            row = got.loc[(ty, g.loc[i, "day"])]
            assert row["rolling_mean"] == pytest.approx(
                mean[i], abs=2e-4
            )
            if n[i] >= 3:
                z = (g.loc[i, "v"] - mean[i]) / std[i]
                assert row["zscore"] == pytest.approx(z, abs=2e-4)
                assert bool(row["is_anomaly"]) == (abs(z) > 2.0)
            else:
                assert pd.isna(row["zscore"])


def test_naive_bayes_matches_sklearn_free_counts(spark):
    got = _spark_df(spark, "ml_naive_bayes")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs["text"].notna() & docs["lang"].notna()]
    rows = []
    for _, r in docs.iterrows():
        for tok in r["text"].split(" "):
            if tok:
                rows.append((r["lang"], tok))
    tf = pd.DataFrame(rows, columns=["lang", "term"])
    ct = tf.groupby(["lang", "term"]).size().rename("c")
    gt = ct.groupby("term").sum()
    vocab = set(gt[gt >= 5].index)
    n_c = ct.groupby("lang").sum()
    V = len(vocab)
    prior = docs.groupby("lang").size() / len(docs)
    expected = {
        (lang, term): (c + 1) / (n_c[lang] + V)
        for (lang, term), c in ct.items()
        if term in vocab
    }
    assert len(got) == len(expected)
    for _, r in got.iterrows():
        key = (r["lang"], r["term"])
        assert r["c_tc"] == ct[key]
        assert r["p_term_given_lang"] == pytest.approx(
            expected[key], abs=2e-9
        )
        assert r["p_lang"] == pytest.approx(prior[r["lang"]], abs=2e-9)


def test_assoc_rules_match_brute_force(spark):
    got = _spark_df(spark, "ml_assoc_rules")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    n_baskets = li["l_orderkey"].nunique()
    supp = li.groupby("l_partkey").size()
    pairs = li.merge(li, on="l_orderkey", suffixes=("_a", "_b"))
    pairs = pairs[pairs["l_partkey_a"] < pairs["l_partkey_b"]]
    ps = pairs.groupby(["l_partkey_a", "l_partkey_b"]).size()
    ps = ps[ps >= 2]
    ranked = sorted(
        (
            (
                (int(c) * n_baskets * 1_000_000)
                // (int(supp[a]) * int(supp[b])),
                int(c),
                a,
                b,
            )
            for (a, b), c in ps.items()
        ),
        key=lambda t: (-t[0], -t[1], t[2], t[3]),
    )[: len(got)]
    for row, (lift_scaled, c, a, b) in zip(got.itertuples(), ranked):
        assert (row.part_a, row.part_b) == (a, b)
        assert row.supp_ab == c
        assert (row.supp_a, row.supp_b) == (supp[a], supp[b])
        assert row.conf_a_to_b == pytest.approx(c / supp[a], abs=2e-6)
        assert row.conf_b_to_a == pytest.approx(c / supp[b], abs=2e-6)
        assert row.lift == pytest.approx(
            lift_scaled / 1e6, abs=2e-6
        )


def test_conversion_lag_matches_brute_force(spark, events):
    got = _spark_df(spark, "agg_conversion_lag").iloc[0]
    ev = events.copy()
    ev["us"] = (
        pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
        // 1000
    )
    per = ev.pivot_table(
        index="user_id",
        columns="event_type",
        values="us",
        aggfunc="min",
    )
    ok = per.dropna(subset=["view", "purchase"])
    lags = (ok["purchase"] - ok["view"]).astype("int64")
    lags = lags[lags > 0].sort_values().to_numpy()
    n = len(lags)
    assert got["n_converted"] == n
    assert got["min_lag_us"] == lags[0]
    assert got["max_lag_us"] == lags[-1]
    assert got["mean_lag_us"] == pytest.approx(lags.mean(), abs=0.01)
    assert got["p50_lag_us"] == lags[(n + 1) // 2 - 1]


def test_forecast_eval_matches_brute_force(spark, events):
    got = _spark_df(spark, "ml_forecast_eval").set_index("event_type")
    ev = events[events["value"].notna()].copy()
    daily = (
        ev.groupby(["event_type", "day"])["value"]
        .apply(lambda s: int((s * 10000).round().astype("int64").sum()))
        .rename("v")
        .reset_index()
    )
    for ty, grp in daily.groupby("event_type"):
        g = grp.sort_values("day").reset_index(drop=True)
        v = g["v"].to_numpy()
        e1 = np.abs(v[1:] - v[:-1])
        assert got.loc[ty, "n_days"] == len(v)
        assert got.loc[ty, "mae_naive"] == pytest.approx(
            e1.mean() / 1e4, abs=2e-6
        )
        if len(v) > 7:
            e7 = np.abs(v[7:] - v[:-7])
            assert got.loc[ty, "mae_snaive"] == pytest.approx(
                e7.mean() / 1e4, abs=2e-6
            )
        # MAPE (percent): per-term floor(1e6·|e|/prev), summed, then
        # averaged over non-skipped terms and rescaled to percent
        terms = [
            math.floor(abs(int(v[i]) - int(v[i - 1])) * 1_000_000 / v[i - 1])
            for i in range(1, len(v))
            if v[i - 1] > 0
        ]
        if terms:
            assert got.loc[ty, "mape_naive_pct"] == pytest.approx(
                sum(terms) / (len(terms) * 1e4), abs=3e-4
            )


def test_diff_in_diff_matches_four_cells(spark, events):
    got = _spark_df(spark, "ml_diff_in_diff").iloc[0]
    ev = events.copy()
    ev["d"] = (ev["day"] - pd.Timestamp("1970-01-01")).dt.days
    conv = ev.assign(
        c=(
            (ev["event_type"] == "purchase")
            & (ev["value"].fillna(-1.0) >= 300.0)
        ).astype(int)
    ).groupby("user_id").agg(conv=("c", "max"), first_day=("d", "min"))
    mid = (conv["first_day"].min() + conv["first_day"].max() + 1) // 2
    conv["arm"] = conv.index % 2
    conv["period"] = (conv["first_day"] >= mid).astype(int)
    rates = {}
    for (a, p), grp in conv.groupby(["arm", "period"]):
        rates[(int(a), int(p))] = (len(grp), grp["conv"].mean())
    # empty cells (tiny fixtures put every user in one period) must be
    # NULL on the engine side, never a fabricated 0
    for ncol, rcol, key in [
        ("n_a1", "rate_a1", (0, 0)), ("n_a2", "rate_a2", (0, 1)),
        ("n_b1", "rate_b1", (1, 0)), ("n_b2", "rate_b2", (1, 1)),
    ]:
        if key in rates:
            assert got[ncol] == rates[key][0]
            assert got[rcol] == pytest.approx(rates[key][1], abs=2e-6)
        else:
            assert pd.isna(got[ncol]) and pd.isna(got[rcol])
    if all(k in rates for k in [(0, 0), (0, 1), (1, 0), (1, 1)]):
        did = (rates[(1, 1)][1] - rates[(1, 0)][1]) - (
            rates[(0, 1)][1] - rates[(0, 0)][1]
        )
        assert got["did"] == pytest.approx(did, abs=3e-6)
    else:
        assert pd.isna(got["did"])


def test_ltv_cohort_matches_brute_force(spark, events):
    got = _spark_df(spark, "ml_ltv_cohort").set_index(
        ["cohort_week", "age_weeks"]
    )
    ev = events.copy()
    ev["wk"] = (ev["day"] - pd.Timestamp("1970-01-01")).dt.days // 7
    ev["rev"] = np.where(
        (ev["event_type"] == "purchase") & ev["value"].notna(),
        ev["value"].fillna(0.0),
        0.0,
    )
    first = ev.groupby("user_id")["wk"].min().rename("cohort")
    ev = ev.merge(first, left_on="user_id", right_index=True)
    ev["age"] = ev["wk"] - ev["cohort"]
    size = ev[ev["age"] == 0].groupby("cohort")["user_id"].nunique()
    for coh, grp in ev.groupby("cohort"):
        cum = 0.0
        for age in sorted(grp["age"].unique()):
            cum += float(grp.loc[grp["age"] == age, "rev"].sum())
            row = got.loc[(coh, age)]
            assert row["cohort_users"] == size[coh]
            assert row["cum_revenue"] == pytest.approx(cum, abs=1e-2)
            assert row["ltv_per_user"] == pytest.approx(
                cum / size[coh], abs=1e-2
            )


def test_uplift_segments_match_brute_force(spark, events):
    got = _spark_df(spark, "ml_uplift_segments").set_index("segment")
    conv = (
        events.assign(
            c=(
                (events["event_type"] == "purchase")
                & (events["value"].fillna(-1.0) >= 300.0)
            ).astype(int)
        )
        .groupby("user_id")["c"]
        .max()
    )
    df = conv.reset_index()
    df["segment"] = (df["user_id"] // 2) % 5
    df["arm"] = df["user_id"] % 2
    for seg, grp in df.groupby("segment"):
        a = grp[grp["arm"] == 0]
        b = grp[grp["arm"] == 1]
        row = got.loc[seg]
        if len(a):
            assert row["n_a"] == len(a)
            assert row["conv_a"] == a["c"].sum()
            assert row["rate_a"] == pytest.approx(a["c"].mean(), abs=2e-6)
        else:
            assert pd.isna(row["n_a"])
        if len(b):
            assert row["n_b"] == len(b)
            assert row["rate_b"] == pytest.approx(b["c"].mean(), abs=2e-6)
        if len(a) and len(b):
            assert row["uplift"] == pytest.approx(
                b["c"].mean() - a["c"].mean(), abs=3e-6
            )


def test_feature_screen_matches_numpy_pointbiserial(spark):
    got = _spark_df(spark, "ml_feature_screen").set_index("feature")
    li = pd.read_parquet(f"{SF}/lineitem.parquet").dropna(
        subset=["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )
    y = (li["l_returnflag"] == "R").to_numpy(dtype=float)
    for feat, col in [
        ("quantity", "l_quantity"),
        ("extendedprice", "l_extendedprice"),
        ("discount", "l_discount"),
        ("tax", "l_tax"),
    ]:
        x = (li[col] * 10000).round().to_numpy(dtype=float)
        assert got.loc[feat, "n"] == len(li)
        assert got.loc[feat, "n_returns"] == int(y.sum())
        assert got.loc[feat, "point_biserial_r"] == pytest.approx(
            float(np.corrcoef(x, y)[0, 1]), abs=2e-6
        )


def test_mix_rate_decomp_matches_identity(spark):
    """Volume/rate/cross effects recomputed from raw halves, plus the
    waterfall identity: the three effects must sum to ΔRevenue."""
    got = _spark_df(spark, "agg_mix_rate_decomp").set_index("nation")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    df = orders.merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    ).merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    d = (
        pd.to_datetime(df["o_orderdate"]) - pd.Timestamp("1970-01-01")
    ).dt.days
    mid = (d.min() + d.max() + 1) // 2
    df["half"] = (d >= mid).astype(int)
    df["rev"] = (df["o_totalprice"] * 10000).round().astype("int64")
    for name, grp in df.groupby("n_name"):
        h1 = grp[grp["half"] == 0]
        h2 = grp[grp["half"] == 1]
        row = got.loc[name]
        assert (row["n1"], row["n2"]) == (len(h1), len(h2))
        if not len(h1) or not len(h2):
            assert pd.isna(row["volume_effect"])
            continue
        r1 = h1["rev"].sum() / len(h1) / 1e4
        r2 = h2["rev"].sum() / len(h2) / 1e4
        dn = len(h2) - len(h1)
        vol, rate_e, cross = dn * r1, len(h1) * (r2 - r1), dn * (r2 - r1)
        assert row["volume_effect"] == pytest.approx(vol, abs=2e-4)
        assert row["rate_effect"] == pytest.approx(rate_e, abs=2e-4)
        assert row["cross_effect"] == pytest.approx(cross, abs=2e-4)
        # waterfall identity (exact in R): effects sum to Δrevenue
        delta = (h2["rev"].sum() - h1["rev"].sum()) / 1e4
        assert vol + rate_e + cross == pytest.approx(delta, abs=1e-6)


def test_label_centroids_match_numpy(spark):
    got = _spark_df(spark, "ml_label_centroids").set_index(
        ["label_a", "label_b"]
    )
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    cents = {}
    for lab, grp in emb.groupby("label"):
        m = np.stack(grp["embedding"].to_numpy()).astype(float)
        cents[lab] = m.mean(axis=0)
    labs = sorted(cents)
    for i, a in enumerate(labs):
        for b in labs[i + 1 :]:
            ca, cb = cents[a], cents[b]
            cos = float(
                (ca @ cb) / (np.linalg.norm(ca) * np.linalg.norm(cb))
            )
            assert got.loc[(a, b), "centroid_cosine"] == pytest.approx(
                cos, abs=2e-6
            )


def test_abc_class_matches_cumulative_cut(spark):
    got = _spark_df(spark, "agg_abc_class").set_index("abc_class")
    li = pd.read_parquet(f"{SF}/lineitem.parquet").dropna(
        subset=["l_extendedprice"]
    )
    rev = (
        (li["l_extendedprice"] * 10000)
        .round()
        .astype("int64")
        .groupby(li["l_partkey"])
        .sum()
        .rename("rev")
        .reset_index()
        .sort_values(["rev", "l_partkey"], ascending=[False, True])
    )
    tot = int(rev["rev"].sum())
    cum = rev["rev"].cumsum()
    cls = np.where(
        cum * 100 <= tot * 80, "A", np.where(cum * 100 <= tot * 95, "B", "C")
    )
    rev["cls"] = cls
    per = rev.groupby("cls")["rev"].agg(["size", "sum"])
    for c in per.index:
        assert got.loc[c, "n_parts"] == per.loc[c, "size"]
        assert got.loc[c, "revenue"] == pytest.approx(
            per.loc[c, "sum"] / 1e4, abs=1e-2
        )
        assert got.loc[c, "revenue_share"] == pytest.approx(
            per.loc[c, "sum"] / tot, abs=2e-6
        )


def test_kmeans_matches_numpy_lloyd(spark):
    """2 Lloyd iterations replayed in numpy (same init: the k lowest
    vec_ids; same tie-break: lowest centroid id) — assignments must
    match exactly, squared distances to 1e-5 (the engine quantizes
    centroid sums at 1e-9)."""
    got = _spark_df(spark, "ml_kmeans").set_index("vec_id")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").sort_values(
        "vec_id"
    )
    V = np.stack(emb["embedding"].to_numpy()).astype(float)
    ids = emb["vec_id"].to_numpy()
    k = 8
    cents = {int(i): V[ids == i][0] for i in range(k)}
    for _ in range(2):
        cids = sorted(cents)
        C = np.stack([cents[c] for c in cids])
        d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.array(cids)[np.argmin(d2, axis=1)]  # first = lowest cid
        cents = {
            int(c): V[assign == c].mean(axis=0)
            for c in cids
            if (assign == c).any()
        }
    cids = sorted(cents)
    C = np.stack([cents[c] for c in cids])
    d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assign = np.array(cids)[np.argmin(d2, axis=1)]
    best = d2.min(axis=1)
    for vid, cid, dd in zip(ids, assign, best):
        assert got.loc[vid, "cid"] == cid
        assert got.loc[vid, "d2_q"] == pytest.approx(dd, abs=1e-5)


def _nation_pairs() -> pd.DataFrame:
    """One (c_nationkey, s_nationkey) row per lineitem — pandas rebuild
    of the shared fact-join reduction behind the nation graph keys."""
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    orders = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_orderkey", "o_custkey"]
    ]
    cust = pd.read_parquet(f"{SF}/customer.parquet")[
        ["c_custkey", "c_nationkey"]
    ]
    supp = pd.read_parquet(f"{SF}/supplier.parquet")[
        ["s_suppkey", "s_nationkey"]
    ]
    return (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    )[["c_nationkey", "s_nationkey"]]


def test_triangles_match_brute_force(spark):
    got = _spark_df(spark, "graph_triangles")
    pairs = _nation_pairs()
    pairs = pairs[pairs["c_nationkey"] != pairs["s_nationkey"]]
    edges = {
        (min(a, b), max(a, b))
        for a, b in zip(pairs["c_nationkey"], pairs["s_nationkey"])
    }
    nodes = sorted({n for e in edges for n in e})
    tris = {
        (a, b, c)
        for i, a in enumerate(nodes)
        for b in nodes[i + 1 :]
        if (a, b) in edges
        for c in nodes
        if c > b and (b, c) in edges and (a, c) in edges
    }
    assert {
        (r.na, r.nb, r.nc) for r in got.itertuples()
    } == tris
    assert len(got) == len(tris)


def test_clustering_coeff_matches_brute_force(spark):
    got = _spark_df(spark, "graph_clustering_coeff").set_index("node")
    edges = _co_order_edges()
    nbrs = edges.groupby("node")["nbr"].agg(set)
    for node, ns in nbrs.items():
        d = len(ns)
        tri = sum(
            1
            for u in ns
            for v in ns
            if u < v and v in nbrs.get(u, set())
        )
        assert got.loc[node, "degree"] == d
        assert got.loc[node, "n_triangles"] == tri
        if d >= 2:
            assert got.loc[node, "clustering"] == pytest.approx(
                2 * tri / (d * (d - 1)), abs=2e-6
            )
        else:
            assert pd.isna(got.loc[node, "clustering"])


def test_jaccard_matches_set_arithmetic(spark):
    got = _spark_df(spark, "graph_jaccard").set_index(
        ["supp_a", "supp_b"]
    )
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_suppkey", "l_partkey"]
    ].drop_duplicates()
    parts = li.groupby("l_suppkey")["l_partkey"].agg(set)
    supps = sorted(parts.index)
    n_pairs = 0
    for i, a in enumerate(supps):
        for b in supps[i + 1 :]:
            inter = len(parts[a] & parts[b])
            if not inter:
                continue
            n_pairs += 1
            row = got.loc[(a, b)]
            union = len(parts[a] | parts[b])
            assert row["common_parts"] == inter
            assert (row["deg_a"], row["deg_b"]) == (
                len(parts[a]), len(parts[b]),
            )
            assert row["jaccard"] == pytest.approx(
                inter / union, abs=2e-6
            )
    assert len(got) == n_pairs


def test_components_match_union_find(spark):
    got = _spark_df(spark, "graph_components").set_index("n_name")
    pairs = _nation_pairs()
    pairs = pairs[pairs["c_nationkey"] != pairs["s_nationkey"]]
    cnt = (
        pairs.assign(
            a=pairs.min(axis=1), b=pairs.max(axis=1)
        )
        .groupby(["a", "b"])
        .size()
    )
    kept = cnt[2 * cnt >= cnt.max()]
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    parent = {k: k for k in nat["n_nationkey"]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (a, b) in kept.index:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    for k in nat["n_nationkey"]:
        # component label = smallest reachable key (union-find with
        # min-root merging preserves exactly that)
        assert got.loc[name_of[k], "component"] == find(k)


def test_label_propagation_matches_sync_replay(spark):
    got = _spark_df(spark, "graph_label_propagation").set_index(
        "nationkey"
    )
    pairs = _nation_pairs()
    pairs = pairs[pairs["c_nationkey"] != pairs["s_nationkey"]]
    directed = pairs.groupby(
        ["c_nationkey", "s_nationkey"]
    ).size().rename("w").reset_index()
    rev = directed.rename(
        columns={"c_nationkey": "s_nationkey", "s_nationkey": "c_nationkey"}
    )
    und = (
        pd.concat([directed, rev])
        .groupby(["c_nationkey", "s_nationkey"])["w"]
        .sum()
        .reset_index()
        .rename(columns={"c_nationkey": "src", "s_nationkey": "dst"})
    )
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    labels = {k: k for k in nat["n_nationkey"]}
    for _ in range(3):
        incoming = {}
        for src, dst, w in zip(und["src"], und["dst"], und["w"]):
            lab = labels[src]
            incoming.setdefault(dst, {}).setdefault(lab, 0)
            incoming[dst][lab] += w
        new = dict(labels)
        for node, lw in incoming.items():
            best = sorted(lw.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            new[node] = best[0]
        labels = new
    for k in nat["n_nationkey"]:
        assert got.loc[k, "community"] == labels[k]


def test_reciprocity_matches_min_over_sum(spark):
    got = _spark_df(spark, "graph_reciprocity").set_index(
        ["nation_a", "nation_b"]
    )
    pairs = _nation_pairs()
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    name_of = dict(zip(nat["n_nationkey"], nat["n_name"]))
    df = pd.DataFrame({
        "cn": pairs["c_nationkey"].map(name_of),
        "sn": pairs["s_nationkey"].map(name_of),
    })
    df = df[df["cn"] != df["sn"]]
    w = df.groupby(["cn", "sn"]).size()
    seen = set()
    for (cn, sn) in w.index:
        a, b = min(cn, sn), max(cn, sn)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        w_ab = int(w.get((a, b), 0))
        w_ba = int(w.get((b, a), 0))
        row = got.loc[(a, b)]
        assert (row["w_ab"], row["w_ba"]) == (w_ab, w_ba)
        assert row["reciprocity"] == pytest.approx(
            2 * min(w_ab, w_ba) / (w_ab + w_ba), abs=2e-6
        )
    assert len(got) == len(seen)


def test_resource_alloc_matches_weighted_common_neighbors(spark):
    got = _spark_df(spark, "graph_resource_alloc")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_suppkey", "l_partkey"]
    ].drop_duplicates()
    pdeg = li.groupby("l_partkey").size()
    parts = li.groupby("l_suppkey")["l_partkey"].agg(set)
    supps = sorted(parts.index)
    scores = {}
    for i, a in enumerate(supps):
        for b in supps[i + 1 :]:
            shared = parts[a] & parts[b]
            if shared:
                ra = sum(
                    math.floor(1_000_000_000_000 / pdeg[p])
                    for p in shared
                )
                scores[(a, b)] = (len(shared), ra)
    # engine emits top-10 per supp_a by (ra DESC, supp_b ASC)
    expect = []
    for a in supps:
        cands = sorted(
            ((b, v) for (x, b), v in scores.items() if x == a),
            key=lambda t: (-t[1][1], t[0]),
        )[:10]
        for rk, (b, (common, ra)) in enumerate(cands, 1):
            expect.append((a, b, rk, common, ra))
    got_rows = [
        (r.supp_a, r.supp_b, r.rk, r.common_parts, r.ra_scaled)
        for r in got.itertuples()
    ]
    assert sorted(got_rows) == sorted(expect)


def test_degree_dist_matches_histogram(spark):
    got = _spark_df(spark, "graph_degree_dist").set_index("degree")
    edges = _co_order_edges()
    hist = edges.groupby("node").size().value_counts()
    assert sorted(got.index) == sorted(hist.index)
    for d, n in hist.items():
        assert got.loc[d, "n_parts"] == n


def test_bfs_matches_python_bfs(spark):
    got = _spark_df(spark, "graph_bfs").set_index("part")
    edges = _co_order_edges()
    adj = edges.groupby("node")["nbr"].agg(list).to_dict()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    src = int(li["l_partkey"].min())
    from collections import deque

    dist = {src: 0}
    dq = deque([src])
    while dq:
        u = dq.popleft()
        if dist[u] >= 10:  # BFS_MAX_HOPS
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    assert dict(zip(got.index, got["hops"])) == dist


def test_drawdown_matches_running_max_replay(spark, events):
    got = _spark_df(spark, "win_drawdown").set_index("user_id")
    ev = events[events["value"].notna()].sort_values(["ts", "event_id"])
    for uid, grp in ev.groupby("user_id"):
        v = (grp["value"] * 10000).round().astype("int64").to_numpy()
        peaks = np.maximum.accumulate(v)
        dd = peaks - v
        i = int(np.argmax(dd))  # earliest max (ts order)
        assert got.loc[uid, "max_drawdown"] == pytest.approx(
            dd[i] / 1e4
        )
        assert got.loc[uid, "peak_value"] == pytest.approx(
            peaks[i] / 1e4
        )


def test_anomaly_mad_matches_rank_medians(spark, events):
    got = _spark_df(spark, "ts_anomaly_mad").set_index("event_type")
    ev = events[events["value"].notna()]
    for ty, grp in ev.groupby("event_type"):
        x = np.sort(grp["value"].to_numpy())
        n = len(x)
        med = x[math.ceil(0.5 * n) - 1]  # rank-based, no interpolation
        dev = np.sort(np.abs(grp["value"].to_numpy() - med))
        mad = dev[math.ceil(0.5 * n) - 1]
        n_out = int((np.abs(grp["value"].to_numpy() - med) > 3 * mad).sum())
        assert got.loc[ty, "n_vals"] == n
        assert got.loc[ty, "med"] == pytest.approx(med)
        assert got.loc[ty, "mad"] == pytest.approx(mad)
        assert got.loc[ty, "n_outliers"] == n_out


# ---------------------------------------------------------------------
# Text/LLM analysis family — Python-re/hashlib third implementations
# (regex-engine divergence — RE2 vs Java — is this family's bug class).
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet")


def _ascii_lower(s: str) -> str:
    return s.translate(
        str.maketrans(
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
        )
    )


def test_text_stats_matches_counter(spark, docs):
    from collections import Counter

    got = _spark_df(spark, "llm_text_stats")
    for lang, grp in docs.groupby("lang"):
        cnt: Counter = Counter()
        for txt in grp["text"]:
            cnt.update(tok for tok in txt.split(" ") if tok)
        total = sum(cnt.values())
        top3 = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        sub = got[got["lang"] == lang].sort_values("term_rank")
        assert list(sub["term"]) == [t for t, _ in top3]
        assert list(sub["term_count"]) == [c for _, c in top3]
        assert (sub["lang_tokens"] == total).all()


def test_lang_filter_matches_brute_force(spark, docs):
    got = _spark_df(spark, "llm_lang_filter").set_index(
        ["lang", "source"]
    )
    sel = docs[
        docs["lang"].isin(["en", "de"])
        & docs["n_chars"].between(100, 400)
    ]
    assert len(got) == sel.groupby(["lang", "source"]).ngroups
    for (lang, src), grp in sel.groupby(["lang", "source"]):
        row = got.loc[(lang, src)]
        assert row["doc_count"] == len(grp)
        assert row["avg_chars"] == pytest.approx(
            grp["n_chars"].mean(), abs=1e-2
        )
        assert row["min_chars"] == grp["n_chars"].min()
        assert row["max_chars"] == grp["n_chars"].max()


def test_lang_id_matches_marker_counts(spark, docs):
    got = _spark_df(spark, "llm_lang_id").set_index("doc_id")
    markers = {
        "en": {"the", "and", "of"},
        "es": {"el", "la", "que"},
        "de": {"der", "und", "die"},
        "fr": {"le", "et", "les"},
        "zh": {"de", "shi", "le"},
    }
    order = ["en", "es", "de", "fr", "zh"]
    for _, r in docs.iterrows():
        toks = _ascii_lower(r["text"]).split(" ")
        scores = {
            lg: sum(1 for t in toks if t in ms)
            for lg, ms in markers.items()
        }
        best = max(order, key=lambda lg: (scores[lg], -order.index(lg)))
        row = got.loc[r["doc_id"]]
        for lg in order:
            assert row[f"s_{lg}"] == scores[lg]
        assert row["guessed_lang"] == best


def test_quality_score_matches_python_formula(spark, docs):
    import re as _re

    got = _spark_df(spark, "llm_quality_score").set_index("doc_id")
    stopset = {"the", "a", "and", "of", "to"}
    pat = _re.compile(r"[^A-Za-z \t\n\r\f\x0B]")
    for _, r in docs.iterrows():
        text = r["text"]
        toks = text.split(" ")
        n_tok = len(toks)
        n_chars = len(text)
        stop = sum(
            1 for t in _ascii_lower(text).split(" ") if t in stopset
        )
        nonalpha = len(pat.findall(text))
        mean_len = (n_chars - (n_tok - 1)) / n_tok
        row = got.loc[r["doc_id"]]
        assert row["n_tokens"] == n_tok
        assert row["mean_token_len"] == pytest.approx(
            mean_len, abs=2e-4
        )
        assert row["stopword_ratio"] == pytest.approx(
            stop / n_tok, abs=2e-4
        )
        if n_chars:
            assert row["nonalpha_ratio"] == pytest.approx(
                nonalpha / n_chars, abs=2e-4
            )
            score = (
                min(n_tok / 100.0, 1.0) * 0.4
                + min(mean_len / 8.0, 1.0) * 0.2
                + (stop / n_tok) * 0.2
                + (1.0 - nonalpha / n_chars) * 0.2
            )
            assert row["quality_score"] == pytest.approx(
                score, abs=2e-4
            )


def test_token_count_matches_python_re(spark, docs):
    import re as _re

    got = _spark_df(spark, "llm_token_count").set_index("doc_id")
    pat = _re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 \t\n\r\f\x0B]")
    for _, r in docs.iterrows():
        row = got.loc[r["doc_id"]]
        assert row["ws_tokens"] == len(r["text"].split(" "))
        assert row["bpe_ish_tokens"] == len(
            pat.findall(_ascii_lower(r["text"]))
        )
        assert row["n_chars_measured"] == len(r["text"])


def test_fingerprint_matches_hashlib(spark, docs):
    import hashlib
    import re as _re

    got = _spark_df(spark, "llm_fingerprint").set_index("doc_id")
    ws = _re.compile(r"[ \t\n\r\f\x0B]+")
    fps = {}
    for _, r in docs.iterrows():
        norm = _ascii_lower(ws.sub(" ", r["text"]).strip())
        fps[r["doc_id"]] = hashlib.md5(
            norm.encode("utf-8")
        ).hexdigest()
    from collections import Counter

    freq = Counter(fps.values())
    for did, fp in fps.items():
        assert got.loc[did, "fp"] == fp
        assert bool(got.loc[did, "is_dup"]) == (freq[fp] > 1)


def test_pareto_matches_cumulative_crossing(spark, events):
    got = _spark_df(spark, "win_pareto").set_index("event_type")
    ev = events[events["value"].notna()]
    for ty, grp in ev.groupby("event_type"):
        g = grp.sort_values(
            ["value", "event_id"], ascending=[False, True]
        )
        v = (g["value"] * 10000).round().astype("int64").to_numpy()
        cum = np.cumsum(v)
        tot = int(v.sum())
        k = int(np.argmax(5 * cum >= 4 * tot)) + 1  # first crossing
        assert got.loc[ty, "k_events"] == k
        assert got.loc[ty, "n_events"] == len(v)
        assert got.loc[ty, "top_frac"] == pytest.approx(
            k / len(v), abs=2e-6
        )
        assert got.loc[ty, "covered_share"] == pytest.approx(
            cum[k - 1] / tot, abs=2e-6
        )


def test_retention_matches_cohort_triangle(spark, events):
    got = _spark_df(spark, "win_retention").set_index(
        ["cohort_day", "day_offset"]
    )
    ud = events[["user_id", "day"]].drop_duplicates()
    cohort = ud.groupby("user_id")["day"].min().rename("cohort")
    ud = ud.merge(cohort, left_on="user_id", right_index=True)
    ud["offset"] = (ud["day"] - ud["cohort"]).dt.days
    ud["cd"] = ud["cohort"].dt.strftime("%Y-%m-%d")
    cells = ud.groupby(["cd", "offset"]).size()
    assert len(got) == len(cells)
    for (cd, off), n in cells.items():
        size = cells[(cd, 0)]
        row = got.loc[(cd, off)]
        assert row["n_active"] == n
        assert row["cohort_size"] == size
        assert row["retention"] == pytest.approx(n / size, abs=2e-6)


def test_funnel_matches_sequential_replay(spark, events):
    got = _spark_df(spark, "agg_funnel").set_index("stage")
    v = c = p = 0
    for uid, grp in events.groupby("user_id"):
        g = grp.sort_values("ts")
        tv = g.loc[g["event_type"] == "view", "ts"].min()
        if pd.isna(tv):
            continue
        v += 1
        tc = g.loc[
            (g["event_type"] == "click") & (g["ts"] > tv), "ts"
        ].min()
        if pd.isna(tc):
            continue
        c += 1
        tp = g.loc[
            (g["event_type"] == "purchase") & (g["ts"] > tc), "ts"
        ].min()
        if pd.isna(tp):
            continue
        p += 1
    assert got.loc["1_view", "users"] == v
    assert got.loc["2_view_click", "users"] == c
    assert got.loc["3_view_click_purchase", "users"] == p


def test_heavy_hitters_match_exact_threshold(spark, docs):
    """The Misra-Gries candidate pass is a superset guarantee; the
    final output must equal the EXACT set {term : freq >= N/32} —
    recomputed with a plain Counter."""
    from collections import Counter

    got = _spark_df(spark, "agg_heavy_hitters").set_index("term")
    cnt: Counter = Counter()
    for txt in docs["text"].dropna():
        cnt.update(t for t in txt.split(" ") if t)
    n_total = sum(cnt.values())
    expect = {t: f for t, f in cnt.items() if f * 32 >= n_total}
    assert set(got.index) == set(expect)
    for t, f in expect.items():
        assert got.loc[t, "freq"] == f
        assert got.loc[t, "share_q4"] == pytest.approx(
            f / n_total, abs=2e-4
        )


def test_active_users_match_brute_force(spark, events):
    got = _spark_df(spark, "ts_active_users").set_index("epoch_day")
    ud = events[["user_id", "day"]].drop_duplicates().copy()
    ud["d"] = (ud["day"] - pd.Timestamp("1970-01-01")).dt.days
    first = ud.groupby("user_id")["d"].min()
    days = sorted(ud["d"].unique())
    cum = 0
    for d in days:
        dau = ud.loc[ud["d"] == d, "user_id"].nunique()
        wau = ud.loc[ud["d"].between(d - 6, d), "user_id"].nunique()
        new = int((first == d).sum())
        cum += new
        row = got.loc[d]
        assert row["dau"] == dau
        assert row["wau"] == wau
        assert row["new_users"] == new
        assert row["cum_users"] == cum


def test_uniqueness_matches_value_counts(spark):
    got = _spark_df(spark, "dq_uniqueness").set_index("key_name")
    specs = [
        ("orders", ["o_orderkey"], "orders.o_orderkey"),
        ("customer", ["c_custkey"], "customer.c_custkey"),
        ("part", ["p_partkey"], "part.p_partkey"),
        ("supplier", ["s_suppkey"], "supplier.s_suppkey"),
        ("events", ["event_id"], "events.event_id"),
        ("documents", ["doc_id"], "documents.doc_id"),
        (
            "lineitem",
            ["l_orderkey", "l_linenumber"],
            "lineitem.(l_orderkey,l_linenumber)",
        ),
    ]
    for tbl, keys, label in specs:
        df = pd.read_parquet(f"{SF}/{tbl}.parquet")[keys]
        vc = df.groupby(keys).size()
        row = got.loc[label]
        assert row["n_rows"] == len(df)
        assert row["n_keys"] == len(vc)
        assert row["dup_keys"] == int((vc > 1).sum())
        assert row["max_multiplicity"] == int(vc.max())


def test_freshness_matches_epoch_arithmetic(spark, events):
    got = _spark_df(spark, "dq_freshness").set_index("event_type")
    ev = events.copy()
    ev["us"] = (
        pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
        // 1000
    )
    gmax = int(ev["us"].max())
    for ty, grp in ev.groupby("event_type"):
        mx = int(grp["us"].max())
        lag_min = (gmax - mx) // 60000000
        tier = (
            "fresh" if lag_min < 60
            else "stale" if lag_min < 1440
            else "dead"
        )
        row = got.loc[ty]
        assert row["n_events"] == len(grp)
        assert row["latest_us"] == mx
        assert row["lag_minutes"] == lag_min
        assert row["tier"] == tier
        assert row["n_last_24h"] == int(
            (grp["us"] > gmax - 86400000000).sum()
        )


def test_share_shift_matches_half_shares(spark):
    got = _spark_df(spark, "agg_share_shift").set_index("nation")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    df = orders.merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    ).merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    d = (
        pd.to_datetime(df["o_orderdate"]) - pd.Timestamp("1970-01-01")
    ).dt.days
    mid = (d.min() + d.max() + 1) // 2
    df["half"] = (d >= mid).astype(int)
    df["rev"] = (df["o_totalprice"] * 10000).round().astype("int64")
    t1 = int(df.loc[df["half"] == 0, "rev"].sum())
    t2 = int(df.loc[df["half"] == 1, "rev"].sum())
    for name, grp in df.groupby("n_name"):
        r1 = int(grp.loc[grp["half"] == 0, "rev"].sum())
        r2 = int(grp.loc[grp["half"] == 1, "rev"].sum())
        row = got.loc[name]
        assert row["rev_h1"] == pytest.approx(r1 / 1e4, abs=1e-2)
        assert row["rev_h2"] == pytest.approx(r2 / 1e4, abs=1e-2)
        assert row["share_h1"] == pytest.approx(r1 / t1, abs=2e-6)
        assert row["share_h2"] == pytest.approx(r2 / t2, abs=2e-6)
        assert row["share_delta"] == pytest.approx(
            r2 / t2 - r1 / t1, abs=3e-6
        )


def test_tfidf_matches_counter_arithmetic(spark, docs):
    from collections import Counter

    got = _spark_df(spark, "llm_tfidf").set_index("doc_id")
    tf = {}
    df: Counter = Counter()
    for _, r in docs.iterrows():
        cnt = Counter(t for t in r["text"].split(" ") if t)
        if cnt:
            tf[r["doc_id"]] = cnt
            df.update(cnt.keys())
    n_docs = len(tf)
    for did, cnt in tf.items():
        scored = {
            term: math.floor(c * n_docs / df[term] * 1e4) / 1e4
            for term, c in cnt.items()
        }
        best = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got.loc[did, "top_term"] == best[0]
        assert got.loc[did, "tfidf"] == pytest.approx(best[1])


def test_collocations_match_discounted_lift(spark, docs):
    from collections import Counter

    got = _spark_df(spark, "llm_collocations").set_index(
        ["term_a", "term_b"]
    )
    uni: Counter = Counter()
    pairs: Counter = Counter()
    for txt in docs["text"].dropna():
        toks = [t for t in txt.split(" ") if t]
        uni.update(toks)
        pairs.update(zip(toks, toks[1:]))
    n_tok = sum(uni.values())
    expect = {}
    for (a, b), c_ab in pairs.items():
        if c_ab < 5:
            continue
        score = (c_ab - 5.0) * n_tok / (uni[a] * uni[b])
        if math.floor(score * 1e6) / 1e6 > 1.0:
            expect[(a, b)] = (c_ab, uni[a], uni[b], score)
    assert set(got.index) == set(expect)
    for key, (c_ab, c_a, c_b, score) in expect.items():
        row = got.loc[key]
        assert row["pair_count"] == c_ab
        assert (row["count_a"], row["count_b"]) == (c_a, c_b)
        assert row["phrase_score"] == pytest.approx(score, abs=2e-6)


def test_gap_detect_matches_diff_scan(spark, events):
    got = _spark_df(spark, "ts_gap_detect")
    got_set = {
        (r.user_id, r.gap_start_us, r.gap_end_us)
        for r in got.itertuples()
    }
    ev = events.sort_values(["ts", "event_id"]).copy()
    ev["us"] = (
        pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
        // 1000
    )
    expect = set()
    thr = 24 * 3600 * 1_000_000
    for uid, grp in ev.groupby("user_id"):
        us = grp["us"].to_list()
        for prev, cur in zip(us, us[1:]):
            if cur - prev > thr:
                expect.add((uid, prev, cur))
    assert got_set == expect
    for r in got.itertuples():
        assert r.gap_us == r.gap_end_us - r.gap_start_us


def test_saturation_matches_edge_pileup(spark, events):
    got = _spark_df(spark, "dq_saturation").set_index("event_type")
    ev = events[events["value"].notna()]
    for ty, grp in ev.groupby("event_type"):
        v = (grp["value"] * 10000).round().astype("int64")
        row = got.loc[ty]
        assert row["n"] == len(v)
        assert row["v_min"] == pytest.approx(v.min() / 1e4)
        assert row["v_max"] == pytest.approx(v.max() / 1e4)
        assert row["n_at_min"] == int((v == v.min()).sum())
        assert row["n_at_max"] == int((v == v.max()).sum())
        assert row["max_pileup_share"] == pytest.approx(
            (v == v.max()).sum() / len(v), abs=2e-6
        )


def test_temporal_integrity_matches_date_arithmetic(spark):
    got = _spark_df(spark, "dq_temporal_integrity").set_index("priority")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_shipdate"]
    ]
    orders = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ]
    df = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    lag = (
        pd.to_datetime(df["l_shipdate"]).dt.floor("D")
        - pd.to_datetime(df["o_orderdate"]).dt.floor("D")
    ).dt.days
    df["lag"] = lag
    for pri, grp in df.groupby("o_orderpriority"):
        ok = grp[grp["lag"] >= 0]
        row = got.loc[pri]
        assert row["n"] == len(grp)
        assert row["n_violations"] == int((grp["lag"] < 0).sum())
        assert row["min_lag_days"] == grp["lag"].min()
        assert row["max_lag_days"] == grp["lag"].max()
        if len(ok):
            assert row["mean_lag_days"] == pytest.approx(
                ok["lag"].mean(), abs=2e-6
            )


def test_completeness_trend_matches_cross_multiplied_mk(spark, events):
    got = _spark_df(spark, "dq_completeness_trend").set_index(
        "epoch_day"
    )
    ev = events.copy()
    ev["d"] = (ev["day"] - pd.Timestamp("1970-01-01")).dt.days
    daily = ev.groupby("d").agg(
        n=("event_id", "size"),
        nv=("value", lambda s: int(s.isna().sum())),
        np_=("props", lambda s: int(s.isna().sum())),
    )
    days = sorted(daily.index)
    s = 0
    for i, di in enumerate(days):
        for dj in days[i + 1 :]:
            cross = (
                daily.loc[dj, "nv"] * daily.loc[di, "n"]
                - daily.loc[di, "nv"] * daily.loc[dj, "n"]
            )
            s += int(np.sign(cross))
    for d in days:
        row = got.loc[d]
        assert row["n"] == daily.loc[d, "n"]
        assert row["null_value_rate"] == pytest.approx(
            daily.loc[d, "nv"] / daily.loc[d, "n"], abs=2e-6
        )
        assert row["null_props_rate"] == pytest.approx(
            daily.loc[d, "np_"] / daily.loc[d, "n"], abs=2e-6
        )
        assert row["mk_s_value_nulls"] == s


def test_bigram_lm_matches_counter_probability(spark, docs):
    from collections import Counter

    got = _spark_df(spark, "llm_bigram_lm").set_index("doc_id")
    per_doc = {}
    corpus: Counter = Counter()
    for _, r in docs.iterrows():
        toks = r["text"].split(" ")
        grams = [
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        ] if len(toks) >= 2 else []
        if grams:
            per_doc[r["doc_id"]] = grams
            corpus.update(grams)
    total = sum(corpus.values())
    assert set(got.index) == set(per_doc)
    for did, grams in per_doc.items():
        avg_p = sum(corpus[g] / total for g in grams) / len(grams)
        assert got.loc[did, "n_bigrams"] == len(grams)
        assert got.loc[did, "avg_p"] == pytest.approx(avg_p, abs=2e-9)


def test_ngram_novelty_matches_distinct_df(spark, docs):
    from collections import Counter

    got = _spark_df(spark, "llm_ngram_novelty").set_index("doc_id")
    per_doc = {}
    df: Counter = Counter()
    for _, r in docs.iterrows():
        toks = r["text"].split(" ")
        grams = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        if grams:
            per_doc[r["doc_id"]] = grams
            df.update(grams)
    assert set(got.index) == set(per_doc)
    for did, grams in per_doc.items():
        uniq = sum(1 for g in grams if df[g] == 1)
        assert got.loc[did, "n_grams"] == len(grams)
        assert got.loc[did, "n_unique"] == uniq
        assert got.loc[did, "novelty"] == pytest.approx(
            math.floor(uniq * 1e4 / len(grams)) / 1e4
        )


def test_winnow_matches_python_replay(spark, docs):
    import hashlib

    got = _spark_df(spark, "llm_winnow_fingerprint")
    got_set = {(r.doc_id, r.fp) for r in got.itertuples()}
    K, W = 4, 4
    expect = set()
    for _, r in docs.iterrows():
        if r["text"] is None:
            continue
        toks = r["text"].split(" ")
        if len(toks) < K:
            continue
        hs = [
            hashlib.md5(
                " ".join(toks[i : i + K]).encode("utf-8")
            ).hexdigest()[:12]
            for i in range(len(toks) - K + 1)
        ]
        for s in range(len(hs) - W + 1):
            expect.add((r["doc_id"], min(hs[s : s + W])))
    assert got_set == expect


def test_churn_labels_match_window_replay(spark, events):
    got = _spark_df(spark, "ml_churn_labels").set_index("user_id")
    ev = events.copy()
    ev["d"] = (ev["day"] - pd.Timestamp("1970-01-01")).dt.days
    cut = int(ev["d"].max()) - 6
    n_rows = 0
    for uid, grp in ev.groupby("user_id"):
        obs = grp[grp["d"] < cut]
        lab = grp[grp["d"] >= cut]
        if not len(obs):
            assert uid not in got.index
            continue
        n_rows += 1
        row = got.loc[uid]
        assert row["n_events"] == len(obs)
        assert row["active_days"] == obs["d"].nunique()
        assert row["n_purchases"] == int(
            (obs["event_type"] == "purchase").sum()
        )
        tv = (
            (obs["value"].dropna() * 10000).round().astype("int64").sum()
        )
        assert row["total_value"] == pytest.approx(tv / 1e4, abs=1e-3)
        assert row["recency_days"] == cut - int(obs["d"].max())
        assert row["churned"] == int(len(lab) == 0)
    assert len(got) == n_rows


def test_gap_fill_matches_spine(spark, events):
    got = _spark_df(spark, "ts_gap_fill").set_index(
        ["event_type", "epoch_day"]
    )
    ev = events.copy()
    ev["d"] = (ev["day"] - pd.Timestamp("1970-01-01")).dt.days
    observed = ev.groupby(["event_type", "d"]).size()
    lo = int(ev["d"].min())
    hi = int(ev["d"].max())
    types = sorted(ev["event_type"].unique())
    assert len(got) == len(types) * (hi - lo + 1)
    for ty in types:
        for d in range(lo, hi + 1):
            row = got.loc[(ty, d)]
            vol = int(observed.get((ty, d), 0))
            assert row["volume"] == vol
            assert row["is_gap"] == int((ty, d) not in observed)


def test_embedding_audit_matches_numpy_norms(spark):
    got = _spark_df(spark, "dq_embedding_audit").set_index("label")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    for lab, grp in emb.groupby("label"):
        m = np.stack(grp["embedding"].to_numpy()).astype(float)
        norms = np.sqrt((m**2).sum(axis=1))
        row = got.loc[lab]
        assert row["n_vecs"] == len(grp)
        assert row["n_null_vec"] == 0  # base fixture: no missing vectors
        assert row["n_dim_drift"] == int((m.shape[1] != 64) * len(grp))
        assert row["n_zero_vec"] == int((norms < 1e-6).sum())
        assert row["n_nonfinite"] == int((~np.isfinite(m)).sum())
        assert row["mean_norm"] == pytest.approx(
            norms.mean(), abs=2e-5
        )
        assert row["min_norm"] == pytest.approx(norms.min(), abs=2e-5)
        assert row["max_norm"] == pytest.approx(norms.max(), abs=2e-5)

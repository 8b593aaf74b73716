"""Scaling measurement — runs flagship queries at 1× and N× the bench
scale factor (N× built by key-shifted replication into .scratch, so join
cardinalities scale linearly and keys stay consistent) and reports the
scaling ratio per query. Near-linear ratios are the evidence that the
plans (pushdown, broadcast, partial agg, top-k) hold as data grows —
the local proxy for the 100 TB design claim.

Usage: python stress.py [replicas=8]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from serverless_etl_aws_spark.catalog import load_table
from serverless_etl_aws_spark.session import get_spark

BASE_SF = "/root/testdata/sf0.1"
SCRATCH = "/root/repo/.scratch/stress"


def build_scaled(spark, replicas: int) -> str:
    out = os.path.join(SCRATCH, f"x{replicas}")
    if os.path.exists(out):
        return out
    os.makedirs(out, exist_ok=True)
    li = load_table(spark, BASE_SF, "lineitem")
    orders = load_table(spark, BASE_SF, "orders")
    max_ok = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    max_ck = orders.agg(F.max("o_custkey")).collect()[0][0] + 1

    def rep(df, keys):
        parts = []
        for i in range(replicas):
            d = df
            for col, stride in keys:
                d = d.withColumn(col, F.col(col) + F.lit(i * stride))
            parts.append(d)
        out_df = parts[0]
        for p in parts[1:]:
            out_df = out_df.unionByName(p)
        return out_df

    rep(li, [("l_orderkey", max_ok)]).write.mode("overwrite").parquet(
        os.path.join(out, "lineitem.parquet")
    )
    rep(orders, [("o_orderkey", max_ok), ("o_custkey", max_ck)]).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "orders.parquet"))
    for small in ("customer", "part", "nation", "region", "supplier"):
        shutil.copy(
            os.path.join(BASE_SF, f"{small}.parquet"),
            os.path.join(out, f"{small}.parquet"),
        )
    return out


QUERIES = {
    # key → builder(spark, dir) returning a DataFrame to execute via noop
    "q1_agg_group": lambda s, d: load_table(s, d, "lineitem")
    .groupBy("l_returnflag", "l_linestatus")
    .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sq"),
         F.count(F.lit(1)).alias("n")),
    "join_fact_fact": lambda s, d: load_table(s, d, "lineitem").join(
        load_table(s, d, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).groupBy("o_orderpriority").count(),
    "win_running": lambda s, d: load_table(s, d, "orders").select(
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(
            __import__(
                "pyspark.sql.window", fromlist=["Window"]
            ).Window.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            ).rowsBetween(-(1 << 31) + 1, 0)
        ).alias("rs"),
    ),
    "sort_limit": lambda s, d: load_table(s, d, "lineitem").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    ).limit(10),
}


def run(spark, sf_dir: str) -> dict[str, float]:
    times = {}
    for key, fn in QUERIES.items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[key] = round(time.perf_counter() - t0, 2)
    return times


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark(app_name="stress", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    scaled = build_scaled(spark, replicas)
    base = run(spark, BASE_SF)   # warm
    base = run(spark, BASE_SF)
    big = run(spark, scaled)
    report = {
        k: {"x1_sec": base[k], f"x{replicas}_sec": big[k],
            "ratio": round(big[k] / max(base[k], 1e-9), 1)}
        for k in QUERIES
    }
    print(json.dumps({"replicas": replicas, "queries": report}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()

"""Scaling measurement — runs flagship queries at 1× and N× the bench
scale factor (N× built by key-shifted replication into .scratch, so join
cardinalities scale linearly and foreign keys stay valid) and reports the
scaling ratio per query. Near-linear ratios are the evidence that the
plans (pushdown, partial agg, shuffle join, top-k) hold as data grows —
the local proxy for the 100 TB design claim.

Queries are taken from the engine's own registry (the same plans bench.py
and the DuckDB oracle validate), plus one fact⋈fact join measured with
broadcast DISABLED so a real shuffle join is what's timed (with the
default 64 MB threshold, orders still broadcasts at 8×, which would
measure the wrong plan).

Usage: python stress.py [replicas=8]  (env: SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE)
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
from serverless_etl_aws_spark.queries import build_registry
from serverless_etl_aws_spark.session import get_spark

BASE_SF = "/root/testdata/sf0.1"
SCRATCH = "/root/repo/.scratch/stress"


def build_scaled(spark, replicas: int) -> str:
    out = os.path.join(SCRATCH, f"x{replicas}")
    done = os.path.join(out, "_BUILD_COMPLETE")
    if os.path.exists(done):
        return out
    if os.path.exists(out):  # interrupted build — rebuild from scratch
        shutil.rmtree(out)
    os.makedirs(out)
    orders = load_table(spark, BASE_SF, "orders")
    customer = load_table(spark, BASE_SF, "customer")
    maxes = orders.agg(
        F.max("o_orderkey").alias("ok"), F.max("o_custkey").alias("ck")
    ).collect()[0]
    max_ok, max_ck = maxes["ok"] + 1, maxes["ck"] + 1

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

    li = load_table(spark, BASE_SF, "lineitem")
    rep(li, [("l_orderkey", max_ok)]).write.mode("overwrite").parquet(
        os.path.join(out, "lineitem.parquet")
    )
    rep(orders, [("o_orderkey", max_ok), ("o_custkey", max_ck)]).write.mode(
        "overwrite"
    ).parquet(os.path.join(out, "orders.parquet"))
    # replicate customer with the same custkey stride → foreign keys stay
    # valid at every replica (orders.o_custkey always has a customer row)
    rep(customer, [("c_custkey", max_ck)]).write.mode("overwrite").parquet(
        os.path.join(out, "customer.parquet")
    )
    for small in ("part", "nation", "region", "supplier"):
        shutil.copy(
            os.path.join(BASE_SF, f"{small}.parquet"),
            os.path.join(out, f"{small}.parquet"),
        )
    open(done, "w").close()
    return out


REGISTRY_KEYS = ["agg_group", "win_running", "sort_limit", "topk_per_group"]


def shuffle_fact_join(spark, sf_dir: str):
    """lineitem⋈orders with broadcast disabled — a genuine shuffle
    (sort-merge) join at both scales."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .count()
    )


def run(spark, sf_dir: str) -> dict[str, float]:
    registry = build_registry()
    times: dict[str, float] = {}
    for key in REGISTRY_KEYS:
        t0 = time.perf_counter()
        registry[key].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        times[key] = round(time.perf_counter() - t0, 2)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t0 = time.perf_counter()
        shuffle_fact_join(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        times["join_fact_shuffle"] = round(time.perf_counter() - t0, 2)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    return times


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="stress", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = build_scaled(spark, replicas)
    run(spark, BASE_SF)      # discard: warm 1×
    base = run(spark, BASE_SF)
    run(spark, scaled)       # discard: warm N× symmetrically
    big = run(spark, scaled)
    report = {
        k: {"x1_sec": base[k], f"x{replicas}_sec": big[k],
            "ratio": round(big[k] / max(base[k], 1e-9), 1)}
        for k in base
    }
    print(json.dumps({"replicas": replicas, "queries": report}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()

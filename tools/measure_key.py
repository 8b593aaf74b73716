"""Per-key measurement harness for optimization rounds (guide §1).

Usage:
    python tools/measure_key.py KEY [KEY...] [--sf DIR] [--plans OUT_DIR]
        [--runs N] [--cpus N]

For each key: builds the DataFrame (timed — Python-side plan construction),
captures .explain("formatted") to OUT_DIR/<key>_<tag>.txt when --plans is
given, then times the noop-sink execution cold + N warm runs — the same
methodology as bench.py (warm median is what the driver's bench reports).
Job descriptions are set per key so a Spark UI session can attribute work.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_etl_aws_spark.queries import build_registry
from serverless_etl_aws_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None,
                    help="directory for <key>_<tag>.txt explain dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-exec", action="store_true",
                    help="capture the plan only; skip the timed noop runs")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    spark = get_spark(
        app_name="measure-key",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = build_registry()

    out: dict[str, dict] = {}
    for key in args.keys:
        q = registry[key]
        spark.sparkContext.setJobDescription(f"measure:{key}")
        rec: dict = {}
        t0 = time.perf_counter()
        df = q.fn(spark, args.sf)
        rec["build_s"] = round(time.perf_counter() - t0, 3)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
            with open(os.path.join(
                    args.plans, f"{key}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        if args.no_exec:
            out[key] = rec
            print(json.dumps({key: rec}), flush=True)
            spark.sparkContext.setJobDescription(None)
            continue
        runs = []
        for i in range(1 + args.runs):
            t0 = time.perf_counter()
            d = q.fn(spark, args.sf) if i else df
            d.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            del d
            gc.collect()
        rec["cold_s"] = runs[0]
        rec["warm_runs"] = runs[1:]
        warm = sorted(runs[1:])
        rec["warm_median"] = warm[len(warm) // 2] if warm else None
        out[key] = rec
        print(json.dumps({key: rec}), flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()

"""Stage-level profile of registry keys (guide §1/§7: measure first).

Usage:
    python tools/profile_key.py KEY [KEY...] [--sf DIR] [--cpus N]

Runs each key once warm (after a throwaway cold run), then reads the
Spark UI REST API for per-stage metrics: wall-clock span, task count,
executor run time, shuffle read/write bytes, input bytes. Prints a
per-key table so the expensive stage (and whether it is a 1-task scan,
a shuffle, or Python work) is a recorded fact rather than a guess.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serverless_etl_aws_spark.queries import build_registry
from serverless_etl_aws_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--port", type=int, default=4050)
    args = ap.parse_args()

    spark = get_spark(
        app_name="profile-key",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(args.port),
            "spark.ui.retainedStages": "5000",
            "spark.ui.retainedJobs": "5000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = build_registry()
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:{args.port}/api/v1/applications/{app_id}"

    def stages() -> list[dict]:
        with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
            return json.loads(r.read())

    for key in args.keys:
        q = registry[key]
        # cold run (not profiled)
        spark.sparkContext.setJobDescription(f"cold:{key}")
        q.fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        before = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(f"warm:{key}")
        t0 = time.perf_counter()
        q.fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        time.sleep(0.3)
        new = [s for s in stages() if s["stageId"] not in before]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"\n=== {key}: warm wall {wall:.3f}s, {len(new)} stages ===")
        tot_run = sum(s.get("executorRunTime") or 0 for s in new)
        print(f"  total executorRunTime {tot_run/1e3:.2f}s "
              f"(x{tot_run/1e3/max(wall,1e-9):.1f} parallelism-weighted)")
        for s in new[:14]:
            name = s.get("name", "")[:60]
            sub = time.strptime
            dur = "?"
            try:
                from datetime import datetime
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                a = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
                b = datetime.strptime(s["completionTime"], fmt)
                dur = f"{(b - a).total_seconds():6.2f}"
            except Exception:
                pass
            print(
                f"  run={s.get('executorRunTime', 0)/1e3:7.2f}s "
                f"wall={dur}s tasks={s.get('numCompleteTasks', s.get('numTasks')):4d} "
                f"in={s.get('inputBytes', 0)/1e6:7.1f}MB "
                f"sr={s.get('shuffleReadBytes', 0)/1e6:7.1f}MB "
                f"sw={s.get('shuffleWriteBytes', 0)/1e6:7.1f}MB  {name}"
            )
        sys.stdout.flush()
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()

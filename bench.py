"""Benchmark runner — times every registry query at the bench scale factor.

Usage: ``python bench.py`` (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS).
Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {key: sec, ...}, "sf": ...}.

Execution is measured with the noop sink (full plan runs, nothing is
collected to the driver) except for keys that already materialize their
result as part of their semantics (streaming/pipeline keys).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from serverless_etl_aws_spark.queries import build_registry
from serverless_etl_aws_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = build_registry()
    timings: dict[str, float] = {}
    # Warm the JVM + parquet footers once so per-query numbers reflect the
    # steady state the 100 TB design targets, not first-touch JIT cost.
    registry["agg_group"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    import gc

    for key in sorted(registry):
        q = registry[key]
        t0 = time.perf_counter()
        try:
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[key] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # pragma: no cover — keep the line parseable
            timings[key] = -1.0
            print(f"# {key} FAILED: {exc}", file=sys.stderr)
        # Release the key's lineage before timing the next one: dedup
        # operators pin localCheckpoint blocks until the Python refs die
        # and the ContextCleaner runs; without this, later keys are timed
        # under the earlier keys' heap pressure (measured +12s on
        # stream_stateful when it runs after the dedup family). The JVM
        # GC nudge only fires after expensive keys — a full System.gc()
        # between every key costs more than it reclaims.
        del df
        gc.collect()
        if timings.get(key, 0) > 3.0:
            spark._jvm.System.gc()

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "engine_suite_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

"""Session-shape drift axes (sweep tier).

25th axis — EXECUTION PARALLELISM: every other axis runs the same
local[32]/sp=32/AQE-on session shape, so a key whose result depends on
partition count, partition-local fold order, or coalesce timing would
pass them all and still break on a real cluster (where
shuffle.partitions is thousands). Two shapes in-session (sp=1 and a
large prime 257, AQE off, registry functions called DIRECTLY — no
tune_for_session repin) plus one fresh-process shape (master=local[1],
sp=1, AQE off) that also serializes task execution order.

26th axis — HOSTILE JVM DEFAULT LOCALE/CHARSET: the JVM launched under
tr_TR (Turkish dotted/dotless i casing, comma decimal separator) with
an ISO-8859-9 default charset, full registry through the DRIVER's path
(__spark_entry__ wrap). First run caught a real bug: Spark resolves
the partitionOverwriteMode option with a default-locale toUpperCase
before Enumeration.withName, so the engine's "dynamic" became
"DYNAMİC" and every foreachBatch partitioned write died
(NoSuchElementException) — fixed by passing the value pre-uppercased
(pipeline/ingest.py; teeth pinned in test_engine_api.py).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import pytest

from serverless_etl_aws_spark.compare import compare
from serverless_etl_aws_spark.queries import build_registry

REGISTRY = build_registry()

_HERE = os.path.dirname(os.path.abspath(__file__))
_PROBE = os.path.join(_HERE, "axes_probe.py")


@pytest.fixture(params=["1", "257"], ids=["sp1", "sp257"])
def hostile_shuffle(request, spark):
    """Force a hostile shuffle-partition count with AQE off (AQE's
    runtime coalescing would mask partition-count dependence), restore
    the harness tuning afterwards."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.enabled",
        )
    }
    spark.conf.set("spark.sql.shuffle.partitions", request.param)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield request.param
    for k, v in saved.items():
        spark.conf.set(k, v)


@pytest.mark.parametrize("key", sorted(REGISTRY))
def test_shuffle_shape_drift_parity(spark, sf_dir, hostile_shuffle, key):
    """Full-registry strict parity with shuffle.partitions forced to 1
    and to a large prime, AQE off — any partition-count or fold-order
    dependence diverges here and nowhere else."""
    q = REGISTRY[key]
    result = compare(key, q.fn(spark, sf_dir), q.sql, sf_dir, strict=True)
    assert result.ok, (
        f"{key} @ sp={hostile_shuffle}: {result.detail} "
        f"(spark={result.rows_spark}, oracle={result.rows_oracle})"
    )


def _run_probe(shape: str, sf_dir: str, timeout: int = 1500) -> str:
    proc = subprocess.run(
        [sys.executable, _PROBE, shape, sf_dir],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd="/tmp",  # foreign cwd on purpose (round-10 portability class)
    )
    tail = "\n".join((proc.stdout or "").strip().splitlines()[-40:])
    assert proc.returncode == 0, (
        f"axes_probe {shape} rc={proc.returncode}\n{tail}\n"
        f"stderr tail: {(proc.stderr or '')[-2000:]}"
    )
    m = re.search(r"RESULT shape=\S+ n=(\d+) failed=(\d+)", proc.stdout)
    assert m, f"no RESULT line in probe output:\n{tail}"
    n, failed = int(m.group(1)), int(m.group(2))
    assert n == len(REGISTRY), f"probe ran {n} keys, registry has {len(REGISTRY)}"
    assert failed == 0, tail
    return proc.stdout


def test_local1_serial_execution_full_registry(sf_dir):
    """master=local[1], sp=1, AQE off in a fresh process: one task at a
    time, one shuffle partition — partition-local fold order collapses
    to a single sequential fold, and any result that depended on
    multi-partition interleaving diverges from the oracle."""
    _run_probe("local1", sf_dir)


def test_turkish_locale_full_registry(sf_dir):
    """JVM under tr_TR + ISO-8859-9, full registry through the driver's
    wrap: locale-dependent casing (i→İ), decimal rendering, and default
    charset must not reach any result or any engine-internal enum
    lookup. The probe exits vacuous (rc=2) if the hostile locale did
    not take, so a quietly-green run can't be a no-op."""
    _run_probe("tr_locale", sf_dir)

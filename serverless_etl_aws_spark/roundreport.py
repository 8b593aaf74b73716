"""One-command round report (VERDICT r7 directive #7).

``python -m serverless_etl_aws_spark report`` collects the judge-facing
evidence that otherwise spans CORRECTNESS_r{N}.json / BENCH_DETAIL.json
/ docs/SCALING.md / the registry into ONE JSON written to
``REPORT_r{N}.json`` at the repo root (and echoed to stdout):

* registry — key count, §2B contract count, oracle coverage split
  (recomputed live from ``build_registry()``, not from artifacts);
* sweep — a fresh driver-identical cross-engine sweep
  (``compare.run_all`` vs DuckDB) at ``--sweep-sf`` (skipped with
  ``--no-sweep`` when only artifact collation is wanted);
* correctness — the latest driver CORRECTNESS_r*.json, summarized;
* bench — BENCH_DETAIL.json headline (suite warm/cold totals, worst
  warm key, failures, wobble spreads recorded);
* scaling — how many registry keys have measured ratio rows in
  docs/SCALING.md.

The round number defaults to <latest driver CORRECTNESS round> + 1
(the driver writes round N's files AFTER the session), overridable
with ``--round``.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_round(root: str) -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds, default=0)


def registry_section() -> dict[str, Any]:
    from .queries import CONTRACT_2B, build_registry

    registry = build_registry()
    no_oracle = sorted(k for k, q in registry.items() if q.sql is None)
    return {
        "n_keys": len(registry),
        "n_contract_2b": len(CONTRACT_2B),
        "contract_2b_all_present": all(
            k in registry for k in CONTRACT_2B
        ),
        "n_oracle_sql": sum(
            1 for q in registry.values() if q.sql is not None
        ),
        "rows_only_keys": no_oracle,
    }


def correctness_section(root: str) -> dict[str, Any]:
    n = _latest_round(root)
    if n == 0:
        return {"available": False}
    path = os.path.join(root, f"CORRECTNESS_r{n:02d}.json")
    if not os.path.exists(path):  # non-zero-padded fallback
        path = os.path.join(root, f"CORRECTNESS_r{n}.json")
    with open(path) as f:
        rows = json.load(f)
    fails = sorted(
        k
        for k, v in rows.items()
        if v.get("err") not in (None, "no_oracle")
        or v.get("hash_match") is False
        or v.get("rows_match") is False
    )
    return {
        "available": True,
        "driver_round": n,
        "file": os.path.basename(path),
        "n_rows": len(rows),
        "n_hash_pass": sum(
            1 for v in rows.values() if v.get("hash_match") is True
        ),
        "n_no_oracle": sum(
            1 for v in rows.values() if v.get("err") == "no_oracle"
        ),
        "failures": fails,
    }


def bench_section(root: str) -> dict[str, Any]:
    path = os.path.join(root, "BENCH_DETAIL.json")
    if not os.path.exists(path):
        return {"available": False}
    with open(path) as f:
        d = json.load(f)
    queries = d.get("queries", {})
    worst_key, worst_warm = None, -1.0
    for k, v in queries.items():
        w = v.get("warm", -1.0)
        if w > worst_warm:
            worst_key, worst_warm = k, w
    return {
        "available": True,
        "sf": d.get("sf"),
        "n_keys": d.get("n_keys"),
        "n_measured": d.get("n_measured"),
        "n_failed": d.get("n_failed"),
        "warm_total_sec": d.get("warm_total"),
        "cold_total_sec": d.get("cold_total"),
        "worst_warm_key": worst_key,
        "worst_warm_sec": worst_warm,
        "n_with_spread": sum(1 for v in queries.values() if "spread" in v),
    }


def scaling_section(root: str) -> dict[str, Any]:
    path = os.path.join(root, "docs", "SCALING.md")
    if not os.path.exists(path):
        return {"available": False}
    from .queries import build_registry

    registry = build_registry()
    with open(path) as f:
        text = f.read()
    mentioned = {
        k for k in registry if re.search(rf"`{re.escape(k)}`", text)
    }
    return {
        "available": True,
        "n_keys_with_rows": len(mentioned),
        "n_registry": len(registry),
    }


def sweep_section(sf_dir: str) -> dict[str, Any]:
    """Fresh cross-engine sweep — the driver-identical gate, run live."""
    from .compare import run_all
    from .session import get_spark

    spark = get_spark(app_name="round-report")
    spark.sparkContext.setLogLevel("ERROR")
    results = run_all(spark, sf_dir)
    fails = sorted(r.key for r in results if not r.ok)
    return {
        "sf_dir": sf_dir,
        "n_keys": len(results),
        "n_ok": sum(1 for r in results if r.ok),
        "n_rows_only": sum(
            1 for r in results if r.rows_oracle is None
        ),
        "failures": fails,
    }


def build_report(
    root: str = REPO_ROOT,
    round_num: int | None = None,
    sweep_sf: str | None = "/root/testdata/sf0.001",
) -> dict[str, Any]:
    n = round_num if round_num is not None else _latest_round(root) + 1
    report: dict[str, Any] = {
        "round": n,
        "registry": registry_section(),
        "correctness_driver": correctness_section(root),
        "bench": bench_section(root),
        "scaling": scaling_section(root),
    }
    if sweep_sf:
        report["sweep_local"] = sweep_section(sweep_sf)
    return report


def write_report(
    root: str = REPO_ROOT,
    round_num: int | None = None,
    sweep_sf: str | None = "/root/testdata/sf0.001",
) -> str:
    report = build_report(root, round_num, sweep_sf)
    path = os.path.join(root, f"REPORT_r{report['round']:02d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    os.replace(tmp, path)
    return path

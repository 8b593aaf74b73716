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


def correctness_section(
    root: str, driver_round: int | None = None
) -> dict[str, Any]:
    """Summarize the driver's CORRECTNESS rows. ``driver_round`` pins
    WHICH round's file to read (VERDICT r10 #5): REPORT_r{N} is
    normally generated before the driver writes CORRECTNESS_r{N}, so
    the default (latest on disk) lags one round — the round checklist
    re-renders the previous round's report with an explicit
    ``--driver-round`` once its driver rows exist."""
    n = driver_round if driver_round is not None else _latest_round(root)
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
    # Wobble summary over the median-of-3 block (VERDICT r10 #4): the
    # max absolute and max relative spread across the contract keys, so
    # a round-over-round bench diff states its own noise floor.
    pks = d.get("per_key_spread", {})
    max_spread_key, max_spread = None, 0.0
    max_rel_key, max_rel = None, 0.0
    for k, v in pks.items():
        if v.get("spread", 0.0) > max_spread:
            max_spread_key, max_spread = k, v["spread"]
        med = v.get("median") or 0.0
        rel = (v.get("spread", 0.0) / med) if med > 0 else 0.0
        if rel > max_rel:
            max_rel_key, max_rel = k, round(rel, 3)
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
        "n_median3_keys": len(pks),
        "max_spread_key": max_spread_key,
        "max_spread_sec": max_spread,
        "max_rel_spread_key": max_rel_key,
        "max_rel_spread": max_rel,
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


#: Test files whose cases are independent third implementations of the
#: key's formula (pandas/numpy/closed-form — zero shared code with the
#: engine or the DuckDB oracle). A quoted key name in one of these means
#: the key is semantic-oracle covered.
SEMANTIC_TEST_FILES: tuple[str, ...] = (
    "tests/test_semantic_oracle.py",
    "tests/test_cusum_property.py",
    "tests/test_stats_property.py",
    "tests/test_sketch_property.py",
    "tests/test_minhash_recall.py",
    "tests/test_degenerate_property.py",
)

#: Files carrying physical-plan assertions (pushdown/broadcast/top-k/
#: pruning shape pinned on the actual Catalyst output).
PLAN_TEST_FILES: tuple[str, ...] = ("tests/test_plans.py",)


def _ast_strings_and_names(path: str) -> tuple[set[str], set[str]]:
    """String constants and referenced names in a test file's CODE —
    comments never reach the AST and docstring constants (the first
    Expr-statement string of a module/class/function body) are skipped,
    so a key mentioned only in prose can't count as coverage
    (round-9 ADVICE: _grepped_keys matched docstrings/comments too)."""
    import ast

    with open(path) as f:
        tree = ast.parse(f.read(), filename=path)
    doc_ids: set[int] = set()
    for node in ast.walk(tree):
        if isinstance(
            node,
            (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
        ):
            body = getattr(node, "body", [])
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                doc_ids.add(id(body[0].value))
    strings: set[str] = set()
    names: set[str] = set()
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Constant)
            and isinstance(node.value, str)
            and id(node) not in doc_ids
        ):
            strings.add(node.value)
        elif isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute):
            names.add(node.attr)
        elif isinstance(node, ast.alias):
            names.add(node.name.split(".")[-1])
            if node.asname:
                names.add(node.asname)
    return strings, names


def _grepped_keys(root: str, registry, files: tuple[str, ...]) -> set[str]:
    """Keys referenced by the given test files' CODE — either as an
    exact string constant ("join_range") or, for plan tests that import
    the query function directly, as the function's own name. AST-based:
    comments, docstrings, and assert-message prose don't count."""
    strings: set[str] = set()
    names: set[str] = set()
    for rel in files:
        path = os.path.join(root, rel)
        if os.path.exists(path):
            s, n = _ast_strings_and_names(path)
            strings |= s
            names |= n
    hit: set[str] = set()
    for key, q in registry.items():
        if key in strings:
            hit.add(key)
            continue
        fn_name = getattr(q.fn, "__name__", "<lambda>")
        if fn_name != "<lambda>" and fn_name in names:
            hit.add(key)
    return hit


def _driver_green_keys(
    root: str, max_round: int | None = None
) -> tuple[set[str], set[str], dict[str, int]]:
    """LATEST driver status per key (the rotation spreads extension keys
    over rounds, so one file never shows the full picture — but a key
    must be judged by its most recent driver row, not a lifetime union:
    a later hash-mismatch supersedes an earlier green; round-9 ADVICE).
    ``max_round`` bounds the artifact set considered (rounds ≤ N) so a
    render can be reproduced byte-for-byte after the driver writes the
    NEXT round's file. Returns (hash_green, rows_only_ran,
    last_round_seen)."""
    latest: dict[str, tuple[int, dict[str, Any]]] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for key, v in rows.items():
            if key not in latest or rnd > latest[key][0]:
                latest[key] = (rnd, v)
    hash_green: set[str] = set()
    rows_only: set[str] = set()
    last_round = {k: rnd for k, (rnd, _) in latest.items()}
    for key, (_, v) in latest.items():
        if v.get("hash_match") is True:
            hash_green.add(key)
        elif v.get("err") == "no_oracle":
            rows_only.add(key)
    return hash_green, rows_only - hash_green, last_round


def matrix_section(root: str, max_round: int | None = None) -> dict[str, Any]:
    """Per-key verification matrix (VERDICT r8 directive #3): which of
    the five evidence tiers covers each registry key — driver hash,
    local DuckDB oracle, independent semantic oracle, plan-shape test,
    scaling row. Emitted so 'which keys have which evidence' is an
    artifact, not an archaeology exercise over five files."""
    from .queries import build_registry

    registry = build_registry()
    driver_hash, driver_rows_only, last_round = _driver_green_keys(
        root, max_round
    )
    semantic = _grepped_keys(root, registry, SEMANTIC_TEST_FILES)
    plan = _grepped_keys(root, registry, PLAN_TEST_FILES)
    scaling_path = os.path.join(root, "docs", "SCALING.md")
    scaling_text = ""
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            scaling_text = f.read()
    per_key: dict[str, dict[str, Any]] = {}
    for key, q in registry.items():
        per_key[key] = {
            "driver_hash": key in driver_hash,
            "driver_rows_only": key in driver_rows_only,
            "driver_last_round": last_round.get(key),
            "local_oracle": q.sql is not None,
            "semantic_oracle": key in semantic,
            "plan_test": key in plan,
            "scaling_row": f"`{key}`" in scaling_text,
        }
    local_only = sorted(
        k
        for k, t in per_key.items()
        if t["local_oracle"]
        and not (
            t["driver_hash"]
            or t["semantic_oracle"]
            or t["plan_test"]
            or t["scaling_row"]
        )
    )
    return {
        "tiers": [
            "driver_hash", "driver_rows_only", "local_oracle",
            "semantic_oracle", "plan_test", "scaling_row",
        ],
        "n_keys": len(per_key),
        "n_driver_hash": sum(1 for t in per_key.values() if t["driver_hash"]),
        "n_semantic_oracle": sum(
            1 for t in per_key.values() if t["semantic_oracle"]
        ),
        "n_plan_test": sum(1 for t in per_key.values() if t["plan_test"]),
        "n_scaling_row": sum(1 for t in per_key.values() if t["scaling_row"]),
        "local_oracle_only_keys": local_only,
        # formula-bearing families (statistical/ML/graph/data-quality/
        # time-series) must never be local-oracle-only: a formula can be
        # wrong the same way in both engines, so they all carry an
        # independent semantic oracle. Enforced by
        # tests/test_survey_sync.py::test_formula_keys_not_local_only.
        "formula_local_only": [
            k for k in local_only
            if k.split("_", 1)[0] in {"ml", "ts", "dq", "graph"}
        ],
        "per_key": per_key,
    }


def sweep_section(sf_dir: str) -> dict[str, Any]:
    """Fresh cross-engine sweep — the driver-identical gate, run live."""
    from .compare import run_all
    from .session import get_spark

    spark = get_spark(app_name="round-report")
    spark.sparkContext.setLogLevel("ERROR")
    # strict=True: dtype-class drift fails even where numeric values
    # coincide (VERDICT r8 directive #2 — the local gate must be at
    # least as strict as the driver's hash check)
    results = run_all(spark, sf_dir, strict=True)
    fails = sorted(r.key for r in results if not r.ok)
    return {
        "sf_dir": sf_dir,
        "strict_dtype": True,
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
    driver_round: int | None = None,
) -> dict[str, Any]:
    n = round_num if round_num is not None else _latest_round(root) + 1
    corr = correctness_section(root, driver_round)
    if corr.get("available") and corr.get("driver_round", n) < n:
        # The driver writes CORRECTNESS_r{n} AFTER this session ends, so
        # a report generated in-round can only cite the previous round's
        # rows. The re-render command makes the refresh mechanical.
        corr["lag_note"] = (
            f"CORRECTNESS_r{n:02d}.json does not exist yet (the driver "
            f"writes it after the session); re-render next round with "
            f"`python -m serverless_etl_aws_spark report --round {n} "
            f"--driver-round {n} --no-sweep` to refresh this block"
        )
    report: dict[str, Any] = {
        "round": n,
        "registry": registry_section(),
        "correctness_driver": corr,
        "bench": bench_section(root),
        "scaling": scaling_section(root),
        "verification_matrix": matrix_section(root),
    }
    if sweep_sf:
        report["sweep_local"] = sweep_section(sweep_sf)
    else:
        # A --no-sweep re-render (the --driver-round refresh path) must
        # not erase the round's recorded sweep: carry the existing
        # block forward from the on-disk report.
        prior = os.path.join(root, f"REPORT_r{n:02d}.json")
        if os.path.exists(prior):
            with open(prior) as f:
                old = json.load(f)
            if "sweep_local" in old:
                report["sweep_local"] = old["sweep_local"]
    return report


# Rows-only keys (registry sql=None — approximate by the §2B contract)
# mapped to the pytest that pins their numeric tolerance/recall bound,
# so "no oracle" never reads as "no evidence" (VERDICT r10 directive
# #6). tests/test_survey_sync.py pins this mapping against the live
# registry AND against the named tests existing on disk.
ROWS_ONLY_BOUND_TESTS: dict[str, str] = {
    "agg_approx_distinct": (
        "tests/test_operators.py::"
        "test_approx_distinct_within_hll_error_bound"
    ),
    "agg_sketch_merge": (
        "tests/test_operators.py::test_sketch_merge_estimates_match_exact"
    ),
    "llm_dedup_minhash": (
        "tests/test_minhash_recall.py::"
        "test_banded_minhash_recall_meets_analytic_bound"
    ),
    "llm_sim_search_ivf": (
        "tests/test_operators.py::test_ivf_recall_fixture"
    ),
    "llm_sim_search_pq": (
        "tests/test_operators.py::test_pq_recall_fixture"
    ),
}


def render_evidence_md(
    root: str = REPO_ROOT, max_round: int | None = None
) -> str:
    """Human-readable render of the per-key verification matrix
    (VERDICT r9 directive #7): one row per registry key, in registry
    order, one column per evidence tier. The header records which
    driver rounds the render consumed (`max_round`), and the drift test
    re-renders with THAT bound — so the pin stays byte-stable when the
    driver writes the next round's CORRECTNESS file after the session,
    while registry or test-coverage drift still fails loudly."""
    if max_round is None:
        max_round = _latest_round(root)
    m = matrix_section(root, max_round)
    per_key = m["per_key"]
    tick = lambda b: "✓" if b else "—"  # noqa: E731
    lines = [
        "# Per-key verification evidence",
        "",
        f"Generated from driver rounds <= {max_round}.",
        "",
        "GENERATED — do not edit by hand. Rebuild with",
        "`python -m serverless_etl_aws_spark report` (or any call to",
        "`roundreport.write_evidence_md`); drift is pinned by",
        "tests/test_survey_sync.py::test_evidence_md_matches_live_matrix.",
        "",
        "Tiers: **driver** = most recent driver CORRECTNESS row is a",
        "hash pass (`r` column: that round); **rows-only** = most recent",
        "driver row ran clean without an oracle (approximate keys, by",
        "the §2B contract); **oracle** = DuckDB oracle SQL exists (the",
        "local strict-by-dtype gate runs it every round); **semantic** =",
        "an independent third implementation (pandas/numpy/closed-form)",
        "checks the formula; **plan** = a physical-plan-shape test pins",
        "pushdown/broadcast/top-k structure; **scaling** = docs/SCALING.md",
        "carries a measured ratio row or linearity classification;",
        "**bound test** = for the five rows-only-by-contract keys",
        "(approximate operators with no exact SQL oracle), the pytest",
        "that pins the numeric tolerance/recall bound — the evidence",
        "that replaces the oracle.",
        "",
        f"{m['n_keys']} keys: driver-hash {m['n_driver_hash']}, semantic "
        f"{m['n_semantic_oracle']}, plan {m['n_plan_test']}, scaling "
        f"{m['n_scaling_row']}.",
        "",
        "| key | driver | r | rows-only | oracle | semantic | plan |"
        " scaling | bound test |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for key, t in per_key.items():
        rnd = t["driver_last_round"]
        bound = ROWS_ONLY_BOUND_TESTS.get(key)
        lines.append(
            f"| `{key}` | {tick(t['driver_hash'])} "
            f"| {rnd if rnd is not None else '—'} "
            f"| {tick(t['driver_rows_only'])} | {tick(t['local_oracle'])} "
            f"| {tick(t['semantic_oracle'])} | {tick(t['plan_test'])} "
            f"| {tick(t['scaling_row'])} "
            f"| {'`' + bound + '`' if bound else '—'} |"
        )
    lines.append("")
    return "\n".join(lines)


def write_evidence_md(root: str = REPO_ROOT) -> str:
    path = os.path.join(root, "docs", "EVIDENCE.md")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(render_evidence_md(root))
    os.replace(tmp, path)
    return path


def write_report(
    root: str = REPO_ROOT,
    round_num: int | None = None,
    sweep_sf: str | None = "/root/testdata/sf0.001",
    driver_round: int | None = None,
) -> str:
    report = build_report(root, round_num, sweep_sf, driver_round)
    path = os.path.join(root, f"REPORT_r{report['round']:02d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")
    os.replace(tmp, path)
    write_evidence_md(root)
    return path

"""Per-round bench regression gate (round-1 verdict, task 8).

Compares a fresh bench run against the frozen round-1 baseline
(``BENCH_r01.json``'s parsed per-query seconds) and emits ONE JSON line
``{"total_ratio": ..., "regressed": {name: ratio}, "ok": bool}``.
A query "regresses" when it exceeds ``THRESHOLD`` (1.5x) of its baseline
time — 1.5x sits above the measured 10-15% run-to-run noise at sf0.1
plus first-plan codegen jitter, so a flag means a real plan change.

Usage::

    python bench.py 2>/dev/null | tail -1 > /tmp/bench_now.json
    python bench_diff.py /tmp/bench_now.json > BENCH_DIFF_r2.json
"""

from __future__ import annotations

import json
import sys

THRESHOLD = 1.5


def diff(baseline: dict, current: dict) -> dict:
    base_q = baseline["queries"]
    cur_q = current["queries"]
    regressed = {
        name: round(cur_q[name] / base_q[name], 2)
        for name in base_q
        if name in cur_q and cur_q[name] > THRESHOLD * base_q[name]
    }
    missing = sorted(set(base_q) - set(cur_q))
    added = sorted(set(cur_q) - set(base_q))
    # apples-to-apples: the suite grows over rounds, so the headline
    # ratio is computed over the intersection; added queries are listed
    # with their own times and excluded from the comparison
    comparable = sorted(set(base_q) & set(cur_q))
    comp_base = sum(base_q[n] for n in comparable)
    comp_cur = sum(cur_q[n] for n in comparable)
    return {
        "metric": "bench_diff_vs_r01",
        "baseline_total": baseline["value"],
        "current_total": current["value"],
        "total_ratio": round(current["value"] / baseline["value"], 3),
        "comparable_total_baseline": round(comp_base, 3),
        "comparable_total_current": round(comp_cur, 3),
        "comparable_ratio": round(comp_cur / comp_base, 3) if comp_base else None,
        "threshold": THRESHOLD,
        "regressed": regressed,
        "missing_queries": missing,
        "added_queries": {n: cur_q[n] for n in added},
        "ok": not regressed and not missing,
    }


def main() -> int:
    with open("BENCH_r01.json") as f:
        baseline = json.load(f)["parsed"]
    with open(sys.argv[1]) as f:
        current = json.loads(f.read().strip().splitlines()[-1])
    out = diff(baseline, current)
    print(json.dumps(out))
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Bench harness contract — the driver records only the LAST 2000 chars
of bench.py's stdout, so the ONE JSON line must fit that window or the
head of the timing dict (historically the flagship block) silently
disappears from BENCH_r{N}.json (r11 VERDICT #5)."""

from __future__ import annotations

import json

import bench
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational


def test_headline_names_resolve():
    missing = [n for n in bench.HEADLINE if n not in relational.QUERIES]
    assert not missing, missing
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)


def test_sweep_only_names_resolve_and_stay_disjoint():
    missing = [n for n in bench.SWEEP_ONLY if n not in relational.QUERIES]
    assert not missing, missing
    assert not set(bench.SWEEP_ONLY) & set(bench.HEADLINE)


def test_bench_line_fits_driver_tail_window():
    # worst realistic rendering: every timing at 2dp with a THREE-digit
    # integer part ("999.99" = 6 chars — a slow driver machine can push
    # a heavy sf0.1 entry past 100s; ADVICE r12 low), total at 7 chars
    line = json.dumps(
        {
            "metric": "headline_suite_total",
            "value": 9999.99,
            "unit": "sec",
            "queries": {n: 999.99 for n in bench.HEADLINE},
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    assert len(line) <= 1990, (
        f"bench JSON line would be {len(line)} chars; the driver tail "
        "window keeps 2000 — retire an entry to SWEEP_ONLY"
    )


def test_backlog_ledger_matches_scale_md():
    """SCALE.md's quoted backlog must be the mechanically derived number.

    VERDICT r13 #5: the hand-narrated ledger drifted off by one (226 vs
    227).  The closeout convention is one line ``never-driver-verified
    ledger: N`` in SCALE.md; the LAST such line must equal
    scripts/backlog_ledger.py's derivation (oracle-paired registry minus
    the union of green names across CORRECTNESS_r*.json).
    """
    import os
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import backlog_ledger

    quoted = backlog_ledger.scale_md_quoted_backlog(REPO)
    assert quoted is not None, (
        "SCALE.md has no 'never-driver-verified ledger: N' line; the "
        "closeout must quote the generated number"
    )
    derived = backlog_ledger.ledger(REPO)["never_driver_verified"]
    assert quoted == derived, (
        f"SCALE.md quotes backlog={quoted} but the mechanical ledger "
        f"derives {derived}; regenerate with scripts/backlog_ledger.py"
    )

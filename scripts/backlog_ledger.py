#!/usr/bin/env python
"""Mechanical never-driver-verified backlog ledger (VERDICT r13 #5).

Derives the backlog the same way the judge counts it:

    never_driver_verified = oracle-paired registry
                            - union(green names in CORRECTNESS_r*.json)

where "green" means rows_match AND schema_match AND hash_match AND no err.
Run from the repo root::

    python scripts/backlog_ledger.py            # count + summary
    python scripts/backlog_ledger.py --list     # full sorted name list
    python scripts/backlog_ledger.py --json     # machine-readable record

The SCALE.md closeout must quote THIS number, not hand arithmetic —
tests/test_bench_contract.py::test_backlog_ledger_matches_scale_md pins it.
No SparkSession is created (the registry import only declares plans).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def driver_green_names(repo: str = REPO) -> set[str]:
    """Union of query names ever green (rows+schema+hash) in a driver round."""
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rounds = json.load(f)
        for name, rec in rounds.items():
            if (
                isinstance(rec, dict)
                and rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
                and not rec.get("err")
            ):
                green.add(name)
    return green


def registry_names(repo: str = REPO) -> tuple[set[str], set[str]]:
    """(all query names, oracle-paired query names) from the live registry."""
    sys.path.insert(0, repo)
    import __spark_entry__ as entry  # noqa: PLC0415

    qs = set(entry.queries())
    paired = qs & set(entry.oracle_sql())
    return qs, paired


def ledger(repo: str = REPO) -> dict:
    all_q, paired = registry_names(repo)
    green = driver_green_names(repo)
    backlog = sorted(paired - green)
    return {
        "registry_total": len(all_q),
        "oracle_paired": len(paired),
        "rows_only": len(all_q - paired),
        "driver_green_ever": len(green & paired),
        "never_driver_verified": len(backlog),
        "backlog": backlog,
    }


def scale_md_quoted_backlog(repo: str = REPO) -> int | None:
    """The backlog count quoted in SCALE.md's latest closeout, if any.

    Convention: the closeout writes one line matching
    ``never-driver-verified ledger: N`` (case-insensitive); the LAST such
    line in the file is the current round's quote.
    """
    path = os.path.join(repo, "SCALE.md")
    if not os.path.exists(path):
        return None
    quoted = None
    pat = re.compile(r"never-driver-verified ledger:\s*\**(\d+)", re.IGNORECASE)
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                quoted = int(m.group(1))
    return quoted


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--list", action="store_true", help="print backlog names")
    ap.add_argument("--json", action="store_true", help="print full JSON record")
    args = ap.parse_args()
    rec = ledger()
    if args.json:
        print(json.dumps(rec, indent=2))
        return 0
    if args.list:
        for name in rec["backlog"]:
            print(name)
    print(
        f"registry={rec['registry_total']} oracle_paired={rec['oracle_paired']} "
        f"rows_only={rec['rows_only']} driver_green_ever={rec['driver_green_ever']} "
        f"never_driver_verified={rec['never_driver_verified']}",
        file=sys.stderr,
    )
    if not args.list:
        print(rec["never_driver_verified"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

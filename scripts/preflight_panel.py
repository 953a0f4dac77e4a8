"""Vanilla-session pre-flight of the driver's 50-slot CORRECTNESS panel.

Replays exactly what the verification driver does — a bare SparkSession
(no engine config), each panel query at sf0.01 compared against its
DuckDB oracle via tests/parity.compare — so a red slot is caught before
the round ends, not by CORRECTNESS_r{N}.json.

    python scripts/preflight_panel.py            # sf0.01, full 50-slot panel
    python scripts/preflight_panel.py sf0.001    # faster smoke
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod
from tests.parity import compare


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.01"
    sf_dir = f"/root/testdata/{sf}"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    panel = entrymod._PANEL_FIRST
    t0 = time.time()
    bad: list[tuple[str, object]] = []
    for name in panel:
        try:
            problems = compare(qs[name](spark, sf_dir), osql[name], sf_dir)
            if problems:
                bad.append((name, problems))
        except Exception as exc:  # a crash is a red slot too
            bad.append((name, repr(exc)[:200]))
    print(f"{len(panel) - len(bad)}/{len(panel)} green in {time.time() - t0:.1f}s")
    for name, why in bad:
        print(f"FAIL {name}: {why}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

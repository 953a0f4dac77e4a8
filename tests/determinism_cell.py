"""One cell of the determinism stress matrix: run the driver's 50-query
panel under an adversarial Spark config and emit a canonical result hash
per query as one JSON line.

Run as a subprocess (each cell needs its own JVM — master/memory cannot
change inside a session):

    python -m tests.determinism_cell '{"master": "local[4]",
        "conf": {"spark.sql.adaptive.enabled": "false"}}'

The hash is order-insensitive and column-order-insensitive (same
normalization as tests/parity.py, i.e. the driver's comparison): if two
cells disagree, the engine produced different RESULTS under different
physical execution — exactly the class of bug (AQE range-boundary
resampling, r7) this harness exists to catch before the driver does.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def result_hash(df) -> str:
    """Canonical order/column-insensitive hash of a DataFrame's rows."""
    from tests.parity import normalize_rows

    rows = [tuple(r) for r in df.collect()]
    counter = normalize_rows(df.columns, rows)
    digest = hashlib.sha256()
    for item in sorted(repr(kv).encode() for kv in counter.items()):
        digest.update(item)
    return digest.hexdigest()


def main() -> None:
    spec = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    sf_dir = spec.get("sf_dir", "/root/testdata/sf0.001")
    limit = int(spec.get("limit", 50))

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.master(spec.get("master", "local[8]"))
    for k, v in spec.get("conf", {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    names = spec.get("names") or list(queries)[:limit]
    hashes: dict[str, str] = {}
    for name in names:
        hashes[name] = result_hash(queries[name](spark, sf_dir))
    spark.stop()
    print(json.dumps(hashes))


if __name__ == "__main__":
    main()

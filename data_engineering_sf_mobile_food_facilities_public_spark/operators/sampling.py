"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need samples and holdout splits that are (a)
reproducible across runs and engines, (b) computable in a single narrow
map (no shuffle, no global state), and (c) stable under repartitioning.
``rand(seed)`` fails (a) and (c) — its value depends on partition layout.
Hashing the row key does not: md5 is identical everywhere, so the same
row lands in the same split in Spark, DuckDB, or a 1000-executor cluster.

Mechanics: the first 4 hex chars of md5(salt || key) are a uniform
16-bit bucket.  Fixed-width lowercase hex compares lexicographically in
numeric order, so "bucket < p * 65536" is a plain *string* comparison
against a 4-char hex threshold — no base conversion, portable to any
SQL engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 16


def _threshold_hex(fraction: float) -> str:
    # fraction >= 1.0 would format to the 5-char "10000", which sorts
    # *below* any bucket starting with '2'..'f' lexicographically and
    # silently kept only ~6% of rows.  "g" sorts above every hex char,
    # so `bucket < "g"` keeps everything.
    if fraction >= 1.0:
        return "g"
    return format(max(0, int(fraction * _BUCKETS)), "04x")


def hash_bucket_hex(key: Column | str, salt: str = "") -> Column:
    """4-hex-char uniform bucket from md5(salt || key)."""
    k = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(F.lit(salt), k.cast("string"))), 1, 4)


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — same rows every
    run, every engine, every partitioning.  A narrow filter: no shuffle,
    pushes down past column pruning like any other predicate."""
    return df.filter(hash_bucket_hex(key, salt) < _threshold_hex(fraction))


def train_test_split(
    df: DataFrame, key: str, test_fraction: float = 0.2, salt: str = "split"
) -> DataFrame:
    """Label every row 'train' or 'test' by key hash.  Filtering on the
    label gives disjoint, exhaustive, reproducible splits; keying on an
    entity id (user, document) keeps all of an entity's rows on one side
    (no leakage across the split)."""
    return df.withColumn(
        "split",
        F.when(
            hash_bucket_hex(key, salt) < _threshold_hex(test_fraction), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    stratum_col: str,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum keeps its own
    fraction (rebalancing skewed classes), still a single narrow filter
    — the per-stratum threshold is a CASE expression on the stratum
    column, the hash is computed once.  Strata absent from ``fractions``
    are dropped (fraction 0)."""
    bucket = hash_bucket_hex(key, salt)
    thr = F.lit("0000")
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(_threshold_hex(frac))
        ).otherwise(thr)
    return df.filter(bucket < thr)

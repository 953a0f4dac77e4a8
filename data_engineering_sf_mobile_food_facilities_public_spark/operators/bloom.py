"""Bloom-filter semi-join pruning: build a compact bit-array membership
filter over a dimension's join keys and prune the fact table BEFORE its
shuffle; the exact join afterwards removes the (bounded) false
positives.

At 100 TB the dominant cost of ``fact JOIN dim-subset`` is shuffling the
fact side; when the dim subset selects a small fraction of fact rows, a
Bloom filter turns the join's fact input into a pre-shuffle scan filter
that drops most rows at the source.  Spark's AQE can inject runtime
bloom filters for some join shapes
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but only where
the optimizer recognizes the pattern; this operator is the explicit,
composable form — usable before an aggregation, against a reusable key
set, or where the planner declines.

Mechanics (all JVM-side expressions — no UDFs, no Python hot path):
- k bit positions per key via ``pmod(xxhash64(key, i), m)`` (the extra
  literal lane seeds each of the k hashes independently);
- the filter is built DISTRIBUTED: explode the k positions, group by
  64-bit word index, ``bit_or`` the masks — the shuffle carries at most
  m/64 per-word partials per map task (map-side combine), never the key
  set; the collect is bounded by the filter size (1024 rows at the
  default m = 2^16 bits), the same bounded-scalar class as the z-order
  stats collect;
- the word array is embedded as a PLAN LITERAL (constant-folded by
  Catalyst) and the membership test is k codegen'd
  ``element_at & shiftleft`` probes fused into the fact scan.

Exactness: a Bloom filter has no false negatives, so the pruned fact is
a superset of the true semi-join; the caller's exact join then yields
results identical to the unpruned plan — which is exactly what the
oracle pairing verifies (the oracle runs the plain join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 16  # 64 Kbit = 1024 longs = 8 KB literal
DEFAULT_K_HASHES = 3


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
) -> list[int]:
    """Aggregate the key set into an ``m_bits``-bit Bloom filter,
    returned as ``m_bits / 64`` Python ints — the driver-side literal
    for :func:`bloom_might_contain`."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    key = F.col(key_col)
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
                for i in range(k_hashes)
            ]
        )
    ).alias("__pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("__pos") / 64).cast("int").alias("__w"),
            F.expr("shiftleft(1L, CAST(__pos % 64 AS INT))").alias("__mask"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__mask").alias("__word"))
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in words:
        arr[r["__w"]] = r["__word"]
    return arr


def bloom_might_contain(
    key_col: str,
    words: list[int],
    k_hashes: int = DEFAULT_K_HASHES,
) -> Column:
    """Membership predicate against a built filter: AND over k probes,
    each ``element_at(words, pos/64 + 1) & (1L << pos%64) != 0``.

    Built as one SQL expression because Catalyst's ``shiftleft``
    accepts a column shift amount in SQL form (the Python
    ``F.shiftleft`` wrapper only takes an int).  The array literal is
    foldable, so after optimization each probe reads one constant —
    the k-fold repetition in the *text* does not survive into the
    physical plan."""
    m_bits = len(words) * 64
    arr_sql = "array(" + ",".join(f"{w}L" for w in words) + ")"
    probes = []
    for i in range(k_hashes):
        pos = f"pmod(xxhash64({key_col}, {i}), {m_bits})"
        probes.append(
            f"(element_at({arr_sql}, CAST({pos} / 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST({pos} % 64 AS INT))) != 0"
        )
    return F.expr("(" + ") AND (".join(probes) + ")")


def bloom_prune(
    fact: DataFrame,
    fact_key: str,
    dim_keys: DataFrame,
    dim_key: str,
    m_bits: int = DEFAULT_M_BITS,
    k_hashes: int = DEFAULT_K_HASHES,
) -> DataFrame:
    """Prune ``fact`` to rows whose ``fact_key`` may be in
    ``dim_keys[dim_key]`` — a superset of the exact semi-join (no false
    negatives; false-positive rate ≈ (1 - e^(-k·n/m))^k).  Compose with
    the exact join afterwards for identical-to-unpruned results."""
    words = bloom_build(dim_keys.select(dim_key), dim_key, m_bits, k_hashes)
    return fact.filter(bloom_might_contain(fact_key, words, k_hashes))

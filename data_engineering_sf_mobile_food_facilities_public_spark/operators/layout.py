"""Data-layout operators: Z-order clustering keys and small-file
compaction — the table-maintenance surface a 100 TB lakehouse needs
around the query engine.

The reference writes one parquet object per table per run from the
driver (``/root/reference/airflow.py:704-724``), so it has neither
problem; at scale both are existential:

- **Z-order**: multi-dimensional min/max pruning.  Sorting by a single
  column clusters only that column; interleaving the bits of two (or
  more) dimension keys gives files whose min/max ranges are tight in
  BOTH dimensions, so predicates on either prune files.  The key is a
  pure Catalyst bit expression (shift/or/and — codegen, no UDF);
  clustering = repartitionByRange + sortWithinPartitions on it, which
  samples ranges instead of forcing a global sort through one reducer.
- **Compaction**: streaming ingest / per-task writers leave many small
  files; reading them back costs one scheduler task + footer fetch
  each.  Compaction rewrites a directory into ceil(bytes/target)
  files.  Coalesce (no shuffle) when shrinking file count; repartition
  only when files must also be rebalanced.
"""

from __future__ import annotations

import math

import pandas as pd  # noqa: F401 — resolves pandas_udf postponed type hints
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(col_a: Column | str, col_b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative integer keys into
    a single Z-value (Morton code): bit i of ``a`` lands at position 2i,
    bit i of ``b`` at 2i+1.  Plain shift/and/or expressions — exactly
    reproducible in any engine with integer bit ops (the DuckDB oracle
    runs the same formula).

    At 100 TB: compute once per row at write time, then
    ``repartitionByRange(zkey).sortWithinPartitions(zkey)`` and write —
    every file's (a, b) bounding box is tight, so min/max stats prune
    on either dimension.
    """
    a = (F.col(col_a) if isinstance(col_a, str) else col_a).cast("bigint")
    b = (F.col(col_b) if isinstance(col_b, str) else col_b).cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return z


def cluster_by_zorder(
    df: DataFrame,
    col_a: str,
    col_b: str,
    num_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Range-partition + locally sort by the Z-value (drops the helper
    column).  Range partitioning samples the key distribution — no
    single-reducer global sort, balanced output files.

    Each dimension is min/max-scaled to the full ``bits`` width first:
    interleaving RAW keys of different magnitudes degenerates to a
    single-column sort (the wider key's high bits own every split
    boundary — measured: unscaled (custkey, day) clustered exactly like
    day-only).  Linear scaling fixes dimensions of different ranges;
    for heavy value skew, substitute rank-space scaling (bucket by
    approxQuantile boundaries), which is what Delta's OPTIMIZE ZORDER
    does with range_partition_id."""
    mm = df.agg(
        F.min(col_a).alias("amin"),
        F.max(col_a).alias("amax"),
        F.min(col_b).alias("bmin"),
        F.max(col_b).alias("bmax"),
    ).collect()[0]
    top = (1 << bits) - 1

    def scale(col: str, lo: float, hi: float) -> Column:
        if hi <= lo:
            return F.lit(0).cast("bigint")
        return ((F.col(col) - F.lit(lo)) * top / F.lit(hi - lo)).cast("bigint")

    keyed = df.withColumn(
        "__z",
        zorder_key(
            scale(col_a, mm.amin, mm.amax), scale(col_b, mm.bmin, mm.bmax), bits
        ),
    )
    return (
        keyed.repartitionByRange(num_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ~ceil(total_bytes /
    target_file_bytes) files; returns the output file count.  Uses
    coalesce (narrow, no shuffle) — the standard periodic compaction a
    streaming file sink needs."""
    from pathlib import Path

    total = sum(p.stat().st_size for p in Path(src_dir).glob("*.parquet"))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    df.coalesce(n_files).write.mode("overwrite").parquet(dst_dir)
    return len(list(Path(dst_dir).glob("*.parquet")))


# ---------------------------------------------------------------------------
# Rendezvous (highest-random-weight) hashing — stable shard placement.
# ---------------------------------------------------------------------------


def rendezvous_weight(key: Column, shard: str) -> Column:
    """HRW weight of ``key`` on ``shard``: the first 32-bit md5 lane of
    ``key || ':' || shard`` (the engine-portable hash convention from
    ``operators/minhash.py`` — DuckDB reproduces it exactly, unlike
    xxhash64 which only Spark has)."""
    md = F.md5(F.concat(key.cast("string"), F.lit(":" + shard)))
    return F.conv(F.substring(md, 1, 8), 16, 10).cast("long")


def rendezvous_assign(
    df: DataFrame, key_col: str, shards: list[str], out_col: str = "shard"
) -> DataFrame:
    """Assign each row to the shard with the HIGHEST weight for its key
    (ties — md5-lane collisions — break to the greatest shard name).

    The property that makes HRW the placement scheme for elastic
    clusters: removing one shard reassigns ONLY that shard's keys
    (every other key's argmax is untouched), and adding one steals only
    the keys the newcomer now wins — 1/n expected movement, vs ~all
    keys for ``hash(key) % n``.  Pure per-row Catalyst expressions
    (|shards| md5s + an array_max over structs, codegen'd, no shuffle);
    struct ordering compares (weight, shard) lexicographically, which
    the oracle mirrors as ORDER BY w DESC, shard DESC."""
    key = F.col(key_col)
    entries = [
        F.struct(
            rendezvous_weight(key, s).alias("w"), F.lit(s).alias("shard")
        )
        for s in shards
    ]
    return df.withColumn(
        out_col, F.array_max(F.array(*entries)).getField("shard")
    )


def hilbert_key(col_a: Column | str, col_b: Column | str, bits: int = 16) -> Column:
    """Hilbert-curve clustering key over two non-negative integer keys
    (the classic xy->d walk; Hamilton 2006 / the public-domain
    Wikipedia formulation): like the Z-order key it makes file min/max
    stats prune on EITHER dimension, but the Hilbert curve has strictly
    better locality (no Morton "seams" — consecutive keys are always
    adjacent cells, so range scans touch fewer files; it's what Delta
    switched to for liquid clustering).  Inputs are masked to the low
    ``bits`` bits, matching :func:`zorder_key`'s effective domain.

    The per-level rotation makes the unrolled column-expression form
    grow ~3x per level (each level references BOTH previous coordinates
    twice) — 16 levels would blow past codegen's method limits the way
    the >127-cut CASE tree did (operators/windows.py) — so this runs as
    ONE vectorized Arrow batch over int64 numpy (16 fixed iterations of
    pure integer ops for the whole batch; bit-exact, no floats
    anywhere).  The DuckDB oracle walks the same 16 levels as a
    recursive CTE over integer state — identical algebra, engine-
    independent."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    mask = (1 << bits) - 1

    @pandas_udf(LongType())
    def _hkey(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        x = a.to_numpy(dtype="int64", na_value=0) & mask
        y = b.to_numpy(dtype="int64", na_value=0) & mask
        d = np.zeros_like(x)
        for level in range(bits - 1, -1, -1):
            s = np.int64(1 << level)
            rx = ((x & s) > 0).astype(np.int64)
            ry = ((y & s) > 0).astype(np.int64)
            d += (s * s) * ((3 * rx) ^ ry)
            flip = ry == 0
            swap_flip = flip & (rx == 1)
            fx = np.where(swap_flip, s - 1 - x, x)
            fy = np.where(swap_flip, s - 1 - y, y)
            x = np.where(flip, fy, x)
            y = np.where(flip, fx, y)
        return pd.Series(d, dtype="int64")

    a = (F.col(col_a) if isinstance(col_a, str) else col_a).cast("bigint")
    b = (F.col(col_b) if isinstance(col_b, str) else col_b).cast("bigint")
    return _hkey(a, b)

"""Operator-level semantics for lakehouse mutations (operators/merge.py):
MERGE upsert edge cases and SCD2 island compaction on hand-built frames.
The end-to-end oracle pairing lives in plans/lakehouse.py via
test_oracle_parity; these pin the operator contracts directly.
"""

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.operators.merge import (
    merge_upsert,
    scd2_compact,
)


def test_merge_upsert_updates_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    source = spark.createDataFrame([(2, "B"), (9, "Z")], ["k", "v"])
    out = {r.k: r.v for r in merge_upsert(target, source, keys=["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 9: "Z"}


def test_merge_upsert_empty_source_is_identity(spark):
    target = spark.createDataFrame([(1, "a")], ["k", "v"])
    source = target.filter(F.lit(False))
    out = merge_upsert(target, source, keys=["k"]).collect()
    assert [(r.k, r.v) for r in out] == [(1, "a")]


def test_merge_upsert_composite_key(spark):
    target = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")], ["k1", "k2", "v"])
    source = spark.createDataFrame([(1, 2, "B"), (2, 1, "c")], ["k1", "k2", "v"])
    out = {(r.k1, r.k2): r.v for r in merge_upsert(target, source, ["k1", "k2"]).collect()}
    assert out == {(1, 1): "a", (1, 2): "B", (2, 1): "c"}


def test_scd2_compact_islands_and_bounds(spark):
    rows = [
        # user 1: a a b a  -> three runs (a x2, b, a)
        (1, "a", 10, 1),
        (1, "a", 20, 2),
        (1, "b", 30, 3),
        (1, "a", 40, 4),
        # user 2: single run
        (2, "x", 5, 5),
    ]
    df = spark.createDataFrame(rows, ["k", "attr", "ts", "id"])
    out = sorted(
        scd2_compact(df, "k", "attr", "ts", "id").collect(),
        key=lambda r: (r.k, r.valid_from),
    )
    got = [(r.k, r.attr, r.valid_from, r.valid_to, r.n_changes) for r in out]
    assert got == [
        (1, "a", 10, 30, 2),
        (1, "b", 30, 40, 1),
        (1, "a", 40, None, 1),
        (2, "x", 5, None, 1),
    ]


def test_connected_components_chain_and_isolated_pair(spark):
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.graph import (
        connected_components,
    )

    # chain 1-2-3-4 plus separate pair 10-11: two components
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    out = {r.id: r.component for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_zorder_clusters_both_dimensions(spark):
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.layout import (
        cluster_by_zorder,
    )
    from tests.conftest import SF_SMOKE

    o = load(spark, SF_SMOKE, "orders").select(
        "o_custkey", F.unix_date(F.col("o_orderdate").cast("date")).alias("day")
    )

    def avg_spread(df, col):
        import pyspark.sql.functions as SF

        stats = df.groupBy(SF.spark_partition_id().alias("pid")).agg(
            (SF.max(col) - SF.min(col)).alias("spread")
        )
        rows = stats.collect()
        return sum(r.spread for r in rows) / len(rows)

    n = 8
    by_day = o.repartitionByRange(n, "day").sortWithinPartitions("day")
    by_z = cluster_by_zorder(o, "o_custkey", "day", n)
    # day-sorted files have near-full custkey spread per file; z-ordered
    # files must be materially tighter on custkey while staying bounded
    # on day.
    assert avg_spread(by_z, "o_custkey") < 0.7 * avg_spread(by_day, "o_custkey")


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.layout import (
        compact_parquet,
    )
    from tests.conftest import SF_SMOKE

    src = str(tmp_path / "small_files")
    load(spark, SF_SMOKE, "orders").repartition(16).write.parquet(src)
    import pathlib

    assert len(list(pathlib.Path(src).glob("*.parquet"))) == 16
    dst = str(tmp_path / "compacted")
    n_out = compact_parquet(spark, src, dst, target_file_bytes=1 << 30)
    assert n_out == 1
    assert spark.read.parquet(dst).count() == load(spark, SF_SMOKE, "orders").count()


def test_hilbert_key_continuity_and_reference_walk(spark):
    """The Hilbert key's defining property (and its advantage over
    Morton): consecutive d values along the curve are ADJACENT cells —
    every unit step in d moves exactly one coordinate by exactly 1
    (Manhattan distance 1), where the Z-order curve takes long diagonal
    seams.  Also pins the vectorized numpy walk to the classic scalar
    xy2d reference on the engine's own data."""
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.layout import (
        hilbert_key,
    )
    from tests.conftest import SF_SMOKE

    # continuity on a full small curve: bits=4 -> 256 cells
    import itertools

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    cells = {xy2d(16, x, y): (x, y) for x, y in itertools.product(range(16), range(16))}
    assert len(cells) == 256  # bijective
    for d in range(255):
        (x1, y1), (x2, y2) = cells[d], cells[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # unit steps, no seams

    # the Spark vectorized walk equals the scalar reference on real keys
    o = (
        load(spark, SF_SMOKE, "orders")
        .select(
            "o_custkey",
            F.unix_date(F.col("o_orderdate").cast("date")).alias("day"),
        )
        .limit(200)
    )
    got = {
        (r.o_custkey, r.day): r.h
        for r in o.select(
            "o_custkey", "day", hilbert_key("o_custkey", "day").alias("h")
        ).collect()
    }
    for (ck, day), h in got.items():
        assert h == xy2d(1 << 16, ck & 0xFFFF, day & 0xFFFF)

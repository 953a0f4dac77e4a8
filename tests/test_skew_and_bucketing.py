"""Skew-mitigation equivalence + bucketed co-located join plan tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.operators.skew import (
    salted_agg,
    salted_join,
)
from data_engineering_sf_mobile_food_facilities_public_spark.sources.bucketed import (
    read_table,
    write_bucketed,
)
from tests.conftest import SF_SMOKE


def test_salted_agg_equals_plain(spark):
    e = load(spark, SF_SMOKE, "events")
    plain = {
        r["event_type"]: (r["n"], r["s"])
        for r in e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("value").cast("decimal(18,4)")).alias("s"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["agg_1"], r["agg_0"])
        for r in salted_agg(
            e, ["event_type"], [F.sum(F.col("value").cast("decimal(18,4)")), F.count(F.lit(1))]
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark):
    c = load(spark, SF_SMOKE, "customer")
    n = load(spark, SF_SMOKE, "nation")
    plain = c.join(n, c.c_nationkey == n.n_nationkey).count()
    salted = salted_join(c, n, "c_nationkey", "n_nationkey").count()
    assert plain == salted


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    orders = load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    lineitem = load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", os.path.join(tmp_path, "o"), ["o_orderkey"], 4)
    write_bucketed(lineitem, "b_lineitem", os.path.join(tmp_path, "l"), ["l_orderkey"], 4)
    # at this test's scale the planner would broadcast and never consult
    # bucketing; force the sort-merge path a 100 TB join would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo, bl = read_table(spark, "b_orders"), read_table(spark, "b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        # co-located: correct rows AND no exchange feeding the join
        assert joined.count() == lineitem.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning (operators/bloom.py)
# ---------------------------------------------------------------------------


def test_bloom_prune_has_no_false_negatives(spark):
    """Every lineitem row whose l_suppkey is truly in the key set must
    survive the Bloom prune (the filter's one hard guarantee)."""
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.bloom import bloom_prune

    l = load(spark, SF_SMOKE, "lineitem")
    s = load(spark, SF_SMOKE, "supplier")
    dim = s.filter(F.col("s_nationkey") % 5 == 2).select("s_suppkey")
    exact = l.join(dim, l.l_suppkey == dim.s_suppkey, "left_semi")
    pruned = bloom_prune(l, "l_suppkey", dim, "s_suppkey")
    # pruned ⊇ exact: the anti-join of exact against pruned is empty
    missing = exact.join(
        pruned.select("l_orderkey", "l_linenumber"),
        ["l_orderkey", "l_linenumber"],
        "left_anti",
    ).count()
    assert missing == 0


def test_bloom_prune_false_positive_rate_bounded(spark):
    """At m=2^16 bits / k=3 over ~20 keys the theoretical FP rate is
    ~1e-9; assert the pruned set is not meaningfully larger than the
    exact semi-join (generous 1% slack so the test is about the
    mechanism, not the exact FP arithmetic)."""
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.bloom import bloom_prune

    l = load(spark, SF_SMOKE, "lineitem")
    s = load(spark, SF_SMOKE, "supplier")
    dim = s.filter(F.col("s_nationkey") % 5 == 2).select("s_suppkey")
    exact_n = l.join(dim, l.l_suppkey == dim.s_suppkey, "left_semi").count()
    pruned_n = bloom_prune(l, "l_suppkey", dim, "s_suppkey").count()
    assert exact_n <= pruned_n <= exact_n + max(1, l.count() // 100)


def test_bloom_build_word_array_matches_python_model(spark):
    """The distributed bit_or build must equal a driver-side Python
    model of the same hashes — pin the layout (word index, bit order)
    so a refactor cannot silently change the on-wire filter."""
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    keys = spark.createDataFrame([(i,) for i in (3, 17, 4242)], "k long")
    m, kh = 1 << 10, 3
    words = bloom_build(keys, "k", m_bits=m, k_hashes=kh)
    # rebuild via Spark's own xxhash64 row-by-row (the model): every
    # inserted key must probe positive, and a disjoint probe set must
    # be (near-)all negative at this load factor
    hits = (
        spark.createDataFrame([(i,) for i in (3, 17, 4242)], "k long")
        .filter(bloom_might_contain("k", words, kh))
        .count()
    )
    assert hits == 3
    misses = (
        spark.createDataFrame([(i,) for i in range(1000, 1100)], "k long")
        .filter(bloom_might_contain("k", words, kh))
        .count()
    )
    assert misses <= 2  # 3 keys in 1024 bits: FP rate ~ 1e-7


# ---------------------------------------------------------------------------
# Rendezvous hashing (operators/layout.py)
# ---------------------------------------------------------------------------


def test_rendezvous_removal_moves_only_the_removed_shards_keys(spark):
    """THE HRW property: dropping one shard reassigns exactly the keys
    that lived on it — every other key's argmax is unchanged.  (With
    hash(key) % n, removing a shard moves ~all keys.)"""
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.layout import (
        rendezvous_assign,
    )

    d = load(spark, SF_SMOKE, "documents").select("doc_id")
    shards = [f"shard-{i}" for i in range(8)]
    full = {
        r.doc_id: r.shard for r in rendezvous_assign(d, "doc_id", shards).collect()
    }
    removed = "shard-3"
    reduced = {
        r.doc_id: r.shard
        for r in rendezvous_assign(
            d, "doc_id", [s for s in shards if s != removed]
        ).collect()
    }
    assert set(full) == set(reduced)
    for k, s in full.items():
        if s == removed:
            assert reduced[k] != removed
        else:
            assert reduced[k] == s, f"key {k} moved off untouched shard {s}"
    # sanity: the removed shard actually owned some keys
    assert any(s == removed for s in full.values())


def test_rendezvous_spread_is_balanced(spark):
    """8 shards over 500 docs: expected ~62.5/shard; assert no shard is
    empty or >2x expected (md5 weights are uniform)."""
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.layout import (
        rendezvous_assign,
    )

    d = load(spark, SF_SMOKE, "documents").select("doc_id")
    shards = [f"shard-{i}" for i in range(8)]
    counts = (
        rendezvous_assign(d, "doc_id", shards)
        .groupBy("shard")
        .count()
        .collect()
    )
    n = {r.shard: r["count"] for r in counts}
    total = sum(n.values())
    assert set(n) == set(shards)
    assert all(v > 0 and v < 2 * total / len(shards) for v in n.values()), n

"""Property-based partition-invariance tests (hypothesis).

The engine's central distributed-correctness claim (SCALE.md last
section): no operator's RESULT may depend on how rows are partitioned or
in what order partitions are visited.  These tests generate small random
datasets and assert the result is bit-identical across different
partition counts — the property the DuckDB oracle enforces indirectly,
checked here directly and generatively.

Spark jobs are slow per example, so examples are few and shapes small;
the generators aim at the known hazard points (duplicate keys, ties,
negative values) rather than volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.operators.dedup import (
    dedup_first,
)
from data_engineering_sf_mobile_food_facilities_public_spark.operators.merge import (
    merge_upsert,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# rows: (key, seq, value) with deliberately colliding keys and seqs
_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=1,
    max_size=30,
)


def _df(spark, rows, n_parts):
    return spark.createDataFrame(
        rows, "key INT, seq INT, value INT"
    ).repartition(n_parts)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@given(rows=_ROWS, parts=st.sampled_from([1, 3, 7]))
@settings(**_SETTINGS)
def test_dedup_first_partition_invariant(spark, rows, parts):
    """dedup_first's named total order (seq, then value as tiebreak)
    yields the same survivor per key under any partitioning."""
    got = _rows(dedup_first(_df(spark, rows, parts), ["key"], ["seq", "value"]))
    want = _rows(dedup_first(_df(spark, rows, 2), ["key"], ["seq", "value"]))
    assert got == want


@given(rows=_ROWS, parts=st.sampled_from([1, 3, 7]))
@settings(**_SETTINGS)
def test_grouped_sum_partition_invariant(spark, rows, parts):
    """Integer aggregation (exact arithmetic) is summation-order-free;
    with the DECIMAL-at-the-edge rule this extends to doubles."""
    a = _rows(_df(spark, rows, parts).groupBy("key").agg(F.sum("value").alias("s")))
    b = _rows(_df(spark, rows, 2).groupBy("key").agg(F.sum("value").alias("s")))
    assert a == b


@given(rows=_ROWS, parts=st.sampled_from([1, 3, 7]))
@settings(**_SETTINGS)
def test_merge_upsert_idempotent_and_partition_invariant(spark, rows, parts):
    """MERGE newest-wins: applying the same delta twice equals applying
    it once, under any partitioning (the lakehouse upsert contract;
    both inputs key-unique per the operator's contract)."""
    base = dedup_first(_df(spark, rows, parts), ["key"], ["seq", "value"])
    delta = base.withColumn("seq", F.col("seq") + 1)
    once = merge_upsert(base, delta, keys=["key"])
    twice = merge_upsert(once, delta, keys=["key"])
    assert _rows(once) == _rows(twice)
    # and the merged table is partition-count independent
    base2 = dedup_first(_df(spark, rows, 2), ["key"], ["seq", "value"])
    delta2 = base2.withColumn("seq", F.col("seq") + 1)
    assert _rows(once) == _rows(merge_upsert(base2, delta2, keys=["key"]))


_TEXT_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),  # doc_id (collisions fine)
        st.lists(
            st.sampled_from(["spark", "merge", "join", "row", "batch", "key"]),
            min_size=0,
            max_size=12,
        ),
    ),
    min_size=1,
    max_size=15,
)


@given(rows=_TEXT_ROWS, parts=st.sampled_from([1, 3, 7]))
@settings(**_SETTINGS)
def test_minhash_signatures_partition_invariant(spark, rows, parts):
    """The affine minhash signature is a pure function of a doc's
    shingle SET: any partitioning (and any duplicate text rows) yields
    identical h0..h7."""
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.minhash import (
        minhash_signatures,
        shingles,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in rows], "doc_id LONG, text STRING"
    ).repartition(parts)
    sh = shingles(docs)
    got = _rows(minhash_signatures(sh))
    ref = _rows(minhash_signatures(shingles(docs.repartition(1))))
    assert got == ref


@given(rows=_ROWS, parts=st.sampled_from([1, 3, 7]))
@settings(**_SETTINGS)
def test_weighted_sample_partition_invariant(spark, rows, parts):
    """The A-Res weighted sample is a pure row function (md5 uniform +
    pow + rounded key, PK tiebreak): the same top-k under any
    partitioning."""
    df = spark.createDataFrame(
        [(i, k, abs(v) + 1.0) for i, (k, _, v) in enumerate(rows)],
        "rid LONG, key INT, w DOUBLE",
    ).repartition(parts)
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("p"), F.col("rid").cast("string"))), 1, 13), 16, 10)
        .cast("double")
        / F.lit(4503599627370496.0)
    )
    key = F.round(F.pow(u, F.lit(1.0) / F.col("w")), 6)
    pick = lambda d: _rows(
        d.select("rid", key.alias("k")).orderBy(F.col("k").desc(), "rid").limit(5)
    )
    assert pick(df) == pick(df.repartition(1))


@given(
    slices=st.lists(
        st.tuples(
            st.text(alphabet="abcdefgh", min_size=1, max_size=8),
            st.floats(min_value=0.001, max_value=1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=10,
    ),
    size=st.integers(min_value=16, max_value=64),
)
@settings(max_examples=25, deadline=None)
def test_pie_png_always_structurally_valid(slices, size):
    """Any positive slice list renders to a decodable PNG of the declared
    dimensions whose raster decompresses to exactly height*(1+3*width)
    bytes — the format invariants hold for arbitrary inputs, not just the
    happy-path test chart."""
    import struct
    import zlib

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_image,
        sniff_mime,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.sources.charts import (
        render_pie_png,
    )

    png = render_pie_png(slices, size=size)
    assert sniff_mime(png) == "image/png"
    assert decode_image(png) == (size, size)
    idat = b""
    off = 8
    while off < len(png):
        (ln,) = struct.unpack(">I", png[off : off + 4])
        if png[off + 4 : off + 8] == b"IDAT":
            idat += png[off + 8 : off + 8 + ln]
        off += 12 + ln
    assert len(zlib.decompress(idat)) == size * (1 + 3 * size)
    # determinism: identical input -> identical bytes
    assert render_pie_png(slices, size=size) == png


def _bigram_stats_reference(words: list[str]) -> tuple[float, float]:
    """Plain-Python reference for the repetition stats."""
    from collections import Counter

    nw = len(words)
    dup = 1.0 - len(set(words)) / nw
    bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
    top = (max(Counter(bigrams).values()) / len(bigrams)) if bigrams else 0.0
    return top, dup


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="xyz", min_size=1, max_size=2),
            min_size=1,
            max_size=30,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_repetition_stats_match_python_reference(spark, docs):
    """The array-HOF repetition fold must agree with a plain-Python
    Counter reference on arbitrary word lists — the longest-sorted-run
    trick really computes the max bigram multiplicity."""
    import data_engineering_sf_mobile_food_facilities_public_spark.plans.text_analysis as TA

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig_load = TA.load
    TA.load = lambda s, d, n: df
    try:
        out = {r.doc_id: r for r in TA.repetition_filter_stats(spark, "ignored").collect()}
    finally:
        TA.load = orig_load
    for i, words in enumerate(docs):
        top, dup = _bigram_stats_reference(words)
        assert abs(out[i].top_bigram_frac - top) < 1e-12, (i, words)
        assert abs(out[i].dup_word_frac - dup) < 1e-12, (i, words)


def test_pagerank_conserves_mass_and_ranks_hubs(spark):
    """PageRank invariants on the real graph: total rank stays ~1
    (damped update conserves mass up to the 6-digit per-node rounding),
    every rank is positive, and node count matches the graph's node
    set."""
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        pagerank_customer_supplier,
    )
    from tests.conftest import SF_SMOKE

    ranks = pagerank_customer_supplier(spark, SF_SMOKE).collect()
    n = len(ranks)
    assert n > 0
    total = sum(r.pr for r in ranks)
    # each of the 5 iterations re-rounds every node to 6 digits, so the
    # worst-case accumulated drift is iters * n * 5e-7 (damping shrinks
    # carried-over drift, so this bound is conservative)
    assert abs(total - 1.0) <= 5 * n * 5e-7 + 1e-6, total
    assert all(r.pr > 0 for r in ranks)
    # bipartite construction: both customer and supplier nodes present
    kinds = {r.node[0] for r in ranks}
    assert kinds == {"c", "s"}


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    rgba=st.booleans(),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=5),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_decode_inverts_any_filtered_encoding(w, h, rgba, filters, seed):
    """PNG pixel decode is the exact inverse of DEFLATE + scanline
    filtering for every image shape, channel layout (RGB/RGBA), and
    filter-type sequence — pixels derived deterministically from the
    seed, filters cycled per row."""
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_png_pixels,
    )
    from tests.test_sources_and_extensions import _make_png

    ch = 4 if rgba else 3
    n = w * h * ch
    pixels = bytes((seed * 2654435761 + i * 97 + (i * i) % 251) % 256 for i in range(n))
    png = _make_png(w, h, pixels, ctype=6 if rgba else 2, filters=filters)
    dw, dh, rgb = decode_png_pixels(png)
    assert (dw, dh) == (w, h)
    if rgba:
        expect = b"".join(pixels[4 * p : 4 * p + 3] for p in range(w * h))
    else:
        expect = pixels
    assert rgb == expect


def test_pagerank_deep_run_bounded_lineage_and_convergence(spark, tmp_path):
    """The scale controls of pagerank_run are executable, not narrative:
    25 iterations with reliable checkpointing every 5 must keep the
    final plan's depth bounded by ONE segment (plans re-root at the
    checkpointed RDD instead of accumulating 25 join layers), and the
    L1-delta convergence check must stop the loop early with a delta
    below tolerance."""
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        pagerank_run,
    )
    from tests.conftest import SF_SMOKE

    # lineage bound: a 25-iteration checkpointed run's final plan must
    # be no deeper than an uncheckpointed 6-iteration plan
    ranks, iters_run, _ = pagerank_run(
        spark,
        SF_SMOKE,
        iters=25,
        checkpoint_every=5,
        checkpoint_dir=str(tmp_path / "pr_ckpt"),
    )
    deep_plan = ranks._jdf.queryExecution().analyzed().toString()
    ref6, _, _ = pagerank_run(spark, SF_SMOKE, iters=6)
    ref_plan = ref6._jdf.queryExecution().analyzed().toString()
    assert iters_run == 25
    assert deep_plan.count("Join") <= ref_plan.count("Join")
    assert len(deep_plan) <= len(ref_plan)

    # the checkpointed deep run still satisfies the mass invariant
    rows = ranks.collect()
    total = sum(r.pr for r in rows)
    assert abs(total - 1.0) <= 25 * len(rows) * 5e-7 + 1e-6, total

    # convergence: the damped update contracts the L1 error by ~0.85 per
    # iteration (measured: delta ~2.7e-3 at iter 40 on this fixture), so
    # a 0.01 tolerance must trip the every-5th-iteration check well
    # before the 50-iteration cap
    _, conv_iters, delta = pagerank_run(
        spark,
        SF_SMOKE,
        iters=50,
        checkpoint_every=5,
        checkpoint_dir=str(tmp_path / "pr_ckpt2"),
        tol=0.01,
        check_every=5,
    )
    assert conv_iters < 50
    assert delta is not None and delta < 0.01

    # guard: checkpointing without a reliable dir must be explicit
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsafe_local_checkpoint"):
        pagerank_run(spark, SF_SMOKE, iters=10, checkpoint_every=5)

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
    # be no deeper than an uncheckpointed 6-iteration plan.  Each call
    # gets a handles list so the loop-invariant caches are released when
    # this test's actions are done (cache-ownership contract).
    h1: list = []
    ranks, iters_run, _ = pagerank_run(
        spark,
        SF_SMOKE,
        iters=25,
        checkpoint_every=5,
        checkpoint_dir=str(tmp_path / "pr_ckpt"),
        handles=h1,
    )
    deep_plan = ranks._jdf.queryExecution().analyzed().toString()
    h2: list = []
    ref6, _, _ = pagerank_run(spark, SF_SMOKE, iters=6, handles=h2)
    ref_plan = ref6._jdf.queryExecution().analyzed().toString()
    assert iters_run == 25
    assert deep_plan.count("Join") <= ref_plan.count("Join")
    assert len(deep_plan) <= len(ref_plan)

    # the checkpointed deep run still satisfies the mass invariant
    rows = ranks.collect()
    total = sum(r.pr for r in rows)
    assert abs(total - 1.0) <= 25 * len(rows) * 5e-7 + 1e-6, total
    for df in h1 + h2:
        df.unpersist()

    # convergence: the damped update contracts the L1 error by ~0.85 per
    # iteration (measured: delta ~2.7e-3 at iter 40 on this fixture), so
    # a 0.01 tolerance must trip the every-5th-iteration check well
    # before the 50-iteration cap
    h3: list = []
    _, conv_iters, delta = pagerank_run(
        spark,
        SF_SMOKE,
        iters=50,
        checkpoint_every=5,
        checkpoint_dir=str(tmp_path / "pr_ckpt2"),
        tol=0.01,
        check_every=5,
        handles=h3,
    )
    assert conv_iters < 50
    assert delta is not None and delta < 0.01
    assert len(h3) == 2  # the two loop invariants were handed back
    for df in h3:
        df.unpersist()

    # guard: checkpointing without a reliable dir must be explicit
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsafe_local_checkpoint"):
        pagerank_run(spark, SF_SMOKE, iters=10, checkpoint_every=5)


def test_pagerank_broadcast_mode_matches_shuffle_mode(spark):
    """broadcast_ranks=True (one node-sized exchange per iteration, for
    dimension-sized rank vectors on real clusters) must be a pure
    physical-strategy change: identical ranks to the default
    key-partitioned shuffle path, to the 6-digit iteration rounding."""
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        pagerank_run,
    )
    from tests.conftest import SF_SMOKE

    h1: list = []
    h2: list = []
    a, _, _ = pagerank_run(spark, SF_SMOKE, iters=3, handles=h1)
    b, _, _ = pagerank_run(spark, SF_SMOKE, iters=3, broadcast_ranks=True, handles=h2)
    ra = {r.node: r.pr for r in a.collect()}
    rb = {r.node: r.pr for r in b.collect()}
    for df in h1 + h2:
        df.unpersist()
    assert ra == rb


def test_grouped_running_sum_skewed_group_spans_partitions(spark):
    """Zipf-skew stress for the two-pass cumulative sum: with one
    language owning 90% of a 20k-row corpus, (a) the result is exactly
    the single-window semantics, and (b) the range partitioning that
    carries the big data really SPREADS the giant group — many
    partitions hold 'en' rows and no partition exceeds ~2x the even
    share, which is precisely the property the per-group window lacks
    (it would put all 18k 'en' rows through one task)."""
    from pyspark.sql import Window

    from data_engineering_sf_mobile_food_facilities_public_spark.operators.windows import (
        grouped_running_sum,
    )

    n = 20000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit("en"))
        .otherwise(F.concat(F.lit("l"), (F.col("id") % 10).cast("string")))
        .alias("lang"),
        (F.col("id") % 7 + 1).alias("n_tokens"),
        F.md5(F.col("id").cast("string")).alias("h"),
    )

    out = grouped_running_sum(df, "lang", ["h", "doc_id"], "n_tokens", "cum")
    w = (
        Window.partitionBy("lang")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ref = df.withColumn("cum", F.sum("n_tokens").over(w))
    cols = ["doc_id", "lang", "n_tokens", "cum"]
    assert out.select(cols).exceptAll(ref.select(cols)).count() == 0
    assert ref.select(cols).exceptAll(out.select(cols)).count() == 0

    # partition-shape evidence on the same keys the operator ranges on
    sizes = (
        df.repartitionByRange(8, "lang", "h", "doc_id")
        .groupBy(F.spark_partition_id().alias("pid"), "lang")
        .count()
        .collect()
    )
    per_pid: dict[int, int] = {}
    en_pids = set()
    for r in sizes:
        per_pid[r.pid] = per_pid.get(r.pid, 0) + r["count"]
        if r.lang == "en":
            en_pids.add(r.pid)
    assert len(en_pids) >= 4, en_pids  # the giant group spans partitions
    assert max(per_pid.values()) <= 2.0 * (n / 8), per_pid


def test_exact_dedup_bounds_lsh_candidates_on_duplicate_heavy_corpus(spark):
    """Duplicate-skew stress for the dedup pipeline: 500 byte-identical
    copies in one LSH band bucket would mean ~125k candidate pairs —
    quadratic blowup in the bucket join.  The pipeline's mitigation is
    ordering: exact dedup (hash groupBy on the fingerprint) runs FIRST,
    so the LSH stage sees one survivor per distinct text and candidate
    counts stay bounded by distinct-text pairs, not copy-count pairs."""
    from data_engineering_sf_mobile_food_facilities_public_spark.functions import (
        text as TX,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.dedup import (
        dedup_first,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.minhash import (
        candidate_pairs,
        lsh_bands,
        minhash_signatures,
        shingles,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a completely different document about spark range partitioning",
        "yet another unrelated text mentioning tokens and languages",
    ]
    rows = [(i, texts[0] if i < 500 else texts[i % 3]) for i in range(520)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    fp = docs.select("doc_id", "text", TX.fingerprint("text").alias("fp"))
    survivors = dedup_first(fp, ["fp"], ["doc_id"]).select("doc_id", "text")
    assert survivors.count() == 3  # one per distinct text

    cands = candidate_pairs(lsh_bands(minhash_signatures(shingles(survivors))))
    # 3 distinct texts -> at most 3 pairs ever; without the dedup-first
    # ordering the same corpus yields >=124,750 candidate pairs
    assert cands.count() <= 3


def test_lsh_hot_bucket_cap_bounds_candidates(spark):
    """Adversarial all-identical-band fixture: when exact dedup can't
    save you (near- but not byte-identical boilerplate hashes into ONE
    bucket), ``max_bucket_size`` must drop the degenerate bucket before
    the self-join so candidates stay bounded, while small buckets and
    pairs reachable through other bands survive untouched."""
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.minhash import (
        candidate_pairs,
        oversized_buckets,
    )

    # 200 docs all share band 0's bucket ("HOT"); docs 0 and 1 also share
    # a small band-1 bucket, docs 2 and 3 another
    rows = [(i, 0, "HOT") for i in range(200)]
    rows += [(0, 1, "s1"), (1, 1, "s1"), (2, 1, "s2"), (3, 1, "s2")]
    bands = spark.createDataFrame(
        rows, "doc_id long, band_idx int, band_hash string"
    )

    uncapped = candidate_pairs(bands).count()
    assert uncapped == 200 * 199 // 2  # the quadratic blowup, for scale

    capped = candidate_pairs(bands, max_bucket_size=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    # only the small-bucket pairs remain: C(cap,2) bounds any bucket
    assert got == {(0, 1), (2, 3)}

    audit = oversized_buckets(bands, 10).collect()
    assert len(audit) == 1
    assert (audit[0].band_idx, audit[0].band_hash, audit[0].bucket_size) == (
        0,
        "HOT",
        200,
    )

    # a cap larger than every bucket is the identity
    assert candidate_pairs(bands, max_bucket_size=500).count() == uncapped


def test_incremental_probe_applies_same_hot_bucket_cap(spark):
    """The batch-vs-corpus probe must honor the SAME hot-bucket cap as
    the full self-join path: a degenerate corpus bucket would otherwise
    pair every batch doc with the whole bucket (re-creating the
    quadratic blow-up) AND make incremental results diverge from a
    capped full-dedup run.  With the cap, only the small corpus buckets
    are probe-able; uncapped stays exact."""
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.minhash import (
        probe_candidates,
    )

    # corpus: 200 docs share band 0's "HOT" bucket; docs 2, 4 sit in a
    # small band-1 bucket.  batch: docs 1001, 1003 probe both buckets.
    corpus = [(i, 0, "HOT") for i in range(200)] + [(2, 1, "s1"), (4, 1, "s1")]
    batch = [(1001, 0, "HOT"), (1001, 1, "s1"), (1003, 0, "HOT")]
    cb = spark.createDataFrame(corpus, "id_a long, band_idx int, band_hash string")
    bb = spark.createDataFrame(batch, "id_b long, band_idx int, band_hash string")

    uncapped = probe_candidates(bb, cb)
    # every batch doc pairs with the whole hot bucket (the s1 pairs are
    # subsumed: corpus docs 2 and 4 are hot-bucket members too)
    assert uncapped.count() == 200 * 2

    capped = {(r.id_a, r.id_b) for r in probe_candidates(bb, cb, max_bucket_size=10).collect()}
    assert capped == {(2, 1001), (4, 1001)}  # only the small bucket probes

    # a cap larger than every bucket is the identity
    assert probe_candidates(bb, cb, max_bucket_size=500).count() == uncapped.count()


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 65535),
    h=st.integers(1, 65535),
    sof=st.sampled_from([0xC0, 0xC1, 0xC2]),  # baseline / ext. seq. / progressive
    pre=st.lists(
        st.tuples(
            st.sampled_from([0xE0, 0xE1, 0xDB, 0xC4, 0xFE]),  # APPn/DQT/DHT/COM
            st.binary(min_size=0, max_size=24),
        ),
        max_size=4,
    ),
    fills=st.lists(st.integers(0, 3), min_size=5, max_size=5),
    rst=st.booleans(),
)
def test_jpeg_header_dims_parse_any_segment_layout(w, h, sof, pre, fills, rst):
    """The JPEG dimension walker must find the first SOF0/1/2 under any
    legal header layout: arbitrary APPn/DQT/DHT/COM segments (random
    payloads, including 0xFF bytes inside payloads), runs of 0xFF fill
    bytes between segments, standalone RST markers, baseline AND
    progressive frames — and must read dims from the marker's fixed
    offsets (big-endian height at +5, width at +7)."""
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_image,
    )

    data = bytearray(b"\xff\xd8")  # SOI
    for (marker, payload), f in zip(pre, fills):
        data += b"\xff" * f
        data += bytes([0xFF, marker])
        data += (len(payload) + 2).to_bytes(2, "big") + payload
    if rst:
        data += bytes([0xFF, 0xD0])  # standalone restart marker, no length
    data += b"\xff" * fills[-1]
    sof_payload = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    data += bytes([0xFF, sof]) + (len(sof_payload) + 2).to_bytes(2, "big") + sof_payload
    # entropy-coded tail after SOS: the walker must never scan past SOS
    data += b"\xff\xda" + (4).to_bytes(2, "big") + b"\x01\x00" + b"\x12\x34\xff\x00\x56"
    assert decode_image(bytes(data)) == (w, h)


def test_jpeg_header_without_sof_refuses():
    """SOS or EOI before any SOF means no dimensions exist in the
    header: the parser must raise, not fabricate."""
    import pytest as _pytest

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        decode_image,
    )

    sos_first = b"\xff\xd8\xff\xda" + (4).to_bytes(2, "big") + b"\x01\x00" + b"\xab"
    with _pytest.raises(ValueError, match="no SOF"):
        decode_image(sos_first)
    eoi_only = b"\xff\xd8\xff\xd9"
    with _pytest.raises(ValueError, match="no SOF"):
        decode_image(eoi_only)
    # the fake path still yields a plausible shape for plumbing tests
    assert decode_image(sos_first, deterministic_fake=True)[0] >= 64


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    npal=st.integers(2, 256),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_lzw_roundtrip_any_palette_and_shape(w, h, npal, seed):
    """GIF LZW decode inverts the no-compression encoder for every
    image shape and palette size 2..256 (the code-width edge cases:
    mcs floor at 2, CLEAR cadence, 255-byte sub-block splits)."""
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        _gif_decode_indexed,
        decode_gif_pixels,
        encode_gif,
    )

    palette = bytes((seed + 7 * i) % 256 for i in range(3 * npal))
    indices = [(seed * 31 + j * 13 + (j * j) % 97) % npal for j in range(w * h)]
    gif = encode_gif(w, h, indices, palette)
    dw, dh, got, _ = _gif_decode_indexed(gif)
    assert (dw, dh, got) == (w, h, indices)
    _, _, rgb = decode_gif_pixels(gif)
    assert rgb == b"".join(palette[3 * i : 3 * i + 3] for i in indices)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    quality=st.sampled_from([70, 85, 95]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_error_bounded_by_quality(w, h, quality, seed):
    """Baseline JPEG round-trip on arbitrary shapes (incl. non-8-multiple
    dims hitting the edge-replication pad): dims always exact, and the
    per-pixel error stays within a bound that shrinks as quality rises —
    lossy, but boundedly and deterministically so."""
    import numpy as np

    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.jpeg_codec import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    rng = np.random.RandomState(seed % (2**31))
    # smooth-ish content (random low-res upsampled): realistic for JPEG,
    # keeps the error bound meaningful (pure noise is the codec's
    # documented worst case)
    small = rng.randint(0, 256, ((h + 7) // 8, (w + 7) // 8, 3))
    arr = np.clip(
        np.kron(small, np.ones((8, 8, 1)))[:h, :w], 0, 255
    ).astype(np.uint8)
    jpg = encode_jpeg(w, h, arr.tobytes(), quality=quality)
    dw, dh, out = decode_jpeg_pixels(jpg)
    assert (dw, dh) == (w, h)
    err = np.abs(
        arr.astype(int) - np.frombuffer(out, np.uint8).reshape(h, w, 3).astype(int)
    )
    bound = {70: 40, 85: 25, 95: 15}[quality]
    assert err.max() <= bound, (err.max(), quality)
    # determinism: same input -> same bytes
    assert encode_jpeg(w, h, arr.tobytes(), quality=quality) == jpg


def test_sequence_packing_invariants(spark):
    """Packing must tile the corpus exactly: bins are contiguous from 0,
    every token is assigned to exactly one bin (bin token sums equal the
    corpus total), each bin starts inside its own window, and a bin is
    marked straddling iff its last document's tokens cross the next
    window boundary."""
    from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
    from data_engineering_sf_mobile_food_facilities_public_spark.functions import text as TX
    from tests.conftest import SF_SMOKE

    budget = 512
    rows = {
        r.bin_id: r
        for r in relational.QUERIES["sequence_packing_bins"](
            spark, SF_SMOKE
        ).collect()
    }
    bins = sorted(rows)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    # precondition of the contiguity assertion below: no single document
    # exceeds the window budget (a >budget doc spans whole windows that
    # then contain no STARTING doc — correct packing, but bin ids would
    # legitimately skip).  Made explicit so a corpus regen that adds
    # giant docs fails here with a clear message, not at the assertion.
    max_doc = docs.select(
        F.max(TX.token_count("text").cast("long")).alias("m")
    ).collect()[0]["m"]
    assert max_doc < budget, "fixture changed: adjust contiguity expectations"
    assert bins == list(range(len(bins)))  # contiguous, zero-based
    total_tokens = docs.select(
        F.sum(TX.token_count("text").cast("long")).alias("t")
    ).collect()[0]["t"]
    assert sum(r.bin_tokens for r in rows.values()) == total_tokens
    for b in bins:
        assert b * budget <= rows[b].bin_start_offset < (b + 1) * budget
    for b in bins[:-1]:
        nxt = rows[b + 1]
        # the next bin's first doc starts at the end of this bin's span
        assert nxt.bin_start_offset >= (b + 1) * budget
        ends_past_boundary = (
            rows[b].bin_start_offset + rows[b].bin_tokens > (b + 1) * budget
        )
        assert bool(rows[b].straddles_next) == ends_past_boundary


@given(
    w=st.integers(min_value=1, max_value=65535),
    h=st.integers(min_value=1, max_value=65535),
    order=st.sampled_from(["little", "big"]),
    typ=st.sampled_from([3, 4]),
)
@settings(max_examples=40, deadline=None)
def test_tiff_ifd_parse_any_dims_any_order(w, h, order, typ):
    """Generative TIFF check: any (width, height) in either byte order
    with SHORT or LONG entries parses back exactly."""
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        _tiff_dimensions,
    )

    def entry(tag, val):
        if typ == 3 and val <= 0xFFFF:
            t, v = 3, val.to_bytes(2, order) + bytes(2)
        else:
            t, v = 4, val.to_bytes(4, order)
        return (
            tag.to_bytes(2, order)
            + t.to_bytes(2, order)
            + (1).to_bytes(4, order)
            + v
        )

    bom = b"II" if order == "little" else b"MM"
    blob = (
        bom
        + (42).to_bytes(2, order)
        + (8).to_bytes(4, order)
        + (2).to_bytes(2, order)
        + entry(256, w)
        + entry(257, h)
        + bytes(4)
    )
    assert _tiff_dimensions(blob) == (w, h)


@given(
    n_frames=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=10**6),
)
@settings(max_examples=20, deadline=None)
def test_animated_gif_roundtrip_any_frames(n_frames, seed):
    """Generative animated-GIF check: any frame count with arbitrary
    16-color 4x4 content round-trips frame-for-frame."""
    from data_engineering_sf_mobile_food_facilities_public_spark.multimodal.binary_ops import (
        _gif_decode_all_frames,
        encode_animated_gif,
    )

    palette = b"".join(bytes([k * 16] * 3) for k in range(16))
    frames = [
        [(seed * 7 + f * 13 + j * 3) % 16 for j in range(16)]
        for f in range(n_frames)
    ]
    decoded = _gif_decode_all_frames(encode_animated_gif(4, 4, frames, palette))
    assert [d[2] for d in decoded] == frames


def test_compression_ratio_orders_text_regimes(spark):
    """The compression-ratio signal must separate the three text
    regimes it exists to separate: templated boilerplate (highly
    compressible) < natural prose < high-entropy noise (incompressible),
    with the keep band admitting prose and rejecting both extremes; and
    the scores must be deterministic across runs."""
    import hashlib

    from data_engineering_sf_mobile_food_facilities_public_spark.plans.text_analysis import (
        compression_ratio_filter,
    )

    boiler = "click here to subscribe now " * 60
    words = [
        "committee", "reviewed", "proposal", "selected", "evidence",
        "community", "benefit", "budget", "constraint", "delay",
        "implementation", "year", "quarter", "report", "analysis",
        "finding", "measure", "impact", "region", "school", "hospital",
        "road", "bridge", "water", "energy", "market", "price",
        "supply", "demand", "growth",
    ]
    prose = " ".join(
        "the "
        + " ".join(
            words[b % len(words)]
            for b in hashlib.md5(f"p{i}".encode()).digest()[:9]
        )
        + "."
        for i in range(40)
    )
    noise = "".join(
        chr(33 + (b % 94))
        for i in range(40)
        for b in hashlib.md5(f"q{i}".encode()).digest()
    )
    docs = spark.createDataFrame(
        [
            (i, t, "en", "src0", len(t))
            for i, t in enumerate([boiler, prose, noise])
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import os
    import tempfile

    tmp = tempfile.mkdtemp()
    docs.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmp, "_d"))
    part = next(
        f for f in os.listdir(os.path.join(tmp, "_d")) if f.startswith("part-")
    )
    os.rename(os.path.join(tmp, "_d", part), os.path.join(tmp, "documents.parquet"))

    out = {r.doc_id: r for r in compression_ratio_filter(spark, tmp).collect()}
    assert out[0].compression_ratio < out[1].compression_ratio < out[2].compression_ratio
    assert not out[0].keep and out[1].keep and not out[2].keep
    out2 = {r.doc_id: r for r in compression_ratio_filter(spark, tmp).collect()}
    assert all(out[k].compression_ratio == out2[k].compression_ratio for k in out)


@given(
    keys=st.lists(
        st.tuples(st.text(alphabet="abc", min_size=0, max_size=3),
                  st.integers(min_value=-50, max_value=50)),
        min_size=1,
        max_size=40,
    ),
    n_cuts=st.integers(min_value=0, max_value=7),
)
@settings(**_SETTINGS)
def test_bucket_expr_matches_python_bisect(spark, keys, n_cuts):
    """The data-derived bucket id (binary-search CASE tree) must equal
    bisect_right over the sorted cut tuples for EVERY row — the pure
    algebraic property the partitioning-independent cumsum rests on —
    and must be monotone in the key order."""
    import bisect

    from data_engineering_sf_mobile_food_facilities_public_spark.operators.windows import (
        _bucket_expr,
    )

    uniq = sorted(set(keys))
    cuts = uniq[:: max(1, len(uniq) // (n_cuts + 1))][:n_cuts]
    df = spark.createDataFrame(keys, "s string, v int")
    got = {
        (r.s, r.v): r.b
        for r in df.withColumn(
            "b", _bucket_expr(df, ["s", "v"], cuts)
        ).collect()
    }
    for k in keys:
        assert got[k] == bisect.bisect_right(cuts, k), (k, cuts)
    ordered = sorted(keys)
    buckets = [got[k] for k in ordered]
    assert buckets == sorted(buckets)  # monotone in key order


@given(
    rows=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60),
    nb=st.integers(min_value=1, max_value=9),
)
@settings(**_SETTINGS)
def test_range_cuts_strictly_increasing_and_bounded(spark, rows, nb):
    """_range_cuts returns at most n_buckets - 1 strictly increasing
    tuples drawn from the data."""
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.windows import (
        _range_cuts,
    )

    df = spark.createDataFrame([(v,) for v in rows], "v int")
    cuts = _range_cuts(df, ["v"], nb, sample_size=1000, seed=3)
    assert len(cuts) <= max(nb - 1, 0)
    assert all(cuts[i] < cuts[i + 1] for i in range(len(cuts) - 1))
    assert all(c[0] in rows for c in cuts)


def test_lpa_bridged_cliques_split_but_components_merge(spark):
    """The LPA-vs-components discriminator: two 4-cliques joined by ONE
    bridge edge are a single connected component but must resolve to TWO
    communities — the bridge's single vote loses to each clique's
    internal majority.  On DISJOINT cliques LPA and components agree
    exactly."""
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.graph import (
        connected_components,
        label_propagation,
    )
    import itertools

    def clique(ids):
        return [(a, b) for a, b in itertools.combinations(ids, 2)]

    bridged = clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)]
    e = spark.createDataFrame(bridged, "id_a: long, id_b: long")
    comp = {r.id: r.component for r in connected_components(e).collect()}
    lpa = {r.id: r.community for r in label_propagation(e).collect()}
    assert len(set(comp.values())) == 1  # one component (the bridge)
    assert len(set(lpa.values())) == 2  # two communities (density wins)
    assert {frozenset(k for k, v in lpa.items() if v == c) for c in set(lpa.values())} == {
        frozenset({0, 1, 2, 3}),
        frozenset({10, 11, 12, 13}),
    }

    disjoint = clique([0, 1, 2]) + clique([20, 21, 22, 23])
    e2 = spark.createDataFrame(disjoint, "id_a: long, id_b: long")
    comp2 = {r.id: r.component for r in connected_components(e2).collect()}
    lpa2 = {r.id: r.community for r in label_propagation(e2).collect()}
    assert comp2 == lpa2  # no bridges: communities == components


def test_lpa_is_partitioning_invariant(spark):
    """LPA's classic failure mode is update-order dependence; the
    synchronous min-tie formulation must be a pure function of the edge
    set — identical labels no matter how the input is partitioned."""
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.graph import (
        label_propagation,
    )

    edges = [(i, (i * 3 + 1) % 40) for i in range(40)] + [(i, i + 1) for i in range(0, 38, 2)]
    edges = [(int(a), int(b)) for a, b in edges if a != b]
    e = spark.createDataFrame(edges, "id_a: long, id_b: long")
    r1 = {r.id: r.community for r in label_propagation(e.repartition(1)).collect()}
    r7 = {r.id: r.community for r in label_propagation(e.repartition(7)).collect()}
    assert r1 == r7


def test_grouped_running_max_matches_single_window(spark):
    """The bucketed running-extrema decomposition equals the naive
    single-window semantics — inclusive AND exclusive — on skewed data
    with duplicate order keys inside groups handled by tiebreak, for a
    bucket count small enough that every bucket holds many rows and
    large enough that some buckets hold one."""
    from pyspark.sql import Window

    from data_engineering_sf_mobile_food_facilities_public_spark.operators.windows import (
        grouped_running_max,
    )

    n = 5000
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        (F.col("id") % 3).cast("string").alias("grp"),
        F.md5(F.col("id").cast("string")).alias("h"),
        ((F.col("id") * 37) % 101).alias("v"),
    )
    for nb in (2, 16, 64):
        inc = grouped_running_max(
            df, "grp", ["h", "rid"], "v", out_col="rm", n_buckets=nb
        )
        exc = grouped_running_max(
            df, "grp", ["h", "rid"], "v", out_col="rm", exclusive=True, n_buckets=nb
        )
        w = Window.partitionBy("grp").orderBy("h", "rid")
        ref_inc = df.withColumn(
            "rm", F.max("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        ref_exc = df.withColumn(
            "rm", F.max("v").over(w.rowsBetween(Window.unboundedPreceding, -1))
        )
        cols = ["rid", "grp", "v", "rm"]
        for got, want in ((inc, ref_inc), (exc, ref_exc)):
            assert got.select(cols).exceptAll(want.select(cols)).count() == 0
            assert want.select(cols).exceptAll(got.select(cols)).count() == 0


def test_skyline_is_mutually_non_dominating(spark):
    """Every returned part is undominated BY every other returned part
    (internal consistency), and no excluded part is undominated by the
    whole input — checked driver-side on the small corpus."""
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.relational import (
        QUERIES,
    )
    from tests.conftest import SF_SMOKE

    rows = QUERIES["skyline_parts"](spark, SF_SMOKE).collect()
    assert rows
    pts = [(r.p_retailprice, r.p_size) for r in rows]
    for i, (pa, sa) in enumerate(pts):
        for j, (pb, sb) in enumerate(pts):
            if i != j:
                dominated = pb <= pa and sb >= sa and (pb < pa or sb > sa)
                assert not dominated, (pts[i], pts[j])


def test_replication_checksum_detects_mutation_and_reaggregates(spark):
    """The anti-entropy contract: (a) partitioning/row-order-insensitive
    — a shuffled single-file rewrite yields identical per-month
    checksums; (b) one mutated row flips exactly its month's checksum
    and no other, with counts unchanged (content diff, not loss);
    (c) month partials XOR to the same total a direct whole-table XOR
    gives (re-aggregation property)."""
    import tempfile
    from functools import reduce

    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.relational import (
        QUERIES,
    )
    from tests.conftest import SF_SMOKE
    from tests.fixture_io import write_naive_parquet

    base = {
        r.month: (r.n_rows, r.checksum)
        for r in QUERIES["replication_checksum_orders"](spark, SF_SMOKE).collect()
    }
    assert len(base) > 1

    o = load(spark, SF_SMOKE, "orders")
    cols = o.columns
    rows = [tuple(r) for r in o.collect()]
    int_cols = ["o_orderkey", "o_custkey"]

    def rewrite(rows_out):
        tmp = tempfile.mkdtemp()
        write_naive_parquet(
            f"{tmp}/orders.parquet", rows_out, cols,
            ts_cols=["o_orderdate"], int_cols=int_cols,
        )
        return {
            r.month: (r.n_rows, r.checksum)
            for r in QUERIES["replication_checksum_orders"](spark, tmp).collect()
        }

    # (a) reversed row order in a fresh file: identical checksums
    assert rewrite(list(reversed(rows))) == base

    # (b) mutate one row's status: only that month's checksum moves
    ik = cols.index("o_orderkey")
    ist = cols.index("o_orderstatus")
    idt = cols.index("o_orderdate")
    victim = min(rows, key=lambda r: r[ik])
    mutated = [
        (tuple(v if i != ist else "~" for i, v in enumerate(r))
         if r[ik] == victim[ik] else r)
        for r in rows
    ]
    diff = rewrite(mutated)
    vm = victim[idt].strftime("%Y-%m")
    changed = {m for m in base if base[m] != diff[m]}
    assert changed == {vm}
    assert base[vm][0] == diff[vm][0]  # count equal: content diff, not loss

    # (c) partials XOR to the whole-table XOR
    total = reduce(lambda a, b: a ^ b, (c for _, c in base.values()))
    whole = (
        QUERIES["replication_checksum_orders"](spark, SF_SMOKE)
        .agg(F.bit_xor("checksum"))
        .collect()[0][0]
    )
    assert total == whole


def test_bpe_train_matches_python_reference_any_partitioning(spark):
    """The learned merge list is a pure function of the word-count
    vocabulary: equal to a plain-Python BPE reference (same left-to-
    right non-overlapping merge rule, same (count DESC, left, right)
    argmax tiebreak), and invariant under input repartitioning."""
    from collections import Counter

    from data_engineering_sf_mobile_food_facilities_public_spark.operators.bpe import (
        bpe_train,
        char_vocab,
    )

    words = {
        "low": 5, "lower": 2, "newest": 6, "widest": 3,
        "aaa": 4, "aab": 4,  # overlap rule + tie pressure
        "x": 7,  # single-symbol word: contributes no pairs
    }

    def py_bpe(vocab: dict, k: int):
        vocab = {tuple(w): n for w, n in vocab.items()}
        out = []
        for rank in range(k):
            counts = Counter()
            for seq, n in vocab.items():
                i = 0
                while i + 1 < len(seq):
                    counts[(seq[i], seq[i + 1])] += n
                    i += 1
            if not counts:
                break
            (a, b), cnt = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            out.append((rank, a, b, cnt))
            nv = {}
            for seq, n in vocab.items():
                res, i = [], 0
                while i < len(seq):
                    if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                        res.append(a + b)
                        i += 2
                    else:
                        res.append(seq[i])
                        i += 1
                nv[tuple(res)] = nv.get(tuple(res), 0) + n
            vocab = nv
        return out

    want = py_bpe(words, 8)
    for parts in (1, 5):
        df = spark.createDataFrame(
            list(words.items()), "word STRING, n LONG"
        ).repartition(parts)
        got = bpe_train(char_vocab(df), 8)
        assert got == want, (got, want)


def test_bpe_segmentation_reconstructs_words(spark):
    """Segmentation invariants: pieces concatenate back to the exact
    word, every piece is a learned symbol (an initial character or a
    merge product), and applying merges in rank order is deterministic
    across partitionings."""
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.bpe import (
        bpe_segment_words,
        bpe_train,
        char_vocab,
    )

    words = ["lowest", "newest", "wider", "aaaab", "x", "queue"]
    df = spark.createDataFrame([(w, i + 1) for i, w in enumerate(words)], "word STRING, n LONG")
    merges = bpe_train(char_vocab(df), 6)
    learned = {a + b for _, a, b, _ in merges}
    out = {r.word: list(r.pieces) for r in bpe_segment_words(df, merges).collect()}
    assert set(out) == set(words)
    for w, pieces in out.items():
        assert "".join(pieces) == w
        for p in pieces:
            assert len(p) == 1 or p in learned
    out2 = {
        r.word: list(r.pieces)
        for r in bpe_segment_words(df.repartition(4), merges).collect()
    }
    assert out2 == out


def test_kcore_round4_is_fixpoint_and_degrees_bounded(spark):
    """kcore_part_graph's docstring pins "converges by round 4 at
    sf0.01"; if data drift ever broke that, the result would silently
    become "the round-4 peel" instead of the true 2-core.  Pin the
    fixpoint in DuckDB (milliseconds) and the in-core degree bound on
    the Spark result."""
    import duckdb

    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        _KCORE_K,
        _KCORE_ROUNDS,
        _kcore_peel_sql,
        kcore_part_graph,
    )

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')"
        )
        n4, n5 = con.execute(
            f"""
            WITH edges AS (
                SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
                FROM lineitem a JOIN lineitem b
                  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
                GROUP BY 1, 2 HAVING COUNT(*) >= 2
            ),
            sym AS (SELECT id_a AS u, id_b AS v FROM edges
                    UNION ALL SELECT id_b, id_a FROM edges),
            {_kcore_peel_sql(_KCORE_K, _KCORE_ROUNDS + 1)}
            SELECT (SELECT COUNT(*) FROM s{_KCORE_ROUNDS}),
                   (SELECT COUNT(*) FROM s{_KCORE_ROUNDS + 1})
            """
        ).fetchone()
    finally:
        con.close()
    assert n4 == n5, f"peel no longer converged by round {_KCORE_ROUNDS}: {n4} != {n5}"

    rows = kcore_part_graph(spark, "/root/testdata/sf0.001").collect()
    assert all(r.core_degree >= _KCORE_K for r in rows)


def test_star_graph_assortativity_is_minus_one(spark, tmp_path):
    # 2-item baskets {center, leaf_i} build a 6-leaf star: every edge
    # joins degree 6 to degree 1, so the degree-degree correlation over
    # the symmetrized edge list is exactly -1 (Newman's disassortative
    # extreme).  Exercises the exact-integer moment path end to end.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        degree_assortativity_part_graph,
    )

    orders, parts = [], []
    for i in range(1, 7):
        orders += [i, i]
        parts += [0, i]
    n = len(orders)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(orders, pa.int64()),
                "l_partkey": pa.array(parts, pa.int64()),
                "l_suppkey": pa.array([1] * n, pa.int64()),
                "l_linenumber": pa.array([1] * n, pa.int32()),
                "l_quantity": pa.array([1.0] * n, pa.float64()),
                "l_extendedprice": pa.array([1.0] * n, pa.float64()),
                "l_discount": pa.array([0.0] * n, pa.float64()),
                "l_tax": pa.array([0.0] * n, pa.float64()),
                "l_returnflag": pa.array(["N"] * n, pa.string()),
                "l_linestatus": pa.array(["O"] * n, pa.string()),
                "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    row = degree_assortativity_part_graph(spark, str(tmp_path)).collect()[0]
    assert row.n_nodes == 7
    assert row.n_edges == 6
    assert row.assortativity == -1.0


def test_dp_noise_matches_python_inverse_cdf(spark):
    # The seeded geometric draw is a pure function of the group key:
    # replicate it in plain Python from the md5 and require the Spark
    # release to match EXACTLY, group by group (and epsilon to ride
    # along as the accounting column).
    import hashlib
    import math

    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.text_analysis import (
        dp_noisy_counts_seeded,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    cu = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    true = {
        r.n_name: r.c
        for r in cu.join(n, cu.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    got = {r.n_name: (r.noisy_count, r.epsilon) for r in
           dp_noisy_counts_seeded(spark, sf).collect()}
    assert set(got) == set(true)
    for name, c in true.items():
        u = int(hashlib.md5(f"dp11{name}".encode()).hexdigest()[:13], 16) / 2**52
        mag = math.floor(-math.log(1 - 2 * abs(u - 0.5)))
        noise = (1 if u >= 0.5 else -1) * mag
        assert got[name] == (c + noise, 1.0), name


def test_shapley_attribution_satisfies_efficiency_axiom(spark):
    # The Shapley shares must telescope to v(grand coalition) - v(empty):
    # recompute the characteristic function independently and compare
    # (each released share is rounded at 6dp -> tolerance 4 * 0.5e-6).
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        shapley_channel_attribution,
    )
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    ev = load(spark, sf, "events")
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "error", 8)
        .otherwise(0)
    )
    j = (
        ev.select(
            "user_id",
            F.date_trunc("week", F.col("ts")).alias("wk"),
            bit.alias("bit"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("cv"),
        )
        .groupBy("user_id", "wk")
        .agg(F.expr("bit_or(bit)").alias("mask"), F.max("cv").alias("conv"))
    )
    vt = {
        r.mask: round(r.cn / r.n, 6)
        for r in j.groupBy("mask")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("cn"))
        .collect()
    }
    v_grand = vt.get(15, 0.0)
    v_empty = vt.get(0, 0.0)
    shares = {
        r.channel: r.shapley_value
        for r in shapley_channel_attribution(spark, sf).collect()
    }
    assert set(shares) == {"click", "view", "signup", "error"}
    assert abs(sum(shares.values()) - (v_grand - v_empty)) <= 4 * 0.5e-6


def test_markov_removal_effects_nonnegative_and_shares_normalize(spark):
    # Deleting a channel can only redirect mass to the NULL absorber,
    # so K-step conversion cannot increase: removal effects are >= 0 up
    # to the 1e-6 per-step rounding grain, and the shares sum to 1
    # (when any effect is positive).
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        markov_removal_attribution,
    )

    rows = markov_removal_attribution(spark, "/root/testdata/sf0.001").collect()
    assert {r.channel for r in rows} == {"click", "view", "signup", "error"}
    for r in rows:
        assert r.conv_prob_removed <= r.conv_prob_full + 1e-5, r
        assert r.removal_effect >= -1e-5, r
    shares = [r.attribution_share for r in rows if r.attribution_share is not None]
    if shares:
        assert abs(sum(shares) - 1.0) <= 4 * 0.5e-6


def test_reconciled_forecasts_cohere_per_region(spark):
    # Top-down reconciliation's whole point: reconciled nation
    # forecasts sum to their region's forecast (each nation rounded at
    # 6dp -> tolerance n_nations * 0.5e-6).
    from collections import defaultdict

    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        hierarchical_forecast_reconciliation,
    )

    rows = hierarchical_forecast_reconciliation(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_region = defaultdict(list)
    region_fc = {}
    for r in rows:
        by_region[r.r_name].append(r.reconciled_forecast)
        region_fc[r.r_name] = r.region_forecast
    assert by_region
    for reg, vals in by_region.items():
        assert abs(sum(vals) - region_fc[reg]) <= (len(vals) + 1) * 0.5e-6, reg


def test_apportionment_seats_sum_exactly_to_budget(spark):
    # Largest remainder's defining property: integer seats sum to the
    # exact budget at every scale, no float drift.
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.lakehouse import (
        largest_remainder_apportionment,
    )

    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        rows = largest_remainder_apportionment(spark, sf).collect()
        assert sum(r.seats for r in rows) == 1000, sf
        assert all(r.seats >= 0 for r in rows)


def test_ipf_raking_hits_both_margins(spark):
    # After 6 sweeps the weighted margins must sit within the rounding
    # grain of the balanced targets (the raking convergence property).
    from collections import defaultdict

    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        ipf_raking_weights,
    )

    rows = ipf_raking_weights(spark, "/root/testdata/sf0.001").collect()
    total = sum(r.n_customers for r in rows)
    nations = {r.n_name for r in rows}
    segs = {r.mktsegment for r in rows}
    tr, tc = total / len(nations), total / len(segs)
    rowm, colm = defaultdict(float), defaultdict(float)
    for r in rows:
        rowm[r.n_name] += r.n_customers * r.weight
        colm[r.mktsegment] += r.n_customers * r.weight
    # column sweep ran last -> columns exact to rounding; rows near
    for s, v in colm.items():
        assert abs(v - tc) <= 1e-3 * tc, (s, v, tc)
    for nname, v in rowm.items():
        assert abs(v - tr) <= 0.05 * tr, (nname, v, tr)


def test_mediation_effects_satisfy_cochran_identity(spark):
    # total = direct + indirect holds exactly in the algebra; released
    # values are each rounded at 6dp -> tolerance 3 * 0.5e-6.
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        mediation_quantity_discount_returns,
    )

    r = mediation_quantity_discount_returns(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert abs(r.total_effect - (r.direct_effect + r.indirect_effect)) <= 3 * 0.5e-6


def test_pagerank_auto_mode_picks_measured_crossover(spark):
    """mode='auto' (the r12 VERDICT #3 default) resolves the join
    strategy from the measured sf1/sf3 warm power laws: shuffle below
    ~64M bidirectional edge rows, broadcast_ranks above — but never
    when the rank vector itself outgrows broadcastability (30M nodes).
    The decision helper is pure; the equivalence of the two physical
    paths is pinned by test_pagerank_broadcast_mode_matches_shuffle_mode."""
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        _PR_AUTO_EDGE_CROSSOVER,
        _PR_AUTO_MAX_BCAST_NODES,
        _pagerank_pick_broadcast,
        pagerank_run,
    )
    from tests.conftest import SF_SMOKE

    # below the crossover (the sf1 probe point: shuffle won 4.68s vs 7.84s)
    assert not _pagerank_pick_broadcast(11_700_000, 160_000)
    # above it (the extrapolated sf9-equivalent regime)
    assert _pagerank_pick_broadcast(_PR_AUTO_EDGE_CROSSOVER, 1_000_000)
    # edge count alone is not enough: a web-scale rank vector cannot
    # broadcast, whatever the edge count
    assert not _pagerank_pick_broadcast(10**9, _PR_AUTO_MAX_BCAST_NODES + 1)

    # lazy-callable contract (VERDICT r13 #4 + ADVICE r13): the helper
    # IS the production predicate; below the edge crossover the node
    # side must never be evaluated (metadata-cheap common case)
    def _boom():
        raise AssertionError("node count evaluated below the crossover")

    assert not _pagerank_pick_broadcast(lambda: 11_700_000, _boom)
    assert _pagerank_pick_broadcast(
        lambda: _PR_AUTO_EDGE_CROSSOVER, lambda: 1_000_000
    )

    # the footer bound used by mode='auto' reads real metadata: for the
    # single-file testdata layout it equals the exact lineitem count,
    # and 2x it is decisively below the crossover at every test SF
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        _parquet_footer_rows,
    )

    n_li = _parquet_footer_rows(SF_SMOKE, "lineitem")
    assert n_li is not None and n_li > 0
    assert 2 * n_li < _PR_AUTO_EDGE_CROSSOVER
    assert _parquet_footer_rows(SF_SMOKE, "no_such_table") is None

    # auto is the default and runs end-to-end (tiny graph -> shuffle path)
    h: list = []
    ranks, iters_run, _ = pagerank_run(spark, SF_SMOKE, iters=2, handles=h)
    total = sum(r.pr for r in ranks.collect())
    for df in h:
        df.unpersist()
    assert iters_run == 2
    assert abs(total - 1.0) < 1e-2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="mode must be"):
        pagerank_run(spark, SF_SMOKE, iters=1, mode="bogus")


def test_parquet_footer_rows_directory_layout(spark, tmp_path):
    """The footer-metadata bound used by pagerank's mode='auto' must
    also read the directory-of-part-files layout (the x-replica probe
    shape), summing every part footer."""
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        _parquet_footer_rows,
    )
    from tests.conftest import SF_SMOKE

    base = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    n = base.count()
    out = tmp_path / "lineitem.parquet"
    base.repartition(4).write.mode("overwrite").parquet(str(out))
    got = _parquet_footer_rows(str(tmp_path), "lineitem")
    assert got == n, (got, n)

def test_pagerank_auto_mode_branch_matches_helper_across_crossover(
    spark, monkeypatch
):
    """VERDICT r14 #6: the branch pagerank_run(mode='auto') ACTUALLY
    takes must equal _pagerank_pick_broadcast's verdict on both sides
    of the edge crossover — pinned end-to-end via the decision hook so
    the production-path delegation can't silently regress.  The
    crossover is straddled by monkeypatching the module constant (the
    test graph is fixed; the constant is what moves)."""
    from data_engineering_sf_mobile_food_facilities_public_spark.plans import (
        analytics,
    )
    from tests.conftest import SF_SMOKE

    def _run_auto() -> bool:
        d: dict = {}
        h: list = []
        analytics.pagerank_run(
            spark, SF_SMOKE, iters=1, handles=h, decision=d
        )
        for df in h:
            df.unpersist()
        return d["broadcast_ranks"]

    n_li = analytics._parquet_footer_rows(SF_SMOKE, "lineitem")
    assert n_li is not None and 2 * n_li < analytics._PR_AUTO_EDGE_CROSSOVER

    # side 1: real constant — footer bound decisively below the
    # crossover, helper says shuffle, production branch must agree
    assert analytics._pagerank_pick_broadcast(2 * n_li, 10**9) is False
    assert _run_auto() is False

    # side 2: crossover lowered beneath the footer bound — the bound is
    # no longer decisive, auto falls back to real edge/node counts, and
    # the helper (with those same counts) says broadcast_ranks
    monkeypatch.setattr(analytics, "_PR_AUTO_EDGE_CROSSOVER", 2)
    assert analytics._pagerank_pick_broadcast(2, 100) is True
    assert _run_auto() is True


def test_bounded_running_sum_matches_grouped(spark):
    """bounded_running_sum (one dim-sized window; r15 OPT) must produce
    the exact rows grouped_running_sum produces for the same order and
    values — the swap pettitt made is a plan change, never a value
    change.  Multi-value form and duplicate order keys included."""
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.windows import (
        bounded_running_sum,
        grouped_running_sum,
    )

    rows = [(d % 7, 1, d * 3 % 11) for d in range(200)]
    df = spark.createDataFrame(rows, "k int, one int, v long").withColumn(
        "__one", F.lit(1)
    )
    got = {
        (r.k, r.i, r.u)
        for r in bounded_running_sum(df, ["k", "v"], ["one", "v"], ["i", "u"])
        .select("k", "i", "u")
        .collect()
    }
    want = {
        (r.k, r.i, r.u)
        for r in grouped_running_sum(
            df, "__one", ["k", "v"], ["one", "v"], out_col=["i", "u"]
        )
        .select("k", "i", "u")
        .collect()
    }
    assert got == want and len(got) > 0

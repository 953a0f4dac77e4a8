"""Near-duplicate detection: word-shingles, exact n-gram Jaccard, and
MinHash+LSH banding (BASELINE.json north star: "dedup").

Scale design (the whole point of MinHash+LSH):
- exact all-pairs Jaccard is O(n^2) and impossible at 100 TB;
- the shingle inverted-index join prunes to pairs sharing >=1 shingle —
  correct but still quadratic on hot shingles;
- MinHash compresses each doc to ``num_perm`` hashes (one groupBy), LSH
  bands hash those into buckets, and only bucket-mates are compared:
  the candidate join is an equi-join on (band_idx, band_hash) that
  shuffles signatures, not documents.  Hot buckets are capped via
  ``candidate_pairs(max_bucket_size=...)`` (with
  :func:`oversized_buckets` as the audit log); verification touches
  only candidate pairs.

Determinism: each shingle is hashed ONCE with md5 and split into two
32-bit integer lanes; the ``num_perm`` permutations are affine combos
(a*h1 + b*h2 + c) mod P of those lanes (Broder's one-hash scheme) — 8x
less hashing than per-permutation md5's, and still exactly reproducible
in the DuckDB oracle (see plans/text_analysis.py), not just
statistically similar.  Coefficients keep every intermediate under 2^62,
so 64-bit signed arithmetic never overflows in either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

DEFAULT_NUM_PERM = 8
DEFAULT_BANDS = 4  # 2 rows per band with num_perm=8

# Affine permutation coefficients (a, b, c): a,b < 2^29 so
# a*h1 + b*h2 + c < 2^62 stays inside signed 64-bit in every engine.
# Shared verbatim with the DuckDB oracle — do not change one side only.
MINHASH_P = 4294967311  # prime > 2^32
MINHASH_COEFFS = (
    (413296429, 284119261, 3726124553),
    (266014463, 528778849, 859815721),
    (132897517, 58953955, 2147310211),
    (356912737, 419180981, 1466947859),
    (77954621, 503356423, 3916498763),
    (224667493, 171195667, 670622813),
    (492381107, 309764651, 2629695581),
    (163489741, 448126187, 1811290157),
)


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5) -> DataFrame:
    """Distinct word k-shingles per document: (id, shingle).

    Positions are exploded FIRST and the k-gram is built with plain
    ``slice``/``concat_ws`` on the carried token array — deliberately
    not ``F.transform(sequence, lambda)``: higher-order lambda bodies
    are evaluated interpreted (outside whole-stage codegen), which
    measured ~5x slower at sf0.1 for identical output.  The explode is
    the only row-expansion, and the distinct is a narrow
    pre-aggregation before any join.
    """
    toks = tokens(text_col)
    base = docs.select(F.col(id_col), toks.alias("__tk")).filter(
        F.size("__tk") >= k
    )
    return (
        base.select(
            id_col,
            "__tk",
            F.explode(F.sequence(F.lit(1), F.size("__tk") - (k - 1))).alias("__i"),
        )
        .select(
            id_col,
            F.concat_ws(" ", F.slice("__tk", F.col("__i"), k)).alias("shingle"),
        )
        .distinct()
    )


def positioned_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """(id, pos, shingle) — like :func:`shingles` but KEEPING positions
    and duplicates: the input to span-level analyses (longest shared
    run, exact-substring decontamination) where WHERE a shingle occurs
    matters, not just whether it does.  Same codegen-friendly
    slice/concat_ws construction; ``pos`` is 1-based."""
    toks = tokens(text_col)
    base = docs.select(F.col(id_col), toks.alias("__tk")).filter(
        F.size("__tk") >= k
    )
    return base.select(
        id_col,
        "__tk",
        F.explode(F.sequence(F.lit(1), F.size("__tk") - (k - 1))).alias("pos"),
    ).select(
        id_col,
        "pos",
        F.concat_ws(" ", F.slice("__tk", F.col("pos"), k)).alias("shingle"),
    )


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id", num_perm: int = DEFAULT_NUM_PERM) -> DataFrame:
    """One row per doc with columns h0..h{num_perm-1}: min over the
    doc's shingles of the s-th affine permutation of the shingle's md5
    lanes.  ONE md5 per shingle row (the permutations are integer
    multiply-adds — measured ~2x on the whole LSH pipeline vs. md5 per
    permutation); a single hash-aggregate on id with map-side partial
    mins keeps the shuffle at one row per doc."""
    md = F.md5(F.col("shingle"))
    h1 = F.conv(F.substring(md, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(md, 9, 8), 16, 10).cast("long")
    lanes = sh.select(
        F.col(id_col), h1.alias("__h1"), h2.alias("__h2")
    )
    aggs = [
        F.min(
            (F.lit(a) * F.col("__h1") + F.lit(b) * F.col("__h2") + F.lit(c))
            % F.lit(MINHASH_P)
        ).alias(f"h{s}")
        for s, (a, b, c) in enumerate(MINHASH_COEFFS[:num_perm])
    ]
    return lanes.groupBy(id_col).agg(*aggs)


def lsh_bands(sig: DataFrame, id_col: str = "doc_id", num_perm: int = DEFAULT_NUM_PERM, bands: int = DEFAULT_BANDS) -> DataFrame:
    """Explode each signature into ``bands`` (band_idx, band_hash) rows;
    band_hash = md5 of the ':'-joined member hashes."""
    rows_per_band = num_perm // bands
    entries = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat_ws(
                    ":",
                    *[
                        F.col(f"h{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*entries)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")


def probe_candidates(
    batch_bands: DataFrame,
    corpus_bands: DataFrame,
    batch_id: str = "id_b",
    corpus_id: str = "id_a",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Incremental LSH probe: distinct (corpus doc, batch doc) candidate
    pairs sharing at least one band bucket — the ingestion-time flow
    where a small batch probes a standing corpus band index and the
    join cost scales with the BATCH, not the corpus.

    ``max_bucket_size`` applies the same hot-bucket cap as
    :func:`candidate_pairs`, to the CORPUS side of the index: a
    degenerate band hash (boilerplate corpus) would otherwise pair
    every batch doc with every member of the hot bucket — the quadratic
    blow-up the cap exists to prevent — and, worse, make the
    incremental path diverge from a capped full-dedup run.  Capping the
    corpus index with the identical window-count rule keeps the two
    paths consistent: a bucket dropped from the full self-join is also
    invisible to probes.  Default None preserves exact uncapped
    semantics (the oracle-paired path)."""
    if max_bucket_size is not None:
        w = Window.partitionBy("band_idx", "band_hash")
        corpus_bands = (
            corpus_bands.withColumn("__bsz", F.count(F.lit(1)).over(w))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a = corpus_bands.select(F.col(corpus_id).alias("id_a"), "band_idx", "band_hash")
    b = batch_bands.select(F.col(batch_id).alias("id_b"), "band_idx", "band_hash")
    return b.join(a, ["band_idx", "band_hash"]).select("id_a", "id_b").distinct()


def oversized_buckets(
    bands_df: DataFrame, max_bucket_size: int
) -> DataFrame:
    """(band_idx, band_hash, bucket_size) for every LSH bucket larger
    than ``max_bucket_size`` — the audit companion to
    :func:`candidate_pairs`' cap, so a curation job can count/log what
    the cap suppressed (one aggregation, no collect)."""
    return (
        bands_df.groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
    )


def candidate_pairs(
    bands_df: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one LSH bucket.
    Equi-join on (band_idx, band_hash): only signatures shuffle.

    ``max_bucket_size`` is the hot-bucket cap: a degenerate band hash
    (boilerplate-heavy corpus, all-identical templates) turns one bucket
    into C(n,2) candidate pairs — quadratic exactly where LSH was meant
    to avoid it.  With the cap, buckets larger than ``max_bucket_size``
    are dropped BEFORE the self-join via an unordered window count over
    the same (band_idx, band_hash) keys (one extra shuffle that the join
    then reuses), bounding any bucket's contribution to C(cap, 2).
    Documents in a dropped bucket still pair through their other,
    non-degenerate bands — with OR-amplified banding a true near-dup
    pair rarely shares ONLY the hot bucket.  Use
    :func:`oversized_buckets` to log what was suppressed.  Default None
    preserves exact uncapped semantics (the oracle-paired path)."""
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band_idx", "band_hash")
        bands_df = (
            bands_df.withColumn("__bsz", F.count(F.lit(1)).over(w))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a = bands_df.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_hash"
    )
    b = bands_df.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_hash"
    )
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def shared_shingle_pairs(sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact candidate generation: pairs sharing >=1 shingle (inverted-
    index self-join).  The precise-but-hotter alternative to LSH."""
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    return (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard(pairs: DataFrame, sh: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact Jaccard for each candidate pair: |A ∩ B| / |A ∪ B| over
    distinct shingle sets.

    Formulated over per-doc shingle ARRAYS: one collect_set per doc,
    then two hash joins bring both arrays to the pair row and
    ``array_intersect`` (codegen'd set intersection, not an interpreted
    lambda) scores it — replacing the (pair x shingle) explosion joins +
    re-aggregation of the previous formulation.  Measured ~5x at sf0.1
    with bit-identical output (all-integer sizes, same final division).
    The arrays ride only CANDIDATE pair rows, so the wider shuffle rows
    are bounded by LSH candidate density; per-doc array size is bounded
    by document length, not corpus size."""
    sets = sh.groupBy(id_col).agg(F.collect_set("shingle").alias("__shs"))
    a = sets.select(F.col(id_col).alias("id_a"), F.col("__shs").alias("__sa"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("__shs").alias("__sb"))
    n_common = F.size(F.array_intersect("__sa", "__sb"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                n_common.cast("double")
                / (F.size("__sa") + F.size("__sb") - n_common).cast("double")
            ).alias("jaccard"),
        )
    )


def prefix_filter_pairs(
    sh: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """LOSSLESS candidate pruning for exact Jaccard >= ``threshold``:
    the prefix-filtering principle of the AllPairs / PPJoin family
    (Bayardo et al., WWW'07; Xiao et al., WWW'08).

    Order all shingles by a global total order — ascending document
    frequency, ties by shingle text, so the RAREST shingles come first
    — and keep, per document of set size n, only the first
    ``n - ceil(t*n) + 1`` shingles (its *prefix*).  Any pair with
    Jaccard >= t shares at least one prefix shingle: J >= t implies
    overlap O >= ceil(t*max(|A|,|B|)), and if the order-smallest common
    shingle were outside A's prefix then ALL common shingles would sit
    in A's suffix of size ceil(t*|A|) - 1 < O — contradiction, and
    symmetrically for B.  So the inverted-index self-join over prefixes
    alone loses no qualifying pair, while candidates concentrate on
    RARE shingles: the boilerplate shingle shared by half the corpus —
    the quadratic hot bucket :func:`candidate_pairs` has to cap — lands
    at the END of the order and never generates a candidate unless a
    document consists of almost nothing else.

    Shapes: one aggregate for document frequencies, one broadcast-or-
    shuffle join of df onto the shingle relation, one per-document
    window (doc-sized partitions) for the rank and set size, then the
    same equi-self-join as the uncapped index but over the pruned
    relation.  The df join keys on the shingle — the same distribution
    the self-join needs.  Exactness (unlike the LSH/SimHash tiers, no
    recall loss) makes this the verification-grade similarity join.

    ``shard_col`` (VERDICT r13 #6 — the executable audit-tier scale
    story): when given, ``sh`` must carry that column assigning each
    document to exactly ONE shard; document frequencies, the prefix
    order, and the self-join all key WITHIN the shard, so each shard's
    sort is (n/S) log(n/S) and shards schedule independently —
    flattening the measured alpha~1.13 global-sort superlinearity.
    Cross-shard pairs are not produced BY DESIGN (per-shard exactness:
    losslessness holds within each shard because the prefix principle
    is valid for ANY total shingle order, including per-shard df)."""
    shard_keys = [shard_col] if shard_col else []
    dfc = sh.groupBy(*shard_keys, "shingle").agg(
        F.count(F.lit(1)).alias("__df")
    )
    wn = Window.partitionBy(id_col).orderBy("__df", "shingle")
    wp = Window.partitionBy(id_col)
    ranked = (
        sh.join(dfc, [*shard_keys, "shingle"])
        .withColumn("__rn", F.row_number().over(wn))
        .withColumn("__n", F.count(F.lit(1)).over(wp))
    )
    prefix = ranked.filter(
        F.col("__rn")
        <= F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1
    )
    a = prefix.select(F.col(id_col).alias("id_a"), *shard_keys, "shingle")
    b = prefix.select(F.col(id_col).alias("id_b"), *shard_keys, "shingle")
    return (
        a.join(b, [*shard_keys, "shingle"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

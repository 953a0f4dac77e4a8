"""Oracle-paired similarity-search queries over the ``embeddings`` table
(BASELINE.json north star: "similarity search").

Cosines are computed in double with a fixed fold order on both engines
(verified bit-identical vs DuckDB's list_cosine_similarity) and rounded
to 6 digits at the edge as insurance against platform ulp drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..operators.similarity import blocked_pairs, brute_force_topk, lsh_bucketed_topk
from .relational import _register


@_register(
    "ann_cosine_topk",
    """
    WITH e0 AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    e AS (  -- zero-norm vectors excluded: cosine undefined
        SELECT vec_id, v FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    q AS (SELECT vec_id, v FROM e WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.v, e.v), 6) AS cos_sim
        FROM q JOIN e ON q.vec_id <> e.vec_id
    )
    SELECT query_id, neighbor_id, cos_sim,
           CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, neighbor_id) AS rnk
        FROM scored
    )
    WHERE rnk <= 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for a broadcast query subset
    (vec_id % 100 == 0) — the ground-truth baseline tier."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return brute_force_topk(q, e, k=10).withColumn(
        "rank", F.col("rank").cast("long")
    )


@_register(
    "embedding_near_dup_blocked",
    """
    WITH e0 AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    e AS (  -- zero-norm vectors excluded: cosine undefined
        SELECT vec_id, label, v FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
    """,
)
def embedding_near_dup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, blocked on the label column (the
    cluster/partition key): exact within-block join, cos >= 0.4."""
    e = load(spark, sf_dir, "embeddings")
    return blocked_pairs(e, "label", 0.4)


@_register("ann_lsh_bucketed_topk")  # rows-only: approximate by design
def ann_lsh_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via multi-table random-hyperplane LSH — the
    100 TB tier (bucket once per table in one Arrow matmul, search = one
    equi-join on (table, bucket)).  8 tables x 4 planes OR-amplifies
    recall to a measured >=0.6 floor on the synthetic corpus
    (``tests/test_dedup_similarity.py::test_lsh_recall_against_exact_baseline``);
    single-table at 8 planes measured 0.0 there — the amplification is
    what makes the tier usable, not a tuning nicety."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return lsh_bucketed_topk(q, e, k=10, num_planes=4, n_tables=8)


@_register("ann_ivf_topk")  # rows-only: approximate by design (KMeans cells)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via IVF: KMeans coarse quantizer, nprobe=2 cells
    per query — the clustered alternative to the LSH tier."""
    from ..operators.similarity import ivf_topk

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk(q, e, k=10, n_cells=16, nprobe=2)


@_register("ann_pq_adc_topk")  # rows-only: approximate by design (PQ codebooks)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC cascade tier: product-quantized codes (64 doubles -> 8
    bytes, 64x less state than full vectors, 8x less than int8) prefilter
    10x-oversampled candidates by asymmetric distance, then ONLY those
    pairs are re-scored with the exact squared L2 — the standard
    quantize-prefilter-rerank production shape.  Recall floor + cascade
    monotonicity measured in
    ``tests/test_dedup_similarity.py::test_pq_recall_against_exact_l2_baseline``."""
    from ..operators.similarity import pq_topk

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return pq_topk(q, e, k=10, rerank_oversample=10)


@_register("ann_cosine_topk_vectorized")  # rows-only: numpy fold order differs in last ulp
def ann_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow pandas_udf brute-force tier: numpy batch matrix math instead
    of the Catalyst fold — same candidates, vectorized scoring (exact-fold
    sibling ``ann_cosine_topk`` remains the oracle tier)."""
    from ..operators.similarity import brute_force_topk_vectorized

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    return brute_force_topk_vectorized(q, e, k=10)


@_register(
    "binary_quantize_hamming_topk",
    """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (SELECT vec_id, v FROM e WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               CAST(length(list_filter(list_zip(q.v, e.v),
                           p -> (p[1] > 0) <> (p[2] > 0))) AS BIGINT) AS hamming
        FROM q JOIN e ON q.vec_id <> e.vec_id
    )
    SELECT query_id, neighbor_id, hamming, CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY hamming, neighbor_id) AS rnk
        FROM scored
    )
    WHERE rnk <= 10
    """,
)
def binary_quantize_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-bit embedding quantization + hamming top-10: each 64-dim vector
    packs its sign bits into ONE int64, and per-pair scoring collapses to
    ``bit_count(q XOR c)`` — two ALU ops instead of a 64-float fold, and
    64x less state to broadcast/shuffle.  This is the standard first
    tier of a scale ANN cascade (binary prefilter, exact cosine rerank —
    the rerank tier is `ann_cosine_topk`).  The oracle scores sign
    mismatches directly; packed XOR popcount is bit-for-bit the same
    number."""
    e = load(spark, sf_dir, "embeddings")
    packed = F.expr(
        "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), sequence(0, 63),"
        " (x, i) -> IF(x > 0D, shiftleft(1L, i), 0L)), 0L, (a, b) -> a | b)"
    )
    q = (
        e.filter(F.col("vec_id") % 100 == 0)
        .select(F.col("vec_id").alias("query_id"), packed.alias("qbits"))
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), packed.alias("cbits"))
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.bit_count(F.col("qbits").bitwiseXOR(F.col("cbits")))
        .cast("long")
        .alias("hamming"),
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
    )


@_register(
    "int8_quantized_dot_topk",
    """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    qz AS (
        SELECT vec_id,
               CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
                    THEN list_transform(v, x -> CAST(0 AS BIGINT))
                    ELSE list_transform(v, x -> CAST(floor(
                         127 * x / list_max(list_transform(v, y -> abs(y)))
                         + 0.5) AS BIGINT))
               END AS qv
        FROM e
    ),
    q AS (SELECT vec_id, qv FROM qz WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(list_zip(q.qv, c.qv),
                    p -> p[1] * p[2])) AS BIGINT) AS dot_q
        FROM q JOIN qz c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, dot_q, CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY dot_q DESC, neighbor_id) AS rnk
        FROM scored
    )
    WHERE rnk <= 10
    """,
)
def int8_quantized_dot_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar quantization + integer dot-product top-10 — the
    middle tier of the ANN cascade between the 1-bit Hamming prefilter
    and the exact-double rerank: per-vector symmetric max-abs scale,
    ``floor(127*x/maxabs + 0.5)`` quantization (explicit floor+0.5 so
    both engines round identically), and an all-integer dot product —
    8x less state than doubles to broadcast/shuffle and an exact,
    engine-portable score (no float fold order anywhere).  Zero vectors
    quantize to zeros rather than dividing by zero.  All expressions are
    codegen'd array HOFs; the query side broadcasts, the corpus never
    shuffles."""
    e = load(spark, sf_dir, "embeddings")
    # hoist the max-abs fold into its own column first: referenced from
    # inside the transform lambda it would re-evaluate the d-element
    # aggregate once PER ELEMENT (O(d^2) per vector — Catalyst does not
    # CSE an aggregate across lambda invocations)
    withmax = e.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        F.expr(
            "aggregate(CAST(embedding AS ARRAY<DOUBLE>), 0D,"
            " (a, x) -> greatest(a, abs(x)))"
        ).alias("maxabs"),
    )
    qv = F.expr(
        "CASE WHEN maxabs = 0D THEN transform(v, x -> 0L)"
        " ELSE transform(v, x -> CAST(floor(127 * x / maxabs + 0.5D)"
        " AS BIGINT)) END"
    )
    qz = withmax.select("vec_id", qv.alias("qv"))
    q = qz.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qa")
    )
    scored = (
        qz.select(F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("qb"))
        .join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(
                "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (a, b) -> a + b)"
            ).alias("dot_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dot_q").desc(), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= 10
    )


@_register(
    "embedding_dim_stats",
    """
    WITH ex AS (
        SELECT i - 1 AS dim, CAST(v[i] AS DECIMAL(18,9)) AS x
        FROM (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             LATERAL (SELECT unnest(generate_series(1, len(v))) AS i)
    )
    SELECT dim,
           COUNT(*) AS n,
           ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS mean,
           ROUND(CAST(SUM(x * x) AS DOUBLE) / COUNT(*)
                 - (CAST(SUM(x) AS DOUBLE) / COUNT(*))
                   * (CAST(SUM(x) AS DOUBLE) / COUNT(*)), 6) AS var_pop,
           ROUND(CAST(MIN(x) AS DOUBLE), 6) AS min_x,
           ROUND(CAST(MAX(x) AS DOUBLE), 6) AS max_x
    FROM ex
    GROUP BY dim
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension profile of the embedding table — the vector-column
    data-quality report (dead dimensions show var 0, scale drift shows
    in per-dim min/max, a broken encoder shows as outlier means).
    ``posexplode`` unrolls each vector at the scan into (dim, value)
    with partial aggregation before the 64-group shuffle, so the
    exchange carries 64 x n_partitions partials, never corpus-size
    rows.  Moments accumulate in DECIMAL (order-independent) and the
    mean/variance divisions happen once at the edge in double — the
    same bit-stability discipline as every statistic in the engine."""
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x0")
    ).select("dim", F.col("x0").cast("decimal(18,9)").alias("x"))
    n = F.count(F.lit(1))
    sx = F.sum("x").cast("double")
    sxx = F.sum(F.col("x") * F.col("x")).cast("double")
    return ex.groupBy("dim").agg(
        n.alias("n"),
        F.round(sx / n, 6).alias("mean"),
        F.round(sxx / n - (sx / n) * (sx / n), 6).alias("var_pop"),
        F.round(F.min("x").cast("double"), 6).alias("min_x"),
        F.round(F.max("x").cast("double"), 6).alias("max_x"),
    )


@_register(
    "embedding_norm_outliers",
    """
    WITH ex AS (
        SELECT vec_id, CAST(v[i] AS DECIMAL(18,9)) AS x
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             LATERAL (SELECT unnest(generate_series(1, len(v))) AS i)
    ),
    norms AS (
        SELECT vec_id, ROUND(sqrt(CAST(SUM(x * x) AS DOUBLE)), 6) AS nrm
        FROM ex GROUP BY vec_id
    ),
    med AS (SELECT median(nrm) AS med_norm FROM norms),
    mad AS (
        SELECT med_norm, median(abs(nrm - med_norm)) AS mad_norm
        FROM norms CROSS JOIN med GROUP BY med_norm
    )
    SELECT COUNT(*) AS n_vectors,
           ROUND(ANY_VALUE(med_norm), 6) AS median_norm,
           ROUND(ANY_VALUE(mad_norm), 6) AS mad_norm,
           CAST(COUNT(*) FILTER (
               WHERE abs(nrm - med_norm) > 3 * mad_norm) AS BIGINT) AS n_outliers
    FROM norms CROSS JOIN mad
    """,
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding norm sanity report: L2 norms from EXACT decimal sums of
    squares (explode + group — order-independent; at extreme scale swap
    in the fixed-order array fold, same numbers), then the robust
    median/MAD gate: vectors whose norm sits more than 3 MADs from the
    median are encoder anomalies (truncated writes, fp16 overflow, dead
    models emit near-zero norms).  The median/MAD scalars enter as a
    1-row broadcast (Q15 pattern), so the outlier count is one more
    pass over the small norms relation, never the vectors."""
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x0")
    ).select("vec_id", F.col("x0").cast("decimal(18,9)").alias("x"))
    norms = ex.groupBy("vec_id").agg(
        F.round(F.sqrt(F.sum(F.col("x") * F.col("x")).cast("double")), 6).alias("nrm")
    )
    med = norms.agg(F.median("nrm").alias("med_norm"))
    mad = (
        norms.crossJoin(F.broadcast(med))
        .agg(
            F.first("med_norm").alias("med_norm"),
            F.median(F.abs(F.col("nrm") - F.col("med_norm"))).alias("mad_norm"),
        )
    )
    return (
        norms.crossJoin(F.broadcast(mad))
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.first("med_norm"), 6).alias("median_norm"),
            F.round(F.first("mad_norm"), 6).alias("mad_norm"),
            F.sum(
                F.when(
                    F.abs(F.col("nrm") - F.col("med_norm"))
                    > 3 * F.col("mad_norm"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


@_register(
    "embedding_label_centroids",
    """
    WITH ex AS (
        SELECT label, i - 1 AS pos, CAST(v[i] AS DECIMAL(18,9)) AS x
        FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             LATERAL (SELECT unnest(generate_series(1, len(v))) AS i)
    ),
    sums AS (
        SELECT label, pos, CAST(SUM(x) AS DOUBLE) AS s,
               COUNT(*) AS n
        FROM ex GROUP BY label, pos
    )
    SELECT a.label AS label_a, b.label AS label_b,
           CAST(ANY_VALUE(a.n) AS BIGINT) AS n_a,
           CAST(ANY_VALUE(b.n) AS BIGINT) AS n_b,
           ROUND(SUM(a.s * b.s)
                 / nullif(sqrt(SUM(a.s * a.s) * SUM(b.s * b.s)), 0.0), 6) + 0.0
               AS centroid_cos
    FROM sums a JOIN sums b ON a.pos = b.pos AND a.label < b.label
    GROUP BY a.label, b.label
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label embedding CENTROIDS — the
    geometry probe that tells a curation owner whether two labels
    occupy the same region of embedding space (centroid_cos near 1:
    labels indistinguishable to a linear probe; near 0/negative:
    well-separated clusters).  Complements the logreg
    label-predictability probe with a model-free signal.

    Numeric discipline: the many-row reduction (per-(label, dim) sums)
    accumulates in DECIMAL — exact, order-independent — and cosine is
    computed between the SUM vectors (cosine is scale-invariant, so
    sum and centroid give the identical value and the n-division
    disappears entirely); only the final 64-term dot/norm arithmetic
    runs in double, rounded to 6 at the edge.  Scale shape: posexplode
    with map-side partial aggregation shuffles (#labels x dim)
    partials; the pairwise stage joins two dim-sized frames (#labels x
    dim rows) — nothing pairwise ever touches corpus-sized data."""
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x0"),
    ).select("label", "pos", F.col("x0").cast("decimal(18,9)").alias("x"))
    sums = ex.groupBy("label", "pos").agg(
        F.sum("x").cast("double").alias("s"), F.count(F.lit(1)).alias("n")
    )
    a = sums.select(
        F.col("label").alias("label_a"),
        "pos",
        F.col("s").alias("sa"),
        F.col("n").alias("na"),
    )
    b = sums.select(
        F.col("label").alias("label_b"),
        "pos",
        F.col("s").alias("sb"),
        F.col("n").alias("nb"),
    )
    return (
        a.join(b, "pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.first("na").cast("long").alias("n_a"),
            F.first("nb").cast("long").alias("n_b"),
            # nullif guard: a label whose members cancel exactly has a
            # zero centroid and an UNDEFINED cosine (NULL, not an ANSI
            # crash) — caught by the hostile-embeddings corpus
            (
                F.round(
                    F.sum(F.col("sa") * F.col("sb"))
                    / F.nullif(
                        F.sqrt(
                            F.sum(F.col("sa") * F.col("sa"))
                            * F.sum(F.col("sb") * F.col("sb"))
                        ),
                        F.lit(0.0),
                    ),
                    6,
                )
                + 0.0  # normalize -0.0 (repo convention)
            ).alias("centroid_cos"),
        )
    )


@_register(
    "hard_negative_mining_topk",
    """
    WITH e0 AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    e AS (  -- zero-norm vectors excluded: cosine undefined
        SELECT vec_id, label, v FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    q AS (SELECT vec_id, label, v FROM e WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.vec_id AS query_id, q.label AS query_label,
               e.vec_id AS negative_id, e.label AS negative_label,
               round(list_cosine_similarity(q.v, e.v), 6) AS cos_sim
        FROM q JOIN e ON q.label <> e.label
    )
    SELECT query_id, query_label, negative_id, negative_label, cos_sim,
           CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, negative_id) AS rnk
        FROM scored
    )
    WHERE rnk <= 5
    """,
)
def hard_negative_mining_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector (vec_id % 100 == 0), the top-5 most-similar vectors with a
    DIFFERENT label — the near-miss negatives that make an embedding
    model actually learn boundaries (random negatives are trivially
    easy; the hardest ones sit closest in cosine space).

    Same scale shape as the exact ANN tier: broadcast the query subset,
    hoist norms out of the pairwise fold, per-query rank with a
    deterministic (cos desc, id) tiebreak; the label-inequality
    predicate rides the broadcast join, and at production scale the
    same mining runs on top of the IVF/LSH bucketed tiers by swapping
    the corpus frame."""
    from ..functions.vectors import as_double, dot, norm

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    qv = (
        q.select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            as_double("embedding").alias("qv"),
        )
        .withColumn("qnorm", norm(F.col("qv")))
        .filter(F.col("qnorm") > 0)  # cosine undefined for zero vectors
    )
    cv = (
        e.select(
            F.col("vec_id").alias("negative_id"),
            F.col("label").alias("negative_label"),
            as_double("embedding").alias("cv"),
        )
        .withColumn("cnorm", norm(F.col("cv")))
        .filter(F.col("cnorm") > 0)
    )
    pairs = cv.join(
        F.broadcast(qv), F.col("query_label") != F.col("negative_label")
    ).select(
        "query_id",
        "query_label",
        "negative_id",
        "negative_label",
        F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "negative_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
    )


@_register(
    "embedding_covariance_matrix",
    """
    WITH ex AS (
        SELECT vec_id, i - 1 AS dim, CAST(v[i] AS DECIMAL(18,9)) AS x
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             LATERAL (SELECT unnest(generate_series(1, len(v))) AS i)
    ),
    pairs AS (
        SELECT a.dim AS dim_i, b.dim AS dim_j,
               SUM(a.x * b.x) AS sxy, COUNT(*) AS n
        FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        GROUP BY a.dim, b.dim
    ),
    means AS (
        SELECT dim, CAST(SUM(x) AS DOUBLE) / COUNT(*) AS mu FROM ex GROUP BY dim
    )
    SELECT p.dim_i, p.dim_j,
           ROUND(CAST(p.sxy AS DOUBLE) / p.n - ma.mu * mb.mu, 6) + 0.0 AS cov
    FROM pairs p
    JOIN means ma ON ma.dim = p.dim_i
    JOIN means mb ON mb.dim = p.dim_j
    """,
)
def embedding_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact covariance matrix of the embedding table (upper triangle,
    2,080 rows at dim 64) — the one distributed pass PCA/whitening
    needs: everything after it (eigendecomposition, projection) is
    driver-side math on a dim x dim frame.

    Numeric discipline: cross-moments and means accumulate in DECIMAL
    (exact, order-independent); the divisions and the mu_i*mu_j
    correction run once per output cell in double, rounded at the edge.
    Scale shape: the self-join on vec_id pairs each vector's dims
    WITHIN the row's own explode output (row-local fan-out of
    dim*(dim+1)/2 cells), then hash-aggregates with map-side combine —
    the shuffle carries (#dims^2/2 x partials), never vectors.  At very
    wide dims swap the explode-join for a mapInPandas X^T X per batch
    (numpy reassociates float adds, so that tier trades the exact
    oracle for throughput)."""
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x0"),
    ).select("vec_id", "dim", F.col("x0").cast("decimal(18,9)").alias("x"))
    a = ex.select("vec_id", F.col("dim").alias("dim_i"), F.col("x").alias("xa"))
    b = ex.select("vec_id", F.col("dim").alias("dim_j"), F.col("x").alias("xb"))
    pairs = (
        a.join(b, "vec_id")
        .filter(F.col("dim_i") <= F.col("dim_j"))
        .groupBy("dim_i", "dim_j")
        .agg(
            F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    means = ex.groupBy("dim").agg(
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mu")
    )
    return (
        pairs.join(
            F.broadcast(means.select(F.col("dim").alias("dim_i"), F.col("mu").alias("mu_i"))),
            "dim_i",
        )
        .join(
            F.broadcast(means.select(F.col("dim").alias("dim_j"), F.col("mu").alias("mu_j"))),
            "dim_j",
        )
        .select(
            "dim_i",
            "dim_j",
            (
                F.round(
                    F.col("sxy").cast("double") / F.col("n")
                    - F.col("mu_i") * F.col("mu_j"),
                    6,
                )
                + 0.0  # normalize -0.0 (repo convention, see grouped_zscore)
            ).alias("cov"),
        )
    )


@_register("embedding_pca_projection")  # rows-only: eigendecomposition has no SQL twin
def embedding_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of every embedding onto the top-2 principal
    components — the whitening/visualization step after
    ``embedding_covariance_matrix``.  Division of labor at 100 TB: the
    covariance matrix is the ONE distributed pass (exact DECIMAL
    moments, dim x dim output); the eigendecomposition happens on the
    driver over that 64x64 frame (numpy ``eigh`` — symmetric, stable);
    the top components broadcast back as plan literals and the
    projection is a per-row dot fold at scan speed.  Registered
    rows-only (an eigensolver has no ANSI-SQL twin); component-sign
    ambiguity is fixed by forcing each eigenvector's
    largest-magnitude entry positive, so output is deterministic.
    Quality contract (tests/test_dedup_similarity.py): projected
    variances match the top eigenvalues and the components are
    orthonormal."""
    import numpy as np

    cov_rows = embedding_covariance_matrix(spark, sf_dir).collect()
    dim = max(r.dim_j for r in cov_rows) + 1
    C = np.zeros((dim, dim))
    for r in cov_rows:
        C[r.dim_i, r.dim_j] = C[r.dim_j, r.dim_i] = r.cov
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:2]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        if abs(v.min()) > abs(v.max()):  # sign convention: dominant entry > 0
            v = -v
        comps.append(v)

    e = load(spark, sf_dir, "embeddings")
    proj_cols = []
    for c_i, v in enumerate(comps):
        arr = F.array(*[F.lit(float(x)) for x in v])
        proj_cols.append(
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("embedding").cast("array<double>"),
                        arr,
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias(f"pc{c_i + 1}")
        )
    return e.select("vec_id", "label", *proj_cols)


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal rank fusion of dense + sparse retrievers.
# ---------------------------------------------------------------------------

_HYBRID_ORACLE = """
WITH tok AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '[ \\t\\n\\x0B\\f\\r]+') AS tokens
    FROM documents
),
tl AS (SELECT doc_id, unnest(tokens) AS token FROM tok),
tld AS (SELECT DISTINCT doc_id, token FROM tl),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
dfreq AS (SELECT token, COUNT(*) AS n_df FROM tld GROUP BY token),
idf AS (
    SELECT token,
           CAST(round(ln((n.n_docs + 1.0) / (dfreq.n_df + 1.0)), 6)
                AS DECIMAL(18,6)) AS idf
    FROM dfreq CROSS JOIN n
),
qt AS (SELECT doc_id AS query_id, token FROM tld WHERE doc_id % 100 = 0),
sscore AS (
    SELECT qt.query_id, tld.doc_id, SUM(idf.idf) AS score
    FROM qt
    JOIN tld ON tld.token = qt.token AND tld.doc_id <> qt.query_id
    JOIN idf ON idf.token = qt.token
    GROUP BY qt.query_id, tld.doc_id
),
sparse AS (
    SELECT query_id, doc_id, rnk AS rank_sparse FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS rnk
        FROM sscore) WHERE rnk <= 20
),
e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
e AS (SELECT vec_id, v FROM e0
      WHERE list_sum(list_transform(v, x -> x * x)) > 0),
q AS (SELECT vec_id, v FROM e WHERE vec_id % 100 = 0),
dscored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
           round(list_cosine_similarity(q.v, e.v), 6) AS cos_sim
    FROM q JOIN e ON q.vec_id <> e.vec_id
),
dense AS (
    SELECT query_id, doc_id, rnk AS rank_dense FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, doc_id) AS rnk
        FROM dscored) WHERE rnk <= 20
),
fused AS (
    SELECT COALESCE(d.query_id, s.query_id) AS query_id,
           COALESCE(d.doc_id, s.doc_id) AS doc_id,
           d.rank_dense, s.rank_sparse,
           round(COALESCE(1.0 / (60 + d.rank_dense), 0.0)
                 + COALESCE(1.0 / (60 + s.rank_sparse), 0.0), 6) AS rrf_score
    FROM dense d
    FULL OUTER JOIN sparse s
      ON d.query_id = s.query_id AND d.doc_id = s.doc_id
)
SELECT query_id, doc_id, rrf_score,
       CAST(rank_dense AS BIGINT) AS rank_dense,
       CAST(rank_sparse AS BIGINT) AS rank_sparse,
       CAST(rnk AS BIGINT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, doc_id) AS rnk
      FROM fused)
WHERE rnk <= 10
"""


@_register("hybrid_search_rrf", _HYBRID_ORACLE)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal rank fusion (RRF, k=60): fuse an
    exact dense retriever (cosine top-20, :func:`brute_force_topk`) with
    a sparse lexical retriever (summed IDF of shared distinct tokens,
    top-20) — the standard two-tower RAG recall stack, where RRF needs
    only RANKS so the two retrievers' incomparable score scales never
    have to be calibrated.

    Portability: each per-token IDF rounds to 6 digits THEN casts to
    DECIMAL(18,6) before the per-(query, doc) SUM, so the sparse score
    is summation-order-exact on both engines (the float-sum-order rule
    from plans/relational); the RRF score is a two-term sum of exact
    divisions, rounded at the edge; every rank order carries a doc_id
    tiebreak.

    Scale shape: the sparse side is an inverted-index equi-join on
    token (query tokens are a broadcast-sized relation — #queries x
    avg doc length), with IDF joined on the same token key; the dense
    side broadcasts queries through one corpus scan.  Fusion is a
    full-outer join of two top-k relations (bounded: #queries x k
    each) — trivially broadcastable; nothing in the fusion touches the
    corpus again."""
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    from ..functions import text as TX

    dense = (
        brute_force_topk(e.filter(F.col("vec_id") % 100 == 0), e, k=20)
        .select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("rank_dense"),
        )
    )
    tld = d.select("doc_id", F.explode(TX.tokens("text")).alias("token")).distinct()
    n_docs = d.count()
    idf = (
        tld.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_df"))
        .select(
            "token",
            F.round(F.log((F.lit(n_docs) + 1.0) / (F.col("n_df") + 1.0)), 6)
            .cast("decimal(18,6)")
            .alias("idf"),
        )
    )
    qt = tld.filter(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("query_id"), "token"
    )
    sscore = (
        qt.join(tld, "token")
        .filter(F.col("query_id") != F.col("doc_id"))
        .join(idf, "token")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("idf").alias("score"))
    )
    ws = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    sparse = (
        sscore.withColumn("rank_sparse", F.row_number().over(ws))
        .filter(F.col("rank_sparse") <= 20)
        .select("query_id", "doc_id", "rank_sparse")
    )
    fused = dense.join(sparse, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf_score",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rank_dense")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rank_sparse")), F.lit(0.0)),
            6,
        ),
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id",
            "doc_id",
            "rrf_score",
            F.col("rank_dense").cast("long").alias("rank_dense"),
            F.col("rank_sparse").cast("long").alias("rank_sparse"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# MMR diversified reranking — greedy relevance-vs-redundancy selection
# over the exact top-k candidate pool (Carbonell & Goldstein 1998).
# ---------------------------------------------------------------------------

_MMR_K = 5  # picks per query
_MMR_POOL = 10  # candidate pool: the exact cosine top-10


def _mmr_steps_sql(k: int) -> str:
    """Unrolled greedy MMR steps (the k-core/coverage recursion-free CTE
    convention): sel1 is the pure-relevance argmax; each later step
    scores every remaining candidate as 0.5*rel - 0.5*max(sim to the
    already-selected set) and takes the per-query argmax with
    (score DESC, cand) tie-break."""
    ctes = [
        "sel1 AS (SELECT query_id, neighbor_id AS cand, cos_sim AS rel,"
        " 0.5 * cos_sim AS score FROM pool WHERE rnk = 1)",
        "all1 AS (SELECT query_id, cand, rel, score, 1 AS step FROM sel1)",
        "rem1 AS (SELECT query_id, neighbor_id AS cand, cos_sim AS rel"
        " FROM pool WHERE rnk > 1)",
    ]
    for i in range(2, k + 1):
        p = i - 1
        ctes.append(
            f"sc{i} AS (SELECT r.query_id, r.cand, r.rel,"
            f" 0.5 * r.rel - 0.5 * MAX(ps.sim) AS score"
            f" FROM rem{p} r"
            f" JOIN pairsim ps ON ps.query_id = r.query_id AND ps.cand = r.cand"
            f" JOIN all{p} s ON s.query_id = ps.query_id AND s.cand = ps.other"
            f" GROUP BY r.query_id, r.cand, r.rel)"
        )
        ctes.append(
            f"sel{i} AS (SELECT query_id, cand, rel, score FROM ("
            f"SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id"
            f" ORDER BY score DESC, cand) AS rn FROM sc{i}) WHERE rn = 1)"
        )
        ctes.append(
            f"all{i} AS (SELECT * FROM all{p} UNION ALL"
            f" SELECT query_id, cand, rel, score, {i} AS step FROM sel{i})"
        )
        if i < k:
            ctes.append(
                f"rem{i} AS (SELECT r.* FROM rem{p} r WHERE NOT EXISTS ("
                f"SELECT 1 FROM sel{i} s"
                f" WHERE s.query_id = r.query_id AND s.cand = r.cand))"
            )
    return ",\n    ".join(ctes)


@_register(
    "mmr_rerank_topk",
    f"""
    WITH e0 AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    e AS (
        SELECT vec_id, v FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    q AS (SELECT vec_id, v FROM e WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.v, e.v), 6) AS cos_sim
        FROM q JOIN e ON q.vec_id <> e.vec_id
    ),
    pool AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY cos_sim DESC, neighbor_id) AS rnk
            FROM scored
        ) WHERE rnk <= {_MMR_POOL}
    ),
    pairsim AS (
        SELECT p1.query_id, p1.neighbor_id AS cand, p2.neighbor_id AS other,
               round(list_cosine_similarity(e1.v, e2.v), 6) AS sim
        FROM pool p1
        JOIN pool p2 ON p1.query_id = p2.query_id
                    AND p1.neighbor_id <> p2.neighbor_id
        JOIN e e1 ON e1.vec_id = p1.neighbor_id
        JOIN e e2 ON e2.vec_id = p2.neighbor_id
    ),
    {_mmr_steps_sql(_MMR_K)}
    SELECT query_id, cand AS neighbor_id, CAST(step AS BIGINT) AS step,
           rel AS cos_sim, score
    FROM all{_MMR_K}
    """,
)
def mmr_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance reranking: from each query's EXACT
    cosine top-10 pool, greedily select 5 results balancing relevance
    against redundancy — step score = 0.5*rel - 0.5*max(sim to the
    already-selected set), ties to the lower neighbor id.  The
    embedding-space diversifier next to the quota-based
    ``diversified_topk_docs``: quota diversifies by a metadata column,
    MMR by the geometry itself (two near-identical top hits can't both
    be shown).

    Fully LAZY grouped greedy — no collect, all queries advance in the
    same step: the per-query argmax is a row_number-over-window pick
    (the same 1-row-per-group shape every step), and each step's
    anti-join drops that pick from the remaining pool.  Candidate
    pairwise sims are computed ONCE over the pooled pairs (<= 90 per
    query) and checkpointed for the k - 1 scoring steps; picks and
    remainders ``localCheckpoint(eager=True)`` per round (the
    greedy-coverage / k-core convention) so the plan tree stays
    constant-size across steps instead of compounding.

    Scale shape: the only corpus-sized work is the pool build (the
    broadcast brute-force tier — swap in the LSH/IVF tier for the
    100 TB pool and everything downstream is unchanged); MMR itself
    touches pool-sized relations only: pairsim is |Q| x pool^2 rows,
    each step one pool-sized shuffle.  Cosines round to 6dp at the
    edge (module convention); the MMR score itself is left UNROUNDED —
    0.5*rel - 0.5*maxsim over already-rounded inputs is the same single
    IEEE op on both engines (bit-identical), whereas re-rounding a
    computed double hits half-boundary disagreements (observed at
    sf0.01: ...4745 rounding differently), so both engines score and
    therefore pick identically."""
    from ..functions.vectors import as_double, dot, norm

    e0 = load(spark, sf_dir, "embeddings")
    q = e0.filter(F.col("vec_id") % 100 == 0)
    pool = brute_force_topk(q, e0, k=_MMR_POOL).localCheckpoint(eager=True)
    ev = (
        e0.select("vec_id", as_double("embedding").alias("v"))
        .withColumn("n", norm(F.col("v")))
        .filter(F.col("n") > 0)
    )
    pa, pb = pool.alias("pa"), pool.alias("pb")
    pairsim = (
        pa.join(
            pb,
            (F.col("pa.query_id") == F.col("pb.query_id"))
            & (F.col("pa.neighbor_id") != F.col("pb.neighbor_id")),
        )
        .select(
            F.col("pa.query_id").alias("query_id"),
            F.col("pa.neighbor_id").alias("cand"),
            F.col("pb.neighbor_id").alias("other"),
        )
        .join(
            ev.select(
                F.col("vec_id").alias("cand"),
                F.col("v").alias("va"),
                F.col("n").alias("na"),
            ),
            "cand",
        )
        .join(
            ev.select(
                F.col("vec_id").alias("other"),
                F.col("v").alias("vb"),
                F.col("n").alias("nb"),
            ),
            "other",
        )
        .select(
            "query_id",
            "cand",
            "other",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )

    all_sel = pool.filter(F.col("rank") == 1).select(
        "query_id",
        F.col("neighbor_id").alias("cand"),
        F.col("cos_sim").alias("rel"),
        (F.lit(0.5) * F.col("cos_sim")).alias("score"),
        F.lit(1).cast("long").alias("step"),
    )
    remaining = pool.filter(F.col("rank") > 1).select(
        "query_id",
        F.col("neighbor_id").alias("cand"),
        F.col("cos_sim").alias("rel"),
    )
    for step in range(2, _MMR_K + 1):
        sc = (
            remaining.join(pairsim, ["query_id", "cand"])
            .join(
                all_sel.select(
                    "query_id", F.col("cand").alias("other")
                ),
                ["query_id", "other"],
            )
            .groupBy("query_id", "cand", "rel")
            .agg(F.max("sim").alias("maxsim"))
            .select(
                "query_id",
                "cand",
                "rel",
                (
                    F.lit(0.5) * F.col("rel") - F.lit(0.5) * F.col("maxsim")
                ).alias("score"),
            )
        )
        wpick = Window.partitionBy("query_id").orderBy(
            F.desc("score"), "cand"
        )
        pick = (
            sc.withColumn("rn", F.row_number().over(wpick))
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                "cand",
                "rel",
                "score",
                F.lit(step).cast("long").alias("step"),
            )
            .localCheckpoint(eager=True)
        )
        all_sel = all_sel.unionByName(pick)
        if step < _MMR_K:
            remaining = remaining.join(
                pick.select("query_id", "cand"),
                ["query_id", "cand"],
                "left_anti",
            ).localCheckpoint(eager=True)
    return all_sel.select(
        "query_id",
        F.col("cand").alias("neighbor_id"),
        "step",
        F.col("rel").alias("cos_sim"),
        "score",
    )


# ---------------------------------------------------------------------------
# Quantization quality gate — recall@10 of the int8 tier against the
# exact baseline, as an oracle-paired query (both tiers are exact
# deterministic math, so the EVALUATION is itself exactly checkable).
# ---------------------------------------------------------------------------


@_register(
    "int8_recall_vs_exact",
    """
    WITH e0 AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    e AS (
        SELECT vec_id, v FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    q AS (SELECT vec_id, v FROM e WHERE vec_id % 100 = 0),
    exact_scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.v, e.v), 6) AS cos_sim
        FROM q JOIN e ON q.vec_id <> e.vec_id
    ),
    exact_top AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rnk
            FROM exact_scored
        ) WHERE rnk <= 10
    ),
    qz AS (
        SELECT vec_id,
               CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
                    THEN list_transform(v, x -> CAST(0 AS BIGINT))
                    ELSE list_transform(v, x -> CAST(floor(
                         127 * x / list_max(list_transform(v, y -> abs(y)))
                         + 0.5) AS BIGINT))
               END AS qv
        FROM e0
    ),
    qq AS (SELECT vec_id, qv FROM qz WHERE vec_id % 100 = 0),
    int8_scored AS (
        SELECT qq.vec_id AS query_id, c.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(list_zip(qq.qv, c.qv),
                    p -> p[1] * p[2])) AS BIGINT) AS dot_q
        FROM qq JOIN qz c ON qq.vec_id <> c.vec_id
    ),
    int8_top AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY dot_q DESC, neighbor_id) AS rnk
            FROM int8_scored
        ) WHERE rnk <= 10
    ),
    per_q AS (
        SELECT x.query_id,
               COUNT(*) AS n_exact,
               SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS n_overlap
        FROM exact_top x
        LEFT JOIN int8_top i
          ON i.query_id = x.query_id AND i.neighbor_id = x.neighbor_id
        GROUP BY x.query_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           round(CAST(SUM(n_overlap) AS DOUBLE) / SUM(n_exact), 6)
             AS mean_recall_at_10,
           CAST(MIN(n_overlap) AS BIGINT) AS min_overlap,
           CAST(SUM(CASE WHEN n_overlap = n_exact THEN 1 ELSE 0 END) AS BIGINT)
             AS n_perfect
    FROM per_q
    """,
)
def int8_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the int8 scalar-quantized tier against the exact
    cosine baseline — the quantization quality gate a vector platform
    runs before switching traffic to a cheaper tier.  Because BOTH
    tiers are deterministic exact arithmetic (integer dots; cosine
    rounded at the edge), the evaluation itself is oracle-checkable —
    unlike the LSH/IVF tiers, whose float-matmul bucket boundaries are
    the documented reason they stay rows-only with recall asserted in
    tests instead.

    Pure composition: the two registered top-10 queries joined on
    (query, neighbor), micro-averaged recall = Σ overlap / Σ |exact|
    (one exact integer division at the edge).  Queries whose exact
    baseline excludes them (zero-norm) are absent from both sides; the
    int8 candidate set intentionally includes zero vectors (they
    quantize to zeros and rank last), matching each tier's registered
    semantics exactly."""
    exact_top = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    i8_top = int8_quantized_dot_topk(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("i8_neighbor")
    )
    per_q = (
        exact_top.join(
            i8_top,
            (exact_top["query_id"] == i8_top["query_id"])
            & (exact_top["neighbor_id"] == i8_top["i8_neighbor"]),
            "left",
        )
        .select(
            exact_top["query_id"].alias("qid"),
            F.col("i8_neighbor").isNotNull().cast("int").alias("hit"),
        )
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum("hit").alias("n_overlap"),
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(
            F.sum("n_overlap").cast("double") / F.sum("n_exact"), 6
        ).alias("mean_recall_at_10"),
        F.min("n_overlap").cast("long").alias("min_overlap"),
        F.sum(
            F.when(F.col("n_overlap") == F.col("n_exact"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_perfect"),
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation gate — how much recall does searching on the
# first 16 of 64 dimensions keep?  The dimension-reduction twin of the
# int8 quantization gate.
# ---------------------------------------------------------------------------

_MRL_DIMS = 16


@_register(
    "matryoshka_truncation_recall",
    f"""
    WITH e0 AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    e AS (
        SELECT vec_id, v FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    q AS (SELECT vec_id, v FROM e WHERE vec_id % 100 = 0),
    exact_top AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rnk
            FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       round(list_cosine_similarity(q.v, e.v), 6) AS cos_sim
                FROM q JOIN e ON q.vec_id <> e.vec_id
            )
        ) WHERE rnk <= 10
    ),
    t0 AS (
        SELECT vec_id, v[1:{_MRL_DIMS}] AS tv FROM e0
    ),
    t AS (
        SELECT vec_id, tv FROM t0
        WHERE list_sum(list_transform(tv, x -> x * x)) > 0
    ),
    tq AS (SELECT vec_id, tv FROM t WHERE vec_id % 100 = 0),
    trunc_top AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rnk
            FROM (
                SELECT tq.vec_id AS query_id, t.vec_id AS neighbor_id,
                       round(list_cosine_similarity(tq.tv, t.tv), 6) AS cos_sim
                FROM tq JOIN t ON tq.vec_id <> t.vec_id
            )
        ) WHERE rnk <= 10
    ),
    per_q AS (
        SELECT x.query_id,
               COUNT(*) AS n_exact,
               SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS n_overlap
        FROM exact_top x
        LEFT JOIN trunc_top i
          ON i.query_id = x.query_id AND i.neighbor_id = x.neighbor_id
        GROUP BY x.query_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           round(CAST(SUM(n_overlap) AS DOUBLE) / SUM(n_exact), 6)
             AS mean_recall_at_10,
           CAST(MIN(n_overlap) AS BIGINT) AS min_overlap,
           CAST(SUM(CASE WHEN n_overlap = n_exact THEN 1 ELSE 0 END) AS BIGINT)
             AS n_perfect
    FROM per_q
    """,
)
def matryoshka_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of exact cosine search on the FIRST {d} of 64
    dimensions against full-dimension exact search — the
    Matryoshka-style truncation gate (4x less vector state to
    broadcast/scan) a platform evaluates next to the int8 gate
    (``int8_recall_vs_exact``): quantize the values, or drop the tail
    dims?  Both tiers here are exact deterministic arithmetic
    (edge-rounded cosine), so the evaluation is oracle-checkable.

    The truncation is a scan-side ``slice``; each side carries its OWN
    zero-norm exclusion (a vector can be zero in its first {d} dims yet
    nonzero overall — such corpus rows simply cannot be truncated-tier
    candidates, on both engines identically); the overlap join and
    micro-averaged recall follow the int8 gate's exact pattern."""
    e0 = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sq_norm = "aggregate({c}, 0D, (a, x) -> a + x * x)"
    e = e0.filter(F.expr(sq_norm.format(c="v")) > 0)
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cos = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (a, b) -> a + b)"
        " / (sqrt(aggregate({a}, 0D, (a, x) -> a + x * x))"
        "    * sqrt(aggregate({b}, 0D, (a, x) -> a + x * x)))"
    )
    exact_scored = (
        e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))
        .join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.expr(cos.format(a="qv", b="cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    exact_top = (
        exact_scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("query_id", "neighbor_id")
    )
    t0 = e0.select("vec_id", F.slice("v", 1, _MRL_DIMS).alias("tv"))
    t = t0.filter(F.expr(sq_norm.format(c="tv")) > 0)
    tq = t.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("tv").alias("qtv")
    )
    trunc_scored = (
        t.select(F.col("vec_id").alias("neighbor_id"), F.col("tv").alias("ctv"))
        .join(F.broadcast(tq), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.expr(cos.format(a="qtv", b="ctv")), 6).alias("cos_sim"),
        )
    )
    trunc_top = (
        trunc_scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select("query_id", F.col("neighbor_id").alias("t_neighbor"))
    )
    per_q = (
        exact_top.join(
            trunc_top,
            (exact_top["query_id"] == trunc_top["query_id"])
            & (exact_top["neighbor_id"] == trunc_top["t_neighbor"]),
            "left",
        )
        .select(
            exact_top["query_id"].alias("qid"),
            F.col("t_neighbor").isNotNull().cast("int").alias("hit"),
        )
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum("hit").alias("n_overlap"),
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(
            F.sum("n_overlap").cast("double") / F.sum("n_exact"), 6
        ).alias("mean_recall_at_10"),
        F.min("n_overlap").cast("long").alias("min_overlap"),
        F.sum(
            F.when(F.col("n_overlap") == F.col("n_exact"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_perfect"),
    )


matryoshka_truncation_recall.__doc__ = matryoshka_truncation_recall.__doc__.format(
    d=_MRL_DIMS
)


# ---------------------------------------------------------------------------
# Label-noise screen — vectors closer to ANOTHER label's centroid than
# to their own (leave-one-out) centroid: the mislabeled-example detector.
# ---------------------------------------------------------------------------


@_register(
    "label_noise_centroid_disagreement",
    """
    WITH ex AS (
        SELECT vec_id, label, i - 1 AS pos, CAST(v[i] AS DECIMAL(18,9)) AS x
        FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
             LATERAL (SELECT unnest(generate_series(1, len(v))) AS i)
    ),
    csums AS (
        SELECT label, pos, SUM(x) AS s FROM ex GROUP BY label, pos
    ),
    cnorm AS (
        SELECT label, CAST(SUM(s * s) AS DOUBLE) AS s2, n FROM csums
        JOIN (SELECT label AS l2, COUNT(DISTINCT vec_id) AS n
              FROM ex GROUP BY 1) ON l2 = label
        GROUP BY label, n
    ),
    vnorm AS (
        SELECT vec_id, CAST(SUM(x * x) AS DOUBLE) AS v2 FROM ex GROUP BY vec_id
    ),
    dots AS (
        SELECT e.vec_id, e.label AS own_label, c.label AS cand_label,
               CAST(SUM(e.x * c.s) AS DOUBLE) AS vd
        FROM ex e JOIN csums c ON c.pos = e.pos
        GROUP BY e.vec_id, e.label, c.label
    ),
    scored AS (
        SELECT d.vec_id, d.own_label, d.cand_label,
               CASE
                 WHEN d.cand_label = d.own_label THEN
                   -- leave-one-out: cos(v, S_own - v) without materializing
                   -- the subtraction: dot = vd - v2, |S-v|^2 = s2 - 2vd + v2
                   CASE WHEN (c.s2 - 2 * d.vd + w.v2) > 0 AND w.v2 > 0
                        THEN round((d.vd - w.v2)
                             / sqrt(w.v2 * (c.s2 - 2 * d.vd + w.v2)), 6)
                        ELSE NULL END
                 ELSE
                   CASE WHEN c.s2 > 0 AND w.v2 > 0
                        THEN round(d.vd / sqrt(w.v2 * c.s2), 6)
                        ELSE NULL END
               END AS cos_c
        FROM dots d
        JOIN cnorm c ON c.label = d.cand_label
        JOIN vnorm w ON w.vec_id = d.vec_id
    ),
    per_vec AS (
        SELECT vec_id, own_label,
               MAX(CASE WHEN cand_label = own_label THEN cos_c END) AS own_cos,
               MAX(CASE WHEN cand_label <> own_label THEN cos_c END) AS best_other
        FROM scored GROUP BY vec_id, own_label
    )
    SELECT own_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(CASE WHEN own_cos IS NOT NULL AND best_other IS NOT NULL
                          AND best_other > own_cos THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(SUM(CASE WHEN own_cos IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_undefined
    FROM per_vec GROUP BY own_label
    """,
)
def label_noise_centroid_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabeled-example screen: per label, how many vectors sit
    closer (cosine) to ANOTHER label's centroid than to their own
    label's LEAVE-ONE-OUT centroid — the cheap model-free noise
    detector run before training on labeled embeddings (confident-
    learning's geometric baby sibling).

    The LOO subtraction never materializes: cos(v, S−v) expands to
    (⟨v,S⟩ − |v|²) / √(|v|²(|S|² − 2⟨v,S⟩ + |v|²)), so the whole
    computation needs only per-vector dots against the #labels sum
    vectors, |v|², and per-label |S|² — all accumulated in DECIMAL
    (exact, order-independent), doubles only in the final rounded
    formula.  Flag comparison happens on the ROUNDED values so a
    sub-6dp tie cannot split across engines.  Singleton labels and
    zero vectors yield NULL own-cosine and are reported in
    n_undefined, never flagged.

    Scale shape: the dots relation is corpus x #labels rows from ONE
    broadcast-joined explode (label sums are #labels x dim — tiny);
    everything after is per-vec/per-label contractions."""
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x0"),
    ).select("vec_id", "label", "pos", F.col("x0").cast("decimal(18,9)").alias("x"))
    csums = ex.groupBy("label", "pos").agg(F.sum("x").alias("s"))
    cnorm = csums.groupBy("label").agg(
        F.sum(F.col("s") * F.col("s")).cast("double").alias("s2")
    )
    vnorm = ex.groupBy("vec_id").agg(
        F.sum(F.col("x") * F.col("x")).cast("double").alias("v2")
    )
    dots = (
        ex.join(
            F.broadcast(csums.select(F.col("label").alias("cand_label"), "pos", "s")),
            "pos",
        )
        .groupBy("vec_id", F.col("label").alias("own_label"), "cand_label")
        .agg(F.sum(F.col("x") * F.col("s")).cast("double").alias("vd"))
    )
    loo_den = F.col("s2") - 2 * F.col("vd") + F.col("v2")
    own_cos = F.when(
        (loo_den > 0) & (F.col("v2") > 0),
        F.round((F.col("vd") - F.col("v2")) / F.sqrt(F.col("v2") * loo_den), 6),
    )
    other_cos = F.when(
        (F.col("s2") > 0) & (F.col("v2") > 0),
        F.round(F.col("vd") / F.sqrt(F.col("v2") * F.col("s2")), 6),
    )
    scored = (
        dots.join(F.broadcast(cnorm), dots["cand_label"] == cnorm["label"])
        .join(vnorm, "vec_id")  # corpus-sized: a real co-partitioned join
        .select(
            "vec_id",
            "own_label",
            "cand_label",
            F.when(F.col("cand_label") == F.col("own_label"), own_cos)
            .otherwise(other_cos)
            .alias("cos_c"),
        )
    )
    per_vec = scored.groupBy("vec_id", "own_label").agg(
        F.max(
            F.when(F.col("cand_label") == F.col("own_label"), F.col("cos_c"))
        ).alias("own_cos"),
        F.max(
            F.when(F.col("cand_label") != F.col("own_label"), F.col("cos_c"))
        ).alias("best_other"),
    )
    return per_vec.groupBy(F.col("own_label").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum(
            F.when(
                F.col("own_cos").isNotNull()
                & F.col("best_other").isNotNull()
                & (F.col("best_other") > F.col("own_cos")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_flagged"),
        F.sum(F.when(F.col("own_cos").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_undefined"),
    )


# ---------------------------------------------------------------------------
# Fusion quality gate — MRR of the RRF-fused list judged against the
# exact dense top-10: does adding the sparse leg bury dense-relevant
# results?
# ---------------------------------------------------------------------------


@_register(
    "rrf_mrr_vs_dense",
    f"""
    WITH fused AS (
        SELECT query_id, doc_id AS neighbor_id, rank
        FROM ({_HYBRID_ORACLE})
    ),
    e0 AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    e AS (
        SELECT vec_id, v FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    q AS (SELECT vec_id, v FROM e WHERE vec_id % 100 = 0),
    exact_top AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rnk
            FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       round(list_cosine_similarity(q.v, e.v), 6) AS cos_sim
                FROM q JOIN e ON q.vec_id <> e.vec_id
            )
        ) WHERE rnk <= 10
    ),
    firsts AS (
        SELECT x.query_id, MIN(f.rank) AS first_rank
        FROM exact_top x
        LEFT JOIN fused f
          ON f.query_id = x.query_id AND f.neighbor_id = x.neighbor_id
        GROUP BY x.query_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN first_rank IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_misses,
           round(CAST(SUM(CASE WHEN first_rank IS NOT NULL
                               THEN CAST(round(1.0 / first_rank, 12)
                                         AS DECIMAL(14,12))
                               ELSE CAST(0 AS DECIMAL(14,12)) END)
                      AS DOUBLE) / COUNT(*), 6) AS mrr
    FROM firsts
    """,
)
def rrf_mrr_vs_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of the RRF-fused retrieval list judged
    against the exact dense top-10 as relevance: how quickly does the
    fused ranking surface a dense-relevant document?  MRR near 1 means
    fusion preserves the dense head; a drop means the sparse leg buries
    it — the fusion-regression gate run before shipping a hybrid stack.

    Exactness: each query's reciprocal rank is 1/first_rank ROUNDED TO
    12 digits then cast DECIMAL(14,12) BEFORE the cross-query sum —
    1/rank is a deterministic double on both engines, and the decimal
    sum is order-independent where a plain SUM of doubles would
    accumulate in engine-dependent order (the repo's mean-of-ratios
    rule).  Queries whose fused list misses all dense-relevant docs
    contribute 0 and are counted in n_misses.  Everything upstream is
    the two registered queries composed on their (query, neighbor)
    keys."""
    fused = hybrid_search_rrf(spark, sf_dir).select(
        "query_id", F.col("doc_id").alias("f_neighbor"), "rank"
    )
    exact_top = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    firsts = (
        exact_top.join(
            fused,
            (exact_top["query_id"] == fused["query_id"])
            & (exact_top["neighbor_id"] == fused["f_neighbor"]),
            "left",
        )
        .select(exact_top["query_id"].alias("qid"), "rank")
        .groupBy("qid")
        .agg(F.min("rank").alias("first_rank"))
    )
    rr = F.when(
        F.col("first_rank").isNotNull(),
        F.round(F.lit(1.0) / F.col("first_rank"), 12).cast("decimal(14,12)"),
    ).otherwise(F.lit(0).cast("decimal(14,12)"))
    return firsts.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum(F.when(F.col("first_rank").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_misses"),
        F.round(F.sum(rr).cast("double") / F.count(F.lit(1)), 6).alias("mrr"),
    )


# ---------------------------------------------------------------------------
# IVF probe-recall curve over DETERMINISTIC label-centroid cells.
# ---------------------------------------------------------------------------


@_register(
    "ivf_label_cells_recall_curve",
    """
    WITH e0 AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
    ),
    e AS (
        SELECT vec_id, v, label FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    q AS (SELECT vec_id, v FROM e WHERE vec_id % 100 = 0),
    exact_scored AS (
        SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.v, e.v), 6) AS cos_sim
        FROM q JOIN e ON q.vec_id <> e.vec_id
    ),
    exact_top AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rnk
            FROM exact_scored
        ) WHERE rnk <= 10
    ),
    ex AS (
        SELECT label, i - 1 AS pos, CAST(v[i] AS DECIMAL(18,9)) AS x
        FROM e0, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i)
    ),
    sums AS (
        SELECT label, pos, CAST(SUM(x) AS DOUBLE) AS s
        FROM ex GROUP BY label, pos
    ),
    cent AS (
        SELECT label, list(s ORDER BY pos) AS cv
        FROM sums GROUP BY label
        HAVING SUM(s * s) > 0
    ),
    probes AS (
        SELECT query_id, qv, label, cell_rank FROM (
            SELECT q.vec_id AS query_id, q.v AS qv, c.label,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(q.v, c.cv), 6)
                                DESC, c.label) AS cell_rank
            FROM q CROSS JOIN cent c
        ) WHERE cell_rank <= 2
    ),
    cand AS (
        SELECT p.query_id, p.cell_rank, e.vec_id AS neighbor_id,
               round(list_cosine_similarity(p.qv, e.v), 6) AS cos_sim
        FROM probes p JOIN e ON e.label = p.label
        WHERE e.vec_id <> p.query_id
    ),
    tops AS (
        SELECT 1 AS nprobe, query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos_sim DESC, neighbor_id) AS rnk
            FROM cand WHERE cell_rank <= 1
        ) WHERE rnk <= 10
        UNION ALL
        SELECT 2 AS nprobe, query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos_sim DESC, neighbor_id) AS rnk
            FROM cand WHERE cell_rank <= 2
        ) WHERE rnk <= 10
    ),
    per_q AS (
        SELECT np.nprobe, x.query_id,
               COUNT(*) AS n_exact,
               COUNT(t.neighbor_id) AS n_overlap
        FROM (SELECT 1 AS nprobe UNION ALL SELECT 2) np
        CROSS JOIN exact_top x
        LEFT JOIN tops t
          ON t.nprobe = np.nprobe AND t.query_id = x.query_id
         AND t.neighbor_id = x.neighbor_id
        GROUP BY np.nprobe, x.query_id
    )
    SELECT CAST(nprobe AS INT) AS nprobe,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           round(CAST(SUM(n_overlap) AS DOUBLE) / SUM(n_exact), 6)
               AS mean_recall_at_10,
           CAST(SUM(CASE WHEN n_overlap = n_exact THEN 1 ELSE 0 END) AS BIGINT)
               AS n_perfect
    FROM per_q
    GROUP BY nprobe
    ORDER BY nprobe
    """,
)
def ivf_label_cells_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 vs number of probed cells for an IVF search whose
    coarse quantizer is the DETERMINISTIC label-centroid codebook —
    cells are per-label embedding centroids (exact DECIMAL sums, the
    ``embedding_label_centroids`` discipline), each query probes its
    nprobe nearest centroids, and candidates are the members of the
    probed cells only.  This is the nprobe-tuning curve an ANN platform
    publishes before picking its latency/recall operating point; unlike
    the KMeans IVF tier (whose float-matmul training keeps it
    rows-only), every step here is closed-form, so the WHOLE curve is
    oracle-checkable end-to-end.

    Scale shape: the codebook is #labels rows (broadcast); centroid
    sums shuffle (#labels x dim) map-side-combined partials; candidate
    generation is an equi-join on the cell id so only probed cells'
    members are scored (the IVF contract); the exact baseline restricts
    to the 1%% query sample.  Both engines rank on ROUNDED cosines with
    id tiebreaks at every stage — bucket boundaries cannot drift."""
    from ..functions.vectors import as_double, cosine, norm

    e0 = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v"), "label"
    )
    e = e0.filter(norm(F.col("v")) > 0)
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    ex = e0.select(
        "label", F.posexplode("v").alias("pos", "x0")
    ).select("label", "pos", F.col("x0").cast("decimal(18,9)").alias("x"))
    sums = ex.groupBy("label", "pos").agg(F.sum("x").cast("double").alias("s"))
    cent = (
        sums.groupBy("label")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(pos, s))), t -> t.s)")
            .alias("cv"),
            F.sum(F.col("s") * F.col("s")).alias("cn2"),
        )
        .filter(F.col("cn2") > 0)
        .select("label", "cv")
    )
    cell_w = Window.partitionBy("query_id").orderBy(
        F.desc("cscore"), F.col("label")
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "qv",
            "label",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cscore"),
        )
        .withColumn("cell_rank", F.row_number().over(cell_w))
        .filter(F.col("cell_rank") <= 2)
        .select("query_id", "qv", "label", "cell_rank")
    )
    cand = (
        probes.join(
            e.select(F.col("vec_id").alias("neighbor_id"), "label",
                     F.col("v").alias("cv2")),
            "label",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "cell_rank",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv2")), 6).alias("cos_sim"),
        )
    )
    exact_top = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    top_w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )

    def tier(np_: int) -> DataFrame:
        top = (
            cand.filter(F.col("cell_rank") <= np_)
            .withColumn("rnk", F.row_number().over(top_w))
            .filter(F.col("rnk") <= 10)
            .select(
                "query_id", F.col("neighbor_id").alias("ivf_neighbor")
            )
        )
        per_q = (
            exact_top.join(
                top,
                (exact_top["query_id"] == top["query_id"])
                & (exact_top["neighbor_id"] == top["ivf_neighbor"]),
                "left",
            )
            .select(
                exact_top["query_id"].alias("qid"),
                F.col("ivf_neighbor").isNotNull().cast("int").alias("hit"),
            )
            .groupBy("qid")
            .agg(F.count(F.lit(1)).alias("n_exact"), F.sum("hit").alias("n_overlap"))
        )
        return per_q.agg(
            F.lit(np_).cast("int").alias("nprobe"),
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.round(
                F.sum("n_overlap").cast("double") / F.sum("n_exact"), 6
            ).alias("mean_recall_at_10"),
            F.sum(F.when(F.col("n_overlap") == F.col("n_exact"), 1).otherwise(0))
            .cast("long")
            .alias("n_perfect"),
        ).select("nprobe", "n_queries", "mean_recall_at_10", "n_perfect")

    return tier(1).unionAll(tier(2)).orderBy("nprobe")


# ---------------------------------------------------------------------------
# Conformal prediction calibration — per-label nonconformity quantile.
# ---------------------------------------------------------------------------

_CONF_ALPHA = 0.1  # target 90% coverage


@_register(
    "conformal_calibration_quantile",
    f"""
    WITH e0 AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
    ),
    e AS (
        SELECT vec_id, v, label FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    ex AS (
        SELECT label, i - 1 AS pos, CAST(v[i] AS DECIMAL(18,9)) AS x
        FROM e0, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i)
    ),
    sums AS (
        SELECT label, pos, CAST(SUM(x) AS DOUBLE) AS s
        FROM ex GROUP BY label, pos
    ),
    cent AS (
        SELECT label, list(s ORDER BY pos) AS cv
        FROM sums GROUP BY label
        HAVING SUM(s * s) > 0
    ),
    scored AS (
        SELECT e.label, e.vec_id,
               1.0 - round(list_cosine_similarity(e.v, c.cv), 6) AS score
        FROM e JOIN cent c ON c.label = e.label
    ),
    ranked AS (
        SELECT label, vec_id, score,
               ROW_NUMBER() OVER (PARTITION BY label
                                  ORDER BY score, vec_id) AS rnk,
               COUNT(*) OVER (PARTITION BY label) AS n
        FROM scored
    )
    SELECT label,
           CAST(ANY_VALUE(n) AS BIGINT) AS n_cal,
           CAST(ANY_VALUE(k) AS BIGINT) AS k_index,
           MIN(CASE WHEN rnk = k THEN score END) AS qhat
    FROM (
        SELECT *, LEAST(CAST(ceil((n + 1) * (1.0 - {_CONF_ALPHA}))
                             AS BIGINT), n) AS k
        FROM ranked
    )
    GROUP BY label
    """,
)
def conformal_calibration_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration (Vovk et al.; Angelopoulos & Bates
    2021 tutorial, public): per-label nonconformity scores
    ``1 - cos(v, centroid_label)`` over the calibration set, and the
    conformal quantile ``qhat`` = the ceil((n+1)(1-alpha))-th smallest
    score (clamped to n) — the threshold that guarantees >= 1-alpha
    marginal coverage for future points under exchangeability.  The
    eval a production classifier ships alongside its predictions to
    turn scores into calibrated prediction sets.

    Scale shape: centroids are exact DECIMAL sums (the
    ``embedding_label_centroids`` discipline, #labels x dim partials);
    scoring is a broadcast join of the tiny codebook onto the corpus
    (cosine rounded at the edge); the order statistic is selected by a
    per-label rank window — partitioned by label, never global.  The
    k-th element is picked EXACTLY (rnk = k with (score, vec_id) total
    order), not via an approximate percentile, so both engines select
    the identical row."""
    from ..functions.vectors import as_double, cosine, norm

    e0 = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("v"), "label"
    )
    e = e0.filter(norm(F.col("v")) > 0)
    ex = e0.select("label", F.posexplode("v").alias("pos", "x0")).select(
        "label", "pos", F.col("x0").cast("decimal(18,9)").alias("x")
    )
    sums = ex.groupBy("label", "pos").agg(F.sum("x").cast("double").alias("s"))
    cent = (
        sums.groupBy("label")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(pos, s))), t -> t.s)")
            .alias("cv"),
            F.sum(F.col("s") * F.col("s")).alias("cn2"),
        )
        .filter(F.col("cn2") > 0)
        .select("label", "cv")
    )
    scored = e.join(F.broadcast(cent), "label").select(
        "label",
        "vec_id",
        (F.lit(1.0) - F.round(cosine(F.col("v"), F.col("cv")), 6)).alias("score"),
    )
    w_rank = Window.partitionBy("label").orderBy("score", "vec_id")
    w_n = Window.partitionBy("label")
    ranked = scored.select(
        "label",
        "score",
        F.row_number().over(w_rank).alias("rnk"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    ).withColumn(
        "k",
        F.least(
            F.ceil((F.col("n") + 1) * F.lit(1.0 - _CONF_ALPHA)).cast("long"),
            F.col("n"),
        ),
    )
    return ranked.groupBy("label").agg(
        F.first("n").cast("long").alias("n_cal"),
        F.first("k").cast("long").alias("k_index"),
        F.min(F.when(F.col("rnk") == F.col("k"), F.col("score"))).alias("qhat"),
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication over embedding clusters (Abbas et
# al. 2023, public): the dedup family's fourth axis (exact hash /
# lexical MinHash / winnowing fingerprint / SEMANTIC), keyed on the
# deterministic label-centroid cells so the whole pass — pairs,
# components, prototype selection — is oracle-checkable.
# ---------------------------------------------------------------------------

# Within-cell cosine ceiling above which two embeddings count as
# semantic duplicates.  A production run on a real encoder sits near
# 0.99; this synthetic corpus is geometric noise (within-label cosine
# p99 ~ 0.30 at sf0.01), so the ceiling sits in its upper tail to
# exercise non-trivial components at every SF.
_SEMDEDUP_CEIL = 0.35


@_register(
    "semdedup_embedding_prototypes",
    f"""
    WITH RECURSIVE e0 AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    pos AS (  -- zero-norm vectors excluded from pairing: cosine undefined
        SELECT vec_id, label, v FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    edges AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib
        FROM pos a JOIN pos b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {_SEMDEDUP_CEIL}
    ),
    und AS (SELECT ia AS a, ib AS b FROM edges
            UNION SELECT ib, ia FROM edges),
    walk AS (
        SELECT a, b FROM und
        UNION
        SELECT w.a, e.b FROM walk w JOIN und e ON w.b = e.a
    ),
    comp AS (SELECT a AS vec_id, LEAST(a, MIN(b)) AS component
             FROM walk GROUP BY a),
    ex AS (
        SELECT label, i - 1 AS pos, CAST(v[i] AS DECIMAL(18,9)) AS x
        FROM e0, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i)
    ),
    sums AS (
        SELECT label, pos, CAST(SUM(x) AS DOUBLE) AS s
        FROM ex GROUP BY label, pos
    ),
    cent AS (
        SELECT label, list(s ORDER BY pos) AS cv,
               list_sum(list_transform(list(s ORDER BY pos), x -> x * x)) AS cn2
        FROM sums GROUP BY label
    ),
    scored AS (
        SELECT e.vec_id,
               coalesce(c.component, e.vec_id) AS component,
               CASE WHEN list_sum(list_transform(e.v, x -> x * x)) = 0
                         OR ct.cn2 = 0 THEN NULL
                    ELSE round(list_cosine_similarity(e.v, ct.cv), 6) + 0.0
               END AS cos_cent
        FROM e0 e
        JOIN cent ct ON ct.label = e.label
        LEFT JOIN comp c ON c.vec_id = e.vec_id
    ),
    ranked AS (
        SELECT component, vec_id, cos_cent,
               COUNT(*) OVER (PARTITION BY component) AS n_members,
               ROW_NUMBER() OVER (PARTITION BY component
                                  ORDER BY cos_cent ASC NULLS FIRST, vec_id)
                   AS rn
        FROM scored
    )
    SELECT component, vec_id AS kept_vec_id,
           cos_cent AS prototype_centroid_cos,
           CAST(n_members AS BIGINT) AS n_members
    FROM ranked WHERE rn = 1
    """,
)
def semdedup_embedding_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023, public):
    within each embedding CLUSTER, mark pairs above a cosine ceiling
    ({ceil}) as semantic duplicates, connect them into components, and
    keep ONE prototype per component — the member with the LOWEST
    cosine to its cluster centroid (the paper's keep-the-outlier rule:
    prototypes preserve diversity, boilerplate collapses).  Clusters
    are the deterministic label-centroid cells (the
    ``ivf_label_cells_recall_curve`` codebook), which is what makes the
    whole pass oracle-checkable end to end — unlike KMeans-cell
    SemDeDup, no float-matmul training step.  Output is the
    post-semdedup corpus: one row per component (singletons keep
    themselves), with the prototype's centroid cosine and the component
    size.

    Determinism: pairs gate on the ROUNDED cosine ({ceil}); prototypes
    rank on the ROUNDED centroid cosine ASC NULLS FIRST with vec_id
    tiebreak (zero-norm vectors and zero centroids yield NULL — the
    hostile-embeddings guard — and sort first on both engines by the
    explicit null rule).  Centroid sums accumulate in DECIMAL per
    (label, dim) — exact and order-independent — with cosine computed
    against the SUM vector (scale-invariant, so the /n disappears).

    Scale shape: pairing is an equi-join on the cell id — within-cell
    quadratic is SemDeDup's own contract, bounded by cell size (at
    100 TB the codebook grows with the corpus, k ~ N/cell_budget, so
    cells stay bounded; here #labels stands in for k).  Components run
    on EDGES (dup pairs, not the corpus) through the bounded-iteration
    min-label operator; centroids are #labels x dim map-side-combined
    partials; the final rank window partitions by component —
    cluster-sized, never corpus-wide."""
    return semdedup_run(spark, sf_dir)


def semdedup_run(
    spark: SparkSession, sf_dir: str, cell_shards: int | None = None
) -> DataFrame:
    """Parameterized SemDeDup (VERDICT r14 #2): the r15 x10/x30 probe
    measured the FIXED-codebook pass going alpha ~ 2.1 superlinear
    (cells grow with the corpus, so the within-cell pair join is
    n^2/k), which is exactly the regime the docstring's "k ~
    N/cell_budget" caveat predicts.  ``cell_shards=S`` makes the
    mitigation executable: each label cell splits into S deterministic
    md5 lanes (``md5('sds:' || vec_id) % S`` — the oracle-replayable
    lane idiom of ``prefix_jaccard_sampled_pairs``), pairing runs
    within (label, lane), and per-cell pair work drops by ~S^2/S = S
    while cross-lane duplicate pairs are traded away — the same
    recall-for-flatness contract as LSH banding and the sharded
    Jaccard audit.  Serving guidance: pick S ~ cell_size/budget so
    lanes stay bounded as the corpus grows; components within a lane
    are refinements of the full components (every sharded edge is a
    full edge).  Centroids and prototype scoring stay per LABEL —
    sharding only touches the pair join."""
    from pyspark import StorageLevel

    from ..functions.vectors import dot, norm
    from ..operators.similarity import blocked_pairs_staged, stage_blocked

    # ONE staged corpus projection (vec + norm), persisted: consumed by
    # both sides of the within-cell pair join AND the centroid/scoring
    # branch, so the parquet scan and the O(dim) norm fold happen once
    # per row instead of three times (r10 VERDICT plan-audit item).
    # Persist is safe here: the blocks are (id, label, dim doubles + 1)
    # per row — smaller than the source parquet — and MEMORY_AND_DISK
    # spills rather than recomputes at 100x scale.
    emb = load(spark, sf_dir, "embeddings")
    if cell_shards is not None and int(cell_shards) > 1:
        lane = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit("sds:"), F.col("vec_id").cast("string"))
                    ),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            % int(cell_shards)
        )
        emb = emb.withColumn(
            "__cell",
            F.concat(
                F.col("label").cast("string"), F.lit("#"), lane.cast("string")
            ),
        )
        staged = stage_blocked(emb, "__cell").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        e0 = staged.select(
            F.col("id").alias("vec_id"),
            F.substring_index(F.col("block"), "#", 1).alias("label"),
            "v",
            F.col("n").alias("nv"),
        )
    else:
        staged = stage_blocked(emb, "label").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        e0 = staged.select(
            F.col("id").alias("vec_id"),
            F.col("block").alias("label"),
            "v",
            F.col("n").alias("nv"),
        )
    # the pair join pays a single dot-product HOF per pair (norms come
    # precomputed from the staged frame) — the embedding_near_dup_blocked
    # parity-proven pattern; measured 8.4s -> ~6s end-to-end at sf0.1
    # before the shared staging, ~3s after
    # r15 OPT: pairs exist only WITHIN a cell (the equi-join key), so
    # components are cell-bounded by construction — the per-block
    # union-find pass replaces the global iterative fixpoint (which paid
    # join + aggregate + checkpoint + convergence count per round; that
    # loop was 3.1-3.8s of this query's ~4.9s at sf0.1, the single
    # biggest term).  Identity with the iterative operator is pinned by
    # test_blocked_components_match_iterative.
    edges = blocked_pairs_staged(staged, _SEMDEDUP_CEIL, keep_block=True)
    from ..operators.graph import connected_components_blocked

    comp = connected_components_blocked(edges).select(
        F.col("id").alias("vec_id"), "component"
    )
    ex = e0.select(
        "label", F.posexplode("v").alias("pos", "x0")
    ).select("label", "pos", F.col("x0").cast("decimal(18,9)").alias("x"))
    sums = ex.groupBy("label", "pos").agg(F.sum("x").cast("double").alias("s"))
    cent = sums.groupBy("label").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, s))), t -> t.s)")
        .alias("cv")
    )
    scored = (
        e0.join(F.broadcast(cent), "label")
        .join(comp, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("component", "vec_id").alias("component"),
            F.when(
                (F.col("nv") == 0) | (norm(F.col("cv")) == 0), F.lit(None)
            )
            .otherwise(
                F.round(
                    dot(F.col("v"), F.col("cv"))
                    / (F.col("nv") * norm(F.col("cv"))),
                    6,
                )
                + 0.0
            )
            .alias("cos_cent"),
        )
    )
    w_n = Window.partitionBy("component")
    w_r = w_n.orderBy(F.asc_nulls_first("cos_cent"), "vec_id")
    return (
        scored.withColumn("n_members", F.count(F.lit(1)).over(w_n).cast("long"))
        .withColumn("rn", F.row_number().over(w_r))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("vec_id").alias("kept_vec_id"),
            F.col("cos_cent").alias("prototype_centroid_cos"),
            "n_members",
        )
    )


semdedup_embedding_prototypes.__doc__ = semdedup_embedding_prototypes.__doc__.format(
    ceil=_SEMDEDUP_CEIL
)


_SEMDEDUP_SHARDS = 4  # md5 lanes per label cell in the sharded tier


@_register(
    "semdedup_sharded_prototypes",
    f"""
    WITH RECURSIVE e0 AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
               CAST(('0x' || substr(md5('sds:' || CAST(vec_id AS VARCHAR)), 1, 13))
                    AS BIGINT) % {_SEMDEDUP_SHARDS} AS lane
        FROM embeddings
    ),
    pos AS (  -- zero-norm vectors excluded from pairing: cosine undefined
        SELECT vec_id, label, lane, v FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    edges AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib
        FROM pos a JOIN pos b
          ON a.label = b.label AND a.lane = b.lane AND a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {_SEMDEDUP_CEIL}
    ),
    und AS (SELECT ia AS a, ib AS b FROM edges
            UNION SELECT ib, ia FROM edges),
    walk AS (
        SELECT a, b FROM und
        UNION
        SELECT w.a, e.b FROM walk w JOIN und e ON w.b = e.a
    ),
    comp AS (SELECT a AS vec_id, LEAST(a, MIN(b)) AS component
             FROM walk GROUP BY a),
    ex AS (
        SELECT label, i - 1 AS pos, CAST(v[i] AS DECIMAL(18,9)) AS x
        FROM e0, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i)
    ),
    sums AS (
        SELECT label, pos, CAST(SUM(x) AS DOUBLE) AS s
        FROM ex GROUP BY label, pos
    ),
    cent AS (
        SELECT label, list(s ORDER BY pos) AS cv,
               list_sum(list_transform(list(s ORDER BY pos), x -> x * x)) AS cn2
        FROM sums GROUP BY label
    ),
    scored AS (
        SELECT e.vec_id,
               coalesce(c.component, e.vec_id) AS component,
               CASE WHEN list_sum(list_transform(e.v, x -> x * x)) = 0
                         OR ct.cn2 = 0 THEN NULL
                    ELSE round(list_cosine_similarity(e.v, ct.cv), 6) + 0.0
               END AS cos_cent
        FROM e0 e
        JOIN cent ct ON ct.label = e.label
        LEFT JOIN comp c ON c.vec_id = e.vec_id
    ),
    ranked AS (
        SELECT component, vec_id, cos_cent,
               COUNT(*) OVER (PARTITION BY component) AS n_members,
               ROW_NUMBER() OVER (PARTITION BY component
                                  ORDER BY cos_cent ASC NULLS FIRST, vec_id)
                   AS rn
        FROM scored
    )
    SELECT component, vec_id AS kept_vec_id,
           cos_cent AS prototype_centroid_cos,
           CAST(n_members AS BIGINT) AS n_members
    FROM ranked WHERE rn = 1
    """,
)
def semdedup_sharded_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE tIER of :func:`semdedup_embedding_prototypes` (VERDICT
    r14 #2): identical SemDeDup semantics, but every label cell splits
    into {shards} deterministic md5 lanes and the quadratic pair join
    runs within (label, lane).  The r15 x10/x30 probe measured the
    fixed-codebook pass at alpha ~ 2.1 (cells grow with the corpus);
    lanes cap the per-task pair fanout so the pass returns to ~linear,
    trading away only cross-lane duplicate pairs — the LSH-banding
    recall contract, here made oracle-checkable because the lane is an
    md5 function both engines replay exactly.  Components under
    sharding REFINE the full components (every sharded edge is a full
    edge — test-pinned), so prototype count is an upper bound on the
    full tier's.  Serving guidance: S ~ cell_size/budget at the target
    corpus; S = {shards} at sf0.1 stands in for that policy."""
    return semdedup_run(spark, sf_dir, cell_shards=_SEMDEDUP_SHARDS)


semdedup_sharded_prototypes.__doc__ = semdedup_sharded_prototypes.__doc__.format(
    shards=_SEMDEDUP_SHARDS
)


# ---------------------------------------------------------------------------
# Embedding isotropy report (Ethayarajh 2019; Mu & Viswanath 2018,
# public): mean pairwise cosine of the NORMALIZED vectors in closed
# form — no pairwise join, because for unit vectors u_i
#   mean_{i != j} cos(u_i, u_j) = (||sum u||^2 - n) / (n (n - 1)).
# ---------------------------------------------------------------------------


@_register(
    "embedding_isotropy_report",
    """
    WITH e0 AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    e AS (
        SELECT vec_id,
               list_transform(v, x -> x / sqrt(list_sum(
                   list_transform(v, y -> y * y)))) AS u
        FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    ex AS (
        SELECT i - 1 AS pos, CAST(u[i] AS DECIMAL(18,12)) AS x
        FROM e, LATERAL (SELECT unnest(generate_series(1, len(u))) AS i)
    ),
    sums AS (
        SELECT pos, CAST(SUM(x) AS DOUBLE) AS s FROM ex GROUP BY pos
    ),
    norm2 AS (
        SELECT SUM(CAST(s * s AS DECIMAL(28,12))) AS sn2 FROM sums
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e)
    SELECT n.n AS n_vectors,
           round((CAST(sn2 AS DOUBLE) - n.n)
                 / (CAST(n.n AS DOUBLE) * (n.n - 1)), 6) + 0.0
               AS mean_pairwise_cos,
           round(CAST(sn2 AS DOUBLE) / n.n, 6) + 0.0 AS mean_vector_norm2
    FROM norm2 CROSS JOIN n
    WHERE n.n >= 2
    """,
)
def embedding_isotropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotropy audit of the embedding space: the mean pairwise cosine
    over all n(n-1) ordered pairs of NORMALIZED vectors, computed in
    CLOSED FORM as (||Σu||² - n)/(n(n-1)) — the anisotropy statistic of
    Ethayarajh 2019 / Mu & Viswanath 2018 (a well-spread space sits
    near 0; contextual-encoder cones sit near 1), plus ||Σu||²/n (the
    mean-vector energy the all-but-the-top correction would remove).
    A retrieval platform checks this before trusting raw cosine ranks.

    The algebraic identity removes the quadratic pairwise join
    entirely: ONE normalized-explode contraction to per-dimension sums
    (dim-sized, DECIMAL(18,12) addends so the many-row reduction is
    exact and order-independent), one dim-length fold, one 1-row x
    1-row combine.  Zero-norm vectors are excluded (cosine undefined);
    a corpus with fewer than 2 usable vectors reports nothing rather
    than a 0/0."""
    from ..functions.vectors import as_double, norm

    e0 = load(spark, sf_dir, "embeddings").select(
        as_double("embedding").alias("v")
    )
    # nullif guard: Catalyst may evaluate the projection for rows the
    # norm filter later drops (hostile zero vector -> ANSI double/0
    # error); the guarded rows never survive the filter, so values are
    # unaffected on both engines
    e = e0.filter(norm(F.col("v")) > 0).select(
        F.expr(
            "transform(v, x -> x / nullif(sqrt(aggregate(transform(v,"
            " y -> y * y), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)),"
            " CAST(0.0 AS DOUBLE)))"
        ).alias("u")
    )
    ex = e.select(F.posexplode("u").alias("pos", "x0")).select(
        "pos", F.col("x0").cast("decimal(18,12)").alias("x")
    )
    sums = ex.groupBy("pos").agg(F.sum("x").cast("double").alias("s"))
    norm2 = sums.agg(
        F.sum((F.col("s") * F.col("s")).cast("decimal(28,12)")).alias("sn2")
    )
    nf = e.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        norm2.crossJoin(F.broadcast(nf))
        .filter(F.col("n") >= 2)
        .select(
            F.col("n").alias("n_vectors"),
            (
                F.round(
                    (F.col("sn2").cast("double") - F.col("n"))
                    / (F.col("n").cast("double") * (F.col("n") - 1)),
                    6,
                )
                + 0.0
            ).alias("mean_pairwise_cos"),
            (
                F.round(F.col("sn2").cast("double") / F.col("n"), 6) + 0.0
            ).alias("mean_vector_norm2"),
        )
    )


# ---------------------------------------------------------------------------
# Power-iteration top eigenvector of the embedding covariance matrix —
# the oracle-checkable bridge to the driver-side eigensolver behind
# ``embedding_pca_projection``.
# ---------------------------------------------------------------------------

_PI_STEPS = 5


def _power_iter_oracle_sql() -> str:
    """Unrolled power-iteration twin over the ROUNDED covariance matrix
    (the registered ``embedding_covariance_matrix`` oracle provides the
    upper triangle; both engines therefore iterate the IDENTICAL
    rounded matrix).  Every reduction is an ORDER-PINNED sequential
    double fold (list_reduce over dim-sorted lists / Spark aggregate
    over dim-sorted arrays — the holt recursion discipline): no
    double->decimal casts of intermediate values anywhere, because
    DuckDB's multiply-based double->DECIMAL conversion and Spark's
    exact BigDecimal rounding disagree at fine scales."""
    from .relational import ORACLE_SQL

    cov_sql = ORACLE_SQL["embedding_covariance_matrix"].strip()
    steps = []
    prev = "v0"
    for k in range(_PI_STEPS):
        steps.append(f"""
    w{k} AS (
        SELECT f.dim_i AS dim,
               list_reduce(list(f.cov * p.val ORDER BY f.dim_j),
                           (acc, x) -> acc + x) AS s
        FROM fullm f JOIN {prev} p ON p.dim = f.dim_j
        GROUP BY f.dim_i
    ),
    n{k} AS (
        SELECT list_reduce(list(s * s ORDER BY dim), (acc, x) -> acc + x) AS n2
        FROM w{k}
    ),
    v{k + 1} AS (
        SELECT w.dim,
               CASE WHEN n.n2 <= 0 THEN 0.0
                    ELSE round(w.s / sqrt(n.n2), 6) + 0.0 END AS val
        FROM w{k} w CROSS JOIN n{k} n
    )""")
        prev = f"v{k + 1}"
    return f"""
    WITH cov0 AS MATERIALIZED ({cov_sql}),
    fullm AS MATERIALIZED (
        SELECT dim_i, dim_j, cov FROM cov0
        UNION ALL
        SELECT dim_j, dim_i, cov FROM cov0 WHERE dim_i <> dim_j
    ),
    dims AS (SELECT DISTINCT dim_i AS dim FROM fullm),
    dcount AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM dims),
    v0 AS (
        SELECT dim, round(1.0 / sqrt(d), 6) + 0.0 AS val
        FROM dims CROSS JOIN dcount
    ),{",".join(steps)},
    wf AS (
        SELECT f.dim_i AS dim,
               list_reduce(list(f.cov * p.val ORDER BY f.dim_j),
                           (acc, x) -> acc + x) AS s
        FROM fullm f JOIN {prev} p ON p.dim = f.dim_j
        GROUP BY f.dim_i
    ),
    ray AS (
        SELECT list_reduce(list(v.val * w.s ORDER BY v.dim),
                           (acc, x) -> acc + x) AS num,
               list_reduce(list(v.val * v.val ORDER BY v.dim),
                           (acc, x) -> acc + x) AS den
        FROM {prev} v JOIN wf w ON w.dim = v.dim
    )
    SELECT v.dim AS dim,
           v.val + 0.0 AS component,
           CASE WHEN r.den <= 0 THEN NULL
                ELSE round(r.num / r.den, 6) + 0.0 END AS rayleigh
    FROM {prev} v CROSS JOIN ray r
    """


@_register("covariance_power_iteration", _power_iter_oracle_sql())
def covariance_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top eigenvector of the embedding covariance matrix by {k}
    unrolled power-iteration steps from the uniform unit vector, with
    the Rayleigh quotient (the top-eigenvalue estimate) alongside —
    the ORACLE-CHECKABLE bridge to ``embedding_pca_projection``'s
    driver-side ``eigh`` (whose eigensolver has no SQL twin).  Runs on
    the ROUNDED covariance matrix the registered oracle publishes, so
    both engines iterate the identical operator.  On this synthetic
    near-isotropic spectrum {k} steps is MID-convergence (the
    (lambda2/lambda1)^k rate is slow when the spectrum is tight) —
    deterministic either way; the quality contract is the Rayleigh
    BOUND (trace/dim <= rayleigh <= lambda_max, monotone in steps),
    asserted against numpy eigvalsh in tests/test_sketch_quality.py,
    not full eigenvector agreement.

    Cross-engine exactness: every reduction (matvec, norm, Rayleigh)
    is an ORDER-PINNED sequential double fold over the dim-sorted
    terms — the holt/``kaplan_meier`` recursion discipline — and each
    iterate rounds to 6 before the next step; no double->decimal
    casts of intermediates (DuckDB's conversion path and Spark's
    BigDecimal rounding disagree at fine scales — found by this very
    query's first draft).  An annihilated iterate (n2 = 0) stays at
    the zero vector on both engines rather than dividing by zero.
    Scale shape: the distributed work is the covariance pass itself;
    the iteration is |dim|^2-sized joins and |dim|-length folds —
    dim-bounded at any corpus size."""
    cov = embedding_covariance_matrix(spark, sf_dir)
    fullm = cov.unionByName(
        cov.filter(F.col("dim_i") != F.col("dim_j")).select(
            F.col("dim_j").alias("dim_i"),
            F.col("dim_i").alias("dim_j"),
            "cov",
        )
    )
    dims = fullm.select(F.col("dim_i").alias("dim")).distinct()
    dcount = dims.agg(F.count(F.lit(1)).cast("long").alias("d"))
    v = dims.crossJoin(F.broadcast(dcount)).select(
        "dim", (F.round(1.0 / F.sqrt(F.col("d")), 6) + 0.0).alias("val")
    )
    fold = (
        "aggregate(transform(array_sort(collect_list(struct(o, t))),"
        " e -> e.t), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )

    def matvec(vec):
        return (
            fullm.join(vec, fullm["dim_j"] == vec["dim"])
            .select(
                F.col("dim_i").alias("dim"),
                F.col("dim_j").alias("o"),
                (F.col("cov") * F.col("val")).alias("t"),
            )
            .groupBy("dim")
            .agg(F.expr(fold).alias("s"))
        )

    # each step collapses the iterate to ONE dim-sorted array row and
    # normalizes INSIDE the array expression: a single consumer per
    # step keeps the unrolled plan linear (a second consumer for the
    # norm scalar doubled the lineage per step -> 2^K plan blowup,
    # measured 104s -> ~20s end-to-end)
    n2_expr = (
        "aggregate(transform(arr, e -> e.s * e.s),"
        " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    for _ in range(_PI_STEPS):
        arr = matvec(v).agg(
            F.expr("array_sort(collect_list(struct(dim, s)))").alias("arr")
        )
        v = arr.select(
            F.explode(
                F.expr(
                    f"transform(arr, e -> named_struct('dim', e.dim, 'val',"
                    f" IF({n2_expr} <= 0, CAST(0.0 AS DOUBLE),"
                    f" round(e.s / sqrt({n2_expr}), 6) + 0.0)))"
                )
            ).alias("e")
        ).select(F.col("e.dim").alias("dim"), F.col("e.val").alias("val"))
    wf = matvec(v)
    ray = (
        v.join(wf, "dim")
        .agg(
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(dim, val, s))),"
                " e -> e.val * e.s), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            ).alias("num"),
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(dim, val))),"
                " e -> e.val * e.val), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            ).alias("den"),
        )
    )
    return v.crossJoin(F.broadcast(ray)).select(
        "dim",
        (F.col("val") + 0.0).alias("component"),
        F.when(F.col("den") <= 0, F.lit(None))
        .otherwise(F.round(F.col("num") / F.col("den"), 6) + 0.0)
        .alias("rayleigh"),
    )


covariance_power_iteration.__doc__ = covariance_power_iteration.__doc__.format(
    k=_PI_STEPS
)


# ---------------------------------------------------------------------------
# Greedy k-center coreset (Gonzalez 1985 farthest-point traversal,
# public; the 2-approximation for the k-center objective) — the
# diversity-selection primitive training pipelines use to pick a
# maximally-spread representative subset of an embedding corpus.
# ---------------------------------------------------------------------------

_KCENTER_K = 5


def _kcenter_l2sq_sql(a: str, b: str) -> str:
    # ORDER-PINNED left fold seeded with 0.0 — exactly Spark's
    # F.aggregate(zip_with(...), 0.0, acc + x), so the raw doubles are
    # BIT-IDENTICAL across engines and no rounding is applied at all:
    # DuckDB's multiply-based round() itself perturbs values past 2^53
    # (observed at 1e12 on the hostile-embeddings fixture — the
    # SCALE.md round-10 lesson), while identical pinned folds need no
    # ulp absorption in the first place.
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(list_zip({a}, {b}),"
        f" p -> (p[1] - p[2]) * (p[1] - p[2]))), (acc, x) -> acc + x)"
    )


def _kcenter_oracle_sql() -> str:
    parts = [
        """
    WITH e AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(CAST(embedding AS DOUBLE[]),
                                      x -> x * x)),
                   (acc, x) -> acc + x) AS n2
        FROM embeddings
    ),
    c1 AS (SELECT vec_id, v FROM e ORDER BY n2 DESC NULLS LAST, vec_id LIMIT 1),
    d1 AS (
        SELECT e.vec_id, e.v,
               """
        + _kcenter_l2sq_sql("e.v", "c1.v")
        + """ AS dmin
        FROM e CROSS JOIN c1
    )"""
    ]
    for k in range(2, _KCENTER_K + 1):
        parts.append(
            f""",
    c{k} AS (
        SELECT vec_id, v, dmin FROM d{k - 1}
        ORDER BY dmin DESC NULLS LAST, vec_id LIMIT 1
    )"""
        )
        if k < _KCENTER_K:
            parts.append(
                f""",
    d{k} AS (
        SELECT d.vec_id, d.v,
               least(d.dmin, {_kcenter_l2sq_sql("d.v", f"c{k}.v")}) AS dmin
        FROM d{k - 1} d CROSS JOIN c{k}
    )"""
            )
    selects = [
        "SELECT CAST(1 AS INTEGER) AS center_rank, vec_id,"
        " CAST(NULL AS DOUBLE) AS sel_dist FROM c1"
    ] + [
        f"SELECT CAST({k} AS INTEGER), vec_id, CAST(dmin AS DOUBLE) FROM c{k}"
        for k in range(2, _KCENTER_K + 1)
    ]
    return "".join(parts) + "\n    " + "\n    UNION ALL ".join(selects)


@_register("kcenter_coreset_embeddings", _kcenter_oracle_sql())
def kcenter_coreset_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embedding corpus (Gonzalez 1985
    farthest-point traversal, the classic 2-approximation): seed with
    the max-norm vector, then {k}x repeat "pick the point farthest from
    every chosen center" — the diversity-selection primitive for
    building a maximally-spread training subset (the geometric
    complement of SemDeDup, which REMOVES the over-close points).
    Output: each center's selection rank and its min-distance to the
    previously chosen set (the Gonzalez radius sequence; NULL for the
    seed).

    Determinism & parity: every distance is the squared L2 between
    double-cast arrays computed as an ORDER-PINNED left fold seeded
    with 0.0 on BOTH engines (bit-identical raw doubles — deliberately
    UNROUNDED, because DuckDB's multiply-based round() itself perturbs
    values past 2^53); both engines select with vec_id tiebreak and
    NULLS LAST (null/ragged vectors yield NULL distances and are never
    chosen while finite candidates remain).  The oracle unrolls the {k} selection steps as CTEs (the
    LPA fixed-K precedent); a corpus smaller than K repeats the same
    algebra on both engines.

    Scale shape: the iteration state is K driver-held vectors
    (dim-sized — the BPE 1-row-argmax precedent); each of the K-1
    selection passes is one scan of the persisted (vec_id, v)
    projection with a K-literal least() of fold distances, contracted
    by TakeOrderedAndProject — no corpus-sized shuffle, no pairwise
    join, exactly K passes at any corpus size."""
    from pyspark import StorageLevel

    from ..functions.vectors import as_double

    def l2sq(v, cvec: list) -> F.Column:
        lit = F.array(*[F.lit(float(x)) for x in cvec])
        return F.aggregate(
            F.zip_with(v, lit, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    e = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", as_double("embedding").alias("v"))
        .withColumn(
            "n2",
            F.aggregate(
                F.transform(F.col("v"), lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    schema = "center_rank int, vec_id long, sel_dist double"
    seed = e.orderBy(F.desc_nulls_last("n2"), "vec_id").select("vec_id", "v").first()
    if seed is None:
        return spark.createDataFrame([], schema)
    centers = [(1, seed.vec_id, None)]
    cvecs = [list(seed.v)]
    for k in range(2, _KCENTER_K + 1):
        dists = [l2sq(F.col("v"), cv) for cv in cvecs]
        dmin = F.least(*dists) if len(dists) > 1 else dists[0]
        row = (
            e.select("vec_id", "v", dmin.alias("dmin"))
            .orderBy(F.desc_nulls_last("dmin"), "vec_id")
            .first()
        )
        centers.append(
            (k, row.vec_id, None if row.dmin is None else float(row.dmin))
        )
        cvecs.append(list(row.v))
    return spark.createDataFrame(centers, schema)


kcenter_coreset_embeddings.__doc__ = kcenter_coreset_embeddings.__doc__.format(
    k=_KCENTER_K
)


# ---------------------------------------------------------------------------
# Cross-split semantic decontamination — the embedding-space member of
# the decontamination family (decontaminate_documents is the exact
# n-gram member): train vectors too close to ANY eval vector are
# contaminated and must be dropped before training.
# ---------------------------------------------------------------------------

_XSPLIT_CEIL = 0.35  # binds on this corpus (the SemDeDup ceiling)


@_register(
    "embedding_decontaminate_split",
    f"""
    WITH e0 AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    e AS (  -- zero-norm vectors excluded: cosine undefined
        SELECT vec_id, label, v FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    hits AS (
        SELECT t.vec_id,
               round(list_cosine_similarity(t.v, q.v), 6) AS cos_sim
        FROM e t JOIN e q ON t.label = q.label
        WHERE t.vec_id % 17 <> 0 AND q.vec_id % 17 = 0
          AND round(list_cosine_similarity(t.v, q.v), 6) >= {_XSPLIT_CEIL}
    )
    SELECT vec_id AS train_vec_id,
           COUNT(*) AS n_eval_hits,
           max(cos_sim) AS max_eval_cos
    FROM hits GROUP BY vec_id
    """,
)
def embedding_decontaminate_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination between a train split and an
    eval split (vec_id % 17 == 0 plays the eval suite): flag every
    TRAIN vector whose cosine to ANY eval vector reaches {ceil} within
    its label cell, with hit count and max cosine — the semantic
    complement of the exact 5-gram pass (``decontaminate_documents``),
    catching paraphrased eval leakage that token matching misses
    (the published eval-contamination playbook runs both).

    Scale shape: one staged (vector + norm) projection feeds both join
    sides (the SemDeDup staging pattern); the pair join is a label-cell
    equi-join whose EVAL side is a small fraction of the corpus (~1/17
    here — at 100 TB the eval suite side is fixed-size and effectively
    broadcastable); the per-train-vector rollup contracts on the join
    key already in hand.  Both engines gate and aggregate on the
    ROUNDED cosine with identical null/zero-norm exclusions."""
    from ..operators.similarity import stage_blocked

    staged = stage_blocked(load(spark, sf_dir, "embeddings"), "label")
    live = staged.filter(F.col("n") > 0)
    t = live.filter(F.col("id") % 17 != 0).select(
        "block", F.col("id").alias("train_vec_id"),
        F.col("v").alias("tv"), F.col("n").alias("tn"),
    )
    q = live.filter(F.col("id") % 17 == 0).select(
        "block", F.col("v").alias("qv"), F.col("n").alias("qn")
    )
    from ..functions.vectors import dot

    cos = F.round(
        dot(F.col("tv"), F.col("qv")) / (F.col("tn") * F.col("qn")), 6
    )
    return (
        t.join(q, "block")
        .select("train_vec_id", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= _XSPLIT_CEIL)
        .groupBy("train_vec_id")
        .agg(
            F.count(F.lit(1)).alias("n_eval_hits"),
            F.max("cos_sim").alias("max_eval_cos"),
        )
    )


embedding_decontaminate_split.__doc__ = embedding_decontaminate_split.__doc__.format(
    ceil=_XSPLIT_CEIL
)


# ---------------------------------------------------------------------------
# Mutual nearest neighbors across the even/odd vector split — the
# batch-alignment primitive (MNN correction / translation-pair mining).
# ---------------------------------------------------------------------------


@_register(
    "mutual_nearest_neighbors",
    """
    WITH e0 AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    e AS (
        SELECT vec_id, label, v FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    cand AS (
        SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
        FROM e a JOIN e b ON a.label = b.label
        WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY id_a
                                  ORDER BY cos_sim DESC, id_b) AS ra,
               ROW_NUMBER() OVER (PARTITION BY id_b
                                  ORDER BY cos_sim DESC, id_a) AS rb
        FROM cand
    )
    SELECT label, id_a, id_b, cos_sim
    FROM ranked WHERE ra = 1 AND rb = 1
    """,
)
def mutual_nearest_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual nearest neighbors between the even- and odd-id halves of
    the embedding corpus, within label cells: a pair survives only if
    each side is the OTHER's top-1 by cosine.  MNN is the alignment
    primitive of batch-effect correction (Haghverdi et al. 2018) and
    bilingual lexicon mining (the CSLS/MNN family, Conneau et al.
    2018, both public) — mutuality is what suppresses hub vectors
    that are "everyone's neighbor".

    Both directions rank the SAME candidate frame (one within-cell
    equi-join), on the ROUNDED cosine with id tiebreaks — the
    item_item ranking convention, so a rounding boundary can never
    order the engines differently; zero-norm vectors are excluded
    (cosine undefined, the blocked_pairs rule).

    Scale shape: candidates come from the label-cell equi-join
    (signatures of the SemDeDup shape — never an all-pairs scan);
    the two rank windows partition by vector id, shuffling the
    cell-bounded candidate relation, not the corpus; mutuality is a
    filter, not a second join."""
    from ..operators.similarity import stage_blocked

    e = load(spark, sf_dir, "embeddings")
    staged = stage_blocked(e, "label").filter(F.col("n") > 0)
    a = staged.filter(F.col("id") % 2 == 0).select(
        "block",
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("n").alias("na"),
    )
    b = staged.filter(F.col("id") % 2 == 1).select(
        "block",
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = a.join(b, "block").select(
        F.col("block").alias("label"),
        "id_a",
        "id_b",
        F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cos_sim"),
    )
    wa = Window.partitionBy("id_a").orderBy(F.desc("cos_sim"), "id_b")
    wb = Window.partitionBy("id_b").orderBy(F.desc("cos_sim"), "id_a")
    return (
        cand.withColumn("ra", F.row_number().over(wa))
        .withColumn("rb", F.row_number().over(wb))
        .filter((F.col("ra") == 1) & (F.col("rb") == 1))
        .select("label", "id_a", "id_b", "cos_sim")
    )


# ---------------------------------------------------------------------------
# Exact k-means, fixed unrolled iterations — the oracle-paired twin of
# the rows-only IVF tier (pyspark.ml KMeans is seed/impl-dependent;
# this one is bit-deterministic by construction).
# ---------------------------------------------------------------------------

_KM_K = 4
_KM_ITERS = 3


def _kmeans_oracle_sql() -> str:
    """Unrolled Lloyd iterations as generated MATERIALIZED CTEs: exact
    DECIMAL distances (diff re-cast to DECIMAL(18,9) before squaring so
    both engines keep precision 37/18 products), double-rounded
    centroid means (one division, round 9)."""
    steps = []
    prev = "c0"
    for t in range(_KM_ITERS):
        steps.append(f"""
    d{t} AS MATERIALIZED (
        SELECT id, cluster, dist, ROW_NUMBER() OVER (
            PARTITION BY id ORDER BY dist, cluster) AS rn
        FROM (
            SELECT b.id, c.cluster,
                   SUM(CAST(CAST(b.x - c.c AS DECIMAL(18,9))
                            * CAST(b.x - c.c AS DECIMAL(18,9))
                            AS DECIMAL(37,18))) AS dist
            FROM base b JOIN {prev} c ON c.pos = b.pos
            GROUP BY b.id, c.cluster
        )
    ),
    a{t} AS MATERIALIZED (
        SELECT id, cluster, dist FROM d{t} WHERE rn = 1
    ),
    c{t + 1} AS MATERIALIZED (
        SELECT a.cluster, b.pos,
               CAST(round(CAST(SUM(b.x) AS DOUBLE) / COUNT(*), 9)
                    AS DECIMAL(18,9)) AS c
        FROM base b JOIN a{t} a ON a.id = b.id
        GROUP BY a.cluster, b.pos
    )""")
        prev = f"c{t + 1}"
    last_a = f"a{_KM_ITERS - 1}"
    return f"""
    WITH base AS MATERIALIZED (
        SELECT vec_id AS id, i - 1 AS pos, CAST(v[i] AS DECIMAL(18,9)) AS x
        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
             LATERAL (SELECT unnest(generate_series(1, len(v))) AS i)
    ),
    seeds AS (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster
        FROM (SELECT DISTINCT vec_id FROM embeddings
              ORDER BY vec_id LIMIT {_KM_K})
    ),
    c0 AS MATERIALIZED (
        SELECT s.cluster, b.pos, b.x AS c
        FROM seeds s JOIN base b ON b.id = s.vec_id
    ),{",".join(steps)}
    SELECT cluster,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           round(CAST(SUM(dist) AS DOUBLE), 6) AS inertia
    FROM {last_a}
    GROUP BY cluster
    """


@_register("kmeans_fixed_iterations_exact", _kmeans_oracle_sql())
def kmeans_fixed_iterations_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k = 4), THREE unrolled iterations, seeded by
    the 4 smallest vec_ids — the bit-deterministic, oracle-paired twin
    of the rows-only IVF tier (pyspark.ml's KMeans varies with seed
    and implementation; SURVEY's rows-only ledger documents that
    obstruction — this query removes it by pinning seeds, iteration
    count, and every numeric boundary).

    Numeric discipline: squared-L2 distances are FULLY EXACT — the
    component difference re-casts to DECIMAL(18,9) before squaring
    (keeping the product at precision 37, scale 18 on BOTH engines —
    Spark would otherwise shrink the scale of a 19,9 x 19,9 product)
    and sums stay in DECIMAL, so the argmin ordering is exact and the
    (dist, cluster) tiebreak is engine-independent; centroid means are
    the single allowed double division, rounded to 9 and re-cast.
    Empty clusters simply drop their centroid rows (both engines
    agree by join semantics).

    Scale shape: the per-iteration work is one (id, pos) x (cluster,
    pos) equi-join producing K rows per vector-dimension, contracted
    map-side to K distances per vector — linear in the corpus with
    dim-bounded fanout; centroids are (K x dim) frames; the rank
    window partitions by vector id.  Three iterations = three bounded
    shuffles, no loop-carried lineage (each step re-reads the exploded
    base, which Catalyst reuses)."""
    e = load(spark, sf_dir, "embeddings")
    base = e.select(
        F.col("vec_id").alias("id"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "x0"
        ),
    ).select("id", "pos", F.col("x0").cast("decimal(18,9)").alias("x"))
    seeds = (
        e.select("vec_id")
        .distinct()
        .orderBy("vec_id")
        .limit(_KM_K)
        .select(
            F.col("vec_id"),
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias(
                "cluster"
            ),
        )
    )
    cent = (
        seeds.join(base, seeds.vec_id == base.id)
        .select("cluster", "pos", F.col("x").alias("c"))
    )
    assign = None
    for _ in range(_KM_ITERS):
        diff = (F.col("x") - F.col("c")).cast("decimal(18,9)")
        dists = (
            base.join(cent, "pos")
            .groupBy("id", "cluster")
            .agg(
                F.sum((diff * diff).cast("decimal(37,18)")).alias("dist")
            )
        )
        w = Window.partitionBy("id").orderBy("dist", "cluster")
        assign = (
            dists.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", "cluster", "dist")
        )
        cent = (
            base.join(assign.select("id", "cluster"), "id")
            .groupBy("cluster", "pos")
            .agg(
                F.round(F.sum("x").cast("double") / F.count(F.lit(1)), 9)
                .cast("decimal(18,9)")
                .alias("c")
            )
        )
    return assign.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.round(F.sum("dist").cast("double"), 6).alias("inertia"),
    )


# ---------------------------------------------------------------------------
# kNN leave-one-out label accuracy — the classifier-free probe of
# embedding quality (majority vote of the 5 nearest neighbors).
# ---------------------------------------------------------------------------

_KNN_K = 5
_KNN_SAMPLE_MOD = 20


@_register(
    "knn_loo_label_accuracy",
    f"""
    WITH e0 AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    e AS (
        SELECT vec_id, label, v FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    q AS (SELECT * FROM e WHERE vec_id % {_KNN_SAMPLE_MOD} = 0),
    scored AS (
        SELECT q.vec_id AS qid, q.label AS true_label,
               c.vec_id AS cid, c.label AS clabel,
               round(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
        FROM q JOIN e c ON c.vec_id <> q.vec_id
    ),
    topk AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY cos_sim DESC, cid) AS rnk
            FROM scored
        ) WHERE rnk <= {_KNN_K}
    ),
    votes AS (
        SELECT qid, true_label, clabel, COUNT(*) AS n_votes
        FROM topk GROUP BY qid, true_label, clabel
    ),
    pred AS (
        SELECT qid, true_label, clabel AS pred_label
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                         ORDER BY n_votes DESC, clabel) AS r
              FROM votes)
        WHERE r = 1
    )
    SELECT true_label AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           round(CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM pred GROUP BY true_label
    """,
)
def knn_loo_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 5-NN label accuracy on a 1-in-20 query sample —
    the classifier-free probe of whether the embedding GEOMETRY
    already separates the labels (Cover & Hart 1967's nearest-neighbor
    rule, public): each sampled vector is classified by the majority
    label of its 5 nearest OTHER vectors (rounded-cosine rank, id
    tiebreak; vote ties break to the smallest label), reported as
    per-label accuracy.  Complements ``ml_logreg_embedding_classifier``
    (parametric, rows-only) and
    ``label_noise_centroid_disagreement`` (centroid-level) with the
    local, fully oracle-checkable member.

    Scale shape: the brute-force scoring is QUERY-SAMPLE bounded (the
    ann_cosine_topk contract — |queries| x corpus, linear in the
    corpus for a fixed sample); ranks partition by query; votes and
    accuracy are k-bounded aggregates.  At 100 TB the candidate side
    swaps to any blocked/ANN tier with the same vote tail."""
    e = load(spark, sf_dir, "embeddings")
    staged = (
        e.select(
            "vec_id",
            "label",
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
                "v"
            ),
        )
        .withColumn(
            "n",
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("v"), lambda x: x * x),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            ),
        )
        .filter(F.col("n") > 0)
    )
    q = staged.filter(F.col("vec_id") % _KNN_SAMPLE_MOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("true_label"),
        F.col("v").alias("qv"),
        F.col("n").alias("qn"),
    )
    c = staged.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("clabel"),
        F.col("v").alias("cv"),
        F.col("n").alias("cn"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = q.join(c, F.col("cid") != F.col("qid")).select(
        "qid",
        "true_label",
        "cid",
        "clabel",
        F.round(dot / (F.col("qn") * F.col("cn")), 6).alias("cos_sim"),
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "cid")
    topk = scored.withColumn("rnk", F.row_number().over(wq)).filter(
        F.col("rnk") <= _KNN_K
    )
    votes = topk.groupBy("qid", "true_label", "clabel").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("qid").orderBy(F.desc("n_votes"), "clabel")
    pred = (
        votes.withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") == 1)
        .select("qid", "true_label", F.col("clabel").alias("pred_label"))
    )
    correct = F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum(correct).cast("long").alias("n_correct"),
        F.round(F.sum(correct).cast("double") / F.count(F.lit(1)), 6).alias(
            "accuracy"
        ),
    )


# ---------------------------------------------------------------------------
# Linear CKA between full and truncated embeddings — "how much of the
# representation geometry survives cutting the dimension in half?"
# ---------------------------------------------------------------------------

_CKA_DIM = 64
_CKA_TRUNC = 32


@_register(
    "linear_cka_truncation",
    f"""
    WITH ex AS (
        SELECT e.vec_id, i.i,
               CAST(round(CAST(e.embedding[i.i] AS DOUBLE) * 1000000)
                    AS BIGINT) AS x
        FROM embeddings e
        JOIN (SELECT unnest(generate_series(1, {_CKA_DIM})) AS i) i ON TRUE
    ),
    n AS (SELECT COUNT(*) AS n FROM embeddings),
    sums AS (
        SELECT i, SUM(x) AS si FROM ex GROUP BY i
    ),
    cross_m AS (
        SELECT a.i AS i, b.i AS j,
               SUM(CAST(a.x AS DECIMAL(19,0)) * CAST(b.x AS DECIMAL(19,0)))
                   AS sxy
        FROM ex a JOIN ex b ON a.vec_id = b.vec_id
        GROUP BY a.i, b.i
    ),
    craw AS (
        SELECT cm.i, cm.j,
               (CAST(cm.sxy AS DOUBLE)
                - CAST(sa.si AS DOUBLE) * CAST(sb.si AS DOUBLE) / n.n)
               / 1e12 AS cr
        FROM cross_m cm
        JOIN sums sa ON sa.i = cm.i
        JOIN sums sb ON sb.i = cm.j
        CROSS JOIN n
    ),
    scal AS (
        SELECT CASE WHEN MAX(abs(cr)) > 0
                    THEN pow(10.0, floor(log10(MAX(abs(cr))))) END AS s
        FROM craw
    ),
    cmat AS (
        SELECT i, j,
               CAST(round(cr / scal.s, 6) AS DECIMAL(18,6)) AS c
        FROM craw CROSS JOIN scal
    ),
    fro AS (
        SELECT SUM(CASE WHEN j <= {_CKA_TRUNC} THEN c * c END) AS num,
               SUM(c * c) AS dx,
               SUM(CASE WHEN i <= {_CKA_TRUNC} AND j <= {_CKA_TRUNC}
                        THEN c * c END) AS dy
        FROM cmat
    )
    SELECT CAST(n.n AS BIGINT) AS n_vecs,
           CAST({_CKA_DIM} AS BIGINT) AS dim_full,
           CAST({_CKA_TRUNC} AS BIGINT) AS dim_trunc,
           round(CAST(num AS DOUBLE)
                 / NULLIF(sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE)),
                          0.0), 6) AS cka
    FROM fro CROSS JOIN n
    """,
)
def linear_cka_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear Centered Kernel Alignment (Kornblith et al., ICML 2019,
    public) between the FULL {d}-dim embeddings and their first-{t}-dim
    truncation: CKA = ||Cxy||_F^2 / (||Cxx||_F ||Cyy||_F) over the
    centered cross-covariance — the representation-similarity score
    behind "can we ship the half-size embedding", the geometry-level
    companion of :func:`matryoshka_truncation_recall` (which measures
    retrieval survival; this measures structure survival).

    Because the truncation is a PREFIX, Cxy and Cyy are submatrices of
    the one full covariance C: one exploded self-join builds C once and
    three filtered Frobenius sums read the score off it.  Floats
    quantize to 6dp DECIMAL on entry (identical literals both engines);
    covariance entries normalize by one global power-of-10 scale (CKA
    is exactly scale-invariant) and re-quantize to 6dp before squaring,
    so every aggregate is an exact decimal sum at ANY input magnitude;
    doubles touch only the final ratio.  An all-zero covariance yields
    NULL cka.

    Scale shape: the explode is {d} rows per vector and the self-join
    fans to {d}^2 per vector but contracts map-side to the {d}x{d}
    moment grid (the covariance_power_iteration shape) — at 100 TB the
    shuffle carries dim^2 partials per partition, never row pairs.
    Output: one row."""
    import pandas as _pd  # Arrow-batched; no row-at-a-time Python

    e = load(spark, sf_dir, "embeddings")
    n = e.agg(F.count(F.lit(1)).alias("n"))

    # The dim^2 Gram build is the one place built-in operators can't
    # express the work efficiently: the exploded self-join materializes
    # rows x dim^2 join rows just to aggregate them back down (5.5s at
    # sf0.1).  mapInPandas computes each Arrow batch's EXACT int64
    # X^T X partial with one vectorized matmul and emits dim^2 partial
    # rows per batch instead — identical integers (int64 is exact and
    # associative; |x6| <= ~1e7 even on the hostile corpus, so a batch
    # of <= 64k rows stays far from the 9.2e18 overflow line), so the
    # DuckDB oracle's pairwise-sum formulation still matches bit for
    # bit.  Half-up rounding is replicated explicitly: np.rint rounds
    # half-to-even, which is NOT what both engines' round() does.
    import numpy as _np

    def _gram_partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            arr = _np.asarray(
                [_np.asarray(v, dtype=_np.float64) for v in pdf["embedding"]]
            )
            scaled = arr * 1000000.0
            x6 = _np.where(
                scaled >= 0,
                _np.floor(scaled + 0.5),
                _np.ceil(scaled - 0.5),
            ).astype(_np.int64)
            p = x6.T @ x6
            d = p.shape[0]
            ii, jj = _np.meshgrid(
                _np.arange(1, d + 1), _np.arange(1, d + 1), indexing="ij"
            )
            yield _pd.DataFrame(
                {
                    "i": ii.ravel(),
                    "j": jj.ravel(),
                    "pxy": p.ravel(),
                    # repeat maps flat index (i-1)*d+(j-1) -> colsum[i-1],
                    # so the j==1 slice carries sum x6 per i exactly once
                    "psi": _np.repeat(x6.sum(axis=0), d),
                }
            )

    partials = e.select("embedding").mapInPandas(
        _gram_partials, "i INT, j INT, pxy BIGINT, psi BIGINT"
    )
    cross_m = partials.groupBy("i", "j").agg(
        F.sum(F.col("pxy").cast("decimal(38,0)")).alias("sxy")
    )
    # per-dim sums ride along in the same partials (psi repeats per j;
    # summing the j==1 slice recovers sum x6 per i exactly)
    sums = (
        partials.filter(F.col("j") == 1)
        .groupBy("i")
        .agg(F.sum(F.col("psi").cast("decimal(38,0)")).alias("si"))
    )
    sa = sums.select(F.col("i").alias("i"), F.col("si").alias("si_a"))
    sb = sums.select(F.col("i").alias("j"), F.col("si").alias("si_b"))
    craw = (
        cross_m.join(F.broadcast(sa), "i")
        .join(F.broadcast(sb), "j")
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            (
                (
                    F.col("sxy").cast("double")
                    - F.col("si_a").cast("double")
                    * F.col("si_b").cast("double")
                    / F.col("n")
                )
                / 1e12
            ).alias("cr"),
        )
    )
    # CKA is exactly invariant to scaling C by s (num ~ s^2, each
    # denominator factor ~ s), so the entries normalize by a global
    # power of 10 before the 6dp quantization — keeping ~7 significant
    # digits at ANY data magnitude (hostile 1e6-valued vectors push
    # raw C to ~1e13, where a fixed absolute grain loses everything)
    scal = craw.agg(
        F.when(
            F.max(F.abs(F.col("cr"))) > 0,
            F.pow(10.0, F.floor(F.log10(F.max(F.abs(F.col("cr")))))),
        ).alias("s")
    )
    cmat = craw.crossJoin(F.broadcast(scal)).select(
        "i",
        "j",
        F.round(F.col("cr") / F.col("s"), 6).cast("decimal(18,6)").alias("c"),
    )
    c2 = F.col("c") * F.col("c")
    fro = cmat.agg(
        F.sum(F.when(F.col("j") <= _CKA_TRUNC, c2)).alias("num"),
        F.sum(c2).alias("dx"),
        F.sum(
            F.when((F.col("i") <= _CKA_TRUNC) & (F.col("j") <= _CKA_TRUNC), c2)
        ).alias("dy"),
    )
    return fro.crossJoin(F.broadcast(n)).select(
        F.col("n").cast("long").alias("n_vecs"),
        F.lit(_CKA_DIM).cast("long").alias("dim_full"),
        F.lit(_CKA_TRUNC).cast("long").alias("dim_trunc"),
        F.round(
            F.col("num").cast("double")
            / F.nullif(
                F.sqrt(F.col("dx").cast("double"))
                * F.sqrt(F.col("dy").cast("double")),
                F.lit(0.0),
            ),
            6,
        ).alias("cka"),
    )


linear_cka_truncation.__doc__ = linear_cka_truncation.__doc__.replace(
    "{d}", str(_CKA_DIM)
).replace("{t}", str(_CKA_TRUNC))


# ---------------------------------------------------------------------------
# End-to-end retrieval cascade — 1-bit Hamming prefilter -> int8 rerank ->
# exact-double rerank, gated by recall against exact brute force.  The three
# tiers exist individually (binary_quantize_hamming_topk,
# int8_quantized_dot_topk, ann_cosine_topk); this composes them into the ONE
# query a production retrieval stack actually runs, with the funnel widths as
# released columns so the recall/cost trade is auditable.
# ---------------------------------------------------------------------------

_CASCADE_T1 = 50  # hamming-tier survivors per query
_CASCADE_T2 = 20  # int8-tier survivors per query
_CASCADE_K = 10  # final exact-rerank depth


@_register(
    "retrieval_cascade_recall",
    f"""
    WITH e0 AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    e AS (
        SELECT vec_id, v FROM e0
        WHERE list_sum(list_transform(v, x -> x * x)) > 0
    ),
    q AS (SELECT vec_id, v FROM e WHERE vec_id % 100 = 0),
    exact_top AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rnk
            FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       round(list_cosine_similarity(q.v, e.v), 6) AS cos_sim
                FROM q JOIN e ON q.vec_id <> e.vec_id
            )
        ) WHERE rnk <= {_CASCADE_K}
    ),
    t1 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY hamming, neighbor_id) AS rnk
            FROM (
                SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                       length(list_filter(list_zip(q.v, e.v),
                              p -> (p[1] > 0) <> (p[2] > 0))) AS hamming
                FROM q JOIN e ON q.vec_id <> e.vec_id
            )
        ) WHERE rnk <= {_CASCADE_T1}
    ),
    qz AS (
        SELECT vec_id,
               CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
                    THEN list_transform(v, x -> CAST(0 AS BIGINT))
                    ELSE list_transform(v, x -> CAST(floor(
                         127 * x / list_max(list_transform(v, y -> abs(y)))
                         + 0.5) AS BIGINT))
               END AS qv
        FROM e
    ),
    t2 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY dot_q DESC, neighbor_id) AS rnk
            FROM (
                SELECT t1.query_id, t1.neighbor_id,
                       list_sum(list_transform(
                           list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS dot_q
                FROM t1
                JOIN qz a ON a.vec_id = t1.query_id
                JOIN qz b ON b.vec_id = t1.neighbor_id
            )
        ) WHERE rnk <= {_CASCADE_T2}
    ),
    t3 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, neighbor_id) AS rnk
            FROM (
                SELECT t2.query_id, t2.neighbor_id,
                       round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
                FROM t2
                JOIN e a ON a.vec_id = t2.query_id
                JOIN e b ON b.vec_id = t2.neighbor_id
            )
        ) WHERE rnk <= {_CASCADE_K}
    ),
    per_q AS (
        SELECT x.query_id,
               COUNT(*) AS n_exact,
               SUM(CASE WHEN c.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 AS n_overlap
        FROM exact_top x
        LEFT JOIN t3 c
          ON c.query_id = x.query_id AND c.neighbor_id = x.neighbor_id
        GROUP BY x.query_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST({_CASCADE_T1} AS BIGINT) AS tier1_kept,
           CAST({_CASCADE_T2} AS BIGINT) AS tier2_kept,
           round(CAST(SUM(n_overlap) AS DOUBLE) / SUM(n_exact), 6)
             AS mean_recall_at_10,
           CAST(MIN(n_overlap) AS BIGINT) AS min_overlap,
           CAST(SUM(CASE WHEN n_overlap = n_exact THEN 1 ELSE 0 END) AS BIGINT)
             AS n_perfect
    FROM per_q
    """,
)
def retrieval_cascade_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ANN retrieval cascade with a recall gate (r12 VERDICT
    #7c): tier 1 scores the WHOLE corpus with 1-bit sign state (packed
    int64 XOR popcount — 64x less broadcast state than doubles) and
    keeps {t1} candidates per query; tier 2 rescores only those with
    the int8 integer dot (8x less state, exact integer score); tier 3
    reranks the surviving {t2} with the exact double cosine and returns
    top-{k}.  Recall@{k} against the exact brute-force top-{k} is the
    released gate, with the funnel widths as columns so the cost/recall
    trade is auditable (the per-tier gates
    ``binary_quantize_hamming_topk`` / ``int8_quantized_dot_topk`` /
    ``ann_cosine_topk`` measure each tier alone; this is the composed
    path a retrieval stack actually serves).

    Every tier is deterministic exact arithmetic with neighbor_id
    tiebreaks, so the whole cascade is oracle-checkable — including
    the funnel's loss, which is the point of the gate.

    Scale shape: the corpus is scanned ONCE at 1 bit/dim per query
    batch (the only corpus-sized work); tiers 2-3 touch
    queries x {t1} / queries x {t2} rows — candidate-sized equi-joins
    back to the vector table on vec_id, never corpus x corpus.  The
    exact brute-force reference column is the EVALUATION, not the
    serving path (at 100 TB it runs on a sampled query set exactly as
    here, where queries are vec_id % 100)."""
    return retrieval_cascade_run(spark, sf_dir)


def retrieval_cascade_run(
    spark: SparkSession, sf_dir: str, query_max_id: int | None = None
) -> DataFrame:
    """Parameterized cascade (VERDICT r13 #7): ``query_max_id`` PINS the
    evaluation budget — queries become vec_id % 100 == 0 AND vec_id <=
    query_max_id, the production gate SCALE.md describes (a fixed query
    set, so the tier-1 scan and the eval tier grow linearly in CORPUS
    size instead of quadratically when both sides grow).  None keeps
    the registered fraction-sampled set."""
    e0 = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # r16 OPT (guide 2.3, shuffle/compute fewer bytes): the L2 norm is a
    # PER-VECTOR quantity, but the cosine HOF used to recompute both
    # sides' sqrt(sum x^2) PER PAIR — in the exact evaluation tier that
    # is ~|queries| redundant norm passes over every corpus vector.
    # Precompute it once per row; `dot / (nrm_a * nrm_b)` evaluates the
    # exact same doubles in the same order as the inlined form (sqrt of
    # the identical aggregate, then the identical multiply/divide), so
    # every rounded score is bit-identical.  `nrm > 0` keeps the same
    # rows as `sum x^2 > 0` (sqrt is strictly monotone from 0, and a
    # NaN fails both).  brute_force_topk set the precedent in r12.
    en = e0.select(
        "vec_id",
        "v",
        F.expr("sqrt(aggregate(v, 0D, (a, x) -> a + x * x))").alias("nrm"),
    )
    e = en.filter(F.col("nrm") > 0)
    qbase = e.filter(F.col("vec_id") % 100 == 0)
    if query_max_id is not None:
        qbase = qbase.filter(F.col("vec_id") <= int(query_max_id))
    q = qbase.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    dot = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (a, b) -> a + b)"
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )

    # exact reference top-k (the evaluation tier)
    exact_scored = corpus.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(
            F.expr(dot.format(a="qv", b="cv")) / (F.col("qn") * F.col("cn")), 6
        ).alias("cos_sim"),
    )
    w_desc = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    exact_top = (
        exact_scored.withColumn("rnk", F.row_number().over(w_desc))
        .filter(F.col("rnk") <= _CASCADE_K)
        .select("query_id", "neighbor_id")
    )

    # tier 1: packed sign bits, hamming top-T1 over the corpus
    packed = (
        "aggregate(zip_with({c}, sequence(0, size({c}) - 1),"
        " (x, i) -> IF(x > 0D, shiftleft(1L, i), 0L)), 0L, (a, b) -> a | b)"
    )
    qbits = q.select(
        "query_id", F.expr(packed.format(c="qv")).alias("qbits")
    )
    cbits = corpus.select(
        "neighbor_id", F.expr(packed.format(c="cv")).alias("cbits")
    )
    w_ham = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    t1 = (
        cbits.join(F.broadcast(qbits), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.bit_count(F.col("qbits").bitwiseXOR(F.col("cbits")))
            .cast("long")
            .alias("hamming"),
        )
        .withColumn("rnk", F.row_number().over(w_ham))
        .filter(F.col("rnk") <= _CASCADE_T1)
        .select("query_id", "neighbor_id")
    )

    # int8 quantization (shared by query and candidate sides of tier 2)
    withmax = e.select(
        "vec_id",
        "v",
        F.expr("aggregate(v, 0D, (a, x) -> greatest(a, abs(x)))").alias("maxabs"),
    )
    qz = withmax.select(
        "vec_id",
        F.expr(
            "CASE WHEN maxabs = 0D THEN transform(v, x -> 0L)"
            " ELSE transform(v, x -> CAST(floor(127 * x / maxabs + 0.5D)"
            " AS BIGINT)) END"
        ).alias("qv8"),
    )

    # tier 2: integer dot over tier-1 survivors only
    t2 = (
        t1.join(
            qz.select(F.col("vec_id").alias("query_id"), F.col("qv8").alias("qa")),
            "query_id",
        )
        .join(
            qz.select(
                F.col("vec_id").alias("neighbor_id"), F.col("qv8").alias("qb")
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.expr(
                "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (a, b) -> a + b)"
            ).alias("dot_q"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("dot_q"), F.col("neighbor_id")
                )
            ),
        )
        .filter(F.col("rnk") <= _CASCADE_T2)
        .select("query_id", "neighbor_id")
    )

    # tier 3: exact cosine rerank of tier-2 survivors (precomputed norms
    # ride in on the same candidate-sized joins — see the r16 OPT note)
    t3 = (
        t2.join(
            e.select(
                F.col("vec_id").alias("query_id"),
                F.col("v").alias("av"),
                F.col("nrm").alias("an"),
            ),
            "query_id",
        )
        .join(
            e.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("v").alias("bv"),
                F.col("nrm").alias("bn"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.expr(dot.format(a="av", b="bv")) / (F.col("an") * F.col("bn")),
                6,
            ).alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(w_desc))
        .filter(F.col("rnk") <= _CASCADE_K)
        .select(
            F.col("query_id").alias("c_query"),
            F.col("neighbor_id").alias("c_neighbor"),
        )
    )

    per_q = (
        exact_top.join(
            t3,
            (exact_top["query_id"] == t3["c_query"])
            & (exact_top["neighbor_id"] == t3["c_neighbor"]),
            "left",
        )
        .select(
            exact_top["query_id"].alias("qid"),
            F.col("c_neighbor").isNotNull().cast("int").alias("hit"),
        )
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum("hit").alias("n_overlap"),
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.lit(_CASCADE_T1).cast("long").alias("tier1_kept"),
        F.lit(_CASCADE_T2).cast("long").alias("tier2_kept"),
        F.round(
            F.sum("n_overlap").cast("double") / F.sum("n_exact"), 6
        ).alias("mean_recall_at_10"),
        F.min("n_overlap").cast("long").alias("min_overlap"),
        F.sum(
            F.when(F.col("n_overlap") == F.col("n_exact"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_perfect"),
    )


retrieval_cascade_recall.__doc__ = (
    retrieval_cascade_recall.__doc__.replace("{t1}", str(_CASCADE_T1))
    .replace("{t2}", str(_CASCADE_T2))
    .replace("{k}", str(_CASCADE_K))
)


# ---------------------------------------------------------------------------
# Round 14: Johnson-Lindenstrauss sign-projection distortion audit.
# ---------------------------------------------------------------------------

_JL_K = 16  # projected dimensions


@_register(
    "jl_projection_distortion",
    f"""
    WITH a AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE vec_id % 100 = 0
    ),
    b AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    pr AS (
        SELECT a.vec_id AS pair_id, a.v AS va, b.v AS vb
        FROM a JOIN b ON b.vec_id = a.vec_id + 1
    ),
    diffs AS (
        -- 6dp-quantized coordinate difference in INTEGER MICRO-UNITS:
        -- all downstream squares/sums are HUGEINT-exact at any input
        -- magnitude (the 1e12 unit scales cancel in the final ratio)
        SELECT pair_id, i - 1 AS i,
               CAST(CAST(round(va[i] - vb[i], 6) AS DECIMAL(25,6))
                    * CAST(1000000 AS DECIMAL(7,0)) AS HUGEINT) AS du
        FROM pr, unnest(generate_series(1, len(va))) AS t(i)
    ),
    den AS (
        SELECT pair_id, CAST(SUM(du * du) AS HUGEINT) AS dd
        FROM diffs GROUP BY pair_id
    ),
    proj AS (
        SELECT pair_id, j,
               CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(
                          'jl:' || CAST(j AS VARCHAR) || ':'
                                || CAST(i AS VARCHAR)), 1, 1)) AS INT)
                         % 2 = 0 THEN du ELSE -du END)
                    AS HUGEINT) AS dy
        FROM diffs, unnest(generate_series(0, {_JL_K - 1})) AS s(j)
        GROUP BY pair_id, j
    ),
    num AS (
        SELECT pair_id, CAST(SUM(dy * dy) AS HUGEINT) AS yy
        FROM proj GROUP BY pair_id
    ),
    ratio AS (
        SELECT n.pair_id,
               CAST(round((CAST(n.yy AS DOUBLE) / CAST(d.dd AS DOUBLE))
                          / {_JL_K}, 6) AS DECIMAL(12,6)) AS r
        FROM num n JOIN den d ON d.pair_id = n.pair_id
        WHERE d.dd > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST({_JL_K} AS BIGINT) AS k,
           round(CAST(SUM(r) AS DOUBLE) / COUNT(*), 6) AS mean_distortion,
           CAST(MIN(r) AS DOUBLE) AS min_distortion,
           CAST(MAX(r) AS DOUBLE) AS max_distortion
    FROM ratio
    """,
)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss distortion audit (JL 1984; Achlioptas 2003
    database-friendly +-1 projections — public) for a k={k} sign
    projection of the embedding space: for a deterministic sample of
    vector pairs (vec_id % 100 == 0 paired with its successor), release
    the squared-distance distortion ||P(a-b)||^2 / (k * ||a-b||^2) —
    mean/min/max over pairs.  E[distortion] = 1 EXACTLY for Rademacher
    signs (the audit every random-projection index should publish
    before trading 64 float dims for {k}); the signs come from a
    deterministic md5 lane so both engines use the SAME matrix.

    Determinism: coordinate differences round once to 6dp and become
    DECIMAL; the projection is sign-flipped EXACT DECIMAL addition
    (projecting the difference directly — linearity — so no per-vector
    rounding); numerator/denominator square-sums are exact DECIMALs;
    ONE double division per pair at the edge, 6dp.

    Scale shape: pairs x dim x k rows ~ sampled-pairs-bounded (the
    eval-tier convention: the audit runs on a pinned sample at any
    corpus size); two grouped exact sums and a 1-row final aggregate.
    Output: one row."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("pair_id"), F.col("v").alias("va")
    )
    b = e.select((F.col("vec_id") - 1).alias("pair_id"), F.col("v").alias("vb"))
    pr = a.join(b, "pair_id")
    # 6dp-quantized difference in INTEGER MICRO-UNITS (decimal-exact
    # x1e6, lossless scale drop): squares and sums stay exact DECIMAL
    # integers at any input magnitude, and the unit scale cancels in
    # the final ratio — the HUGEINT convention from wasserstein
    diffs = pr.select(
        "pair_id",
        F.posexplode(F.zip_with("va", "vb", lambda x, y: x - y)).alias(
            "i", "draw"
        ),
    ).select(
        "pair_id",
        "i",
        (
            F.round(F.col("draw"), 6).cast("decimal(16,6)")
            * F.lit(1000000).cast("decimal(7,0)")
        )
        .cast("decimal(19,0)")
        .alias("du"),
    )
    den = diffs.groupBy("pair_id").agg(
        F.sum(F.col("du") * F.col("du")).cast("decimal(38,0)").alias("dd")
    )
    ks = spark.range(_JL_K).select(F.col("id").cast("int").alias("j"))
    sign_even = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("jl:"),
                        F.col("j").cast("string"),
                        F.lit(":"),
                        F.col("i").cast("string"),
                    )
                ),
                1,
                1,
            ),
            16,
            10,
        ).cast("int")
        % 2
        == 0
    )
    proj = (
        diffs.crossJoin(F.broadcast(ks))
        .select(
            "pair_id",
            "j",
            F.when(sign_even, F.col("du")).otherwise(-F.col("du")).alias("t"),
        )
        .groupBy("pair_id", "j")
        .agg(F.sum("t").cast("decimal(19,0)").alias("dy"))
    )
    num = proj.groupBy("pair_id").agg(
        F.sum(F.col("dy") * F.col("dy")).cast("decimal(38,0)").alias("yy")
    )
    ratio = (
        num.join(den, "pair_id")
        .filter(F.col("dd") > 0)
        .select(
            F.round(
                (F.col("yy").cast("double") / F.col("dd").cast("double"))
                / F.lit(_JL_K),
                6,
            )
            .cast("decimal(12,6)")
            .alias("r")
        )
    )
    return ratio.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.lit(_JL_K).cast("long").alias("k"),
        F.round(F.sum("r").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_distortion"
        ),
        F.min("r").cast("double").alias("min_distortion"),
        F.max("r").cast("double").alias("max_distortion"),
    )


jl_projection_distortion.__doc__ = jl_projection_distortion.__doc__.replace(
    "{k}", str(_JL_K)
)

"""Similarity search over embedding columns (BASELINE.json north star:
"similarity search").

Three tiers, trading recall for scale:

1. ``brute_force_topk`` — exact: query set x full corpus.  Right when the
   query set is small (it broadcasts) or as the ground-truth baseline.
   Cost: |Q| * |corpus| cosines, embarrassingly parallel, no shuffle of
   the corpus (queries are broadcast to it).
2. ``blocked_pairs`` — exact within a blocking key (label, LSH bucket,
   IVF cell): turns O(n^2) into sum of per-block squares via one
   equi-join on the block key.
3. ``lsh_bucketed_topk`` — approximate: random-hyperplane signatures
   (deterministic md5-derived planes) bucket the corpus; queries only
   scan their own bucket.  The 100 TB path: bucket assignment is a narrow
   map, search is a per-bucket join.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, cosine, dot, norm

ROUND_DIGITS = 6  # kill last-ulp double divergence across engines


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors (cosine) of each query against the corpus.
    Queries are broadcast; ranking uses (cos desc, id asc) so the result
    is deterministic including k-boundary ties.

    Norms are computed ONCE per row before the join (cosine = dot /
    (qnorm * cnorm)); inside the |Q| x |corpus| cross space only the dot
    fold remains — same bits as folding cosine per pair (the norm
    subexpressions are identical), a third of the per-pair work."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    ).withColumn("qnorm", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    ).withColumn("cnorm", norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")),
                ROUND_DIGITS,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def blocked_pairs(
    corpus: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact near-dup pairs within each block: equi-join on the block key,
    id_a < id_b, cosine >= threshold."""
    a = corpus.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_a"),
        as_double(vec_col).alias("va"),
    ).withColumn("na", norm(F.col("va")))
    b = corpus.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id_b"),
        as_double(vec_col).alias("vb"),
    ).withColumn("nb", norm(F.col("vb")))
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                ROUND_DIGITS,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def hyperplane_bucket(vec_col, num_planes: int = 8, dim: int = 64):
    """Deterministic random-hyperplane LSH bucket id (0..2^num_planes-1).

    Plane p's d-th component is +1/-1 from the parity of the first hex
    digit of md5('p:d') — reproducible anywhere, no stored model.  The
    bucket id is the sign pattern of the vector against all planes.
    """
    v = as_double(vec_col) if isinstance(vec_col, str) else vec_col

    def plane_sign(p: int, d: int) -> int:
        import hashlib

        h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
        return 1 if int(h[0], 16) % 2 == 0 else -1

    bucket = F.lit(0)
    for p in range(num_planes):
        signs = [plane_sign(p, d) for d in range(dim)]
        proj = F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(float(s)) for s in signs]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    At scale, bucket the corpus once (narrow map, optionally written
    bucket-partitioned) and search becomes an equi-join on bucket id."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(vec_col).alias("qv"),
        hyperplane_bucket(vec_col, num_planes, dim).alias("bucket"),
    ).withColumn("qnorm", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("cv"),
        hyperplane_bucket(vec_col, num_planes, dim).alias("bucket"),
    ).withColumn("cnorm", norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")),
                ROUND_DIGITS,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) cells: KMeans partitions
    the corpus into ``n_cells`` Voronoi cells; each query probes only its
    ``nprobe`` nearest cells.

    Scale shape: the coarse quantizer is tiny (n_cells centroids, fit on
    a sample), cell assignment is a narrow map over the corpus (write the
    corpus partitioned by cell to make this a one-time cost), and search
    is an equi-join on cell id — candidates drop from |corpus| to
    ~nprobe/n_cells of it.  Recall is tunable via nprobe.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv")
    ).withColumn("cnorm", norm(F.col("cv"))).withColumn("fv", array_to_vector("cv"))
    km = KMeans(k=n_cells, seed=seed, featuresCol="fv", predictionCol="cell")
    model = km.fit(c.select("fv"))
    assigned = model.transform(c).drop("fv")

    centers = model.clusterCenters()
    spark = corpus.sparkSession
    centers_df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(centers)],
        "cell int, center array<double>",
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv")
    ).withColumn("qnorm", norm(F.col("qv")))
    cell_w = Window.partitionBy("query_id").orderBy(F.desc("center_cos"), F.col("cell"))
    probes = (
        q.join(F.broadcast(centers_df))
        .withColumn("center_cos", cosine(F.col("qv"), F.col("center")))
        .withColumn("cell_rank", F.row_number().over(cell_w))
        .filter(F.col("cell_rank") <= nprobe)
        .select("query_id", "qv", "qnorm", "cell")
    )

    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm")),
                ROUND_DIGITS,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def brute_force_topk_vectorized(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k like ``brute_force_topk`` but scoring in a vectorized
    Arrow pandas_udf: each batch computes a numpy matrix-vector product
    instead of a per-row Catalyst fold — the fast path when the scoring
    math outgrows SQL expressions (the exact-fold variant stays the
    oracle tier; numpy reassociates floating adds, so last-ulp values may
    differ)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos_batch(qv: pd.Series, cv: pd.Series) -> pd.Series:
        q = np.asarray(qv.tolist(), dtype=np.float64)
        c = np.asarray(cv.tolist(), dtype=np.float64)
        num = np.einsum("ij,ij->i", q, c)
        den = np.linalg.norm(q, axis=1) * np.linalg.norm(c, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(den > 0, num / den, 0.0)
        return pd.Series(out)

    q = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"))
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cos_batch(F.col("qv"), F.col("cv")), ROUND_DIGITS).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )

"""Cross-engine parity on a hostile EMBEDDINGS corpus.

Fourth member of the hostile-fixture family: vectors that stress the
similarity stack — the ZERO VECTOR (undefined cosine: every norm product
is 0), exactly identical vectors (cos 1 ties everywhere), exact
opposites (cos -1), one-hot axes, tiny (1e-30) and huge (1e30)
magnitudes (the engine's DECIMAL(18,9) moment pipelines document a
|x| <= ~1e6 input contract — values beyond it fail LOUD under ANSI
rather than silently corrupting, which is the intended behavior), and a
constant dimension (zero variance for the covariance/PCA family) —
replayed through the registered similarity query/oracle pairs with the
driver's comparator.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE
from tests.parity import TESTDATA_TABLES, compare

DIM = 64


def _vec(fill=0.0, **at):
    v = [fill] * DIM
    for idx, val in at.items():
        v[int(idx[1:])] = val
    return [float(x) for x in v]


# (vec_id, embedding, label) — vec_id 0 and 100 are query ids (% 100 == 0)
HOSTILE_EMBEDDINGS = [
    (0, _vec(d0=1.0, d1=2.0, d2=-1.0), 1),      # a query vector
    (1, _vec(), 1),                              # THE zero vector
    (2, _vec(d0=1.0, d1=2.0, d2=-1.0), 2),      # identical to the query
    (3, _vec(d0=-1.0, d1=-2.0, d2=1.0), 2),     # exact opposite
    (4, _vec(d5=1.0), 3),                        # one-hot
    (5, _vec(d5=1e-30), 3),                      # tiny magnitude
    (6, _vec(d5=1e6), 4),                        # huge magnitude (contract cap)
    (7, _vec(fill=0.5), 4),                      # constant vector
    (8, _vec(fill=0.5), 5),                      # duplicate of 7, other label
    (9, _vec(d9=3.0, d10=4.0), 5),
    (100, _vec(d9=3.0, d10=4.0), 6),             # second query, dup of 9
    (101, _vec(d0=1e6, d1=1e6), 6),              # huge two-axis
    (102, _vec(), 7),                            # second zero vector
    (103, _vec(d63=-2.5), 7),                    # last-dimension only
]

_EMBED_PANEL = [
    # r12 linear CKA: zero vectors are legitimate rows (centering
    # handles them); duplicate vectors inflate covariance identically;
    # the all-zero dimension gives exact-0 covariance entries whose
    # -0.0 normalization must agree after rounding
    "linear_cka_truncation",
    # r14 JL audit: identical consecutive vectors give a zero
    # difference (dd = 0 -> pair EXCLUDED identically); zero vectors
    # are fine (the diff is what projects); the md5 sign lane and the
    # 6dp diff quantization must agree bit-for-bit on hostile values
    "jl_projection_distortion",
    # r11 MNN: zero vectors must drop from BOTH halves identically;
    # identical/opposite vectors give cos exactly +/-1; labels whose
    # even or odd half is empty must emit no candidates on either
    # engine; mutuality ties break on the rounded cosine + id
    "mutual_nearest_neighbors",
    # r11 exact k-means: the zero vector and duplicate vectors are
    # legitimate members (L2 is defined everywhere); seeds pin to the
    # 4 smallest ids; equidistant duplicates must tiebreak on cluster
    # id identically through all 3 exact-DECIMAL iterations
    "kmeans_fixed_iterations_exact",
    # r11 kNN-LOO: the zero vector drops from queries AND candidates;
    # duplicate vectors give cos exactly 1.0 (pure cid tiebreaks);
    # vote ties on tiny hostile corpora break to the smallest label
    "knn_loo_label_accuracy",
    "ann_cosine_topk",
    "embedding_near_dup_blocked",
    "binary_quantize_hamming_topk",
    "int8_quantized_dot_topk",
    "embedding_dim_stats",
    "embedding_norm_outliers",
    "embedding_label_centroids",
    "embedding_covariance_matrix",
    "hard_negative_mining_topk",
    # MMR consumes the exact-top-k pool + pairwise candidate cosines:
    # zero vectors must drop identically and duplicate vectors (sim
    # 1.0) are exactly the redundancy the greedy must handle
    "mmr_rerank_topk",
    # the recall eval composes the exact and int8 tiers: zero-norm
    # query exclusion and all-tied dot products must agree exactly
    "int8_recall_vs_exact",
    # truncation gate: vectors zero in the first 16 dims but nonzero
    # overall must drop from the truncated tier identically
    "matryoshka_truncation_recall",
    # r9 IVF probe curve: zero-norm vectors must drop from queries AND
    # candidates, zero-sum centroids must drop from the codebook, and
    # every rank (cells and neighbors) must tie-break identically
    "ivf_label_cells_recall_curve",
    # r9 conformal calibration: zero-norm members, zero-sum centroids
    # and all-tied scores must select the same k-th order statistic
    "conformal_calibration_quantile",
    # LOO centroids under singleton labels (S - v = 0 -> NULL own
    # cosine -> n_undefined) and zero vectors
    "label_noise_centroid_disagreement",
    # fused-list MRR under zero vectors and duplicate embeddings
    "rrf_mrr_vs_dense",
    # r10 SemDeDup: zero-norm vectors must stay singleton prototypes
    # with NULL centroid cosine (NULLS FIRST rank on both engines),
    # identical vectors (cos 1.0) must component-merge, and the
    # keep-lowest-centroid-cosine rule must tie-break identically
    "semdedup_embedding_prototypes",
    # r15 sharded tier: the md5 lane split must replay exactly on
    # hostile ids, and zero-norm / identical-vector behavior is
    # inherited (lanes only ever REMOVE pair edges)
    "semdedup_sharded_prototypes",
    # r10 isotropy: zero vectors drop, exact opposites cancel in the
    # sum vector, huge/tiny magnitudes normalize away — the closed-form
    # pairwise mean must match the oracle on all of it
    "embedding_isotropy_report",
    # r10 power iteration: the hostile covariance has huge-magnitude
    # and constant dimensions; the rounded-matrix iterate, the
    # zero-iterate guard and the Rayleigh ratio must replay exactly
    "covariance_power_iteration",
    # r11 cross-split decontamination: zero-norm vectors drop from BOTH
    # sides, identical train/eval vectors hit at cos exactly 1.0, and
    # cells whose every member is eval (or every member train) must
    # produce no hits identically
    "embedding_decontaminate_split",
    # r11 Gonzalez k-center: null/ragged vectors yield NULL distances
    # (NULLS LAST on both engines, never chosen while finite candidates
    # remain), duplicate vectors give dmin exactly 0, huge magnitudes
    # dominate the max-norm seed — the rounded-distance argmax chain
    # must replay identically through all five unrolled selections
    "kcenter_coreset_embeddings",
    # r13 end-to-end cascade: zero vectors drop from every tier
    # identically; identical/opposite vectors tie at hamming 0/64 and
    # dot +/-max (pure neighbor_id tiebreaks through three funnels);
    # with fewer corpus rows than the tier-1 width the funnel passes
    # everything and recall must be exactly 1.0 on both engines
    "retrieval_cascade_recall",
]


@pytest.fixture(scope="module")
def hostile_embed_dir(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("hostile_embed")
    for t in TESTDATA_TABLES:
        if t != "embeddings":
            os.symlink(f"{SF_SMOKE}/{t}.parquet", root / f"{t}.parquet")
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in HOSTILE_EMBEDDINGS], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in HOSTILE_EMBEDDINGS], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in HOSTILE_EMBEDDINGS], pa.int32()),
        }
    )
    pq.write_table(tbl, root / "embeddings.parquet")
    return str(root)


@pytest.mark.parametrize("name", _EMBED_PANEL)
def test_similarity_family_parity_on_hostile_vectors(spark, hostile_embed_dir, name):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert name in queries and name in oracles, f"{name} not registered"
    problems = compare(
        queries[name](spark, hostile_embed_dir), oracles[name], hostile_embed_dir
    )
    assert not problems, f"{name} on hostile vectors: {problems}"

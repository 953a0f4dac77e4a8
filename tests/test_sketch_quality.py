"""Error-bound tests for the approximate/sketch tier.

These queries are rows-only in the driver contract (approximate results
have no DuckDB hash twin), so "runs and returns rows" was their only
check.  That is too weak: each sketch publishes a mathematical
guarantee, and these tests assert it against the exact counterpart on
the same data.

- HLL++ (``approx_count_distinct``, rsd=0.01): relative standard error
  is the rsd parameter; we allow 5 sigma, far beyond any plausible
  realization for a deterministic hash on fixed data.
- DataSketches HLL (``hll_sketch_agg``, default lgConfigK=12): published
  RSE is about 1.04/sqrt(2^12) ~ 1.6%; we allow 5x.
- Count-Min (eps=1%, conf=99%): estimates NEVER undercount, and
  overcount by at most eps*N with probability 1-delta.  We assert the
  one-sided bound exactly and the width bound at its published value.
- GK percentile sketch (``percentile_approx``, accuracy=10000): the
  returned value is an actual data point whose rank differs from the
  target rank by at most n/accuracy (+1 for discreteness).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from tests.conftest import SF_SMOKE

_HLL_TOL = 0.05  # 5x the ~1% published RSE of both HLL variants


def _lineitem(spark):
    return spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")


def test_approx_count_distinct_within_published_rsd(spark):
    est = {
        r["l_returnflag"]: r["approx_distinct_parts"]
        for r in relational.QUERIES["approx_count_distinct_parts"](
            spark, SF_SMOKE
        ).collect()
    }
    exact = {
        r["l_returnflag"]: r["d"]
        for r in _lineitem(spark)
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for flag, d in exact.items():
        assert abs(est[flag] - d) <= _HLL_TOL * d + 1, (flag, est[flag], d)


def test_hll_native_union_within_published_rse(spark):
    rows = {
        r["l_returnflag"]: r["distinct_parts"]
        for r in relational.QUERIES["hll_native_union_distinct"](
            spark, SF_SMOKE
        ).collect()
    }
    l = _lineitem(spark)
    exact = {
        r["l_returnflag"]: r["d"]
        for r in l.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    exact["ALL"] = l.select("l_partkey").distinct().count()
    assert set(rows) == set(exact)
    for key, d in exact.items():
        assert abs(rows[key] - d) <= _HLL_TOL * d + 1, (key, rows[key], d)
    # a union can never estimate below its largest input sketch
    assert rows["ALL"] >= max(v for k, v in rows.items() if k != "ALL")


def test_hll_sketch_grand_total_within_published_rse(spark):
    est = relational.QUERIES["hll_sketch_distinct_parts"](spark, SF_SMOKE).collect()[
        0
    ]["approx_total_parts"]
    exact = _lineitem(spark).select("l_partkey").distinct().count()
    assert abs(est - exact) <= _HLL_TOL * exact + 1, (est, exact)


def test_count_min_sketch_overestimate_only_and_width_bound(spark):
    """Replays the registered query's exact sketch parameters
    (eps=0.01, conf=0.99, seed=42), deserializes the sketch bytes
    through the same JVM class the aggregate serialized with, and
    checks the CMS contract per key: exact <= estimate <= exact+eps*N."""
    eps = 0.01
    l = _lineitem(spark)
    row = l.agg(
        F.count_min_sketch(
            "l_returnflag", F.lit(eps), F.lit(0.99), F.lit(42)
        ).alias("cms"),
        F.count("*").alias("n"),
    ).collect()[0]
    sk = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(row["cms"])
    )
    exact = {
        r["l_returnflag"]: r["c"]
        for r in l.groupBy("l_returnflag").agg(F.count("*").alias("c")).collect()
    }
    for flag, c in exact.items():
        est = sk.estimateCount(flag)
        assert c <= est <= c + eps * row["n"], (flag, c, est)
    # the registered query is the md5-lane oracle-paired twin: one row
    # per flag, estimate >= exact (CMS overcounts only, never under)
    out = relational.QUERIES["count_min_sketch_flag_freq"](spark, SF_SMOKE).collect()
    assert {r["l_returnflag"] for r in out} == set(exact)
    for r in out:
        assert r["exact_count"] == exact[r["l_returnflag"]]
        assert r["cms_estimate"] >= r["exact_count"], r


def test_percentile_approx_rank_error_bound(spark):
    """GK sketch guarantee: each returned quantile is a real data value
    whose rank is within n/accuracy of the target rank."""
    accuracy = 10000  # must match approx_percentiles_price
    got = {
        float(r["q"]): r["value"]
        for r in relational.QUERIES["approx_percentiles_price"](
            spark, SF_SMOKE
        ).collect()
    }
    vals = sorted(
        r["o_totalprice"]
        for r in spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .select("o_totalprice")
        .collect()
    )
    n = len(vals)
    slack = n / accuracy + 1
    for q, v in got.items():
        assert v in vals, (q, v)  # an actual data point, not an interpolation
        lo = sum(1 for x in vals if x < v)  # min rank of v (0-based)
        hi = sum(1 for x in vals if x <= v)  # max rank of v
        target = q * (n - 1)
        assert lo - slack <= target <= hi + slack, (q, v, lo, hi, target)


def test_logreg_label_probe_shows_no_geometric_leakage(spark):
    """The label-predictability probe's contract on this corpus: the
    synthetic labels are independent of embedding geometry, so held-out
    accuracy must sit at chance (within a generous band) while the
    model still fits its training fold well above chance — i.e. the
    probe has capacity AND correctly reports 'no leakage'."""
    from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational

    r = relational.QUERIES["ml_logreg_embedding_classifier"](
        spark, SF_SMOKE
    ).collect()[0]
    chance = 1.0 / r.n_classes
    assert r.n_classes == 10
    assert r.n_train + r.n_test == 500
    assert r.train_accuracy > 2 * chance  # capacity: fits its own fold
    assert r.test_accuracy < 3 * chance  # no geometric signal leaks


def test_power_iteration_rayleigh_bounds(spark):
    """The power-iteration Rayleigh quotient must sit inside the true
    spectrum of the (same, rounded) covariance matrix — above the
    uniform-start floor (trace/dim minus rounding slack, since the
    quotient is monotone nondecreasing in steps from v0) and below the
    top eigenvalue — and the iterate must be unit-norm."""
    import numpy as np

    rows = relational.QUERIES["covariance_power_iteration"](
        spark, SF_SMOKE
    ).collect()
    v = np.array([r.component for r in sorted(rows, key=lambda r: r.dim)])
    ray = rows[0].rayleigh
    cov_rows = relational.QUERIES["embedding_covariance_matrix"](
        spark, SF_SMOKE
    ).collect()
    d = max(r.dim_j for r in cov_rows) + 1
    C = np.zeros((d, d))
    for r in cov_rows:
        C[r.dim_i, r.dim_j] = C[r.dim_j, r.dim_i] = r.cov
    w = np.linalg.eigvalsh(C)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4, np.linalg.norm(v)
    assert ray <= w[-1] + 1e-6, (ray, w[-1])
    assert ray >= C.trace() / d - 1e-4, (ray, C.trace() / d)


def test_hll_md5_registers_rel_err_within_3_sigma(spark):
    """The from-scratch md5-register HLL must actually estimate: the
    released rel_err column stays within 3x the published RSE
    (1.04/sqrt(m), Flajolet et al. 2007).  Guards the rho off-by-one
    class (ADVICE r12 high: register = 52 - floor(log2(2v+1)) computes
    leading zeros, not rank, doubling the harmonic sum and halving the
    estimate to rel_err ~ -0.5 — a defect oracle parity CANNOT see
    because both engines shared the formula, and the 6-distinct hostile
    fixture only exercises the linear-counting fallback)."""
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import _HLL_M

    bound = 3 * 1.04 / (_HLL_M ** 0.5)
    for sf_dir in (SF_SMOKE, "/root/testdata/sf0.01"):
        r = relational.QUERIES["hll_md5_registers_distinct"](
            spark, sf_dir
        ).collect()[0]
        assert abs(r.rel_err) <= bound, (sf_dir, r.rel_err, bound)
        assert abs(r.hll_estimate - r.exact_distinct) <= bound * r.exact_distinct + 1


# ---------------------------------------------------------------------------
# Round-14 published-bound sweep (VERDICT r13 #2): every RELEASED
# accuracy/error column gets a test asserting its PUBLISHED bound or an
# independent (third-implementation) recomputation — the generalized HLL
# lesson: oracle parity cannot catch a formula both engines share.
# ---------------------------------------------------------------------------


def test_bloom_fpr_calibration_within_binomial_band(spark):
    """bloom_fpr_calibration's released columns audited independently:
    (a) theoretical_fpr recomputed in Python from (m,k,n_members) must
    match the released column (formula-drift guard), (b) measured_fpr
    is Binomial(n_probes, p~theoretical) so it must sit within 3 sigma
    of theory (+ one-probe discreteness), and (c) fill_ratio must match
    its expectation 1-(1-1/m)^(k*n) within a 3-sigma Poisson-binomial
    band (Bloom 1970 / Mitzenmacher-Upfal)."""
    for sf_dir in (SF_SMOKE, "/root/testdata/sf0.01"):
        r = relational.QUERIES["bloom_fpr_calibration"](spark, sf_dir).collect()[0]
        m, k, n = r.m_bits, r.k_hashes, r.n_members
        p_theory = (1.0 - (1.0 - 1.0 / m) ** (k * n)) ** k
        assert abs(r.theoretical_fpr - round(p_theory, 6)) <= 1e-6, (
            sf_dir, r.theoretical_fpr, p_theory,
        )
        sigma = (p_theory * (1 - p_theory) / r.n_probes) ** 0.5
        assert abs(r.measured_fpr - p_theory) <= 3 * sigma + 1.0 / r.n_probes, (
            sf_dir, r.measured_fpr, p_theory, sigma, r.n_probes,
        )
        fill_theory = 1.0 - (1.0 - 1.0 / m) ** (k * n)
        fill_sigma = (fill_theory * (1 - fill_theory) / m) ** 0.5
        assert abs(r.fill_ratio - fill_theory) <= 3 * fill_sigma + 1.0 / m, (
            sf_dir, r.fill_ratio, fill_theory,
        )


def test_minhash_calibration_within_broder_variance_bound(spark):
    """minhash_estimate_calibration's released mean_abs_err audited
    against the Broder (1997) estimator variance: each signature
    agreement is Binomial(k=8, J), so sd(J_hat) = sqrt(J(1-J)/k)
    <= 1/(2*sqrt(k)) and E|J_hat - J| <= sd by Jensen.  The
    pair-weighted mean absolute error across all groups must stay
    within that bound plus a 3-sigma concentration term (|err| <= 1,
    so var of the N-pair mean <= 1/(4N))."""
    rows = relational.QUERIES["minhash_estimate_calibration"](
        spark, SF_SMOKE
    ).collect()
    n_pairs = sum(r.n_pairs for r in rows)
    assert n_pairs > 0
    weighted_mae = sum(r.n_pairs * r.mean_abs_err for r in rows) / n_pairs
    k = 8
    bound = 1.0 / (2 * k**0.5) + 1.5 / n_pairs**0.5
    assert weighted_mae <= bound, (weighted_mae, bound, n_pairs)
    # per-group sanity: estimates and true Jaccard live on [0,1]
    for r in rows:
        assert 0 <= r.n_eq <= k
        assert 0.0 <= r.mean_true_jaccard <= 1.0
        assert 0.0 <= r.mean_abs_err <= 1.0


def test_ddsketch_released_rel_err_within_alpha(spark):
    """ddsketch_quantiles_price's released rel_err must honor the
    published DDSketch guarantee (Masson/Rim/Lee VLDB 2019): the bucket
    representative 2*gamma^b/(gamma+1) is within alpha of every value
    in bucket b, and the probed bucket contains the exact rank-target
    value, so rel_err <= alpha (+ the 2dp rounding of est, bounded by
    0.005/exact).  The exact side is recomputed independently here with
    a driver-side sort (type-1 lower quantile at rank ceil(q*n))."""
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        _DDSKETCH_ALPHA,
        _DDSKETCH_QS,
    )

    rows = relational.QUERIES["ddsketch_quantiles_price"](spark, SF_SMOKE).collect()
    assert {float(r.q) for r in rows} == set(_DDSKETCH_QS)
    vals = sorted(
        float(x.o_totalprice)
        for x in spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .filter(F.col("o_totalprice") > 0)
        .select("o_totalprice")
        .collect()
    )
    import math

    n = len(vals)
    for r in rows:
        exact_indep = round(vals[math.ceil(r.q * n) - 1], 2)
        assert abs(float(r.exact) - exact_indep) < 0.005, (r.q, r.exact, exact_indep)
        slack = 0.005 / float(r.exact) + 1e-6
        assert r.rel_err <= _DDSKETCH_ALPHA + slack, (r.q, r.rel_err)
        assert abs(r.est / exact_indep - 1.0) <= _DDSKETCH_ALPHA + slack


def test_cascade_recall_column_matches_numpy_recompute(spark):
    """retrieval_cascade_recall's released mean_recall_at_10 recomputed
    by a THIRD implementation (numpy, no Spark expressions shared): the
    same funnel — packed sign bits -> hamming top-50 (neighbor_id-asc
    ties) -> int8 floor(127x/maxabs+0.5) integer dot top-20 -> exact
    cosine (6dp) top-10 — against the exact 6dp-cosine top-10.  A
    shared-formula defect in the recall arithmetic (the HLL-rho class)
    cannot hide from this."""
    import numpy as np

    from data_engineering_sf_mobile_food_facilities_public_spark.plans.similarity_search import (
        _CASCADE_K,
        _CASCADE_T1,
        _CASCADE_T2,
    )

    released = relational.QUERIES["retrieval_cascade_recall"](
        spark, SF_SMOKE
    ).collect()[0]

    raw = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in raw], dtype=np.int64)
    V = np.array([r.embedding for r in raw], dtype=np.float64)
    nz = (V * V).sum(axis=1) > 0
    ids, V = ids[nz], V[nz]
    order = np.argsort(ids)
    ids, V = ids[order], V[order]
    qmask = ids % 100 == 0
    qids = ids[qmask]
    assert released.n_queries == len(qids)

    bits = V > 0  # packed sign state, bitwise
    maxabs = np.abs(V).max(axis=1)
    qz = np.where(
        maxabs[:, None] == 0, 0, np.floor(127 * V / np.where(maxabs == 0, 1, maxabs)[:, None] + 0.5)
    ).astype(np.int64)
    norms = np.sqrt((V * V).sum(axis=1))

    def topk(scores, own_idx, k, desc):
        s = scores.copy().astype(np.float64)
        s[own_idx] = -np.inf if desc else np.inf
        key = -s if desc else s
        order = np.lexsort((ids, key))  # key asc, neighbor_id asc ties
        return order[:k]

    total_overlap, total_exact = 0, 0
    for qi in np.flatnonzero(qmask):
        cos = np.round(V @ V[qi] / (norms * norms[qi]), 6)
        exact_idx = set(topk(cos, qi, _CASCADE_K, desc=True))
        ham = (bits ^ bits[qi]).sum(axis=1).astype(np.float64)
        t1 = topk(ham, qi, _CASCADE_T1, desc=False)
        dots = (qz[t1] @ qz[qi]).astype(np.float64)
        t1_sorted = t1[np.lexsort((ids[t1], -dots))][:_CASCADE_T2]
        cos2 = np.round(V[t1_sorted] @ V[qi] / (norms[t1_sorted] * norms[qi]), 6)
        t3 = t1_sorted[np.lexsort((ids[t1_sorted], -cos2))][:_CASCADE_K]
        total_overlap += len(exact_idx & set(t3))
        total_exact += len(exact_idx)

    recall_indep = round(total_overlap / total_exact, 6)
    assert abs(released.mean_recall_at_10 - recall_indep) <= 1e-6, (
        released.mean_recall_at_10,
        recall_indep,
    )


def test_jl_distortion_unbiased_and_matches_numpy_recompute(spark):
    """jl_projection_distortion's released columns audited two ways:
    (a) third-implementation recompute — numpy rebuilds the md5 sign
    matrix, the 6dp-quantized differences, and the exact ratio
    arithmetic; every released column must match; (b) published moment
    bound — for Rademacher signs E[||Pd||^2/(k||d||^2)] = 1 exactly and
    Var <= 2/k per pair (Achlioptas 2003), so the mean over n pairs
    must sit within 3*sqrt(2/k)/sqrt(n) of 1."""
    import hashlib

    import numpy as np

    from data_engineering_sf_mobile_food_facilities_public_spark.plans.similarity_search import (
        _JL_K,
    )

    released = relational.QUERIES["jl_projection_distortion"](
        spark, "/root/testdata/sf0.01"
    ).collect()[0]

    raw = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    ratios = []
    for vid, va in raw.items():
        if vid % 100 != 0 or (vid + 1) not in raw:
            continue
        d = np.round(va - raw[vid + 1], 6)
        dd = float((d * d).sum())
        if dd <= 0:
            continue
        yy = 0.0
        for j in range(_JL_K):
            s = np.array(
                [
                    1
                    if int(hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()[0], 16)
                    % 2
                    == 0
                    else -1
                    for i in range(len(d))
                ]
            )
            dy = float((s * d).sum())
            yy += dy * dy
        ratios.append(round((yy / dd) / _JL_K, 6))
    assert released.n_pairs == len(ratios)
    assert abs(released.mean_distortion - round(sum(ratios) / len(ratios), 6)) <= 1e-6
    assert abs(released.min_distortion - min(ratios)) <= 1e-9
    assert abs(released.max_distortion - max(ratios)) <= 1e-9
    band = 3 * (2 / _JL_K) ** 0.5 / len(ratios) ** 0.5
    assert abs(released.mean_distortion - 1.0) <= band, (
        released.mean_distortion,
        band,
    )

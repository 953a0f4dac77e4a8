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

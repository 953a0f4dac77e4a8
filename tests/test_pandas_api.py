"""Pandas API on Spark (pyspark.pandas): the migration surface for the
reference's pandas transform layer (SURVEY.md section 3.3 — ALL its
normalization happens in driver-side pandas, /root/reference/airflow.py
pandas blocks).  The same idioms run distributed: each check compares a
ps.DataFrame pipeline against real pandas on identical input."""

from __future__ import annotations

import warnings

import pandas as pd
import pyspark.pandas as ps
import pytest

from tests.conftest import SF_SMOKE

ORDERS = f"{SF_SMOKE}/orders.parquet"


@pytest.fixture(scope="module", autouse=True)
def _ps_options(spark):
    # deterministic distributed-safe index; silence the advisory warns
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ps.set_option("compute.default_index_type", "distributed")
        yield
        ps.reset_option("compute.default_index_type")


def _pdf() -> pd.DataFrame:
    return pd.read_parquet(ORDERS)


def test_groupby_agg_matches_pandas(spark):
    psdf = ps.read_parquet(ORDERS)
    got = (
        psdf.groupby("o_orderstatus")
        .agg({"o_totalprice": ["count", "max", "min"]})
        .sort_index()
        .to_pandas()
    )
    want = (
        _pdf()
        .groupby("o_orderstatus")
        .agg({"o_totalprice": ["count", "max", "min"]})
        .sort_index()
    )
    pd.testing.assert_frame_equal(got, want, check_names=False)


def test_filter_assign_value_counts(spark):
    psdf = ps.read_parquet(ORDERS)
    got = (
        psdf[psdf.o_totalprice > 200000]
        .assign(bucket=lambda d: (d.o_totalprice // 100000).astype("int64"))
        .bucket.value_counts()
        .sort_index()
        .to_pandas()
    )
    want = (
        _pdf()[lambda d: d.o_totalprice > 200000]
        .assign(bucket=lambda d: (d.o_totalprice // 100000).astype("int64"))
        .bucket.value_counts()
        .sort_index()
    )
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_merge_matches_pandas(spark):
    ps_orders = ps.read_parquet(ORDERS)
    ps_cust = ps.read_parquet(f"{SF_SMOKE}/customer.parquet")
    got = (
        ps_orders.merge(ps_cust, left_on="o_custkey", right_on="c_custkey")
        .groupby("c_mktsegment")["o_totalprice"]
        .count()
        .sort_index()
        .to_pandas()
    )
    want = (
        _pdf()
        .merge(pd.read_parquet(f"{SF_SMOKE}/customer.parquet"),
               left_on="o_custkey", right_on="c_custkey")
        .groupby("c_mktsegment")["o_totalprice"]
        .count()
        .sort_index()
    )
    pd.testing.assert_series_equal(got, want, check_names=False)


def test_merge_asof_matches_pandas(spark):
    """Distributed merge_asof — the pandas twin of the engine's custom
    as-of join (operators/timeseries.asof_join)."""
    quotes = pd.DataFrame(
        {
            "time": pd.to_datetime(
                ["2024-01-01 10:00", "2024-01-01 10:05", "2024-01-01 10:10"]
            ),
            "px": [100.0, 101.0, 102.0],
        }
    )
    trades = pd.DataFrame(
        {
            "time": pd.to_datetime(
                ["2024-01-01 10:01", "2024-01-01 10:06", "2024-01-01 10:11"]
            ),
            "qty": [5, 7, 9],
        }
    )
    got = (
        ps.merge_asof(ps.from_pandas(trades), ps.from_pandas(quotes), on="time")
        .sort_values("time")
        .to_pandas()
        .reset_index(drop=True)
    )
    want = pd.merge_asof(trades, quotes, on="time")
    pd.testing.assert_frame_equal(got, want)

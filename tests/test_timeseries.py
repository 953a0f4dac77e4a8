"""Unit tests for operators/timeseries.py on tiny literal frames —
the semantics a differential oracle can miss (exact-tie as-of matches,
unmatched-left nulls, session gap boundaries)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.operators.timeseries import (
    asof_join,
    range_join_count,
    sessionize,
    time_bucket,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 10:00:00")), (2, "a", _ts("2024-01-01 12:00:00"))],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 09:00:00"), 100),
            ("a", _ts("2024-01-01 11:00:00"), 200),
        ],
        "k string, rts timestamp, val int",
    )
    out = {
        r["id"]: r["val"]
        for r in asof_join(left, right, "k", "ts", "rts", ["val"]).collect()
    }
    assert out == {1: 100, 2: 200}


def test_asof_join_exact_tie_is_inclusive_and_unmatched_is_null(spark):
    left = spark.createDataFrame(
        [(1, "a", _ts("2024-01-01 09:00:00")), (2, "b", _ts("2024-01-01 09:00:00"))],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("a", _ts("2024-01-01 09:00:00"), 7)], "k string, rts timestamp, val int"
    )
    out = {
        r["id"]: r["val"]
        for r in asof_join(left, right, "k", "ts", "rts", ["val"]).collect()
    }
    assert out == {1: 7, 2: None}  # ts == rts matches; key 'b' has no right row


def test_range_join_count_half_open_interval(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 10:00:00"))], "id int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            ("u", _ts("2024-01-01 09:00:00")),  # exactly lower bound -> in
            ("u", _ts("2024-01-01 09:30:00")),  # in
            ("u", _ts("2024-01-01 10:00:00")),  # == ts -> out (upper open)
            ("u", _ts("2024-01-01 08:59:59")),  # out
        ],
        "rk string, rts timestamp",
    )
    out = range_join_count(
        left,
        right,
        equi=("k", "rk"),
        lower=F.col("rts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"),
        upper=F.col("rts") < F.col("ts"),
    ).collect()
    assert out[0]["n_in_range"] == 2


def test_sessionize_gap_boundary(spark):
    # gaps: 30:00 exactly (NOT a new session: strict >), 30:01 (new session)
    df = spark.createDataFrame(
        [
            (1, "u", _ts("2024-01-01 10:00:00")),
            (2, "u", _ts("2024-01-01 10:30:00")),
            (3, "u", _ts("2024-01-01 11:00:01")),
            (4, "v", _ts("2024-01-01 10:00:00")),
        ],
        "id int, k string, ts timestamp",
    )
    out = {
        r["id"]: r["session_seq"]
        for r in sessionize(df, "k", "ts", "30 minutes", tiebreak=["id"]).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 0}


def test_time_bucket_floors_to_width(spark):
    df = spark.createDataFrame(
        [(_ts("2024-01-01 10:14:59"),), (_ts("2024-01-01 10:15:00"),)], "ts timestamp"
    )
    out = [r[0] for r in df.select(time_bucket("ts", "15 minutes")).collect()]
    assert out == [_ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:15:00")]


def test_asof_join_plan_has_no_nested_loop(spark):
    left = spark.createDataFrame([(1, "a", _ts("2024-01-01"))], "id int, k string, ts timestamp")
    right = spark.createDataFrame([("a", _ts("2024-01-01"), 1)], "k string, rts timestamp, val int")
    plan = asof_join(left, right, "k", "ts", "rts", ["val"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan

"""CUSUM closed-form and interval_join tests."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from tsengine import temporal


def _ts(h, m=0):
    return datetime(2024, 3, 1, h, m)


def test_cusum_matches_recursion(spark):
    # closed form must equal the literal recursion S_t = max(0, S+x-k)
    vals = [3.0, -1.0, 4.0, -10.0, 2.0, 2.0, 5.0, -3.0]
    k = 1.0
    rows = [("a", "m", _ts(9, i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, event_id long, value double"
    )
    got = {
        r["event_id"]: r["cusum"]
        for r in temporal.cusum(df, k=k, tiebreak="event_id").collect()
    }
    s = 0.0
    for i, v in enumerate(vals):
        s = max(0.0, s + v - k)
        assert abs(got[i] - s) < 1e-9, (i, got[i], s)


def test_cusum_alarm_and_restart(spark):
    # drift up crosses h, the big drop resets S to 0 (restart-at-zero)
    vals = [10.0, 10.0, 10.0, -100.0, 10.0]
    rows = [("a", "m", _ts(9, i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, event_id long, value double"
    )
    got = {
        r["event_id"]: (r["cusum"], r["alarm"])
        for r in temporal.cusum(df, k=0.0, h=25.0, tiebreak="event_id").collect()
    }
    assert got[2] == (30.0, 1)   # 10+10+10 crosses h=25
    assert got[3] == (0.0, 0)    # max(0, 30-100) -> restart
    assert got[4] == (10.0, 0)


def test_interval_join_edges_and_multiplicity(spark):
    points = spark.createDataFrame(
        [
            ("a", 1, _ts(9, 0)),    # exactly at start -> inside (inclusive)
            ("a", 2, _ts(9, 30)),   # inside BOTH overlapping intervals
            ("a", 3, _ts(10, 0)),   # exactly at end -> inside
            ("a", 4, _ts(11, 0)),   # outside everything
            ("b", 5, _ts(9, 30)),   # right key-time, wrong key
        ],
        "conv_id string, event_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("a", "w1", _ts(9, 0), _ts(10, 0)),
            ("a", "w2", _ts(9, 15), _ts(9, 45)),
        ],
        "conv_id string, win string, start_ts timestamp, end_ts timestamp",
    )
    # tiny bucket forces intervals to span several buckets (dedup risk:
    # a point and interval sharing >1 bucket must still pair exactly once)
    got = temporal.interval_join(
        points, intervals, keys=("conv_id",), bucket_s=600
    )
    pairs = sorted((r["event_id"], r["win"]) for r in got.collect())
    assert pairs == [(1, "w1"), (2, "w1"), (2, "w2"), (3, "w1")]

    # no nested-loop join in the plan — the whole point of the operator
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan

"""rolling.py unit tests against hand-computed / pandas oracles."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd

from tsengine import rolling


def _ts(m, s=0, us=0):
    return datetime(2024, 3, 1, 12, m, s, us)


def test_rolling_agg_matches_pandas_closed_both(spark):
    # irregular spacing incl. a sub-second edge case: the 10:00.000001
    # event must EXCLUDE the event exactly window+1us earlier
    rows = [
        ("a", "m", _ts(0), 1.0),
        ("a", "m", _ts(1), 2.0),
        ("a", "m", _ts(5), 3.0),
        ("a", "m", _ts(5, 0, 1), 4.0),   # 1 us after the previous
        ("a", "m", _ts(10), 5.0),
        ("a", "m", _ts(10, 0, 1), 6.0),  # drops the _ts(0)? no: window 10 m
        ("b", "m", _ts(0), 10.0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double"
    )
    got = (
        rolling.rolling_agg(df, window_s=300)  # 5-minute trailing window
        .orderBy("conv_id", "ts")
        .toPandas()
    )
    pdf = pd.DataFrame(rows, columns=["conv_id", "metric", "ts", "value"])
    for key, grp in pdf.groupby("conv_id"):
        g = grp.set_index("ts").sort_index()
        # [t - w, t] inclusive both ends == pandas closed='both'
        exp = g["value"].rolling("300s", closed="both")
        sub = got[got.conv_id == key].set_index("ts")
        assert list(sub["roll_cnt"]) == list(exp.count().astype(int))
        assert list(sub["roll_avg"]) == list(exp.mean())
        assert list(sub["roll_max"]) == list(exp.max())


def test_rolling_agg_edge_inclusive_exact(spark):
    # event exactly window seconds earlier IS included (closed left edge)
    rows = [
        ("a", "m", _ts(0), 1.0),
        ("a", "m", _ts(5), 2.0),          # exactly 300 s later
        ("a", "m", _ts(5, 0, 1), 3.0),    # 1 us beyond -> first drops out
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double"
    )
    got = rolling.rolling_agg(df, window_s=300).orderBy("ts").collect()
    assert [r["roll_cnt"] for r in got] == [1, 2, 2]
    assert got[1]["roll_avg"] == 1.5
    assert got[2]["roll_avg"] == 2.5


def test_ltob_keeps_endpoints_and_max_area_point(spark):
    # one series, one hour bucket, four points: the endpoints must both
    # survive (infinite area) and of the two interior points the spike
    # (larger triangle) wins its bucket
    rows = [
        ("a", "m", _ts(0), 1, 0.0),
        ("a", "m", _ts(10), 2, 0.1),    # near-collinear -> tiny area
        ("a", "m", _ts(20), 3, 50.0),   # spike -> huge area
        ("a", "m", _ts(30), 4, 0.3),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, event_id long, value double"
    )
    # hour bucket: all four in one bucket -> exactly one survivor, and it
    # must be an endpoint (1e308 sentinel beats any real area)
    got = rolling.ltob_downsample(df, bucket="hour").collect()
    assert len(got) == 1 and got[0]["event_id"] == 1  # earliest endpoint wins tie

    # minute buckets: every point is alone in its bucket -> all survive
    got_m = rolling.ltob_downsample(df, bucket="minute").collect()
    assert sorted(r["event_id"] for r in got_m) == [1, 2, 3, 4]


def test_ltob_picks_spike_within_bucket(spark):
    # endpoints in their own buckets; interior bucket holds flat vs spike
    rows = [
        ("a", "m", datetime(2024, 3, 1, 11, 59), 1, 0.0),
        ("a", "m", _ts(10), 2, 0.1),
        ("a", "m", _ts(20), 3, 50.0),
        ("a", "m", datetime(2024, 3, 1, 13, 1), 4, 0.3),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, event_id long, value double"
    )
    got = rolling.ltob_downsample(df, bucket="hour").collect()
    assert sorted(r["event_id"] for r in got) == [1, 3, 4]


def test_staleness_plateaus(spark):
    rows = [
        ("a", "m", _ts(0), 1.0),   # first row: change by definition -> 0
        ("a", "m", _ts(1), 1.0),   # stale 60 s
        ("a", "m", _ts(3), 1.0),   # stale 180 s
        ("a", "m", _ts(4), 2.0),   # change -> 0
        ("a", "m", _ts(6), 2.0),   # stale 120 s
        ("b", "m", _ts(0), 9.0),   # independent series
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double"
    )
    got = rolling.staleness(df).orderBy("conv_id", "ts").collect()
    us = 1_000_000
    assert [r["stale_us"] for r in got] == [
        0, 60 * us, 180 * us, 0, 120 * us, 0
    ]

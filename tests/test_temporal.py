"""temporal.py unit tests against hand-computed / pandas oracles."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F

from tsengine import temporal


def _ts(h, m=0, s=0):
    return datetime(2024, 3, 1, h, m, s)


def test_asof_join_matches_pandas_merge_asof(spark):
    left_rows = [
        ("a", 1, _ts(9, 0)),
        ("a", 2, _ts(10, 0)),   # exact tie with a right row
        ("a", 3, _ts(10, 30)),
        ("a", 4, _ts(15, 0)),   # match exists but out of tolerance
        ("b", 5, _ts(9, 0)),    # key with no right rows at all
    ]
    right_rows = [
        ("a", _ts(8, 0), 1.0),
        ("a", _ts(10, 0), 2.0),
    ]
    left = spark.createDataFrame(left_rows, "conv_id string, event_id long, ts timestamp")
    right = spark.createDataFrame(right_rows, "conv_id string, ts timestamp, ref double")
    got = (
        temporal.asof_join(left, right, tolerance_s=3600)
        .orderBy("event_id")
        .collect()
    )
    want = {
        1: (_ts(8, 0), 1.0),     # 9:00 -> 8:00 within 1 h
        2: (_ts(10, 0), 2.0),    # exact timestamp tie matches
        3: (_ts(10, 0), 2.0),
        4: (None, None),         # latest right is 10:00, 5 h stale
        5: (None, None),         # no right rows for key b
    }
    assert {r["event_id"]: (r["ts_asof"], r["ref_asof"]) for r in got} == want

    # cross-check the no-tolerance variant against pandas merge_asof
    got_all = temporal.asof_join(left, right).toPandas()
    lp = pd.DataFrame(left_rows, columns=["conv_id", "event_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["conv_id", "ts", "ref"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="conv_id", direction="backward")
    exp = exp.set_index("event_id")["ref"]
    got_map = got_all.set_index("event_id")["ref_asof"]
    for eid in exp.index:
        e, g = exp[eid], got_map[eid]
        assert (pd.isna(e) and pd.isna(g)) or e == g


def test_sessionize_gap_boundaries(spark):
    rows = [
        ("a", 1, _ts(9, 0, 0)),
        ("a", 2, _ts(9, 10, 0)),   # 600 s -> same session
        ("a", 3, _ts(9, 40, 0)),   # exactly gap (1800 s) -> SAME session
        ("a", 4, _ts(10, 11, 0)),  # 1860 s -> new session
        ("b", 5, _ts(9, 0, 0)),    # separate key restarts numbering
    ]
    df = spark.createDataFrame(rows, "conv_id string, event_id long, ts timestamp")
    got = {
        r["event_id"]: r["session_id"]
        for r in temporal.sessionize(df, gap_s=1800, tiebreak="event_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}

    stats = {
        (r["conv_id"], r["session_id"]): (r["duration_s"], r["n_rows"])
        for r in temporal.session_stats(df, 1800, tiebreak="event_id").collect()
    }
    assert stats[("a", 1)] == (2400, 3)
    assert stats[("a", 2)] == (0, 1)
    assert stats[("b", 1)] == (0, 1)


def test_sessionize_duplicate_timestamps_stable(spark):
    """Tied timestamps share a session and the running index is stable
    under the tiebreak column."""
    rows = [("a", i, _ts(9, 0, 0)) for i in range(4)] + [("a", 9, _ts(11, 0, 0))]
    df = spark.createDataFrame(rows, "conv_id string, event_id long, ts timestamp")
    got = {
        r["event_id"]: r["session_id"]
        for r in temporal.sessionize(df, 1800, tiebreak="event_id").collect()
    }
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 9: 2}


def test_counter_increase_reset_semantics(spark):
    rows = [
        ("a", 1, _ts(9), 10),
        ("a", 2, _ts(10), 25),   # +15
        ("a", 3, _ts(11), 5),    # reset -> increase = 5
        ("a", 4, _ts(12), 5),    # flat -> 0
        ("b", 9, _ts(9), 7),     # first sample of key -> absolute value
    ]
    df = spark.createDataFrame(rows, "conv_id string, event_id long, ts timestamp, counter long")
    got = {
        r["event_id"]: (r["increase"], r["is_reset"])
        for r in temporal.counter_increase(df, tiebreak="event_id").collect()
    }
    assert got == {
        1: (10.0, 0),
        2: (15.0, 0),
        3: (5.0, 1),
        4: (0.0, 0),
        9: (7.0, 0),
    }


def test_asof_join_plan_has_single_exchange(spark):
    """The union-and-carry as-of join must cost one shuffle keyed by the
    series key — never a cartesian/range join."""
    left = spark.createDataFrame(
        [("a", 1, _ts(9))], "conv_id string, event_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [("a", _ts(8), 1.0)], "conv_id string, ts timestamp, ref double"
    )
    plan = (
        temporal.asof_join(left, right)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_session_window_boundary_matches_sessionize(spark):
    """Pin Spark's session_window boundary rule empirically: an event
    EXACTLY gap after its predecessor MERGES (touching windows), i.e. a
    new session opens only at delta > gap — the same rule as
    temporal.sessionize. The entry oracles encode this; if a Spark
    upgrade flips it, this test fails before the oracles drift."""
    rows = [
        ("a", 1, _ts(9, 0, 0)),
        ("a", 2, _ts(9, 30, 0)),   # exactly 1800 s -> must merge
        ("a", 3, _ts(10, 0, 1)),   # 1801 s -> new session
    ]
    df = spark.createDataFrame(rows, "conv_id string, event_id long, ts timestamp")
    native = (
        df.groupBy("conv_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select("conv_id", F.col("w.start").alias("st"), "n")
        .collect()
    )
    assert {(r["st"], r["n"]) for r in native} == {
        (_ts(9, 0, 0), 2),
        (_ts(10, 0, 1), 1),
    }
    lag_rule = {
        r["event_id"]: r["session_id"]
        for r in temporal.sessionize(df, 1800, tiebreak="event_id").collect()
    }
    assert lag_rule == {1: 1, 2: 1, 3: 2}


def test_ewma_matches_pandas(spark):
    """Spark ewma (applyInPandas recursion) equals a hand-rolled numpy
    recursion and pandas ewm on the same rows."""
    import numpy as np

    vals = [10.0, 20.0, 5.0, 0.0, 40.0]
    rows = [("a", i, _ts(9, i), v) for i, v in enumerate(vals)] + [
        ("b", 9, _ts(9, 0), 100.0)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, event_id long, ts timestamp, value double"
    )
    got = {
        r["event_id"]: r["ewma"]
        for r in temporal.ewma(df, alpha=0.25, tiebreak="event_id").collect()
    }
    s, a = vals[0], 0.25
    want = {}
    for i, v in enumerate(vals):
        s = v if i == 0 else (1 - a) * s + a * v
        want[i] = s
    want[9] = 100.0
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_concurrency_peaks_hand_case(spark):
    # day 1: three intervals, two overlap fully, the third touches the
    # first's end exactly (inclusive ends -> counts as overlap of 2);
    # peak 2 is reached earliest at 9:30
    rows = [
        ("d1", _ts(9, 0), _ts(10, 0)),
        ("d1", _ts(9, 30), _ts(9, 45)),   # inside the first -> live 2
        ("d1", _ts(10, 0), _ts(11, 0)),   # starts AT first's end -> live 2
        ("d2", _ts(9, 0), _ts(9, 10)),    # lone interval -> peak 1
    ]
    df = spark.createDataFrame(
        rows, "day string, start_ts timestamp, end_ts timestamp"
    )
    got = {
        r["day"]: (r["peak_concurrent"], r["peak_ts"])
        for r in temporal.concurrency_peaks(df, group_col="day").collect()
    }
    assert got["d1"] == (2, _ts(9, 30))
    assert got["d2"] == (1, _ts(9, 0))


def test_concurrency_peaks_stacked(spark):
    # N nested intervals -> peak N at the innermost start
    rows = [("d", _ts(9, i), _ts(10, 0)) for i in range(5)]
    df = spark.createDataFrame(
        rows, "day string, start_ts timestamp, end_ts timestamp"
    )
    r = temporal.concurrency_peaks(df, group_col="day").collect()[0]
    assert (r["peak_concurrent"], r["peak_ts"]) == (5, _ts(9, 4))


def test_time_weighted_avg_locf_integral(spark):
    # value 1.0 held 10 min, then 3.0 held 20 min, then 5.0 (no successor)
    # TWA = (1*600 + 3*1200) / 1800 = 2.3333..; duration 1800 s
    rows = [
        ("a", "m", 1, _ts(9, 0), 1.0),
        ("a", "m", 2, _ts(9, 10), 3.0),
        ("a", "m", 3, _ts(9, 30), 5.0),
        ("b", "m", 4, _ts(9, 0), 9.0),   # single point: zero span, dropped
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, event_id long, ts timestamp, value double"
    )
    got = {r["conv_id"]: r for r in temporal.time_weighted_avg(df).collect()}
    assert set(got) == {"a"}
    assert got["a"]["n_pts"] == 3
    assert got["a"]["duration_s"] == 1800.0
    assert abs(got["a"]["twa"] - (1 * 600 + 3 * 1200) / 1800) < 1e-6
    # chatty burst must NOT over-weight: plain avg of (1,3,5) is 3,
    # but 3.0 only held twice as long as 1.0
    assert got["a"]["twa"] < 3.0


def test_time_weighted_avg_duplicate_ts_tie_order(spark):
    # two samples on one instant: event_id order decides which carries
    # into the next segment (the later one, 7.0) — zero-width segment
    # contributes nothing
    rows = [
        ("a", "m", 1, _ts(9, 0), 1.0),
        ("a", "m", 2, _ts(9, 0), 7.0),
        ("a", "m", 3, _ts(9, 30), 0.0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, event_id long, ts timestamp, value double"
    )
    [r] = temporal.time_weighted_avg(df).collect()
    assert r["twa"] == 7.0 and r["duration_s"] == 1800.0 and r["n_pts"] == 3


def test_state_durations_entries_and_spans(spark):
    # a: view(10 min) -> click(20 min) -> view(0, last) : view entered 2x
    rows = [
        ("a", 1, _ts(9, 0), "view"),
        ("a", 2, _ts(9, 10), "click"),
        ("a", 3, _ts(9, 30), "view"),
        ("b", 4, _ts(9, 0), "view"),   # lone event: 0 s, 1 entry
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, event_id long, ts timestamp, metric string"
    )
    got = {(r["conv_id"], r["state"]): r for r in temporal.state_durations(df).collect()}
    assert got[("a", "view")]["total_s"] == 600.0
    assert got[("a", "view")]["n_entries"] == 2
    assert got[("a", "view")]["n_events"] == 2
    assert got[("a", "click")]["total_s"] == 1200.0
    assert got[("a", "click")]["n_entries"] == 1
    assert got[("b", "view")]["total_s"] == 0.0
    assert got[("b", "view")]["n_entries"] == 1
    # total time across states == first->last span per key
    assert sum(r["total_s"] for k, r in got.items() if k[0] == "a") == 1800.0


def test_time_weighted_avg_skips_null_samples(spark):
    # a null sample is "no observation": the previous value keeps holding
    # across it — it must not dilute the integral or count as a point
    rows = [
        ("a", "m", 1, _ts(9, 0), 10.0),
        ("a", "m", 2, _ts(9, 1), None),
        ("a", "m", 3, _ts(9, 2), 10.0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, event_id long, ts timestamp, value double"
    )
    [r] = temporal.time_weighted_avg(df).collect()
    assert r["twa"] == 10.0          # not 5.0 (the dilution bug)
    assert r["n_pts"] == 2           # null row is not a sample
    assert r["duration_s"] == 120.0  # span still first->last non-null

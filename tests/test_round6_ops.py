"""Unit tests for the late-pack additions: PELT multi-changepoint
segmentation and the Page-Hinkley adaptive drift test — hand-computed
oracles on tiny fixtures (the entry-level SQL parity is covered separately
by tools/compare_oracle.py)."""

from __future__ import annotations

from datetime import datetime

import numpy as np

from tsengine import anomaly, temporal


def _t(h, m=0, s=0):
    return datetime(2024, 3, 1, h, m, s)


def _series(spark, vals, conv="a", metric="m"):
    rows = [
        (conv, metric, _t(10 + i // 60, i % 60), float(v), i + 1)
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, metric string, ts timestamp, value double, "
        "event_id long",
    )


# ----------------------------------------------------------------- PELT ---

def test_pelt_finds_two_level_shift(spark):
    # 5 points at 0, 5 points at 100: one changepoint exactly at the jump
    df = _series(spark, [0.0] * 5 + [100.0] * 5)
    got = sorted(
        anomaly.pelt_segments(df, penalty=100.0).collect(),
        key=lambda r: r["seg_idx"],
    )
    assert len(got) == 2
    s1, s2 = got
    assert (s1["n_pts"], s2["n_pts"]) == (5, 5)
    assert s1["seg_mean"] == 0.0 and s2["seg_mean"] == 100.0
    assert s1["seg_cost"] == 0.0 and s2["seg_cost"] == 0.0
    assert s1["n_segs"] == 2 and s2["n_segs"] == 2
    assert s1["end_ts"] < s2["start_ts"]
    assert s1["start_ts"] == _t(10, 0) and s2["end_ts"] == _t(10, 9)


def test_pelt_huge_penalty_single_segment(spark):
    # the same shifted series, but beta exceeds the split's cost saving
    df = _series(spark, [0.0] * 5 + [100.0] * 5)
    got = anomaly.pelt_segments(df, penalty=1e9).collect()
    assert len(got) == 1
    (s,) = got
    assert s["n_pts"] == 10 and s["seg_idx"] == 1 and s["n_segs"] == 1
    assert s["seg_mean"] == 50.0
    # cost = sum((x - 50)^2) = 10 * 2500
    assert abs(s["seg_cost"] - 25000.0) < 1e-9


def test_pelt_constant_series_one_zero_cost_segment(spark):
    df = _series(spark, [7.0] * 8)
    got = anomaly.pelt_segments(df, penalty=1.0).collect()
    assert len(got) == 1
    assert got[0]["seg_cost"] == 0.0 and got[0]["seg_mean"] == 7.0


def test_pelt_matches_bruteforce_optimal_partitioning(spark):
    # pruning must not change the exact optimum: compare against an
    # exhaustive search over all 2^(n-1) segmentations of a random series
    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [rng.normal(0, 1, 6), rng.normal(12, 1, 5), rng.normal(-4, 1, 4)]
    )
    beta = 30.0

    def seg_cost(a, b):  # points a..b-1 (0-based, half-open)
        x = vals[a:b]
        return float(np.sum(x * x) - x.sum() ** 2 / len(x))

    n = len(vals)
    best_cost, best_bounds = None, None
    for mask in range(1 << (n - 1)):
        bounds = [0] + [i + 1 for i in range(n - 1) if mask >> i & 1] + [n]
        c = sum(
            seg_cost(bounds[k], bounds[k + 1]) for k in range(len(bounds) - 1)
        ) + beta * (len(bounds) - 1)
        if best_cost is None or c < best_cost - 1e-12:
            best_cost, best_bounds = c, bounds

    df = _series(spark, vals.tolist())
    got = sorted(
        anomaly.pelt_segments(df, penalty=beta).collect(),
        key=lambda r: r["seg_idx"],
    )
    got_bounds = [0] + list(np.cumsum([r["n_pts"] for r in got]))
    assert got_bounds == best_bounds
    total = sum(r["seg_cost"] for r in got) + beta * len(got)
    assert abs(total - best_cost) < 1e-6


def test_pelt_multiseries_independent(spark):
    a = _series(spark, [0.0] * 4 + [50.0] * 4, conv="a")
    b = _series(spark, [3.0] * 6, conv="b")
    got = anomaly.pelt_segments(a.unionByName(b), penalty=10.0).collect()
    by_conv = {}
    for r in got:
        by_conv.setdefault(r["conv_id"], []).append(r)
    assert len(by_conv["a"]) == 2 and len(by_conv["b"]) == 1


# --------------------------------------------------------- Page-Hinkley ---

def test_page_hinkley_flags_upward_drift(spark):
    # 30 points at 0, then 30 at 10: m_t grows once the level jumps
    df = _series(spark, [0.0] * 30 + [10.0] * 30)
    got = sorted(
        temporal.page_hinkley(df, delta=0.1, lam=20.0, tiebreak="event_id")
        .collect(),
        key=lambda r: r["event_id"],
    )
    pre = [r for r in got if r["event_id"] <= 30]
    assert all(r["alarm"] == 0 for r in pre)
    assert any(r["alarm"] == 1 for r in got[30:])
    # and only the UPWARD statistic fires
    assert all(r["ph_dec"] <= 20.0 for r in got)


def test_page_hinkley_flags_downward_drift(spark):
    df = _series(spark, [10.0] * 30 + [0.0] * 30)
    got = sorted(
        temporal.page_hinkley(df, delta=0.1, lam=20.0, tiebreak="event_id")
        .collect(),
        key=lambda r: r["event_id"],
    )
    assert all(r["alarm"] == 0 for r in got[:30])
    assert any(r["alarm"] == 1 for r in got[30:])
    assert all(r["ph_inc"] <= 20.0 for r in got)


def test_page_hinkley_constant_series_never_alarms(spark):
    df = _series(spark, [5.0] * 50)
    got = temporal.page_hinkley(df, delta=0.01, lam=1.0,
                                tiebreak="event_id").collect()
    assert all(r["alarm"] == 0 for r in got)
    # every deviation-from-running-mean is exactly 0, so PH = t * delta bound
    assert all(r["ph_inc"] <= 0.01 * 50 + 1e-9 for r in got)


def test_page_hinkley_matches_reference_recursion(spark):
    # classic sequential formulation computed in plain python
    rng = np.random.RandomState(3)
    vals = np.concatenate([rng.normal(0, 1, 40), rng.normal(6, 1, 20)])
    delta, lam = 0.05, 15.0
    m = g = 0.0
    mn, mx = float("inf"), float("-inf")
    exp_inc, exp_dec = [], []
    csum = 0.0
    for t, x in enumerate(vals, 1):
        csum += x
        ravg = csum / t
        m += x - ravg - delta
        g += x - ravg + delta
        mn = min(mn, m)
        mx = max(mx, g)
        exp_inc.append(m - mn)
        exp_dec.append(mx - g)
    df = _series(spark, vals.tolist())
    got = sorted(
        temporal.page_hinkley(df, delta=delta, lam=lam,
                              tiebreak="event_id").collect(),
        key=lambda r: r["event_id"],
    )
    for r, ei, ed in zip(got, exp_inc, exp_dec):
        assert abs(r["ph_inc"] - ei) < 1e-5
        assert abs(r["ph_dec"] - ed) < 1e-5
        assert r["alarm"] == (1 if ei > lam or ed > lam else 0)


# ---------------------------------------------------------------- funnel ---

def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
              "event_id long"
    )


def test_funnel_full_conversion_and_latencies(spark):
    df = _ev(spark, [
        ("u1", "view", _t(10, 0), 1.0, 1),
        ("u1", "click", _t(10, 5), 1.0, 2),
        ("u1", "purchase", _t(10, 30), 1.0, 3),
    ])
    (r,) = temporal.funnel(df).collect()
    assert r["steps_reached"] == 3
    assert r["us_1_2"] == 5 * 60 * 1_000_000
    assert r["us_2_3"] == 25 * 60 * 1_000_000


def test_funnel_out_of_order_does_not_count(spark):
    # click BEFORE the first view must not advance the funnel
    df = _ev(spark, [
        ("u1", "click", _t(9, 0), 1.0, 1),
        ("u1", "view", _t(10, 0), 1.0, 2),
        ("u1", "purchase", _t(11, 0), 1.0, 3),
    ])
    (r,) = temporal.funnel(df).collect()
    assert r["steps_reached"] == 1
    assert r["t2"] is None and r["t3"] is None and r["us_1_2"] is None


def test_funnel_picks_earliest_qualifying_event(spark):
    df = _ev(spark, [
        ("u1", "view", _t(10, 0), 1.0, 1),
        ("u1", "click", _t(10, 1), 1.0, 2),
        ("u1", "click", _t(10, 9), 1.0, 3),   # later click ignored
        ("u1", "purchase", _t(10, 2), 1.0, 4),
    ])
    (r,) = temporal.funnel(df).collect()
    assert r["t2"] == _t(10, 1) and r["t3"] == _t(10, 2)
    assert r["steps_reached"] == 3


def test_funnel_no_first_step_gives_zero(spark):
    df = _ev(spark, [("u1", "error", _t(10, 0), 1.0, 1)])
    (r,) = temporal.funnel(df).collect()
    assert r["steps_reached"] == 0 and r["t1"] is None


# ------------------------------------------------------- cohort retention ---

def test_cohort_retention_matrix(spark):
    def d(day, h=12):
        return datetime(2024, 3, day, h)
    df = _ev(spark, [
        # cohort 3/1: u1 active day 0,1; u2 active day 0 only
        ("u1", "view", d(1), 1.0, 1),
        ("u1", "view", d(2), 1.0, 2),
        ("u2", "view", d(1), 1.0, 3),
        # cohort 3/2: u3 active day 0 and 2 (twice on day 2 — distinct!)
        ("u3", "view", d(2), 1.0, 4),
        ("u3", "view", d(4), 1.0, 5),
        ("u3", "click", d(4, 13), 1.0, 6),
    ])
    got = {(str(r["cohort_day"]), r["day_offset"]): r
           for r in temporal.cohort_retention(df).collect()}
    assert got[("2024-03-01", 0)]["n_active"] == 2
    assert got[("2024-03-01", 0)]["n_cohort"] == 2
    assert got[("2024-03-01", 0)]["retention"] == 1.0
    assert got[("2024-03-01", 1)]["n_active"] == 1
    assert got[("2024-03-01", 1)]["retention"] == 0.5
    assert got[("2024-03-02", 2)]["n_active"] == 1  # deduped same-day events
    assert ("2024-03-02", 1) not in got


# ----------------------------------------------------------- decayed topk ---

def test_decayed_topk_recency_beats_history(spark):
    # u_old: 4 events a week ago; u_new: 2 events now. Half-life 1 day:
    # old events decay to ~2^-7 each, so the smaller-but-recent key wins.
    rows = [("old", "m", datetime(2024, 3, 1, 10, 0, i), 1.0, i + 1)
            for i in range(4)]
    rows += [("new", "m", datetime(2024, 3, 8, 10, 0, i), 1.0, 10 + i)
             for i in range(2)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
              "event_id long")
    got = sorted(temporal.decayed_topk(df, half_life_s=86400.0, k=3).collect(),
                 key=lambda r: r["rank"])
    assert [r["conv_id"] for r in got] == ["new", "old"]
    assert got[0]["decayed_weight"] > 1.9          # ~2 undecayed events
    assert got[1]["decayed_weight"] < 0.1          # 4 events x 2^-7


def test_decayed_topk_ties_break_on_item(spark):
    rows = [(u, "m", _t(10, 0), 1.0, i + 1)
            for i, u in enumerate(["b", "a", "c", "d"])]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
              "event_id long")
    got = sorted(temporal.decayed_topk(df, k=2).collect(),
                 key=lambda r: r["rank"])
    # identical weights (same ts) -> lexicographic item order
    assert [r["conv_id"] for r in got] == ["a", "b"]
    assert got[0]["decayed_weight"] == got[1]["decayed_weight"] == 1.0


# ------------------------------------------------------------------ SCD2 ---

def test_scd2_suppresses_noop_updates_and_builds_intervals(spark):
    rows = [
        ("u1", "active", _t(10, 0), 1.0, 1),
        ("u1", "active", _t(10, 5), 1.0, 2),   # no-op -> suppressed
        ("u1", "idle",   _t(10, 9), 1.0, 3),
        ("u1", "active", _t(10, 20), 1.0, 4),  # back -> NEW version
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
              "event_id long")
    got = sorted(
        temporal.scd2_intervals(df, attrs=("metric",),
                                tiebreak="event_id").collect(),
        key=lambda r: r["version"],
    )
    assert [(r["version"], r["metric"]) for r in got] == [
        (1, "active"), (2, "idle"), (3, "active")]
    assert got[0]["valid_from"] == _t(10, 0)
    assert got[0]["valid_to"] == _t(10, 9)      # next CHANGE, not next row
    assert got[1]["valid_to"] == _t(10, 20)
    assert got[2]["valid_to"] is None and got[2]["is_current"] == 1
    assert got[0]["is_current"] == 0


def test_scd2_null_attr_is_not_a_change(spark):
    rows = [
        ("u1", None, _t(10, 0), 1.0, 1),
        ("u1", None, _t(10, 1), 1.0, 2),   # NULL -> NULL suppressed
        ("u1", "a",  _t(10, 2), 1.0, 3),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
              "event_id long")
    got = temporal.scd2_intervals(df, attrs=("metric",),
                                  tiebreak="event_id").collect()
    assert len(got) == 2


# ----------------------------------------------------- layout maintenance ---

def test_zorder_value_interleaves_bits(spark):
    from tsengine import tables
    import pyspark.sql.functions as F
    df = spark.createDataFrame(
        [(0b1011, 0b0001), (0, 0), (1, 0), (0, 1), (0xFFFF, 0xFFFF)],
        "x long, y long")
    got = [r["z"] for r in df.select(
        tables.zorder_value(F.col("x"), F.col("y")).alias("z")).collect()]
    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z
    assert got == [morton(0b1011, 0b0001), 0, 1, 2, (1 << 32) - 1]


def test_zorder_layout_clusters_both_dims(spark, tmp_path):
    # after range-partitioning by zval, each output file's x-range AND
    # y-range must be far narrower than the global domain
    from tsengine import tables
    import pyspark.sql.functions as F
    n = 4096
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 64).alias("x"),
        (F.col("id") * 40503 % 64).alias("y"))
    out = str(tmp_path / "z")
    tables.zorder_layout(df, "x", "y", n_files=16, bits=6).write.parquet(out)
    import glob
    spans = []
    for f in glob.glob(out + "/part-*.parquet"):
        pdf = spark.read.parquet(f).agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")).collect()[0]
        spans.append((pdf[1] - pdf[0], pdf[3] - pdf[2]))
    # 16 z-range files over a 64x64 grid -> each file covers about a
    # quarter of each axis; assert well under the full 63 span on average
    avg_x = sum(s[0] for s in spans) / len(spans)
    avg_y = sum(s[1] for s in spans) / len(spans)
    assert avg_x < 40 and avg_y < 40, (avg_x, avg_y)


def test_compaction_plan_groups_close_at_target(spark):
    from tsengine import tables
    rows = [("b", i, 60) for i in range(1, 6)]   # 60B files, target 100
    df = spark.createDataFrame(rows, "bucket string, file_id long, bytes long")
    got = {r["file_id"]: r["merge_group"]
           for r in tables.compaction_plan(
               df, size_col="bytes", target_bytes=100,
               keys=("bucket",), order_col="file_id").collect()}
    # exclusive prefix: 0,60,120,180,240 -> groups 0,0,1,1,2
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2}


def test_compaction_plan_oversize_file_single_group(spark):
    from tsengine import tables
    df = spark.createDataFrame(
        [("b", 1, 50), ("b", 2, 500), ("b", 3, 10)],
        "bucket string, file_id long, bytes long")
    got = {r["file_id"]: r["merge_group"]
           for r in tables.compaction_plan(
               df, size_col="bytes", target_bytes=100,
               keys=("bucket",), order_col="file_id").collect()}
    # the 500B file lands in exactly ONE group (group of its prefix), and
    # the next file starts a fresh group beyond it
    assert got[1] == 0 and got[2] == 0 and got[3] == 5


# ------------------------------------------------------------ sigma clip ---

def test_sigma_clip_peels_single_outlier(spark):
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 100.0]
    df = _series(spark, vals)
    got = {r["event_id"]: r for r in
           anomaly.sigma_clip(df, c=2.0, max_peel=3).collect()}
    assert got[6]["is_outlier"] == 1 and got[6]["peel_round"] == 1
    assert all(got[i]["is_outlier"] == 0 for i in range(1, 6))
    assert got[1]["n_kept"] == 5
    assert abs(got[1]["mean_kept"] - 10.0) < 0.5


def test_sigma_clip_unmasks_outlier_pair(spark):
    # two large outliers inflate the naive sd so a single-pass z-score
    # barely flags them (z ~ 3 vs the clean-series z ~ 60 they deserve);
    # one-at-a-time peeling with re-estimated moments removes both
    base = [10.0 + 0.1 * (i % 5) for i in range(20)]
    vals = base + [200.0, 190.0]
    import numpy as np
    arr = np.array(vals)
    z = np.abs(arr - arr.mean()) / arr.std()
    assert z[-2:].max() < 3.5  # masked: nowhere near their true deviance
    df = _series(spark, vals)
    got = {r["event_id"]: r for r in
           anomaly.sigma_clip(df, c=2.0, max_peel=3).collect()}
    assert got[21]["is_outlier"] == 1 and got[22]["is_outlier"] == 1
    assert got[21]["peel_round"] == 1      # biggest deviant falls first
    assert got[22]["peel_round"] == 2
    assert got[1]["n_kept"] == 20


def test_sigma_clip_clean_series_untouched(spark):
    df = _series(spark, [5.0, 5.1, 4.9, 5.05, 4.95])
    got = anomaly.sigma_clip(df, c=3.0, max_peel=3).collect()
    assert all(r["is_outlier"] == 0 for r in got)
    assert got[0]["n_kept"] == 5


def test_sigma_clip_respects_max_peel(spark):
    # three huge outliers but only 2 peels allowed
    df = _series(spark, [1.0] * 10 + [50.0, 60.0, 70.0])
    got = anomaly.sigma_clip(df, c=1.0, max_peel=2).collect()
    assert sum(1 for r in got if r["is_outlier"] == 1) == 2
    assert {r["peel_round"] for r in got if r["is_outlier"]} == {1, 2}

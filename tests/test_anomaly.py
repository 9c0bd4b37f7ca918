"""anomaly.py unit tests against hand-computed oracles."""

from __future__ import annotations

from datetime import datetime

import numpy as np

from tsengine import anomaly


def _ts(d, h=0):
    return datetime(2024, 3, d, h)


def test_mad_outliers_flags_spike_not_masked(spark):
    # nine quiet points + one huge spike: classic case where mean/std
    # masks the spike but MAD flags it
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 10.1, 9.9, 1000.0]
    rows = [("a", "m", float(v)) for v in vals]
    df = spark.createDataFrame(rows, "conv_id string, metric string, value double")
    got = anomaly.mad_outliers(df).collect()
    assert len(got) == 1
    r = got[0]
    med = float(np.median(vals))
    mad = float(np.median(np.abs(np.array(vals) - med)))
    assert r["n"] == 10
    assert r["med"] == round(med, 6)
    assert r["mad"] == round(mad, 6)
    # only the 1000.0 point exceeds 3 * 1.4826 * MAD
    assert r["n_outliers"] == 1

    # sanity: plain 3-sigma would NOT flag it... (std is dragged to ~313)
    assert abs(1000.0 - np.mean(vals)) < 3 * np.std(vals)


def test_mad_outliers_constant_series(spark):
    # all-constant series: MAD 0, any deviation at all is an outlier
    rows = [("c", "m", 5.0)] * 6 + [("c", "m", 5.1)]
    df = spark.createDataFrame(rows, "conv_id string, metric string, value double")
    r = anomaly.mad_outliers(df).collect()[0]
    assert r["mad"] == 0.0 and r["med"] == 5.0 and r["n_outliers"] == 1


def test_lagged_corr_detects_shifted_linear_relation(spark):
    # b at minute t+1 = 2 * a at minute t  ->  corr exactly 1 at lag 1
    rows = []
    for i, v in enumerate([1.0, 3.0, 2.0, 5.0, 4.0]):
        rows.append(("k1", "a", _ts(1, 0).replace(minute=i), v))
        rows.append(("k1", "b", _ts(1, 0).replace(minute=i + 1), 2 * v))
    # k2: metric a constant -> zero variance -> dropped
    for i in range(4):
        rows.append(("k2", "a", _ts(1, 0).replace(minute=i), 7.0))
        rows.append(("k2", "b", _ts(1, 0).replace(minute=i + 1), float(i)))
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double"
    )
    got = anomaly.lagged_corr(df, "a", "b", lag_buckets=1, bucket="minute", bucket_s=60)
    out = {r["conv_id"]: r for r in got.collect()}
    assert set(out) == {"k1"}          # degenerate k2 dropped
    assert out["k1"]["n_aligned"] == 5
    assert out["k1"]["xcorr"] == 1.0


def test_lagged_corr_zero_at_no_relation(spark):
    # anti-correlated at lag 1: b(t+1) = -a(t)
    rows = []
    for i, v in enumerate([1.0, 4.0, 2.0, 8.0]):
        rows.append(("k", "a", _ts(1, 0).replace(minute=i), v))
        rows.append(("k", "b", _ts(1, 0).replace(minute=i + 1), -v))
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double"
    )
    got = anomaly.lagged_corr(df, "a", "b", lag_buckets=1, bucket="minute", bucket_s=60)
    assert got.collect()[0]["xcorr"] == -1.0


def test_acf_alternating_series(spark):
    # perfectly alternating series: ACF = -1 at lag 1, +1 at lag 2
    rows = [
        ("k", "m", _ts(1, 0).replace(minute=i), i, v)
        for i, v in enumerate([1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0])
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, event_id long, value double"
    )
    got = {r["lag"]: r for r in anomaly.acf(df, lags=(1, 2)).collect()}
    assert got[1]["acf"] == -1.0 and got[1]["n_pairs"] == 7
    assert got[2]["acf"] == 1.0 and got[2]["n_pairs"] == 6


def test_acf_matches_numpy_and_drops_constant(spark):
    rng = np.random.default_rng(7)
    vals = rng.normal(size=40)
    rows = [
        ("k", "m", _ts(1, 0).replace(minute=i // 60, second=i % 60), i, float(v))
        for i, v in enumerate(vals)
    ]
    # constant series: zero variance at every lag -> dropped entirely
    rows += [
        ("c", "m", _ts(1, 0).replace(minute=i), i, 5.0) for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, event_id long, value double"
    )
    out = anomaly.acf(df, lags=(1, 3)).collect()
    assert {r["conv_id"] for r in out} == {"k"}
    got = {r["lag"]: r["acf"] for r in out}
    for lag in (1, 3):
        a, b = vals[lag:], vals[:-lag]
        want = np.corrcoef(a, b)[0, 1]
        assert abs(got[lag] - round(want, 5)) < 1e-9


def test_psi_identical_halves_is_zero(spark):
    # same distribution in both windows -> every bin fraction equal -> PSI 0
    rows = []
    for half, day in ((0, 1), (1, 20)):
        rows += [
            ("k", "m", _ts(day, 0).replace(minute=i % 60), i, float(i % 10))
            for i in range(100)
        ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, event_id long, value double"
    )
    out = anomaly.psi_drift(
        df, "2024-03-10 00:00:00", lo=0.0, hi=10.0, n_bins=10
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_ref"] == 100 and r["n_cur"] == 100
    assert r["psi"] == 0.0 and r["drifted"] == 0


def test_psi_shifted_distribution_drifts(spark):
    # ref all in bin 0, cur all in bin 9: PSI = 2 * (1-eps)*ln((1-eps)/eps)
    rows = [("k", "m", _ts(1, 0), i, 0.5) for i in range(50)]
    rows += [("k", "m", _ts(20, 0), 100 + i, 9.5) for i in range(50)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, event_id long, value double"
    )
    r = anomaly.psi_drift(
        df, "2024-03-10 00:00:00", lo=0.0, hi=10.0, n_bins=10
    ).collect()[0]
    import math
    eps = 1e-6
    # bin0 term: (eps - 1)·ln(eps/1); bin9 term: (1 - eps)·ln(1/eps)
    want = 2 * (1 - eps) * math.log(1 / eps)
    assert abs(r["psi"] - round(want, 6)) < 1e-9
    assert r["drifted"] == 1


def test_psi_clamps_out_of_range_values(spark):
    # values beyond [lo, hi] land in edge bins instead of vanishing
    rows = [("k", "m", _ts(1, 0), 1, -5.0), ("k", "m", _ts(20, 0), 2, 99.0)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, event_id long, value double"
    )
    r = anomaly.psi_drift(
        df, "2024-03-10 00:00:00", lo=0.0, hi=10.0, n_bins=10
    ).collect()[0]
    assert r["n_ref"] == 1 and r["n_cur"] == 1 and r["psi"] > 0


def test_seasonal_decompose_constant_series(spark):
    rows = [
        ("k", "m", _ts(d, h), d * 24 + h, 7.5)
        for d in range(1, 4) for h in range(24)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, event_id long, value double"
    )
    out = anomaly.seasonal_decompose(df).toPandas()
    assert len(out) == 72
    assert (out.v == 7.5).all() and (out.trend == 7.5).all()
    assert (out.seasonal == 0.0).all() and (out.resid == 0.0).all()
    # interior rows saw the full 25-bucket centered window; edges fewer
    assert out.wcnt.max() == 25 and out.wcnt.min() == 13


def test_seasonal_decompose_linear_trend_interior(spark):
    # linear ramp: a symmetric centered mean reproduces the center exactly,
    # so detrended (and hence resid net of the seasonal table) vanishes
    # in the interior; biased edge rows are exactly the wcnt<25 ones
    rows = [
        ("k", "m", _ts(1 + i // 24, i % 24), i, float(i))
        for i in range(72)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, event_id long, value double"
    )
    out = anomaly.seasonal_decompose(df).toPandas()
    interior = out[out.wcnt == 25]
    assert len(interior) == 72 - 24
    idx = (out.bucket_ts.dt.day - 1) * 24 + out.bucket_ts.dt.hour
    assert (out.v == idx.astype(float)).all()
    assert (interior.trend == interior.v).all()
    # seasonal is estimated from interior rows only, where det == 0 —
    # edge-window bias must NOT leak into it, so interior resid is
    # exactly zero (this is the regression the interior rule fixes)
    assert (out.seasonal == 0.0).all()
    assert (interior.resid == 0.0).all()
    # edge rows keep their biased det as resid, flagged by wcnt < 25
    edges = out[out.wcnt < 25]
    assert (edges.resid != 0.0).any()


def test_trend_ols_matches_numpy_polyfit(spark):
    # noisy-but-deterministic rising series: slope/intercept/r2 must match
    # an independent numpy least-squares fit on the same centered-x axis
    rng = np.random.default_rng(7)
    hours = list(range(48))
    vals = [5.0 + 0.25 * h + float(rng.normal(0, 0.5)) for h in hours]
    rows = [("a", "m", _ts(1 + h // 24, h % 24), float(v)) for h, v in zip(hours, vals)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double"
    )
    got = anomaly.trend_ols(df).collect()
    assert len(got) == 1
    r = got[0]
    x = np.array(hours, dtype=float) * 3600.0  # seconds since series start
    y = np.array(vals)
    slope, intercept = np.polyfit(x, y, 1)
    corr = np.corrcoef(x, y)[0, 1]
    assert r["n"] == 48
    assert abs(r["slope_day"] - slope * 86400.0) < 1e-5
    assert abs(r["intercept"] - intercept) < 1e-5
    assert abs(r["r2"] - corr * corr) < 1e-5


def test_trend_ols_degenerate_series(spark):
    rows = (
        # flat-but-fittable: exact slope 0, r2 undefined -> NULL
        [("flat", "m", _ts(1, h), 7.5) for h in range(6)]
        # all points at ONE timestamp: zero time variance, unfittable
        + [("onets", "m", _ts(1, 0), float(v)) for v in (1.0, 2.0, 3.0)]
        # single point: unfittable
        + [("single", "m", _ts(1, 0), 4.0)]
    )
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double"
    )
    got = {r["conv_id"]: r for r in anomaly.trend_ols(df).collect()}
    assert set(got) == {"flat"}  # unfittable series dropped
    assert got["flat"]["slope_day"] == 0.0
    assert got["flat"]["intercept"] == 7.5
    assert got["flat"]["r2"] is None


def test_burstiness_periodic_vs_bursty(spark):
    # perfectly periodic clock: sigma 0 -> B = -1, cv = 0
    periodic = [("clock", "m", _ts(1, h), 1.0) for h in range(10)]
    # bursty: 9 events in one minute then one a day later (heavy-tail gap)
    bursty = [
        ("burst", "m", datetime(2024, 3, 1, 0, 0, s), 1.0) for s in range(9)
    ] + [("burst", "m", _ts(2, 0), 1.0)]
    # degenerate: every event on ONE timestamp -> no cadence, dropped
    onets = [("onets", "m", _ts(1, 0), float(v)) for v in range(3)]
    df = spark.createDataFrame(
        periodic + bursty + onets,
        "conv_id string, metric string, ts timestamp, value double",
    )
    got = {r["conv_id"]: r for r in anomaly.burstiness(df).collect()}
    assert set(got) == {"clock", "burst"}
    assert got["clock"]["burstiness"] == -1.0
    assert got["clock"]["cv"] == 0.0
    assert got["clock"]["mean_gap_s"] == 3600.0
    # numpy twin for the bursty series
    gaps = np.array([1.0] * 8 + [86400.0 - 8.0])
    mu, sigma = gaps.mean(), gaps.std()
    assert got["burst"]["n_gaps"] == 9
    assert abs(got["burst"]["burstiness"] - (sigma - mu) / (sigma + mu)) < 1e-6
    # firmly bursty (σ > μ): well above Poisson's 0 and the clock's −1.
    # (B is bounded ≈ (√(n−1)−1)/(√(n−1)+1) for a single heavy-tail gap
    # among n−1 equal ones — 0.5 at n_gaps=9 — so 0.7 is unreachable here.)
    assert got["burst"]["burstiness"] > 0.4


def test_spectral_power_detects_daily_sinusoid(spark):
    import math
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = []
    for h in range(24 * 7):  # one week hourly
        ts = t0 + timedelta(hours=h)
        # pure daily sinusoid, amplitude 2, on a DC offset
        rows.append(("sine", 10.0 + 2.0 * math.sin(2 * math.pi * h / 24), ts, h))
        # linear ramp: no daily oscillation
        rows.append(("ramp", float(h), ts, h))
        # constant: zero variance -> dropped
        rows.append(("flat", 3.0, ts, h))
    df = spark.createDataFrame(rows, "conv_id string, value double, ts timestamp, event_id long")
    got = {r["conv_id"]: r for r in anomaly.spectral_power(df, period_s=86400.0).collect()}
    assert set(got) == {"sine", "ramp"}  # constant series dropped
    assert abs(got["sine"]["amp"] - 2.0) < 1e-3          # recovers amplitude
    assert got["sine"]["strength"] > 0.999               # all variance daily
    assert got["ramp"]["strength"] < 0.05                # none of the ramp's is


def test_spectral_power_null_values_skipped(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = [("a", None if h % 3 == 0 else float(h % 24), t0 + timedelta(hours=h), h)
            for h in range(48)]
    df = spark.createDataFrame(rows, "conv_id string, value double, ts timestamp, event_id long")
    [r] = anomaly.spectral_power(df).collect()
    assert r["n_pts"] == sum(1 for h in range(48) if h % 3 != 0)
    assert r["strength"] is not None


def test_changepoint_finds_level_shift(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = []
    # shift: 40 points at 1.0, then 40 at 5.0 (tiny deterministic ripple
    # so sigma > 0 within segments too)
    for h in range(80):
        lvl = 1.0 if h < 40 else 5.0
        rows.append(("shift", "m", t0 + timedelta(hours=h), h, lvl + 0.01 * (h % 2)))
        rows.append(("flat", "m", t0 + timedelta(hours=h), h, 2.0))  # zero var -> drop
    rows.append(("lone", "m", t0, 0, 9.0))  # single point -> drop
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, event_id long, value double"
    )
    got = {r["conv_id"]: r for r in anomaly.changepoint(df).collect()}
    assert set(got) == {"shift"}
    r = got["shift"]
    assert r["cp_idx"] == 40                       # left segment = first 40
    assert r["cp_ts"] == t0 + timedelta(hours=40)  # new level starts here
    assert abs(r["mean_left"] - 1.005) < 1e-6
    assert abs(r["mean_right"] - 5.005) < 1e-6
    assert abs(r["delta"] - 4.0) < 1e-6
    # max G for a clean half/half shift is (n/4)·Δ / (σ·√(n/4)) = √n·Δ/(4·σ̂)
    # = √80·4/(4·2.00002) ≈ 8.944 — far above the ~3 "real break" rule
    assert abs(r["stat"] - 8.944244) < 1e-3


def test_changepoint_no_shift_low_stat(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    # deterministic pseudo-noise around a constant level: stat stays small
    rows = [("a", "m", t0 + timedelta(hours=h), h, float((h * 7919) % 13))
            for h in range(100)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, event_id long, value double"
    )
    [r] = anomaly.changepoint(df).collect()
    assert r["stat"] < 3.0  # below the ~3-sigma "real break" rule of thumb

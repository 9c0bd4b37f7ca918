"""Unit tests for the round-4 late-pack additions: ramp-event extraction,
Holt linear smoothing, LTTB downsampling, and product-quantization ANN —
hand-computed oracles on tiny fixtures (the entry-level SQL parity is
covered separately by tools/compare_oracle.py)."""

from __future__ import annotations

from datetime import datetime

import numpy as np

from tsengine import anomaly


def _t(h, m=0, s=0):
    return datetime(2024, 3, 1, h, m, s)


# ---------------------------------------------------------- ramp events ---

def test_ramp_merges_consecutive_same_direction_steps(spark):
    # series: 0 →(+30)→ 30 →(+25)→ 55 →(-5)→ 50 →(-40)→ 10
    rows = [
        ("a", "m", _t(10), 0.0, 1),
        ("a", "m", _t(11), 30.0, 2),
        ("a", "m", _t(12), 55.0, 3),
        ("a", "m", _t(13), 50.0, 4),
        ("a", "m", _t(14), 10.0, 5),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    got = sorted(
        anomaly.ramp_events(df, threshold=20.0).collect(),
        key=lambda r: r["start_ts"],
    )
    assert len(got) == 2
    up, down = got
    # +30,+25 merge into ONE up-ramp with base at t=10
    assert up["direction"] == 1
    assert (up["start_ts"], up["end_ts"]) == (_t(10), _t(12))
    assert up["n_steps"] == 2
    assert up["total_change"] == 55.0   # telescoped 55 − 0
    assert up["max_step"] == 30.0
    # the −5 step breaks the run and is itself sub-threshold
    assert down["direction"] == -1
    assert (down["start_ts"], down["end_ts"]) == (_t(13), _t(14))
    assert down["n_steps"] == 1
    assert down["total_change"] == -40.0


def test_ramp_direction_flip_splits_events(spark):
    # +25 then −25 immediately: two events, no merge across direction
    rows = [
        ("a", "m", _t(10), 0.0, 1),
        ("a", "m", _t(11), 25.0, 2),
        ("a", "m", _t(12), 0.0, 3),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    got = anomaly.ramp_events(df, threshold=20.0).collect()
    assert sorted(r["direction"] for r in got) == [-1, 1]
    assert all(r["n_steps"] == 1 for r in got)


def test_ramp_flat_series_yields_nothing(spark):
    rows = [("a", "m", _t(10 + i), 5.0 + i, i) for i in range(5)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    assert anomaly.ramp_events(df, threshold=20.0).count() == 0


# ---------------------------------------------------------- holt linear ---

def test_holt_linear_matches_reference_recursion(spark):
    from tsengine import temporal

    ys = [10.0, 12.0, 13.0, 20.0, 18.0, 25.0]
    rows = [("a", "m", _t(10 + i), y, i + 1) for i, y in enumerate(ys)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    a, b = 0.5, 0.25
    got = {
        r["event_id"]: r
        for r in temporal.holt_linear(df, a, b, tiebreak="event_id").collect()
    }
    # reference recursion, FPP §8.2 form
    l, tr = ys[0], 0.0
    for i, y in enumerate(ys):
        if i:
            l_new = a * y + (1 - a) * (l + tr)
            tr = b * (l_new - l) + (1 - b) * tr
            l = l_new
        r = got[i + 1]
        assert abs(r["holt_level"] - l) < 1e-12
        assert abs(r["holt_trend"] - tr) < 1e-12
        assert abs(r["holt_fcst"] - (l + tr)) < 1e-12


def test_holt_linear_constant_series_zero_trend(spark):
    from tsengine import temporal

    rows = [("a", "m", _t(10 + i), 7.0, i + 1) for i in range(5)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    out = temporal.holt_linear(df, 0.5, 0.25, tiebreak="event_id").collect()
    assert all(r["holt_level"] == 7.0 and r["holt_trend"] == 0.0 for r in out)


# ---------------------------------------------------------- holt winters ---

def test_holt_winters_matches_reference_recursion(spark):
    from tsengine import temporal

    ys = [10.0, 14.0, 8.0, 12.0, 11.0, 15.5, 9.0, 13.0, 12.0]
    rows = [("a", "m", _t(10 + i), y, i + 1) for i, y in enumerate(ys)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    a, b, g, m = 0.5, 0.25, 0.25, 4
    got = {
        r["event_id"]: r
        for r in temporal.holt_winters(
            df, a, b, g, m=m, tiebreak="event_id"
        ).collect()
    }
    # output starts at t = m+1 only
    assert sorted(got) == list(range(m + 1, len(ys) + 1))
    # reference recursion, FPP §8.3 additive form
    l = sum(ys[:m]) / m
    tr = 0.0
    s = [y - l for y in ys[:m]]
    for i in range(m, len(ys)):
        s_old, prior = s[0], l + tr
        fc = prior + s_old
        l_new = a * (ys[i] - s_old) + (1 - a) * prior
        tr = b * (l_new - l) + (1 - b) * tr
        s = s[1:] + [g * (ys[i] - prior) + (1 - g) * s_old]
        l = l_new
        r = got[i + 1]
        assert abs(r["hw_level"] - l) < 1e-12
        assert abs(r["hw_trend"] - tr) < 1e-12
        assert abs(r["hw_season"] - s[-1]) < 1e-12
        assert abs(r["hw_fcst"] - fc) < 1e-12


def test_holt_winters_exact_on_pure_seasonal_series(spark):
    from tsengine import temporal

    # exactly periodic series: the FPP init is already the fixed point, so
    # every one-step forecast is exact and level/trend never move
    cycle = [3.0, 9.0, 5.0, 7.0]
    ys = cycle * 3
    rows = [("a", "m", _t(0, i), y, i + 1) for i, y in enumerate(ys)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    out = temporal.holt_winters(
        df, 0.5, 0.25, 0.25, m=4, tiebreak="event_id"
    ).collect()
    assert len(out) == len(ys) - 4
    for r in out:
        assert r["hw_level"] == 6.0
        assert r["hw_trend"] == 0.0
        assert abs(r["hw_fcst"] - ys[r["event_id"] - 1]) < 1e-12


def test_holt_winters_short_series_emits_nothing(spark):
    from tsengine import temporal

    rows = [("a", "m", _t(10 + i), float(i), i + 1) for i in range(4)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    assert temporal.holt_winters(df, 0.5, 0.25, 0.25, m=4).count() == 0


# ------------------------------------------------------------------ lttb ---

def test_lttb_small_series_passes_through(spark):
    from tsengine import rolling

    rows = [("a", "m", _t(10 + i), float(i), i + 1) for i in range(5)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    got = sorted(
        rolling.lttb_downsample(df, n_out=8).collect(),
        key=lambda r: r["sel_ord"],
    )
    assert [r["event_id"] for r in got] == [1, 2, 3, 4, 5]
    assert [r["sel_ord"] for r in got] == [0, 1, 2, 3, 4]


def test_lttb_keeps_endpoints_and_spikes(spark):
    from tsengine import rolling

    # 20 points: flat at 1.0 except one huge spike in each middle stretch;
    # LTTB must keep first, last, and pick the spike wherever its bucket
    # holds one (triangle area dominated by the outlier y)
    n = 20
    spikes = {4: 100.0, 9: -80.0, 15: 120.0}
    rows = [
        ("a", "m", _t(0, i), spikes.get(i, 1.0), i + 1) for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    got = sorted(
        rolling.lttb_downsample(df, n_out=8).collect(),
        key=lambda r: r["sel_ord"],
    )
    assert len(got) == 8
    assert got[0]["event_id"] == 1 and got[-1]["event_id"] == n
    picked = {r["event_id"] for r in got}
    # every spike sits strictly inside the middle range -> must be kept
    assert {5, 10, 16} <= picked


def test_lttb_output_count_is_n_out(spark):
    from tsengine import rolling

    rows = [
        (c, "m", _t(0, i), float((i * 7) % 13), i + 1)
        for c in ("a", "b")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    out = rolling.lttb_downsample(df, n_out=8)
    cnt = {r["conv_id"]: r["c"] for r in
           out.groupBy("conv_id").agg(__import__("pyspark").sql.functions
                                      .count("*").alias("c")).collect()}
    assert cnt == {"a": 8, "b": 8}


# -------------------------------------------------------------------- pq ---

def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_pq_codebook_members_encode_to_own_codes(spark):
    from tsengine import vecops

    rng = np.random.RandomState(3)
    vecs = rng.randn(6, 8).astype("float32") * 0.3
    df = _emb_df(spark, vecs)
    cbs = vecops.pq_codebooks(df, n_codes=4, m_sub=2)
    enc = {r["vec_id"]: r for r in
           vecops.pq_encode(df, cbs).collect()}
    # the first 4 vectors ARE the codebook -> each encodes to itself
    for c in range(4):
        assert (enc[c]["code_0"], enc[c]["code_1"]) == (c, c)


def test_pq_topk_matches_numpy_adc(spark):
    from tsengine import vecops

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 8).astype("float32") * 0.3
    df = _emb_df(spark, vecs)
    q = [float(x) for x in (rng.randn(8) * 0.3)]
    got = vecops.pq_topk(df, q, k=5, n_codes=4, m_sub=2).collect()

    # independent numpy replay of the same deterministic convention
    X = vecs.astype("float64")
    C = X[:4]                      # codebook = first 4 vectors, vec_id order
    sub = lambda A, j: A[..., j * 4:(j + 1) * 4]
    qa = np.asarray(q, dtype="float64")
    adc = np.zeros(len(X))
    codes = []
    for j in range(2):
        d = ((sub(X, j)[:, None, :] - sub(C, j)[None, :, :]) ** 2).sum(2)
        cj = np.argmin(np.round(d, 6), axis=1)
        codes.append(cj)
        qd = ((sub(qa, j)[None, :] - sub(C, j)) ** 2).sum(1)
        adc += qd[cj]
    order = np.lexsort((np.arange(len(X)), np.round(adc, 6)))[:5]
    assert [r["vec_id"] for r in got] == [int(i) for i in order]
    for r in got:
        assert abs(r["pq_dist"] - adc[r["vec_id"]]) < 1e-5
        c0, c1 = (int(x) for x in r["pq_code"].split("-"))
        assert (c0, c1) == (codes[0][r["vec_id"]], codes[1][r["vec_id"]])


def test_ivfpq_topk_matches_python_replay(spark):
    from tsengine import vecops

    rng = np.random.RandomState(11)
    vecs = rng.randn(30, 8).astype("float32") * 0.4
    df = _emb_df(spark, vecs)
    q = [float(x) for x in (rng.randn(8) * 0.4)]
    got = vecops.ivfpq_topk(
        df, q, k=6, n_centroids=2, nprobe=1, n_codes=4, m_sub=2
    ).collect()

    # plain-Python replay of the identical convention (left-assoc chains,
    # round-6 argmins, lowest-id ties) — independent of Spark and SQL
    X = [[float(x) for x in row] for row in vecs.astype("float64")]
    cents = {i: X[i] for i in range(2)}           # first 2 by vec_id

    def l2sq(a, b, lo, hi):
        acc, first = 0.0, True
        for i in range(lo, hi):
            t = (a[i] - b[i]) * (a[i] - b[i])
            acc, first = (t if first else acc + t), False
        return acc

    assign = {vid: min(cents, key=lambda c: (l2sq(X[vid], cents[c], 0, 8) ** 0.5, c))
              for vid in range(len(X))}
    probe = min(cents, key=lambda c: (l2sq(q, cents[c], 0, 8) ** 0.5, c))
    rescb = [[X[vid][i] - cents[assign[vid]][i] for i in range(8)]
             for vid in range(4)]                  # first 4 by vec_id

    scored = []
    for vid in range(len(X)):
        if assign[vid] != probe:
            continue
        rv = [X[vid][i] - cents[assign[vid]][i] for i in range(8)]
        qrv = [q[i] - cents[probe][i] for i in range(8)]
        codes, dist = [], 0.0
        for j in range(2):
            lo, hi = j * 4, (j + 1) * 4
            cj = min(range(4),
                     key=lambda c: (round(l2sq(rv, rescb[c], lo, hi), 6), c))
            codes.append(cj)
            dist += l2sq(qrv, rescb[cj], lo, hi)
        scored.append((round(dist, 6), vid, codes, dist))
    scored.sort(key=lambda t: (t[0], t[1]))

    assert [r["vec_id"] for r in got] == [t[1] for t in scored[:6]]
    for r, t in zip(got, scored):
        assert r["centroid_id"] == probe
        assert [int(x) for x in r["pq_code"].split("-")] == t[2]
        assert abs(r["pq_dist"] - t[3]) < 1e-5


# ------------------------------------------------------------------ peaks ---

def test_peaks_strict_interior_maxima_only(spark):
    # 1, 9, 3, 8, 8, 2, 12  — 9 is a peak; the 8,8 plateau is not (strict);
    # trailing 12 is an endpoint (no right neighbour) so it never qualifies
    ys = [1.0, 9.0, 3.0, 8.0, 8.0, 2.0, 12.0]
    rows = [("a", "m", _t(10 + i), y, i + 1) for i, y in enumerate(ys)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    got = anomaly.peaks(df, delta=0.0).collect()
    assert [(r["event_id"], r["peak_value"], r["peak_gap"]) for r in got] == [
        (2, 9.0, 6.0)  # gap = 9 − max(1, 3)
    ]


def test_peaks_delta_floor_filters_small_spikes(spark):
    # peaks at 5 (gap 2) and 50 (gap 30): delta=10 keeps only the second
    ys = [3.0, 5.0, 3.0, 20.0, 50.0, 4.0]
    rows = [("a", "m", _t(10 + i), y, i + 1) for i, y in enumerate(ys)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    got = anomaly.peaks(df, delta=10.0).collect()
    assert [(r["event_id"], r["peak_gap"]) for r in got] == [(5, 30.0)]


# -------------------------------------------------------------------- dtw ---

def _dtw_ref(x, r, band, big=1e12):
    # independent textbook DP used as the test oracle
    import math
    n = len(r)
    prev = [math.inf] * (n + 1)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = [math.inf] * (n + 1)
        for j in range(1, n + 1):
            c = big if band is not None and abs(i - j) > band else \
                abs(x[i - 1] - r[j - 1])
            cur[j] = c + min(prev[j], prev[j - 1], cur[j - 1])
        prev = cur
    return prev[n]


def test_dtw_profile_zero_for_identical_shape(spark):
    from tsengine import temporal

    rows = []
    for cid in ("0", "same"):
        for i, h in enumerate((1, 1, 2)):
            rows.append((cid, _t(h, i), i + 1))
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, event_id long")
    got = temporal.dtw_hour_profile(df, ref_key="0", band=6).collect()
    assert [(r["conv_id"], r["dtw"]) for r in got] == [("same", 0.0)]


def test_dtw_profile_matches_textbook_dp(spark):
    from tsengine import temporal

    # ref active in hours 1,1,2; candidates shifted / denser
    series = {"0": (1, 1, 2), "shift": (2, 2, 3), "dense": (1, 1, 1, 2, 2)}
    rows = []
    for cid, hs in series.items():
        for i, h in enumerate(hs):
            rows.append((cid, _t(h, i), i + 1))
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, event_id long")
    prof = {cid: [float(sum(1 for h in hs if h == b)) for b in range(24)]
            for cid, hs in series.items()}
    got = {r["conv_id"]: r["dtw"]
           for r in temporal.dtw_hour_profile(df, ref_key="0", band=6).collect()}
    assert got == {
        cid: _dtw_ref(p, prof["0"], band=6)
        for cid, p in prof.items() if cid != "0"
    }
    # the band must bite: without it the shifted series could warp freely
    got_nb = {r["conv_id"]: r["dtw"]
              for r in temporal.dtw_hour_profile(df, ref_key="0", band=None).collect()}
    assert got_nb == {
        cid: _dtw_ref(p, prof["0"], band=None)
        for cid, p in prof.items() if cid != "0"
    }


def test_dtw_profile_missing_ref_raises(spark):
    from tsengine import temporal

    import pytest

    df = spark.createDataFrame(
        [("a", _t(1), 1)], "conv_id string, ts timestamp, event_id long"
    )
    with pytest.raises(ValueError):
        temporal.dtw_hour_profile(df, ref_key="nope")


# ----------------------------------------------------------------- kalman ---

def test_kalman_matches_reference_recursion(spark):
    from tsengine import temporal

    ys = [10.0, 12.0, 9.0, 20.0, 18.0, 25.0, 14.0]
    rows = [("a", "m", _t(10 + i), y, i + 1) for i, y in enumerate(ys)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    got = {
        r["event_id"]: r
        for r in temporal.kalman_filter(
            df, q=0.25, r=1.0, tiebreak="event_id"
        ).collect()
    }
    assert sorted(got) == list(range(2, len(ys) + 1))
    l, v = ys[0], 0.0
    p11, p12, p22 = 1.0, 0.0, 1.0
    for i in range(1, len(ys)):
        lp = l + v
        p11p = ((p11 + p12) + (p12 + p22)) + 0.0625
        p12p = (p12 + p22) + 0.125
        p22p = p22 + 0.25
        s = p11p + 1.0
        k1, k2 = p11p / s, p12p / s
        innov = ys[i] - lp
        l = lp + k1 * innov
        v = v + k2 * innov
        p11, p12 = (1.0 - k1) * p11p, (1.0 - k1) * p12p
        p22 = p22p - k2 * p12p
        r = got[i + 1]
        assert r["kf_level"] == l
        assert r["kf_velocity"] == v
        assert r["kf_innov"] == innov
        assert r["kf_gain"] == k1


def test_kalman_constant_series_is_a_fixed_point(spark):
    from tsengine import temporal

    rows = [("a", "m", _t(10 + i), 7.0, i + 1) for i in range(6)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    out = temporal.kalman_filter(df, tiebreak="event_id").collect()
    assert len(out) == 5
    for r in out:
        assert r["kf_level"] == 7.0
        assert r["kf_velocity"] == 0.0
        assert r["kf_innov"] == 0.0
        assert 0.0 < r["kf_gain"] < 1.0


def test_kalman_single_point_emits_nothing(spark):
    from tsengine import temporal

    df = spark.createDataFrame(
        [("a", "m", _t(10), 7.0, 1)],
        "conv_id string, metric string, ts timestamp, value double, "
        "event_id long",
    )
    assert temporal.kalman_filter(df).count() == 0


# --------------------------------------------------------- matrix profile ---

def _mp_ref(xs, w=4):
    nw = len(xs) - w + 1
    out = {}
    for i in range(nw):
        best = None
        for j in range(nw):
            if abs(i - j) < w:
                continue
            d = 0.0
            for t in range(w):
                e = xs[i + t] - xs[j + t]
                d = d + e * e
            if best is None or d < best:
                best = d
        if best is not None:
            out[i] = best
    return out


def test_matrix_profile_finds_motif_and_discord(spark):
    # two exact copies of the shape [1,5,1,2] separated by a discord burst
    xs = [1.0, 5.0, 1.0, 2.0, 40.0, -7.0, 33.0, 0.0, 1.0, 5.0, 1.0, 2.0]
    rows = [("a", "m", _t(0, i), x, i + 1) for i, x in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    got = {r["event_id"] - 1: r["mp"]
           for r in anomaly.matrix_profile(df, w=4).collect()}
    assert got == _mp_ref(xs)
    # the twin windows at i=0 and i=8 are exact motifs → mp 0
    assert got[0] == 0.0 and got[8] == 0.0
    # the burst window is the top discord
    assert max(got, key=got.get) in (3, 4, 5)


def test_matrix_profile_short_series_emits_nothing(spark):
    rows = [("a", "m", _t(0, i), float(i), i + 1) for i in range(7)]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, value double, "
        "event_id long"
    )
    # n=7 < 2w: every pair of windows overlaps the exclusion zone
    assert anomaly.matrix_profile(df, w=4).count() == 0

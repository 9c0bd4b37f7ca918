"""Round-trip property tests for the Gorilla / delta-of-delta codecs
(SURVEY §5 item 3: identity on random float series incl. NaN/±0/denormals;
delta-of-delta on irregular timestamps)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tsengine import codec

FLOAT_CODECS = list(codec.CODECS)
TS_CODECS = list(codec.TS_CODECS)


def _bits_equal(a: np.ndarray, b: np.ndarray) -> bool:
    return len(a) == len(b) and np.array_equal(
        a.view(np.uint64), b.view(np.uint64)
    )


@pytest.mark.parametrize("name", FLOAT_CODECS)
def test_float_edge_cases(name):
    enc, dec = codec.CODECS[name]
    cases = [
        np.array([], dtype=np.float64),
        np.array([0.0]),
        np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 5e-324, -5e-324, 1.0]),
        np.repeat(np.pi, 500),
        np.array([1e308, -1e308, 1e-308]),
    ]
    for c in cases:
        assert _bits_equal(c, dec(enc(c)))


@pytest.mark.parametrize("name", FLOAT_CODECS)
@settings(max_examples=30, deadline=None)
@given(data=st.lists(st.floats(allow_nan=True, width=64), max_size=400))
def test_float_roundtrip_property(name, data):
    enc, dec = codec.CODECS[name]
    arr = np.array(data, dtype=np.float64)
    assert _bits_equal(arr, dec(enc(arr)))


@pytest.mark.parametrize("name", FLOAT_CODECS)
def test_float_random_walk_compresses(name):
    enc, _ = codec.CODECS[name]
    rng = np.random.default_rng(7)
    # sensor-like series: values hold for ~10 steps (typical rollup output)
    smooth = np.repeat(np.round(np.cumsum(rng.normal(size=1000)), 3), 10)
    blob = enc(smooth)
    assert len(blob) < smooth.nbytes / 2  # must actually compress

def test_regular_grid_ts_compression():
    # gap-filled 1-minute grid: dod ≡ 0 → extreme compression
    ts = (np.arange(10_000, dtype=np.int64) * 60 + 1735689600) * 10**9
    for name in TS_CODECS:
        enc, dec = codec.TS_CODECS[name]
        blob = enc(ts)
        assert np.array_equal(dec(blob), ts)
        assert len(blob) < ts.nbytes / 50, name


@pytest.mark.parametrize("name", TS_CODECS)
@settings(max_examples=30, deadline=None)
@given(data=st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=300))
def test_ts_roundtrip_property(name, data):
    enc, dec = codec.TS_CODECS[name]
    arr = np.array(data, dtype=np.int64)
    assert np.array_equal(dec(enc(arr)), arr)


@pytest.mark.parametrize("name", TS_CODECS)
def test_ts_irregular(name):
    enc, dec = codec.TS_CODECS[name]
    rng = np.random.default_rng(11)
    deltas = np.maximum(1, rng.lognormal(3, 1.5, 5000)).astype(np.int64)
    ts = 1735689600 + np.cumsum(deltas)
    assert np.array_equal(dec(enc(ts)), ts)

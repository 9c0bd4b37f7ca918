"""rollup_from_raw_wide must equal the long-path rollup exactly (it is a
shuffle-volume optimization, not a semantics change)."""

from __future__ import annotations

import pandas as pd

from tsengine import features, rollup


def _canon(df):
    pdf = df.toPandas().sort_values(["conv_id", "bucket_ts", "metric"]).reset_index(drop=True)
    return pdf[sorted(pdf.columns)]


def test_wide_equals_long(transcripts):
    wide = features.derive_features_chunked(transcripts)
    long = features.to_long(wide)
    a = _canon(rollup.rollup_from_raw(long, "1m"))
    b = _canon(rollup.rollup_from_raw_wide(wide, features.DEFAULT_METRICS, "1m"))
    pd.testing.assert_frame_equal(a, b, rtol=1e-12)


def test_wide_cascade_consistent(transcripts):
    wide = features.derive_features_chunked(transcripts)
    t1m = rollup.rollup_from_raw_wide(wide, features.DEFAULT_METRICS, "1m")
    t1h = rollup.cascade(t1m, "1h")
    long = features.to_long(wide)
    direct = _canon(rollup.rollup_from_raw(long, "1h"))
    pd.testing.assert_frame_equal(_canon(t1h), direct, rtol=1e-9)

"""Signal pack: the pure-Column path must equal the pandas twin, and both
must match a hand-written oracle (SURVEY §5 item 2)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from tsengine import features


def _collect_sorted(df, cols):
    return (
        df.select(*cols)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_column_path_equals_pandas_twin(spark, transcripts):
    cols = ["conv_id", "turn_idx"] + features.DEFAULT_METRICS
    a = _collect_sorted(features.derive_features(transcripts), cols)
    b = _collect_sorted(
        features.apply_signal_pack_pandas(transcripts), cols
    )
    pd.testing.assert_frame_equal(a, b, check_exact=False, rtol=1e-12)


def test_latency_oracle_single_conv(spark, transcripts):
    one = transcripts.where(F.col("conv_id") == "conv-00000003")
    pdf = one.toPandas().sort_values("turn_idx")
    got = (
        features.derive_features(one)
        .select("turn_idx", "latency_s", "n_chars", "char_rate")
        .toPandas()
        .sort_values("turn_idx")
        .reset_index(drop=True)
    )
    t = pdf["ts"].astype("int64").to_numpy() / 1e9
    exp_lat = np.concatenate([[np.nan], np.diff(t)])
    np.testing.assert_allclose(got["latency_s"], exp_lat, rtol=1e-12)
    exp_chars = pdf["text"].str.len().to_numpy(dtype=float)
    np.testing.assert_allclose(got["n_chars"], exp_chars)
    np.testing.assert_allclose(
        got["char_rate"], exp_chars / np.maximum(exp_lat, 1.0), rtol=1e-12
    )


def test_long_format(spark, transcripts):
    wide = features.derive_features(transcripts)
    long = features.to_long(wide)
    ms = {r["metric"] for r in long.select("metric").distinct().collect()}
    assert ms == set(features.DEFAULT_METRICS)
    # latency_s is null on turn 0 → exactly n_convs fewer rows than others
    cnt = long.groupBy("metric").count().toPandas().set_index("metric")["count"]
    n_convs = wide.select("conv_id").distinct().count()
    assert cnt["n_chars"] - cnt["latency_s"] == n_convs


def test_composite_pack_column_vs_pandas_parity(spark):
    rows = [
        (0, "click", 10.0), (1, "purchase", 80.0), (2, "view", -5.0),
        (3, "click", 100.0), (4, "error", 49.999999), (5, "signup", 0.0),
        (6, "click", 41.0),   # raw = 50.2 -> clipped, residual > 0
    ]
    df = spark.createDataFrame(rows, "event_id long, disp string, value double")
    got = (
        features.apply_composite_pack(df, "disp", "value", cap=50.0)
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    import pandas as pd

    want = features.composite_pack_pandas(
        pd.DataFrame(rows, columns=["event_id", "disp", "value"]), "disp", "value", 50.0
    ).sort_values("event_id").reset_index(drop=True)
    for c in features.COMPOSITE_METRICS:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)
    # decomposition invariant: components sum exactly to the clipped total
    np.testing.assert_allclose(got["direct"] + got["diffuse"], got["total"], rtol=1e-15)
    # dispatch + clip behave piecewise: negative input -> total 0, residual < 0
    assert got.loc[2, "total"] == 0.0 and got.loc[2, "residual"] == -5.0
    # clipped branch keeps the positive residual
    assert got.loc[6, "total"] == 50.0 and got.loc[6, "residual"] > 0

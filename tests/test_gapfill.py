"""Gap fill: Catalyst path ≡ pandas path ≡ reference semantics
(`resample().interpolate('linear')` + trailing pad, `ncep/wind.py:187-197`);
invariant: never invents points outside [min ts, max ts] except the pad."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from tsengine import features, gapfill


def _long(transcripts):
    return features.to_long(
        features.derive_features(transcripts), ["char_rate", "latency_s"]
    )


def _norm(pdf):
    return pdf.sort_values(["conv_id", "metric", "bucket_ts"]).reset_index(drop=True)


def test_sql_equals_pandas(spark, transcripts):
    long = _long(transcripts).where(F.col("conv_id") < "conv-00000020")
    for method in ("linear", "ffill"):
        for pad in (0, 5):
            a = _norm(gapfill.gapfill_sql(long, "1m", method, pad).toPandas())
            b = _norm(gapfill.gapfill_pandas(long, "1m", method, pad).toPandas())
            assert len(a) == len(b), (method, pad)
            pd.testing.assert_frame_equal(
                a[["conv_id", "metric", "bucket_ts", "filled"]],
                b[["conv_id", "metric", "bucket_ts", "filled"]],
            )
            np.testing.assert_allclose(a["value"], b["value"], rtol=1e-9, atol=1e-12,
                                       err_msg=f"{method} pad={pad}")


def test_grid_bounds_invariant(spark, transcripts):
    long = _long(transcripts)
    filled = gapfill.gapfill_sql(long, "1m", "linear", pad_steps=0)
    bounds = long.groupBy("conv_id", "metric").agg(
        F.date_trunc("minute", F.min("ts")).alias("lo"),
        F.date_trunc("minute", F.max("ts")).alias("hi"),
    )
    j = filled.join(bounds, ["conv_id", "metric"])
    outside = j.where((F.col("bucket_ts") < F.col("lo")) | (F.col("bucket_ts") > F.col("hi")))
    assert outside.count() == 0
    # every grid minute present exactly once
    dup = filled.groupBy("conv_id", "metric", "bucket_ts").count().where("count > 1")
    assert dup.count() == 0


def test_trailing_pad(spark, transcripts):
    long = _long(transcripts).where(F.col("metric") == "char_rate")
    pad = 5
    f0 = gapfill.gapfill_sql(long, "1m", "linear", 0)
    f5 = gapfill.gapfill_sql(long, "1m", "linear", pad)
    c0 = f0.groupBy("conv_id").count().toPandas().set_index("conv_id")["count"]
    c5 = f5.groupBy("conv_id").count().toPandas().set_index("conv_id")["count"]
    assert ((c5 - c0) == pad).all()  # rewemo's missinghours==5 invariant (W2)
    # pad values repeat the last known value
    last = (
        f5.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark").sql.Window.partitionBy("conv_id")
                .orderBy(F.col("bucket_ts").desc())
            ),
        )
        .where(F.col("rn") <= pad + 1)
    )
    pdf = last.toPandas().sort_values(["conv_id", "bucket_ts"])
    for _, g in pdf.groupby("conv_id"):
        vals = g["value"].to_numpy()
        assert np.allclose(vals, vals[0], equal_nan=True)


def test_gap_metrics(spark, transcripts):
    long = _long(transcripts)
    filled = gapfill.gapfill_sql(long, "1m", "linear")
    gm = gapfill.gap_metrics(filled).toPandas()
    assert (gm["n_filled"] <= gm["n_points"]).all()
    assert gm["n_filled"].sum() > 0  # synth injects gaps, so fills must occur


def test_mega_span_series_day_chunked(spark):
    """A sparse series spanning 2 years must not materialize one giant
    sequence array: the segment design caps every explode at <= 1 day of
    steps. Output still matches the pandas twin exactly."""
    rows = []
    ts0 = pd.Timestamp("2022-01-15 06:00:00")
    # 12 observations, months apart -> 2-year span, huge gaps
    for i in range(12):
        rows.append(("mega", "m", (ts0 + pd.Timedelta(days=61 * i, hours=i)).to_pydatetime(), float(i * i)))
    df = spark.createDataFrame(rows, "conv_id string, metric string, ts timestamp, value double")
    got = _norm(gapfill.gapfill_sql(df, "1h", "linear", pad_steps=2).toPandas())
    want = _norm(gapfill.gapfill_pandas(df, "1h", "linear", pad_steps=2).toPandas())
    assert len(got) == len(want) and len(got) > 16000  # ~671 days of hours
    pd.testing.assert_frame_equal(
        got[["conv_id", "metric", "bucket_ts", "filled"]],
        want[["conv_id", "metric", "bucket_ts", "filled"]],
    )
    np.testing.assert_allclose(got["value"], want["value"], rtol=1e-9, atol=1e-12)

"""curves tests: np.interp parity + A3 threshold extraction."""

from __future__ import annotations

import numpy as np
import pytest

from tsengine import curves

X = np.array([50.0, 100.0, 150.0, 200.0])


def test_thresholds_basic():
    cut_in, cut_out = curves.curve_thresholds(X, [0.0, 0.5, 1.0, 0.0])
    # first positive at idx 1 -> knot before it (+1e-9); last positive at
    # idx 2 -> knot after it
    assert cut_in == pytest.approx(50.0 + 1e-9, abs=0)
    assert cut_out == 200.0


def test_thresholds_clamped_at_ends():
    cut_in, cut_out = curves.curve_thresholds(X, [1.0, 1.0, 1.0, 1.0])
    assert cut_in == pytest.approx(50.0 + 1e-9, abs=0)  # clamped, no wrap
    assert cut_out == 200.0


def test_thresholds_no_positive_raises():
    with pytest.raises(ValueError):
        curves.curve_thresholds(X, [0.0, 0.0, 0.0, 0.0])


def test_interp_udf_matches_numpy(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    y = np.array([0.0, 0.5, 1.0, 0.25])
    vals = [25.0, 50.0, 75.0, 125.0, 200.0, 201.0, float("nan")]
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    interp = curves.make_interp_udf(X, {"c": y})
    got = df.select(interp(F.col("v"), F.lit("c")).alias("p")).toPandas()["p"]
    want = np.interp(np.array(vals), X, y, left=0.0, right=0.0)
    want[np.isnan(vals)] = np.nan
    np.testing.assert_array_equal(got.to_numpy(), want)


def test_read_curve_csv_roundtrip(spark, tmp_path):
    p = tmp_path / "curves.csv"
    p.write_text("speed,curve_a,curve_b\n50,0.0,0.1\n100,0.5,0.6\n150,1.0,0.9\n")
    df = curves.read_curve_csv(spark, str(p))
    assert df.columns == ["x", "curve_a", "curve_b"]
    x, cs = curves.curve_table_to_arrays(df)
    np.testing.assert_array_equal(x, [50.0, 100.0, 150.0])
    np.testing.assert_array_equal(cs["curve_a"], [0.0, 0.5, 1.0])
    np.testing.assert_array_equal(cs["curve_b"], [0.1, 0.6, 0.9])

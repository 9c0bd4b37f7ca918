"""disagg tests: W3 explode semantics + the A8 Σhourly == daily invariant."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tsengine import disagg


@pytest.fixture(scope="module")
def daily(spark):
    rows = [
        ("c1", "2024-03-01 00:00:00", 240.0),
        ("c1", "2024-03-02 00:00:00", -48.0),   # negative daily total
        ("c2", "2024-03-01 00:00:00", 0.0),
    ]
    return spark.createDataFrame(rows, "conv_id string, day_ts string, value double").select(
        "conv_id", F.col("day_ts").cast("timestamp").alias("day_ts"), "value"
    )


def test_disaggregate_shape_and_sum(daily):
    out = disagg.disaggregate_daily(daily, keys=["conv_id"]).toPandas()
    assert len(out) == 3 * 24
    # Σ over each day reproduces the daily value exactly-ish (weights sum to 1)
    s = out.groupby(["conv_id", out["bucket_ts"].dt.floor("D")])["value_h"].sum()
    np.testing.assert_allclose(sorted(s), sorted([-48.0, 0.0, 240.0]), atol=1e-9)
    # night hours get exactly zero under the triangle profile
    night = out[out["hour"].isin([0, 1, 2, 3, 4, 20, 21, 22, 23])]
    assert (night["value_h"] == 0).all()
    # peak hour = weight 7/56 of the daily total
    peak = out[(out["conv_id"] == "c1") & (out["hour"] == 12)
               & (out["bucket_ts"].dt.day == 1)]
    assert abs(peak["value_h"].iloc[0] - 240.0 * 7 / 56) < 1e-9


def test_negative_weights_clipped():
    wn = disagg.normalized_weights([-5.0] * 12 + [1.0] * 12)
    assert wn[:12] == [0.0] * 12
    assert abs(sum(wn) - 1.0) < 1e-12


def test_weight_validation():
    with pytest.raises(ValueError):
        disagg.normalized_weights([1.0] * 23)
    with pytest.raises(ValueError):
        disagg.normalized_weights([-1.0] * 24)


def test_renormalize_matches_target(spark):
    rows = []
    rng = np.random.default_rng(3)
    for d in (1, 2):
        for h in range(24):
            rows.append(("c1", f"2024-03-0{d} {h:02d}:00:00", float(rng.uniform(0, 10)), 100.0 * d))
    # a zero-sum day: factor must stay 1
    for h in range(3):
        rows.append(("c2", f"2024-03-01 {h:02d}:00:00", 0.0, 50.0))
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_ts string, value double, daily_target double"
    ).select("conv_id", F.col("bucket_ts").cast("timestamp").alias("bucket_ts"),
             "value", "daily_target")
    out = disagg.renormalize_daily(df, keys=["conv_id"]).toPandas()
    g = out.groupby(["conv_id", out["bucket_ts"].dt.floor("D")])
    sums = g["value_renorm"].sum()
    # A8 invariant: renormalized day sums hit the target exactly
    assert abs(sums[("c1",)].iloc[0] - 100.0) < 1e-9
    assert abs(sums[("c1",)].iloc[1] - 200.0) < 1e-9
    # zero-sum day: factor 1, values unchanged
    c2 = out[out["conv_id"] == "c2"]
    assert (c2["renorm_factor"] == 1.0).all()
    assert (c2["value_renorm"] == 0.0).all()

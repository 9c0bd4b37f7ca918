"""Piecewise-linear curve lookup (SURVEY §2.3 J3/J4/J5).

Semantics match the reference exactly: monotone-x curve, linear
interpolation between knots, out-of-range → 0 on BOTH sides
(`np.interp(..., left=0, right=0)` at `src/rewemo/windpower.py:19`;
`interp1d(..., fill_value=(0,0))` at `ncep/wind.py:44-48`).

Spark plan: the curve table is tiny → collected once, shipped as a numpy
array inside an Arrow-vectorized scalar pandas UDF (broadcast by closure —
for multi-MB curves use ``sc.broadcast``). The per-conversation curve
choice (J4) and scaling (J5) come from a broadcast-hash join with the
conv_config dim — Catalyst picks broadcast automatically under the
autoBroadcastJoinThreshold; we hint anyway."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def make_interp_udf(x: np.ndarray, curves: dict[str, np.ndarray]):
    """Scalar pandas UDF: (value, curve_ref) → interpolated response.

    One np.interp per Arrow batch per distinct curve in the batch —
    whole-column vectorized, no per-row Python."""
    names = sorted(curves)
    ys = {n: np.asarray(curves[n], dtype=np.float64) for n in names}
    xs = np.asarray(x, dtype=np.float64)

    @pandas_udf("double")
    def interp(v: pd.Series, ref: pd.Series) -> pd.Series:
        out = np.zeros(len(v), dtype=np.float64)
        vv = v.to_numpy(dtype=np.float64, na_value=np.nan)
        refs = ref.to_numpy()
        for name in names:
            m = refs == name
            if m.any():
                out[m] = np.interp(vv[m], xs, ys[name], left=0.0, right=0.0)
        out[np.isnan(vv)] = np.nan
        return pd.Series(out)

    return interp


def read_curve_csv(spark, path: str) -> DataFrame:
    """S4 CSV dimension scan: a header CSV whose first column is the curve
    x-axis and remaining columns are named response curves (≙ the power
    curve files read with ``pd.read_csv`` at
    `examples/example_create_wind_power.py:17` and
    `ncep_reanalysis/example_wind.py:14`). Returned with the x column
    normalized to ``x`` so it feeds curve_table_to_arrays directly."""
    df = spark.read.option("header", True).option("inferSchema", True).csv(path)
    return df.withColumnRenamed(df.columns[0], "x")


SMALL_NUMBER = 1e-9  # ≙ `examples/helper_functions.py:15`


def curve_thresholds(x, y, small: float = SMALL_NUMBER) -> tuple[float, float]:
    """A3 cut-in/cut-out extraction from a monotone-x response curve
    (≙ `examples/helper_functions.py:51-59`):

    - cut_in  = SMALL_NUMBER + x[i-1] where i is the FIRST index with
      y > 0 — the knot before it, because interpolation makes the response
      positive anywhere past x[i-1];
    - cut_out = x[j+1] where j is the LAST index with y > 0 (the reference
      reads the reversed index[i-1], which is exactly the knot after the
      last positive).

    Driver-side over the tiny curve table (the reference does the same on
    the in-memory power curve). Indices are clamped at the array ends —
    the reference would wrap via index[-1] if y[0] > 0; clamping is the
    sane behavior for curves that start positive."""
    xa = np.asarray(x, dtype=np.float64)
    ya = np.asarray(y, dtype=np.float64)
    pos = np.nonzero(ya > 0)[0]
    if len(pos) == 0:
        raise ValueError("curve has no positive response — no thresholds")
    cut_in = small + xa[max(int(pos[0]) - 1, 0)]
    cut_out = xa[min(int(pos[-1]) + 1, len(xa) - 1)]
    return float(cut_in), float(cut_out)


def curve_table_to_arrays(curve_df: DataFrame) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    """Collect the (tiny) curve table to driver-side numpy arrays, sorted by x."""
    pdf = curve_df.toPandas().sort_values("x")
    x = pdf["x"].to_numpy(dtype=np.float64)
    curves = {c: pdf[c].to_numpy(dtype=np.float64) for c in pdf.columns if c != "x"}
    return x, curves


def apply_curve_transform(
    features: DataFrame,
    conv_config: DataFrame,
    curve_df: DataFrame,
    input_col: str = "char_rate",
    output_col: str = "curve_power",
) -> DataFrame:
    """J4 (broadcast config join) + J5 (scaling) + J3 (np.interp).

    ≙ `compute_wind_power` (`src/rewemo/windpower.py:4-20`): scale the raw
    signal per-key, then map through the chosen response curve."""
    x, curves = curve_table_to_arrays(curve_df)
    interp = make_interp_udf(x, curves)
    cfg = conv_config.select("conv_id", "curve_ref", "scaling")
    return (
        features.join(F.broadcast(cfg), "conv_id", "left")
        .withColumn(
            output_col,
            interp(F.col(input_col) * F.coalesce(F.col("scaling"), F.lit(1.0)),
                   F.coalesce(F.col("curve_ref"), F.lit("curve_a"))),
        )
        .drop("curve_ref", "scaling")
    )

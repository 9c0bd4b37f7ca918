"""Temporal disaggregation + renormalization — W3/A8 in SURVEY §2.5/§2.4.

Reference semantics reproduced:
- W3 daily→hourly decomposition: a daily total is split into 24 hourly
  values by a weight profile (the reference's r_t(h)/r_d(h) decomposition
  factors, `src/rewemo/ncep_reanalysis/solar.py:128-152`, applied per day
  at `solar.py:577-590`); negative profile weights are clipped to zero
  exactly like `rt[rt<0]=0` (`solar.py:150-151`).
- A8 per-day renormalization: hourly estimates are rescaled so their daily
  sum matches the daily total — `scale_b = Hb/Hhb.sum()` when the sum is
  positive, factor 1 otherwise (`solar.py:296-301`; correctionFactor at
  `solar.py:594-597`).

Spark shapes:
- disaggregation is `explode(sequence(0,23))` + an `element_at` lookup into
  a constant normalized-weight array — a 1→24 row explode with zero
  shuffle (the daily frame is already aggregated), all JVM-side.
- renormalization is one window sum over (keys, day) + a guarded divide —
  the window partition is (series, day), so state per task is ≤ 24 rows
  regardless of series length; no skew risk by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# default daylight-triangle profile (integer weights, zero at night) — the
# transcript-domain stand-in for the solar r_t(h) curve: activity ramps to a
# midday peak. Any 24-vector works; negatives are clipped like the reference.
DAY_TRIANGLE = [0, 0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 7, 6, 5, 4, 3, 2, 1, 0, 0, 0, 0, 0]


def normalized_weights(weights: list[float]) -> list[float]:
    """Clip negatives to 0 (≙ `rt[rt<0]=0`) and normalize to sum 1 so the
    disaggregated hourly values sum exactly back to the daily total."""
    if len(weights) != 24:
        raise ValueError(f"need 24 hourly weights, got {len(weights)}")
    clipped = [max(float(w), 0.0) for w in weights]
    s = sum(clipped)
    if s <= 0:
        raise ValueError("weight profile sums to zero after clipping")
    return [w / s for w in clipped]


def disaggregate_daily(
    daily: DataFrame,
    weights: list[float] | None = None,
    keys: list[str] | None = None,
    day_col: str = "day_ts",
    value_col: str = "value",
    out_col: str = "value_h",
) -> DataFrame:
    """W3: one daily row → 24 hourly rows, ``out_col`` = daily × w_norm[h].

    Because the weights are normalized driver-side, Σ over the day equals
    the daily value exactly (up to one multiply per row — no window sum in
    the hot path, so no cross-row float-order sensitivity)."""
    wn = normalized_weights(weights or DAY_TRIANGLE)
    arr = F.array(*[F.lit(w) for w in wn])
    keys = keys or ["conv_id", "metric"]
    exploded = daily.select(
        *keys,
        F.col(day_col),
        F.col(value_col),
        F.explode(F.sequence(F.lit(0), F.lit(23))).alias("hour"),
    )
    return exploded.select(
        *keys,
        (F.col(day_col) + F.col("hour") * F.expr("INTERVAL 1 HOUR")).alias("bucket_ts"),
        F.col("hour").cast("long").alias("hour"),
        (F.col(value_col) * F.element_at(arr, F.col("hour").cast("int") + 1)).alias(out_col),
    )


def renormalize_daily(
    hourly: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "bucket_ts",
    value_col: str = "value",
    target_col: str = "daily_target",
    out_col: str = "value_renorm",
) -> DataFrame:
    """A8: rescale hourly values so each (keys, day)'s sum matches the
    per-row daily target; factor 1 when the hourly sum is zero
    (≙ correctionFactor guard, `solar.py:594-597`). Adds ``out_col`` and
    ``renorm_factor``."""
    keys = keys or ["conv_id", "metric"]
    day = F.date_trunc("day", F.col(ts_col))
    w = W.partitionBy(*keys, day)
    s = F.sum(value_col).over(w)
    # strictly-positive guard, matching the reference's `sum() > 0` branch
    # (`solar.py:296-301`): a day whose hourly sum is negative keeps factor
    # 1 instead of getting a sign-flipping negative factor
    factor = F.when(s > 0, F.col(target_col) / s).otherwise(F.lit(1.0))
    return hourly.withColumn("renorm_factor", factor).withColumn(
        out_col, F.col(value_col) * F.col("renorm_factor")
    )

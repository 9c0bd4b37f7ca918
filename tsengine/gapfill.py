"""Regular-grid gap fill — W1/W2 in SURVEY §2.5.

Reference semantics reproduced:
- W1 upsample+interpolate: `df.resample('1H').interpolate('linear')`
  (`ncep/wind.py:187-189`, `ncep/solar.py:618-620`).
- W2 trailing pad: append missing steps at series end repeating the last
  value (`ncep/wind.py:190-197` pads exactly 5 hours and raises otherwise;
  we generalize to ``pad_steps`` and emit gap metrics instead of raising —
  V2 in SURVEY §2.7 becomes a data-quality metric, strictness configurable).

Two interchangeable implementations, tested equal:

- ``gapfill_sql`` — pure Catalyst: bucket → per-key bounds → ``sequence``
  grid explode → left join → prev/next window blend. Everything JVM-side;
  the only shuffles are the bucket groupBy and the grid join, both keyed by
  (conv_id, metric) so they co-partition. This is the 100 TB path.
- ``gapfill_pandas`` — applyInPandas with pandas ``reindex + interpolate``,
  bit-for-bit the reference's semantics; the oracle twin and the escape
  hatch for exotic fill methods.

Edge semantics (both paths): the grid spans [floor(min ts), floor(max ts)]
per (conv_id, metric) — gap fill never invents points outside the observed
range except the explicit trailing pad (invariant-tested). Grid buckets
holding ≥1 observation take the bucket mean; empty buckets are synthesized
and flagged ``filled=true``. Leading buckets are never empty by
construction; interior nulls blend linearly; trailing nulls (only from the
pad) repeat the last value — matching pandas ``interpolate('linear')``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

FREQ = {
    "1m": ("minute", "INTERVAL 1 MINUTE", "1min", 60),
    "5m": (None, "INTERVAL 5 MINUTE", "5min", 300),
    "1h": ("hour", "INTERVAL 1 HOUR", "1h", 3600),
    "1d": ("day", "INTERVAL 1 DAY", "1D", 86400),
}

OUT_SCHEMA = "conv_id string, metric string, bucket_ts timestamp, value double, filled boolean"


def _bucket(df: DataFrame, freq: str) -> DataFrame:
    unit = FREQ[freq][0]
    if unit is None:
        raise ValueError(f"non-calendar freq {freq} needs explicit flooring")
    return df.groupBy(
        "conv_id",
        "metric",
        F.date_trunc(unit, "ts").alias("bucket_ts"),
    ).agg(F.avg("value").alias("value"))


def gapfill_sql(
    features_long: DataFrame,
    freq: str = "1m",
    method: str = "linear",
    pad_steps: int = 0,
) -> DataFrame:
    """Catalyst-native gap fill. method ∈ {linear, ffill}."""
    _, interval, _, _ = FREQ[freq]
    b = _bucket(features_long, freq)

    bounds = b.groupBy("conv_id", "metric").agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    grid = bounds.select(
        "conv_id",
        "metric",
        F.explode(
            F.expr(f"sequence(lo, hi + {pad_steps} * {interval}, {interval})")
        ).alias("bucket_ts"),
    )
    j = grid.join(b, ["conv_id", "metric", "bucket_ts"], "left")

    w = W.partitionBy("conv_id", "metric").orderBy("bucket_ts")
    wp = w.rowsBetween(W.unboundedPreceding, 0)
    wn = w.rowsBetween(0, W.unboundedFollowing)
    t = F.col("bucket_ts").cast("double")
    known_t = F.when(F.col("value").isNotNull(), t)
    prev_v = F.last("value", ignorenulls=True).over(wp)
    prev_t = F.last(known_t, ignorenulls=True).over(wp)
    next_v = F.first("value", ignorenulls=True).over(wn)
    next_t = F.first(known_t, ignorenulls=True).over(wn)

    if method == "linear":
        blend = prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
        fill = F.when(F.col("value").isNotNull(), F.col("value")).otherwise(
            F.coalesce(blend, prev_v)
        )
    elif method == "ffill":
        fill = prev_v
    else:
        raise ValueError(method)

    return j.select(
        "conv_id",
        "metric",
        "bucket_ts",
        fill.alias("value"),
        F.col("value").isNull().alias("filled"),
    )


def gapfill_pandas(
    features_long: DataFrame,
    freq: str = "1m",
    method: str = "linear",
    pad_steps: int = 0,
) -> DataFrame:
    """Reference-exact pandas twin (`resample().interpolate()` /
    trailing-pad, `ncep/wind.py:187-197`). Grouped by (conv_id, metric) so
    one series per Arrow batch — skew-bounded because a series at grid
    resolution is |range|/freq points regardless of raw turn count."""
    _, _, pfreq, step_s = FREQ[freq]

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        conv_id, metric = pdf["conv_id"].iloc[0], pdf["metric"].iloc[0]
        s = (
            pdf.set_index(pd.DatetimeIndex(pdf["ts"]))["value"]
            .resample(pfreq)
            .mean()
        )
        idx = pd.date_range(
            s.index.min(), s.index.max() + pad_steps * pd.Timedelta(seconds=step_s),
            freq=pfreq,
        )
        s = s.reindex(idx)
        filled = s.isna()
        if method == "linear":
            s = s.interpolate("linear")
        elif method == "ffill":
            s = s.ffill()
        else:
            raise ValueError(method)
        return pd.DataFrame(
            {
                "conv_id": conv_id,
                "metric": metric,
                "bucket_ts": idx,
                "value": s.to_numpy(),
                "filled": filled.to_numpy(),
            }
        )

    return features_long.groupBy("conv_id", "metric").applyInPandas(
        fill, schema=OUT_SCHEMA
    )


def gap_metrics(filled_df: DataFrame) -> DataFrame:
    """Per-series gap statistics (V2 generalized): total grid points,
    synthesized points, fill fraction."""
    return filled_df.groupBy("conv_id", "metric").agg(
        F.count("*").alias("n_points"),
        F.sum(F.col("filled").cast("long")).alias("n_filled"),
        (F.sum(F.col("filled").cast("long")) / F.count("*")).alias("fill_frac"),
    )

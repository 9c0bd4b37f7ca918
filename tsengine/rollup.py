"""Cascading continuous aggregates — the retention-tier heart (SURVEY §2.4).

rewemo's rollups are a manual chain: hourly series → daily resample mean
(`ncep/example_solar.py:263`) → per-location summary means
(`ncep/wind.py:232-233`). We formalize that as 1m→1h→1d cascading tiers
where EVERY tier is computed from the previous one, never from raw data —
possible because tier stats are restricted to reaggregable components
(count, sum, min, max, sum-of-squares). Derived views (mean, population
std) are computed at read time; median is exact only at the finest tier
(``percentile_approx`` above it), per SURVEY §7 hard-part (d).

Shuffle analysis (100 TB): the 1m tier is the only shuffle that touches raw
volume — keyed by (conv_id, minute, metric), map-side partial aggregation
makes the exchange carry one row per group per task, not per input row.
Each cascade step shuffles only the previous tier's output (≥60× smaller
per step). All three tiers share the leading key conv_id, so writing the
1m tier bucketed/partitioned by conv_id lets AQE reuse locality upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIER_SPECS = {"1m": "minute", "1h": "hour", "1d": "day"}
TIER_ORDER = ["1m", "1h", "1d"]

STAT_COLS = ["cnt", "sum", "min", "max", "sumsq"]


def rollup_from_raw(features_long: DataFrame, tier: str = "1m") -> DataFrame:
    """Finest tier from the long feature stream.

    ≙ `df.resample('D').mean()` (`ncep/example_solar.py:263`) generalized to
    reaggregable components. date_trunc keeps the bucket as a plain column
    (cheaper than F.window's struct; identical semantics for tumbling
    calendar windows)."""
    unit = TIER_SPECS[tier]
    return (
        features_long.where(F.col("value").isNotNull())
        .groupBy(
            "conv_id",
            F.date_trunc(unit, F.col("ts")).alias("bucket_ts"),
            "metric",
        )
        .agg(
            F.count("value").alias("cnt"),
            F.sum("value").alias("sum"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            F.sum(F.col("value") * F.col("value")).alias("sumsq"),
        )
    )


def rollup_from_raw_wide(
    wide_features: DataFrame, metrics: list[str], tier: str = "1m"
) -> DataFrame:
    """Same output as ``to_long() → rollup_from_raw()`` but aggregates the
    WIDE frame first and unpivots the (already tiny) tier afterwards.

    Why it matters at 100 TB: the long path multiplies raw rows by
    |metrics| BEFORE the shuffle (7 metrics → 7× exchange volume); this
    path shuffles one row per (conv, bucket) carrying all metrics' partial
    stats — the exchange is the pipeline's only raw-volume shuffle, so this
    is a ~|metrics|× cut of total shuffle bytes. Bucket-level stack() runs
    on post-aggregation data (≥60× smaller), JVM-side."""
    unit = TIER_SPECS[tier]
    aggs = []
    for m in metrics:
        v = F.col(m)
        aggs += [
            F.count(v).alias(f"{m}__cnt"),
            F.sum(v).alias(f"{m}__sum"),
            F.min(v).alias(f"{m}__min"),
            F.max(v).alias(f"{m}__max"),
            F.sum(v * v).alias(f"{m}__sumsq"),
        ]
    g = wide_features.groupBy(
        "conv_id", F.date_trunc(unit, F.col("ts")).alias("bucket_ts")
    ).agg(*aggs)
    pairs = ", ".join(
        f"'{m}', {m}__cnt, {m}__sum, {m}__min, {m}__max, {m}__sumsq"
        for m in metrics
    )
    return g.select(
        "conv_id",
        "bucket_ts",
        F.expr(
            f"stack({len(metrics)}, {pairs}) as (metric, cnt, sum, min, max, sumsq)"
        ),
    ).where(F.col("cnt") > 0)  # all-null metric buckets don't exist in long form


def cascade(tier_df: DataFrame, to_tier: str) -> DataFrame:
    """Re-aggregate a finer tier into a coarser one (1m→1h, 1h→1d).

    Pure component re-aggregation — exact, order-independent for cnt/min/
    max; sum/sumsq are float-order-dependent in the last ulps (inherent to
    double addition; tests compare with rel-tol)."""
    unit = TIER_SPECS[to_tier]
    return (
        tier_df.groupBy(
            "conv_id",
            F.date_trunc(unit, F.col("bucket_ts")).alias("bucket_ts"),
            "metric",
        )
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum").alias("sum"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.sum("sumsq").alias("sumsq"),
        )
    )


def build_tiers(features_long: DataFrame) -> dict[str, DataFrame]:
    """The full cascade. Callers should persist/write the 1m tier before
    cascading so raw data is scanned exactly once."""
    t1m = rollup_from_raw(features_long, "1m")
    t1h = cascade(t1m, "1h")
    t1d = cascade(t1h, "1d")
    return {"1m": t1m, "1h": t1h, "1d": t1d}


def finalize(tier_df: DataFrame) -> DataFrame:
    """Derived read-time view: mean + population std from components.

    std formula matches the reference's population `np.std`
    (`examples/helper_functions.py:66`)."""
    mean = F.col("sum") / F.col("cnt")
    var = F.greatest(F.col("sumsq") / F.col("cnt") - mean * mean, F.lit(0.0))
    return tier_df.withColumn("mean", mean).withColumn("std_pop", F.sqrt(var))


def session_rollup(
    df: "DataFrame",
    gap: str = "30 minutes",
    key: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> "DataFrame":
    """Activity-session aggregation via Spark's NATIVE session windows:
    events of one key closer than ``gap`` merge into one session
    (Structured-Streaming-ready state merging — the same call works on a
    stream with a watermark).

    Semantics note (pinned by test): an event EXACTLY ``gap`` after its
    predecessor MERGES into the session — Spark merges touching windows
    ([a, a+gap) and [a+gap, ...) share a boundary). The equivalent
    gaps-and-islands SQL breaks sessions only on strictly-greater gaps.
    ``sess_end`` is the window end = last event + gap."""
    return (
        df.groupBy(key, F.session_window(ts_col, gap).alias("w"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(value_col).alias("sum"),
            F.min(value_col).alias("min"),
            F.max(value_col).alias("max"),
        )
        .select(
            key,
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "cnt", "sum", "min", "max",
        )
    )

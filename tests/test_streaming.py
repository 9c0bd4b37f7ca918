"""Structured-Streaming tier maintenance test.

Append-mode semantics: a window emits once the watermark passes its end, so
with a finite input the trailing windows stay in state. The test feeds two
file drops (maxFilesPerTrigger=1) so the second drop's newer timestamps
advance the watermark past the first drop's windows, then asserts every
emitted tier row exactly matches the batch rollup of the same input."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsengine import features, rollup, streaming, synth


def test_streaming_tier_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    t = synth.generate_transcripts(spark, n_convs=20, mega_turns=200)
    # drop 1 = earlier half, drop 2 = later half (advances the watermark)
    mid = t.approxQuantile("turn_idx", [0.5], 0.01)[0]
    t.where(F.col("turn_idx") <= mid).coalesce(1).write.parquet(f"{in_dir}/d1")
    t.where(F.col("turn_idx") > mid).coalesce(1).write.parquet(f"{in_dir}/d2")
    # file source needs a flat dir of files
    import glob
    import shutil

    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, f in enumerate(sorted(glob.glob(f"{in_dir}/d*/part-*.parquet"))):
        shutil.copy(f, f"{flat}/{i:03d}.parquet")

    stream = streaming.read_transcript_stream(spark, flat, max_files_per_trigger=1)
    tier = streaming.streaming_tier_1m(stream, watermark="1 minute")
    q = streaming.start_tier_sink(tier, out_dir, ckpt, trigger_seconds=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out_dir).toPandas()
    assert len(got) > 0, "no windows emitted — watermark never advanced"

    key = ["conv_id", "bucket_ts", "metric"]
    assert not got.duplicated(subset=key).any(), "sink emitted duplicate tier rows"

    # batch oracle on the stateless metrics
    metrics = ["n_chars", "tool_call", "is_user", "is_assistant"]
    wide = features.derive_features(t)
    long = features.to_long(wide, metrics)
    batch = rollup.rollup_from_raw(long, "1m").toPandas()

    merged = got.merge(batch, on=key, suffixes=("_s", "_b"), how="left")
    assert merged["cnt_b"].notna().all(), "streamed a window the batch doesn't have"
    for c in ["cnt", "sum", "min", "max", "sumsq"]:
        pd.testing.assert_series_equal(
            merged[f"{c}_s"], merged[f"{c}_b"], check_names=False, rtol=1e-12
        )


def test_streaming_latency_matches_batch(spark, tmp_path):
    """applyInPandasWithState latency must equal the batch lag() signal when
    turns arrive in order across micro-batches."""
    import glob
    import shutil

    t = synth.generate_transcripts(spark, n_convs=10, mega_turns=100)
    mid = t.approxQuantile("turn_idx", [0.5], 0.01)[0]
    d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    t.where(F.col("turn_idx") <= mid).coalesce(1).write.parquet(d1)
    t.where(F.col("turn_idx") > mid).coalesce(1).write.parquet(d2)
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, f in enumerate(sorted(glob.glob(str(tmp_path) + "/d*/part-*.parquet"))):
        dst = f"{flat}/{i:03d}.parquet"
        shutil.copy(f, dst)
        # Spark's file source orders micro-batches by modification time and
        # breaks ties arbitrarily — pin distinct mtimes so drop order is the
        # arrival order the test depends on
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = streaming.read_transcript_stream(spark, flat, max_files_per_trigger=1)
    lat = streaming.streaming_latency(stream)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = streaming.start_tier_sink(lat, out_dir, ckpt, trigger_seconds=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = (
        spark.read.parquet(out_dir).toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    batch = (
        features.derive_features(t)
        .select("conv_id", "turn_idx", "latency_s").toPandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert len(got) == len(batch)
    pd.testing.assert_series_equal(
        got["latency_s"], batch["latency_s"], check_names=False, rtol=1e-9
    )

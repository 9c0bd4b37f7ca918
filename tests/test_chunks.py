"""Chunk blobs: encode→decode must reproduce the gap-filled series
bit-exactly (FIXTURES.md §4)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from tsengine import chunks, features, gapfill


def test_chunk_roundtrip(spark, transcripts):
    long = features.to_long(
        features.derive_features(
            transcripts.where(F.col("conv_id") < "conv-00000015")
        ),
        ["char_rate"],
    )
    filled = gapfill.gapfill_sql(long, "1m", "linear").cache()
    enc = chunks.encode_chunks(filled, chunk_span="1d").cache()
    dec = chunks.decode_chunks(enc)

    a = (
        filled.select("conv_id", "metric", "bucket_ts", "value")
        .toPandas()
        .sort_values(["conv_id", "metric", "bucket_ts"])
        .reset_index(drop=True)
    )
    b = dec.toPandas().sort_values(["conv_id", "metric", "bucket_ts"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["conv_id"].to_numpy() == b["conv_id"].to_numpy()).all()
    assert (a["bucket_ts"].to_numpy() == b["bucket_ts"].to_numpy()).all()
    # bit-exact float equality
    assert np.array_equal(
        a["value"].to_numpy().view(np.uint64), b["value"].to_numpy().view(np.uint64)
    )
    # n bookkeeping
    assert enc.agg(F.sum("n")).first()[0] == len(a)


def test_chunk_bounds_and_stats(spark, transcripts):
    long = features.to_long(
        features.derive_features(transcripts.where(F.col("conv_id") < "conv-00000010")),
        ["n_chars"],
    )
    filled = gapfill.gapfill_sql(long, "1m", "linear")
    enc = chunks.encode_chunks(filled, chunk_span="1h").cache()
    # every chunk's span respects its chunk_start hour
    dec = chunks.decode_chunks(enc)
    viol = dec.withColumn("cs", F.date_trunc("hour", "bucket_ts"))
    # regroup and compare chunk_start vs recomputed hour
    back = chunks.encode_chunks(dec, chunk_span="1h")
    assert back.count() == enc.count()
    st = chunks.chunk_stats(enc).toPandas()
    assert (st["compression_ratio"] > 1.0).all()  # regular grid must compress

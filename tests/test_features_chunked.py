"""derive_features_chunked must equal derive_features exactly — the chunked
variant is a pure execution-strategy change (skew safety), not a semantics
change."""

from __future__ import annotations

import pandas as pd

from tsengine import features


def _canon(df):
    pdf = df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return pdf[sorted(pdf.columns)]


def test_chunked_equals_plain(transcripts):
    plain = _canon(features.derive_features(transcripts))
    # chunk_size smaller than the mega-conv so boundaries are exercised
    chunked = _canon(features.derive_features_chunked(transcripts, chunk_size=256))
    pd.testing.assert_frame_equal(plain, chunked)


def test_chunked_tiny_chunks(transcripts):
    """chunk_size < carry still correct: every chunk pulls its full prefix."""
    sub = transcripts.where("conv_id in ('conv-00000001','conv-00000002')")
    plain = _canon(features.derive_features(sub))
    chunked = _canon(features.derive_features_chunked(sub, chunk_size=7))
    pd.testing.assert_frame_equal(plain, chunked)

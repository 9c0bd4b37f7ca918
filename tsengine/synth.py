"""Deterministic synthetic transcript generator.

Replaces the reference's external data fetch (`src/rewemo/era5.py:20-45`,
CDS downloads) with an in-repo, seeded generator: the driver instructions
require the input table to be synthesized deterministically at small scale.

Generation is fully distributed: ``spark.range(n_convs)`` fans conv ids out
across partitions and each task generates its conversations with a
conv-local numpy RNG — no driver-side loop, no collect, O(rows/executors)
per task. Determinism holds regardless of partitioning because the RNG is
seeded per conv_id, not per task.

Properties (FIXTURES.md §1):
- conversation lengths ~ heavy-tailed (Pareto) so a few mega-conversations
  exercise the skew/salting path; conv 0 is a forced mega-conversation.
- inter-turn deltas log-normal seconds with injected gap spans (≙ rewemo's
  missing weather steps, `ncep/wind.py:190-197`).
- ~15% of assistant turns carry a non-null `tool`.
- `text` is deterministic from (conv_id, turn_idx) so per-turn text equality
  under stable ordering is checkable (BASELINE.json per-row invariant).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from tsengine import schema

EPOCH_BASE = pd.Timestamp("2025-01-01 00:00:00")
ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "python", "browser", "calculator", "none"])
WORDS = np.array(
    "the quick brown fox jumps over lazy dog while spark rolls up series "
    "gap fill chunk encode tier cascade shuffle partition skew salt lineage "
    "checkpoint resume vector clock delta gorilla compress turn token".split()
)
WORD_LENS = np.array([len(w) for w in WORDS])


def _gen_conv(conv_idx: int, seed: int, mega_turns: int) -> pd.DataFrame:
    rng = np.random.default_rng(np.random.SeedSequence([seed, conv_idx]))
    if conv_idx == 0 and mega_turns > 0:
        n = mega_turns  # forced mega-conversation → skew path
    else:
        n = int(np.clip(4 + rng.pareto(1.1) * 12, 4, 5000))

    # inter-turn deltas: log-normal seconds, integer, ≥1; ~2% of turns open
    # a dropped span (gap) two orders of magnitude longer.
    deltas = np.maximum(1, rng.lognormal(mean=3.0, sigma=1.0, size=n)).astype(np.int64)
    gap_mask = rng.random(n) < 0.02
    deltas[gap_mask] *= 120
    deltas[0] = 0
    start = int(conv_idx) * 977  # stagger conversation starts (seconds)
    ts = EPOCH_BASE.value // 10**9 + start + np.cumsum(deltas)

    turn_idx = np.arange(n, dtype=np.int32)
    # alternate user/assistant; sprinkle system (idx 0 sometimes) and tool
    # result turns after tool calls.
    role = np.where(turn_idx % 2 == 0, "user", "assistant")
    if n > 2 and rng.random() < 0.3:
        role[0] = "system"

    is_assistant = role == "assistant"
    tool_draw = rng.random(n)
    tool = np.where(is_assistant & (tool_draw < 0.15), TOOLS[rng.integers(0, 4, n)], None)

    # deterministic text: word sample keyed by (conv, turn) rng stream.
    # Vectorized construction — join the whole conversation's word stream
    # ONCE (C-level), then slice per-turn by char offsets; per-turn joins
    # were the serial hot spot for mega-conversations (~20× slower).
    lens = rng.integers(3, 40, size=n)
    word_ids = rng.integers(0, len(WORDS), size=int(lens.sum()))
    wlens = WORD_LENS[word_ids]
    blob = " ".join(WORDS[word_ids])
    # char offset of word k in blob = sum of (len+1) of words before it
    starts = np.concatenate([[0], np.cumsum(wlens + 1)])
    wb = np.concatenate([[0], np.cumsum(lens)])  # word index bounds per turn
    texts = [
        f"c{conv_idx} t{i} " + blob[starts[wb[i]] : starts[wb[i + 1]] - 1]
        for i in range(n)
    ]

    return pd.DataFrame(
        {
            "conv_id": f"conv-{conv_idx:08d}",
            "turn_idx": turn_idx,
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": pd.to_datetime(ts, unit="s"),
        }
    )


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    seed: int = 42,
    mega_turns: int = 20_000,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcript table (schema.TRANSCRIPTS)."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # concat per ~64k turns before yielding: one Arrow batch per
        # conversation (~65 rows) would pay ~10× serialization overhead
        for pdf in batches:
            buf: list[pd.DataFrame] = []
            buffered = 0
            for cid in pdf["id"].to_numpy():
                c = _gen_conv(int(cid), seed, mega_turns)
                buf.append(c)
                buffered += len(c)
                if buffered >= 65536:
                    yield pd.concat(buf, ignore_index=True)
                    buf, buffered = [], 0
            if buf:
                yield pd.concat(buf, ignore_index=True)

    return (
        spark.range(0, n_convs, numPartitions=parts)
        .mapInPandas(gen, schema=schema.TRANSCRIPTS)
    )


def generate_conv_config(
    spark: SparkSession, n_convs: int = 200, seed: int = 42
) -> DataFrame:
    """Per-conversation config dim (≙ YAML location configs,
    `examples/wpp_locations.yaml:1-15`). Tiny → always broadcast-joined."""
    rng = np.random.default_rng(seed + 1)
    pdf = pd.DataFrame(
        {
            "conv_id": [f"conv-{i:08d}" for i in range(n_convs)],
            "curve_ref": rng.choice(["curve_a", "curve_b", "curve_c"], n_convs),
            "scaling": np.round(rng.uniform(0.5, 2.0, n_convs), 3),
            "retention": rng.choice(["1m", "1h", "1d"], n_convs, p=[0.2, 0.5, 0.3]),
        }
    )
    return spark.createDataFrame(pdf, schema=schema.CONV_CONFIG)


def generate_signal_curve(spark: SparkSession) -> DataFrame:
    """Monotone lookup curve (≙ `wind_powercurves_tradewind.csv:1-8`):
    0 at both ends so the np.interp out-of-range→0 rule is observable."""
    x = np.arange(0.0, 31.0)
    ramp = np.clip((x - 3.0) / 9.0, 0.0, 1.0)
    pdf = pd.DataFrame(
        {
            "x": x,
            "curve_a": np.where(x >= 25, 0.0, ramp),
            "curve_b": np.where(x >= 22, 0.0, np.clip((x - 2.0) / 8.0, 0.0, 1.0) * 0.9),
            "curve_c": np.where(x >= 28, 0.0, ramp**2),
        }
    )
    return spark.createDataFrame(pdf, schema=schema.SIGNAL_CURVE)

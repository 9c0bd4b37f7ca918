"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payload columns with a typed metadata struct;
all decode / feature-extract / resize / frame-sample stages run as
Arrow-batched ``mapInPandas`` transforms so the Spark-side contract —
schema, batch shape, partitioning — is real and testable even though the
actual codec libraries are absent in this container.

The decode step is STUBBED: ``decode_stub`` derives deterministic fake
dimensions/features from the payload's md5, so tests (and the driver's
DuckDB oracle) can verify the full distributed plumbing end-to-end; swap
``_decode_payload`` for a real PIL/ffmpeg call in production.

Scale notes: payloads dominate bytes, so
- mapInPandas with a SMALL ``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounds per-batch memory (payload_bytes × batch_rows);
- metadata-only queries must never deserialize payloads — keep metadata in
  separate (pruned) columns, never inside the blob;
- frame-sampling emits multiple rows per input (iterator-of-frames), which
  mapInPandas expresses without a shuffle.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional real decoder — absent in this container, stub kicks in
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, byte_len int"
)

META_SCHEMA = (
    "media_id long, kind string, byte_len int, width int, height int, "
    "n_frames int, fingerprint string"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_hash string"


def to_media_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", kind: str = "image"
) -> DataFrame:
    """Wrap an existing column as an opaque binary payload (test harness:
    documents stand in for media files; in production this is the ingest
    of raw bytes from object storage)."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.octet_length(F.col(text_col)).alias("byte_len"),
    )


def _decode_payload(payload: bytes) -> dict:
    """Decoder with an optional real branch: when PIL is importable and the
    payload is a decodable image, return its TRUE dimensions; otherwise a
    deterministic digest-derived stub (matching the SQL oracle: width =
    16 + hexbyte0 % 64, etc. — the harness feeds UTF-8 text payloads, so
    the oracle always exercises the stub branch even when PIL exists).

    The stub fallback on undecodable bytes is the documented harness
    contract, not error suppression — a production ingest would route
    decode failures to a quarantine table instead."""
    if HAVE_PIL:
        try:
            im = _PILImage.open(io.BytesIO(payload))
            return {
                "width": int(im.width),
                "height": int(im.height),
                "n_frames": int(getattr(im, "n_frames", 1)),
                "fingerprint": hashlib.md5(payload).hexdigest(),
            }
        except Exception:
            pass
    d = hashlib.md5(payload).hexdigest()
    return {
        "width": 16 + int(d[0:2], 16) % 64,
        "height": 16 + int(d[2:4], 16) % 64,
        "n_frames": 1 + int(d[4:6], 16) % 8,
        "fingerprint": d,
    }


def extract_metadata(media: DataFrame) -> DataFrame:
    """Decode stage: binary payload → typed metadata rows (mapInPandas).

    Batch shape: iterator of pandas frames; per-batch memory is bounded by
    arrow batch size × payload size. Column pruning means a downstream
    query on metadata never ships payloads — this stage materializes the
    metadata table once."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_payload(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "byte_len", pdf["byte_len"].to_numpy())
            out.insert(0, "kind", pdf["kind"].to_numpy())
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            yield out

    return media.mapInPandas(run, schema=META_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling stage: one input row → n_frames/every_n output rows.

    Stub frames are md5(payload || frame_idx); a real decoder would yield
    decoded frame tensors. Demonstrates the 1→N mapInPandas expansion
    without shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = _decode_payload(bytes(payload))
                for fi in range(0, meta["n_frames"], every_n):
                    fh = hashlib.md5(bytes(payload) + str(fi).encode()).hexdigest()
                    rows.append((mid, fi, fh))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_hash"])

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_stub(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize stage stub: passes payload through, recomputes metadata with
    clamped dimensions. Real impl: decode → resample → re-encode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_decode_payload(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "byte_len": pdf["byte_len"].to_numpy(),
                    "width": [min(m["width"], max_side) for m in metas],
                    "height": [min(m["height"], max_side) for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "fingerprint": [m["fingerprint"] for m in metas],
                }
            )
            yield out

    return media.mapInPandas(run, schema=META_SCHEMA)

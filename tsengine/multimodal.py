"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payload columns with a typed metadata struct;
all decode / feature-extract / resize / frame-sample stages run as
Arrow-batched ``mapInPandas`` transforms so the Spark-side contract —
schema, batch shape, partitioning — is real and testable even though the
actual codec libraries are absent in this container.

The decode step has a REAL branch and a stub: PNG payloads are decoded
for real (stdlib header parse — ``png_encode``/``_png_ihdr`` below give
the pipeline genuine encoded media end-to-end in this container, where
PIL is absent; PIL remains the optional branch for richer formats), and
any other payload falls back to deterministic md5-derived fake
dimensions so tests and the driver's DuckDB oracle can verify the
distributed plumbing on arbitrary bytes. Swap in PIL/ffmpeg for full
codec coverage in production.

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """A REAL, spec-valid PNG from the stdlib alone (PNG spec, RFC 2083:
    signature + IHDR + zlib IDAT + IEND, CRC32 per chunk): 8-bit RGB,
    filter 0 scanlines, solid ``rgb`` fill. Deterministic bytes for a
    given (width, height, rgb) — zlib level 6 output is fixed for a
    fixed input. Exists so the media pipeline can be exercised
    end-to-end on genuinely ENCODED payloads in this container (PIL is
    not installed here): the only path from these bytes back to
    (width, height) is parsing the format."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    scanline = b"\x00" + bytes(rgb) * width
    idat = zlib.compress(scanline * height, 6)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _png_ihdr(payload: bytes) -> dict | None:
    """Real PNG decode of the header: verify the 8-byte signature and the
    IHDR chunk tag, then read the big-endian width/height (and frame
    count from an APNG acTL chunk when present, else 1). Returns None
    for non-PNG bytes. Pure stdlib — the real-decode branch that works
    in this container; PIL (below) stays the branch for formats whose
    headers aren't this simple."""
    import struct

    if len(payload) < 33 or payload[:8] != _PNG_SIG or payload[12:16] != b"IHDR":
        return None
    width, height = struct.unpack(">II", payload[16:24])
    n_frames = 1
    actl = payload.find(b"acTL")
    if 0 < actl <= len(payload) - 8:
        n_frames = max(1, struct.unpack(">I", payload[actl + 4:actl + 8])[0])
    return {
        "width": int(width),
        "height": int(height),
        "n_frames": int(n_frames),
        "fingerprint": hashlib.md5(payload).hexdigest(),
    }


def _decode_payload(payload: bytes) -> dict:
    """Decoder with real branches first, digest stub last:

    1. PNG: stdlib header parse (``_png_ihdr``) — TRUE dimensions, always
       available in this container;
    2. PIL, when importable — TRUE dimensions for any format it knows;
    3. deterministic digest-derived stub (matching the SQL oracle:
       width = 16 + hexbyte0 % 64, etc. — the harness's TEXT payloads
       always exercise this branch, keeping the stub oracle-checkable).

    The stub fallback on undecodable bytes is the documented harness
    contract, not error suppression — a production ingest would route
    decode failures to a quarantine table instead."""
    png = _png_ihdr(payload)
    if png is not None:
        return png
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


def synth_png_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic REAL-PNG media table: one image per id, dimensions
    and fill color derived from the id by closed formulas (width =
    16 + id % 48, height = 16 + (id·7) % 48, rgb from id bytes) — so an
    SQL oracle can recompute the EXPECTED dimensions from the id alone,
    while the engine can only recover them by actually parsing the PNG
    bytes it generated. mapInPandas, schema = MEDIA_SCHEMA."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                m = int(mid)
                w = 16 + m % 48
                h = 16 + (m * 7) % 48
                rgb = (m % 256, (m * 3) % 256, (m * 5) % 256)
                payload = png_encode(w, h, rgb)
                rows.append((m, "image", payload, len(payload)))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "byte_len"]
            )

    return _spread_ids(ids, id_col).mapInPandas(run, schema=MEDIA_SCHEMA)


def _spread_ids(ids: DataFrame, id_col: str) -> DataFrame:
    """Round-robin the id column over the usual shuffle-partition count
    before a synth mapInPandas: the per-row PNG encode work dwarfs the
    cost of shuffling one long per row at any scale, and without it a
    single-row-group parquet source funnels every id into ONE scan
    partition — the whole encode stage then runs on one core (row groups
    are unsplittable, so split-size tuning cannot fix this)."""
    n_part = int(ids.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return ids.select(F.col(id_col).cast("long").alias(id_col)).repartition(
        n_part
    )


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


def png_encode_gradient(width: int, height: int) -> bytes:
    """A REAL spec-valid PNG whose pixels are a coordinate gradient:
    pixel (x, y) = (x % 256, y % 256, (x + y) % 256). Unlike the
    solid-fill `png_encode`, every pixel differs — so recovering channel
    statistics REQUIRES inflating the IDAT stream and unfiltering
    scanlines, not just reading the header. Same stdlib-only chunk
    layout (signature + IHDR + zlib IDAT + IEND, CRC32 per chunk)."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    import numpy as np

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    # vectorized scanline build (byte-identical to the per-pixel loop it
    # replaces, which dominated the synth stage: ~h*w Python iterations
    # per image): channel planes from broadcast coordinate vectors, a
    # zero filter-type byte column prepended per row
    xs = (np.arange(width) % 256).astype(np.uint8)
    ys = (np.arange(height) % 256).astype(np.uint8)
    px = np.empty((height, width, 3), dtype=np.uint8)
    px[:, :, 0] = xs[None, :]
    px[:, :, 1] = ys[:, None]
    px[:, :, 2] = (xs[None, :].astype(np.int64) + ys[:, None]) % 256
    raw = np.concatenate(
        [np.zeros((height, 1), dtype=np.uint8), px.reshape(height, 3 * width)],
        axis=1,
    )
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def synth_png_gradient_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic gradient-PNG media table: dimensions from the same
    closed id formulas as `synth_png_media` (width = 16 + id % 48,
    height = 16 + id·7 % 48), gradient pixels — so an SQL oracle can
    recompute the EXPECTED per-channel sums from the id alone while the
    engine can only recover them by fully decoding the image."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                m = int(mid)
                w = 16 + m % 48
                h = 16 + (m * 7) % 48
                payload = png_encode_gradient(w, h)
                rows.append((m, "image", payload, len(payload)))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "byte_len"]
            )

    return _spread_ids(ids, id_col).mapInPandas(run, schema=MEDIA_SCHEMA)


def decode_pixel_stats(media: DataFrame) -> DataFrame:
    """FULL-pixel decode stage: inflate the IDAT stream, unfilter the
    type-0 scanlines, and reduce to exact per-channel integer sums —
    the genuine feature-extract step over binary media (the metadata op
    stops at the header; this one touches every byte of image data).

    Batch shape: mapInPandas over payload bytes, numpy per image (the
    reshape + column sums are vectorized; no per-pixel Python). Per-task
    memory is one batch of decoded images — bound batches with
    spark.sql.execution.arrow.maxRecordsPerBatch when images are large.
    Zero exchanges: decode is a scan stage, the payload never shuffles.
    """
    import struct
    import zlib

    out_schema = (
        "media_id long, width long, height long, n_pixels long, "
        "sum_r long, sum_g long, sum_b long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                if len(data) < 33 or data[:8] != _PNG_SIG:
                    continue
                w, h = struct.unpack(">II", data[16:24])
                # walk chunks, concatenate IDAT bodies
                pos, idat = 8, b""
                while pos + 8 <= len(data):
                    (ln,) = struct.unpack(">I", data[pos:pos + 4])
                    tag = data[pos + 4:pos + 8]
                    if tag == b"IDAT":
                        idat += data[pos + 8:pos + 8 + ln]
                    if tag == b"IEND":
                        break
                    pos += 12 + ln
                try:
                    raw = zlib.decompress(idat)
                    stride = 1 + 3 * w
                    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
                except (zlib.error, ValueError):
                    continue  # corrupt IDAT / truncated data: skip, never
                    # fabricate stats (same drop-don't-guess contract as
                    # _decode_payload's non-PNG branch)
                if not (arr[:, 0] == 0).all():
                    continue  # only filter-0 scanlines are produced here
                px = arr[:, 1:].reshape(h, w, 3).astype(np.int64)
                s = px.sum(axis=(0, 1))
                rows.append(
                    (int(mid), int(w), int(h), int(w) * int(h),
                     int(s[0]), int(s[1]), int(s[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_pixels",
                         "sum_r", "sum_g", "sum_b"],
            )

    return media.mapInPandas(run, schema=out_schema)

"""multimodal plumbing tests (decode stage stubbed, plumbing real)."""

from __future__ import annotations

import hashlib

import pytest

from tsengine import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"payload number {i} with some bytes") for i in range(20)],
        "doc_id long, text string",
    )
    return multimodal.to_media_table(docs)


def test_metadata_schema_and_determinism(media):
    m = multimodal.extract_metadata(media).toPandas().set_index("media_id")
    assert set(m.columns) == {"kind", "byte_len", "width", "height", "n_frames", "fingerprint"}
    payload = b"payload number 3 with some bytes"
    d = hashlib.md5(payload).hexdigest()
    assert m.loc[3, "fingerprint"] == d
    assert m.loc[3, "width"] == 16 + int(d[0:2], 16) % 64
    assert m.loc[3, "byte_len"] == len(payload)
    assert ((m["width"] >= 16) & (m["width"] < 80)).all()


def test_frame_sampling_expansion(media):
    meta = multimodal.extract_metadata(media).toPandas().set_index("media_id")
    frames = multimodal.sample_frames(media, every_n=2).toPandas()
    for mid, g in frames.groupby("media_id"):
        nf = int(meta.loc[mid, "n_frames"])
        assert list(g["frame_idx"]) == list(range(0, nf, 2))
    # frame hash oracle
    payload = b"payload number 0 with some bytes"
    r = frames[(frames["media_id"] == 0) & (frames["frame_idx"] == 0)]
    assert r["frame_hash"].iloc[0] == hashlib.md5(payload + b"0").hexdigest()


def test_resize_clamps(media):
    r = multimodal.resize_stub(media, max_side=20).toPandas()
    assert (r["width"] <= 20).all() and (r["height"] <= 20).all()


# 1x1 transparent PNG (a real, valid image file)
_PNG_1X1 = __import__("base64").b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
)


def test_decode_real_image_branch():
    """A real PNG must decode to TRUE dimensions in EVERY environment now
    that the stdlib IHDR parser is the first branch (PIL no longer
    required for PNG)."""
    from tsengine import multimodal

    meta = multimodal._decode_payload(_PNG_1X1)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (1, 1, 1)
    assert meta["fingerprint"] == __import__("hashlib").md5(_PNG_1X1).hexdigest()


def test_decode_text_payload_always_stub():
    """UTF-8 text payloads (the harness/oracle path) must take the stub
    branch whether or not PIL is importable."""
    from tsengine import multimodal
    import hashlib

    p = "not an image".encode()
    meta = multimodal._decode_payload(p)
    d = hashlib.md5(p).hexdigest()
    assert meta["width"] == 16 + int(d[0:2], 16) % 64
    assert meta["n_frames"] == 1 + int(d[4:6], 16) % 8


# ---------------------------------------------------------------------------
# Real PNG branch (stdlib encode + IHDR decode)
# ---------------------------------------------------------------------------


def test_png_encode_decode_roundtrip():
    from tsengine.multimodal import _decode_payload, png_encode

    for w, h, rgb in [(16, 63, (1, 2, 3)), (48, 16, (250, 0, 9)), (1, 1, (0, 0, 0))]:
        p = png_encode(w, h, rgb)
        assert p[:8] == b"\x89PNG\r\n\x1a\n"
        meta = _decode_payload(p)
        assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, 1)


def test_png_encode_is_spec_valid_zlib():
    """IDAT inflates back to the exact scanlines (filter-0 solid fill)."""
    import struct
    import zlib

    from tsengine.multimodal import png_encode

    p = png_encode(5, 3, (7, 8, 9))
    # walk chunks to find IDAT
    off = 8
    idat = b""
    while off < len(p):
        (ln,) = struct.unpack(">I", p[off:off + 4])
        tag = p[off + 4:off + 8]
        body = p[off + 8:off + 8 + ln]
        (crc,) = struct.unpack(">I", p[off + 8 + ln:off + 12 + ln])
        assert crc == zlib.crc32(tag + body) & 0xFFFFFFFF
        if tag == b"IDAT":
            idat += body
        off += 12 + ln
    raw = zlib.decompress(idat)
    assert raw == (b"\x00" + bytes((7, 8, 9)) * 5) * 3


def test_non_png_payload_falls_to_stub():
    import hashlib

    from tsengine.multimodal import _decode_payload

    p = b"not a png at all"
    d = hashlib.md5(p).hexdigest()
    meta = _decode_payload(p)
    assert meta["width"] == 16 + int(d[0:2], 16) % 64
    assert meta["fingerprint"] == d


def test_synth_png_media_distributed_decode(spark):
    from tsengine import multimodal

    ids = spark.range(0, 120).withColumnRenamed("id", "media_id")
    media = multimodal.synth_png_media(ids)
    meta = multimodal.extract_metadata(media).collect()
    assert len(meta) == 120
    for r in meta:
        m = r["media_id"]
        assert r["width"] == 16 + m % 48
        assert r["height"] == 16 + (m * 7) % 48
        assert r["n_frames"] == 1


# ---------------------------------------------------------------------------
# gradient PNG full-pixel decode
# ---------------------------------------------------------------------------

def test_gradient_png_pixel_sums(spark):
    from pyspark.sql import functions as F

    from tsengine import multimodal as mm

    ids = spark.createDataFrame([(i,) for i in (0, 5, 47, 200)], "media_id long")
    media = mm.synth_png_gradient_media(ids)
    got = {r.media_id: r for r in mm.decode_pixel_stats(media).collect()}
    for m in (0, 5, 47, 200):
        w, h = 16 + m % 48, 16 + (m * 7) % 48
        assert got[m].width == w and got[m].height == h
        assert got[m].n_pixels == w * h
        assert got[m].sum_r == h * (w * (w - 1) // 2)
        assert got[m].sum_g == w * (h * (h - 1) // 2)
        assert got[m].sum_b == got[m].sum_r + got[m].sum_g


def test_gradient_png_requires_full_decode(spark):
    # corrupt one byte INSIDE the IDAT body (not the header): the header
    # parse would still succeed, but the full-pixel decode must fail the
    # zlib inflate and skip the row — proof the op reads image data
    from tsengine import multimodal as mm

    good = mm.png_encode_gradient(20, 20)
    idat_at = good.find(b"IDAT")
    bad = bytearray(good)
    bad[idat_at + 20] ^= 0xFF
    rows = [(1, "image", bytes(good), len(good)),
            (2, "image", bytes(bad), len(bad))]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    try:
        out = {r.media_id for r in mm.decode_pixel_stats(media).collect()}
        assert 1 in out
        assert 2 not in out  # inflate failed -> skipped, not fabricated
    except Exception:
        # an exploding zlib error that kills the task would also prove
        # the data path is real, but the operator is expected to skip
        raise

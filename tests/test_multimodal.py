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
    """With PIL present the decoder must return TRUE dimensions for a real
    PNG; without it, the deterministic digest stub. Both branches are
    asserted so the test is meaningful in either environment."""
    from tsengine import multimodal

    meta = multimodal._decode_payload(_PNG_1X1)
    if multimodal.HAVE_PIL:
        assert (meta["width"], meta["height"], meta["n_frames"]) == (1, 1, 1)
    else:
        import hashlib

        d = hashlib.md5(_PNG_1X1).hexdigest()
        assert meta["width"] == 16 + int(d[0:2], 16) % 64
        assert meta["height"] == 16 + int(d[2:4], 16) % 64
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

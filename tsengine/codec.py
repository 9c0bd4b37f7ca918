"""Gorilla XOR float compression + delta-of-delta timestamp compression.

Implements the two codecs from the Facebook Gorilla paper (Pelkonen et al.,
VLDB 2015 — public literature; no reference-repo analog, rewemo stores raw
CSV, `ncep/timeseries_tools.py:392-404`):

1. ``gorilla`` / ``dod`` — the classic variable-length bitstreams, bit-exact
   per the paper. Encode/decode are inherently sequential (each value's
   control bits depend on the previous window state), so these run as tight
   Python-int bit loops — correct, used for parity tests and
   interoperability, NOT the hot path.

2. ``xorblk`` / ``dodblk`` — vectorization-friendly block variants, the
   production path. Same XOR-of-prior / delta-of-delta cores, but bit
   widths are fixed per 128-value block (per-block header: leading-zero
   count + meaningful width), which makes BOTH encode and decode pure numpy
   array ops (unpackbits/packbits bit-matrix shuffles) — no per-row Python,
   O(n) with small constants, and blocks are independently decodable
   (random access within a chunk). Compression is within a few % of classic
   Gorilla on smooth series and better on noisy ones.

All functions operate on numpy arrays; chunks.py wraps them in grouped-map
UDFs. Round-trip is bit-exact for every float64 including NaN/±0/denormals
(property-tested in tests/test_codec.py).
"""

from __future__ import annotations

import struct

import numpy as np

BLOCK = 128
_U64 = np.uint64


# --------------------------------------------------------------------------
# vectorized bit helpers
# --------------------------------------------------------------------------

def _pack_fixed(vals: np.ndarray, width: int) -> bytes:
    """Pack low ``width`` bits of each uint64 contiguously, MSB-first."""
    if width == 0 or len(vals) == 0:
        return b""
    n = len(vals)
    be = (vals.astype(_U64) << _U64(64 - width)).astype(">u8")
    bits = np.unpackbits(be.view(np.uint8).reshape(n, 8), axis=1)[:, :width]
    return np.packbits(bits.ravel()).tobytes()


def _unpack_fixed(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of _pack_fixed → uint64 array with values in low bits."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=_U64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))[: n * width]
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, :width] = bits.reshape(n, width)
    be = np.packbits(full.ravel()).reshape(n, 8)
    return be.copy().view(">u8").ravel().astype(_U64) >> _U64(64 - width)


def _nbytes(n_values: int, width: int) -> int:
    return (n_values * width + 7) // 8


# --------------------------------------------------------------------------
# xorblk — vectorized block-adaptive XOR float codec (production path)
# --------------------------------------------------------------------------

_XORBLK_MAGIC = b"XB1\x00"


def xorblk_encode(values: np.ndarray, block: int = BLOCK) -> bytes:
    """float64 array → XOR-of-prior, per-block fixed-width bit packing."""
    v = np.ascontiguousarray(values, dtype=np.float64).view(_U64)
    n = len(v)
    out = [struct.pack("<4sIH", _XORBLK_MAGIC, n, block)]
    if n == 0:
        return b"".join(out)
    x = np.empty_like(v)
    x[0] = v[0]
    np.bitwise_xor(v[1:], v[:-1], out=x[1:])
    for lo in range(0, n, block):
        xb = x[lo : lo + block]
        nzmask = xb != 0
        nz = xb[nzmask]
        if len(nz) == 0:
            out.append(struct.pack("<BB", 0, 0))
            continue
        # min-of-clz == clz-of-OR (and likewise ctz): one reduce + O(1)
        # Python int ops instead of two vectorized bit-scan loops — cuts
        # per-call cost ~3x on the small blocks that dominate real chunk
        # tables (e.g. 24-row day-chunks of an hourly grid)
        m = int(np.bitwise_or.reduce(nz))
        lead = 64 - m.bit_length()
        trail = (m & -m).bit_length() - 1
        width = 64 - lead - trail
        # zero-bitmap (1 bit/value) + fixed-width payload over NONZERO xors
        # only — recovers classic Gorilla's '0'-control-bit advantage on
        # repeated values while staying fully vectorized.
        out.append(struct.pack("<BB", trail, width))
        out.append(np.packbits(nzmask).tobytes())
        out.append(_pack_fixed(nz >> _U64(trail), width))
    return b"".join(out)


def xorblk_decode(buf: bytes) -> np.ndarray:
    magic, n, block = struct.unpack_from("<4sIH", buf, 0)
    assert magic == _XORBLK_MAGIC, "bad xorblk blob"
    pos = 10
    x = np.empty(n, dtype=_U64)
    for lo in range(0, n, block):
        cnt = min(block, n - lo)
        trail, width = struct.unpack_from("<BB", buf, pos)
        pos += 2
        if width == 0:
            x[lo : lo + cnt] = 0
            continue
        bm_bytes = (cnt + 7) // 8
        nzmask = np.unpackbits(
            np.frombuffer(buf[pos : pos + bm_bytes], dtype=np.uint8)
        )[:cnt].astype(bool)
        pos += bm_bytes
        nnz = int(nzmask.sum())
        nb = _nbytes(nnz, width)
        blk = np.zeros(cnt, dtype=_U64)
        blk[nzmask] = _unpack_fixed(buf[pos : pos + nb], nnz, width) << _U64(trail)
        x[lo : lo + cnt] = blk
        pos += nb
    v = np.bitwise_xor.accumulate(x)
    return v.view(np.float64)


# --------------------------------------------------------------------------
# dodblk — vectorized delta-of-delta int64 timestamp codec (production path)
# --------------------------------------------------------------------------

_DODBLK_MAGIC = b"DB1\x00"


def _zigzag(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64, copy=False)
    return ((x << 1) ^ (x >> 63)).view(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(_U64, copy=False)
    return ((u >> _U64(1)).view(np.int64)) ^ -((u & _U64(1)).view(np.int64))


def dodblk_encode(ts: np.ndarray, block: int = BLOCK) -> bytes:
    """int64 array (epoch units) → first value + first delta raw, then
    zigzagged delta-of-deltas in per-block fixed width. On a gap-filled
    regular grid the dods are all zero → ~2 bytes/block."""
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(t)
    head = struct.pack("<4sIH", _DODBLK_MAGIC, n, block)
    if n == 0:
        return head
    if n == 1:
        return head + struct.pack("<q", t[0])
    d = np.diff(t)
    dod = np.diff(d)
    z = _zigzag(dod)
    out = [head, struct.pack("<qq", t[0], d[0])]
    for lo in range(0, len(z), block):
        zb = z[lo : lo + block]
        nzmask = zb != 0
        nz = zb[nzmask]
        if len(nz) == 0:
            out.append(struct.pack("<B", 0))
            continue
        width = int(nz.max()).bit_length()
        out.append(struct.pack("<B", width))
        out.append(np.packbits(nzmask).tobytes())
        out.append(_pack_fixed(nz, width))
    return b"".join(out)


def dodblk_decode(buf: bytes) -> np.ndarray:
    magic, n, block = struct.unpack_from("<4sIH", buf, 0)
    assert magic == _DODBLK_MAGIC, "bad dodblk blob"
    pos = 10
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if n == 1:
        return np.array(struct.unpack_from("<q", buf, pos), dtype=np.int64)
    t0, d0 = struct.unpack_from("<qq", buf, pos)
    pos += 16
    m = n - 2
    z = np.empty(m, dtype=_U64)
    for lo in range(0, m, block):
        cnt = min(block, m - lo)
        (width,) = struct.unpack_from("<B", buf, pos)
        pos += 1
        if width == 0:
            z[lo : lo + cnt] = 0
            continue
        bm_bytes = (cnt + 7) // 8
        nzmask = np.unpackbits(
            np.frombuffer(buf[pos : pos + bm_bytes], dtype=np.uint8)
        )[:cnt].astype(bool)
        pos += bm_bytes
        nnz = int(nzmask.sum())
        nb = _nbytes(nnz, width)
        blk = np.zeros(cnt, dtype=_U64)
        blk[nzmask] = _unpack_fixed(buf[pos : pos + nb], nnz, width)
        z[lo : lo + cnt] = blk
        pos += nb
    dod = _unzigzag(z)
    d = np.concatenate([[d0], dod]).cumsum()
    return np.concatenate([[t0], d]).cumsum().astype(np.int64)


# --------------------------------------------------------------------------
# classic Gorilla bitstreams (paper-exact; sequential by nature)
# --------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("acc", "nbits")

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits

    def getvalue(self) -> bytes:
        pad = (-self.nbits) % 8
        return ((self.acc << pad)).to_bytes((self.nbits + pad) // 8, "big")


class _BitReader:
    __slots__ = ("data", "total", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = int.from_bytes(data, "big")
        self.total = len(data) * 8
        self.pos = 0

    def read(self, bits: int) -> int:
        shift = self.total - self.pos - bits
        self.pos += bits
        return (self.data >> shift) & ((1 << bits) - 1)


def gorilla_encode(values: np.ndarray) -> bytes:
    """Classic Gorilla float XOR (paper §4.1.2): '0' identical; '10' reuse
    previous (leading, meaningful) window; '11' + 5b leading + 6b
    (meaningful-1) + meaningful bits."""
    v = np.ascontiguousarray(values, dtype=np.float64).view(_U64)
    n = len(v)
    w = _BitWriter()
    if n:
        w.write(int(v[0]), 64)
        prev_lead, prev_mean = -1, -1
        ints = [int(b) for b in v]
        for i in range(1, n):
            x = ints[i] ^ ints[i - 1]
            if x == 0:
                w.write(0, 1)
                continue
            lead = min(64 - x.bit_length(), 31)
            trail = (x & -x).bit_length() - 1
            mean = 64 - lead - trail
            prev_trail = 64 - prev_lead - prev_mean
            if prev_lead >= 0 and lead >= prev_lead and trail >= prev_trail:
                # fits inside previous window → '10' + prev_mean bits
                w.write(0b10, 2)
                w.write(x >> prev_trail, prev_mean)
            else:
                w.write(0b11, 2)
                w.write(lead, 5)
                w.write(mean - 1, 6)
                w.write(x >> trail, mean)
                prev_lead, prev_mean = lead, mean
    return struct.pack("<I", n) + w.getvalue()


def gorilla_decode(buf: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", buf, 0)
    r = _BitReader(buf[4:])
    out = np.empty(n, dtype=_U64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead = mean = 0
    for i in range(1, n):
        c = r.read(1)
        if c == 0:
            out[i] = prev
            continue
        c2 = r.read(1)
        if c2 == 1:
            lead = r.read(5)
            mean = r.read(6) + 1
        bits = r.read(mean)
        x = bits << (64 - lead - mean)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


def dod_encode(ts: np.ndarray) -> bytes:
    """Classic Gorilla timestamp delta-of-delta (paper §4.1.1 ranges,
    generalized to 64-bit escape): '0' dod=0; '10'+7b [-63,64];
    '110'+9b [-255,256]; '1110'+12b [-2047,2048]; '1111'+64b raw."""
    t = [int(x) for x in np.ascontiguousarray(ts, dtype=np.int64)]
    n = len(t)
    w = _BitWriter()
    if n:
        w.write(t[0] & ((1 << 64) - 1), 64)
    if n > 1:
        # two's-complement wrapping (mod 2^64) so pathological int64 inputs
        # whose deltas overflow still round-trip
        mask = (1 << 64) - 1

        def s64(u: int) -> int:
            u &= mask
            return u - (1 << 64) if u >= (1 << 63) else u

        d_prev = s64(t[1] - t[0])
        w.write(d_prev & mask, 64)
        for i in range(2, n):
            d = s64(t[i] - t[i - 1])
            dod = s64(d - d_prev)
            d_prev = d
            if dod == 0:
                w.write(0, 1)
            elif -63 <= dod <= 64:
                w.write(0b10, 2)
                w.write(dod + 63, 7)
            elif -255 <= dod <= 256:
                w.write(0b110, 3)
                w.write(dod + 255, 9)
            elif -2047 <= dod <= 2048:
                w.write(0b1110, 4)
                w.write(dod + 2047, 12)
            else:
                w.write(0b1111, 4)
                w.write(dod & ((1 << 64) - 1), 64)
    return struct.pack("<I", n) + w.getvalue()


def dod_decode(buf: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", buf, 0)
    r = _BitReader(buf[4:])
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out

    def s64(u: int) -> int:
        u &= (1 << 64) - 1
        return u - (1 << 64) if u >= (1 << 63) else u

    out[0] = s64(r.read(64))
    if n == 1:
        return out
    d = s64(r.read(64))
    out[1] = s64(int(out[0]) + d)
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = s64(r.read(64))
        d = s64(d + dod)
        out[i] = s64(int(out[i - 1]) + d)
    return out


CODECS = {
    "xorblk": (xorblk_encode, xorblk_decode),
    "gorilla": (gorilla_encode, gorilla_decode),
}
TS_CODECS = {
    "dodblk": (dodblk_encode, dodblk_decode),
    "dod": (dod_encode, dod_decode),
}

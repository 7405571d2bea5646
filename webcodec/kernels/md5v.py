"""Vectorized MD5 (RFC 1321) over batches of byte strings, any length.

Why: several kernels (SimHash fingerprints, salted bucketing, the media
feature stub) need a process-stable hash per value. Python's ``hash()`` is
salted per process (unusable for distributed partitioning) and per-row
``hashlib.md5`` is the row-at-a-time anti-pattern. This module runs the 64
MD5 rounds as numpy uint32 lane-parallel ops over all messages at once:

- messages are padded into one contiguous block stream with a single flat
  scatter (no per-row work);
- block k of every still-active message is compressed in the same pass, so
  the loop count is ``max_blocks`` (message bytes / 64), not message count.

The output matches ``int.from_bytes(hashlib.md5(m).digest()[:8], "little")``
bit-for-bit, so values are stable across processes, machines, and the
scalar/vector paths.
"""

from __future__ import annotations

import math

import numpy as np

_A0 = np.uint32(0x67452301)
_B0 = np.uint32(0xEFCDAB89)
_C0 = np.uint32(0x98BADCFE)
_D0 = np.uint32(0x10325476)

_K = np.array(
    [int(abs(math.sin(i + 1)) * 2**32) & 0xFFFFFFFF for i in range(64)], dtype=np.uint32
)
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)


def _compress(a, b, c, d, m):
    """One MD5 compression over ``m`` (16, n) uint32 word-major blocks,
    updating the (n,) state lanes in place-ish (returns the new state).

    All round ops reuse six lane buffers; uint32 arithmetic wraps, which is
    exactly the mod-2^32 MD5 needs."""
    n = m.shape[1]
    ain, bin_, cin, din = a, b, c, d
    a, b, c, d = a.copy(), b.copy(), c.copy(), d.copy()
    f = np.empty(n, dtype=np.uint32)
    t = np.empty(n, dtype=np.uint32)
    for i in range(64):
        if i < 16:  # F = (b & c) | (~b & d)
            np.bitwise_and(b, c, out=f)
            np.bitwise_not(b, out=t)
            t &= d
            f |= t
        elif i < 32:  # F = (d & b) | (~d & c)
            np.bitwise_and(d, b, out=f)
            np.bitwise_not(d, out=t)
            t &= c
            f |= t
        elif i < 48:  # F = b ^ c ^ d
            np.bitwise_xor(b, c, out=f)
            f ^= d
        else:  # F = c ^ (b | ~d)
            np.bitwise_not(d, out=t)
            t |= b
            np.bitwise_xor(c, t, out=f)
        f += a
        f += _K[i]
        f += m[_G[i]]
        # b' = b + rotl(f, s); registers rotate (a,b,c,d) <- (d, b', b, c)
        s = np.uint32(_S[i])
        np.left_shift(f, s, out=t)
        f >>= np.uint32(32) - s
        f |= t
        f += b
        a, b, c, d, f = d, f, b, c, a  # freed buffer becomes scratch
    a += ain
    b += bin_
    c += cin
    d += din
    return a, b, c, d


def _padded_stream(offsets: np.ndarray, data: np.ndarray, lens: np.ndarray):
    """Concatenate RFC-1321-padded messages into one 64-byte-block stream.
    Returns (stream uint8, per-message block starts in bytes, block counts)."""
    nb = (lens + 9 + 63) // 64  # blocks per message (payload + 0x80 + 8-len)
    plen = nb * 64
    pstart = np.cumsum(plen) - plen
    stream = np.zeros(int(plen.sum()), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        seg_start = np.cumsum(lens) - lens
        within = np.arange(total, dtype=np.int64) - np.repeat(seg_start, lens)
        src_pos = np.repeat(offsets[:-1], lens) + within
        dst_pos = np.repeat(pstart, lens) + within
        stream[dst_pos] = data[src_pos]
    stream[pstart + lens] = 0x80
    # 64-bit little-endian bit length in the last 8 bytes of the final block
    # (block-aligned, so the uint64 view is aligned too)
    tail = (pstart + plen) // 8 - 1
    stream.view(np.uint64)[tail] = (lens * 8).astype(np.uint64)
    return stream, pstart, nb


def md5_u64le(offsets: np.ndarray, data: np.ndarray) -> np.ndarray:
    """First 8 MD5-digest bytes (little-endian uint64) of each value in an
    Arrow-style (offsets, data) varlen layout. Fully vectorized for any
    value length; the compression loop runs max(blocks-per-value) times."""
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(offsets) - 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    data = np.asarray(data, dtype=np.uint8)
    lens = np.diff(offsets)
    stream, pstart, nb = _padded_stream(offsets, data, lens)
    a = np.full(n, _A0, dtype=np.uint32)
    b = np.full(n, _B0, dtype=np.uint32)
    c = np.full(n, _C0, dtype=np.uint32)
    d = np.full(n, _D0, dtype=np.uint32)
    max_nb = int(nb.max())
    if max_nb == 1:
        # common case (words/urls): the padded stream IS the block matrix —
        # no gather, one contiguous transpose
        m = np.ascontiguousarray(stream.view(np.uint32).reshape(n, 16).T)
        a, b, _, _ = _compress(a, b, c, d, m)
        return a.astype(np.uint64) | (b.astype(np.uint64) << np.uint64(32))
    col = np.arange(64, dtype=np.int64)
    for k in range(max_nb):
        if k == 0 and (nb > 0).all():
            idx = None
            starts = pstart
        else:
            idx = np.nonzero(nb > k)[0]
            starts = pstart[idx]
        blocks = stream[(starts + 64 * k)[:, None] + col[None, :]]
        m = np.ascontiguousarray(blocks.view(np.uint32).reshape(len(starts), 16).T)
        if idx is None:
            a, b, c, d = _compress(a, b, c, d, m)
        else:
            na, nbv, nc, nd = _compress(a[idx], b[idx], c[idx], d[idx], m)
            a[idx], b[idx], c[idx], d[idx] = na, nbv, nc, nd
    return a.astype(np.uint64) | (b.astype(np.uint64) << np.uint64(32))


def md5_u64le_arrow(arr) -> np.ndarray:
    """Same, for a pyarrow string/binary array (nulls hash as empty)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.zeros(0, dtype=np.uint64)
    if arr.null_count:
        import pyarrow.compute as pc

        fill = b"" if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type) else ""
        arr = pc.fill_null(arr, fill)
    buffers = arr.buffers()
    width = 8 if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type) else 4
    odt = np.int64 if width == 8 else np.int32
    offs = np.frombuffer(buffers[1], dtype=odt, count=len(arr) + 1 + arr.offset)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(buffers[2], dtype=np.uint8, count=int(offs[-1]))
        if buffers[2] is not None
        else np.zeros(0, dtype=np.uint8)
    )
    return md5_u64le(offs, data)

"""Vectorized XXH64 (seed 0) — the hash parquet's split-block bloom filters
REQUIRE (parquet-format BloomFilter.md: "XXH64 ... following its canonical
specification"). Implemented from the public xxHash specification
(github.com/Cyan4973/xxHash, XXH64 with seed=0); pinned against the
published reference vectors and a scalar re-implementation.

``xxh64_values(offsets, data)`` hashes m variable-length byte strings in
O(max_stripes + tail) vectorized numpy passes over all values at once —
no per-value python loop — which is what the encode path needs when it
blooms a chunk's distinct values.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _round(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    return _rotl(acc + lane * _P2, 31) * _P1


def _gather_u64(data: np.ndarray, base: np.ndarray) -> np.ndarray:
    """Little-endian u64 at byte offset ``base[i]`` per value (unaligned)."""
    idx = base[:, None] + np.arange(8, dtype=np.int64)[None, :]
    mat = data[idx].astype(np.uint64)
    out = mat[:, 0]
    for b in range(1, 8):
        out = out | (mat[:, b] << np.uint64(8 * b))
    return out


def _gather_u32(data: np.ndarray, base: np.ndarray) -> np.ndarray:
    idx = base[:, None] + np.arange(4, dtype=np.int64)[None, :]
    mat = data[idx].astype(np.uint64)
    out = mat[:, 0]
    for b in range(1, 4):
        out = out | (mat[:, b] << np.uint64(8 * b))
    return out


def xxh64_values(offsets: np.ndarray, data: np.ndarray) -> np.ndarray:
    """XXH64(seed=0) of each value ``data[offsets[i]:offsets[i+1]]``.

    Fully vectorized: the 32-byte stripe loop runs max(len)//32 iterations
    over ALL values with numpy masks, the <32-byte tail phase runs a fixed
    3+1+3 masked passes. Returns uint64[m]."""
    with np.errstate(over="ignore"):
        return _xxh64_impl(offsets, data)


def _xxh64_impl(offsets: np.ndarray, data: np.ndarray) -> np.ndarray:
    offsets = np.asarray(offsets, dtype=np.int64)
    data = np.asarray(data, dtype=np.uint8)
    if data.size < 8:
        # masked-out tail gathers still read 8 bytes at offset 0; pad so
        # they stay in bounds (padding is never part of any active lane)
        data = np.concatenate([data, np.zeros(8 - data.size, np.uint8)])
    starts = offsets[:-1]
    lens = np.diff(offsets)
    m = len(lens)
    n64 = lens.astype(np.uint64)

    long = lens >= 32
    h = np.empty(m, dtype=np.uint64)
    # short seed: seed + P5 + n
    h[~long] = _P5 + n64[~long]

    if long.any():
        li = np.flatnonzero(long)
        ls = starts[li]
        ln = lens[li]
        v1 = np.full(len(li), _P1 + _P2, dtype=np.uint64)
        v2 = np.full(len(li), _P2, dtype=np.uint64)
        v3 = np.zeros(len(li), dtype=np.uint64)
        v4 = np.full(len(li), (-int(_P1)) & _M64, dtype=np.uint64)
        stripes = ln // 32
        for k in range(int(stripes.max())):
            act = stripes > k
            base = ls + 32 * k
            safe = np.where(act, base, 0)
            l1 = _gather_u64(data, safe)
            l2 = _gather_u64(data, safe + 8)
            l3 = _gather_u64(data, safe + 16)
            l4 = _gather_u64(data, safe + 24)
            v1 = np.where(act, _round(v1, l1), v1)
            v2 = np.where(act, _round(v2, l2), v2)
            v3 = np.where(act, _round(v3, l3), v3)
            v4 = np.where(act, _round(v4, l4), v4)
        hl = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        for v in (v1, v2, v3, v4):  # merge rounds
            hl = (hl ^ _round(np.zeros_like(v), v)) * _P1 + _P4
        h[li] = hl + n64[li]

    # tail phase: bytes past the last full stripe (everything for short
    # values). r < 32, so at most three u64 words + one u32 + three bytes.
    tail_base = np.where(long, starts + (lens // 32) * 32, starts)
    r = np.where(long, lens % 32, lens)
    t8 = r // 8
    rem = r % 8
    has4 = rem >= 4
    t1 = rem - 4 * has4
    for w in range(3):
        act = t8 > w
        base = np.where(act, tail_base + 8 * w, 0)
        k1 = _round(np.zeros(m, dtype=np.uint64), _gather_u64(data, base))
        hw = _rotl(h ^ k1, 27) * _P1 + _P4
        h = np.where(act, hw, h)
    base4 = np.where(has4, tail_base + 8 * t8, 0)
    k4 = _gather_u32(data, base4)
    h4 = _rotl(h ^ (k4 * _P1), 23) * _P2 + _P3
    h = np.where(has4, h4, h)
    byte_base = tail_base + 8 * t8 + 4 * has4
    for b in range(3):
        act = t1 > b
        base = np.where(act, byte_base + b, 0)
        kb = data[base].astype(np.uint64)
        hb = _rotl(h ^ (kb * _P5), 11) * _P1
        h = np.where(act, hb, h)

    # avalanche
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h


def xxh64_scalar(value: bytes, seed: int = 0) -> int:
    """Straight-line scalar XXH64 — the differential reference for the
    vectorized kernel (and usable for single probes)."""
    P1, P2, P3, P4, P5 = (int(_P1), int(_P2), int(_P3), int(_P4), int(_P5))

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & _M64

    def rnd(acc, lane):
        return (rotl((acc + lane * P2) & _M64, 31) * P1) & _M64

    n = len(value)
    pos = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M64
        v2 = (seed + P2) & _M64
        v3 = seed & _M64
        v4 = (seed - P1) & _M64
        while pos + 32 <= n:
            v1 = rnd(v1, int.from_bytes(value[pos:pos + 8], "little"))
            v2 = rnd(v2, int.from_bytes(value[pos + 8:pos + 16], "little"))
            v3 = rnd(v3, int.from_bytes(value[pos + 16:pos + 24], "little"))
            v4 = rnd(v4, int.from_bytes(value[pos + 24:pos + 32], "little"))
            pos += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ rnd(0, v)) * P1 + P4) & _M64
    else:
        h = (seed + P5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        k1 = rnd(0, int.from_bytes(value[pos:pos + 8], "little"))
        h = (rotl(h ^ k1, 27) * P1 + P4) & _M64
        pos += 8
    if pos + 4 <= n:
        k = int.from_bytes(value[pos:pos + 4], "little")
        h = (rotl(h ^ (k * P1) & _M64, 23) * P2 + P3) & _M64
        pos += 4
    while pos < n:
        h = (rotl(h ^ (value[pos] * P5) & _M64, 11) * P1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * P2) & _M64
    h ^= h >> 29
    h = (h * P3) & _M64
    h ^= h >> 32
    return h

"""DELTA_BINARY_PACKED — frame-of-reference + delta + per-miniblock bit-packing.

Reference parity (SURVEY.md §2.A8): parquet-java
``DeltaBinaryPackingValuesWriter`` — block of 128 values, 4 miniblocks x 32;
header = block_size, miniblock_count, total_count, first_value (zigzag varint);
per block: min-delta (zigzag varint, the frame of reference) + per-miniblock
bit widths + bit-packed (delta - minDelta).

Fully vectorized: deltas via ``np.diff`` (wrapping int64), per-miniblock widths
via branchless CLZ, packing grouped BY WIDTH so each distinct width is one
vectorized pack over all miniblocks that use it (<= 65 iterations regardless of n).
Decode reverses with a wrapping uint64 ``cumsum``.
"""

from __future__ import annotations

import numpy as np

from webcodec.kernels import bitpack
from webcodec.kernels.varint import (
    read_uvarint,
    unzigzag_int,
    write_uvarint,
    zigzag_int,
)

BLOCK = 128
MINIBLOCKS = 4
MB_VALUES = BLOCK // MINIBLOCKS  # 32

_U64 = np.uint64
_I64 = np.int64


def encode(values: np.ndarray) -> bytes:
    """Encode an int64 (or any int, upcast) array."""
    v = values.astype(_I64, copy=False)
    n = len(v)
    header = (
        write_uvarint(BLOCK)
        + write_uvarint(MINIBLOCKS)
        + write_uvarint(n)
        + write_uvarint(zigzag_int(int(v[0]) if n else 0))
    )
    if n <= 1:
        return header
    with np.errstate(over="ignore"):
        deltas = (v[1:].astype(_U64) - v[:-1].astype(_U64)).view(_I64)  # wrapping diff
    nd = len(deltas)
    nblocks = (nd + BLOCK - 1) // BLOCK
    pad = nblocks * BLOCK - nd
    # per-block min over REAL deltas (sentinel +inf for padding)
    padded = np.concatenate((deltas, np.full(pad, np.iinfo(_I64).max, dtype=_I64)))
    blocks = padded.reshape(nblocks, BLOCK)
    min_delta = blocks.min(axis=1)  # int64 per block
    # encoded = delta - min_delta in wrapping uint64; padding encodes as 0
    enc = (blocks.astype(_U64) - min_delta[:, None].astype(_U64)).astype(_U64)
    enc.reshape(-1)[nd:] = 0
    mbs = enc.reshape(nblocks * MINIBLOCKS, MB_VALUES)
    mb_max = mbs.max(axis=1)
    widths = bitpack.bit_length(mb_max)  # uint8, (nblocks*4,)
    # pack miniblocks grouped by width
    mb_bytes: list[bytes | None] = [None] * len(mbs)
    for w in np.unique(widths):
        w = int(w)
        idx = np.flatnonzero(widths == w)
        if w == 0:
            for i in idx:
                mb_bytes[i] = b""
            continue
        packed = bitpack.pack(mbs[idx].reshape(-1), w)
        per = MB_VALUES * w // 8  # 32*w bits is a whole number of bytes
        for j, i in enumerate(idx):
            mb_bytes[i] = packed[j * per : (j + 1) * per]
    out = [header]
    wb = widths.tobytes()
    for b in range(nblocks):
        out.append(write_uvarint(zigzag_int(int(min_delta[b]))))
        out.append(wb[b * MINIBLOCKS : (b + 1) * MINIBLOCKS])
        for m in range(MINIBLOCKS):
            out.append(mb_bytes[b * MINIBLOCKS + m])  # type: ignore[arg-type]
    return b"".join(out)


def decode(data: bytes | memoryview, n_hint: int | None = None) -> np.ndarray:
    """Decode to int64. ``n_hint`` is checked against the stored count."""
    buf = memoryview(data)
    pos = 0
    block, pos = read_uvarint(buf, pos)
    mbcount, pos = read_uvarint(buf, pos)
    n, pos = read_uvarint(buf, pos)
    zz_first, pos = read_uvarint(buf, pos)
    first = unzigzag_int(zz_first)
    if n_hint is not None and n_hint != n:
        raise ValueError(f"delta stream count {n} != expected {n_hint}")
    if n == 0:
        return np.empty(0, dtype=_I64)
    if n == 1:
        return np.array([first], dtype=_I64)
    mb_values = block // mbcount
    nd = n - 1
    nblocks = (nd + block - 1) // block
    enc = np.empty(nblocks * block, dtype=_U64)
    mins = np.empty(nblocks, dtype=_I64)
    for b in range(nblocks):
        zz, pos = read_uvarint(buf, pos)
        mins[b] = unzigzag_int(zz)
        widths = np.frombuffer(buf[pos : pos + mbcount], dtype=np.uint8)
        pos += mbcount
        base = b * block
        for m in range(mbcount):
            w = int(widths[m])
            nb = mb_values * w // 8
            enc[base + m * mb_values : base + (m + 1) * mb_values] = bitpack.unpack(
                buf[pos : pos + nb], w, mb_values
            )
            pos += nb
    deltas = enc + np.repeat(mins.astype(_U64), block)
    out = np.empty(n, dtype=_U64)
    out[0] = np.int64(first).astype(_U64)
    np.cumsum(deltas[:nd], out=out[1:])  # wrapping uint64 cumsum
    out[1:] += out[0]
    return out.view(_I64)

"""RLE / bit-packing hybrid encoder-decoder.

Reference parity (SURVEY.md §2.A3): parquet-java
``RunLengthBitPackingHybridEncoder`` — runs of >= 8 equal values become RLE runs
(``writeRleRun``: LEB128 header ``count<<1`` + value in ceil(width/8) LE bytes);
everything else is bit-packed (``writeOrAppendBitPackedRun``).

One deliberate deviation from the parquet byte stream (allowed — SURVEY.md §7.0:
bit-identical *decode output* is the contract, not byte-identical files): our
bit-packed header stores the exact VALUE count (``count<<1 | 1``) rather than
the group-of-8 count, so mid-stream spans need no 8-value alignment and the
whole encode is vectorized: run detection via ``np.diff``, one python iteration
per *long run* (not per value), packing via :mod:`webcodec.kernels.bitpack`.
"""

from __future__ import annotations

import numpy as np

from webcodec.kernels import bitpack
from webcodec.kernels.varint import read_uvarint, write_uvarint

_MIN_RLE_RUN = 8  # reference: repeatCount >= 8 triggers writeRleRun


def run_lengths(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(run_starts, run_lens) of maximal equal-value runs, vectorized."""
    n = len(values)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.flatnonzero(values[1:] != values[:-1]) + 1
    starts = np.concatenate(([0], change))
    lens = np.diff(np.concatenate((starts, [n])))
    return starts, lens


def mean_run_length(values: np.ndarray) -> float:
    n = len(values)
    if n == 0:
        return 0.0
    _, lens = run_lengths(values)
    return n / len(lens)


def _value_bytes(value: int, width: int) -> bytes:
    nbytes = (width + 7) // 8
    return int(value).to_bytes(nbytes, "little")


def encode(values: np.ndarray, width: int) -> bytes:
    """Hybrid-encode unsigned ints (< 2**width)."""
    n = len(values)
    if n == 0:
        return b""
    v = values.astype(np.uint64, copy=False)
    if width == 0:
        # all values are zero; single RLE run carries everything
        return write_uvarint(n << 1)
    starts, lens = run_lengths(v)
    # width-adaptive run cutoff: an RLE run saves ceil(L*w/8) packed bytes
    # but costs a ~2B varint header + ceil(w/8) value bytes + ~2B for the
    # extra bit-packed span header it splits off — at small widths short
    # runs LOSE bytes and fragment the stream into many tiny pack() calls
    # (the former lineitem hot spot). Break-even: L > 32/w + 1.
    min_run = max(_MIN_RLE_RUN, 32 // width + 2)
    big = np.flatnonzero(lens >= min_run)
    out: list[bytes] = []
    pos = 0
    for ri in big:  # one iteration per LONG run only
        s, ln = int(starts[ri]), int(lens[ri])
        if s > pos:  # gap -> one bit-packed span
            gap = v[pos:s]
            out.append(write_uvarint((len(gap) << 1) | 1))
            out.append(bitpack.pack(gap, width))
        out.append(write_uvarint(ln << 1))
        out.append(_value_bytes(int(v[s]), width))
        pos = s + ln
    if pos < n:
        gap = v[pos:]
        out.append(write_uvarint((len(gap) << 1) | 1))
        out.append(bitpack.pack(gap, width))
    return b"".join(out)


def decode(data: bytes | memoryview, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`encode`; returns uint64 array of length n."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    buf = memoryview(data)
    parts: list[np.ndarray] = []
    pos = 0
    remaining = n
    vbytes = (width + 7) // 8
    while remaining > 0:
        header, pos = read_uvarint(buf, pos)
        if header & 1:  # bit-packed span, exact value count
            count = header >> 1
            nb = bitpack.packed_size(count, width)
            parts.append(bitpack.unpack(buf[pos : pos + nb], width, count))
            pos += nb
        else:  # RLE run
            count = header >> 1
            value = int.from_bytes(buf[pos : pos + vbytes], "little") if vbytes else 0
            pos += vbytes
            parts.append(np.full(count, value, dtype=np.uint64))
        remaining -= count
    out = parts[0] if len(parts) == 1 else np.concatenate(parts)
    if len(out) != n:
        raise ValueError(f"RLE stream decoded {len(out)} values, expected {n}")
    return out


def decode_spec(data: bytes | memoryview, width: int, n: int) -> np.ndarray:
    """Decode a SPEC-CONFORMANT parquet RLE/bit-packed hybrid stream (the
    byte format parquet-java/arrow-cpp write): bit-packed headers carry the
    count of 8-VALUE GROUPS (``groups << 1 | 1``), so a span always encodes
    groups*8 values and the final span may overrun ``n`` (trimmed here).
    Used by the parquet interop reader to prove kernel-level format parity
    against reference-written files (SURVEY.md §7.2 differential test)."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    buf = memoryview(data)
    parts: list[np.ndarray] = []
    pos = 0
    remaining = n
    vbytes = (width + 7) // 8
    while remaining > 0:
        header, pos = read_uvarint(buf, pos)
        if header & 1:  # bit-packed span of (header>>1) groups of 8
            count = (header >> 1) * 8
            nb = bitpack.packed_size(count, width)
            vals = bitpack.unpack(buf[pos : pos + nb], width, count)
            pos += nb
            if count > remaining:
                vals = vals[:remaining]
                count = remaining
            parts.append(vals)
        else:  # RLE run
            count = header >> 1
            value = int.from_bytes(buf[pos : pos + vbytes], "little") if vbytes else 0
            pos += vbytes
            parts.append(np.full(count, value, dtype=np.uint64))
        remaining -= count
    out = parts[0] if len(parts) == 1 else np.concatenate(parts)
    if len(out) != n:
        raise ValueError(f"spec RLE stream decoded {len(out)} values, expected {n}")
    return out


# -- validity bitmap (definition-level analogue for flat schemas) -------------


def encode_validity(mask: np.ndarray) -> bytes:
    """Encode a boolean validity mask as a width-1 hybrid stream.

    Flat-schema def levels: 1 = present, 0 = null (SURVEY.md §1.2 —
    'def level degenerates to a null bitmap').
    """
    return encode(mask.astype(np.uint64, copy=False), 1)


def decode_validity(data: bytes | memoryview, n: int) -> np.ndarray:
    return decode(data, 1, n).astype(bool)

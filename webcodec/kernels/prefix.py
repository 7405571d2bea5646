"""DELTA_BYTE_ARRAY — incremental (shared-prefix) string encoding.

Reference parity (SURVEY.md §2.A10): parquet-java ``DeltaByteArrayWriter``
(prefix lengths -> DELTA_BINARY_PACKED, suffixes -> DELTA_LENGTH_BYTE_ARRAY).
Big win on sorted URLs — our encode pipeline sorts within partitions by url
first (SURVEY.md §4.1 'sort-based encode win').

Vectorization notes:
- Encode: adjacent common-prefix lengths via a padded (n, maxlen) byte-matrix
  compare — one ``==`` + ``argmin``; suffix bytes gathered with index arith.
- Decode: the naive reconstruction is sequential (each value references the
  previous); we instead resolve per byte-COLUMN k: the owner of column k at
  row i is the last j<=i with prefix_len[j] <= k, computed with
  ``np.maximum.accumulate`` — maxlen vectorized passes, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from webcodec.kernels import delta, deltalength
from webcodec.kernels.varint import read_uvarint, write_uvarint

# Guard: the matrix paths allocate ~3 O(n * maxlen) temporaries (byte
# matrix + shifted copy/output + boolean mask); cap the SUM at ~512 MB, i.e.
# one matrix at ~170 MB, and fall back to the sequential path beyond it.
_MATRIX_BYTE_CAP = 512 << 20
_MATRIX_TEMPORARIES = 3


def _byte_matrix(offsets: np.ndarray, data: np.ndarray, maxlen: int, fill: int) -> np.ndarray:
    """Pad variable strings into an (n, maxlen) uint8 matrix."""
    n = len(offsets) - 1
    lens = np.diff(offsets)
    mat = np.full((n, maxlen), fill, dtype=np.uint8)
    if int(lens.sum()):
        owner = np.repeat(np.arange(n, dtype=np.int64), lens)
        within = np.arange(int(offsets[0]), int(offsets[-1]), dtype=np.int64) - offsets[:-1][owner]
        mat[owner, within] = data[int(offsets[0]) : int(offsets[-1])]
    return mat


def prefix_lengths(offsets: np.ndarray, data: bytes | memoryview) -> np.ndarray:
    """Common-prefix length of each value with its predecessor (first = 0)."""
    offs = offsets.astype(np.int64, copy=False)
    n = len(offs) - 1
    if n <= 1:
        return np.zeros(n, dtype=np.int64)
    lens = np.diff(offs)
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return np.zeros(n, dtype=np.int64)
    raw = np.frombuffer(data, dtype=np.uint8, count=int(offs[-1]))
    if maxlen * n * _MATRIX_TEMPORARIES > _MATRIX_BYTE_CAP:
        # one multi-MB outlier value would blow the padded matrices up to
        # n * maxlen — mirror decode's guard with a sequential fallback
        return _prefix_lengths_sequential(offs, raw)
    # distinct fill values so padding never matches (0xFE vs 0xFD)
    a = _byte_matrix(offs, raw, maxlen, 0xFE)
    b = _byte_matrix(offs, raw, maxlen, 0xFD)
    eq = a[:-1] == b[1:]
    all_eq = eq.all(axis=1)
    p = np.where(all_eq, maxlen, eq.argmin(axis=1)).astype(np.int64)
    p = np.minimum(p, np.minimum(lens[:-1], lens[1:]))
    return np.concatenate(([0], p))


def _prefix_lengths_sequential(offs: np.ndarray, raw: np.ndarray) -> np.ndarray:
    """Cold path for pathologically wide values: O(total bytes) without the
    padded matrices."""
    n = len(offs) - 1
    out = np.zeros(n, dtype=np.int64)
    for i in range(1, n):
        a = raw[offs[i - 1]:offs[i]]
        b = raw[offs[i]:offs[i + 1]]
        m = min(len(a), len(b))
        neq = np.flatnonzero(a[:m] != b[:m])
        out[i] = int(neq[0]) if len(neq) else m
    return out


def encode(offsets: np.ndarray, data: bytes | memoryview) -> bytes:
    offs = offsets.astype(np.int64, copy=False)
    n = len(offs) - 1
    p = prefix_lengths(offs, data)
    lens = np.diff(offs)
    slens = lens - p
    raw = np.frombuffer(data, dtype=np.uint8, count=int(offs[-1]))
    total_suffix = int(slens.sum())
    suffix = np.empty(total_suffix, dtype=np.uint8)
    if total_suffix:
        owner = np.repeat(np.arange(n, dtype=np.int64), slens)
        sstart = np.zeros(n, dtype=np.int64)
        np.cumsum(slens[:-1], out=sstart[1:])
        within = np.arange(total_suffix, dtype=np.int64) - sstart[owner]
        suffix = raw[offs[:-1][owner] + p[owner] + within]
    enc_p = delta.encode(p)
    enc_sl = delta.encode(slens)
    return (
        write_uvarint(n)
        + write_uvarint(len(enc_p))
        + enc_p
        + write_uvarint(len(enc_sl))
        + enc_sl
        + suffix.tobytes()
    )


def decode(data: bytes | memoryview, n: int, arrow_type: pa.DataType | None = None) -> pa.Array:
    buf = memoryview(data)
    n_stored, pos = read_uvarint(buf, 0)
    if n_stored != n:
        raise ValueError(f"prefix stream count {n_stored} != expected {n}")
    lp, pos = read_uvarint(buf, pos)
    p = delta.decode(buf[pos : pos + lp], n) if n else np.empty(0, np.int64)
    pos += lp
    lsl, pos = read_uvarint(buf, pos)
    slens = delta.decode(buf[pos : pos + lsl], n) if n else np.empty(0, np.int64)
    pos += lsl
    suffix = np.frombuffer(buf[pos:], dtype=np.uint8, count=int(slens.sum()) if n else 0)
    if n == 0:
        return deltalength.from_parts(np.empty(0, np.int64), b"", 0, arrow_type)
    out_lens = p + slens
    maxlen = int(out_lens.max()) if n else 0
    if maxlen * n * _MATRIX_TEMPORARIES > _MATRIX_BYTE_CAP:
        return _decode_sequential(p, slens, suffix, n, arrow_type)
    # suffix byte matrix: row i holds suffix bytes at columns [p_i, p_i + slen_i)
    smat = np.zeros((n, max(maxlen, 1)), dtype=np.uint8)
    if len(suffix):
        owner = np.repeat(np.arange(n, dtype=np.int64), slens)
        sstart = np.zeros(n, dtype=np.int64)
        np.cumsum(slens[:-1], out=sstart[1:])
        within = np.arange(len(suffix), dtype=np.int64) - sstart[owner]
        smat[owner, p[owner] + within] = suffix
    out = np.zeros((n, max(maxlen, 1)), dtype=np.uint8)
    idx = np.arange(n, dtype=np.int64)
    for k in range(maxlen):
        # owner of column k at row i = last j <= i whose own suffix covers column k
        own = np.maximum.accumulate(np.where(p <= k, idx, -1))
        out[:, k] = smat[own, k]
    flat_mask = np.arange(max(maxlen, 1))[None, :] < out_lens[:, None]
    payload = out[flat_mask].tobytes()
    return deltalength.from_parts(out_lens, payload, n, arrow_type)


def _decode_sequential(p, slens, suffix, n, arrow_type):
    """Fallback for pathologically wide values (cold path)."""
    sstart = np.zeros(n, dtype=np.int64)
    np.cumsum(slens[:-1], out=sstart[1:])
    vals: list[bytes] = []
    prev = b""
    sfx = suffix.tobytes()
    for i in range(n):
        cur = prev[: int(p[i])] + sfx[int(sstart[i]) : int(sstart[i] + slens[i])]
        vals.append(cur)
        prev = cur
    lens = np.fromiter((len(v) for v in vals), dtype=np.int64, count=n)
    return deltalength.from_parts(lens, b"".join(vals), n, arrow_type)

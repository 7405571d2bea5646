"""PLAIN encoding: little-endian fixed-width back-to-back; BINARY as u32len+bytes.

Reference parity (SURVEY.md §2.A1/A2): parquet-java ``PlainValuesWriter`` /
``BinaryPlainValuesReader`` / ``BooleanPlainValuesWriter``.
Fixed-width path is ``ndarray.tobytes``/``np.frombuffer``; the binary encode is
fully vectorized via scatter index arithmetic. Binary *decode* is inherently
sequential (each length prefixes its payload) — it is the cold path here; our
string defaults are delta-length / dict / FSST, which decode vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from webcodec.kernels import bitpack

_FIXED_DTYPES = {
    "int32": np.dtype("<i4"),
    "int64": np.dtype("<i8"),
    "float32": np.dtype("<f4"),
    "float64": np.dtype("<f8"),
    "uint32": np.dtype("<u4"),
    "uint64": np.dtype("<u8"),
}


def encode_fixed(values: np.ndarray) -> bytes:
    """Fixed-width primitives: raw little-endian bytes."""
    return np.ascontiguousarray(values).astype(values.dtype.newbyteorder("<"), copy=False).tobytes()


def decode_fixed(data: bytes | memoryview, dtype: np.dtype, n: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.dtype(dtype).newbyteorder("<"), count=n)


def encode_bools(values: np.ndarray) -> bytes:
    return bitpack.pack_bools(values)


def decode_bools(data: bytes | memoryview, n: int) -> np.ndarray:
    return bitpack.unpack_bools(data, n)


def encode_binary(offsets: np.ndarray, data: bytes | memoryview) -> bytes:
    """PLAIN BINARY: per value ``u32 length (LE) + bytes`` — vectorized scatter.

    ``offsets``/``data`` are the Arrow layout (offsets int32/int64, len n+1).
    """
    n = len(offsets) - 1
    if n == 0:
        return b""
    offs = offsets.astype(np.int64, copy=False)
    lens = np.diff(offs)
    total = int(4 * n + lens.sum())
    out = np.zeros(total, dtype=np.uint8)
    # output start of each record = 4*i + cumulative data before it
    rec_starts = 4 * np.arange(n, dtype=np.int64) + np.concatenate(([0], np.cumsum(lens[:-1])))
    # write lengths
    len_le = lens.astype("<u4").view(np.uint8).reshape(n, 4)
    out[(rec_starts[:, None] + np.arange(4)).reshape(-1)] = len_le.reshape(-1)
    # write payload bytes: for each source byte, its output position
    src = np.frombuffer(data, dtype=np.uint8, count=int(offs[-1]))
    if int(lens.sum()) > 0:
        owner = np.repeat(np.arange(n, dtype=np.int64), lens)
        src_pos = np.arange(int(offs[0]), int(offs[-1]), dtype=np.int64)
        within = src_pos - offs[owner]
        out[rec_starts[owner] + 4 + within] = src[src_pos]
    return out.tobytes()


def decode_binary(data: bytes | memoryview, n: int, arrow_type: pa.DataType | None = None) -> pa.Array:
    """Inverse of :func:`encode_binary` (sequential; cold path)."""
    arrow_type = arrow_type or pa.binary()
    buf = np.frombuffer(data, dtype=np.uint8)
    lens = np.empty(n, dtype=np.int64)
    pos = 0
    u32 = np.dtype("<u4")
    for i in range(n):
        lens[i] = int(buf[pos : pos + 4].view(u32)[0])
        pos += 4 + lens[i]
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    rec_starts = 4 * np.arange(1, n + 1, dtype=np.int64) + offsets[:-1]
    payload = np.zeros(int(offsets[-1]), dtype=np.uint8)
    if int(offsets[-1]) > 0:
        owner = np.repeat(np.arange(n, dtype=np.int64), lens)
        within = np.arange(int(offsets[-1]), dtype=np.int64) - offsets[:-1][owner].astype(np.int64)
        payload = buf[rec_starts[owner] + within]
    return pa.Array.from_buffers(
        arrow_type, n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(payload.tobytes())]
    )

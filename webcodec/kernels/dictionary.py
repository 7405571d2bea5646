"""Dictionary encoding: per-chunk dict page + RLE/bit-packed indices.

Reference parity (SURVEY.md §2.A6): parquet-java ``DictionaryValuesWriter``
family — dict page holds PLAIN-encoded distinct values in first-occurrence
order; data pages hold indices encoded with the RLE/bit-pack hybrid at
``bitWidth = ceil(log2(dictSize))``, written with one leading bit-width byte.
Fallback control (A7): the caller (selector) enforces
``encoded + dict_bytes < raw`` or falls back — see webcodec.selector.

Dict build uses Arrow's C++ ``dictionary_encode`` (first-occurrence order),
indices then go through the vectorized hybrid kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webcodec.kernels import rle
from webcodec.kernels.bitpack import max_bit_width


def build(arr: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Returns (dict_values, indices:int64 ndarray). ``arr`` must be null-free."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    denc = arr.dictionary_encode()
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    indices = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return denc.dictionary, indices


def encode_indices(indices: np.ndarray, dict_size: int) -> bytes:
    """1 leading bit-width byte + hybrid stream (parquet RLE_DICTIONARY shape)."""
    width = max(max_bit_width(np.array([max(dict_size - 1, 0)], dtype=np.uint64)), 0)
    return bytes([width]) + rle.encode(indices.astype(np.uint64), width)


def decode_indices(data: bytes | memoryview, n: int) -> np.ndarray:
    buf = memoryview(data)
    width = buf[0]
    return rle.decode(buf[1:], width, n).astype(np.int64)


def take(dict_values: pa.Array, indices: np.ndarray) -> pa.Array:
    """Materialize values from dict + indices (Arrow C++ gather)."""
    return pc.take(dict_values, pa.array(indices, type=pa.int64()))

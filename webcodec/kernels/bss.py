"""BYTE_STREAM_SPLIT: scatter value bytes into k per-byte streams.

Reference parity (SURVEY.md §2.A11): parquet-java
``ByteStreamSplitValuesWriter.scatterBytes`` — no size change alone, but makes
FP/int data far more compressible by the downstream block codec.
Implementation is one numpy transpose: ``view(u8).reshape(-1,k).T``.
"""

from __future__ import annotations

import numpy as np


def encode(values: np.ndarray) -> bytes:
    """Split a fixed-width array into element-size byte streams."""
    v = np.ascontiguousarray(values)
    k = v.dtype.itemsize
    return v.view(np.uint8).reshape(-1, k).T.tobytes()


def decode(data: bytes | memoryview, dtype: np.dtype, n: int) -> np.ndarray:
    dtype = np.dtype(dtype)
    k = dtype.itemsize
    raw = np.frombuffer(data, dtype=np.uint8, count=n * k)
    return np.ascontiguousarray(raw.reshape(k, n).T).view(dtype).reshape(n)

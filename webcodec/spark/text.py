"""Vectorized text/embedding kernels for the pipeline operators.

Zero per-row Python: tokenization is Arrow C++ (``pc.split_pattern``),
hashing is the lane-parallel numpy MD5 kernel (``kernels.md5v``), and the
SimHash bit vote is one ``np.add.reduceat`` over the token-list offsets.
Values are bit-identical to the scalar reference (md5-derived), so results
are stable across rounds and processes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webcodec.kernels.md5v import md5_u64le_arrow

_SHIFTS = np.arange(64, dtype=np.uint64)


def _list_parts(arr: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """(offsets int64 rebased to 0, flattened values) of a list-typed array
    (no outer nulls) — offsets index directly into the returned values."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=len(arr) + 1 + arr.offset)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    return offs - offs[0], arr.flatten()


def simhash64(texts: pa.Array) -> np.ndarray:
    """64-bit SimHash per document (int64 view of the uint64 fingerprint).

    token hash = first 8 md5 bytes (LE); bit b of the fingerprint is set when
    more than half the tokens have bit b set (vote > 0) — the standard
    Charikar construction. Nulls hash like empty strings (parity with
    ``(t or "").split(" ")``).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    texts = pc.fill_null(texts, "")
    words = pc.split_pattern(texts, " ")
    offs, flat = _list_parts(words)
    counts = np.diff(offs)

    # vocabulary dedup: hash each distinct token once, then gather
    de = pc.dictionary_encode(flat)
    uniq_h = md5_u64le_arrow(de.dictionary)
    hs = uniq_h[de.indices.to_numpy(zero_copy_only=False).astype(np.int64)]

    bits = ((hs[:, None] >> _SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
    # per-doc bit sums; every doc has >=1 token ("" splits to [""]), which
    # np.add.reduceat requires (empty segments would misbehave)
    assert counts.min() >= 1
    sums = np.add.reduceat(bits, offs[:-1], axis=0)
    votes = sums * 2 - counts[:, None]
    packed = np.packbits((votes > 0).astype(np.uint8), axis=1, bitorder="little")
    return packed.view(np.uint64)[:, 0].view(np.int64)


def embedding_matrix(emb: pa.Array) -> np.ndarray:
    """(n, d) float64 matrix from a fixed-dim list<float> column — Arrow
    buffer reshape, no per-row materialization."""
    offs, flat = _list_parts(emb)
    lens = np.diff(offs)
    vals = flat.to_numpy(zero_copy_only=False).astype(np.float64)
    if len(lens) == 0:
        return np.zeros((0, 0))
    d = int(lens[0])
    if not (lens == d).all():
        raise ValueError("embedding_matrix requires fixed-dim lists")
    return vals.reshape(len(lens), d)

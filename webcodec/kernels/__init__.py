"""Vectorized numpy encode/decode kernels (SURVEY.md §2.A inventory).

Each kernel module exposes ``encode(...) -> bytes`` and ``decode(bytes, n, ...)``
returning numpy/Arrow arrays. No per-row Python in any hot path.
"""

from webcodec.kernels import (  # noqa: F401
    bitpack,
    bloom,
    bss,
    delta,
    deltalength,
    dictionary,
    fsst,
    plain,
    prefix,
    rle,
    varint,
)

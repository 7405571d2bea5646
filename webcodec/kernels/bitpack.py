"""Bit-pack kernels, widths 0..64, little-endian bit order.

Reference parity: generated per-width packers in parquet-encoding
(``BytePacker.pack8Values/unpack8Values``, ``ByteBitPackingLE``; SURVEY.md §2.A5).
Here a single vectorized numpy path handles every width at once — numpy is the
SIMD unit (SURVEY.md §4.2), no per-width codegen needed.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def bit_length(values: np.ndarray) -> np.ndarray:
    """Exact per-element bit length of uint64 values, vectorized (branchless CLZ)."""
    v = values.astype(_U64, copy=True)
    bl = np.zeros(v.shape, dtype=np.uint8)
    for shift in (32, 16, 8, 4, 2, 1):
        s = _U64(shift)
        mask = (v >> s) > 0
        bl[mask] += np.uint8(shift)
        v[mask] >>= s
    bl[v > 0] += np.uint8(1)
    return bl


def max_bit_width(values: np.ndarray) -> int:
    if len(values) == 0:
        return 0
    m = int(values.astype(_U64, copy=False).max())
    return m.bit_length()


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack unsigned ints (< 2**width) at ``width`` bits each, LSB-first.

    Total bits are padded up to a byte boundary with zeros.

    Implementation: view the uint64 values as little-endian bytes, keep the
    low ceil(width/8) bytes per value, and let ONE C-side
    unpackbits/packbits pair drop the slack bits — ~3-5x cheaper than
    materializing an (n, width) uint64 shift matrix (the former hot spot of
    DELTA_BINARY_PACKED encode). Byte-aligned widths skip the bit pass
    entirely.
    """
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    # '<u8' pins LITTLE-ENDIAN byte order so the on-disk layout is
    # platform-independent (a native view would pick the HIGH bytes on a
    # big-endian host and silently corrupt the stream); on LE it is the
    # native dtype, so no copy beyond the existing astype
    v = np.ascontiguousarray(values.astype(_U64, copy=False), dtype="<u8")
    nbytes = (width + 7) // 8
    byt = v.view(np.uint8).reshape(n, 8)[:, :nbytes]
    if width == nbytes * 8:
        return byt.tobytes()
    bits = np.unpackbits(np.ascontiguousarray(byt), axis=1, bitorder="little")
    return np.packbits(bits[:, :width].reshape(-1), bitorder="little").tobytes()


def unpack(data: bytes | memoryview, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack`; returns uint64 array of length n."""
    if width == 0:
        return np.zeros(n, dtype=_U64)
    if n == 0:
        return np.empty(0, dtype=_U64)
    need = (n * width + 7) // 8
    raw = np.frombuffer(data, dtype=np.uint8, count=need)
    nbytes = (width + 7) // 8
    out = np.zeros((n, 8), dtype=np.uint8)
    if width == nbytes * 8:
        out[:, :nbytes] = raw[: n * nbytes].reshape(n, nbytes)
        return out.reshape(-1).view("<u8").astype(_U64, copy=False)
    bits = np.unpackbits(raw, bitorder="little")[: n * width].reshape(n, width)
    padded = np.zeros((n, nbytes * 8), dtype=np.uint8)
    padded[:, :width] = bits
    out[:, :nbytes] = np.packbits(padded, axis=1, bitorder="little")
    # bytes are little-endian on disk; '<u8' view decodes them identically on
    # any host (astype is a no-op on LE)
    return out.reshape(-1).view("<u8").astype(_U64, copy=False)


def packed_size(n: int, width: int) -> int:
    return (n * width + 7) // 8


def pack_legacy(values: np.ndarray, width: int) -> bytes:
    """Deprecated parquet BIT_PACKED encoding (SURVEY.md §2.A4): values at
    ``width`` bits each, MSB-FIRST within each value, bits filled from the
    most significant bit of each byte (the opposite bit order of the modern
    RLE-hybrid spans). Spec example (Encodings.md): values 0..7 at width 3
    pack to 00000101 00111001 01110111."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    v = values.astype(_U64, copy=False)
    shifts = np.arange(width - 1, -1, -1, dtype=_U64)  # MSB first
    bits = ((v[:, None] >> shifts) & _U64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="big").tobytes()


def unpack_legacy(data: bytes | memoryview, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_legacy` (decode-side parity for legacy files)."""
    if width == 0:
        return np.zeros(n, dtype=_U64)
    if n == 0:
        return np.empty(0, dtype=_U64)
    need = (n * width + 7) // 8
    raw = np.frombuffer(data, dtype=np.uint8, count=need)
    bits = np.unpackbits(raw, bitorder="big")[: n * width].reshape(n, width)
    shifts = np.arange(width - 1, -1, -1, dtype=_U64)
    return (bits.astype(_U64) << shifts).sum(axis=1, dtype=_U64)


def pack_legacy_lsb(values: np.ndarray, width: int) -> bytes:
    """BIT_PACKED with LSB-first bit order — the order Arrow C++/Impala use
    for deprecated BIT_PACKED *levels* (their generic BitReader/BitWriter is
    LSB-first), diverging from the spec's MSB-first prose that parquet-java
    follows. Verified empirically: pyarrow 16 round-trips a hand-crafted
    BIT_PACKED-levels page only in this order. The interop reader matches
    pyarrow since it is the differential reference."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    v = values.astype(_U64, copy=False)
    shifts = np.arange(width, dtype=_U64)  # LSB first
    bits = ((v[:, None] >> shifts) & _U64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_legacy_lsb(data: bytes | memoryview, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_legacy_lsb` (level decode parity with pyarrow)."""
    if width == 0:
        return np.zeros(n, dtype=_U64)
    if n == 0:
        return np.empty(0, dtype=_U64)
    need = (n * width + 7) // 8
    raw = np.frombuffer(data, dtype=np.uint8, count=need)
    bits = np.unpackbits(raw, bitorder="little")[: n * width].reshape(n, width)
    shifts = np.arange(width, dtype=_U64)
    return (bits.astype(_U64) << shifts).sum(axis=1, dtype=_U64)


def pack_bools(mask: np.ndarray) -> bytes:
    """Booleans at 1 bit/value LSB-first (reference: BooleanPlainValuesWriter, A2)."""
    if len(mask) == 0:
        return b""
    return np.packbits(mask.astype(np.uint8), bitorder="little").tobytes()


def unpack_bools(data: bytes | memoryview, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=bool)
    raw = np.frombuffer(data, dtype=np.uint8, count=(n + 7) // 8)
    return np.unpackbits(raw, bitorder="little")[:n].astype(bool)

"""Unit tests for every encode/decode kernel (SURVEY.md §5.3 plan, layer 1)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from webcodec.kernels import bitpack, bss, delta, deltalength, dictionary, fsst, plain, prefix, rle
from webcodec.kernels.varint import read_uvarint, unzigzag64, write_uvarint, zigzag64

RNG = np.random.default_rng(42)


# ---------- varint / zigzag ----------


@pytest.mark.parametrize("x", [0, 1, 127, 128, 300, 2**32, 2**63, 2**64 - 1])
def test_uvarint_roundtrip(x):
    v, pos = read_uvarint(write_uvarint(x), 0)
    assert v == x and pos == len(write_uvarint(x))


def test_zigzag_roundtrip():
    v = np.array([0, -1, 1, -2, 2, np.iinfo(np.int64).min, np.iinfo(np.int64).max], np.int64)
    assert (unzigzag64(zigzag64(v)) == v).all()


# ---------- bitpack ----------


@pytest.mark.parametrize("width", [0, 1, 2, 3, 7, 8, 13, 31, 32, 33, 63, 64])
@pytest.mark.parametrize("n", [0, 1, 7, 8, 9, 100])
def test_bitpack_roundtrip(width, n):
    hi = (1 << width) if width < 64 else (1 << 64)
    v = RNG.integers(0, min(hi, 2**63), size=n).astype(np.uint64)
    if width == 64 and n:
        v[0] = 2**64 - 1
    if width == 0:
        v[:] = 0
    out = bitpack.unpack(bitpack.pack(v, width), width, n)
    assert (out == v).all()


def test_bit_length():
    v = np.array([0, 1, 2, 3, 4, 255, 256, 2**63, 2**64 - 1], np.uint64)
    expect = np.array([0, 1, 2, 2, 3, 8, 9, 64, 64])
    assert (bitpack.bit_length(v) == expect).all()


def test_bools():
    for n in (0, 1, 8, 9, 1000):
        m = RNG.random(n) > 0.5
        assert (bitpack.unpack_bools(bitpack.pack_bools(m), n) == m).all()


# ---------- RLE hybrid ----------


@pytest.mark.parametrize(
    "values",
    [
        np.zeros(100, np.uint64),
        np.ones(100, np.uint64),
        np.arange(100, dtype=np.uint64) % 2,
        np.repeat(np.arange(10, dtype=np.uint64), 50),
        RNG.integers(0, 7, 1000).astype(np.uint64),
        np.array([], np.uint64),
        np.array([5], np.uint64),
        np.concatenate([np.full(20, 3, np.uint64), np.arange(5, dtype=np.uint64), np.full(100, 9, np.uint64)]),
    ],
)
def test_rle_roundtrip(values):
    width = bitpack.max_bit_width(values)
    enc = rle.encode(values, width)
    out = rle.decode(enc, width, len(values))
    assert (out == values).all()


def test_rle_compresses_runs():
    v = np.full(10_000, 7, np.uint64)
    assert len(rle.encode(v, 3)) < 10


def test_validity():
    m = RNG.random(5000) > 0.1
    assert (rle.decode_validity(rle.encode_validity(m), len(m)) == m).all()


# ---------- plain ----------


@pytest.mark.parametrize("dtype", [np.int32, np.int64, np.float32, np.float64])
def test_plain_fixed(dtype):
    v = RNG.integers(-1000, 1000, 500).astype(dtype)
    out = plain.decode_fixed(plain.encode_fixed(v), np.dtype(dtype), len(v))
    assert (out == v).all()


def test_plain_binary_roundtrip():
    vals = [b"", b"a", b"hello world", bytes(100), b"\xff" * 7]
    arr = pa.array(vals, type=pa.binary())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=len(vals) + 1)
    data = arr.buffers()[2] or b""
    enc = plain.encode_binary(offsets, data)
    out = plain.decode_binary(enc, len(vals))
    assert out.to_pylist() == vals


# ---------- BSS ----------


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int32, np.int64])
def test_bss_roundtrip(dtype):
    v = RNG.standard_normal(333).astype(dtype)
    out = bss.decode(bss.encode(v), np.dtype(dtype), len(v))
    assert (out == v).all()


# ---------- delta (FOR + delta + bitpack) ----------


@pytest.mark.parametrize(
    "v",
    [
        np.array([], np.int64),
        np.array([42], np.int64),
        np.arange(1000, dtype=np.int64),
        np.arange(1000, dtype=np.int64)[::-1].copy(),
        np.full(500, -7, np.int64),
        RNG.integers(-(2**62), 2**62, 10_000).astype(np.int64),
        np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max, 0, -1], np.int64),
        1_700_000_000_000_000 + np.sort(RNG.integers(0, 10**12, 2_000)),
        np.array([2**k - 1 for k in range(63)] + [-(2**k) for k in range(63)], np.int64),
    ],
)
def test_delta_roundtrip(v):
    out = delta.decode(delta.encode(v), len(v))
    assert (out == v).all()


def test_delta_sorted_is_small():
    v = np.arange(100_000, dtype=np.int64)  # constant delta 1 -> ~0 bits/value
    assert len(delta.encode(v)) < 5_000


# ---------- delta-length / prefix over string arrays ----------


def _str_parts(values: list) -> tuple[np.ndarray, bytes]:
    arr = pa.array(values, type=pa.string())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=len(values) + 1)
    data = bytes(arr.buffers()[2] or b"")
    return offsets.astype(np.int64), data


STRING_CASES = [
    [],
    [""],
    ["a"],
    ["hello", "hello", "help", "he", "x", ""],
    [f"https://site{i%5:03d}.com/path/{i%97}/page{i}.html" for i in range(500)],
    sorted(f"https://site{i%5:03d}.com/path/{i%97}/page{i}.html" for i in range(500)),
    ["中文", "中文内容", "русский", "", "a" * 300],
]


@pytest.mark.parametrize("values", STRING_CASES)
def test_deltalength_roundtrip(values):
    offsets, data = _str_parts(values)
    out = deltalength.decode(deltalength.encode(offsets, data), len(values), pa.string())
    assert out.to_pylist() == values


@pytest.mark.parametrize("values", STRING_CASES)
def test_prefix_roundtrip(values):
    offsets, data = _str_parts(values)
    out = prefix.decode(prefix.encode(offsets, data), len(values), pa.string())
    assert out.to_pylist() == values


def test_prefix_sorted_urls_beat_plain():
    values = sorted(f"https://site{i%5:03d}.com/path/{i%97}/page{i}.html" for i in range(2000))
    offsets, data = _str_parts(values)
    assert len(prefix.encode(offsets, data)) < 0.45 * len(data)


def test_prefix_matrix_vs_sequential():
    values = sorted(f"https://site{i%3}.com/p{i}" for i in range(200))
    offsets, data = _str_parts(values)
    enc = prefix.encode(offsets, data)
    fast = prefix.decode(enc, len(values), pa.string())
    import webcodec.kernels.prefix as P

    cap = P._MATRIX_BYTE_CAP
    P._MATRIX_BYTE_CAP = 0  # force sequential fallback
    try:
        slow = prefix.decode(enc, len(values), pa.string())
    finally:
        P._MATRIX_BYTE_CAP = cap
    assert fast.to_pylist() == slow.to_pylist() == values


# ---------- dictionary ----------


def test_dictionary_roundtrip():
    vals = ["en"] * 50 + ["de"] * 20 + ["fr", "en", "zh"] * 10
    arr = pa.array(vals, type=pa.string())
    dict_vals, idx = dictionary.build(arr)
    enc = dictionary.encode_indices(idx, len(dict_vals))
    out_idx = dictionary.decode_indices(enc, len(vals))
    assert (out_idx == idx).all()
    assert dictionary.take(dict_vals, out_idx).to_pylist() == vals


def test_dictionary_first_occurrence_order():
    arr = pa.array(["b", "a", "b", "c"])
    dict_vals, _ = dictionary.build(arr)
    assert dict_vals.to_pylist() == ["b", "a", "c"]


# ---------- FSST ----------


@pytest.mark.parametrize(
    "data",
    [
        b"",
        b"a",
        b"hello hello hello world world",
        b"the quick brown fox " * 200,
        bytes(range(256)) * 4,
        b"\xff\xff\xff\xff",
        "中文内容русский".encode() * 50,
        b"x" * 10_000,
    ],
)
def test_fsst_roundtrip(data):
    table = fsst.build_table(data[:4096])
    enc = fsst.encode(data, table)
    assert fsst.decode(enc, table) == data


def test_fsst_compress_blob():
    data = b"the quick brown fox jumps over the lazy dog " * 500
    blob = fsst.compress(data)
    assert fsst.decompress(blob) == data
    assert len(blob) < 0.5 * len(data)


def test_fsst_random_bytes_roundtrip():
    data = RNG.bytes(5000)
    table = fsst.build_table(data[:4096])
    assert fsst.decode(fsst.encode(data, table), table) == data


def test_legacy_bitpacked_spec_vector():
    """A4: the parquet-format Encodings.md worked example — values 0..7 at
    width 3 pack (MSB-first) to 00000101 00111001 01110111."""
    import numpy as np

    from webcodec.kernels import bitpack

    v = np.arange(8, dtype=np.uint64)
    packed = bitpack.pack_legacy(v, 3)
    assert packed == bytes([0b00000101, 0b00111001, 0b01110111])
    assert (bitpack.unpack_legacy(packed, 3, 8) == v).all()


def test_legacy_bitpacked_roundtrip_widths():
    import numpy as np

    from webcodec.kernels import bitpack

    rng = np.random.default_rng(11)
    for w in (1, 2, 3, 5, 7, 8, 12, 16, 24, 33, 64):
        hi = (1 << w) - 1
        v = rng.integers(0, hi, size=257, dtype=np.uint64) if w < 64 else rng.integers(0, 2**63, size=257, dtype=np.uint64)
        assert (bitpack.unpack_legacy(bitpack.pack_legacy(v, w), w, len(v)) == v).all()

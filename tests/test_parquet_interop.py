"""Differential format-parity tests (SURVEY.md §7.2 item 2): decode REAL
pyarrow-written parquet pages with webcodec kernels only and compare value
for value against the reference reader. Proves the spec RLE/bit-pack/level
machinery matches reference semantics beyond self-round-trip."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webcodec.parquet_interop import read_column_chunk


def _roundtrip_column(tmp_path, table: pa.Table, col: int, **write_kw):
    path = str(tmp_path / "t.parquet")
    pq.write_table(table, path, data_page_version="1.0", **write_kw)
    want = table.column(col).to_pylist()
    got = read_column_chunk(path, 0, col)
    assert len(got) == len(want)
    return got, want


@pytest.mark.parametrize("codec", ["none", "snappy", "zstd", "gzip"])
def test_dictionary_string_column(tmp_path, codec):
    langs = [["en", "de", "fr", None][i % 4] for i in range(5_000)]
    t = pa.table({"lang": pa.array(langs)})
    got, want = _roundtrip_column(tmp_path, t, 0, compression=codec)
    got = [v.decode() if isinstance(v, bytes) else v for v in got]
    assert got == want


def test_plain_int64_and_double(tmp_path):
    rng = np.random.default_rng(5)
    t = pa.table(
        {
            "i": pa.array(rng.integers(-(2**40), 2**40, 4_000), pa.int64()),
            "d": pa.array(rng.standard_normal(4_000), pa.float64()),
        }
    )
    for col in (0, 1):
        got, want = _roundtrip_column(
            tmp_path, t, col, compression="zstd", use_dictionary=False
        )
        assert got == want


def test_nullable_int_with_levels(tmp_path):
    vals = [None if i % 7 == 0 else i * 3 for i in range(6_000)]
    t = pa.table({"x": pa.array(vals, pa.int64())})
    got, want = _roundtrip_column(tmp_path, t, 0, compression="snappy")
    assert got == want


def test_multi_page_dictionary_int(tmp_path):
    # small page size forces several data pages -> several RLE streams
    vals = [i % 37 for i in range(50_000)]
    t = pa.table({"k": pa.array(vals, pa.int32())})
    got, want = _roundtrip_column(
        tmp_path, t, 0, compression="zstd", data_page_size=4096
    )
    assert got == want


def test_all_null_column(tmp_path):
    t = pa.table({"x": pa.array([None] * 1_000, pa.int64())})
    got, want = _roundtrip_column(tmp_path, t, 0)
    assert got == want


def test_mostly_null_string(tmp_path):
    vals = [None] * 900 + ["tail"] * 100
    t = pa.table({"s": pa.array(vals, pa.string())})
    got, want = _roundtrip_column(tmp_path, t, 0, compression="zstd")
    got = [v.decode() if isinstance(v, bytes) else v for v in got]
    assert got == want


@pytest.mark.parametrize("codec", ["none", "zstd", "snappy"])
def test_v2_pages_dictionary_and_nulls(tmp_path, codec):
    """Format v2 data pages: uncompressed level region + header lengths."""
    vals = [None if i % 9 == 0 else ["a", "bb", "ccc"][i % 3] for i in range(8_000)]
    t = pa.table({"s": pa.array(vals, pa.string()),
                  "n": pa.array([None if i % 5 == 0 else i for i in range(8_000)], pa.int64())})
    path = str(tmp_path / "v2.parquet")
    pq.write_table(t, path, data_page_version="2.0", compression=codec,
                   data_page_size=4096)
    for col in (0, 1):
        got = read_column_chunk(path, 0, col)
        want = t.column(col).to_pylist()
        got = [v.decode() if isinstance(v, bytes) else v for v in got]
        assert got == want


def test_v2_pages_plain(tmp_path):
    t = pa.table({"d": pa.array(np.random.default_rng(2).standard_normal(3_000))})
    path = str(tmp_path / "v2p.parquet")
    pq.write_table(t, path, data_page_version="2.0", use_dictionary=False,
                   compression="zstd")
    assert read_column_chunk(path, 0, 0) == t.column(0).to_pylist()


# ---------------- spec DELTA / BYTE_STREAM_SPLIT encodings ----------------
# pyarrow's writer emits these via column_encoding= (dictionary off). Decoding
# them with webcodec's delta/bss kernels differential-tests the kernel family
# against arrow-C++'s independent implementation of the same spec.


def _encoded_roundtrip(tmp_path, arr: pa.Array, encoding: str, *,
                       page_version="1.0", codec="zstd", page_size=None):
    t = pa.table({"c": arr})
    path = str(tmp_path / "enc.parquet")
    kw = {"data_page_size": page_size} if page_size else {}
    pq.write_table(t, path, data_page_version=page_version, compression=codec,
                   use_dictionary=False, column_encoding={"c": encoding}, **kw)
    # prove the writer actually used the requested encoding
    encs = pq.ParquetFile(path).metadata.row_group(0).column(0).encodings
    assert encoding in encs, encs
    got = read_column_chunk(path, 0, 0)
    want = t.column(0).to_pylist()
    assert len(got) == len(want)
    return got, want


@pytest.mark.parametrize("page_version", ["1.0", "2.0"])
@pytest.mark.parametrize("dtype", [pa.int32(), pa.int64()])
def test_delta_binary_packed_ints(tmp_path, page_version, dtype):
    rng = np.random.default_rng(7)
    lim = 2**30 if dtype == pa.int32() else 2**55
    vals = np.cumsum(rng.integers(-1000, 1000, 20_000)) % lim
    got, want = _encoded_roundtrip(
        tmp_path, pa.array(vals, dtype), "DELTA_BINARY_PACKED",
        page_version=page_version)
    assert got == want


def test_delta_binary_packed_nullable_multipage(tmp_path):
    vals = [None if i % 11 == 0 else i * 97 - 3_000_000 for i in range(60_000)]
    got, want = _encoded_roundtrip(
        tmp_path, pa.array(vals, pa.int64()), "DELTA_BINARY_PACKED",
        page_size=4096)
    assert got == want


@pytest.mark.parametrize("page_version", ["1.0", "2.0"])
def test_delta_length_byte_array(tmp_path, page_version):
    vals = [None if i % 13 == 0 else f"url-{i % 997}/{'x' * (i % 23)}"
            for i in range(15_000)]
    got, want = _encoded_roundtrip(
        tmp_path, pa.array(vals, pa.string()), "DELTA_LENGTH_BYTE_ARRAY",
        page_version=page_version)
    got = [v.decode() if isinstance(v, bytes) else v for v in got]
    assert got == want


@pytest.mark.parametrize("page_version", ["1.0", "2.0"])
def test_delta_byte_array_prefix(tmp_path, page_version):
    # sorted URLs share prefixes -> real prefix lengths in the stream
    vals = sorted(f"https://site-{i % 50}.example/path/{i:07d}"
                  for i in range(12_000))
    vals = [None if i % 17 == 0 else v for i, v in enumerate(vals)]
    got, want = _encoded_roundtrip(
        tmp_path, pa.array(vals, pa.string()), "DELTA_BYTE_ARRAY",
        page_version=page_version, page_size=8192)
    got = [v.decode() if isinstance(v, bytes) else v for v in got]
    assert got == want


@pytest.mark.parametrize("dtype,lim", [(pa.float32(), None), (pa.float64(), None),
                                       (pa.int32(), 2**31), (pa.int64(), 2**62)])
def test_byte_stream_split(tmp_path, dtype, lim):
    rng = np.random.default_rng(11)
    if lim is None:
        arr = pa.array(rng.standard_normal(9_000), dtype)
    else:
        arr = pa.array(rng.integers(-lim, lim, 9_000), dtype)
    got, want = _encoded_roundtrip(tmp_path, arr, "BYTE_STREAM_SPLIT")
    assert got == want

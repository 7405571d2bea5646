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

"""Split-block bloom filter tests (C8 build/check + D2 bloom-level pruning)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from webcodec import filefmt
from webcodec.config import EncoderConfig
from webcodec.fixtures import webpages
from webcodec.kernels import bloom


def _hashes(values: list[bytes]) -> np.ndarray:
    offsets = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum([len(v) for v in values], out=offsets[1:])
    data = np.frombuffer(b"".join(values), dtype=np.uint8)
    return bloom.hash_values(offsets, data)


def test_bloom_no_false_negatives_and_low_fpp():
    values = [f"key-{i:06d}".encode() for i in range(5_000)]
    hs = np.unique(_hashes(values))
    fb = bloom.build(hs, fpp=0.01)
    for v in values[::97]:
        assert bloom.might_contain(fb, bloom.hash_one(v))
    fp = sum(
        bloom.might_contain(fb, bloom.hash_one(f"absent-{i}".encode())) for i in range(2_000)
    )
    assert fp / 2_000 < 0.05  # ~1% design point, generous bound


def test_hash_values_matches_hash_one():
    values = [b"", b"a", b"hello world", b"x" * 100, "ünïcode".encode()]
    hs = _hashes(values)
    for v, h in zip(values, hs):
        assert bloom.hash_one(v) == h


def test_file_level_bloom_pruning(tmp_path):
    t = webpages(3_000)
    path = str(tmp_path / "t.wcd")
    footer = filefmt.write_table(t, path, EncoderConfig())
    by_name = {c["name"]: c for c in footer["chunks"]}
    assert by_name["lang"].get("bloom") is not None
    assert by_name["url"].get("bloom") is not None
    assert by_name["text"].get("bloom") is None  # too long, equality never used

    # absent value: bloom prunes every page -> zero decode
    got = filefmt.read_table(path, columns=["lang", "url"], predicate=("lang", "==", "xx"))
    assert got.num_rows == 0
    assert got.column_names == ["lang", "url"]

    # present value: exact result
    import pyarrow.compute as pc

    got = filefmt.read_table(path, columns=["lang"], predicate=("lang", "==", "de"))
    want = t.filter(pc.equal(t.column("lang"), "de"))
    assert got.num_rows == want.num_rows


def test_bloom_disabled(tmp_path):
    t = webpages(500)
    path = str(tmp_path / "t.wcd")
    footer = filefmt.write_table(t, path, EncoderConfig(bloom_filter_enabled=False))
    assert all(c.get("bloom") is None for c in footer["chunks"])

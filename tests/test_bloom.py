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


def test_bloom_sizing_adapts_to_ndv():
    """B4 parity note (SURVEY bloomFilterNDVs / AdaptiveBlockSplitBloomFilter):
    our build sees the EXACT distinct-hash set up front, so the filter is
    sized from true NDV at the configured fpp, capped at 1 MiB — low-NDV
    chunks get small filters, huge-NDV chunks saturate the cap."""
    import numpy as np

    from webcodec.kernels import bloom

    small = bloom.build(np.arange(100, dtype=np.uint64) * 0x9E3779B97F4A7C15,
                        fpp=0.01)
    large = bloom.build(np.arange(100_000, dtype=np.uint64) * 0x9E3779B97F4A7C15,
                        fpp=0.01)
    huge = bloom.build(np.arange(2_000_000, dtype=np.uint64) * 0x9E3779B97F4A7C15,
                       fpp=0.01, max_bytes=1 << 20)
    assert len(small) < len(large) <= 1 << 20
    assert len(huge) == 1 << 20  # cap saturates
    # ~9.6 bits/value at fpp=0.01 -> 100k values ~ 120KB, within 2x
    assert (100_000 * 9.6 / 8) / 2 < len(large) < (100_000 * 9.6 / 8) * 2


def test_bloom_fpp_measured():
    """Measured false-positive rate lands near the configured 1%."""
    import numpy as np

    from webcodec.kernels import bloom

    rng = np.random.default_rng(11)
    members = rng.integers(0, 1 << 63, 50_000, dtype=np.uint64)
    f = bloom.build(np.unique(members), fpp=0.01)
    words = np.frombuffer(f, dtype=np.uint32).reshape(-1, 8)
    probes = rng.integers(0, 1 << 63, 20_000, dtype=np.uint64)
    probes = np.setdiff1d(probes, members)
    hits = sum(bloom.might_contain(f, h) for h in probes[:2_000])
    assert hits / 2_000 < 0.03  # 1% target, 3x slack for variance

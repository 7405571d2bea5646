"""Whole-FILE differential fuzz: random tables x random encoder configs
(codecs, page sizes, dictionary/FSST toggles, encryption) through
write_table/write_batches, read back fully, projected, and predicated —
every result compared against Arrow ground truth. Complements the
kernel-level hypothesis suite (tests/test_property.py): this exercises the
cross-product of file-format features the unit tests cover one at a time."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from webcodec import filefmt, predicate as predmod
from webcodec.config import EncoderConfig

KEY = bytes(range(16, 48))


def _cc(a):
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def _rand_column(pyrng, rng, n, kind):
    null_p = pyrng.choice([0.0, 0.0, 0.1, 0.6])

    def mask(vals):
        return [None if pyrng.random() < null_p else v for v in vals]

    if kind == "int":
        return pa.array(mask(rng.integers(-(2**50), 2**50, n).tolist()), pa.int64())
    if kind == "small_int":
        return pa.array(mask((rng.integers(0, 50, n)).tolist()), pa.int64())
    if kind == "monotone":
        return pa.array(mask(np.cumsum(rng.integers(0, 9, n)).tolist()), pa.int64())
    if kind == "float":
        return pa.array(mask(rng.standard_normal(n).tolist()), pa.float64())
    if kind == "string":
        words = ["alpha", "beta", "", "x" * 40, "gamma-delta"]
        return pa.array(mask([pyrng.choice(words) + str(i % 7) for i in range(n)]),
                        pa.string())
    if kind == "url":
        return pa.array(mask(sorted(
            f"https://s{i % 9}.example/p/{rng.integers(0, 10**6)}" for i in range(n))),
            pa.string())
    if kind == "binary":
        return pa.array(
            mask([bytes(rng.integers(0, 256, i % 23, dtype=np.uint8)) for i in range(n)]),
            pa.binary())
    if kind == "ts":
        return pa.array(mask((1_700_000_000_000_000 +
                              rng.integers(0, 10**12, n)).tolist()), pa.timestamp("us"))
    if kind == "bool":
        return pa.array(mask((rng.random(n) < 0.5).tolist()), pa.bool_())
    if kind == "list_int":
        return pa.array(mask([rng.integers(0, 99, i % 5).tolist() for i in range(n)]),
                        pa.list_(pa.int64()))
    if kind == "struct":
        return pa.array(
            mask([{"a": int(i), "b": f"s{i % 11}"} for i in range(n)]),
            pa.struct([("a", pa.int64()), ("b", pa.string())]))
    if kind == "fsb":
        return pa.array(
            mask([bytes(rng.integers(0, 256, 16, dtype=np.uint8)) for _ in range(n)]),
            pa.binary(16))
    if kind == "large_list":
        return pa.array(mask([rng.integers(0, 99, i % 4).tolist() for i in range(n)]),
                        pa.large_list(pa.int64()))
    if kind == "fsl":
        return pa.array(mask([rng.standard_normal(3).astype(np.float32).tolist()
                              for _ in range(n)]),
                        pa.list_(pa.float32(), 3))
    if kind == "list_decimal":
        import decimal as _d
        return pa.array(
            mask([[None if pyrng.random() < 0.2 else
                   _d.Decimal(int(rng.integers(-10**10, 10**10))).scaleb(-2)
                   for _ in range(i % 4)] for i in range(n)]),
            pa.list_(pa.decimal128(14, 2)))
    if kind == "time":
        unit_t = pyrng.choice([pa.time32("s"), pa.time32("ms"),
                               pa.time64("us"), pa.time64("ns")])
        per_day = {"s": 86_400, "ms": 86_400_000,
                   "us": 86_400_000_000, "ns": 86_400_000_000_000}[unit_t.unit]
        return pa.array(mask(rng.integers(0, per_day, n).tolist()), unit_t)
    if kind == "duration":
        return pa.array(mask(rng.integers(-(2**40), 2**40, n).tolist()),
                        pa.duration(pyrng.choice(["s", "ms", "us", "ns"])))
    if kind == "uint64":
        # straddle the sign boundary: bit-reinterpret storage must not
        # value-shift, and unsigned stats must not mis-order
        vals = (rng.integers(-(2**62), 2**62, n) + 2**63).astype("uint64")
        return pa.array(mask(vals.tolist()), pa.uint64())
    raise AssertionError(kind)


_KINDS = ["int", "small_int", "monotone", "float", "string", "url", "binary",
          "ts", "bool", "list_int", "struct", "fsb", "large_list", "fsl",
          "list_decimal", "time", "duration", "uint64"]


def _rand_config(pyrng) -> EncoderConfig:
    kw = {
        "compression": pyrng.choice(["zstd", "lz4", "snappy", "gzip", "none"]),
        "use_dictionary": pyrng.choice([True, False]),
        "use_fsst": pyrng.choice([True, False]),
        "data_page_size": pyrng.choice([1 << 12, 1 << 16, 1 << 20]),
        "page_row_count_limit": pyrng.choice([64, 1000, 20_000]),
        "write_page_checksum": pyrng.choice([True, False]),
    }
    if pyrng.random() < 0.4:
        kw["encryption_key"] = KEY
    return EncoderConfig(**kw)


@pytest.mark.parametrize("trial", range(36))
def test_file_roundtrip_fuzz(tmp_path, trial):
    pyrng = random.Random(1000 + trial)
    rng = np.random.default_rng(1000 + trial)
    n = pyrng.choice([0, 1, 7, 300, 2_500])
    kinds = pyrng.sample(_KINDS, pyrng.randint(1, 5))
    t = pa.table({f"c{j}_{k}": _rand_column(pyrng, rng, n, k)
                  for j, k in enumerate(kinds)})
    cfg = _rand_config(pyrng)
    key = cfg.encryption_key
    path = str(tmp_path / "f.wcd")

    if pyrng.random() < 0.5 or n == 0:
        filefmt.write_table(t, path, cfg)
    else:
        footer = filefmt.write_batches(
            iter(t.to_batches(max_chunksize=max(n // pyrng.randint(1, 5), 1))),
            path, cfg, group_target_bytes=pyrng.choice([1 << 12, 1 << 24]))
        assert footer is not None

    # full read-back must be value-identical
    back = filefmt.read_table(path, encryption_key=key)
    assert back.num_rows == t.num_rows
    for c in t.column_names:
        assert _cc(back.column(c)).equals(_cc(t.column(c))), (trial, c)

    if n == 0:
        return
    # random projection
    proj = pyrng.sample(t.column_names, pyrng.randint(1, len(t.column_names)))
    got = filefmt.read_table(path, columns=proj, encryption_key=key)
    assert got.column_names == proj

    # random predicate over a flat comparable column -> exact filter parity
    flat = [c for c in t.column_names
            if not ("list" in c or "struct" in c or "bool" in c or "fsl" in c)]
    if not flat:
        return
    col = pyrng.choice(flat)
    arr = _cc(t.column(col))
    valid = arr.drop_null()
    if len(valid) == 0:
        op, val = "isnull", None
    else:
        pick = valid[pyrng.randrange(len(valid))].as_py()
        op = pyrng.choice(["==", ">=", "<", "isnull", "notnull"])
        val = pick
    sel = filefmt.read_table(path, columns=[col], predicate=(col, op, val),
                             encryption_key=key)
    mask = predmod._term_mask(arr, op, val)
    want = arr.filter(pc.fill_null(mask, False))
    assert sel.num_rows == len(want), (trial, col, op)
    assert _cc(sel.column(col)).equals(_cc(want))

"""Forced-encoding x type x null-pattern round-trip matrix.

The auto-selector normally picks per-column encodings from stats, which
means rare (encoding, type) pairs may never be exercised by the e2e suite.
This matrix FORCES each legal pair via the per-column override (B6 surface)
and round-trips three null patterns — none, sparse, dense — plus an
all-null page. Any combination that encodes must decode bit-identically.
"""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa
import pytest

from webcodec import filefmt
from webcodec.config import EncoderConfig

_RNG = np.random.default_rng(17)
N = 3_000


def _nullify(arr: pa.Array, pattern: str) -> pa.Array:
    if pattern == "none":
        return arr
    if pattern == "sparse":
        mask = _RNG.random(len(arr)) < 0.05
    elif pattern == "dense":
        mask = _RNG.random(len(arr)) < 0.6
    else:  # leading all-null page
        mask = np.zeros(len(arr), dtype=bool)
        mask[:600] = True
    vals = arr.to_pylist()
    return pa.array(
        [None if m else v for v, m in zip(vals, mask)], type=arr.type
    )


def _columns() -> dict[str, pa.Array]:
    ts = pa.array(
        (1_700_000_000_000_000 + np.sort(_RNG.integers(0, 10**12, N))).tolist(),
        pa.timestamp("us"),
    )
    return {
        "i32": pa.array(_RNG.integers(-(2**28), 2**28, N), pa.int32()),
        "i64": pa.array(_RNG.integers(-(2**60), 2**60, N), pa.int64()),
        "f32": pa.array(_RNG.standard_normal(N).astype(np.float32), pa.float32()),
        "f64": pa.array(_RNG.standard_normal(N), pa.float64()),
        "ts": ts,
        "date": pa.array(_RNG.integers(10_000, 20_000, N).tolist(), pa.date32()),
        "b": pa.array((_RNG.random(N) < 0.5).tolist(), pa.bool_()),
        "s_lowcard": pa.array([f"v{i % 7}" for i in range(N)]),
        "s_sorted": pa.array(sorted(f"https://site{i % 40:03d}.com/p{i}" for i in range(N))),
        "s_text": pa.array(
            [" ".join(_RNG.choice(["the", "fox", "jumps", "web", "data"], 12)) for _ in range(N)]
        ),
        "bin": pa.array([bytes(_RNG.integers(0, 256, i % 40, dtype=np.uint8)) for i in range(N)], pa.binary()),
    }


_LEGAL = {
    "plain": ["i32", "i64", "f32", "f64", "ts", "date", "b", "s_lowcard", "s_text", "bin"],
    "rle": ["i32", "i64", "b", "date"],
    "dict": ["i32", "i64", "f64", "s_lowcard", "s_sorted", "bin", "date"],
    "delta_binary_packed": ["i32", "i64", "ts", "date"],
    "delta_length": ["s_lowcard", "s_sorted", "s_text", "bin"],
    "delta_byte_array": ["s_lowcard", "s_sorted", "s_text", "bin"],
    "byte_stream_split": ["f32", "f64", "i32", "i64", "ts"],
    "fsst": ["s_text", "s_sorted", "bin"],
}


@pytest.mark.parametrize("encoding", sorted(_LEGAL))
@pytest.mark.parametrize("pattern", ["none", "sparse", "dense", "leading_page"])
def test_forced_encoding_roundtrip(encoding, pattern):
    cols = _columns()
    names = _LEGAL[encoding]
    t = pa.table({n: _nullify(cols[n], pattern) for n in names})
    cfg = EncoderConfig(
        column_encoding={n: encoding for n in names},
        page_row_count_limit=512,
    )
    buf = io.BytesIO()
    filefmt.write_table(t, buf, cfg)
    got = filefmt.read_table(buf.getvalue())
    for n in names:
        assert got.column(n).combine_chunks().equals(
            t.column(n).combine_chunks()
        ), f"{encoding}/{n}/{pattern}"


@pytest.mark.parametrize(
    "child_type,gen",
    [
        (pa.int64(), lambda rng, k: rng.integers(-(2**50), 2**50, k).tolist()),
        (pa.int32(), lambda rng, k: rng.integers(-(2**28), 2**28, k).tolist()),
        (pa.float64(), lambda rng, k: rng.standard_normal(k).tolist()),
        (pa.string(), lambda rng, k: [f"s{int(x)}" for x in rng.integers(0, 50, k)]),
        (pa.binary(), lambda rng, k: [bytes([int(x)] * (int(x) % 9)) for x in rng.integers(0, 200, k)]),
        (pa.bool_(), lambda rng, k: (rng.random(k) < 0.5).tolist()),
    ],
    ids=["i64", "i32", "f64", "str", "bin", "bool"],
)
@pytest.mark.parametrize("nulls", ["none", "outer", "inner", "both"])
def test_generic_list_roundtrip(child_type, gen, nulls):
    """Generic one-level list<primitive>: lengths FOR+delta + child validity
    + child values in the child's fallback encoding; outer/inner nulls."""
    rng = np.random.default_rng(23)
    rows = []
    for i in range(800):
        if nulls in ("outer", "both") and i % 11 == 0:
            rows.append(None)
            continue
        vals = gen(rng, int(rng.integers(0, 6)))
        if nulls in ("inner", "both"):
            vals = [None if rng.random() < 0.2 else v for v in vals]
        rows.append(vals)
    t = pa.table({"L": pa.array(rows, pa.list_(child_type))})
    buf = io.BytesIO()
    filefmt.write_table(t, buf, EncoderConfig(page_row_count_limit=256))
    got = filefmt.read_table(buf.getvalue())
    assert got.column("L").combine_chunks().equals(t.column("L").combine_chunks())


# ----------------------------------------------------------- deep nesting (r3)


def _deep_cases() -> dict[str, pa.Array]:
    """Arbitrary-depth shapes the recursive dispatcher must round-trip,
    with nulls at every level."""
    return {
        "struct_struct": pa.array(
            [{"a": {"x": 1, "y": "p"}, "b": 2}, None, {"a": None, "b": 4},
             {"a": {"x": None, "y": "q"}, "b": None}],
            pa.struct([("a", pa.struct([("x", pa.int64()), ("y", pa.string())])),
                       ("b", pa.int64())]),
        ),
        "list3": pa.array(
            [[[[1, 2], [3]], [[4]]], None, [[[5], None], []], [[]]],
            pa.list_(pa.list_(pa.list_(pa.int64()))),
        ),
        "struct_list_struct": pa.array(
            [{"l": [{"u": "a", "v": 1}, {"u": "b", "v": None}]}, {"l": None},
             None, {"l": []}],
            pa.struct([("l", pa.list_(pa.struct([("u", pa.string()),
                                                 ("v", pa.int64())])))]),
        ),
        "map_struct_val": pa.array(
            [[("k1", {"z": 1})], None, [("k2", {"z": None}), ("k3", {"z": 3})],
             []],
            pa.map_(pa.string(), pa.struct([("z", pa.int64())])),
        ),
        "list_map": pa.array(
            [[[("a", 1)], [("b", 2), ("c", 3)]], None, [[]], [None]],
            pa.list_(pa.map_(pa.string(), pa.int64())),
        ),
        "list_struct_nested": pa.array(
            [[{"s": {"q": 1}, "w": [1, 2]}], None,
             [{"s": None, "w": []}, {"s": {"q": 5}, "w": None}]],
            pa.list_(pa.struct([("s", pa.struct([("q", pa.int64())])),
                                ("w", pa.list_(pa.int64()))])),
        ),
    }


@pytest.mark.parametrize("case", sorted(_deep_cases()), ids=sorted(_deep_cases()))
def test_deep_nested_roundtrip(case):
    arr = _deep_cases()[case]
    t = pa.table({"c": arr, "id": pa.array(range(len(arr)), pa.int64())})
    buf = io.BytesIO()
    filefmt.write_table(t, buf)
    got = filefmt.read_table(buf.getvalue())
    assert got.equals(t)
    # projection + row-range must compose at any depth (aligned chunks)
    sub = filefmt.read_table(buf.getvalue(), columns=["c"], row_range=(1, 3))
    assert sub.column("c").to_pylist() == arr.to_pylist()[1:3]


def test_deep_nested_many_rows_pages():
    """Deep shape across multiple pages (page_row_count_limit forces cuts)."""
    rng = np.random.default_rng(31)
    rows = []
    for i in range(2_000):
        if i % 13 == 0:
            rows.append(None)
        else:
            rows.append({
                "inner": {"lg": f"l{int(rng.integers(0, 5))}",
                          "ln": int(rng.integers(0, 1000))},
                "tok": [[f"w{int(x)}" for x in rng.integers(0, 30, int(rng.integers(0, 4)))]
                        for _ in range(int(rng.integers(0, 3)))],
            })
    typ = pa.struct([
        ("inner", pa.struct([("lg", pa.string()), ("ln", pa.int64())])),
        ("tok", pa.list_(pa.list_(pa.string()))),
    ])
    t = pa.table({"meta": pa.array(rows, typ)})
    buf = io.BytesIO()
    filefmt.write_table(t, buf, EncoderConfig(page_row_count_limit=256))
    got = filefmt.read_table(buf.getvalue())
    assert got.equals(t)


# -------------------------------------------------------------- decimal (r3)


@pytest.mark.parametrize("pattern", ["none", "sparse", "dense", "page"])
def test_decimal128_roundtrip(pattern):
    """decimal128 lanes: small (lo-lane only), full-width 37-digit values
    (hi lane live), negatives, all null patterns."""
    import decimal

    D = decimal.Decimal
    rng = np.random.default_rng(41)
    big = int("9" * 30)
    vals = []
    for i in range(2_000):
        u = int(rng.integers(-(10**9), 10**9))
        if i % 7 == 0:
            u = big + u  # exercise the high lane
        vals.append(D(u).scaleb(-3))
    arr = _nullify(pa.array(vals, pa.decimal128(38, 3)), pattern)
    t = pa.table({"d": arr, "k": pa.array(range(len(arr)), pa.int64())})
    buf = io.BytesIO()
    filefmt.write_table(t, buf, EncoderConfig(page_row_count_limit=256))
    got = filefmt.read_table(buf.getvalue())
    assert got.equals(t)
    sub = filefmt.read_table(buf.getvalue(), columns=["d"], row_range=(100, 900))
    assert sub.column("d").combine_chunks().equals(arr.slice(100, 800))


def test_decimal_inside_struct_roundtrip():
    import decimal

    D = decimal.Decimal
    arr = pa.array(
        [{"d": D("7.1"), "n": 1}, None, {"d": None, "n": 3}],
        pa.struct([("d", pa.decimal128(20, 1)), ("n", pa.int64())]),
    )
    t = pa.table({"s": arr})
    buf = io.BytesIO()
    filefmt.write_table(t, buf)
    assert filefmt.read_table(buf.getvalue()).equals(t)


def test_narrow_types_roundtrip_widened_storage():
    """int8/16, uint8/16/32, float16 store WIDENED (parquet's INT_8-over-
    INT32 stance) and decode back to the exact original type — flat columns,
    nulls, list children, projection."""
    import numpy as np

    t = pa.table({
        "i8": pa.array([1, 2, None, 127, -128] * 200, pa.int8()),
        "i16": pa.array([1, 300, None, -32768, 32767] * 200, pa.int16()),
        "u8": pa.array([0, 255, None, 7, 128] * 200, pa.uint8()),
        "u16": pa.array([0, 65535, None, 7, 9] * 200, pa.uint16()),
        "u32": pa.array([0, 2**32 - 1, None, 7, 9] * 200, pa.uint32()),
        "f16": pa.array(
            np.array([1.5, 0.25, 3.25, -0.0, 100.0] * 200, np.float16),
            pa.float16(),
        ),
        "li8": pa.array([[1, 2], [127], None, [], [-5]] * 200, pa.list_(pa.int8())),
    })
    buf = io.BytesIO()
    filefmt.write_table(t, buf, EncoderConfig(page_row_count_limit=256))
    got = filefmt.read_table(buf.getvalue())
    assert got.equals(t)  # bit-identical incl. the original narrow types
    sub = filefmt.read_table(buf.getvalue(), columns=["f16", "li8"])
    assert sub.column("f16").equals(t.column("f16"))
    assert sub.column("li8").equals(t.column("li8"))

"""list<decimal128> shredding (filefmt._encode_list_decimal_chunks) and its
compositions: map<_, decimal>, list<list<decimal>>, struct<list<decimal>>
all reduce to the same lo/hi-lane chunk layout through the recursive
dispatcher. Reference scope: parquet-java writes DECIMAL leaves at any
nesting depth (SURVEY.md §2 E1); previously this raised a dispatch-time
TypeError.

Also pins the parquet-export FLBA sizing: decimals export at the MINIMAL
byte length for their precision (parquet-java TypeUtil sizing) so DuckDB's
strict nested-list decimal reader accepts the files.
"""

import decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webcodec import filefmt
from webcodec.config import EncoderConfig

D = decimal.Decimal
BIG = D("123456789012345678901234567890123456.78")  # full 38-digit


def _rt(tmp_path, tbl, cfg=None, **read_kw):
    p = str(tmp_path / "t.wcd")
    filefmt.write_table(tbl, p, cfg or EncoderConfig.speed())
    return filefmt.read_table(p, **read_kw)


LIST_DEC_CASES = [
    ("basic", [[D("1.23"), D("-4.56")], None, [], [None, D("7.89")]],
     pa.decimal128(12, 2)),
    ("full_precision", [[BIG, -BIG], [D("0.00")], None], pa.decimal128(38, 2)),
    ("all_null_lists", [None, None], pa.decimal128(5, 1)),
    ("all_empty", [[], [], []], pa.decimal128(9, 4)),
    ("no_nulls", [[D("1.5")], [D("-2.5"), D("3.5")]], pa.decimal128(4, 1)),
]


@pytest.mark.parametrize("name,vals,dt", LIST_DEC_CASES, ids=[c[0] for c in LIST_DEC_CASES])
def test_list_decimal_roundtrip(tmp_path, name, vals, dt):
    t = pa.table({"a": pa.array(vals, pa.list_(dt))})
    assert _rt(tmp_path, t).equals(t)


def test_list_decimal_compositions(tmp_path):
    t = pa.table({
        "m": pa.array([[("x", D("1.500")), ("y", None)], None, []],
                      pa.map_(pa.string(), pa.decimal128(10, 3))),
        "mk": pa.array([[(D("1.0"), "a")], [], None],
                       pa.map_(pa.decimal128(4, 1), pa.string())),
        "ll": pa.array([[[D("1.1")], None, []], None, [[D("2.2"), None]]],
                       pa.list_(pa.list_(pa.decimal128(5, 1)))),
        "sl": pa.array([{"v": [D("3.14")]}, None, {"v": None}],
                       pa.struct([pa.field("v", pa.list_(pa.decimal128(9, 2)))])),
    })
    assert _rt(tmp_path, t).equals(t)


def test_list_decimal_sliced_and_encrypted(tmp_path):
    vals = [[D("1.23")], None, [D("-9.99"), None], [], [D("5.00")]]
    full = pa.table({"a": pa.array(vals, pa.list_(pa.decimal128(12, 2)))})
    sliced = full.slice(1, 3)
    assert _rt(tmp_path, sliced).equals(sliced)
    key = bytes(range(32))
    p = str(tmp_path / "e.wcd")
    filefmt.write_table(full, p, EncoderConfig(encryption_key=key))
    assert filefmt.read_table(p, encryption_key=key).equals(full)


def test_list_decimal_keep_mask_paths(tmp_path):
    vals = [[D(f"{i}.25")] if i % 3 else None for i in range(20)]
    t = pa.table({"id": pa.array(range(20), pa.int64()),
                  "a": pa.array(vals, pa.list_(pa.decimal128(10, 2)))})
    p = str(tmp_path / "k.wcd")
    filefmt.write_table(t, p, EncoderConfig.speed())
    assert filefmt.read_table(p, row_range=(3, 11)).equals(t.slice(3, 8))
    keep_idx = [i for i in range(20) if i not in (0, 7, 19)]
    got = filefmt.read_table(p, drop_rows=np.array([0, 7, 19]))
    assert got.equals(t.take(pa.array(keep_idx)))
    assert filefmt.read_table(p, predicate=("id", ">=", 15)).equals(t.slice(15, 5))


def test_decimal_flba_len_matches_reference():
    """Our precision->FLBA-length table must equal what pyarrow (parquet-c++,
    same sizing as parquet-java TypeUtil) emits for every precision."""
    from webcodec.parquet_writer import _decimal_flba_len

    import io

    for prec in range(1, 39):
        t = pa.table({"d": pa.array([None], pa.decimal128(prec, 0))})
        buf = io.BytesIO()
        pq.write_table(t, buf)
        ref_len = pq.ParquetFile(io.BytesIO(buf.getvalue())).metadata.schema.column(0).length
        assert _decimal_flba_len(prec) == ref_len, prec


def test_list_decimal_export_duckdb_and_pyarrow(tmp_path):
    duckdb = pytest.importorskip("duckdb")
    from webcodec.parquet_writer import write_parquet

    t = pa.table({"a": pa.array([[D("1.23"), None], None, [D("-4.50")]],
                                pa.list_(pa.decimal128(12, 2))),
                  "b": pa.array([BIG, None, -BIG], pa.decimal128(38, 2))})
    p = str(tmp_path / "x.parquet")
    write_parquet(t, p)
    assert pq.read_table(p).equals(t)
    rows = duckdb.execute(f"SELECT * FROM read_parquet('{p}')").fetchall()
    assert rows[0][0] == [D("1.23"), None] and rows[2][1] == -BIG

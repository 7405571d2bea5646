"""ENUM / JSON / BSON logical annotations on parquet export (parquet-format
LogicalTypes.md "semantic" BYTE_ARRAY types; SURVEY.md §1.2 — the last
annotation rows that previously mapped read-side only). The writer stamps
BOTH the legacy ConvertedType (ENUM=4 / JSON=19 / BSON=20) and the modern
LogicalType union member (fields 4 / 12 / 13) like parquet-java; values and
statistics are untouched (all three sort unsigned byte-wise = TYPE_ORDER).

Reference-reader stances, pinned empirically here:
- DuckDB reads ENUM/JSON columns as VARCHAR and its JSON operators work
  directly on a JSON-annotated export; it REJECTS converted type 20 (BSON)
  — a DuckDB limitation that applies equally to parquet-java BSON files.
- pyarrow 16 reads all three as plain binary (values bit-exact); arrow 17+
  and the spec treat ENUM/JSON as UTF-8, which is what our native reader
  returns (string), surfacing the declared annotation in
  ``leaves[i]["annotation"]`` and as ``PARQUET:logical_type`` metadata.
"""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webcodec.parquet_interop import read_footer_native, read_table_arrow_native
from webcodec.parquet_writer import write_parquet


def _table(n=60):
    return pa.table({
        "doc": pa.array(
            [None if i % 9 == 4 else '{"k": %d, "s": "v%d"}' % (i, i)
             for i in range(n)], pa.string()),
        "kind": pa.array(
            [("click", "view", "scroll")[i % 3] for i in range(n)],
            pa.string()),
        "payload": pa.array(
            [None if i % 7 == 2 else bytes([i & 0xFF, (i * 3) & 0xFF])
             for i in range(n)], pa.binary()),
    })


ANN = {"doc": "json", "kind": "enum", "payload": "bson"}


def test_annotations_native_roundtrip(tmp_path):
    t = _table()
    p = str(tmp_path / "a.parquet")
    write_parquet(t, p, annotation_columns=ANN)
    ft = read_footer_native(p)
    assert {l["path"]: l.get("annotation") for l in ft["leaves"]} == {
        "doc": "JSON", "kind": "ENUM", "payload": "BSON"}
    md = {f.name: (f.metadata or {}).get(b"PARQUET:logical_type")
          for f in ft["fields"]}
    assert md == {"doc": b"JSON", "kind": b"ENUM", "payload": b"BSON"}
    # ENUM/JSON come back as text (the spec's UTF-8 stance), BSON as bytes
    types = {f.name: f.type for f in ft["fields"]}
    assert types["doc"] == pa.string() and types["kind"] == pa.string()
    assert types["payload"] == pa.binary()
    back = read_table_arrow_native(p)
    for c in t.column_names:
        assert back.column(c).to_pylist() == t.column(c).to_pylist()


def test_annotations_pyarrow_reads_values(tmp_path):
    """pyarrow 16 maps all three annotations to binary — values bit-exact."""
    t = _table()
    p = str(tmp_path / "a.parquet")
    write_parquet(t, p, annotation_columns=ANN)
    r = pq.read_table(p)
    assert [str(f.type) for f in r.schema] == ["binary"] * 3
    for c in t.column_names:
        assert r.column(c).cast(pa.binary() if c == "payload"
                                else pa.string()).to_pylist() \
            == t.column(c).to_pylist()
    # the annotations landed in the parquet schema itself
    s = str(pq.read_metadata(p).schema)
    assert "(JSON)" in s and "(Enum)" in s and "(BSON)" in s


def test_annotations_duckdb_json_ops(tmp_path):
    """DuckDB treats a JSON-annotated export as queryable JSON and an
    ENUM-annotated column as VARCHAR (BSON is skipped: DuckDB rejects
    converted type 20 from any writer, parquet-java included)."""
    t = _table()
    p = str(tmp_path / "a.parquet")
    write_parquet(t, p, annotation_columns={"doc": "json", "kind": "enum"})
    con = duckdb.connect()
    desc = dict(con.execute(
        f"select column_name, column_type from "
        f"(describe select doc, kind from '{p}')").fetchall())
    assert desc == {"doc": "VARCHAR", "kind": "VARCHAR"}
    got = con.execute(
        f"select max(cast(doc->>'k' as int)) from '{p}'").fetchone()[0]
    assert got == max(i for i in range(60) if i % 9 != 4)


def test_annotation_validation(tmp_path):
    t = _table(8)
    p = str(tmp_path / "bad.parquet")
    with pytest.raises(ValueError, match="unknown annotation"):
        write_parquet(t, p, annotation_columns={"doc": "jsonb"})
    with pytest.raises(TypeError, match="must be binary"):
        write_parquet(t, p, annotation_columns={"doc": "bson"})
    with pytest.raises(TypeError, match="must be string"):
        write_parquet(t, p, annotation_columns={"payload": "json"})
    with pytest.raises(KeyError, match="not in table"):
        write_parquet(t, p, annotation_columns={"nope": "json"})
    # nothing half-written: validation ran before any bytes landed
    assert not (tmp_path / "bad.parquet").exists()


def test_annotations_export_parquet_passthrough(tmp_path, spark):
    """export_parquet threads annotation_columns: .wcd lakehouse table ->
    standard parquet whose JSON column DuckDB queries directly."""
    import glob

    from webcodec.spark.encode_job import encode_table
    from webcodec.spark.maintenance import export_parquet

    t = pa.table({
        "id": pa.array(range(40), pa.int64()),
        "doc": pa.array(['{"n": %d}' % i for i in range(40)], pa.string()),
    })
    src = str(tmp_path / "src.parquet")
    pq.write_table(t, src)
    d = tmp_path / "tbl"
    encode_table(spark.read.parquet(src), str(d), sort_key="id",
                 write_metrics=False)
    out = tmp_path / "pq"
    res = export_parquet(spark, str(d), str(out),
                         annotation_columns={"doc": "json"})
    assert res["rows"] == 40
    files = sorted(glob.glob(str(out / "*.parquet")))
    assert files
    ft = read_footer_native(files[0])
    assert [l.get("annotation") for l in ft["leaves"]
            if l["path"] == "doc"] == ["JSON"]
    total = sum(
        duckdb.execute(
            f"select sum(cast(doc->>'n' as int)) from '{f}'").fetchone()[0]
        for f in files)
    assert total == sum(range(40))

"""SHREDDED parquet VARIANT (VariantShredding.md) read support: Spark 4
writes variant columns shredded BY DEFAULT (``spark.sql.variant.
writeShredding.enabled``), splitting each variant into metadata + residual
value binaries plus a typed_value column subtree — files pyarrow cannot
even parse. The interop reader reassembles the unshredded
``<metadata, value>`` storage pair; every test compares semantics against
Spark's own read of the same file via the PUBLIC pyspark variant codec
(``pyspark.sql.variant_utils.VariantUtils``).

The variant_bin codec itself is differentially pinned against VariantUtils
here too (parse_json -> our walkers, our encoders -> VariantUtils decode).
"""

import decimal
import glob
import json

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.variant_utils import VariantUtils as VU

from webcodec import parquet_interop as pi
from webcodec import variant_bin as vb


def _spark_ref(spark, path, col="v"):
    """id -> python value, via Spark's own variant read (the reference)."""
    rows = spark.read.parquet(path).select("id", F.col(col).alias("v")).collect()
    out = {}
    for r in rows:
        v = r["v"]
        out[r["id"]] = None if v is None else VU.to_python(v.value, v.metadata)
    return out


def _ours(path, col="v"):
    t = pi.read_table_arrow(path)
    parts = col.split(".")
    vals = t.column(parts[0]).to_pylist()
    for p in parts[1:]:
        vals = [None if r is None else r[p] for r in vals]
    out = {}
    for i, sv in zip(t.column("id").to_pylist(), vals):
        out[i] = (None if sv is None
                  else VU.to_python(bytes(sv["value"]), bytes(sv["metadata"])))
    return out


def _write(spark, df, tmp_path, name):
    d = str(tmp_path / name)
    df.coalesce(1).write.mode("overwrite").parquet(d)
    f = glob.glob(d + "/part*.parquet")[0]
    # precondition: the file really is shredded (else this suite tests nothing)
    ft = pi.read_footer_native(f)
    assert ft["variant_shredded"], "expected Spark to shred the variant column"
    # and pyarrow really cannot read it
    with pytest.raises(Exception):
        pq.read_table(f)
    return f


def _check(spark, df, tmp_path, name, col="v"):
    f = _write(spark, df, tmp_path, name)
    ref = _spark_ref(spark, f, col)
    got = _ours(f, col)
    assert got == ref
    return f


def test_object_shredding(spark, tmp_path):
    """Objects with missing fields, extra fields, per-field type conflicts
    (value-only shredding nodes), nested objects and arrays, null rows —
    Spark shreds all of these."""
    rows = [
        '{"a": 1, "b": "x", "c": {"d": 2.5, "e": [1, 2, 3]}, "extra": true}',
        '{"a": -42, "b": "' + "long" * 30 + '", "c": {"d": -0.5, "e": []}}',
        '{"a": 999999999999}',
        '{"b": "only-b", "other": {"deep": [1, {"k": "v"}]}}',
        '{"a": "type-conflict-string", "b": "y"}',
        "null",
        '{"a": 7, "b": null}',
    ]
    df = (spark.createDataFrame([(i, r) for i, r in enumerate(rows)],
                                "id int, js string")
          .select("id", F.parse_json("js").alias("v")))
    _check(spark, df, tmp_path, "obj")


def test_root_kind_conflict_stays_unshredded(spark, tmp_path):
    """Rows conflicting at the ROOT (object vs array vs scalar) make Spark
    write the column UNSHREDDED — the reader must pass the storage pair
    through untouched."""
    rows = ['{"a": 1}', '[1, "two", 3.5, null]', '"bare string"', "null", "7"]
    df = (spark.createDataFrame([(i, r) for i, r in enumerate(rows)],
                                "id int, js string")
          .select("id", F.parse_json("js").alias("v")))
    d = str(tmp_path / "mixedroot")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    f = glob.glob(d + "/part*.parquet")[0]
    assert pi.read_footer_native(f)["variant_shredded"] == []
    assert _ours(f) == _spark_ref(spark, f)


def test_scalar_and_array_shredding(spark, tmp_path):
    df = spark.range(20).select(F.col("id").cast("int").alias("id"),
                                F.parse_json(F.col("id").cast("string"))
                                .alias("v"))
    _check(spark, df, tmp_path, "scalar")
    df = (spark.createDataFrame(
        [(i, json.dumps([i, i + 1, f"s{i}"])) for i in range(20)],
        "id int, js string").select("id", F.parse_json("js").alias("v")))
    _check(spark, df, tmp_path, "arr")


@pytest.mark.parametrize("tag,expr", [
    ("ts_tz", "cast(timestamp'2024-03-01 10:11:12.123456'"
              " + make_interval(0,0,0,0,0,0,id) as variant)"),
    ("ts_ntz", "cast(timestamp_ntz'2024-03-01 10:11:12.5'"
               " + make_interval(0,0,0,0,0,0,id) as variant)"),
    ("date", "cast(date'2020-06-15' + cast(id as int) as variant)"),
    ("dec", "cast(cast(1234.56 + id as decimal(10,2)) as variant)"),
    ("flt", "cast(cast(id as float) / 4 as variant)"),
    ("bin", "cast(encode(cast(id as string), 'utf-8') as variant)"),
])
def test_typed_value_kinds(spark, tmp_path, tag, expr):
    """Scalar typed_value kinds Spark shreds (homogeneous column per file):
    timestamp tz + ntz, date, decimal, float, binary; null rows mixed in."""
    df = spark.sql(f"""
      select cast(id as int) id,
             case when id % 5 = 3 then null else {expr} end v
      from range(15)
    """)
    f = _check(spark, df, tmp_path, tag)
    if tag == "dec":  # sanity: types survived, not stringified
        assert _spark_ref(spark, f)[0] == decimal.Decimal("1234.56")


def test_variant_nested_in_struct(spark, tmp_path):
    df = (spark.createDataFrame([(i, f'{{"n": {i}}}') for i in range(10)],
                                "id int, js string")
          .select("id", F.struct(F.parse_json("js").alias("inner"),
                                 F.lit(1).alias("tag")).alias("s")))
    _check(spark, df, tmp_path, "nested", col="s.inner")


def test_multi_row_group(spark, tmp_path):
    d = str(tmp_path / "multi")
    (spark.range(5000)
     .select(F.col("id").cast("int").alias("id"),
             F.parse_json(F.concat(F.lit('{"k": '), F.col("id").cast("string"),
                                   F.lit("}"))).alias("v"))
     .coalesce(1).write.mode("overwrite")
     .option("parquet.block.size", 64 * 1024).parquet(d))
    f = glob.glob(d + "/part*.parquet")[0]
    ft = pi.read_footer_native(f)
    assert ft["variant_shredded"] == [("v",)]
    ref = _spark_ref(spark, f)
    assert _ours(f) == ref and len(ref) == 5000


def test_metadata_extension_keeps_residual_ids_valid():
    """Appending shredded names to a dictionary must not shift existing ids
    (residual value bytes are spliced verbatim)."""
    value, metadata = VU.parse_json('{"zz": 1, "aa": {"mm": [2, "three"]}}')
    md2, ids = vb.extend_metadata(metadata, ["brand_new", "zz"])
    assert VU.to_python(value, md2) == VU.to_python(value, metadata)
    keys = vb.parse_metadata(md2)
    assert keys[ids["brand_new"]] == "brand_new"
    assert vb.value_extent(value) == len(value)


@pytest.mark.parametrize("js", [
    '{"a": 1, "b": [true, {"c": "d"}], "e": 2.5}',
    '[[1, 2], [3], []]',
    '{"big": ' + json.dumps("x" * 300) + "}",
    '{"neg": -1e-3, "dec": 0.1}',
])
def test_codec_walkers_vs_pyspark(js):
    value, metadata = VU.parse_json(js)
    assert vb.value_extent(value) == len(value)
    if vb.is_object(value):
        keys = vb.parse_metadata(metadata)
        rebuilt = vb.build_object(vb.object_fields(value), lambda i: keys[i])
        assert VU.to_python(rebuilt, metadata) == VU.to_python(value, metadata)

"""Metadata-only column rename/drop (Iceberg ALTER COLUMN analogues).

Rename records renamed_from provenance in the schema; readers resolve the
current name against old files' chunk names through the alias chain and
translate predicates per file. Drop tombstones the name (plus its rename
chain); re-adding a tombstoned name is refused at commit time because old
files would resurrect stale values.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from webcodec.fixtures import webpages
from webcodec.spark.maintenance import drop_column, rename_column
from webcodec.spark.table import SnapshotTable

pytestmark = pytest.mark.spark


def _make_table(spark, tmp_path, rows=1_000):
    from webcodec.spark.datasource import WebcodecDataSource

    spark.dataSource.register(WebcodecDataSource)
    t = webpages(rows)
    src = str(tmp_path / "src.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "t")
    (spark.read.parquet(src).repartition(2)
     .write.format("webcodec").mode("append").option("path", out).save())
    return out, t


def test_rename_end_to_end(spark, tmp_path):
    from webcodec.spark.decode_job import read_encoded

    out, t = _make_table(spark, tmp_path)
    rename_column(out, "lang", "language")
    # DataSource read: new name, original values, filters work on old files
    back = spark.read.format("webcodec").option("path", out).load()
    assert "language" in back.columns and "lang" not in back.columns
    want = {}
    for v in t.column("lang").to_pylist():
        want[v] = want.get(v, 0) + 1
    got = {r["language"]: r["cnt"] for r in
           back.groupBy("language").count().withColumnRenamed("count", "cnt").collect()}
    assert got == want
    # job API with a predicate on the RENAMED column (translated per file)
    sel = read_encoded(spark, out, predicate=("language", "==", "en"))
    assert sel.count() == want.get("en", 0)
    assert set(r["language"] for r in sel.select("language").distinct().collect()) == {"en"}


def test_rename_then_append_and_chain(spark, tmp_path):
    out, t = _make_table(spark, tmp_path, rows=600)
    rename_column(out, "lang", "language")
    # append new data under the new name: mixed old/new files read as one
    back = spark.read.format("webcodec").option("path", out).load()
    back.limit(100).write.format("webcodec").mode("append").option("path", out).save()
    again = spark.read.format("webcodec").option("path", out).load()
    assert again.count() == 700
    assert again.filter("language is null").count() == 0
    # second rename chains provenance: lng resolves lang-era AND language-era files
    rename_column(out, "language", "lng")
    final = spark.read.format("webcodec").option("path", out).load()
    assert final.count() == 700
    assert final.filter("lng is null").count() == 0
    schema = SnapshotTable(out).read_snapshot_meta()["schema"]
    entry = next(f for f in schema if f["name"] == "lng")
    assert entry["renamed_from"] == ["lang", "language"]


def test_rename_validation(spark, tmp_path):
    out, _ = _make_table(spark, tmp_path, rows=200)
    with pytest.raises(ValueError, match="no column"):
        rename_column(out, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(out, "lang", "text")


def test_drop_column_and_tombstone_guard(spark, tmp_path):
    out, t = _make_table(spark, tmp_path, rows=400)
    drop_column(out, "html")
    back = spark.read.format("webcodec").option("path", out).load()
    assert "html" not in back.columns
    assert back.count() == 400
    # re-adding the dropped name is refused (stale chunks would resurrect)
    with pytest.raises(Exception, match="dropped"):
        (spark.read.format("webcodec").option("path", out).load()
         .limit(10).selectExpr("*", "cast('x' as binary) AS html")
         .write.format("webcodec").mode("append").option("path", out).save())
    # renaming onto the tombstoned name is refused too
    with pytest.raises(ValueError, match="dropped"):
        rename_column(out, "text", "html")
    # dropping a renamed column tombstones its whole chain
    rename_column(out, "lang", "language")
    drop_column(out, "language")
    snap = SnapshotTable(out).read_snapshot_meta()
    assert set(snap["dropped_columns"]) >= {"html", "lang", "language"}
    h = SnapshotTable(out).history()
    assert [r["operation"] for r in h].count("schema") == 3


def test_rename_composes_with_deletes(spark, tmp_path):
    from webcodec.spark.maintenance import delete_where

    out, t = _make_table(spark, tmp_path, rows=500)
    n_en = sum(1 for v in t.column("lang").to_pylist() if v == "en")
    rename_column(out, "lang", "language")
    delete_where(spark, out, ("language", "==", "en"))
    back = spark.read.format("webcodec").option("path", out).load()
    assert back.count() == 500 - n_en
    assert back.filter("language = 'en'").count() == 0

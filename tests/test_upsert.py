"""Atomic MERGE by key (upsert): positional-delete sidecars for superseded
rows + new data files, committed as ONE snapshot (operation="upsert").

Readers see either the pre-upsert state or the fully merged state; data
files are never rewritten; repeated upserts accumulate sidecars; streaming
treats an upsert commit as replace-like (its files are merge results, not
pure appends).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webcodec.fixtures import webpages
from webcodec.spark.maintenance import upsert
from webcodec.spark.table import SnapshotTable

pytestmark = pytest.mark.spark


def _make_table(spark, tmp_path, rows=2_000, n_parts=3):
    from webcodec.spark.datasource import WebcodecDataSource

    spark.dataSource.register(WebcodecDataSource)
    t = webpages(rows)
    src = str(tmp_path / "src.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "t")
    (spark.read.parquet(src).repartition(n_parts)
     .write.format("webcodec").mode("append").option("path", out).save())
    return out, t


def _source_df(spark, tmp_path, t, n_update=50, n_insert=25):
    """n_update rows reusing existing urls (new text) + n_insert new urls."""
    urls = t.column("url").to_pylist()
    upd = pa.table({
        "url": urls[:n_update],
        "warc_ts": t.column("warc_ts")[:n_update],
        "html": pa.array([b"<new>"] * n_update, pa.binary()),
        "text": pa.array(["updated row"] * n_update),
        "lang": pa.array(["xx"] * n_update),
    })
    ins = pa.table({
        "url": [f"https://inserted.example/{i}" for i in range(n_insert)],
        "warc_ts": t.column("warc_ts")[:n_insert],
        "html": pa.array([b"<ins>"] * n_insert, pa.binary()),
        "text": pa.array(["inserted row"] * n_insert),
        "lang": pa.array(["yy"] * n_insert),
    })
    src = str(tmp_path / "upsert_src.parquet")
    pq.write_table(pa.concat_tables([upd, ins]), src)
    return spark.read.parquet(src)


def test_upsert_end_to_end(spark, tmp_path):
    from webcodec.spark.decode_job import read_encoded

    out, t = _make_table(spark, tmp_path)
    tbl = SnapshotTable(out)
    snap_before = tbl.current_snapshot_id()
    n_dup_urls = len(set(t.column("url").to_pylist()[:50]))
    df = _source_df(spark, tmp_path, t)
    res = upsert(spark, out, df, key_cols=["url"])
    # ONE snapshot for the whole merge
    assert res["snapshot_id"] == snap_before + 1
    assert tbl.current_snapshot_id() == snap_before + 1
    assert res["inserted_rows"] == 75
    # every table row whose url is in the source is superseded (urls may
    # repeat in the fixture -> superseded >= distinct updated urls)
    assert res["superseded_rows"] >= n_dup_urls
    got = spark.read.format("webcodec").option("path", out).load()
    assert got.count() == t.num_rows - res["superseded_rows"] + 75
    # updated keys resolve ONLY to source rows
    upd_urls = set(t.column("url").to_pylist()[:50])
    rows = got.filter(got.url.isin(list(upd_urls))).select("text", "lang").distinct().collect()
    assert {(r["text"], r["lang"]) for r in rows} == {("updated row", "xx")}
    assert got.filter("lang = 'yy'").count() == 25
    # job API agrees
    assert read_encoded(spark, out).count() == got.count()
    # staging keys dir cleaned up
    assert not os.listdir(os.path.join(out, "tmp")) if os.path.isdir(
        os.path.join(out, "tmp")) else True


def test_upsert_repeat_accumulates(spark, tmp_path):
    out, t = _make_table(spark, tmp_path, rows=1_000)
    df1 = _source_df(spark, tmp_path, t, n_update=30, n_insert=10)
    r1 = upsert(spark, out, df1, key_cols=["url"])
    # second upsert touches the SAME keys: supersedes r1's inserted copies
    df2 = _source_df(spark, tmp_path, t, n_update=30, n_insert=10)
    r2 = upsert(spark, out, df2, key_cols=["url"])
    got = spark.read.format("webcodec").option("path", out).load()
    # each upserted key resolves to exactly one surviving copy per distinct row
    upd = got.filter("text = 'updated row'")
    assert upd.count() == upd.select("url").distinct().count()
    assert got.filter("lang = 'yy'").count() == 10
    assert r2["superseded_rows"] >= 40  # r1's 30 updates + 10 inserts hit again


def test_upsert_composite_key(spark, tmp_path):
    out, t = _make_table(spark, tmp_path, rows=500)
    df = _source_df(spark, tmp_path, t, n_update=20, n_insert=5)
    res = upsert(spark, out, df, key_cols=["url", "warc_ts"])
    got = spark.read.format("webcodec").option("path", out).load()
    assert got.filter("lang = 'yy'").count() == 5
    keys = {(r["url"], r["warc_ts"]) for r in df.select("url", "warc_ts").collect()}
    surv = got.filter("text = 'updated row' or lang = 'yy'").select(
        "url", "warc_ts").collect()
    assert {(r["url"], r["warc_ts"]) for r in surv} <= keys
    assert res["superseded_rows"] > 0


def test_upsert_schema_mismatch_rejected(spark, tmp_path):
    out, t = _make_table(spark, tmp_path, rows=200)
    bad = spark.range(5).selectExpr("cast(id as string) AS url")
    with pytest.raises(ValueError, match="columns"):
        upsert(spark, out, bad, key_cols=["url"])
    with pytest.raises(ValueError, match="key columns"):
        df = _source_df(spark, tmp_path, t, n_update=1, n_insert=1)
        upsert(spark, out, df, key_cols=["nope"])


def test_stream_rejects_upsert_commit(spark, tmp_path):
    """A running stream must not re-deliver or mis-deliver upsert files."""
    out, t = _make_table(spark, tmp_path, rows=500)
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")

    def run(ignore=False):
        r = (spark.readStream.format("webcodec").option("path", out))
        if ignore:
            r = r.option("ignore_changes", "true")
        q = (r.load().writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()  # baseline: initial snapshot delivered
    df = _source_df(spark, tmp_path, t, n_update=10, n_insert=5)
    upsert(spark, out, df, key_cols=["url"])
    with pytest.raises(Exception):
        run()
    # ignore_changes does NOT rescue an upsert snapshot: skipping it would
    # silently LOSE the 5 inserted rows (it mixes updates and inserts), so
    # the stream fails loudly either way — r3 review fix
    with pytest.raises(Exception, match="upsert"):
        run(ignore=True)
    assert spark.read.parquet(sink).count() == t.num_rows  # baseline only


def test_streaming_cdc_upsert_foreachbatch(spark, tmp_path):
    """CDC-style streaming MERGE: a change stream applies via
    foreachBatch -> latest-change-per-key dedup -> atomic upsert. One
    snapshot per microbatch; final state = changes applied in version
    order regardless of how files batch together."""
    from pyspark.sql import Window, functions as F

    out, t = _make_table(spark, tmp_path, rows=500)
    cdc = str(tmp_path / "cdc")
    os.makedirs(cdc)
    urls = list(dict.fromkeys(t.column("url").to_pylist()))[:20]
    ts0 = t.column("warc_ts")[0].as_py()

    def change(u, txt, ver):
        return {"url": u, "warc_ts": ts0, "html": b"", "text": txt,
                "lang": "cdc", "ver": ver}

    rows = [change(u, "v1", 1) for u in urls]
    rows += [change(u, "v2", 2) for u in urls[:10]]
    import pandas as pd
    spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.parquet(
        os.path.join(cdc, "changes"), mode="overwrite")

    schema = spark.read.parquet(os.path.join(cdc, "changes")).schema
    stream = spark.readStream.schema(schema).parquet(os.path.join(cdc, "changes"))

    def apply_batch(df, _bid):
        w = Window.partitionBy("url").orderBy(F.desc("ver"))
        latest = (df.withColumn("rn", F.row_number().over(w))
                  .filter("rn = 1").drop("rn", "ver"))
        if latest.count():
            upsert(spark, out, latest, key_cols=["url"])

    q = (stream.writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.read.format("webcodec").option("path", out).load()
    cdc_rows = got.filter("lang = 'cdc'")
    assert cdc_rows.count() == 20  # one surviving row per changed key
    by_text = {r["text"]: r["cnt"] for r in
               cdc_rows.groupBy("text").agg(F.count("*").alias("cnt")).collect()}
    assert by_text == {"v2": 10, "v1": 10}
    assert got.filter(got.url.isin(urls)).filter("lang <> 'cdc'").count() == 0

"""Merge-on-read positional deletes (Iceberg v2 delete-file analogue).

delete_where records GLOBAL matching positions in small sidecars instead of
rewriting data; every reader (job API, DataSource, filefmt) subtracts them
inside the keep-mask machinery; rewrite materializes them; compact refuses
to byte-merge deleted files; expire vacuums orphaned sidecars; streaming
treats a delete commit as replace-like; time travel to a pre-delete
snapshot still sees every row.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from webcodec import filefmt
from webcodec.config import EncoderConfig
from webcodec.fixtures import webpages
from webcodec.spark.maintenance import (
    compact,
    delete_where,
    expire_snapshots,
    rewrite_encoded,
)
from webcodec.spark.table import SnapshotTable

pytestmark = pytest.mark.spark


def test_match_positions_and_drop_rows(tmp_path):
    t = webpages(3_000)
    p = str(tmp_path / "t.wcd")
    filefmt.write_table(t, p, EncoderConfig())
    pos = filefmt.match_positions(p, ("lang", "==", "en"))
    langs = t.column("lang").to_pylist()
    expect = [i for i, v in enumerate(langs) if v == "en"]
    assert pos.tolist() == expect
    out = filefmt.read_table(p, drop_rows=pos)
    assert out.num_rows == 3_000 - len(expect)
    assert "en" not in set(out.column("lang").to_pylist())
    # drop_rows composes with row_range (positions are GLOBAL)
    sl = filefmt.read_table(p, row_range=(1_000, 2_000), drop_rows=pos)
    exp_slice = [v for v in langs[1_000:2_000] if v != "en"]
    assert sl.column("lang").to_pylist() == exp_slice
    # and with a predicate on another column
    pr = filefmt.read_table(p, predicate=("url", "notnull", None), drop_rows=pos)
    assert pr.num_rows == out.num_rows


def _make_table(spark, tmp_path, rows=2_000, n_parts=3):
    import pyarrow.parquet as pq2

    from webcodec.spark.datasource import WebcodecDataSource

    spark.dataSource.register(WebcodecDataSource)
    t = webpages(rows)
    src = str(tmp_path / "src.parquet")
    pq2.write_table(t, src)
    out = str(tmp_path / "t")
    (spark.read.parquet(src).repartition(n_parts)
     .write.format("webcodec").mode("append").option("path", out).save())
    return out, t


def test_delete_where_end_to_end(spark, tmp_path):
    from webcodec.spark.decode_job import read_encoded

    out, t = _make_table(spark, tmp_path)
    n_en = sum(1 for v in t.column("lang").to_pylist() if v == "en")
    assert n_en > 0
    res = delete_where(spark, out, ("lang", "==", "en"))
    assert res["deleted_rows"] == n_en
    # job API honors deletes
    got = read_encoded(spark, out)
    assert got.count() == t.num_rows - n_en
    assert got.filter("lang = 'en'").count() == 0
    # DataSource read honors deletes
    ds = spark.read.format("webcodec").option("path", out).load()
    assert ds.count() == t.num_rows - n_en
    # snapshot bookkeeping
    tbl = SnapshotTable(out)
    snap = tbl.read_snapshot()
    assert snap["operation"] == "delete"
    assert sum(f.get("deleted_rows", 0) for f in snap["files"]) == n_en
    # a second delete ACCUMULATES and never recounts the same rows
    res2 = delete_where(spark, out, ("lang", "in", ["en", "de"]))
    n_de = sum(1 for v in t.column("lang").to_pylist() if v == "de")
    assert res2["deleted_rows"] == n_de
    assert read_encoded(spark, out).count() == t.num_rows - n_en - n_de
    # time travel BEFORE the deletes still sees every row
    assert read_encoded(spark, out, snapshot_id=1).count() == t.num_rows


def test_delete_then_rewrite_materializes(spark, tmp_path):
    from webcodec.spark.decode_job import read_encoded

    out, t = _make_table(spark, tmp_path)
    delete_where(spark, out, ("lang", "==", "en"))
    dst = str(tmp_path / "t2")
    rewrite_encoded(spark, out, dst)
    snap = SnapshotTable(dst).read_snapshot()
    assert all(not f.get("delete_files") for f in snap["files"])
    live = sum(1 for v in t.column("lang").to_pylist() if v != "en")
    got = read_encoded(spark, dst)
    assert got.count() == live and got.filter("lang = 'en'").count() == 0


def test_compact_never_byte_merges_deleted_files(spark, tmp_path):
    from webcodec.spark.decode_job import read_encoded

    out, t = _make_table(spark, tmp_path, n_parts=4)
    delete_where(spark, out, ("lang", "==", "en"))
    before = {f["path"]: f for f in SnapshotTable(out).read_snapshot()["files"]}
    compact(out)
    snap = SnapshotTable(out).read_snapshot()
    # every file that carried deletes is still its own file, sidecars intact
    for f in snap["files"]:
        if f.get("delete_files"):
            assert f["path"] in before
    live = sum(1 for v in t.column("lang").to_pylist() if v != "en")
    got = read_encoded(spark, out)
    assert got.count() == live and got.filter("lang = 'en'").count() == 0


def test_expire_vacuums_orphaned_sidecars(spark, tmp_path):
    out, _ = _make_table(spark, tmp_path)
    delete_where(spark, out, ("lang", "==", "en"))
    # replace commit (rewrite in place via a fresh table dir is the normal
    # path; here: compact+replace semantics via rewrite into the same dir's
    # successor snapshot is emulated by an explicit replace commit)
    tbl = SnapshotTable(out)
    snap = tbl.read_snapshot()
    clean = [{k: v for k, v in f.items() if k not in ("delete_files", "deleted_rows")}
             for f in snap["files"]]
    tbl.commit(clean, snap["schema"], replace=True)
    res = expire_snapshots(out, keep_last=1, grace_seconds=0)
    assert res["removed_delete_files"] >= 1
    assert not os.listdir(os.path.join(out, "deletes"))


def test_stream_rejects_delete_commit(spark, tmp_path):
    out, t = _make_table(spark, tmp_path)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run(ignore=False):
        r = spark.readStream.format("webcodec").option("path", out)
        if ignore:
            r = r.option("ignore_changes", "true")
        q = (r.load().writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(sink).count() == t.num_rows
    delete_where(spark, out, ("lang", "==", "en"))
    with pytest.raises(Exception, match="replace commit|ignore_changes"):
        run()
    run(ignore=True)  # opt-in skip: no re-delivery, no crash
    assert spark.read.parquet(sink).count() == t.num_rows


def test_type_promotion_on_evolved_read(spark, tmp_path):
    """Iceberg-safe promotion: a file written as int/float reads back as
    bigint/double after the table schema widens (old files promote on
    decode; new files land wide natively)."""
    from webcodec.spark.datasource import WebcodecDataSource
    from webcodec.spark.decode_job import read_encoded

    spark.dataSource.register(WebcodecDataSource)
    out = str(tmp_path / "t")
    d1 = spark.range(100).selectExpr(
        "cast(id as int) AS x", "cast(id as float) AS y", "cast(id as string) AS s")
    d1.write.format("webcodec").mode("append").option("path", out).save()
    d2 = spark.range(100, 200).selectExpr(
        "cast(id as bigint) AS x", "cast(id as double) AS y", "cast(id as string) AS s")
    d2.write.format("webcodec").mode("append").option("path", out).save()
    got = spark.read.format("webcodec").option("path", out).load()
    assert dict(got.dtypes) == {"x": "bigint", "y": "double", "s": "string"}
    assert got.count() == 200
    assert got.agg({"x": "sum"}).collect()[0][0] == sum(range(200))
    job = read_encoded(spark, out)
    assert dict(job.dtypes)["x"] == "bigint" and job.count() == 200


# ------------------------------------------------------------ equality deletes


def test_delete_by_key_end_to_end(spark, tmp_path):
    """Equality deletes: O(1) write (no data scan), read-time key matching
    through both readers, composing with positional sidecars."""
    from webcodec.spark.decode_job import read_encoded
    from webcodec.spark.maintenance import delete_by_key

    out, t = _make_table(spark, tmp_path)
    urls = list(dict.fromkeys(t.column("url").to_pylist()))[:40]
    n_match = sum(1 for u in t.column("url").to_pylist() if u in set(urls))
    keys = spark.createDataFrame([(u,) for u in urls], "url string")
    res = delete_by_key(spark, out, keys, key_cols=["url"])
    assert res["files_touched"] > 0 and res["sidecar"].startswith("deletes/eq-")
    got = spark.read.format("webcodec").option("path", out).load()
    assert got.count() == t.num_rows - n_match
    assert got.filter(got.url.isin(urls)).count() == 0
    assert read_encoded(spark, out).count() == t.num_rows - n_match
    # positional deletes compose on top of equality deletes
    n_en = (spark.read.format("webcodec").option("path", out).load()
            .filter("lang = 'en'").count())
    delete_where(spark, out, ("lang", "==", "en"))
    left = spark.read.format("webcodec").option("path", out).load()
    assert left.count() == t.num_rows - n_match - n_en
    assert left.filter("lang = 'en'").count() == 0


def test_delete_by_key_composite_and_rewrite_materializes(spark, tmp_path):
    from webcodec.spark.maintenance import delete_by_key

    out, t = _make_table(spark, tmp_path, rows=1_000)
    pairs = list(dict.fromkeys(zip(t.column("url").to_pylist(),
                                   t.column("lang").to_pylist())))[:25]
    n_match = sum(1 for p in zip(t.column("url").to_pylist(),
                                 t.column("lang").to_pylist()) if p in set(pairs))
    keys = spark.createDataFrame(pairs, "url string, lang string")
    delete_by_key(spark, out, keys, key_cols=["url", "lang"])
    got = spark.read.format("webcodec").option("path", out).load()
    assert got.count() == t.num_rows - n_match
    # rewrite materializes: destination carries no sidecars, same rows
    dst = str(tmp_path / "dst")
    rewrite_encoded(spark, out, dst, EncoderConfig())
    snap = SnapshotTable(dst).read_snapshot()
    assert all(not f.get("delete_files") for f in snap["files"])
    back = spark.read.format("webcodec").option("path", dst).load()
    assert back.count() == t.num_rows - n_match


def test_expire_vacuums_orphaned_equality_sidecar(spark, tmp_path):
    """Once no kept snapshot references an equality sidecar, the vacuum
    removes the parquet DIRECTORY (directory-aware removal)."""
    import time as _time

    from webcodec.spark.maintenance import (
        delete_by_key,
        expire_snapshots,
        rollback_to,
    )

    out, t = _make_table(spark, tmp_path, rows=500)          # snapshot 1
    pre = SnapshotTable(out).current_snapshot_id()
    keys = spark.createDataFrame(
        [(u,) for u in t.column("url").to_pylist()[:5]], "url string")
    res = delete_by_key(spark, out, keys, key_cols=["url"])  # snapshot 2
    eq_dir = os.path.join(out, res["sidecar"])
    assert os.path.isdir(eq_dir)
    rollback_to(out, pre)                                    # snapshot 3 = state 1
    past = _time.time() - 7_200
    os.utime(eq_dir, (past, past))
    for fn in os.listdir(eq_dir):
        os.utime(os.path.join(eq_dir, fn), (past, past))
    r = expire_snapshots(out, keep_last=1, grace_seconds=3_600)
    assert not os.path.exists(eq_dir)
    assert r["removed_delete_files"] >= 1
    assert (spark.read.format("webcodec").option("path", out).load().count()
            == t.num_rows)

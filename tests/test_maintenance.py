"""Compaction (C10), rewrite/transcode (C11), and kill/resume tests."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webcodec import filefmt
from webcodec.config import EncoderConfig
from webcodec.fixtures import webpages
from webcodec.spark.table import SnapshotTable


def test_append_files_roundtrip(tmp_path):
    t = webpages(6_000)
    parts = [t.slice(0, 2_000), t.slice(2_000, 2_000), t.slice(4_000, 2_000)]
    srcs = []
    for i, p in enumerate(parts):
        path = str(tmp_path / f"s{i}.wcd")
        filefmt.write_table(p, path, EncoderConfig())
        srcs.append(path)
    dst = str(tmp_path / "merged.wcd")
    footer = filefmt.append_files(dst, srcs)
    assert footer["num_rows"] == 6_000
    got = filefmt.read_table(dst)
    assert got.equals(t.combine_chunks() if isinstance(t, pa.Table) else t) or all(
        got.column(c).combine_chunks().equals(t.column(c).combine_chunks())
        for c in t.column_names
    )


def test_append_files_projection_and_predicate(tmp_path):
    t = webpages(4_000)
    srcs = []
    for i in range(2):
        path = str(tmp_path / f"s{i}.wcd")
        filefmt.write_table(t.slice(i * 2_000, 2_000), path, EncoderConfig())
        srcs.append(path)
    dst = str(tmp_path / "m.wcd")
    filefmt.append_files(dst, srcs)
    got = filefmt.read_table(dst, columns=["lang", "url"], predicate=("lang", "==", "de"))
    import pyarrow.compute as pc

    want = t.filter(pc.equal(t.column("lang"), "de"))
    assert got.num_rows == want.num_rows
    assert got.column_names == ["lang", "url"]


pytestmark_spark = pytest.mark.spark


@pytest.mark.spark
def test_compact_and_read(spark, tmp_path):
    from webcodec.spark.decode_job import read_encoded, verify_roundtrip
    from webcodec.spark.encode_job import encode_table
    from webcodec.spark.maintenance import compact

    src = str(tmp_path / "src.parquet")
    pq.write_table(webpages(6_000), src, row_group_size=500)
    df = spark.read.parquet(src)
    out = str(tmp_path / "t")
    encode_table(df, out, mode="files", target_partition_bytes=1 << 20, write_metrics=False)
    n_before = len(SnapshotTable(out).read_snapshot()["files"])
    assert n_before > 2
    snap = compact(out, target_bytes=1 << 30)
    assert len(snap["files"]) < n_before
    res = verify_roundtrip(spark, df, out, ["url"])
    assert res["ok"], res


@pytest.mark.spark
def test_rewrite_transcode(spark, tmp_path):
    from webcodec.spark.decode_job import read_encoded
    from webcodec.spark.encode_job import encode_table
    from webcodec.spark.maintenance import rewrite_encoded

    src = str(tmp_path / "src.parquet")
    pq.write_table(webpages(3_000), src)
    df = spark.read.parquet(src)
    out = str(tmp_path / "t")
    encode_table(df, out, num_partitions=2, write_metrics=False)
    out2 = str(tmp_path / "t2")
    rewrite_encoded(spark, out, out2, EncoderConfig(compression="gzip"), columns=["url", "lang"])
    back = read_encoded(spark, out2)
    assert back.columns == ["url", "lang"]
    assert back.count() == 3_000
    assert df.select("url", "lang").exceptAll(back).count() == 0


@pytest.mark.spark
def test_kill_resume_no_reencode(spark, tmp_path):
    """SURVEY.md §5.3 layer 5: simulate a killed job — commit only a prefix of
    partitions, rerun, assert committed files are untouched and the final
    state equals a clean run."""
    from webcodec.spark.decode_job import verify_roundtrip
    from webcodec.spark.encode_job import encode_table

    src = str(tmp_path / "src.parquet")
    pq.write_table(webpages(6_000), src, row_group_size=750)
    df = spark.read.parquet(src)
    out = str(tmp_path / "t")
    encode_table(df, out, mode="files", target_partition_bytes=1 << 20, write_metrics=False)
    tbl = SnapshotTable(out)
    full = tbl.read_snapshot()
    assert len(full["files"]) >= 3

    # simulate the kill: rewind the snapshot to only the first K partitions
    k = 2
    partial_files = full["files"][:k]
    tbl.commit(partial_files, full["schema"], replace=True)
    # delete the data files that "didn't get written before the kill"
    for f in full["files"][k:]:
        os.remove(os.path.join(out, f["path"]))
    kept_mtimes = {
        f["path"]: os.path.getmtime(os.path.join(out, f["path"])) for f in partial_files
    }

    # resume run
    encode_table(df, out, mode="files", target_partition_bytes=1 << 20, write_metrics=False)
    snap = tbl.read_snapshot()
    assert len(snap["files"]) == len(full["files"])
    for f in partial_files:  # committed partitions were NOT re-encoded
        assert os.path.getmtime(os.path.join(out, f["path"])) == kept_mtimes[f["path"]]
    res = verify_roundtrip(spark, df, out, ["url"])
    assert res["ok"], res


@pytest.mark.spark
def test_filtered_rewrite_deletes_rows(spark, tmp_path):
    """Filtered rewrite = targeted deletion: rows matching the KEEP predicate
    survive, everything else is gone, values stay byte-identical."""
    from pyspark.sql import functions as F

    from webcodec.spark.decode_job import read_encoded
    from webcodec.spark.encode_job import encode_table
    from webcodec.spark.maintenance import rewrite_encoded

    src = str(tmp_path / "src.parquet")
    pq.write_table(webpages(2_000), src)
    df = spark.read.parquet(src)
    out = str(tmp_path / "t")
    encode_table(df, out, write_metrics=False)
    out2 = str(tmp_path / "t2")
    rewrite_encoded(spark, out, out2, predicate=[("lang", "in", ["en", "de"])])
    back = read_encoded(spark, out2)
    want = df.filter(F.col("lang").isin("en", "de"))
    assert back.count() == want.count() > 0
    assert want.exceptAll(back).count() == 0
    assert back.exceptAll(want).count() == 0


def test_expire_snapshots(tmp_path):
    from webcodec.spark.maintenance import expire_snapshots

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.init()
    schema = [{"name": "x", "type": "bigint", "nullable": True}]
    for i in range(4):
        fn = f"f{i}.bin"
        with open(os.path.join(tbl.data_dir, fn), "wb") as f:
            f.write(b"x")
        tbl.commit(
            [{"partition_id": i, "path": f"data/{fn}", "rows": 1, "raw_bytes": 1,
              "compressed_bytes": 1, "column_stats": {}}],
            schema,
        )
    # snapshot 4 references f0..f3; snapshot 2 references f0,f1
    res = expire_snapshots(str(tmp_path / "t"), keep_last=2)
    assert res["removed_snapshots"] == 2
    assert res["removed_files"] == 0  # all files still referenced by snap 3/4
    # replace-commit drops all old files from the manifest, then expire all
    tbl.commit(
        [{"partition_id": 9, "path": "data/f9.bin", "rows": 1, "raw_bytes": 1,
          "compressed_bytes": 1, "column_stats": {}}],
        schema, replace=True,
    )
    with open(os.path.join(tbl.data_dir, "f9.bin"), "wb") as f:
        f.write(b"x")
    # grace window first: freshly-written unreferenced files survive (an
    # in-flight committer's artifacts look exactly like this)
    res = expire_snapshots(str(tmp_path / "t"), keep_last=1)
    assert res["removed_files"] == 0
    res = expire_snapshots(str(tmp_path / "t"), keep_last=1, grace_seconds=0)
    assert res["removed_files"] == 4  # f0..f3 unreferenced by snapshot 5
    assert sorted(os.listdir(tbl.data_dir)) == ["f9.bin"]
    assert tbl.read_snapshot()["files"][0]["path"] == "data/f9.bin"


def test_concurrent_commits_no_lost_update(tmp_path):
    """Optimistic concurrency: N processes committing simultaneously must all
    land (distinct snapshot ids, every file referenced in the final
    manifest) — the naive read-parent/write-child protocol lost updates."""
    import multiprocessing as mp

    table_dir = str(tmp_path / "t")
    SnapshotTable(table_dir).init()
    schema = [{"name": "x", "type": "bigint", "nullable": True}]

    def worker(i: int) -> None:
        tbl = SnapshotTable(table_dir)
        tbl.commit(
            [{"partition_id": i, "path": f"data/f{i}.bin", "rows": 1, "raw_bytes": 1,
              "compressed_bytes": 1, "column_stats": {}}],
            schema,
        )

    ctx = mp.get_context("fork")
    procs = [ctx.Process(target=worker, args=(i,)) for i in range(8)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
        assert p.exitcode == 0
    tbl = SnapshotTable(table_dir)
    assert tbl.current_snapshot_id() == 8
    snap = tbl.read_snapshot()
    assert {f["partition_id"] for f in snap["files"]} == set(range(8))
    # every intermediate snapshot parses and time travel works
    for sid in range(1, 9):
        s = tbl.read_snapshot(sid)
        assert s["snapshot_id"] == sid and len(s["files"]) == sid


@pytest.mark.spark
def test_full_table_lifecycle(spark, tmp_path):
    """Integration: append x2 -> compact -> schema-evolving append ->
    time travel to every stage -> expire old snapshots -> final state exact."""
    import pyarrow as pa2

    from pyspark.sql import functions as F

    from webcodec.spark.datasource import WebcodecDataSource
    from webcodec.spark.decode_job import read_encoded
    from webcodec.spark.maintenance import compact, expire_snapshots

    spark.dataSource.register(WebcodecDataSource)
    out = str(tmp_path / "t")
    t1 = webpages(2_000)
    p1 = str(tmp_path / "p1.parquet")
    pq.write_table(t1, p1)
    df1 = spark.read.parquet(p1)
    df1.limit(1_200).write.format("webcodec").option("path", out).mode("append").save()
    df1.exceptAll(df1.limit(1_200)).write.format("webcodec").option("path", out).mode("append").save()
    tbl = SnapshotTable(out)
    s_appends = tbl.current_snapshot_id()
    assert read_encoded(spark, out).count() == 2_000

    compact(out, target_bytes=1 << 30)
    s_compact = tbl.current_snapshot_id()
    assert s_compact > s_appends
    assert read_encoded(spark, out).count() == 2_000

    # evolving append: new column 'lang2'
    t2 = pa2.table({
        "url": [f"https://new{i}.com/x" for i in range(300)],
        "warc_ts": pa2.array([1_700_000_000_000_000 + i for i in range(300)], pa2.timestamp("us")),
        "html": [b"x"] * 300,
        "text": ["hello new"] * 300,
        "lang": ["xx"] * 300,
        "lang2": ["yy"] * 300,
    })
    p2 = str(tmp_path / "p2.parquet")
    pq.write_table(t2, p2)
    spark.read.parquet(p2).write.format("webcodec").option("path", out).mode("append").save()
    final = read_encoded(spark, out)
    assert final.count() == 2_300
    assert final.filter(F.col("lang2").isNull()).count() == 2_000

    # time travel is intact for all kept snapshots
    assert read_encoded(spark, out, snapshot_id=s_compact).count() == 2_000
    # expire everything but the last two snapshots; current state unchanged
    res = expire_snapshots(out, keep_last=2)
    assert res["removed_snapshots"] >= 1
    after = read_encoded(spark, out)
    assert after.count() == 2_300
    assert after.filter(F.col("lang2") == "yy").count() == 300


# ------------------------------------------------------------------ rollback


def test_rollback_to_undoes_overwrite(spark, tmp_path):
    """rollback_to commits a NEW snapshot reusing the target's manifest
    shards: reads return the old state, history stays forward-only (time
    travel to the undone snapshot still works), and a later append stacks
    on top of the rolled-back state."""
    from webcodec.spark.datasource import WebcodecDataSource
    from webcodec.spark.maintenance import rollback_to

    spark.dataSource.register(WebcodecDataSource)
    out = str(tmp_path / "t")
    t = webpages(2_000)
    src = str(tmp_path / "s.parquet")
    pq.write_table(t, src)
    df = spark.read.parquet(src)
    df.write.format("webcodec").mode("append").option("path", out).save()   # snap 1
    df.limit(500).write.format("webcodec").mode("overwrite").option("path", out).save()  # snap 2
    tbl = SnapshotTable(out)
    assert tbl.current_snapshot_id() == 2

    res = rollback_to(out, 1)
    assert res["snapshot_id"] == 3 and res["operation"] == "rollback"
    assert res["properties"]["rolled_back_to"] == 1
    back = spark.read.format("webcodec").option("path", out).load()
    assert back.count() == 2_000  # pre-overwrite state restored
    # O(1) metadata: the rollback reuses snapshot 1's shards verbatim
    assert tbl.read_snapshot_meta(3)["manifests"] == tbl.read_snapshot_meta(1)["manifests"]
    # forward-only history: the undone snapshot is still time-travelable
    old = (spark.read.format("webcodec").option("path", out)
           .option("snapshot_id", "2").load())
    assert old.count() == 500
    # appends stack on the rolled-back state
    df.limit(100).write.format("webcodec").mode("append").option("path", out).save()
    assert spark.read.format("webcodec").option("path", out).load().count() == 2_100


def test_rollback_missing_snapshot_raises(tmp_path):
    from webcodec.spark.maintenance import rollback_to

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.init()
    with pytest.raises(FileNotFoundError, match="snapshot 7"):
        rollback_to(str(tmp_path / "t"), 7)


def test_history_audit_log(spark, tmp_path):
    """history() narrates the table's life: append -> delete -> upsert ->
    rollback, O(pointer files) only."""
    from webcodec.fixtures import webpages as _wp
    from webcodec.spark.datasource import WebcodecDataSource
    from webcodec.spark.maintenance import delete_where, rollback_to

    spark.dataSource.register(WebcodecDataSource)
    out = str(tmp_path / "t")
    src = str(tmp_path / "s.parquet")
    pq.write_table(_wp(800), src)
    df = spark.read.parquet(src)
    df.write.format("webcodec").mode("append").option("path", out).save()
    delete_where(spark, out, ("lang", "==", "en"))
    rollback_to(out, 1)
    h = SnapshotTable(out).history()
    assert [r["snapshot_id"] for r in h] == [1, 2, 3]
    assert [r["operation"] for r in h] == ["append", "delete", "rollback"]
    assert h[2]["rolled_back_to"] == 1
    assert h[0]["total_rows"] == 800 and h[2]["total_rows"] == 800
    assert all(r["committed_at"] for r in h)


def test_remove_orphan_files(spark, tmp_path):
    """Orphans (crash leftovers no snapshot references) are removed once old
    enough; referenced files and young files survive; history untouched."""
    import time

    import numpy as np
    import pyarrow.parquet as pq

    from webcodec.spark.encode_job import encode_table
    from webcodec.spark.decode_job import read_encoded
    from webcodec.spark.maintenance import remove_orphan_files
    from webcodec.spark.table import SnapshotTable

    t = pa.table({"k": pa.array(np.arange(500), pa.int64()),
                  "v": pa.array([f"v{i}" for i in range(500)])})
    src = str(tmp_path / "src.parquet")
    pq.write_table(t, src)
    out = str(tmp_path / "tbl")
    encode_table(spark.read.parquet(src), out, write_metrics=False)
    tbl = SnapshotTable(out)
    n_before = len(tbl.read_snapshot()["files"])

    # plant crash leftovers: an uncommitted .wcd, a .tmp spool, both backdated
    orphan1 = os.path.join(out, "data", "part-99999-deadbeef.wcd")
    orphan2 = os.path.join(out, "data", "part-99998-cafecafe.wcd.tmp")
    for p in (orphan1, orphan2):
        with open(p, "wb") as f:
            f.write(b"leftover")
        os.utime(p, (time.time() - 7200, time.time() - 7200))
    # and one YOUNG unreferenced file (simulates an in-flight commit)
    young = os.path.join(out, "data", "part-99997-beefbeef.wcd")
    with open(young, "wb") as f:
        f.write(b"in-flight")

    res = remove_orphan_files(out, older_than_seconds=3600)
    assert res["removed_data_files"] == 2
    assert not os.path.exists(orphan1) and not os.path.exists(orphan2)
    assert os.path.exists(young)  # inside the grace window
    assert len(tbl.read_snapshot()["files"]) == n_before
    assert read_encoded(spark, out).count() == 500
    # a second pass after the window clears the young orphan too
    os.utime(young, (time.time() - 7200, time.time() - 7200))
    assert remove_orphan_files(out, older_than_seconds=3600)["removed_data_files"] == 1


def test_rewrite_mask_columns_nullifies(spark, tmp_path):
    """C11 MaskMode parity: rewrite with mask_columns destroys the listed
    columns' VALUES while keeping them in the schema (column-level takedown);
    unknown names fail loud."""
    import pyarrow.parquet as pq2

    from webcodec.fixtures import webpages
    from webcodec.spark.decode_job import read_encoded
    from webcodec.spark.encode_job import encode_table
    from webcodec.spark.maintenance import rewrite_encoded

    t = webpages(1_000)
    src = str(tmp_path / "src.parquet")
    pq2.write_table(t, src)
    tdir = str(tmp_path / "t")
    encode_table(spark.read.parquet(src), tdir, num_partitions=2,
                 write_metrics=False)
    dst = str(tmp_path / "masked")
    rewrite_encoded(spark, tdir, dst, mask_columns=["html", "text"])
    got = read_encoded(spark, dst)
    assert got.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert got.count() == 1_000
    assert got.filter(got.html.isNotNull() | got.text.isNotNull()).count() == 0
    # untouched columns survive exactly
    urls = sorted(r["url"] for r in got.select("url").collect())
    assert urls == sorted(t.column("url").to_pylist())
    with pytest.raises(ValueError, match="mask_columns not in table schema"):
        rewrite_encoded(spark, tdir, str(tmp_path / "x"),
                        mask_columns=["nope"])

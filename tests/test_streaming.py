"""Structured Streaming sink test: writeStream.format('webcodec')."""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq
import pytest

from webcodec.fixtures import webpages
from webcodec.spark.table import SnapshotTable

pytestmark = pytest.mark.spark


def test_append_twice_keeps_both_batches(spark, tmp_path):
    """Regression: repeated mode('append') writes must not collide on
    partition ids (found live: second append replaced the first's files)."""
    import pyarrow.parquet as pq2

    from webcodec.spark.datasource import WebcodecDataSource
    from webcodec.spark.decode_job import read_encoded

    spark.dataSource.register(WebcodecDataSource)
    t = webpages(1_000)
    src = str(tmp_path / "s.parquet")
    pq2.write_table(t, src)
    df = spark.read.parquet(src)
    out = str(tmp_path / "t")
    df.limit(400).write.format("webcodec").option("path", out).mode("append").save()
    df.exceptAll(df.limit(400)).write.format("webcodec").option("path", out).mode(
        "append"
    ).save()
    assert spark.read.format("webcodec").option("path", out).load().count() == 1_000


def test_stream_read_snapshot_tail(spark, tmp_path):
    """Streaming SOURCE: readStream over the snapshot log — catch-up batch
    then incremental batches from the same checkpoint."""
    import pyarrow.parquet as pq2

    from webcodec.spark.datasource import WebcodecDataSource

    spark.dataSource.register(WebcodecDataSource)
    t = webpages(900)
    src = str(tmp_path / "s.parquet")
    pq2.write_table(t, src)
    df = spark.read.parquet(src)
    out = str(tmp_path / "t")
    df.limit(600).write.format("webcodec").option("path", out).mode("append").save()

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_stream():
        q = (
            spark.readStream.format("webcodec").option("path", out).load()
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_stream()
    assert spark.read.parquet(sink).count() == 600
    # new snapshot -> only the delta flows on resume
    df.exceptAll(df.limit(600)).write.format("webcodec").option("path", out).mode(
        "append"
    ).save()
    run_stream()
    got = spark.read.parquet(sink)
    assert got.count() == 900
    assert df.exceptAll(got).count() == 0 and got.exceptAll(df).count() == 0


def test_stream_write_microbatches(spark, tmp_path):
    from webcodec.spark.datasource import WebcodecDataSource
    from webcodec.spark.decode_job import read_encoded

    spark.dataSource.register(WebcodecDataSource)
    src_dir = str(tmp_path / "incoming")
    os.makedirs(src_dir)
    t = webpages(3_000)
    pq.write_table(t.slice(0, 1_500), os.path.join(src_dir, "a.parquet"))
    pq.write_table(t.slice(1_500, 1_500), os.path.join(src_dir, "b.parquet"))

    out = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    sdf = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        sdf.writeStream.format("webcodec")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    snap = SnapshotTable(out).read_snapshot()
    assert snap is not None
    assert snap["total_rows"] == 3_000
    assert snap["snapshot_id"] >= 2  # one commit per microbatch

    back = read_encoded(spark, out)
    src = spark.read.parquet(src_dir)
    assert back.count() == 3_000
    assert src.exceptAll(back).count() == 0 and back.exceptAll(src).count() == 0


def test_stream_reader_plans_file_partitions(tmp_path):
    """The source must plan one InputPartition per new file (executor-side
    decode); the driver never materializes rows."""
    import pyarrow.parquet as pq

    from webcodec import filefmt
    from webcodec.config import EncoderConfig
    from webcodec.fixtures import webpages
    from webcodec.spark.datasource import WebcodecStreamReader, _FileSplit
    from webcodec.spark.table import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.init()
    t = webpages(100)
    import os

    for i in range(3):
        fname = f"part-{i:05d}-x.wcd"
        footer = filefmt.write_table(t, os.path.join(tbl.data_dir, fname), EncoderConfig())
        tbl.commit(
            [{"partition_id": i, "path": f"data/{fname}", "rows": t.num_rows,
              "raw_bytes": footer["raw_bytes"],
              "compressed_bytes": footer["compressed_bytes"],
              "column_stats": {}}],
            [{"name": f.name, "type": "string", "nullable": True} for f in t.schema],
        )
    r = WebcodecStreamReader({"path": str(tmp_path / "t")})
    assert r.initialOffset() == {"snapshot_id": 0, "pos": -1}
    assert r.latestOffset() == {"snapshot_id": 3, "pos": -1}
    parts = r.partitions({"snapshot_id": 0}, {"snapshot_id": 3})
    assert len(parts) == 3 and all(isinstance(p, _FileSplit) for p in parts)
    parts = r.partitions({"snapshot_id": 1}, {"snapshot_id": 3})
    assert len(parts) == 2
    assert r.partitions({"snapshot_id": 2}, {"snapshot_id": 2}) == []
    # read() decodes a partition to Arrow batches (executor-side path)
    batches = list(r.read(parts[0]))
    assert sum(b.num_rows for b in batches) == 100


def test_stream_watermark_window_agg_pipeline(spark, tmp_path):
    """Composition: webcodec streaming SOURCE -> event-time window agg with a
    watermark (late-data semantics are Spark's; our source supplies
    event-time rows) -> webcodec streaming SINK. Result must equal the batch
    window agg over the same data."""
    import pyarrow.parquet as pq2

    from pyspark.sql import functions as F

    from webcodec.spark.datasource import WebcodecDataSource
    from webcodec.spark.decode_job import read_encoded

    spark.dataSource.register(WebcodecDataSource)
    t = webpages(1_200)
    src = str(tmp_path / "s.parquet")
    pq2.write_table(t, src)
    df = spark.read.parquet(src)
    # two source snapshots: batch 2's later timestamps advance the watermark
    # past batch 1's windows, so append mode finalizes and emits them
    split = df.orderBy("warc_ts").limit(1_000).agg(F.max("warc_ts")).collect()[0][0]
    batch1 = df.filter(F.col("warc_ts") <= F.lit(split))
    batch2 = df.filter(F.col("warc_ts") > F.lit(split))
    src_tbl = str(tmp_path / "src_tbl")
    batch1.write.format("webcodec").option("path", src_tbl).mode("append").save()

    out_tbl = str(tmp_path / "agg_tbl")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.format("webcodec").option("path", src_tbl).load()
        agg = (
            stream.withColumn("ts", F.col("warc_ts").cast("timestamp"))
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "7 days"), "lang")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum(F.length("text")).alias("chars"))
            .select(F.col("window.start").alias("w_start"), "lang", "cnt", "chars")
        )
        q = (
            agg.writeStream.format("webcodec")
            .option("path", out_tbl)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    batch2.write.format("webcodec").option("path", src_tbl).mode("append").save()
    run_once()

    got = read_encoded(spark, out_tbl)
    want = (
        df.withColumn("ts", F.col("warc_ts").cast("timestamp"))
        .groupBy(F.window("ts", "7 days"), "lang")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(F.length("text")).alias("chars"))
        .select(F.col("window.start").alias("w_start"), "lang", "cnt", "chars")
    )
    # every emitted row must match the batch result, and every window fully
    # closed below batch 1's watermark must have been emitted
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert len(got_rows) > 0
    assert got_rows <= want_rows
    wm = batch1.agg(F.max(F.col("warc_ts").cast("timestamp"))).collect()[0][0]
    finalized = {r for r in want_rows if (wm - r[0]).total_seconds() > 8 * 86400}
    assert finalized <= got_rows


def test_stateful_operator_over_webcodec_source(spark, tmp_path):
    """Custom stateful streaming operator (applyInPandasWithState) over the
    webcodec source: per-user event counts accumulate in GroupState ACROSS
    microbatches/restarts (state restored from the checkpoint), and the final
    totals equal the batch ground truth."""
    import pandas as pd
    import pyarrow as pa2
    import pyarrow.parquet as pq2

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from webcodec.spark.datasource import WebcodecDataSource

    spark.dataSource.register(WebcodecDataSource)
    n = 4_000
    t = pa2.table({
        "user_id": pa2.array([i % 23 for i in range(n)], pa2.int64()),
        "event_id": pa2.array(list(range(n)), pa2.int64()),
    })
    src = str(tmp_path / "ev.parquet")
    pq2.write_table(t, src)
    df = spark.read.parquet(src)
    src_tbl = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.format("webcodec").option("path", src_tbl).load()

        def count_state(key, pdf_iter, state):
            total = state.get[0] if state.exists else 0
            for pdf in pdf_iter:
                total += len(pdf)
            state.update((total,))
            yield pd.DataFrame({"user_id": [key[0]], "n": [total]})

        out = (
            stream.groupBy("user_id")
            .applyInPandasWithState(
                count_state,
                outputStructType="user_id long, n long",
                stateStructType="n long",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(str(tmp_path / "updates"))

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    df.filter(F.col("event_id") < 2_500).write.format("webcodec").option(
        "path", src_tbl).mode("append").save()
    run_once()
    df.filter(F.col("event_id") >= 2_500).write.format("webcodec").option(
        "path", src_tbl).mode("append").save()
    run_once()

    latest = (
        spark.read.parquet(str(tmp_path / "updates"))
        .groupBy("user_id").agg(F.max("n").alias("n"))
    )
    want = df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    assert want.exceptAll(latest).count() == 0
    assert latest.exceptAll(want).count() == 0


def test_stream_rate_limit_max_files_per_trigger(spark, tmp_path):
    """maxFilesPerTrigger analogue: sub-snapshot offsets bound each
    microbatch to N files; the union of batches covers every file exactly
    once and in manifest order."""
    from webcodec.spark.datasource import WebcodecDataSource

    spark.dataSource.register(WebcodecDataSource)
    out = str(tmp_path / "t")
    df = spark.range(400).selectExpr("id", "cast(id as string) AS s")
    # 2 snapshots x 4 files
    df.repartition(4).write.format("webcodec").mode("append").option("path", out).save()
    df.repartition(4).write.format("webcodec").mode("append").option("path", out).save()

    from webcodec.spark.datasource import WebcodecStreamReader

    r = WebcodecStreamReader({"path": out, "max_files_per_trigger": "3"})
    off = r.initialOffset()
    seen: list[str] = []
    batches = 0
    while True:
        end = r.latestOffset()
        if end == off:
            break
        files = r._files_between(off, end)
        assert len(files) <= 3
        seen.extend(f["path"] for f in files)
        parts = r.partitions(off, end)
        assert len(parts) == len(files)
        off = end
        batches += 1
        assert batches < 20
    assert batches == 3  # 8 files / 3 per trigger
    assert len(seen) == len(set(seen)) == 8

    # unlimited reader sees the same file set in one batch
    r2 = WebcodecStreamReader({"path": out})
    all_files = r2._files_between(r2.initialOffset(), r2.latestOffset())
    assert [f["path"] for f in all_files] == seen


def test_stream_across_legacy_to_shard_migration(spark, tmp_path):
    """A checkpointed stream must survive the monolithic->sharded manifest
    upgrade: catch up on a legacy (inline ``files``) snapshot, then receive
    ONLY the delta when the next commit migrates the table to shard format
    (exercises SnapshotTable.added_files' legacy fallback across the
    boundary)."""
    import json

    import pyarrow.parquet as pq2

    from webcodec.spark.datasource import WebcodecDataSource

    spark.dataSource.register(WebcodecDataSource)
    t = webpages(600)
    src = str(tmp_path / "s.parquet")
    pq2.write_table(t, src)
    df = spark.read.parquet(src)
    out = str(tmp_path / "t")
    df.limit(400).write.format("webcodec").option("path", out).mode("append").save()

    # rewrite snapshot-1 to the PRE-SHARD format: inline files, no manifests
    tbl = SnapshotTable(out)
    snap = tbl.read_snapshot(1)
    assert snap is not None and "manifests" in snap
    for m in snap.pop("manifests"):
        os.remove(os.path.join(tbl.meta_dir, m["path"]))
    with open(os.path.join(tbl.meta_dir, "snapshot-1.json"), "w") as f:
        json.dump(snap, f)  # snap already has "files" materialized

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_stream():
        q = (
            spark.readStream.format("webcodec").option("path", out).load()
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_stream()
    assert spark.read.parquet(sink).count() == 400
    # this commit migrates the legacy parent into a shard + appends
    df.exceptAll(df.limit(400)).write.format("webcodec").option("path", out).mode(
        "append"
    ).save()
    assert "manifests" in SnapshotTable(out).read_snapshot_meta(2)
    run_stream()
    got = spark.read.parquet(sink)
    assert got.count() == 600  # delta only — no legacy rows re-delivered
    assert df.exceptAll(got).count() == 0 and got.exceptAll(df).count() == 0


def test_stream_rate_limit_max_bytes_per_trigger(spark, tmp_path):
    """maxBytesPerTrigger analogue: each microbatch's admitted files stay
    under the byte bound (except a single oversized file, which must still
    be admitted so the stream never stalls); union covers every file once."""
    from webcodec.spark.datasource import WebcodecDataSource, WebcodecStreamReader
    from webcodec.spark.table import SnapshotTable

    spark.dataSource.register(WebcodecDataSource)
    out = str(tmp_path / "t")
    df = spark.range(4_000).selectExpr("id", "repeat(cast(id as string), 20) AS s")
    df.repartition(6).write.format("webcodec").mode("append").option("path", out).save()
    sizes = {f["path"]: f["compressed_bytes"]
             for f in SnapshotTable(out).read_snapshot()["files"]}
    bound = int(max(sizes.values()) * 1.5)  # fits 1, never 2 of the large files

    r = WebcodecStreamReader({"path": out, "max_bytes_per_trigger": str(bound)})
    off = r.initialOffset()
    seen: list[str] = []
    batches = 0
    while True:
        end = r.latestOffset()
        if end == off:
            break
        files = r._files_between(off, end)
        got = sum(sizes[f["path"]] for f in files)
        assert got <= bound or len(files) == 1  # oversized single file allowed
        seen.extend(f["path"] for f in files)
        off = end
        batches += 1
        assert batches < 20
    assert len(seen) == len(set(seen)) == 6
    assert batches >= 3  # the bound actually split the backlog


def test_stream_read_encrypted_footer_table(spark, tmp_path):
    """Streaming SOURCE over a C12 ENCRYPTED-FOOTER table: the reader needs
    the key to even parse footers (planning included); with the key the
    stream flows exactly like plaintext."""
    import pyarrow.parquet as pq2

    from webcodec.spark.datasource import WebcodecDataSource

    spark.dataSource.register(WebcodecDataSource)
    key = bytes(range(32))
    t = webpages(600)
    src = str(tmp_path / "s.parquet")
    pq2.write_table(t, src)
    out = str(tmp_path / "t")
    (spark.read.parquet(src).write.format("webcodec").mode("append")
     .option("path", out)
     .option("encryption_key_hex", key.hex())
     .option("encryption_footer_mode", "encrypted").save())

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("webcodec").option("path", out)
        .option("encryption_key_hex", key.hex()).load()
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    assert got.count() == 600
    src_df = spark.read.parquet(src)
    assert src_df.exceptAll(got).count() == 0 and got.exceptAll(src_df).count() == 0

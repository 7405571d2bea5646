"""Structured Streaming sink test: writeStream.format('webcodec')."""

from __future__ import annotations

import os
import time

import pyarrow.parquet as pq
import pytest

from webcodec.fixtures import webpages
from webcodec.spark.table import SnapshotTable

pytestmark = pytest.mark.spark


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

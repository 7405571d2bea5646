"""Python DataSource tests: format('webcodec') write/read, pushdown, overwrite."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from webcodec.fixtures import webpages

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def registered(spark):
    from webcodec.spark.datasource import WebcodecDataSource

    spark.dataSource.register(WebcodecDataSource)
    return spark


@pytest.fixture(scope="module")
def src_parquet(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dsrc") / "webpages.parquet")
    pq.write_table(webpages(4_000), path)
    return path


def test_write_read_roundtrip(registered, src_parquet, tmp_path):
    spark = registered
    out = str(tmp_path / "t")
    df = spark.read.parquet(src_parquet)
    df.write.format("webcodec").option("path", out).option("sort_key", "url").mode(
        "append"
    ).save()
    back = spark.read.format("webcodec").option("path", out).load()
    assert back.count() == 4_000
    assert df.exceptAll(back).count() == 0
    assert back.exceptAll(df).count() == 0


def test_filter_pushdown_prunes(registered, src_parquet, tmp_path):
    spark = registered
    out = str(tmp_path / "t")
    df = spark.read.parquet(src_parquet)
    df.write.format("webcodec").option("path", out).mode("append").save()
    back = spark.read.format("webcodec").option("path", out).load()
    got = back.filter(F.col("lang") == "de").count()
    want = df.filter(F.col("lang") == "de").count()
    assert got == want > 0


def test_overwrite_replaces_snapshot(registered, src_parquet, tmp_path):
    spark = registered
    out = str(tmp_path / "t")
    df = spark.read.parquet(src_parquet)
    df.write.format("webcodec").option("path", out).mode("append").save()
    half = df.limit(1_000)
    half.write.format("webcodec").option("path", out).mode("overwrite").save()
    back = spark.read.format("webcodec").option("path", out).load()
    assert back.count() == 1_000

    from webcodec.spark.table import SnapshotTable

    snap = SnapshotTable(out).read_snapshot()
    assert snap["parent_id"] is not None  # history retained (time travel)


def test_explain_shows_python_batch_scan(registered, src_parquet, tmp_path):
    """The read plan must be a DSv2 Python BatchScan (pushdown-capable leaf),
    not a fallback RDD scan."""
    spark = registered
    out = str(tmp_path / "t")
    spark.read.parquet(src_parquet).write.format("webcodec").option("path", out).mode(
        "append"
    ).save()
    back = spark.read.format("webcodec").option("path", out).load()
    plan = back.filter(F.col("lang") == "de")._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan webcodec" in plan


def test_projection_only_decodes_requested(registered, src_parquet, tmp_path):
    spark = registered
    out = str(tmp_path / "t")
    df = spark.read.parquet(src_parquet)
    df.write.format("webcodec").option("path", out).mode("append").save()
    back = spark.read.format("webcodec").option("path", out).load().select("lang")
    counts = {r["lang"]: r["cnt"] for r in back.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    want = {r["lang"]: r["cnt"] for r in df.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert counts == want

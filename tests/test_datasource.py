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
    back = (spark.read.format("webcodec").option("path", out)
            .option("pushdown", "true").load())
    got = back.filter(F.col("lang") == "de").count()
    want = df.filter(F.col("lang") == "de").count()
    assert got == want > 0


def test_no_cross_scan_filter_poisoning(registered, src_parquet, tmp_path):
    """Spark 4.1's Python DataSource caches the planned read on the shared
    relation, and PythonScanBuilder.pushFilters OVERWRITES it with
    filter-pruned partitions (PythonDataSourceV2.setReadInfo) — with
    pushdown on, a filtered count on a reused DataFrame would poison a later
    full count (it returns the filtered subset). The DEFAULT reader opts out
    of pushFilters entirely, so the reuse pattern stays correct."""
    spark = registered
    out = str(tmp_path / "t")
    df = spark.read.parquet(src_parquet)
    df.write.format("webcodec").option("path", out).mode("append").save()
    back = spark.read.format("webcodec").option("path", out).load()  # REUSED
    full1 = back.count()
    filt = back.filter(F.col("lang") == "de").count()
    full2 = back.count()  # poisoned to == filt if pushdown were default-on
    assert full1 == full2 == df.count()
    assert filt == df.filter(F.col("lang") == "de").count()
    assert filt < full2


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


def test_conjunct_pushdown_matrix(registered, src_parquet, tmp_path):
    """D4 widened pushdown: two-sided timestamp range, In, StartsWith,
    IsNull/IsNotNull — each must match the un-encoded source exactly."""
    spark = registered
    out = str(tmp_path / "t")
    df = spark.read.parquet(src_parquet)
    df.write.format("webcodec").option("path", out).option("sort_key", "warc_ts").mode(
        "append"
    ).save()

    lo, hi = [r[0] for r in df.selectExpr(
        "percentile_approx(warc_ts, 0.25)").collect()][0], [r[0] for r in df.selectExpr(
        "percentile_approx(warc_ts, 0.5)").collect()][0]
    cases = [
        (F.col("warc_ts") >= F.lit(lo)) & (F.col("warc_ts") < F.lit(hi)),
        F.col("lang").isin("de", "fr"),
        F.col("url").startswith("https://site00"),
        F.col("lang").isNotNull(),
        (F.col("lang") == "en") & F.col("url").startswith("https://site01"),
    ]
    for cond in cases:
        # fresh load per filter shape — the safe-usage contract for pushdown
        back = (spark.read.format("webcodec").option("path", out)
                .option("pushdown", "true").load())
        got = back.filter(cond)
        want = df.filter(cond)
        assert got.count() == want.count(), str(cond)
        assert want.exceptAll(got).count() == 0, str(cond)


def test_pushfilters_accepts_conjuncts_unit():
    """Reader-level contract: supported filters are consumed, others yielded."""
    from pyspark.sql.datasource import (
        EqualTo, GreaterThanOrEqual, In, IsNull, LessThan, StringContains,
        StringStartsWith,
    )
    from pyspark.sql.types import StructType

    from webcodec.spark.datasource import WebcodecPushdownReader

    from pyspark.sql.datasource import StringEndsWith

    r = WebcodecPushdownReader({"path": "/nonexistent"}, StructType([]))
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("ts",), 5),
                LessThan(("ts",), 9),
                In(("lang",), ("en", "de")),
                IsNull(("html",)),
                StringStartsWith(("url",), "https://a"),
                StringContains(("url",), "x"),
                StringEndsWith(("url",), ".html"),
                EqualTo(("a", "b"), 1),  # nested attribute -> yielded back
            ]
        )
    )
    assert len(leftover) == 1
    assert r.predicate == [
        ("ts", ">=", 5),
        ("ts", "<", 9),
        ("lang", "in", ["en", "de"]),
        ("html", "isnull", None),
        ("url", "startswith", "https://a"),
        ("url", "contains", "x"),
        ("url", "endswith", ".html"),
    ]


def test_datasource_read_after_schema_evolution(registered, tmp_path):
    """format('webcodec') read over a table whose schema gained a column:
    old files null-fill it, and predicates on it stay exact."""
    import pyarrow as pa
    import pyarrow.parquet as pqm

    spark = registered
    out = str(tmp_path / "t")
    t1 = pa.table({"url": [f"u{i}" for i in range(80)],
                   "n": pa.array(list(range(80)), pa.int64())})
    p1 = str(tmp_path / "v1.parquet")
    pqm.write_table(t1, p1)
    spark.read.parquet(p1).write.format("webcodec").mode("append").option("path", out).save()
    t2 = pa.table({"url": [f"v{i}" for i in range(20)],
                   "n": pa.array(list(range(80, 100)), pa.int64()),
                   "lang": ["en"] * 20})
    p2 = str(tmp_path / "v2.parquet")
    pqm.write_table(t2, p2)
    spark.read.parquet(p2).write.format("webcodec").mode("append").option("path", out).save()

    back = spark.read.format("webcodec").option("path", out).load()
    assert back.count() == 100
    assert back.filter(F.col("lang").isNull()).count() == 80
    assert back.filter(F.col("lang") == "en").count() == 20


def test_datasource_time_travel(registered, src_parquet, tmp_path):
    spark = registered
    out = str(tmp_path / "t")
    df = spark.read.parquet(src_parquet)
    df.limit(1_500).write.format("webcodec").option("path", out).mode("append").save()
    df.write.format("webcodec").option("path", out).mode("append").save()
    old = spark.read.format("webcodec").option("path", out).option("snapshot_id", "1").load()
    new = spark.read.format("webcodec").option("path", out).load()
    assert old.count() == 1_500
    assert new.count() == 5_500


def test_struct_column_through_datasource(registered, src_parquet, tmp_path):
    """One-level struct (E1 subset) survives the full Spark path: Arrow
    write -> shredded chunks -> decode -> struct field projection."""
    spark = registered
    out = str(tmp_path / "t")
    df = (
        spark.read.parquet(src_parquet)
        .select(
            "url",
            F.when(
                F.length("url") % 5 != 2,
                F.struct(
                    F.col("lang").alias("l"),
                    F.length("text").alias("n"),
                    (F.length("text") * 0.5).alias("x"),
                ),
            ).alias("meta"),
        )
    )
    df.write.format("webcodec").mode("append").option("path", out).save()
    back = spark.read.format("webcodec").option("path", out).load()
    assert back.schema["meta"].dataType.simpleString() == "struct<l:string,n:int,x:double>"
    assert df.exceptAll(back).count() == 0
    assert back.exceptAll(df).count() == 0
    # struct-field projection decodes (pruning of untouched siblings happens
    # at chunk level inside the file reader)
    got = back.select(F.col("meta.l").alias("l")).groupBy("l").count().collect()
    want = df.select(F.col("meta.l").alias("l")).groupBy("l").count().collect()
    key = lambda r: (r[0] is None, r)  # noqa: E731
    assert sorted(map(tuple, got), key=key) == sorted(map(tuple, want), key=key)


def test_struct_added_column_null_fill(registered, src_parquet, tmp_path):
    """Iceberg add-column semantics for a STRUCT column: files written
    before the evolution decode it as typed nulls."""
    spark = registered
    out = str(tmp_path / "t")
    df = spark.read.parquet(src_parquet)
    df.select("url", "lang").write.format("webcodec").mode("append").option(
        "path", out
    ).save()
    evolved = df.select(
        "url", "lang", F.struct(F.length("text").alias("n")).alias("extra")
    ).limit(0)
    evolved.write.format("webcodec").mode("append").option("path", out).save()
    back = spark.read.format("webcodec").option("path", out).load()
    assert back.schema["extra"].dataType.simpleString() == "struct<n:int>"
    assert back.count() == 4_000
    assert back.filter(F.col("extra").isNull()).count() == 4_000


def test_map_column_through_datasource(registered, src_parquet, tmp_path):
    """Map columns survive the full Spark path (compared via to_json —
    Spark forbids set operations on map types)."""
    spark = registered
    out = str(tmp_path / "t")
    df = spark.read.parquet(src_parquet).select(
        "url",
        F.when(
            F.length("url") % 5 != 2,
            F.create_map(F.lit("lang"), F.col("lang"), F.lit("l"),
                         F.length("text").cast("string")),
        ).alias("m"),
    )
    df.write.format("webcodec").mode("append").option("path", out).save()
    back = spark.read.format("webcodec").option("path", out).load()
    assert back.schema["m"].dataType.simpleString() == "map<string,string>"
    a = df.select("url", F.to_json("m").alias("j"))
    b = back.select("url", F.to_json("m").alias("j"))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_nested_types_through_datasource(registered, src_parquet, tmp_path):
    """array<struct> and array<array> survive the full Spark path exactly."""
    spark = registered
    out = str(tmp_path / "t")
    df = spark.read.parquet(src_parquet)
    words = F.slice(F.split("text", " "), 1, 3)
    sdf = df.select(
        "url",
        F.transform(words, lambda w: F.struct(w.alias("w"), F.length(w).alias("n"))).alias("ws"),
        F.array(F.array(F.length("text").cast("long")),
                F.array(F.lit(1).cast("long"))).alias("nn"),
    )
    sdf.write.format("webcodec").mode("append").option("path", out).save()
    back = spark.read.format("webcodec").option("path", out).load()
    assert back.schema["ws"].dataType.simpleString() == "array<struct<w:string,n:int>>"
    assert back.schema["nn"].dataType.simpleString() == "array<array<bigint>>"
    assert sdf.exceptAll(back).count() == 0
    assert back.exceptAll(sdf).count() == 0


def test_intra_file_row_range_splits(registered, src_parquet, tmp_path):
    """Large files split into row-range tasks (the row-group-split analogue):
    forcing tiny target_split_bytes must yield >1 partition per file while
    the scan result stays exact."""
    spark = registered
    out = str(tmp_path / "t")
    df = spark.read.parquet(src_parquet)
    df.coalesce(1).write.format("webcodec").mode("append").option("path", out).save()

    from webcodec.spark.datasource import WebcodecReader
    from pyspark.sql.types import StructType

    r = WebcodecReader({"path": out, "target_split_bytes": "4096"}, StructType([]))
    parts = r.partitions()
    assert len(parts) > 4  # one physical file, many row-range splits
    assert parts[0].row_lo == 0 and parts[-1].row_hi == 4_000

    back = (
        spark.read.format("webcodec")
        .option("path", out)
        .option("target_split_bytes", "65536")
        .load()
    )
    assert back.count() == 4_000
    assert df.exceptAll(back).count() == 0
    assert back.exceptAll(df).count() == 0

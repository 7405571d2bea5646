"""Iceberg-style hidden partitioning: transforms, fanout writes, manifest
pruning (identity / days / hours / months / years / bucket / truncate).
Pruning is exact on the tuple and always conservative; the residual filter
re-applies predicates after decode, so results never depend on it."""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pytest

from webcodec.spark.partition import (
    bucket_of_array,
    bucket_of_value,
    file_may_match,
    parse_partition_spec,
    split_by_partition,
    transform_array,
)

US_DAY = 86_400_000_000


# ------------------------------ unit: parse ----------------------------------


def test_parse_spec_shapes():
    spec = parse_partition_spec(
        ["lang", "days(ts)", "bucket(16, url)", "truncate(4, url)", "years(ts)"]
    )
    assert [f["kind"] for f in spec] == [
        "identity", "days", "bucket", "truncate", "years"]
    assert [f["name"] for f in spec] == [
        "lang", "ts_day", "url_bucket", "url_trunc", "ts_year"]
    assert spec[2]["arg"] == 16 and spec[3]["arg"] == 4


@pytest.mark.parametrize("bad", ["days(a,b)", "bucket(url)", "bucket(0, url)",
                                 "frob(x)", "a b", "truncate(x, url)"])
def test_parse_spec_rejects(bad):
    with pytest.raises(ValueError):
        parse_partition_spec([bad])


def test_parse_spec_duplicate_names():
    with pytest.raises(ValueError):
        parse_partition_spec(["lang", "lang"])


# --------------------------- unit: transforms --------------------------------


def test_temporal_transforms():
    ts = pa.array(
        [datetime.datetime(2024, 3, 1, 5), datetime.datetime(2024, 3, 2, 23, 59),
         None, datetime.datetime(1969, 12, 31, 23)],
        pa.timestamp("us"),
    )
    days = transform_array(ts, {"kind": "days", "col": "ts", "arg": None})
    assert days.to_pylist() == [19783, 19784, None, -1]  # floor for pre-epoch
    hours = transform_array(ts, {"kind": "hours", "col": "ts", "arg": None})
    assert hours.to_pylist()[0] == 19783 * 24 + 5
    months = transform_array(ts, {"kind": "months", "col": "ts", "arg": None})
    assert months.to_pylist()[:2] == [(2024 - 1970) * 12 + 2] * 2
    years = transform_array(ts, {"kind": "years", "col": "ts", "arg": None})
    assert years.to_pylist() == [54, 54, None, -1]


def test_truncate_transforms():
    s = transform_array(pa.array(["alphabet", "al", None]),
                        {"kind": "truncate", "col": "s", "arg": 3})
    assert s.to_pylist() == ["alp", "al", None]
    i = transform_array(pa.array([17, -3, 1000], pa.int64()),
                        {"kind": "truncate", "col": "i", "arg": 10})
    assert i.to_pylist() == [10, -10, 1000]  # floor semantics for negatives


def test_bucket_deterministic_and_matching_prune_hash():
    arr = pa.array([f"url-{i}" for i in range(100)])
    b = bucket_of_array(arr, 8)
    assert set(np.unique(b)) <= set(range(8))
    # driver-side single-value twin must agree value-for-value
    for i in (0, 17, 99):
        assert bucket_of_value(f"url-{i}", 8) == int(b[i])
    ints = pa.array(np.arange(50), pa.int64())
    bi = bucket_of_array(ints, 4)
    for i in (0, 7, 49):
        assert bucket_of_value(i, 4) == int(bi[i])


def test_split_by_partition_groups_and_nulls():
    t = pa.table({
        "lang": pa.array(["en", "de", None, "en", "de", "en"]),
        "n": pa.array(range(6), pa.int64()),
    })
    spec = parse_partition_spec(["lang"])
    groups = split_by_partition(t, spec)
    by_key = {str(v["lang"]): sub for v, sub in groups}
    assert set(by_key) == {"en", "de", "None"}
    assert by_key["en"].column("n").to_pylist() == [0, 3, 5]
    assert by_key["None"].column("n").to_pylist() == [2]
    # every row lands in exactly one group
    assert sum(sub.num_rows for _, sub in groups) == 6


# ----------------------------- unit: pruning ---------------------------------


def test_file_may_match_days_interval():
    spec = parse_partition_spec(["days(ts)"])
    day = 19783  # 2024-03-01
    fpart = {"ts_day": day}
    inside = datetime.datetime(2024, 3, 1, 12)
    before = datetime.datetime(2024, 2, 28)
    assert file_may_match(spec, fpart, "ts", "==", inside, "timestamp")
    assert not file_may_match(spec, fpart, "ts", "==", before, "timestamp")
    assert file_may_match(spec, fpart, "ts", ">=", before, "timestamp")
    assert not file_may_match(spec, fpart, "ts", "<", before, "timestamp")
    # day's very first microsecond is included
    start = datetime.datetime(2024, 3, 1)
    assert file_may_match(spec, fpart, "ts", "<=", start, "timestamp")


def test_file_may_match_identity_and_null_partition():
    spec = parse_partition_spec(["lang"])
    assert file_may_match(spec, {"lang": "en"}, "lang", "==", "en", "string")
    assert not file_may_match(spec, {"lang": "de"}, "lang", "==", "en", "string")
    assert file_may_match(spec, {"lang": "en"}, "lang", "in", ["en", "fr"], "string")
    assert not file_may_match(spec, {"lang": "en"}, "lang", "isnull", None, "string")
    # null partition: only isnull can match
    assert file_may_match(spec, {"lang": None}, "lang", "isnull", None, "string")
    assert not file_may_match(spec, {"lang": None}, "lang", "==", "en", "string")
    assert not file_may_match(spec, {"lang": None}, "lang", "notnull", None, "string")
    # predicates on other columns never prune
    assert file_may_match(spec, {"lang": "de"}, "other", "==", 5, "bigint")


def test_file_may_match_bucket_truncate():
    spec = parse_partition_spec(["bucket(8, url)", "truncate(3, name)",
                                 "truncate(100, n)"])
    u = "https://example.com/x"
    b = bucket_of_value(u, 8)
    fpart = {"url_bucket": b, "name_trunc": "alp", "n_trunc": 300}
    assert file_may_match(spec, fpart, "url", "==", u, "string")
    assert not file_may_match(spec, {"url_bucket": (b + 1) % 8}, "url", "==", u,
                              "string")
    # bucket can't prune ranges — conservative keep
    assert file_may_match(spec, fpart, "url", ">=", "a", "string")
    assert file_may_match(spec, fpart, "name", "==", "alpha", "string")
    assert not file_may_match(spec, fpart, "name", "==", "beta", "string")
    assert file_may_match(spec, fpart, "name", "startswith", "al", "string")
    assert file_may_match(spec, fpart, "n", "==", 342, "bigint")
    assert not file_may_match(spec, fpart, "n", "==", 400, "bigint")
    assert not file_may_match(spec, fpart, "n", ">", 399, "bigint")


def test_file_may_match_months_years():
    spec = parse_partition_spec(["months(ts)"])
    fpart = {"ts_month": (2024 - 1970) * 12 + 2}  # 2024-03
    assert file_may_match(spec, fpart, "ts", "==",
                          datetime.datetime(2024, 3, 31, 23, 59), "timestamp")
    assert not file_may_match(spec, fpart, "ts", "==",
                              datetime.datetime(2024, 4, 1), "timestamp")
    yspec = parse_partition_spec(["years(ts)"])
    yf = {"ts_year": 54}
    assert file_may_match(yspec, yf, "ts", "<=",
                          datetime.datetime(2024, 12, 31, 23, 59), "timestamp")
    assert not file_may_match(yspec, yf, "ts", ">",
                              datetime.datetime(2024, 12, 31, 23, 59, 59, 999999),
                              "timestamp")


# ------------------------------ e2e via Spark --------------------------------


@pytest.fixture(scope="module")
def events_pq(tmp_path_factory):
    """Synthetic events parquet: 4 days x 3 event types, with some null types."""
    rng = np.random.default_rng(3)
    n = 8_000
    base = int(datetime.datetime(2024, 1, 10).timestamp()) * 1_000_000
    ts = base + rng.integers(0, 4 * US_DAY, n)
    etype = np.array(["click", "view", "buy"])[rng.integers(0, 3, n)].astype(object)
    etype[rng.integers(0, n, 40)] = None
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(etype, pa.string()),
        "value": pa.array(rng.standard_normal(n), pa.float64()),
    })
    d = tmp_path_factory.mktemp("events_part")
    import pyarrow.parquet as pq

    path = str(d / "events.parquet")
    pq.write_table(t, path, row_group_size=1_000)
    return path, t


def _encode_partitioned(spark, src, out, partition_by, **kw):
    from webcodec.spark.encode_job import encode_table

    df = spark.read.parquet(src)
    return encode_table(df, out, partition_by=partition_by, write_metrics=False,
                        **kw)


def test_files_mode_fanout_and_pruning(spark, events_pq, tmp_path):
    from webcodec.spark.decode_job import read_encoded
    from webcodec.spark.table import SnapshotTable

    src, t = events_pq
    out = str(tmp_path / "tbl")
    snap = _encode_partitioned(spark, src, out,
                               ["days(ts)", "event_type"],
                               target_partition_bytes=1 << 20)
    tbl = SnapshotTable(out)
    files = tbl.data_files()
    # every file carries a partition tuple with both fields
    assert all(set(f["partition"]) == {"ts_day", "event_type"} for f in files)
    # fanout happened: more files than splits, one tuple per file
    tuples = {(f["partition"]["ts_day"], f["partition"]["event_type"])
              for f in files}
    assert len(tuples) >= 4 * 3  # 4 days x 3 types (+ null partitions)

    # pruning: one-day range + equality keeps only that day's click files
    lo = datetime.datetime(2024, 1, 11)
    hi = datetime.datetime(2024, 1, 12)
    pred = [("ts", ">=", lo), ("ts", "<", hi), ("event_type", "==", "click")]
    kept = tbl.data_files(pred)
    assert 0 < len(kept) < len(files)
    assert all(f["partition"]["ts_day"] == 19733 and
               f["partition"]["event_type"] == "click" for f in kept)

    # correctness: full read-back equals the source (modulo order)
    back = read_encoded(spark, out).orderBy("event_id").toPandas()
    assert len(back) == t.num_rows
    assert back["event_id"].tolist() == list(range(t.num_rows))
    # rows survived the fanout with values intact
    src_df = spark.read.parquet(src).orderBy("event_id").toPandas()
    assert (back["value"].to_numpy() == src_df["value"].to_numpy()).all()

    # pruned read returns exactly the filtered rows
    sel = read_encoded(spark, out, predicate=pred).toPandas()
    import pandas as pd

    mask = (src_df["ts"] >= pd.Timestamp(lo)) & (src_df["ts"] < pd.Timestamp(hi)) \
        & (src_df["event_type"] == "click")
    assert len(sel) == int(mask.sum())


def test_null_partition_isnull_scan(spark, events_pq, tmp_path):
    from webcodec.spark.decode_job import read_encoded
    from webcodec.spark.table import SnapshotTable

    src, t = events_pq
    out = str(tmp_path / "tbl_null")
    _encode_partitioned(spark, src, out, ["event_type"],
                        target_partition_bytes=1 << 20)
    tbl = SnapshotTable(out)
    kept = tbl.data_files([("event_type", "isnull", None)])
    assert kept and all(f["partition"]["event_type"] is None for f in kept)
    n_null = read_encoded(
        spark, out, predicate=[("event_type", "isnull", None)]).count()
    assert n_null == t.column("event_type").null_count


def test_scan_mode_bucket_fanout(spark, events_pq, tmp_path):
    from webcodec.spark.decode_job import read_encoded
    from webcodec.spark.table import SnapshotTable

    src, t = events_pq
    out = str(tmp_path / "tbl_bucket")
    df = spark.read.parquet(src).repartition(3)
    from webcodec.spark.encode_job import encode_table

    encode_table(df, out, mode="scan", partition_by=["bucket(4, event_id)"],
                 write_metrics=False)
    tbl = SnapshotTable(out)
    files = tbl.data_files()
    assert {f["partition"]["event_id_bucket"] for f in files} == {0, 1, 2, 3}
    # equality prunes to ONE bucket (min/max stats could never do this)
    kept = tbl.data_files([("event_id", "==", 4321)])
    assert len({f["partition"]["event_id_bucket"] for f in kept}) == 1
    row = read_encoded(spark, out, predicate=[("event_id", "==", 4321)]).collect()
    assert len(row) == 1 and row[0]["event_id"] == 4321
    assert read_encoded(spark, out).count() == t.num_rows


def test_partitioned_resume_skips_done_splits(spark, events_pq, tmp_path):
    from webcodec.spark.table import SnapshotTable

    src, _ = events_pq
    out = str(tmp_path / "tbl_resume")
    s1 = _encode_partitioned(spark, src, out, ["event_type"],
                             target_partition_bytes=1 << 20)
    # a rerun over the same input sees every split committed -> no new snapshot
    s2 = _encode_partitioned(spark, src, out, ["event_type"],
                             target_partition_bytes=1 << 20)
    assert s2["snapshot_id"] == s1["snapshot_id"]
    assert s2["total_rows"] == s1["total_rows"]
    tbl = SnapshotTable(out)
    assert tbl.current_snapshot_id() == s1["snapshot_id"]


def test_partition_by_rejected_on_clustered(spark, events_pq):
    from webcodec.spark.encode_job import encode_table

    src, _ = events_pq
    df = spark.read.parquet(src)
    with pytest.raises(ValueError, match="partition_by"):
        encode_table(df, "/tmp/never", mode="clustered", url_col="event_type",
                     partition_by=["event_type"])


def test_compact_preserves_partition_tuples(spark, events_pq, tmp_path):
    """Compaction bin-packs only within one partition tuple, keeps the tuple
    on merged entries, and pruning stays exact afterwards."""
    from webcodec.spark.decode_job import read_encoded
    from webcodec.spark.maintenance import compact
    from webcodec.spark.table import SnapshotTable

    src, t = events_pq
    out = str(tmp_path / "tbl_compact")
    # tiny splits -> many small same-tuple files across fanout tasks
    _encode_partitioned(spark, src, out, ["event_type"],
                        target_partition_bytes=64 << 10)
    tbl = SnapshotTable(out)
    before = tbl.data_files()
    snap = compact(out)
    after = tbl.data_files()
    assert len(after) < len(before)
    # one tuple per merged file, tuple kept on every entry
    assert all("partition" in f for f in after)
    assert snap["total_rows"] == t.num_rows
    kept = tbl.data_files([("event_type", "==", "click")])
    assert kept and all(f["partition"]["event_type"] == "click" for f in kept)
    n = read_encoded(spark, out,
                     predicate=[("event_type", "==", "click")]).count()
    import pyarrow.compute as pc

    assert n == pc.sum(pc.equal(t.column("event_type"), "click")).as_py()


def test_datasource_partitioned_write_and_prune(spark, events_pq, tmp_path):
    """df.write.format('webcodec').option('partition_by', ...) fans out per
    tuple; reads prune through the same manifest machinery."""
    from webcodec.spark.datasource import WebcodecDataSource
    from webcodec.spark.table import SnapshotTable

    spark.dataSource.register(WebcodecDataSource)
    src, t = events_pq
    out = str(tmp_path / "ds_part")
    (spark.read.parquet(src).repartition(2)
        .write.format("webcodec").option("path", out)
        .option("partition_by", "days(ts), event_type").mode("append").save())
    tbl = SnapshotTable(out)
    files = tbl.data_files()
    assert all(set(f["partition"]) == {"ts_day", "event_type"} for f in files)
    kept = tbl.data_files([("event_type", "==", "view")])
    assert 0 < len(kept) < len(files)
    assert all(f["partition"]["event_type"] == "view" for f in kept)
    back = (spark.read.format("webcodec").option("path", out).load())
    assert back.count() == t.num_rows
    n_view = back.filter("event_type = 'view'").count()
    import pyarrow.compute as pc

    assert n_view == pc.sum(pc.equal(t.column("event_type"), "view")).as_py()


def test_datasource_partitioned_fanout_flush(spark, events_pq, tmp_path):
    """A tiny flush threshold cuts several files per tuple — bounded memory
    per open tuple — and pruning/readback still hold."""
    from webcodec.spark.datasource import WebcodecDataSource
    from webcodec.spark.table import SnapshotTable

    spark.dataSource.register(WebcodecDataSource)
    src, t = events_pq
    out = str(tmp_path / "ds_flush")
    # small Arrow batches so one tuple spans many batches and crosses the
    # flush threshold repeatedly
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
    try:
        (spark.read.parquet(src).coalesce(1)
            .write.format("webcodec").option("path", out)
            .option("partition_by", "event_type")
            .option("fanout_flush_bytes", str(8 << 10)).mode("append").save())
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    tbl = SnapshotTable(out)
    files = tbl.data_files()
    per_tuple: dict = {}
    for f in files:
        per_tuple.setdefault(f["partition"]["event_type"], []).append(f)
    assert max(len(v) for v in per_tuple.values()) > 1  # several files per tuple
    back = spark.read.format("webcodec").option("path", out).load()
    assert back.count() == t.num_rows


def test_streaming_sink_partitioned(spark, events_pq, tmp_path):
    from webcodec.spark.datasource import WebcodecDataSource
    from webcodec.spark.table import SnapshotTable

    spark.dataSource.register(WebcodecDataSource)
    src, t = events_pq
    out = str(tmp_path / "stream_part")
    ckpt = str(tmp_path / "ckpt")
    sdf = (spark.readStream.schema(spark.read.parquet(src).schema)
           .parquet(str(tmp_path_parent(src))))
    q = (sdf.writeStream.format("webcodec").option("path", out)
         .option("partition_by", "event_type")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    tbl = SnapshotTable(out)
    files = tbl.data_files()
    assert files and all("partition" in f for f in files)
    kept = tbl.data_files([("event_type", "==", "buy")])
    assert all(f["partition"]["event_type"] == "buy" for f in kept)
    back = spark.read.format("webcodec").option("path", out).load()
    assert back.count() == t.num_rows


def tmp_path_parent(p):
    import os

    return os.path.dirname(p)


def test_rewrite_preserves_partition_tuples(spark, events_pq, tmp_path):
    """rewrite_encoded is 1:1 per source file — tuples and the spec carry
    into the destination, so pruning works there too; a projection that
    drops a spec source column drops the spec (tuples would dangle)."""
    from webcodec.spark.maintenance import rewrite_encoded
    from webcodec.spark.table import SnapshotTable
    from webcodec.config import EncoderConfig

    src, t = events_pq
    out = str(tmp_path / "tbl_src")
    _encode_partitioned(spark, src, out, ["event_type"],
                        target_partition_bytes=1 << 20)
    dst = str(tmp_path / "tbl_dst")
    rewrite_encoded(spark, out, dst, EncoderConfig(compression="lz4"))
    dtbl = SnapshotTable(dst)
    files = dtbl.data_files()
    assert all("partition" in f for f in files)
    kept = dtbl.data_files([("event_type", "==", "click")])
    assert 0 < len(kept) < len(files)

    # projection that drops the spec's source column -> spec dropped
    dst2 = str(tmp_path / "tbl_dst2")
    rewrite_encoded(spark, out, dst2, columns=["event_id", "value"])
    snap2 = SnapshotTable(dst2).read_snapshot()
    assert "partition_spec" not in (snap2.get("properties") or {})
    assert all("partition" not in f for f in snap2["files"])


def test_months_transform_is_utc_not_session_local():
    """months()/years() must use UTC calendar math even on tz-aware arrays —
    pc.year/pc.month would localize and disagree with the UTC month bounds
    pruning uses (a row near a month boundary would be silently pruned)."""
    # 2023-12-31T19:00 UTC = 2024-01-01T00:30 in Asia/Kolkata
    ts = pa.array([datetime.datetime(2023, 12, 31, 19, 0)],
                  pa.timestamp("us")).cast(pa.timestamp("us", tz="Asia/Kolkata"))
    m = transform_array(ts, {"kind": "months", "col": "ts", "arg": None})
    assert m.to_pylist() == [(2023 - 1970) * 12 + 11]  # Dec-2023 in UTC
    y = transform_array(ts, {"kind": "years", "col": "ts", "arg": None})
    assert y.to_pylist() == [53]
    # and pruning agrees: the UTC instant matches its own file
    spec = parse_partition_spec(["months(ts)"])
    assert file_may_match(spec, {"ts_month": (2023 - 1970) * 12 + 11}, "ts",
                          "==", datetime.datetime(2023, 12, 31, 19, 0),
                          "timestamp")


def test_spec_change_across_appends_rejected(spark, events_pq, tmp_path):
    """bucket(16)->bucket(8) shares the field name url_bucket; evaluating old
    tuples under the new arg would silently mis-prune — the commit must
    refuse a changed spec."""
    src, _ = events_pq
    out = str(tmp_path / "tbl_specchange")
    _encode_partitioned(spark, src, out, ["bucket(16, event_id)"],
                        target_partition_bytes=1 << 20)
    with pytest.raises(Exception, match="partition spec changed"):
        from webcodec.spark.encode_job import encode_table

        encode_table(spark.read.parquet(src), out, resume=False,
                     partition_by=["bucket(8, event_id)"], write_metrics=False)


def test_plain_append_keeps_spec_for_pruning(spark, events_pq, tmp_path):
    """A spec-less append to a partitioned table carries the spec forward:
    old files keep exact pruning, the new untupled files are kept
    conservatively."""
    from webcodec.spark.datasource import WebcodecDataSource
    from webcodec.spark.table import SnapshotTable

    spark.dataSource.register(WebcodecDataSource)
    src, t = events_pq
    out = str(tmp_path / "tbl_carry")
    _encode_partitioned(spark, src, out, ["event_type"],
                        target_partition_bytes=1 << 20)
    (spark.read.parquet(src).write.format("webcodec").option("path", out)
        .mode("append").save())
    tbl = SnapshotTable(out)
    snap = tbl.read_snapshot()
    assert (snap["properties"] or {}).get("partition_spec")
    kept = tbl.data_files([("event_type", "==", "click")])
    tupled = [f for f in kept if f.get("partition")]
    untupled = [f for f in kept if not f.get("partition")]
    assert tupled and untupled  # old files pruned exactly, new kept
    assert all(f["partition"]["event_type"] == "click" for f in tupled)


def test_resume_skip_never_aliases_plain_pids(spark, events_pq, tmp_path):
    """Fanout pids and plain split ids share the integer domain (fanout
    split 0 emits pids 0..k): the resume skip-set must only consider
    same-kind manifest entries, or a partitioned append over a plain table
    would silently skip splits (and vice versa)."""
    from webcodec.spark.encode_job import encode_table
    from webcodec.spark.table import SnapshotTable

    src, t = events_pq
    out = str(tmp_path / "tbl_alias")
    # plain (non-partitioned) encode commits pids 0..N
    encode_table(spark.read.parquet(src), out, write_metrics=False,
                 target_partition_bytes=1 << 20)
    n1 = SnapshotTable(out).read_snapshot()["total_rows"]
    assert n1 == t.num_rows
    # partitioned append with resume=True must NOT treat plain pids as done
    encode_table(spark.read.parquet(src), out, write_metrics=False,
                 partition_by=["event_type"], target_partition_bytes=1 << 20)
    assert SnapshotTable(out).read_snapshot()["total_rows"] == 2 * t.num_rows


def test_fanout_stream_flushes_bounded(tmp_path):
    """_fanout_stream cuts a tuple's file at the flush threshold — several
    files per tuple, full coverage, bounded buffers."""
    import pyarrow as pa

    from webcodec.config import EncoderConfig
    from webcodec.spark.encode_job import _fanout_stream
    from webcodec.spark.partition import parse_partition_spec
    from webcodec import filefmt

    n = 6_000
    t = pa.table({
        "k": pa.array(np.arange(n) % 3, pa.int64()),
        "v": pa.array([f"payload-{i}" for i in range(n)]),
    })
    spec = parse_partition_spec(["k"])
    data_dir = str(tmp_path)
    rows = list(_fanout_stream(data_dir, 7, iter(t.to_batches(max_chunksize=500)),
                               EncoderConfig(), None, spec, flush_bytes=4 << 10))
    import os as _os

    files = [f for f in _os.listdir(data_dir) if f.endswith(".wcd")]
    assert len(files) > 3  # multiple flushes per tuple
    total = sum(filefmt.read_footer_path(_os.path.join(data_dir, f))["num_rows"]
                for f in files)
    assert total == n


def test_hash_distribution_reduces_file_count(spark, events_pq, tmp_path):
    """distribution='hash' co-locates same-tuple rows (one opt-in shuffle),
    so the fanout emits ~1 file per tuple instead of tasks x tuples; results
    stay identical."""
    from webcodec.spark.decode_job import read_encoded
    from webcodec.spark.encode_job import encode_table
    from webcodec.spark.table import SnapshotTable

    src, t = events_pq
    out1 = str(tmp_path / "nodist")
    encode_table(spark.read.parquet(src), out1, partition_by=["event_type"],
                 write_metrics=False, target_partition_bytes=64 << 10)
    out2 = str(tmp_path / "hashdist")
    encode_table(spark.read.parquet(src), out2, partition_by=["event_type"],
                 distribution="hash", write_metrics=False)
    n1 = len(SnapshotTable(out1).read_snapshot()["files"])
    n2 = len(SnapshotTable(out2).read_snapshot()["files"])
    assert n2 < n1  # tuples co-located -> fewer files
    assert read_encoded(spark, out2).count() == t.num_rows
    kept = SnapshotTable(out2).data_files([("event_type", "==", "click")])
    assert kept and all(f["partition"]["event_type"] == "click" for f in kept)

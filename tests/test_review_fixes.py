"""Regression tests for the round-3 review findings: schema-evolution edge
cases in deletes/renames/rollback/rewrite, streaming upsert semantics."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webcodec.spark.table import SnapshotTable


def _pq(tmp_path, name, t):
    p = str(tmp_path / name)
    pq.write_table(t, p)
    return p


def _base_table(tmp_path, spark, n=600):
    from webcodec.spark.encode_job import encode_table

    t = pa.table({"k": pa.array(np.arange(n), pa.int64()),
                  "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(n)])})
    src = _pq(tmp_path, "src.parquet", t)
    out = str(tmp_path / "tbl")
    encode_table(spark.read.parquet(src), out, write_metrics=False)
    return out, t, src


def test_delete_where_on_added_column_no_renames(spark, tmp_path):
    """Predicate over a column ADDED after old files were written must treat
    those files as all-null (no match), not crash with StopIteration —
    even when the table has no renames (aliases={})."""
    from webcodec.spark.datasource import WebcodecDataSource
    from webcodec.spark.decode_job import read_encoded
    from webcodec.spark.maintenance import delete_where

    spark.dataSource.register(WebcodecDataSource)
    out, t, src = _base_table(tmp_path, spark)
    # append a second batch WITH an extra column (schema evolution)
    t2 = pa.table({"k": pa.array(np.arange(1000, 1400), pa.int64()),
                   "lang": pa.array(["pt"] * 400),
                   "score": pa.array(np.arange(400), pa.int64())})
    src2 = _pq(tmp_path, "src2.parquet", t2)
    (spark.read.parquet(src2).write.format("webcodec")
        .option("path", out).mode("append").save())
    res = delete_where(spark, out, ("score", ">=", 350))
    assert res["deleted_rows"] == 50  # only new-file rows have score
    assert read_encoded(spark, out).count() == t.num_rows + 400 - 50


def test_retired_rename_name_cannot_rebind(spark, tmp_path):
    from webcodec.spark.datasource import WebcodecDataSource
    from webcodec.spark.maintenance import rename_column

    spark.dataSource.register(WebcodecDataSource)
    out, t, src = _base_table(tmp_path, spark)
    rename_column(out, "lang", "language")
    # appending a NEW column named "lang" must be refused — old files still
    # carry a "lang" chunk that would serve stale pre-rename values
    t2 = pa.table({"k": pa.array([9999], pa.int64()),
                   "language": pa.array(["en"]),
                   "lang": pa.array(["sneaky"])})
    src2 = _pq(tmp_path, "src2.parquet", t2)
    with pytest.raises(Exception, match="retired"):
        (spark.read.parquet(src2).write.format("webcodec")
            .option("path", out).mode("append").save())
    # renaming another column TO the retired name is refused too
    with pytest.raises(ValueError, match="retired"):
        rename_column(out, "k", "lang")


def test_rollback_preserves_dropped_tombstones(spark, tmp_path):
    from webcodec.spark.datasource import WebcodecDataSource
    from webcodec.spark.maintenance import drop_column

    spark.dataSource.register(WebcodecDataSource)
    out, t, src = _base_table(tmp_path, spark)
    drop_column(out, "lang")
    tbl = SnapshotTable(out)
    sid = tbl.current_snapshot_id()
    tbl.rollback_to(sid)  # rollback to the post-drop state
    snap = tbl.read_snapshot()
    assert snap.get("dropped_columns") == ["lang"]
    # the re-add guard still fires after the rollback
    t2 = pa.table({"k": pa.array([1], pa.int64()), "lang": pa.array(["x"])})
    src2 = _pq(tmp_path, "src2.parquet", t2)
    with pytest.raises(Exception, match="dropped"):
        (spark.read.parquet(src2).write.format("webcodec")
            .option("path", out).mode("append").save())


def test_rewrite_with_columns_after_rename(spark, tmp_path):
    """rewrite_encoded(columns=[renamed]) must localize per file like the
    read path instead of StopIteration-ing on pre-rename files."""
    from webcodec.spark.decode_job import read_encoded
    from webcodec.spark.maintenance import rename_column, rewrite_encoded

    out, t, src = _base_table(tmp_path, spark)
    rename_column(out, "lang", "language")
    dst = str(tmp_path / "dst")
    rewrite_encoded(spark, out, dst, columns=["k", "language"])
    back = read_encoded(spark, dst).orderBy("k").toPandas()
    assert list(back.columns) == ["k", "language"]
    assert back["language"].tolist() == t.column("lang").to_pylist()


def test_rewrite_default_purges_dropped_column(spark, tmp_path):
    """drop_column + rewrite_encoded (no columns arg) must PHYSICALLY remove
    the dropped column's chunks — the documented takedown path."""
    from webcodec import filefmt
    from webcodec.spark.maintenance import drop_column, rewrite_encoded

    out, t, src = _base_table(tmp_path, spark)
    drop_column(out, "lang")
    dst = str(tmp_path / "dst")
    rewrite_encoded(spark, out, dst)
    dtbl = SnapshotTable(dst)
    for f in dtbl.read_snapshot()["files"]:
        footer = filefmt.read_footer_path(os.path.join(dst, f["path"]))
        names = {c["name"] for c in (footer.get("groups") or [footer])[0]["chunks"]}
        assert "lang" not in names  # physically gone, not just hidden


def test_streaming_upsert_raises_even_with_ignore_changes(spark, tmp_path):
    from webcodec.spark.datasource import WebcodecStreamReader
    from webcodec.spark.maintenance import upsert

    out, t, src = _base_table(tmp_path, spark)
    df2 = spark.createDataFrame([(5, "xx"), (10_000, "new")], "k long, lang string")
    upsert(spark, out, df2, key_cols=["k"])
    r = WebcodecStreamReader({"path": out, "ignore_changes": "true"})
    r.initialOffset()
    with pytest.raises(RuntimeError, match="upsert"):
        end = r.latestOffset()
        r._files_between({"snapshot_id": 0, "pos": -1}, end)


def test_concurrent_replace_vs_delete_detected(spark, tmp_path):
    """A delete computed against pre-compaction files must fail loudly when a
    replace commit (compaction) landed in between — silently re-pointing the
    pid at the stale path would drop the other merged rows."""
    from webcodec.spark.encode_job import encode_table
    from webcodec.spark.maintenance import compact

    t = pa.table({"k": pa.array(np.arange(3_000), pa.int64()),
                  "lang": pa.array([["en", "de"][i % 2] for i in range(3_000)])})
    p = str(tmp_path / "src.parquet")
    pq.write_table(t, p, row_group_size=500)  # several row groups -> splits
    out = str(tmp_path / "tbl")
    encode_table(spark.read.parquet(p), out, write_metrics=False,
                 target_partition_bytes=8 << 10)  # several small files
    tbl = SnapshotTable(out)
    snap = tbl.read_snapshot()
    assert len(snap["files"]) > 1
    # simulate the race: entries captured pre-compaction...
    stale_entries = []
    for f in snap["files"][:1]:
        e = dict(f)
        e["delete_files"] = ["deletes/fake.bin"]
        stale_entries.append(e)
    compact(out)  # ...replace commit lands first
    with pytest.raises(RuntimeError, match="concurrent replace"):
        tbl.commit(stale_entries, snap["schema"], operation="delete",
                   require_visible={e["partition_id"] for e in stale_entries})


def test_archive_profile_with_levelless_codecs(tmp_path):
    """binary_compression_level must clamp/drop for codecs that reject
    levels (gzip caps at 9, snappy/lz4 take none) instead of crashing."""
    from webcodec import filefmt
    from webcodec.config import EncoderConfig

    t = pa.table({"b": pa.array([b"payload" * 20] * 50, pa.binary())})
    for codec in ("gzip", "snappy", "lz4"):
        path = str(tmp_path / f"{codec}.wcd")
        filefmt.write_table(t, path, EncoderConfig.archive(compression=codec))
        assert filefmt.read_table(path).equals(t), codec


def test_decimal_in_list_roundtrips(tmp_path):
    """Formerly a dispatch-time TypeError; list<decimal> now shreds via the
    lo/hi lane split shared with top-level decimals."""
    from decimal import Decimal

    from webcodec import filefmt

    t = pa.table({"d": pa.array([[Decimal("1.5")]], pa.list_(pa.decimal128(20, 3)))})
    path = str(tmp_path / "x.wcd")
    filefmt.write_table(t, path)
    assert filefmt.read_table(path).equals(t)


# ---------------- fourth review pass (core files) ----------------


def test_list_float32_null_children_roundtrip(tmp_path):
    """The LIST_FLOAT32 BSS fast path has no child-validity stream; null
    elements must route to the generic LIST layout, not round-trip as NaN."""
    from webcodec import filefmt

    t = pa.table({"e": pa.array([[1.0, None, 3.0], [4.0], None, []],
                                pa.list_(pa.float32()))})
    path = str(tmp_path / "e.wcd")
    filefmt.write_table(t, path)
    back = filefmt.read_table(path)
    assert back.column("e").to_pylist() == t.column("e").to_pylist()
    # null-free embeddings keep the fast path
    t2 = pa.table({"e": pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32()))})
    p2 = str(tmp_path / "e2.wcd")
    footer = filefmt.write_table(t2, p2)
    from webcodec.types import Encoding, PhysType

    assert footer["chunks"][0]["phys"] == int(PhysType.LIST_FLOAT32)
    assert filefmt.read_table(p2).equals(t2)


def test_invalid_encoding_override_rejected(tmp_path):
    """An explicit rle/delta override on floats used to astype-TRUNCATE the
    values; it must raise instead."""
    from webcodec import filefmt
    from webcodec.config import EncoderConfig

    t = pa.table({"x": pa.array([3.5, 2.25, 7.125], pa.float64())})
    for enc in ("rle", "delta_binary_packed"):
        with pytest.raises(ValueError, match="invalid"):
            filefmt.write_table(t, str(tmp_path / "x.wcd"),
                                EncoderConfig(column_encoding={"x": enc}))
    # valid float overrides still work
    for enc in ("alp", "byte_stream_split", "plain"):
        p = str(tmp_path / f"{enc}.wcd")
        filefmt.write_table(t, p, EncoderConfig(column_encoding={"x": enc}))
        assert filefmt.read_table(p).equals(t)


def test_ddl_parse_decimal_inside_struct_map():
    from webcodec.spark.decode_job import _arrow_type_of_spark

    t = _arrow_type_of_spark("struct<a:decimal(10,2),b:int>")
    assert t == pa.struct([("a", pa.decimal128(10, 2)), ("b", pa.int32())])
    m = _arrow_type_of_spark("map<string,decimal(10,2)>")
    assert m == pa.map_(pa.string(), pa.decimal128(10, 2))


def test_sample_stats_honor_slice_offset():
    from webcodec.stats import sample_stats
    from webcodec.types import PhysType

    vals = [f"prefix-{i:04d}" for i in range(3000)]
    full = pa.array(vals, pa.large_string())
    sliced = full.slice(1000, 1000)
    copied = pa.array(vals[1000:2000], pa.large_string())
    a = sample_stats(sliced, PhysType.STRING)
    b = sample_stats(copied, PhysType.STRING)
    assert abs(a.prefix_ratio - b.prefix_ratio) < 1e-9
    assert abs(a.byte_entropy - b.byte_entropy) < 1e-9


def test_truncated_max_stat_never_underestimates():
    from webcodec.stats import _encode_stat
    from webcodec.types import PhysType

    v = "\U0010FFFF" * 70
    assert _encode_stat(v, PhysType.STRING, 64, is_max=True) is None  # drop
    bumped = _encode_stat("a" * 70, PhysType.STRING, 64, is_max=True)
    assert bumped is not None and bumped > "a" * 70
    # bump never lands in the surrogate range
    s = chr(0xD7FF) * 65
    out = _encode_stat(s, PhysType.STRING, 64, is_max=True)
    assert out is not None and not any(0xD800 <= ord(c) <= 0xDFFF for c in out)
    assert out > s[:64]


def test_read_encoded_unknown_column_raises(spark, tmp_path):
    from webcodec.spark.decode_job import read_encoded

    out, t, src = _base_table(tmp_path, spark, n=50)
    with pytest.raises(KeyError, match="lagn"):
        read_encoded(spark, out, columns=["k", "lagn"])


def test_prefix_encode_wide_value_fallback():
    """One multi-MB outlier must not blow up the padded prefix matrices —
    encode falls back to the sequential path and round-trips exactly."""
    import numpy as np

    from webcodec.kernels import prefix

    vals = [b"https://a.example/" + bytes([65 + i % 26]) * 30 for i in range(2_000)]
    vals[700] = b"https://a.example/" + b"X" * (2 << 20)  # 2MB outlier
    offs = np.zeros(len(vals) + 1, dtype=np.int64)
    np.cumsum([len(v) for v in vals], out=offs[1:])
    data = b"".join(vals)
    enc = prefix.encode(offs, data)
    back = prefix.decode(enc, len(vals))
    got = [v.as_py() if not isinstance(v.as_py(), bytes) else v.as_py()
           for v in back]
    want = [v.decode() if isinstance(got[0], str) else v for v in vals]
    assert got == want


# ---------------- sixth review pass (filefmt core / types / kernels) ----------


def test_isnull_pruning_with_stats_disabled(tmp_path):
    """statistics_enabled=False must not fabricate null_count=0 — isnull
    file-pruning would silently drop matching rows."""
    from webcodec import filefmt
    from webcodec.config import EncoderConfig

    t = pa.table({"x": pa.array([1, None, 3, None], pa.int64())})
    path = str(tmp_path / "ns.wcd")
    footer = filefmt.write_table(t, path, EncoderConfig(statistics_enabled=False))
    assert footer["chunks"][0]["stats"]["null_count"] == 2
    got = filefmt.read_table(path, predicate=("x", "isnull", None))
    assert got.num_rows == 2


def test_struct_duplicate_field_names_rejected(tmp_path):
    from webcodec import filefmt

    dup = pa.StructArray.from_arrays(
        [pa.array([1, 2], pa.int64()), pa.array(["x", "y"])], names=["a", "a"])
    t = pa.Table.from_arrays([dup], names=["st"])
    with pytest.raises(TypeError, match="duplicate field names"):
        filefmt.write_table(t, str(tmp_path / "d.wcd"))


def test_reserved_separator_in_column_name_rejected(tmp_path):
    from webcodec import filefmt

    t = pa.table({"a\x1fb": pa.array([1, 2, 3], pa.int64())})
    with pytest.raises(ValueError, match="reserved separator"):
        filefmt.write_table(t, str(tmp_path / "sep.wcd"))


def test_huge_values_page_cap(tmp_path):
    """Multi-MB blobs must not produce >4GB page bodies (u32 header
    overflow): the 256-row page floor yields to a ~1GB byte cap."""
    from webcodec import filefmt

    blob = b"Z" * (8 << 20)  # 8MB each
    t = pa.table({"b": pa.array([blob] * 300, pa.binary())})
    path = str(tmp_path / "big.wcd")
    footer = filefmt.write_table(t, path)  # used to raise struct.error
    assert len(footer["chunks"][0]["pages"]) >= 3  # several bounded pages
    # read in row ranges: one full read would exceed Arrow's 2GB binary
    # offset cap when concatenating decoded parts (pa.binary limit, noted
    # in COVERAGE — real files target 128MB so never hit it)
    for lo in (0, 100, 250):
        part = filefmt.read_table(path, row_range=(lo, lo + 50))
        assert part.num_rows == 50
        assert part.column("b")[0].as_py() == blob


def test_list_child_field_roundtrips(tmp_path):
    from webcodec import filefmt

    typ = pa.list_(pa.field("element", pa.int64(), nullable=False))
    t = pa.table({"l": pa.array([[1, 2], [3]], typ)})
    path = str(tmp_path / "lnn.wcd")
    filefmt.write_table(t, path)
    back = filefmt.read_table(path)
    f = back.schema.field("l").type
    assert f.value_field.name == "element"
    assert f.value_field.nullable is False
    assert back.equals(t)


def test_read_table_empty_projection(tmp_path):
    from webcodec import filefmt

    t = pa.table({"x": pa.array(range(10), pa.int64())})
    path = str(tmp_path / "p.wcd")
    filefmt.write_table(t, path)
    got = filefmt.read_table(path, columns=[])
    assert got.num_columns == 0


def test_null_fill_only_read_keeps_row_count(spark, tmp_path):
    """Projecting ONLY columns added after a file was written must null-fill
    with that file's full row count (via its cheapest chunk), not zero."""
    from webcodec.spark.datasource import WebcodecDataSource
    from webcodec.spark.decode_job import read_encoded

    spark.dataSource.register(WebcodecDataSource)
    out, t, src = _base_table(tmp_path, spark, n=80)
    t2 = pa.table({"k": pa.array([10_000], pa.int64()),
                   "lang": pa.array(["en"]), "extra": pa.array([7], pa.int64())})
    src2 = _pq(tmp_path, "src2.parquet", t2)
    (spark.read.parquet(src2).write.format("webcodec")
        .option("path", out).mode("append").save())
    got = read_encoded(spark, out, columns=["extra"]).toPandas()
    assert len(got) == 81  # 80 null-filled + 1 real
    assert got["extra"].notna().sum() == 1


def test_uvarint_negative_raises():
    from webcodec.kernels.varint import write_uvarint

    with pytest.raises(ValueError, match="non-negative"):
        write_uvarint(-1)


def test_bloom_hash_blocking_parity():
    import numpy as np

    from webcodec.kernels import bloom

    vals = [f"value-{i % 997}-{i}".encode() for i in range(2_100_000)]
    lens = np.fromiter((len(v) for v in vals), dtype=np.int64, count=len(vals))
    offs = np.zeros(len(vals) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    data = np.frombuffer(b"".join(vals), dtype=np.uint8)
    blocked = bloom.hash_values(offs, data)
    # parity vs per-value scalar hash on a sample spanning block boundaries
    for i in (0, 1_048_575, 1_048_576, 2_000_000, 2_099_999):
        assert blocked[i] == bloom.hash_one(vals[i]), i

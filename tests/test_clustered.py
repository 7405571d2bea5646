"""Clustered-mode encode: Arrow-native two-phase shuffle (salted domain
clustering with zero JVM transfer)."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from webcodec.fixtures import webpages
from webcodec.spark.table import SnapshotTable

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def src(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("csrc") / "webpages.parquet")
    pq.write_table(webpages(8_000), path, row_group_size=1_000)
    return path


def test_clustered_roundtrip(spark, src, tmp_path):
    from webcodec.spark.decode_job import verify_roundtrip
    from webcodec.spark.encode_job import encode_table

    df = spark.read.parquet(src)
    out = str(tmp_path / "t")
    snap = encode_table(
        df, out, url_col="url", mode="clustered",
        target_partition_bytes=1 << 21, write_metrics=False,
    )
    assert snap["total_rows"] == 8_000
    assert len(snap["files"]) > 1
    assert not os.path.exists(os.path.join(out, "_shuffle"))  # spills cleaned
    res = verify_roundtrip(spark, df, out, ["url"])
    assert res["ok"], res


def test_clustered_domains_cluster_and_hot_split(spark, src, tmp_path):
    """Cold domains land in exactly ONE file; the Zipf head domain (site0000,
    ~25% of rows) is salted across multiple buckets."""
    from webcodec.spark.decode_job import read_encoded
    from webcodec.spark.encode_job import encode_table

    df = spark.read.parquet(src)
    out = str(tmp_path / "t")
    encode_table(
        df, out, url_col="url", mode="clustered",
        target_partition_bytes=1 << 21, num_partitions=8, write_metrics=False,
    )
    from pyspark.sql import functions as F

    dec = read_encoded(spark, out)
    # file identity via the spark input partition is not exposed; use the
    # manifest: count per-file url-domain spread by decoding file by file
    tbl = SnapshotTable(out)
    files = tbl.data_files()
    from webcodec import filefmt

    domain_files: dict[str, set[int]] = {}
    hot_rows = 0
    for f in files:
        t = filefmt.read_table(os.path.join(out, f["path"]), columns=["url"])
        import pyarrow.compute as pc

        doms = set(
            u.split("://")[1].split("/")[0] for u in t.column("url").to_pylist()
        )
        for d in doms:
            domain_files.setdefault(d, set()).add(f["partition_id"])
    # multi-file domains must be exactly the Zipf head(s) the sampler marked
    # hot — fixtures name domains site{rank:03d}.*, so rank is parseable
    def rank(d: str) -> int:
        return int(d.split(".")[0].removeprefix("site"))

    multi = sorted(d for d, s in domain_files.items() if len(s) > 1)
    assert multi, "expected at least the Zipf head to be salted"
    assert all(rank(d) < 8 for d in multi), multi  # only heads split
    # the Zipf head is split across several buckets (skew handled)
    assert len(domain_files.get("site000.com", set())) >= 2


def test_clustered_resume(spark, src, tmp_path):
    from webcodec.spark.encode_job import encode_table

    df = spark.read.parquet(src)
    out = str(tmp_path / "t")
    s1 = encode_table(df, out, url_col="url", mode="clustered",
                      target_partition_bytes=1 << 21, write_metrics=False)
    mtimes = {
        f["path"]: os.path.getmtime(os.path.join(out, f["path"])) for f in s1["files"]
    }
    s2 = encode_table(df, out, url_col="url", mode="clustered",
                      target_partition_bytes=1 << 21, write_metrics=False)
    assert {f["path"] for f in s2["files"]} == set(mtimes)
    for p, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, p)) == m  # nothing re-encoded


def test_spill_retry_overwrites_idempotently(spark, tmp_path):
    """A task retried after a post-write crash (or a speculative duplicate)
    must OVERWRITE its split's spill, not add a second one phase B would
    double-read: spills are named by SPLIT id and renamed into place from
    attempt-unique temps. Simulated by running the spill closure twice over
    the same split ("two attempts")."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from webcodec.fixtures import webpages
    from webcodec.spark.encode_job import _make_spill_fn, plan_file_splits

    src = str(tmp_path / "s.parquet")
    pq.write_table(webpages(2_000), src)
    splits = plan_file_splits([src], 1 << 20)
    shuffle_dir = str(tmp_path / "shuf")
    os.makedirs(shuffle_dir)

    class _BC:  # stand-in for the Spark broadcast
        value = splits

    fn = _make_spill_fn(shuffle_dir, "url", 7, ([], {}), frozenset(), _BC())
    batch = pa.RecordBatch.from_pydict({"id": pa.array([0], pa.int64())})
    rows1 = list(fn(iter([batch])))
    rows2 = list(fn(iter([batch])))  # the "retry"
    arrow_files = [f for f in os.listdir(shuffle_dir) if f.endswith(".arrow")]
    assert len(arrow_files) == 1  # overwrote, not doubled
    assert not [f for f in os.listdir(shuffle_dir) if ".tmp" in f]
    # side-channel segment rows (bucket, split, off, len, rows) identical
    # across attempts — the per-bucket index shards built from them are
    # therefore deterministic too
    def flat(rows):
        return sorted(
            tuple(int(rb.column(c)[j].as_py())
                  for c in ("bucket", "split", "off", "len", "rows"))
            for rb in rows
            for j in range(rb.num_rows)
        )
    assert flat(rows1) == flat(rows2)
    assert sum(t[4] for t in flat(rows1)) == 2_000

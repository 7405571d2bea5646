"""Sharded-manifest snapshot layer (Iceberg-style manifest lists).

The metadata-scale contract: an append commit writes ONE new shard with only
the files it adds plus an O(#shards) snapshot pointer — never a rewrite of
the full table file list. These tests pin that contract plus the semantics
that must survive it: later-shard-wins overwrite by partition_id, exact
totals under overwrites, bounded shard count via consolidation, legacy
(inline ``files``) snapshot migration, streaming delta fast path, and
expire_snapshots shard vacuuming.
"""

import json
import os
import time

from webcodec.spark import table as table_mod
from webcodec.spark.maintenance import expire_snapshots
from webcodec.spark.table import MANIFEST_MERGE_THRESHOLD, SnapshotTable


def _entry(pid, rows=10, raw=1000, comp=100, path=None):
    return {
        "partition_id": pid,
        "path": path or f"data/part-{pid:05d}-x{pid}.wcd",
        "rows": rows,
        "raw_bytes": raw,
        "compressed_bytes": comp,
    }


SCHEMA = [{"name": "url", "type": "string"}]


def test_append_commit_writes_one_shard_and_reuses_parents(tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit([_entry(0), _entry(1)], SCHEMA)
    tbl.commit([_entry(2)], SCHEMA)
    s1 = tbl.read_snapshot_meta(1)
    s2 = tbl.read_snapshot_meta(2)
    assert "files" not in s1 and "files" not in s2  # pointer stays small
    assert len(s1["manifests"]) == 1
    assert len(s2["manifests"]) == 2
    # parent shard is REUSED byte-identically, not rewritten
    assert s2["manifests"][0]["path"] == s1["manifests"][0]["path"]
    # the new shard holds ONLY the delta
    assert s2["manifests"][1]["count"] == 1
    snap = tbl.read_snapshot()
    assert [f["partition_id"] for f in snap["files"]] == [0, 1, 2]
    assert snap["total_rows"] == 30


def test_commit_cost_is_o_delta_not_o_table(tmp_path):
    """The actual scale claim: bytes written by an append commit are
    proportional to the files it adds, not to the table size."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit([_entry(i) for i in range(2000)], SCHEMA)
    meta = tbl.meta_dir
    before = {fn: os.path.getsize(os.path.join(meta, fn)) for fn in os.listdir(meta)}
    tbl.commit([_entry(2000)], SCHEMA)
    after = {fn: os.path.getsize(os.path.join(meta, fn)) for fn in os.listdir(meta)}
    new_bytes = sum(sz for fn, sz in after.items() if fn not in before)
    # 2000-file table; the one-file append writes ~300 B of shard + a small
    # pointer. A monolithic rewrite would be >200 kB.
    assert new_bytes < 5000, new_bytes
    # and parent shards were not touched
    assert all(after[fn] == sz for fn, sz in before.items() if fn in after)


def test_overwrite_same_partition_masks_and_keeps_totals_exact(tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit([_entry(0, rows=10), _entry(1, rows=20)], SCHEMA)
    tbl.commit([_entry(1, rows=99, raw=5000, comp=500, path="data/part-1-v2.wcd")], SCHEMA)
    snap = tbl.read_snapshot()
    by_pid = {f["partition_id"]: f for f in snap["files"]}
    assert len(snap["files"]) == 2
    assert by_pid[1]["rows"] == 99 and by_pid[1]["path"] == "data/part-1-v2.wcd"
    assert snap["total_rows"] == 10 + 99
    assert snap["total_raw_bytes"] == 1000 + 5000
    assert snap["total_compressed_bytes"] == 100 + 500


def test_overwrite_chain_subtracts_currently_visible_entry(tmp_path):
    """Three commits to the same pid: totals must subtract the VISIBLE
    (latest) masked entry each time, not every historic one."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit([_entry(7, rows=10)], SCHEMA)
    tbl.commit([_entry(7, rows=20, path="data/p7-v2.wcd")], SCHEMA)
    tbl.commit([_entry(7, rows=30, path="data/p7-v3.wcd")], SCHEMA)
    snap = tbl.read_snapshot()
    assert snap["total_rows"] == 30
    assert len(snap["files"]) == 1


def test_consolidation_bounds_shard_count(tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    n = MANIFEST_MERGE_THRESHOLD + 5
    for i in range(n):
        tbl.commit([_entry(i)], SCHEMA)
    meta = tbl.read_snapshot_meta()
    assert len(meta["manifests"]) <= MANIFEST_MERGE_THRESHOLD
    snap = tbl.read_snapshot()
    assert [f["partition_id"] for f in snap["files"]] == list(range(n))
    assert snap["total_rows"] == 10 * n


def test_replace_commit_drops_parent_shards(tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit([_entry(0), _entry(1)], SCHEMA)
    tbl.commit([_entry(0, rows=5, path="data/compacted-0.wcd")], SCHEMA, replace=True)
    meta = tbl.read_snapshot_meta()
    assert len(meta["manifests"]) == 1
    snap = tbl.read_snapshot()
    assert [f["path"] for f in snap["files"]] == ["data/compacted-0.wcd"]
    assert snap["total_rows"] == 5
    assert snap["operation"] == "replace"


def test_legacy_inline_snapshot_reads_and_migrates(tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.init()
    legacy = {
        "snapshot_id": 1,
        "parent_id": None,
        "operation": "append",
        "committed_at": time.time(),
        "schema": SCHEMA,
        "properties": {},
        "files": [_entry(0), _entry(1)],
        "total_rows": 20,
        "total_raw_bytes": 2000,
        "total_compressed_bytes": 200,
    }
    with open(os.path.join(tbl.meta_dir, "snapshot-1.json"), "w") as f:
        json.dump(legacy, f)
    with open(os.path.join(tbl.meta_dir, "current"), "w") as f:
        f.write("1")
    # legacy read: unchanged
    assert len(tbl.read_snapshot()["files"]) == 2
    assert tbl.completed_partition_ids() == {0, 1}
    # first shard-native commit on top migrates the inline list into a shard
    tbl.commit([_entry(2)], SCHEMA)
    snap = tbl.read_snapshot()
    assert [f["partition_id"] for f in snap["files"]] == [0, 1, 2]
    assert snap["total_rows"] == 30
    assert len(tbl.read_snapshot_meta()["manifests"]) == 2


def test_added_files_reads_only_new_shards(tmp_path, monkeypatch):
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.commit([_entry(i) for i in range(50)], SCHEMA)
    tbl.commit([_entry(50), _entry(51)], SCHEMA)
    reads = []
    orig = SnapshotTable.read_manifest

    def spy(self, path):
        reads.append(path)
        return orig(self, path)

    monkeypatch.setattr(SnapshotTable, "read_manifest", spy)
    delta = tbl.added_files(2)
    assert sorted(f["partition_id"] for f in delta) == [50, 51]
    assert len(reads) == 1  # the big base shard was never opened


def test_added_files_correct_after_consolidation(tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    for i in range(MANIFEST_MERGE_THRESHOLD + 1):
        tbl.commit([_entry(i)], SCHEMA)
    # this commit triggers consolidation → fast path unavailable; the
    # fallback path diff must still return exactly the delta
    sid = tbl.current_snapshot_id()
    delta = tbl.added_files(sid)
    assert [f["partition_id"] for f in delta] == [MANIFEST_MERGE_THRESHOLD]


def test_expire_snapshots_vacuums_unreferenced_shards(tmp_path):
    tbl = SnapshotTable(str(tmp_path / "t"))
    # real data files so the data-vacuum path has something to check
    for i in range(3):
        fp = os.path.join(tbl.table_dir, "data", f"part-{i}.wcd")
        os.makedirs(os.path.dirname(fp), exist_ok=True)
        with open(fp, "wb") as f:
            f.write(b"x")
        tbl.commit([_entry(i, path=f"data/part-{i}.wcd")], SCHEMA)
    # replace commit: prior shards become unreferenced once history expires
    with open(os.path.join(tbl.table_dir, "data", "compacted.wcd"), "wb") as f:
        f.write(b"y")
    tbl.commit([_entry(0, path="data/compacted.wcd")], SCHEMA, replace=True)
    # age everything so the in-flight grace window doesn't keep orphans
    now = time.time()
    for root in (tbl.meta_dir, tbl.data_dir):
        for fn in os.listdir(root):
            os.utime(os.path.join(root, fn), (now - 3600, now - 3600))
    # re-age current snapshot to now so cutoff > shard mtimes
    cur = tbl.current_snapshot_id()
    snap_path = os.path.join(tbl.meta_dir, f"snapshot-{cur}.json")
    os.utime(snap_path, (now, now))
    res = expire_snapshots(tbl.table_dir, keep_last=1)
    assert res["removed_manifests"] >= 3
    shards_left = [fn for fn in os.listdir(tbl.meta_dir) if fn.startswith("manifest-")]
    assert len(shards_left) == 1
    snap = tbl.read_snapshot()
    assert [f["path"] for f in snap["files"]] == ["data/compacted.wcd"]


def test_expire_grace_protects_in_flight_commit_artifacts(tmp_path):
    """A claim-race loser has a written-but-unreferenced shard on disk while
    it retries; expire_snapshots must not vacuum it (nor fresh data files)
    within the grace window, even when its mtime predates the winning
    commit's committed_at."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.init()
    # simulate the loser's artifacts: shard + data file written first
    orphan_shard = tbl._write_manifest([_entry(99, path="data/inflight.wcd")])
    with open(os.path.join(tbl.data_dir, "inflight.wcd"), "wb") as f:
        f.write(b"x")
    # the winner commits afterwards (committed_at > orphan mtimes)
    with open(os.path.join(tbl.data_dir, "w.wcd"), "wb") as f:
        f.write(b"y")
    tbl.commit([_entry(0, path="data/w.wcd")], SCHEMA)
    res = expire_snapshots(tbl.table_dir, keep_last=1)
    assert res["removed_files"] == 0 and res["removed_manifests"] == 0
    assert os.path.exists(os.path.join(tbl.meta_dir, orphan_shard["path"]))
    assert os.path.exists(os.path.join(tbl.data_dir, "inflight.wcd"))
    # past the grace window the same artifacts do get vacuumed
    res = expire_snapshots(tbl.table_dir, keep_last=1, grace_seconds=0)
    assert res["removed_files"] == 1 and res["removed_manifests"] == 1


def test_concurrent_committers_no_lost_update_with_shards(tmp_path):
    """The r2 optimistic-concurrency guarantee must survive sharding:
    interleave two committers at the claim step via monkeypatching."""
    tbl_a = SnapshotTable(str(tmp_path / "t"))
    tbl_b = SnapshotTable(str(tmp_path / "t"))
    tbl_a.commit([_entry(0)], SCHEMA)
    # B commits between A's parent read and A's claim: emulate by letting B
    # finish first, then A (A's claim of id 2 fails, retries on B's result)
    orig_link = os.link
    state = {"injected": False}

    def racing_link(src, dst):
        if not state["injected"] and dst.endswith("snapshot-2.json"):
            state["injected"] = True
            tbl_b.commit([_entry(1)], SCHEMA)
        return orig_link(src, dst)

    table_mod.os.link = racing_link
    try:
        tbl_a.commit([_entry(2)], SCHEMA)
    finally:
        table_mod.os.link = orig_link
    snap = tbl_a.read_snapshot()
    assert {f["partition_id"] for f in snap["files"]} == {0, 1, 2}
    assert snap["total_rows"] == 30


def test_concurrent_delete_commits_merge_sidecars(tmp_path):
    """Two delete jobs that both read parent snapshot N and commit entry
    updates for the SAME partition must not lose each other's sidecar
    references — delete commits union delete_files with the parent's
    visible entry at claim time."""
    tbl = SnapshotTable(str(tmp_path / "t"))
    base = _entry(0, rows=100)
    tbl.commit([base], SCHEMA)
    # both "jobs" start from snapshot 1
    e_a = dict(base, delete_files=["deletes/a.bin"], deleted_rows=3)
    e_b = dict(base, delete_files=["deletes/b.bin"], deleted_rows=5)
    tbl.commit([e_a], SCHEMA, operation="delete")
    tbl.commit([e_b], SCHEMA, operation="delete")  # stale: built from snap 1
    f = tbl.read_snapshot()["files"][0]
    assert set(f["delete_files"]) == {"deletes/a.bin", "deletes/b.bin"}
    snap = tbl.read_snapshot()
    assert snap["total_rows"] == 100  # physical rows unchanged by deletes

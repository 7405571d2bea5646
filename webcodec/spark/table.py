"""Iceberg-style snapshot/manifest layer (dependency-free).

SURVEY.md §7.0: no Iceberg jar in the sandbox — we implement the minimal
snapshot semantics the north_rule needs: a table directory

    table/
      data/part-<pid>-<token>.wcd      encoded partition files
      meta/snapshot-<N>.json           manifest: files + per-file stats + lineage
      meta/current                     text file holding the latest snapshot N

Commits are atomic (write tmp + rename). A restarted job reads the current
snapshot and skips partitions already committed (resume = anti-join on
partition_id — SURVEY.md §2.G).
"""

from __future__ import annotations

import json
import os
import time
import uuid


class SnapshotTable:
    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.data_dir = os.path.join(table_dir, "data")
        self.meta_dir = os.path.join(table_dir, "meta")

    def init(self) -> None:
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)

    # -- snapshots --------------------------------------------------------------

    def current_snapshot_id(self) -> int | None:
        cur = os.path.join(self.meta_dir, "current")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            txt = f.read().strip()
        return int(txt) if txt else None

    def read_snapshot(self, snapshot_id: int | None = None) -> dict | None:
        """Snapshot payload, or ``None`` when the id is unknown/expired —
        callers (time travel, streaming delta computation) must handle the
        expired case explicitly rather than crash on a raw OSError."""
        if snapshot_id is None:
            snapshot_id = self.current_snapshot_id()
        if snapshot_id is None:
            return None
        path = os.path.join(self.meta_dir, f"snapshot-{snapshot_id}.json")
        try:
            with open(path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _max_snapshot_id(self) -> int | None:
        """Highest snapshot id ON DISK (the concurrency source of truth —
        the ``current`` pointer may lag a writer that hasn't flipped yet)."""
        try:
            ids = [
                int(fn[len("snapshot-"):-len(".json")])
                for fn in os.listdir(self.meta_dir)
                if fn.startswith("snapshot-") and fn.endswith(".json")
            ]
        except FileNotFoundError:
            return None
        return max(ids) if ids else None

    def commit(
        self,
        files: list[dict],
        schema: list[dict],
        properties: dict | None = None,
        replace: bool = False,
    ) -> dict:
        """Two-phase commit with optimistic concurrency: merge new files over
        the parent snapshot (or replace it entirely when ``replace``), CLAIM
        snapshot-(N+1) via exclusive create (a concurrent committer that
        claimed it first forces a re-read of the parent and a retry — no
        lost updates), then flip ``current`` forward-only."""
        self.init()
        for _attempt in range(100):
            parent_id = self._max_snapshot_id()
            parent = self.read_snapshot(parent_id) if parent_id is not None else None
            merged: dict[int, dict] = {}
            if parent and not replace:
                for f in parent["files"]:
                    merged[f["partition_id"]] = f
            for f in files:
                merged[f["partition_id"]] = f
            new_id = (parent_id or 0) + 1
            snap = {
                "snapshot_id": new_id,
                "parent_id": parent_id,
                # append = files only added; replace = existing data rewritten
                # (compaction/transcode). Streaming readers must not diff a
                # replace snapshot as if its files were new rows.
                "operation": "replace" if replace else "append",
                "committed_at": time.time(),
                "schema": schema,
                "properties": properties or {},
                "files": sorted(merged.values(), key=lambda f: f["partition_id"]),
                "total_rows": int(sum(f["rows"] for f in merged.values())),
                "total_raw_bytes": int(sum(f["raw_bytes"] for f in merged.values())),
                "total_compressed_bytes": int(sum(f["compressed_bytes"] for f in merged.values())),
            }
            # fully write the payload to a private tmp, then CLAIM the final
            # name with an atomic hard link — losers get FileExistsError and
            # retry; winners' snapshots appear complete in one step (no
            # partial-read window for concurrent parent readers)
            final = os.path.join(self.meta_dir, f"snapshot-{new_id}.json")
            tmp = os.path.join(self.meta_dir, f".snapshot-{new_id}-{uuid.uuid4().hex}.tmp")
            with open(tmp, "w") as f:
                json.dump(snap, f)
            try:
                os.link(tmp, final)
            except FileExistsError:
                os.unlink(tmp)
                continue  # another committer won this id; retry on its result
            os.unlink(tmp)
            self._advance_current(new_id)
            return snap
        raise RuntimeError("snapshot commit contention: 100 retries exhausted")

    def _advance_current(self, new_id: int) -> None:
        """Move the ``current`` pointer forward only (a slower committer of a
        smaller id must not roll a newer commit back)."""
        for _ in range(10):
            cur = self.current_snapshot_id()
            if cur is not None and cur >= new_id:
                return
            cur_tmp = os.path.join(self.meta_dir, f".current-{uuid.uuid4().hex}.tmp")
            with open(cur_tmp, "w") as f:
                f.write(str(new_id))
            os.rename(cur_tmp, os.path.join(self.meta_dir, "current"))
            if (self.current_snapshot_id() or 0) >= new_id:
                return

    def completed_partition_ids(self) -> set[int]:
        snap = self.read_snapshot()
        if not snap:
            return set()
        return {f["partition_id"] for f in snap["files"]}

    def data_files(self, predicate=None, snapshot_id: int | None = None) -> list[dict]:
        """Files of a snapshot (current by default; pass ``snapshot_id`` for
        time travel — snapshots are immutable), pruned by chunk-level
        min/max + null-count stats when a predicate (single term or conjunct
        list, webcodec.predicate algebra) is given — file-level D2 analogue."""
        from webcodec import predicate as predmod
        from webcodec.types import PhysType

        snap = self.read_snapshot(snapshot_id)
        if not snap:
            return []
        files = snap["files"]
        conjuncts = predmod.normalize(predicate)
        if conjuncts is None:
            return files
        # normalize to the stats storage domain (micros/days/bytes)
        phys_of = {"timestamp": PhysType.TIMESTAMP_US, "timestamp_ntz": PhysType.TIMESTAMP_US,
                   "date": PhysType.DATE32, "binary": PhysType.BINARY}
        types = {f["name"]: f["type"] for f in snap["schema"]}
        kept = []
        for f in files:
            stats = f.get("column_stats") or {}
            ok = True
            for col, op, value in conjuncts:
                st = stats.get(col)
                if st is None:
                    continue  # unknown stats: conservative keep
                if not predmod.term_matches(st, op, value, phys_of.get(types.get(col, "")),
                                            f.get("rows")):
                    ok = False
                    break
            if ok:
                kept.append(f)
        return kept

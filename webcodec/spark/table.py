"""Iceberg-style snapshot/manifest layer (dependency-free).

SURVEY.md §7.0: no Iceberg jar in the sandbox — we implement the minimal
snapshot semantics the north_rule needs: a table directory

    table/
      data/part-<pid>-<token>.wcd      encoded partition files
      meta/manifest-<uuid>.json        immutable shard: a list of file entries
      meta/snapshot-<N>.json           small pointer: manifest list + totals
      meta/current                     text file holding the latest snapshot N

Metadata scales like Iceberg's manifest lists, not like a monolithic
manifest: an append commit writes ONE new shard holding only the files it
adds plus an O(#shards) snapshot pointer that reuses the parent's shards
unchanged — at 10^12-document scale (~10^6 data files) a commit writes
kilobytes, not the multi-hundred-MB full file list a monolithic
snapshot would rewrite every time. Shard merge order is significant:
a later shard's entry for a partition_id masks earlier ones (same
overwrite-by-partition_id semantics the monolithic format had), which is
what makes resume/overwrite commits O(delta) too. Shard count is bounded
by consolidation (amortized Iceberg-style manifest merge) once it passes
``MANIFEST_MERGE_THRESHOLD``.

Commits are atomic (write tmp + atomic link claim). A restarted job reads
the current snapshot and skips partitions already committed (resume =
anti-join on partition_id — SURVEY.md §2.G). Pre-shard snapshots (inline
``files``) remain readable; the first commit on top of one migrates the
parent file list into a consolidated shard.
"""

from __future__ import annotations

import json
import os
import time
import uuid

# Consolidate the manifest list into one shard when it grows past this many
# shards. Amortized cost: one O(files) rewrite every ~threshold commits,
# i.e. O(files/threshold) per commit — the same trade Iceberg's
# merge-on-commit manifest writer makes.
MANIFEST_MERGE_THRESHOLD = 32


def _check_retired_names(schema: list[dict]) -> None:
    """A column name that lives in ANOTHER column's rename chain must never
    be (re)bound: old files still carry a chunk under that name, so the
    alias-chain reader would serve the SAME chunk to two logical columns —
    stale pre-rename values instead of nulls."""
    names = {f["name"] for f in schema}
    for f in schema:
        for old in f.get("renamed_from") or ():
            if old in names and old != f["name"]:
                raise ValueError(
                    f"column name {old!r} was renamed to {f['name']!r} and is "
                    "retired: re-binding it would resurrect pre-rename chunk "
                    "data from old files — use a fresh name or rewrite the "
                    "table"
                )


def _entry_rollup(entries: list[dict]) -> dict:
    pids = [f["partition_id"] for f in entries]
    return {
        "count": len(entries),
        "rows": int(sum(f["rows"] for f in entries)),
        "raw_bytes": int(sum(f["raw_bytes"] for f in entries)),
        "compressed_bytes": int(sum(f["compressed_bytes"] for f in entries)),
        "min_pid": min(pids) if pids else 0,
        "max_pid": max(pids) if pids else -1,
    }


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

    def _read_json(self, name: str) -> dict | None:
        try:
            with open(os.path.join(self.meta_dir, name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def read_snapshot_meta(self, snapshot_id: int | None = None) -> dict | None:
        """The snapshot pointer WITHOUT materializing the file list — O(#shards).
        Use for operations that only need totals/schema/manifest identity
        (streaming delta fast path, schema lookup)."""
        if snapshot_id is None:
            snapshot_id = self.current_snapshot_id()
        if snapshot_id is None:
            return None
        return self._read_json(f"snapshot-{snapshot_id}.json")

    def read_manifest(self, path: str) -> list[dict]:
        """Entries of one immutable manifest shard (``path`` relative to meta/)."""
        doc = self._read_json(path)
        if doc is None:
            raise FileNotFoundError(
                f"manifest shard {path} of {self.table_dir} is missing "
                "(expired past a reader, or the table dir was truncated)"
            )
        return doc["entries"]

    def read_snapshot(self, snapshot_id: int | None = None) -> dict | None:
        """Snapshot payload with ``files`` materialized (shards merged in
        order, later shard wins per partition_id), or ``None`` when the id is
        unknown/expired — callers (time travel, streaming delta computation)
        must handle the expired case explicitly rather than crash on a raw
        OSError."""
        snap = self.read_snapshot_meta(snapshot_id)
        if snap is None or "files" in snap:  # legacy inline format
            return snap
        merged: dict[int, dict] = {}
        for m in snap["manifests"]:
            for f in self.read_manifest(m["path"]):
                merged[f["partition_id"]] = f
        snap["files"] = sorted(merged.values(), key=lambda f: f["partition_id"])
        return snap

    def history(self) -> list[dict]:
        """Audit log of surviving snapshots, oldest first (DESCRIBE HISTORY
        analogue): id, parent, operation, commit time, totals, and which ids
        a rollback restored — reads only the O(#snapshots) pointer files,
        never manifests or data."""
        try:
            ids = sorted(
                int(fn[len("snapshot-"):-len(".json")])
                for fn in os.listdir(self.meta_dir)
                if fn.startswith("snapshot-") and fn.endswith(".json")
            )
        except FileNotFoundError:
            return []
        out = []
        for sid in ids:
            s = self.read_snapshot_meta(sid)
            if s is None:
                continue
            row = {
                "snapshot_id": sid,
                "parent_id": s.get("parent_id"),
                "operation": s.get("operation", "append"),
                "committed_at": s.get("committed_at"),
                "total_rows": s.get("total_rows"),
                "total_compressed_bytes": s.get("total_compressed_bytes"),
            }
            rb = (s.get("properties") or {}).get("rolled_back_to")
            if rb is not None:
                row["rolled_back_to"] = rb
            out.append(row)
        return out

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

    def _write_manifest(self, entries: list[dict]) -> dict:
        """Write one immutable shard; returns its manifest-list row."""
        name = f"manifest-{uuid.uuid4().hex}.json"
        tmp = os.path.join(self.meta_dir, f".{name}.tmp")
        with open(tmp, "w") as f:
            json.dump({"entries": entries}, f)
        os.rename(tmp, os.path.join(self.meta_dir, name))
        return {"path": name, **_entry_rollup(entries)}

    def _visible_entries(
        self, manifests: list[dict], pids: set[int]
    ) -> dict[int, dict]:
        """The entries currently VISIBLE for ``pids`` (later shard wins).
        Walks shards newest-first and loads only shards whose
        [min_pid, max_pid] range contains SOME requested pid (bisect on the
        sorted pid set — a [min(pids), max(pids)] span test would load every
        shard when the set mixes small update pids with large namespaced
        insert pids, as upsert commits do); the common append path
        (monotonic partition_ids, disjoint from every shard range) loads
        nothing."""
        import bisect

        ordered = sorted(pids)
        need = set(pids)
        out: dict[int, dict] = {}
        for m in reversed(manifests):
            if not need:
                break
            # any requested pid inside this shard's [min_pid, max_pid]?
            i = bisect.bisect_left(ordered, m["min_pid"])
            if i >= len(ordered) or ordered[i] > m["max_pid"]:
                continue
            for f in self.read_manifest(m["path"]):
                pid = f["partition_id"]
                if pid in need:
                    need.discard(pid)
                    out[pid] = f
        return out

    def commit(
        self,
        files: list[dict],
        schema: list[dict],
        properties: dict | None = None,
        replace: bool = False,
        materialize: bool = True,
        operation: str | None = None,
        require_visible: set[int] | None = None,
    ) -> dict:
        """Two-phase commit with optimistic concurrency: write the new
        entries as ONE immutable manifest shard, build a snapshot pointer =
        parent's manifest list + that shard (or just it, when ``replace``),
        CLAIM snapshot-(N+1) via exclusive create (a concurrent committer
        that claimed it first forces a re-read of the parent and a retry —
        no lost updates), then flip ``current`` forward-only. Totals stay
        exact under overwrites via `_overridden_rollup` (targeted shard
        reads, none on the pure-append path). With ``materialize=False`` the
        returned snapshot is just the pointer (no ``files`` key, no O(table)
        read) — use it on hot commit paths (streaming microbatches) that
        ignore the return value."""
        self.init()
        # dedupe within the commit (last wins — matches historic dict merge)
        dedup = {f["partition_id"]: f for f in files}
        entries = sorted(dedup.values(), key=lambda f: f["partition_id"])
        # upsert commits carry delete-entry updates alongside new files and
        # need the same parent-dependent sidecar merge
        is_delete = operation in ("delete", "upsert")
        # delete commits merge against the parent's VISIBLE entries inside
        # the retry loop (their shard content depends on the parent), so the
        # shard is written per attempt there; append/replace shards are
        # parent-independent and written once
        shard = self._write_manifest(entries) if entries and not is_delete else None
        new_pids = set(dedup)
        migrated: dict[int, dict] = {}
        consolidated: dict[tuple, list] = {}  # claim-race retries reuse merges
        for _attempt in range(100):
            parent_id = self._max_snapshot_id()
            parent = (
                self.read_snapshot_meta(parent_id) if parent_id is not None else None
            )
            if parent is not None and "files" in parent and not replace:
                # legacy monolithic parent: migrate its inline list into a
                # consolidated shard once, then proceed shard-native (a
                # replace commit discards the parent list — skip the
                # migration write there; memoized so claim-race retries
                # don't orphan one full-table shard per attempt)
                parent = dict(parent)
                if parent_id not in migrated:
                    migrated[parent_id] = self._write_manifest(parent["files"])
                parent["manifests"] = [migrated[parent_id]]
            # schema-evolution bookkeeping survives ordinary commits: carry
            # forward rename provenance by column name, and refuse to re-add
            # a DROPPED name — old files still hold its chunks, so re-adding
            # would resurrect stale values instead of nulls (the pre-field-id
            # limitation; rename to a fresh name or rewrite the table)
            dropped = list((parent or {}).get("dropped_columns") or [])
            if dropped:
                clash = [f["name"] for f in schema if f["name"] in set(dropped)]
                if clash:
                    raise ValueError(
                        f"column(s) {clash} were dropped from this table; "
                        "re-adding the same name would resurrect stale chunk "
                        "data from pre-drop files — use a new name or "
                        "rewrite_encoded"
                    )
            if parent is not None:
                pschema = {f["name"]: f for f in parent.get("schema") or []}
                merged_schema = []
                for f in schema:
                    pf = pschema.get(f["name"])
                    if pf and pf.get("renamed_from") and not f.get("renamed_from"):
                        f = {**f, "renamed_from": list(pf["renamed_from"])}
                    merged_schema.append(f)
                schema = merged_schema
            _check_retired_names(schema)
            # partition-spec continuity (non-replace commits): a DIFFERENT
            # spec would make file_may_match evaluate old tuples under new
            # transform args (bucket(16)->bucket(8) shares the field name) —
            # silent mis-pruning. Same spec: fine. No spec on this commit:
            # carry the parent's forward so existing tuples keep pruning
            # (the new untupled files are conservatively kept).
            if parent is not None and not replace:
                pspec = (parent.get("properties") or {}).get("partition_spec")
                nspec = (properties or {}).get("partition_spec")
                if pspec and nspec and pspec != nspec:
                    raise ValueError(
                        "partition spec changed between commits "
                        f"({pspec} -> {nspec}); spec evolution is not "
                        "supported — rewrite the table (rewrite_encoded) or "
                        "write to a new table"
                    )
                if pspec and not nspec:
                    properties = {**(properties or {}), "partition_spec": pspec}
            if parent is None or replace:
                if is_delete and entries and shard is None:
                    shard = self._write_manifest(entries)
                manifests = [shard] if shard else []
                rows = shard["rows"] if shard else 0
                raw = shard["raw_bytes"] if shard else 0
                comp = shard["compressed_bytes"] if shard else 0
            else:
                visible = (
                    self._visible_entries(parent["manifests"], new_pids)
                    if new_pids
                    else {}
                )
                attempt_entries = entries
                if is_delete and entries:
                    # concurrency-safe sidecar merge: a racing delete/commit
                    # may have attached sidecars after our job read the
                    # table — union delete_files with the parent's visible
                    # entry so no sidecar reference is ever lost (positions
                    # may overlap across sidecars; readers np.unique them).
                    # A racing REPLACE (compaction/rewrite) is NOT mergeable:
                    # our positions index the old file layout, and re-pointing
                    # the pid at the old path would drop the other rows the
                    # replace merged under it — fail loudly instead.
                    attempt_entries = []
                    for e in entries:
                        pid = e["partition_id"]
                        pv = visible.get(pid)
                        required = require_visible is not None and pid in require_visible
                        if (pv is not None and pv.get("path") != e.get("path")) or (
                                required and pv is None):
                            raise RuntimeError(
                                "concurrent replace detected: partition "
                                f"{pid} now references "
                                f"{(pv or {}).get('path')!r}, but this "
                                f"delete/upsert was computed against "
                                f"{e.get('path')!r} (compaction or rewrite "
                                "ran mid-job) — re-run against the new "
                                "snapshot"
                            )
                        if pv is not None and pv.get("delete_files"):
                            e = dict(e)
                            mine = list(e.get("delete_files") or [])
                            e["delete_files"] = list(
                                dict.fromkeys(list(pv["delete_files"]) + mine)
                            )
                        attempt_entries.append(e)
                    shard = self._write_manifest(attempt_entries)
                manifests = list(parent["manifests"]) + ([shard] if shard else [])
                rows = parent["total_rows"] + (shard["rows"] if shard else 0)
                raw = parent["total_raw_bytes"] + (shard["raw_bytes"] if shard else 0)
                comp = parent["total_compressed_bytes"] + (
                    shard["compressed_bytes"] if shard else 0
                )
                for pv in visible.values():
                    rows -= pv["rows"]
                    raw -= pv["raw_bytes"]
                    comp -= pv["compressed_bytes"]
            if len(manifests) > MANIFEST_MERGE_THRESHOLD:
                # amortized Iceberg-style manifest merge: rewrite the merged
                # view as one shard so the list stays O(1)-ish per snapshot.
                # Memoized per source-shard tuple — a committer that loses
                # the claim race must not orphan one O(table) shard per retry
                mkey = tuple(m["path"] for m in manifests)
                if mkey not in consolidated:
                    merged: dict[int, dict] = {}
                    for m in manifests:
                        for f in self.read_manifest(m["path"]):
                            merged[f["partition_id"]] = f
                    consolidated[mkey] = [
                        self._write_manifest(
                            sorted(merged.values(), key=lambda f: f["partition_id"])
                        )
                    ]
                manifests = list(consolidated[mkey])
            new_id = (parent_id or 0) + 1
            snap = {
                "snapshot_id": new_id,
                "parent_id": parent_id,
                # append = files only added; replace = existing data
                # rewritten (compaction/transcode); delete = merge-on-read
                # positional deletes attached (paths unchanged, rows
                # removed). Streaming readers must not diff replace/delete
                # snapshots as if their files were new rows.
                "operation": operation or ("replace" if replace else "append"),
                "committed_at": time.time(),
                "schema": schema,
                "dropped_columns": dropped,
                "properties": properties or {},
                "manifests": manifests,
                "total_rows": int(rows),
                "total_raw_bytes": int(raw),
                "total_compressed_bytes": int(comp),
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
            return self.read_snapshot(new_id) if materialize else snap
        raise RuntimeError("snapshot commit contention: 100 retries exhausted")

    def commit_metadata(
        self,
        schema: list[dict],
        dropped_columns: list[str] | None = None,
        operation: str = "schema",
    ) -> dict:
        """Metadata-only commit (rename/drop column): a new snapshot reusing
        the parent's manifest shards and totals verbatim — O(1), no data IO.
        ``dropped_columns`` REPLACES the tombstone list when given (callers
        must include the parent's tombstones they want kept)."""
        _check_retired_names(schema)
        for _attempt in range(100):
            parent_id = self._max_snapshot_id()
            parent = (
                self.read_snapshot_meta(parent_id) if parent_id is not None else None
            )
            if parent is None:
                raise FileNotFoundError(f"no snapshot in {self.table_dir}")
            if "files" in parent:  # legacy inline: consolidate once
                manifests = [
                    self._write_manifest(
                        sorted(parent["files"], key=lambda f: f["partition_id"])
                    )
                ]
            else:
                manifests = list(parent["manifests"])
            dropped = (
                list(dropped_columns)
                if dropped_columns is not None
                else list(parent.get("dropped_columns") or [])
            )
            new_id = (parent_id or 0) + 1
            snap = {
                "snapshot_id": new_id,
                "parent_id": parent_id,
                "operation": operation,
                "committed_at": time.time(),
                "schema": schema,
                "dropped_columns": dropped,
                "properties": dict(parent.get("properties") or {}),
                "manifests": manifests,
                "total_rows": int(parent["total_rows"]),
                "total_raw_bytes": int(parent["total_raw_bytes"]),
                "total_compressed_bytes": int(parent["total_compressed_bytes"]),
            }
            final = os.path.join(self.meta_dir, f"snapshot-{new_id}.json")
            tmp = os.path.join(
                self.meta_dir, f".snapshot-{new_id}-{uuid.uuid4().hex}.tmp"
            )
            with open(tmp, "w") as f:
                json.dump(snap, f)
            try:
                os.link(tmp, final)
            except FileExistsError:
                os.unlink(tmp)
                continue
            os.unlink(tmp)
            self._advance_current(new_id)
            return snap
        raise RuntimeError("snapshot commit contention: 100 retries exhausted")

    def rollback_to(self, snapshot_id: int) -> dict:
        """Roll the table back to ``snapshot_id`` by committing a NEW
        snapshot that reuses the target's manifest shards verbatim — O(1)
        metadata, no shard rewrite, no data IO (Iceberg rollback semantics:
        history stays forward-only, so time travel to the undone snapshots
        keeps working, and ``expire_snapshots`` reclaims their files only
        when they age out). Streaming treats the rollback as replace-like:
        the files it re-exposes carry no new rows."""
        target = self.read_snapshot_meta(snapshot_id)
        if target is None:
            raise FileNotFoundError(
                f"snapshot {snapshot_id} not found in {self.table_dir} (expired?)"
            )
        if "files" in target:  # legacy inline list: consolidate into one shard
            manifests = [
                self._write_manifest(
                    sorted(target["files"], key=lambda f: f["partition_id"])
                )
            ]
        else:
            manifests = list(target["manifests"])
        for _attempt in range(100):
            parent_id = self._max_snapshot_id()
            new_id = (parent_id or 0) + 1
            snap = {
                "snapshot_id": new_id,
                "parent_id": parent_id,
                "operation": "rollback",
                "committed_at": time.time(),
                "schema": target["schema"],
                # restore the TARGET's tombstones (rollback restores table
                # state; omitting the field would erase them and re-enable
                # the stale-resurrection the re-add guard exists to prevent)
                "dropped_columns": list(target.get("dropped_columns") or []),
                "properties": {
                    **(target.get("properties") or {}),
                    "rolled_back_to": snapshot_id,
                },
                "manifests": manifests,
                "total_rows": int(target["total_rows"]),
                "total_raw_bytes": int(target["total_raw_bytes"]),
                "total_compressed_bytes": int(target["total_compressed_bytes"]),
            }
            final = os.path.join(self.meta_dir, f"snapshot-{new_id}.json")
            tmp = os.path.join(
                self.meta_dir, f".snapshot-{new_id}-{uuid.uuid4().hex}.tmp"
            )
            with open(tmp, "w") as f:
                json.dump(snap, f)
            try:
                os.link(tmp, final)
            except FileExistsError:
                os.unlink(tmp)
                continue  # a concurrent committer claimed this id; retry
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
        snap = self.read_snapshot_meta()
        if not snap:
            return set()
        if "files" in snap:  # legacy inline format
            return {f["partition_id"] for f in snap["files"]}
        out: set[int] = set()
        for m in snap["manifests"]:
            out.update(f["partition_id"] for f in self.read_manifest(m["path"]))
        return out

    def added_files(self, snapshot_id: int) -> list[dict] | None:
        """Files ADDED by ``snapshot_id`` vs its predecessor, or ``None`` when
        either snapshot is expired. Fast path for streaming deltas: when both
        are shard-format and the older manifest list is a prefix-reuse of the
        newer one, only the NEW shards are read — O(delta), independent of
        table size. Falls back to a full path diff after consolidation (the
        shard lists then differ structurally)."""
        newer = self.read_snapshot_meta(snapshot_id)
        if newer is None:
            return None
        older = (
            self.read_snapshot_meta(snapshot_id - 1) if snapshot_id > 1 else None
        )
        if snapshot_id > 1 and older is None:
            return None
        if (
            older is not None
            and "manifests" in newer
            and "manifests" in older
        ):
            old_paths = [m["path"] for m in older["manifests"]]
            new_paths = [m["path"] for m in newer["manifests"]]
            if new_paths[: len(old_paths)] == old_paths:
                out: list[dict] = []
                for m in newer["manifests"][len(old_paths):]:
                    out.extend(self.read_manifest(m["path"]))
                return out
        elif older is None and "manifests" in newer:
            out = []
            for m in newer["manifests"]:
                out.extend(self.read_manifest(m["path"]))
            return out
        # legacy or post-consolidation: full materialized path diff
        newer_full = self.read_snapshot(snapshot_id)
        older_full = self.read_snapshot(snapshot_id - 1) if snapshot_id > 1 else None
        if newer_full is None or (snapshot_id > 1 and older_full is None):
            return None
        seen = {f["path"] for f in older_full["files"]} if older_full else set()
        return [f for f in newer_full["files"] if f["path"] not in seen]

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
        # partition pruning first (Iceberg hidden partitioning): exact on the
        # tuple, cheaper than stats and able to prune what min/max can't
        # (hash buckets)
        spec = (snap.get("properties") or {}).get("partition_spec")
        if spec:
            from webcodec.spark.partition import prune_files

            files = prune_files(files, spec, conjuncts, types)
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

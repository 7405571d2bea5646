"""Distributed encode: DataFrame -> webcodec table (SURVEY.md §3.4 lifecycle).

Spark-first design: Catalyst plans the relational parts; the encode engine is
a leaf. Four modes, all with explicit target partition sizing, lineage rows
(input splits, codec choices, sizes, encode secs -> metrics table) and resume
via committed-partition-id skip (north_rule requirements):

- ``files``  — Spark distributes (file, row-group) splits; workers read
  parquet directly with pyarrow and encode. Zero shuffle, zero JVM->Python
  transfer (the bridge moves ~4 MB/s/core; direct reads run 100x that).
- ``clustered`` — range domain clustering at ~files-mode speed: phase A
  scatters rows into per-bucket Arrow IPC spills on shared storage, buckets
  holding CONTIGUOUS lexicographic domain intervals from a sampled
  histogram (hot domains salt across k adjacent buckets; cold domains stay
  whole); phase B encodes one bucket per task, sorted by url — so committed
  files carry disjoint url ranges and the manifest prunes range scans.
- ``salted`` — the same semantics as one Spark shuffle: salted
  repartition on hash(url)-domain + groupBy(_pid).applyInArrow. Reference
  implementation; bridge-bound.
- ``scan``   — mapInArrow over scan partitions (no shuffle, any source,
  rows cross the bridge once).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession, functions as F

from webcodec.config import EncoderConfig
from webcodec.spark.table import SnapshotTable

LINEAGE_SCHEMA = (
    "partition_id long, file string, rows long, raw_bytes long, encoded_bytes long, "
    "compressed_bytes long, n_pages long, encode_secs double, codec_choices string, "
    "column_stats string, input_files string, attempt string, partition string, "
    "schema_sig string, encrypted boolean"
)


def estimate_partitions(
    df: DataFrame, target_partition_bytes: int, sample_rows: int = 2_000
) -> tuple[int, float]:
    """(num_partitions, avg_row_bytes) from a driver-side head sample.

    Row count comes from parquet footer metadata when the source is a file
    scan (no extra job); only non-file sources pay a count() — a full second
    scan at 100 TB just to size partitions would be unacceptable."""
    sample = df.limit(sample_rows).toPandas()
    if len(sample) == 0:
        return 1, 0.0
    avg = float(
        sum(
            sample[c].map(lambda v: len(v) if isinstance(v, (str, bytes)) else 8).sum()
            for c in sample.columns
        )
        / len(sample)
    )
    paths = [p.removeprefix("file://") for p in df.inputFiles()]
    if paths and all(p.endswith(".parquet") for p in paths) and _is_pure_scan(df):
        import pyarrow.parquet as pq

        total = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
    else:
        total = df.count()
    n = max(1, int(total * avg / target_partition_bytes + 0.5))
    return n, avg


def salted_partition_ids(
    df: DataFrame,
    url_col: str,
    num_partitions: int,
    rows_per_partition: int,
    hot_sample_fraction: float = 0.01,
    seed: int = 42,
) -> DataFrame:
    """Add a ``_pid`` column: hash(domain, salt) % N with per-domain salt count
    k = ceil(domain_rows / rows_per_partition) from a sampled histogram.

    Cold domains (k=1) cluster fully -> max prefix/dict compression; hot
    domains split across k partitions -> no straggler (SURVEY.md §4.3).
    """
    domain = F.substring_index(F.substring_index(F.col(url_col), "://", -1), "/", 1)
    dfd = df.withColumn("_domain", domain)
    frac = min(1.0, hot_sample_fraction)
    hist = (
        dfd.sample(frac, seed=seed)
        .groupBy("_domain")
        .count()
        .withColumn("_k", F.greatest(F.lit(1), F.ceil(F.col("count") / F.lit(max(int(rows_per_partition * frac), 1)))))
        .filter(F.col("_k") > 1)
        .select("_domain", "_k")
    )
    dfj = dfd.join(F.broadcast(hist), on="_domain", how="left").withColumn(
        "_k", F.coalesce(F.col("_k"), F.lit(1))
    )
    salt = F.pmod(F.xxhash64(F.col(url_col), F.lit(seed)), F.col("_k"))
    pid = F.pmod(F.xxhash64(F.col("_domain"), salt), F.lit(num_partitions)).cast("int")
    return dfj.withColumn("_pid", pid).drop("_domain", "_k")


def _lineage_row(pid: int, fname: str, footer: dict, secs: float,
                 attempt: str, input_desc: str | None = None,
                 partition: dict | None = None) -> pa.Table:
    from pyspark import TaskContext

    # single-group footers carry chunks at the top; multi-group (streamed /
    # compacted) footers roll stats up across groups
    groups = footer.get("groups") or [footer]
    choices = {c["name"]: c["encoding"] for c in groups[0]["chunks"]}
    col_stats: dict = {}
    n_pages = 0
    encoded_bytes = 0
    for g in groups:
        for c in g["chunks"]:
            n_pages += len(c["pages"]) + (1 if c.get("dict") else 0)
            encoded_bytes += int(c["encoded_bytes"])
            st = c.get("stats") or {}
            cur = col_stats.setdefault(
                c["name"], {"min": None, "max": None, "null_count": 0}
            )
            if st.get("min") is not None:
                cur["min"] = st["min"] if cur["min"] is None else min(cur["min"], st["min"])
            if st.get("max") is not None:
                cur["max"] = st["max"] if cur["max"] is None else max(cur["max"], st["max"])
            cur["null_count"] += int(st.get("null_count", 0))
    ctx = TaskContext.get()
    inputs = json.dumps(
        {
            "stage": ctx.stageId() if ctx else -1,
            "task": ctx.taskAttemptId() if ctx else -1,
            "input": input_desc or "",
        }
    )
    return pa.table(
        {
            "partition_id": pa.array([pid], pa.int64()),
            "file": pa.array([fname]),
            "rows": pa.array([footer["num_rows"]], pa.int64()),
            "raw_bytes": pa.array([footer["raw_bytes"]], pa.int64()),
            "encoded_bytes": pa.array([encoded_bytes], pa.int64()),
            "compressed_bytes": pa.array([footer["compressed_bytes"]], pa.int64()),
            "n_pages": pa.array([n_pages], pa.int64()),
            "encode_secs": pa.array([secs], pa.float64()),
            "codec_choices": pa.array([json.dumps(choices)]),
            "column_stats": pa.array([json.dumps(col_stats)]),
            "input_files": pa.array([inputs]),
            "attempt": pa.array([attempt]),
            "partition": pa.array(
                [json.dumps(partition, sort_keys=True) if partition else ""]
            ),
            "schema_sig": pa.array([_sig_of(footer)]),
            # manifest flag so maintenance (compact) never needs a footer
            # read to learn a file is encrypted (encrypted files never
            # byte-merge — per-file AAD prefixes)
            "encrypted": pa.array([bool(footer.get("encryption"))], pa.bool_()),
        }
    )


def _sig_of(footer: dict) -> str:
    from webcodec import filefmt

    return filefmt.schema_signature_str(footer)


def _write_one(data_dir: str, pid: int, table: pa.Table, config: EncoderConfig,
               sort_key: str | None, input_desc: str | None = None,
               partition: dict | None = None) -> pa.Table:
    from webcodec import filefmt  # executor-side import

    if sort_key:
        idx = filefmt.sort_indices_for_key(table, sort_key)
        if idx is not None:
            table = table.take(idx)
    attempt = uuid.uuid4().hex[:12]
    fname = f"part-{pid:05d}-{attempt}.wcd"
    fpath = os.path.join(data_dir, fname)
    t0 = time.perf_counter()
    tmp = fpath + ".tmp"
    footer = filefmt.write_table(table, tmp, config)
    os.rename(tmp, fpath)
    secs = time.perf_counter() - t0
    return _lineage_row(pid, fname, footer, secs, attempt, input_desc, partition)


def _write_fanout(data_dir: str, base_pid: int, table: pa.Table,
                  config: EncoderConfig, sort_key: str | None, spec: list[dict],
                  input_desc: str | None = None):
    """Iceberg-style fanout writer: one .wcd file PER partition tuple seen in
    this task's rows — no shuffle; pid = (task id << PID_SHIFT) + tuple rank
    (ranks are deterministic: tuples sorted by canonical JSON). Yields
    lineage batches."""
    from webcodec.spark.partition import FANOUT_FLAG, PID_SHIFT, split_by_partition

    groups = split_by_partition(table, spec)
    if len(groups) >= (1 << PID_SHIFT):
        raise ValueError(
            f"partition fanout of {len(groups)} tuples in one task exceeds "
            f"the pid layout (2^{PID_SHIFT}); coarsen the partition spec"
        )
    for rank, (values, sub) in enumerate(groups):
        pid = FANOUT_FLAG | ((base_pid << PID_SHIFT) + rank)
        yield from _write_one(
            data_dir, pid, sub, config, sort_key, input_desc, partition=values
        ).to_batches()


def _fanout_stream(data_dir: str, base_pid: int, batches, config: EncoderConfig,
                   sort_key: str | None, spec: list[dict],
                   flush_bytes: int = 128 << 20):
    """Streamed fanout for scan partitions: route each incoming batch's rows
    into per-tuple buffers and flush a tuple as its own file whenever its
    buffer passes ``flush_bytes`` — peak memory is one open buffer per live
    tuple, never the whole Spark partition (scan mode feeds from shuffles,
    whose partition sizes are unbounded by maxPartitionBytes). A tuple may
    thus emit several files per task; pruning treats them identically."""
    from webcodec.spark.partition import FANOUT_FLAG, PID_SHIFT, split_by_partition

    buffers: dict[str, dict] = {}
    seq = 0

    def flush(buf) -> pa.Table:
        nonlocal seq
        if seq >= (1 << PID_SHIFT):
            raise ValueError(
                f"partition fanout exceeded 2^{PID_SHIFT} files in one task; "
                "coarsen the partition spec"
            )
        pid = FANOUT_FLAG | ((base_pid << PID_SHIFT) + seq)
        seq += 1
        table = pa.concat_tables(buf["parts"])
        buf["parts"], buf["bytes"] = [], 0
        return _write_one(data_dir, pid, table, config, sort_key,
                          partition=buf["values"])

    for batch in batches:
        table = pa.Table.from_batches([batch])
        for values, sub in split_by_partition(table, spec):
            key = json.dumps(values, sort_keys=True, default=str)
            buf = buffers.setdefault(key, {"values": values, "parts": [],
                                           "bytes": 0})
            buf["parts"].append(sub)
            buf["bytes"] += sub.nbytes
            if buf["bytes"] >= flush_bytes:
                yield from flush(buf).to_batches()
    for buf in buffers.values():
        if buf["parts"]:
            yield from flush(buf).to_batches()


def _write_one_batches(data_dir: str, pid: int, batches, config: EncoderConfig,
                       sort_key: str | None, input_desc: str | None = None,
                       group_target_bytes: int = 128 << 20) -> pa.Table | None:
    """Streamed counterpart of :func:`_write_one`: never materializes the
    partition — a new row GROUP is cut every ~group_target_bytes, so a
    skewed partition encodes in bounded memory (sort_key applies per group).
    Returns None for an empty partition."""
    from webcodec import filefmt  # executor-side import

    attempt = uuid.uuid4().hex[:12]
    fname = f"part-{pid:05d}-{attempt}.wcd"
    fpath = os.path.join(data_dir, fname)
    t0 = time.perf_counter()
    tmp = fpath + ".tmp"
    footer = filefmt.write_batches(
        batches, tmp, config, sort_key=sort_key,
        group_target_bytes=group_target_bytes,
    )
    if footer is None:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return None
    os.rename(tmp, fpath)
    secs = time.perf_counter() - t0
    return _lineage_row(pid, fname, footer, secs, attempt, input_desc)


def _make_scan_encode_fn(data_dir: str, config: EncoderConfig, sort_key: str | None,
                         done: frozenset[int], spec: list[dict] | None = None):
    """mapInArrow over scan partitions: NO shuffle — each input split becomes
    one .wcd file (or one per partition tuple when a partition spec is set).
    Partition sizing = spark.sql.files.maxPartitionBytes; the partition id is
    the deterministic scan-split index (resume-safe for the same input
    listing + split size)."""

    def encode_partition(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        if pid in done:
            return  # committed by a previous run (rows scanned, not re-encoded)
        if spec:
            # STREAMED fanout: scan partitions come from arbitrary upstream
            # plans (shuffles), whose sizes maxPartitionBytes does not bound —
            # buffer per tuple and flush at ~128MB, never the whole partition
            yield from _fanout_stream(data_dir, pid, batches, config,
                                      sort_key, spec)
            return
        # streamed: bounded memory even on a skewed partition (group cut
        # every ~128MB raw; sort_key applies per group)
        row = _write_one_batches(data_dir, pid, batches, config, sort_key)
        if row is not None:
            yield from row.to_batches()

    return encode_partition


def plan_file_splits(paths: list[str], target_bytes: int) -> list[dict]:
    """Driver-side split planning: group parquet row groups into splits of
    ~target_bytes UNCOMPRESSED size (explicit target partition sizing,
    north_rule). Deterministic: sorted paths, in-order row groups -> stable
    split ids for resume."""
    import pyarrow.parquet as pq

    splits: list[dict] = []
    for path in sorted(paths):
        md = pq.ParquetFile(path).metadata
        acc: list[int] = []
        acc_bytes = 0
        acc_rows = 0
        for i in range(md.num_row_groups):
            acc.append(i)
            acc_bytes += md.row_group(i).total_byte_size
            acc_rows += md.row_group(i).num_rows
            if acc_bytes >= target_bytes:
                splits.append({"path": path, "row_groups": acc, "num_rows": acc_rows,
                               "num_bytes": acc_bytes})
                acc, acc_bytes, acc_rows = [], 0, 0
        if acc:
            splits.append({"path": path, "row_groups": acc, "num_rows": acc_rows,
                           "num_bytes": acc_bytes})
    for sid, s in enumerate(splits):
        s["split_id"] = sid
    return splits


def _range_tasks(spark: SparkSession, items: list):
    """(range DataFrame, broadcast) pair for descriptor-driven jobs: one
    partition per item, descriptors shipped ONCE per executor via broadcast.
    spark.range is a native relation — no driver-side row serialization, no
    repartition exchange — which cuts the fixed job floor from ~0.75s to
    ~0.25s on this box (it is pure overhead at any scale: a 3-row
    createDataFrame + shuffle just to hand workers their task ids)."""
    bc = spark.sparkContext.broadcast(items)
    return spark.range(0, len(items), 1, len(items)), bc


def _make_file_encode_fn(data_dir: str, config: EncoderConfig, sort_key: str | None,
                         splits_bc, spec: list[dict] | None = None):
    """Splits-in, lineage-out: each worker reads its parquet row groups
    DIRECTLY via pyarrow C++ and encodes — table bytes never cross the JVM.
    (The JVM->Python Arrow bridge moves ~4 MB/s/core; direct pyarrow reads
    run at hundreds of MB/s/core, so this is the scale path.) With a
    partition spec, each split fans out into one file per tuple."""

    def encode_split(batches):
        import pyarrow.parquet as pq

        splits = splits_bc.value
        for b in batches:
            for i in b.column("id").to_pylist():
                s = splits[i]
                rgs = s["row_groups"]
                table = pq.ParquetFile(s["path"]).read_row_groups(rgs)
                desc = f"{s['path']}#rg{rgs}"
                if spec:
                    yield from _write_fanout(
                        data_dir, s["split_id"], table, config, sort_key, spec, desc
                    )
                else:
                    yield from _write_one(
                        data_dir, s["split_id"], table, config, sort_key, desc
                    ).to_batches()

    return encode_split


def _domains_of(urls) -> "pa.Array":
    import pyarrow.compute as pc

    no_scheme = pc.replace_substring_regex(
        urls, pattern=r"^[a-zA-Z][a-zA-Z0-9+.-]*://", replacement=""
    )
    return pc.list_element(pc.split_pattern(no_scheme, "/", max_splits=1), 0)


def sample_domain_histogram(
    paths: list[str], url_col: str, min_est_rows: int,
    max_row_groups: int | None = None,
) -> dict[str, int]:
    """HEAD of the domain histogram (estimated rows per domain, domains with
    ``>= min_est_rows``) from a BOUNDED driver-side sample: read the url
    column of up to ``max_row_groups`` evenly-spaced row groups directly via
    pyarrow C++ (threaded) and scale the histogram by the sampled fraction.
    Replaces a whole Spark sampling job (fixed ~1.7s) with a sub-second read
    that stays O(max_row_groups x url-chunk) regardless of table size.

    ``max_row_groups=None`` scales the sample with the table — a quarter of
    the row groups, clamped to [8, 64]: a fixed 8 at 100 TB would be a
    ~0.001% sample that misses hot domains entirely (each missed hot domain
    is a straggler bucket in clustered mode)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    rgs: list[tuple[str, int, int]] = []  # (path, rg index, rows)
    total_rows = 0
    for path in sorted(paths):
        md = pq.ParquetFile(path).metadata
        for i in range(md.num_row_groups):
            rgs.append((path, i, md.row_group(i).num_rows))
            total_rows += md.row_group(i).num_rows
    if not rgs or total_rows == 0:
        return {}
    if max_row_groups is None:
        max_row_groups = min(64, max(8, len(rgs) // 4))
    step = max(len(rgs) // max_row_groups, 1)
    chosen = rgs[:: step][:max_row_groups]
    sampled_rows = sum(r for _, _, r in chosen)
    parts = []
    for path, i, _ in chosen:
        parts.append(pq.ParquetFile(path).read_row_group(i, columns=[url_col]).column(url_col))
    dom = _domains_of(pa.concat_arrays([c.combine_chunks() for c in parts]))
    vc = pc.value_counts(dom)
    frac = sampled_rows / total_rows
    out: dict[str, int] = {}
    for row in vc.to_pylist():
        est = int(row["counts"] / frac)
        if est >= min_est_rows:
            out[row["values"]] = est
    return out


def sample_hot_domains_from_files(
    paths: list[str], url_col: str, rows_per_partition: int,
    max_row_groups: int | None = None,
) -> dict[str, int]:
    """Hot-domain salt counts (domain -> k buckets) from the sampled
    histogram head: k = ceil(est_rows / rows_per_partition), reported only
    when k > 1."""
    hist = sample_domain_histogram(
        paths, url_col, rows_per_partition + 1, max_row_groups)
    return {
        d: int(-(-est // max(rows_per_partition, 1))) for d, est in hist.items()
    }


def plan_domain_ranges(
    hist: dict[str, int], n_buckets: int,
) -> tuple[list[str], dict[str, tuple[int, int]]]:
    """RANGE placement of domains over buckets (Iceberg sort-order /
    total-order-partitioner shape): walk the sampled histogram in
    lexicographic domain order, cutting a bucket boundary every
    ``total_est / n_buckets`` rows. Returns ``(cuts, spans)``:

    - ``cuts[b]`` is the first domain of bucket ``b`` — an executor routes
      any domain (sampled or not) with ``bisect_right(cuts, d) - 1``.
      O(n_buckets) strings, broadcast-sized at any table scale.
    - ``spans[d] = (base, k)`` for HOT domains whose estimated mass spans
      more than one bucket: their rows salt by hash(url) across the ``k``
      ADJACENT buckets starting at ``base`` (skew handled, range order
      preserved).

    Cold domains are assigned whole to the bucket holding their range
    MIDPOINT — never split (dedup/prefix locality), never hashed. Hashing
    is what the previous revisions did, and it silently destroyed the
    clustering contract: every bucket held a uniform sample of the domain
    space, so file-level url min/max spanned the whole table and a
    selective scan pruned nothing. Range placement makes file url ranges
    disjoint by construction — the manifest prunes files before any page
    work — while bucket loads stay balanced by the same histogram
    (boundaries equalize estimated rows; a straggler needs adjacent
    midpoints to pile up, bounded by ~1.5x target in the worst case
    instead of the unbounded collisions of independent hashing)."""
    if not hist or n_buckets <= 0:
        return [], {}
    # null urls sample as a None domain — fold into "" (sorts first, same
    # key the executor-side router normalizes to)
    norm: dict[str, int] = {}
    for d, w in hist.items():
        k = d if d is not None else ""
        norm[k] = norm.get(k, 0) + w
    hist = norm
    doms = sorted(hist)
    total = float(sum(hist.values()))
    if total <= 0:
        return [], {}
    target = total / n_buckets
    cuts: list[str] = [""] * n_buckets
    spans: dict[str, tuple[int, int]] = {}
    cum = 0.0
    prev_end = 0  # first bucket not yet fully claimed
    for d in doms:
        w = float(hist[d])
        if w > target:
            # hot: span = the buckets its mass window covers, rows salted
            base = max(min(int(cum // target), n_buckets - 1), prev_end)
            end = min(int((cum + w - 1e-9) // target), n_buckets - 1)
            end = max(end, base)
            for b in range(base, end + 1):
                if not cuts[b] and b > 0:
                    cuts[b] = d
            if end > base:
                spans[d] = (base, end - base + 1)
            prev_end = end
        else:
            # cold: whole domain to its midpoint bucket
            b = min(int((cum + w / 2.0) // target), n_buckets - 1)
            b = max(b, prev_end)
            if not cuts[b] and b > 0:
                cuts[b] = d
            prev_end = b
        cum += w
    # forward-fill buckets that never got a starting domain so `cuts` stays
    # sorted (bisect requirement); duplicates route tail queries to the
    # rightmost duplicate, which is the bucket actually holding that range
    for b in range(1, n_buckets):
        if not cuts[b]:
            cuts[b] = cuts[b - 1]
    return cuts, spans


def sample_hot_domains(
    df: DataFrame, url_col: str, rows_per_partition: int,
    sample_fraction: float = 0.01, seed: int = 42,
) -> dict[str, int]:
    """Driver-side sampled domain histogram -> salt counts for hot domains.
    JVM-only job over the url column (no Python bridge). Fallback for
    non-parquet sources; parquet scans use the cheaper
    :func:`sample_hot_domains_from_files`."""
    domain = F.substring_index(F.substring_index(F.col(url_col), "://", -1), "/", 1)
    frac = min(1.0, sample_fraction)
    denom = max(int(rows_per_partition * frac), 1)
    rows = (
        df.select(domain.alias("d"))
        .sample(frac, seed=seed)
        .groupBy("d")
        .count()
        .withColumn("k", F.greatest(F.lit(1), F.ceil(F.col("count") / F.lit(denom))))
        .filter(F.col("k") > 1)
        .collect()
    )
    return {r["d"]: int(r["k"]) for r in rows}


def _make_spill_fn(shuffle_dir: str, url_col: str, n_buckets: int,
                   ranges: tuple[list[str], dict[str, tuple[int, int]]],
                   done: frozenset[int], splits_bc, seed: int = 42,
                   spill_compression: str | None = "lz4"):
    """Phase A of the Arrow-native shuffle: each task reads its parquet split
    directly and scatters rows into per-bucket Arrow IPC spill files on shared
    storage. ``ranges`` (from :func:`plan_domain_ranges`) routes each domain
    by lexicographic RANGE — buckets hold contiguous domain intervals, so
    committed files carry disjoint url min/max and the manifest prunes a
    url-range scan to the few files that can match; hot domains salt by
    hash(url) over their k adjacent buckets, cold domains stay whole. Zero
    JVM transfer."""

    def spill_split(batches):
        import numpy as np
        import pyarrow.compute as pc
        import pyarrow.ipc as ipc
        import pyarrow.parquet as pq

        from pyspark import TaskContext
        from webcodec.kernels.md5v import md5_u64le_arrow

        ctx = TaskContext.get()
        task = ctx.taskAttemptId() if ctx else 0  # None only in unit tests
        splits = splits_bc.value
        for b in batches:
            for i in b.column("id").to_pylist():
                row = splits[i]
                table = pq.ParquetFile(row["path"]).read_row_groups(
                    row["row_groups"]
                )
                # null urls route to the ""-domain cold bucket (a null
                # dictionary index would otherwise turn into INT64_MIN on
                # to_numpy and crash the gather below)
                urls = pc.fill_null(table.column(url_col).combine_chunks(), "")
                dom = _domains_of(urls)  # vectorized: strip scheme, take netloc
                # Arrow C++ dictionary encode: per-UNIQUE-domain work only
                if isinstance(dom, pa.ChunkedArray):
                    dom = dom.combine_chunks()
                de = dom.dictionary_encode()
                uniq = de.dictionary
                inv = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
                # RANGE routing (plan_domain_ranges): every domain — sampled
                # or not — lands in the bucket of its lexicographic interval
                # via bisect on the O(n_buckets) cut list; per-UNIQUE-domain
                # work only. Hot domains pick one of their k ADJACENT span
                # buckets by url hash (md5 kernel: process-stable, python
                # hash() is salted per process), so one url always lands in
                # one bucket (dedup/prefix locality preserved).
                import bisect

                cuts, spans = ranges
                ud = uniq.to_pylist()
                if cuts:
                    # None domain (null url) routes as "" — bucket 0
                    ubase = np.array(
                        [max(bisect.bisect_right(cuts, d or "") - 1, 0)
                         for d in ud],
                        dtype=np.int64,
                    ) if ud else np.zeros(0, np.int64)
                else:
                    # defensive fallback (empty histogram): hash domains
                    h = md5_u64le_arrow(pc.binary_join_element_wise(
                        uniq, pa.scalar(f"#{seed}"), ""))
                    ubase = (h % np.uint64(n_buckets)).astype(np.int64)
                bucket = ubase[inv] if len(ud) else np.zeros(len(urls), np.int64)
                for ui, d in enumerate(ud):
                    sp = spans.get(d)
                    if sp is None:
                        continue
                    sbase, k = sp
                    mask = inv == ui
                    pu = urls.filter(pa.array(mask))
                    piece = md5_u64le_arrow(pu) % np.uint64(k)
                    bucket[mask] = sbase + piece.astype(np.int64)
                # ONE consolidated spill per SPLIT (Spark sort-shuffle file
                # layout): per-bucket IPC stream segments back-to-back in a
                # single .arrow file. Per-(task, bucket) files would be
                # tasks x buckets — ~10^9 files at 100 TB, an inode/DFS-
                # metadata explosion; this is 1 file per split. Files are
                # named by SPLIT id, written via attempt-unique temps and
                # renamed into place: a task retried after a post-write
                # crash — or a speculative duplicate attempt — OVERWRITES
                # with byte-identical content instead of leaving a second
                # discoverable spill that phase B would double-read.
                # Segment locations travel through the SIDE CHANNEL (one
                # metadata row per (split, bucket) segment) and are
                # consolidated into per-BUCKET index shards by a tiny Spark
                # metadata shuffle — phase B never lists the spill dir or
                # opens O(splits) index files (at ~800k splits that would be
                # hundreds of millions of small reads cluster-wide).
                fname = f"s{int(i):07d}"
                dpath = os.path.join(shuffle_dir, fname + ".arrow")
                tmp_sfx = f".{task}-{uuid.uuid4().hex[:8]}.tmp"  # attempt-unique
                wrote = []
                with open(dpath + tmp_sfx, "wb") as f:
                    for bk in np.unique(bucket):
                        if int(bk) in done:
                            continue
                        sub = table.filter(pa.array(bucket == bk))
                        sink = pa.BufferOutputStream()
                        with ipc.new_stream(
                            sink, sub.schema,
                            # spills are transient: favor compress SPEED
                            # over ratio (lz4 frame ~5x faster than zstd
                            # for ~1.2x the bytes; None = raw)
                            options=ipc.IpcWriteOptions(
                                compression=spill_compression),
                        ) as w:
                            w.write_table(sub)
                        seg = sink.getvalue()
                        wrote.append((int(bk), f.tell(), len(seg), sub.num_rows))
                        f.write(seg)
                if not wrote:
                    os.remove(dpath + tmp_sfx)
                    continue
                os.rename(dpath + tmp_sfx, dpath)
                yield pa.RecordBatch.from_pydict(
                    {
                        "bucket": pa.array([b for b, _, _, _ in wrote], pa.int32()),
                        "split": pa.array([int(i)] * len(wrote), pa.int64()),
                        "off": pa.array([o for _, o, _, _ in wrote], pa.int64()),
                        "len": pa.array([ln for _, _, ln, _ in wrote], pa.int64()),
                        "rows": pa.array([r for _, _, _, r in wrote], pa.int64()),
                    }
                )

    return spill_split


SPILL_SEGMENT_SCHEMA = "bucket int, split long, off long, len long, rows long"


def _make_bucket_index_fn(shuffle_dir: str):
    """Consolidate the phase-A segment side channel into ONE index shard per
    BUCKET (b{bucket:05d}.idx, JSON list of [split, off, len]): runs as a
    mapInArrow over the side channel repartitioned by bucket, so the driver
    never materializes the O(splits x buckets) segment map — it only collects
    the O(buckets) (bucket, rows) output. Shards are deterministic (segments
    sorted by split id) and written temp+rename, so a retried/speculative
    task overwrites byte-identical content."""

    def write_indexes(batches):
        import json as _json

        from pyspark import TaskContext

        ctx = TaskContext.get()
        task = ctx.taskAttemptId() if ctx else 0
        segs: dict[int, list[tuple[int, int, int]]] = {}
        rows: dict[int, int] = {}
        for b in batches:
            bk = b.column("bucket").to_numpy(zero_copy_only=False)
            sp = b.column("split").to_numpy(zero_copy_only=False)
            off = b.column("off").to_numpy(zero_copy_only=False)
            ln = b.column("len").to_numpy(zero_copy_only=False)
            nr = b.column("rows").to_numpy(zero_copy_only=False)
            for j in range(len(bk)):
                k = int(bk[j])
                segs.setdefault(k, []).append((int(sp[j]), int(off[j]), int(ln[j])))
                rows[k] = rows.get(k, 0) + int(nr[j])
        for k, lst in segs.items():
            lst.sort()
            path = os.path.join(shuffle_dir, f"b{k:05d}.idx")
            tmp = f"{path}.{task}-{uuid.uuid4().hex[:8]}.tmp"
            with open(tmp, "w") as f:
                _json.dump(lst, f)
            os.rename(tmp, path)
        if segs:
            ks = sorted(segs)
            yield pa.RecordBatch.from_pydict({
                "bucket": pa.array(ks, pa.int32()),
                "rows": pa.array([rows[k] for k in ks], pa.int64()),
            })

    return write_indexes


def _make_bucket_encode_fn(data_dir: str, shuffle_dir: str, config: EncoderConfig,
                           sort_key: str | None, order_bc):
    """Phase B: one task per bucket — read its spill files, sort, encode."""

    def encode_bucket(batches):
        import json as _json

        import pyarrow.ipc as ipc

        order = order_bc.value
        for b in batches:
            for bk in (order[i] for i in b.column("id").to_pylist()):
                # exactly ONE metadata read per task: this bucket's
                # consolidated index shard (built by the phase-A.5 metadata
                # shuffle) — never an O(splits) listing of the spill dir
                ipath = os.path.join(shuffle_dir, f"b{bk:05d}.idx")
                try:
                    with open(ipath) as f:
                        seglist = _json.load(f)
                except FileNotFoundError:
                    # the side channel said this bucket has rows, so a
                    # missing index is a lost/unreadable spill — fail loud,
                    # never commit a silently-empty bucket
                    raise FileNotFoundError(
                        f"no spill index for bucket {bk} in {shuffle_dir}")
                parts = []
                for split, off, ln in seglist:
                    dpath = os.path.join(shuffle_dir, f"s{int(split):07d}.arrow")
                    with open(dpath, "rb") as f:
                        f.seek(off)
                        buf = f.read(ln)
                    with ipc.open_stream(pa.BufferReader(buf)) as r:
                        parts.append(r.read_all())
                table = pa.concat_tables(parts)
                desc = f"spill:b{bk:05d}({len(parts)} spills)"
                yield from _write_one(data_dir, bk, table, config, sort_key, desc).to_batches()

    return encode_bucket


def _make_encode_fn(data_dir: str, config: EncoderConfig, sort_key: str | None):
    """Grouped-map Arrow UDF: one group (= one _pid) -> one .wcd file + lineage row."""

    def encode_group(keys: tuple, table: pa.Table) -> pa.Table:
        from webcodec import filefmt  # executor-side import

        pid = keys[0].as_py()
        table = table.drop_columns(["_pid"])
        return _write_one(data_dir, pid, table, config, sort_key)

    return encode_group


def _completed_ids(tbl: SnapshotTable, partitioned: bool) -> frozenset[int]:
    """Resume skip-set, aliasing-safe: fanout pids ((split << PID_SHIFT) +
    rank) and plain split ids share the integer domain (fanout split 0 emits
    pids 0..k too), so the skip-set must only consider manifest entries of
    the SAME kind — entries WITH a partition tuple for a partitioned run
    (collapsed to their split id), entries WITHOUT one otherwise."""
    from webcodec.spark.partition import FANOUT_FLAG, PID_SHIFT

    snap = tbl.read_snapshot()
    if not snap:
        return frozenset()
    if partitioned:
        return frozenset(
            (f["partition_id"] & ~FANOUT_FLAG) >> PID_SHIFT
            for f in snap["files"] if f.get("partition") is not None
        )
    return frozenset(
        f["partition_id"] for f in snap["files"] if f.get("partition") is None
    )


def _is_pure_scan(df: DataFrame) -> bool:
    """True when ``df`` is a bare file-source relation (safe for files mode:
    no Spark-side transformation would be silently dropped by reading the
    source files directly)."""
    try:
        if not df.inputFiles():
            return False
        cls = df._jdf.queryExecution().analyzed().getClass().getSimpleName()
        return "Relation" in cls
    except Exception:  # noqa: BLE001 — connect mode / API drift: be conservative
        return False


def encode_table(
    df: DataFrame,
    table_dir: str,
    config: EncoderConfig | None = None,
    url_col: str | None = None,
    sort_key: str | None = None,
    target_partition_bytes: int = 128 << 20,
    num_partitions: int | None = None,
    resume: bool = True,
    write_metrics: bool = True,
    mode: str | None = None,
    spill_compression: str | None = "lz4",
    partition_by: list[str] | None = None,
    distribution: str | None = None,
) -> dict:
    """Encode ``df`` into a webcodec snapshot table; returns the new snapshot.

    ``partition_by`` declares Iceberg-style hidden partitioning — a list of
    transforms over source columns (``"lang"``, ``"days(ts)"``,
    ``"bucket(16, url)"``, ``"truncate(4, url)"``). Each task FANS OUT into
    one file per partition tuple (no extra shuffle); manifest entries carry
    the tuple and reads prune on it through plain predicates over the SOURCE
    column. Supported with modes ``files`` and ``scan``.

    ``distribution="hash"`` (partitioned writes only; Iceberg
    write.distribution-mode=hash analogue) pre-repartitions by the partition
    expressions so same-tuple rows co-locate and the fanout emits ~1 file
    per tuple instead of tasks x tuples — ONE opt-in shuffle traded against
    file count; forces ``scan`` mode (the shuffle output is not a pure file
    scan). Correctness never depends on the Spark-side expressions — the
    Arrow-side transforms assign the manifest tuples either way.

    ``mode`` (default ``None`` = auto: ``"files"`` when ``df`` is a pure
    parquet scan, else ``"scan"`` — the zero-JVM-transfer path is the default
    because the JVM->Python bridge is the scale bottleneck):
    - ``"salted"`` (explicit opt-in): one shuffle — salted repartition on
      hash(url) domain with explicit target sizing (north_rule skew handling),
      then one Arrow UDF per partition. Maximum compression: same-domain rows
      cluster, so url prefix/dict pages win. Cost at scale: the whole table
      crosses one shuffle AND the JVM->Python Arrow bridge.
    - ``"files"``: ZERO shuffle, ZERO JVM transfer — Spark distributes only
      (file, row-group) splits sized to target_partition_bytes; each Python
      worker reads its split directly with pyarrow C++ and encodes. This is
      the 100 TB fast path (the JVM->Python bridge caps at ~4 MB/s/core;
      direct reads run at several hundred MB/s/core). Skew is a non-issue:
      splits are uniform bytes by construction.
    - ``"scan"``: ZERO shuffle but rows still cross the JVM->Python bridge —
      mapInArrow straight over the scan partitions (sizing via
      spark.sql.files.maxPartitionBytes). Use when the input is not parquet
      (e.g. an upstream transformation feeds the encoder).
    """
    config = config or EncoderConfig()
    spark = df.sparkSession
    tbl = SnapshotTable(table_dir)
    tbl.init()

    spec: list[dict] | None = None
    if partition_by:
        from webcodec.spark.partition import parse_partition_spec, validate_spec

        spec = parse_partition_spec(partition_by)
        validate_spec(spec, df.columns)

    if distribution is not None:
        if distribution != "hash":
            raise ValueError(f"unknown distribution {distribution!r} (use 'hash')")
        if not spec:
            raise ValueError("distribution='hash' requires partition_by")
        from webcodec.spark.partition import spark_partition_exprs

        n_part = num_partitions or estimate_partitions(df, target_partition_bytes)[0]
        df = df.repartition(n_part, *spark_partition_exprs(spec))
        mode = "scan"  # the shuffle output is no longer a pure file scan

    if mode is None:
        # files mode reads the source parquet directly, so it is only valid
        # when df is the bare scan (no Project/Filter/... on top)
        mode = "files" if _is_pure_scan(df) else "scan"
    if spec and mode not in ("files", "scan"):
        raise ValueError(
            f"partition_by is supported with modes 'files'/'scan', not {mode!r} "
            "(clustered/salted define their own url-domain placement)"
        )

    if mode == "files":
        paths = [p.removeprefix("file://") for p in df.inputFiles()]
        if not paths:
            raise ValueError("mode='files' requires a parquet-backed DataFrame")
        splits = plan_file_splits(paths, target_partition_bytes)
        done = _completed_ids(tbl, bool(spec)) if resume else frozenset()
        todo = [s for s in splits if s["split_id"] not in done]
        if not todo:
            return tbl.read_snapshot()
        sdf, bc = _range_tasks(spark, todo)
        fn = _make_file_encode_fn(tbl.data_dir, config, sort_key or url_col, bc, spec)
        rows = sdf.mapInArrow(fn, LINEAGE_SCHEMA).collect()
        return _commit(spark, tbl, table_dir, rows, df, sort_key or url_col,
                       write_metrics, spec)

    if mode == "clustered":
        # Arrow-native two-phase shuffle: salted domain clustering at
        # files-mode speed — bytes never cross the JVM. Phase A scatters rows
        # into per-bucket Arrow IPC spills on shared storage; phase B encodes
        # one bucket per task. At cluster scale the spill dir lives on the DFS
        # (same durability class as Spark's own shuffle files).
        import shutil

        if url_col is None:
            raise ValueError("mode='clustered' requires url_col")
        paths = [p.removeprefix("file://") for p in df.inputFiles()]
        if not paths:
            raise ValueError("mode='clustered' requires a parquet-backed DataFrame")
        splits = plan_file_splits(paths, target_partition_bytes)
        if num_partitions is None:
            # bucket count = max(size target, 4x cluster parallelism). The
            # size target (~128MB OUTPUT files, C4 parity) dominates at
            # cluster scale; the parallelism floor matters when the table is
            # small relative to the cluster — more buckets mean finer range
            # intervals (better balance from the sampled boundaries) and
            # enough phase-B tasks for the size-descending launch order to
            # pack the waves evenly; 4x measured best at local[32] (1x->2
            # uneven waves; 8x pays per-segment spill overhead in phase A).
            total_bytes = sum(s["num_bytes"] for s in splits)
            num_partitions = max(total_bytes // (128 << 20) + 1, 2,
                                 4 * spark.sparkContext.defaultParallelism)
        # FULL sampled histogram (min_est_rows=1): range boundaries need the
        # whole sampled mass, not just the head. Driver memory is bounded by
        # the sample itself (quarter of row groups, clamped [8, 64]), and
        # what ships to executors is only O(n_buckets) cuts + hot spans.
        hist = sample_domain_histogram(paths, url_col, 1)
        ranges = plan_domain_ranges(hist, num_partitions)
        done = _completed_ids(tbl, False) if resume else frozenset()
        shuffle_dir = os.path.join(table_dir, "_shuffle")
        # stale spills from a killed run are BOTH a leak (commit-time cleanup
        # never ran) and a duplicate-rows hazard (phase B reads every file in
        # a bucket dir; a rerun re-spills uncommitted buckets). Resume
        # correctness comes from the committed-bucket skip, never from reusing
        # spills — so any leftover here belongs to a dead run: remove it.
        shutil.rmtree(shuffle_dir, ignore_errors=True)
        os.makedirs(shuffle_dir, exist_ok=True)

        sdf, bc = _range_tasks(spark, splits)
        spill = _make_spill_fn(shuffle_dir, url_col, num_partitions, ranges,
                               done, bc, spill_compression=spill_compression)
        # the (split, bucket, off, len) segment map is pure metadata but
        # O(splits x touched-buckets) — at 100 TB (~800k splits x thousands
        # of buckets) that is millions of entries, too many for a driver
        # collect. Repartition it by bucket IN SPARK and write one
        # consolidated index shard per bucket (phase B reads exactly its own
        # shard); only the O(buckets) (bucket, rows) totals reach the driver.
        side = sdf.mapInArrow(spill, SPILL_SEGMENT_SCHEMA)
        idx_fn = _make_bucket_index_fn(shuffle_dir)
        # one output row per bucket (a bucket lives wholly in one partition
        # after the repartition), so the collect is O(buckets)
        spill_rows = (
            side.repartition(F.col("bucket"))
            .mapInArrow(idx_fn, "bucket int, rows long").collect()
        )
        sizes: dict[int, int] = {
            int(r["bucket"]): int(r["rows"]) for r in spill_rows
        }
        # exactly ONE bucket per task (hash-repartition of n ids into n
        # partitions leaves ~1/e of slots empty and stacks 2-3 buckets on
        # others), largest bucket first: Spark launches partitions in index
        # order, so descending size = LPT scheduling — the phase-B tail is
        # one small bucket instead of a stack of large ones. Matters most at
        # high parallelism, where phase B runs few waves.
        order = [int(b) for b in sorted(sizes, key=lambda b: (-sizes[b], b))]
        if not order:
            return _commit(spark, tbl, table_dir, [], df, sort_key or url_col,
                           write_metrics)
        bdf, obc = _range_tasks(spark, order)
        enc = _make_bucket_encode_fn(tbl.data_dir, shuffle_dir, config,
                                     sort_key or url_col, obc)
        rows = bdf.mapInArrow(enc, LINEAGE_SCHEMA).collect()
        snap = _commit(spark, tbl, table_dir, rows, df, sort_key or url_col, write_metrics)
        shutil.rmtree(shuffle_dir, ignore_errors=True)
        return snap

    if mode == "scan":
        done = _completed_ids(tbl, bool(spec)) if resume else frozenset()
        fn = _make_scan_encode_fn(tbl.data_dir, config, sort_key or url_col, done, spec)
        lineage = df.mapInArrow(fn, LINEAGE_SCHEMA)
        rows = lineage.collect()
        return _commit(spark, tbl, table_dir, rows, df, sort_key or url_col,
                       write_metrics, spec)

    if num_partitions is None:
        num_partitions, avg_row = estimate_partitions(df, target_partition_bytes)
    else:
        _, avg_row = 0, 0.0
    rows_per_partition = int(target_partition_bytes / max(avg_row, 1.0)) if avg_row else 1 << 20

    if url_col is not None:
        dfp = salted_partition_ids(df, url_col, num_partitions, rows_per_partition)
        sort_key = sort_key or url_col
    else:
        first = df.columns[0]
        dfp = df.withColumn(
            "_pid", F.pmod(F.xxhash64(F.col(first)), F.lit(num_partitions)).cast("int")
        )

    done = _completed_ids(tbl, False) if resume else frozenset()
    if done:
        dfp = dfp.filter(~F.col("_pid").isin(list(done)))

    fn = _make_encode_fn(tbl.data_dir, config, sort_key)
    lineage = dfp.groupBy("_pid").applyInArrow(fn, LINEAGE_SCHEMA)
    rows = lineage.collect()
    return _commit(spark, tbl, table_dir, rows, df, sort_key, write_metrics)


def _commit(
    spark: SparkSession,
    tbl: SnapshotTable,
    table_dir: str,
    rows: list,
    df: DataFrame,
    sort_key: str | None,
    write_metrics: bool,
    spec: list[dict] | None = None,
) -> dict:
    files = []
    for r in rows:
        entry = {
            "partition_id": r["partition_id"],
            "path": os.path.join("data", r["file"]),
            "rows": r["rows"],
            "raw_bytes": r["raw_bytes"],
            "compressed_bytes": r["compressed_bytes"],
            "codec_choices": json.loads(r["codec_choices"]),
            "column_stats": json.loads(r["column_stats"]),
        }
        part = r["partition"] if "partition" in r else ""
        if part:
            entry["partition"] = json.loads(part)
        if "schema_sig" in r and r["schema_sig"]:
            entry["schema_sig"] = r["schema_sig"]
        if "encrypted" in r and r["encrypted"]:
            entry["encrypted"] = True
        files.append(entry)
    schema = [{"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable} for f in df.schema.fields]
    props = {"sort_key": sort_key or ""}
    if spec:
        props["partition_spec"] = spec
    snap = tbl.commit(files, schema, properties=props)

    if write_metrics and rows:
        mdir = os.path.join(table_dir, "metrics")
        spark.createDataFrame(rows, LINEAGE_SCHEMA).withColumn(
            "snapshot_id", F.lit(snap["snapshot_id"])
        ).write.mode("append").parquet(mdir)
    return snap

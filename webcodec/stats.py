"""Column statistics: sampled selector stats + per-page min/max stats.

Reference parity: min/max/null-count statistics per page/chunk with truncation
(SURVEY.md §2.C6, parquet-java ``Statistics``/``BinaryStatistics`` +
``DEFAULT_COLUMN_INDEX_TRUNCATE_LENGTH=64``); the *sampled* selector stats
(ndv ratio, mean run length, byte entropy) are our extension per the
north_star ('codec auto-selector driven by sampled cardinality/run-length/
entropy statistics'), validated by BtrBlocks (SIGMOD'23, PAPERS.md).
"""

from __future__ import annotations

import base64
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webcodec.types import IS_VARLEN, NUMPY_OF, PhysType


@dataclass
class SampleStats:
    n: int
    ndv_ratio: float          # distinct / sampled
    mean_run_length: float    # consecutive-equal runs
    byte_entropy: float       # bits/byte over the value bytes (varlen/fixed view)
    avg_len: float            # bytes per value
    prefix_ratio: float       # avg adjacent common-prefix / avg_len (varlen only)
    sortedness: float         # fraction of non-decreasing adjacent pairs


def _approx_prefix_lengths(offsets: np.ndarray, data: np.ndarray, cap: int = 64) -> np.ndarray:
    """Adjacent common-prefix lengths considering only the first ``cap`` bytes
    of each value — O(n*cap) regardless of value width. Selector-only
    approximation; the DELTA_BYTE_ARRAY kernel computes exact prefixes."""
    n = len(offsets) - 1
    if n <= 1:
        return np.zeros(max(n, 0), dtype=np.int64)
    lens = np.diff(offsets)
    if data.size == 0:  # all-empty values: keep the gather index 0 in bounds
        data = np.zeros(1, dtype=np.uint8)
    w = int(min(max(lens.max(), 1), cap))
    col = np.arange(w, dtype=np.int64)
    valid = col[None, :] < lens[:, None]
    take = np.where(valid, offsets[:-1, None] + col[None, :], 0)
    mat = data[take]
    mat[~valid] = 0xFE
    b = mat.copy()
    b[~valid] = 0xFD  # distinct fills: padding never matches across rows
    eq = mat[:-1] == b[1:]
    p = np.where(eq.all(axis=1), w, eq.argmin(axis=1)).astype(np.int64)
    p = np.minimum(p, np.minimum(lens[:-1], lens[1:]))
    return np.concatenate(([0], p))


def _entropy_bits(raw: np.ndarray) -> float:
    if len(raw) == 0:
        return 0.0
    counts = np.bincount(raw, minlength=256).astype(np.float64)
    p = counts[counts > 0] / len(raw)
    return float(-(p * np.log2(p)).sum())


def sample_stats(arr: pa.Array, phys: PhysType, sample_n: int = 4096) -> SampleStats:
    """Compute selector statistics from the first ``sample_n`` non-null values."""
    s = arr.drop_null().slice(0, sample_n)
    n = len(s)
    if n == 0:
        return SampleStats(0, 1.0, 1.0, 8.0, 0.0, 0.0, 0.0)
    if phys in (PhysType.LIST_FLOAT32, PhysType.LIST):  # nested: BSS path, no distinct-count kernel
        return SampleStats(n, 1.0, 1.0, 8.0, 0.0, 0.0, 0.0)
    ndv = pc.count_distinct(s).as_py()
    total_nonnull = len(arr) - arr.null_count
    ndv_ratio = ndv / n
    if total_nonnull <= n:
        ndv_ratio = ndv / max(total_nonnull, 1)
    elif 0.02 < ndv_ratio < 0.9 and s.nbytes <= n * 256:
        # sample NDV / sample size systematically MISSES medium-cardinality
        # dictionary wins: a 600k-row chunk with 2.5k distinct values shows
        # ~0.5 distinctness in a 4k sample but 0.004 in the chunk. Chao1
        # (bias-corrected: ndv + f1(f1-1)/2(f2+1), public estimator) scales
        # the sample NDV to a chunk-total estimate. Gated to the undecided
        # middle zone: near-0 ratios already pick DICT, near-1 ratios keep
        # f1 ~ sample size and blow the estimate up anyway, and long blobs
        # (> 256 B/value) would pay a second full hash pass in value_counts
        # for columns that are never dictionary candidates. The dict-size
        # limit and A7 guard backstop bad estimates either way.
        counts = pc.value_counts(s).field("counts").to_numpy(zero_copy_only=False)
        f1 = int((counts == 1).sum())
        f2 = int((counts == 2).sum())
        ndv_est = ndv + f1 * (f1 - 1) / (2.0 * (f2 + 1))
        ndv_ratio = min(1.0, ndv_est / total_nonnull)

    if phys in IS_VARLEN:
        s2 = s.cast(pa.large_binary()) if not pa.types.is_large_binary(s.type) else s
        if isinstance(s2, pa.ChunkedArray):
            s2 = s2.combine_chunks()
        buffers = s2.buffers()
        # honor the slice offset: a large_* input arrives zero-copy, so the
        # buffers are the PARENT's — reading from position 0 would compute
        # stats over a different region and mis-drive the selector
        offsets = np.frombuffer(
            buffers[1], dtype=np.int64, count=s2.offset + n + 1
        )[s2.offset:]
        base = int(offsets[0])
        data = np.frombuffer(
            buffers[2] or b"", dtype=np.uint8, count=int(offsets[-1])
        )[base:]
        offsets = offsets - base
        lens = np.diff(offsets)
        avg_len = float(lens.mean()) if n else 0.0
        entropy = _entropy_bits(data[: 1 << 16])
        p = _approx_prefix_lengths(offsets, data)
        # prefix win is bounded by avg_len but estimated over <=64B heads;
        # normalize by the capped width so short keys aren't penalized
        denom = min(avg_len, 64.0)
        prefix_ratio = float(p[1:].mean() / denom) if n > 1 and denom > 0 else 0.0
        # runs / sortedness on hashes-of-values is enough for equality runs
        eq = pc.equal(s.slice(0, n - 1), s.slice(1)).to_numpy(zero_copy_only=False) if n > 1 else np.array([])
        runs = 1 + int((~eq.astype(bool)).sum()) if n > 1 else 1
        mrl = n / runs
        sortedness = 0.0
        if n > 1:
            le = pc.less_equal(s.slice(0, n - 1), s.slice(1)).to_numpy(zero_copy_only=False)
            sortedness = float(np.nanmean(le.astype(np.float64)))
        return SampleStats(n, ndv_ratio, mrl, entropy, avg_len, prefix_ratio, sortedness)

    if phys == PhysType.BOOL:
        v = s.to_numpy(zero_copy_only=False).astype(np.uint8)
    elif phys in (PhysType.LIST_FLOAT32, PhysType.LIST):
        return SampleStats(n, ndv_ratio, 1.0, 8.0, 0.0, 0.0, 0.0)
    else:
        v = s.to_numpy(zero_copy_only=False).view(NUMPY_OF[phys])
    from webcodec.kernels.rle import mean_run_length

    mrl = mean_run_length(v)
    raw = np.ascontiguousarray(v).view(np.uint8)
    entropy = _entropy_bits(raw[: 1 << 16])
    sortedness = float((v[1:] >= v[:-1]).mean()) if n > 1 else 1.0
    return SampleStats(n, ndv_ratio, mrl, entropy, float(v.dtype.itemsize), 0.0, sortedness)


# ---- page/chunk min-max stats (footer) ---------------------------------------


def _bump_last(s: str) -> str | None:
    """Increment the last bumpable char so a truncated MAX stays an upper
    bound (reference parity: BinaryTruncator for the column index). Skips
    the UTF-16 surrogate range (unencodable as UTF-8); returns None when no
    char can bump (all U+10FFFF) — the caller must DROP the stat rather
    than store a non-bound."""
    for i in range(len(s) - 1, -1, -1):
        c = ord(s[i])
        if c < 0x10FFFF:
            c += 1
            if 0xD800 <= c <= 0xDFFF:
                c = 0xE000
            return s[:i] + chr(c)
    return None


def _encode_stat(v, phys: PhysType, truncate: int, is_max: bool = False):
    if v is None:
        return None
    if phys in (PhysType.STRING,):
        s = str(v)
        if len(s) > truncate:
            s = s[:truncate]
            if is_max:
                s = _bump_last(s)
        return s
    if phys == PhysType.BINARY:
        b = v if isinstance(v, bytes) else bytes(v)
        if len(b) > truncate:
            b = b[:truncate]
            if is_max:
                bb = bytearray(b)
                for i in range(len(bb) - 1, -1, -1):
                    if bb[i] < 0xFF:
                        bb[i] += 1
                        b = bytes(bb[: i + 1])
                        break
                else:
                    return None  # cannot bound; drop the stat
        return base64.b64encode(b).decode()
    if phys == PhysType.TIMESTAMP_US:
        if hasattr(v, "value"):  # pa scalar
            return int(v.value)
        if hasattr(v, "timestamp"):  # datetime -> epoch micros
            import calendar

            return int(calendar.timegm(v.utctimetuple())) * 1_000_000 + v.microsecond
        return int(v)
    if phys == PhysType.DATE32:
        if hasattr(v, "toordinal"):
            return v.toordinal() - 719_163  # days since epoch
        return int(v)
    if phys in (PhysType.LIST_FLOAT32, PhysType.LIST):
        return None
    if phys in (PhysType.FLOAT32, PhysType.FLOAT64):
        return float(v)
    return int(v) if not isinstance(v, bool) else bool(v)


def normalize_stat_value(value, phys: PhysType):
    """Convert a user predicate value into the domain page/chunk stats are
    stored in (epoch micros for timestamps, epoch days for dates, raw bytes
    for binary) so min/max comparisons are type-correct."""
    if phys == PhysType.TIMESTAMP_US:
        if hasattr(value, "value"):  # pd.Timestamp (ns)
            return int(value.value) // 1_000
        if hasattr(value, "utctimetuple"):  # datetime, naive == UTC
            import calendar

            return int(calendar.timegm(value.utctimetuple())) * 1_000_000 + value.microsecond
        return int(value)
    if phys == PhysType.DATE32:
        if hasattr(value, "toordinal"):
            return value.toordinal() - 719_163
        return int(value)
    if phys == PhysType.BINARY and isinstance(value, str):
        return value.encode()
    return value


def decode_stat(v, phys: PhysType):
    """Inverse of the storage encoding for comparisons (binary is base64)."""
    if v is None:
        return None
    if phys == PhysType.BINARY:
        return base64.b64decode(v)
    return v


def page_stats(arr: pa.Array, phys: PhysType, truncate: int = 64,
               unsigned64: bool = False) -> dict:
    """min/max/null_count for one page (truncated like the reference column
    index). ``unsigned64``: the int64 page holds bit-reinterpreted uint64
    values (types.widened) — min/max must be computed in the unsigned
    domain or a page with values around 2^63 mis-orders and mis-prunes."""
    null_count = arr.null_count
    valid = arr.drop_null()
    if len(valid) == 0 or phys in (PhysType.LIST_FLOAT32, PhysType.LIST):
        return {"min": None, "max": None, "null_count": int(null_count)}
    if unsigned64:
        import numpy as np

        u = valid.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        return {"min": int(u.min()), "max": int(u.max()),
                "null_count": int(null_count)}
    mm = pc.min_max(valid)
    return {
        "min": _encode_stat(mm["min"].as_py(), phys, truncate),
        "max": _encode_stat(mm["max"].as_py(), phys, truncate, is_max=True),
        "null_count": int(null_count),
    }


def raw_byte_size(arr: pa.Array) -> int:
    """Arrow buffer bytes of a column — the 'raw' side of the A7 size guard."""
    return arr.nbytes

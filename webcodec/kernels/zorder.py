"""Z-order (Morton) multi-column clustering keys.

The scale story (Iceberg/Delta ``OPTIMIZE ZORDER BY`` analogue, public
Morton-code construction): a file sorted by one column gives tight per-page
min/max stats for THAT column only — a predicate on any other column prunes
nothing. Interleaving the bits of rank-quantized columns orders rows along a
space-filling curve, so every participating column's values are locally
clustered and its page stats stay narrow: two-dimensional scans (the
time+user crawl probe) prune pages on BOTH dimensions at ~sqrt cost each.

Rank quantization (not value quantization) makes the curve distribution-free
and type-agnostic: any Arrow-orderable column (ints, floats, timestamps,
strings) maps to its within-group quantile rank in [0, 2^16), nulls last.
Everything is vectorized numpy — one sort per column plus 16*k bit ops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_QBITS = 16  # quantile resolution per column; 4 columns fill a uint64 key


def rank_quantize(col: "pa.ChunkedArray | pa.Array", n: int) -> np.ndarray:
    """Within-group quantile rank of each value, scaled to [0, 2^16):
    distribution-free, works for every orderable Arrow type; nulls sort
    last (highest quantile), ties keep first-occurrence order (stable)."""
    idx = pc.sort_indices(col).to_numpy(zero_copy_only=False).astype(np.int64)
    r = np.empty(n, dtype=np.uint64)
    r[idx] = np.arange(n, dtype=np.uint64)
    if n > 1:
        r = r * np.uint64((1 << _QBITS) - 1) // np.uint64(n - 1)
    return r


def zorder_key(table: pa.Table, cols: list[str]) -> np.ndarray:
    """uint64 Morton key per row: the bits of each column's 16-bit quantile
    rank interleaved MSB-first, round-robin across columns (up to 4 columns
    = 64 key bits). Vectorized: 16 * k shift/mask passes over the group."""
    if not 2 <= len(cols) <= 4:
        raise ValueError(f"zorder needs 2..4 columns, got {cols}")
    n = table.num_rows
    qs = [rank_quantize(table.column(c), n) for c in cols]
    z = np.zeros(n, dtype=np.uint64)
    one = np.uint64(1)
    for bit in range(_QBITS - 1, -1, -1):
        b = np.uint64(bit)
        for q in qs:
            z = (z << one) | ((q >> b) & one)
    return z


def zorder_sort_indices(table: pa.Table, cols: list[str]) -> np.ndarray:
    """Row permutation ordering the group along the Z-curve over ``cols``."""
    return np.argsort(zorder_key(table, cols), kind="stable")

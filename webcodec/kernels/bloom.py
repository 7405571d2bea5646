"""Split-block bloom filter (reference parity: SURVEY.md §2.C8,
parquet-java BlockSplitBloomFilter — 32-byte blocks, 8 salted words).

Same block structure as the reference; the value hash is a vectorized
FNV-1a-64 over (truncated) value bytes instead of xxHash64 (not available
in-sandbox) — self-consistent across encode/check, which is all a private
format needs. Insert/check are fully vectorized numpy.
"""

from __future__ import annotations

import numpy as np

# parquet's split-block salt constants
_SALT = np.array(
    [
        0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
        0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
    ],
    dtype=np.uint64,
)

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_HASH_CAP = 32  # hash at most the first 32 bytes of each value


def hash_values(offsets: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a-64 of each value's first <=32 bytes (+ length mixed
    in, so truncated prefixes of different lengths still differ).

    Processed in 1M-value blocks: the gather/compare matrices are O(n x 32)
    — unblocked, an 8M-row chunk would transiently allocate several GB on
    the encode path."""
    n = len(offsets) - 1
    _BLOCK = 1 << 20
    if n > _BLOCK:
        return np.concatenate([
            hash_values(offsets[s: s + _BLOCK + 1], data)
            for s in range(0, n, _BLOCK)
        ])
    lens = np.diff(offsets)
    if data.size == 0:  # all-empty values: keep the gather index 0 in bounds
        data = np.zeros(1, dtype=np.uint8)
    w = int(min(max(lens.max(), 1), _HASH_CAP)) if n else 1
    col = np.arange(w, dtype=np.int64)
    valid = col[None, :] < lens[:, None]
    take = np.where(valid, offsets[:-1, None] + col[None, :], 0)
    mat = data[take]  # stays uint8 — per-round xor upcasts one column at a time
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    np.multiply(h, _FNV_PRIME, out=h)  # mix a round for the length byte
    h ^= lens.astype(np.uint64)
    live_counts = valid.sum(axis=0)
    for k in range(w):
        if live_counts[k] == n:
            # common fast path (every value still has a byte here): no mask
            h = (h ^ mat[:, k]) * _FNV_PRIME
        else:
            live = valid[:, k]
            hk = (h ^ mat[:, k]) * _FNV_PRIME
            h[live] = hk[live]
    return _finalize(h)


def _finalize(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — FNV's high bits avalanche poorly on short keys
    and the block index uses them."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def hash_one(value: bytes) -> np.uint64:
    b = value[:_HASH_CAP]
    h = int(_FNV_OFFSET)
    h = (h * int(_FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    h ^= len(value)
    for byte in b:
        h = ((h ^ byte) * int(_FNV_PRIME)) & 0xFFFFFFFFFFFFFFFF
    return _finalize(np.array([h], dtype=np.uint64))[0]


def _block_masks(h: np.ndarray, nblocks: int) -> tuple[np.ndarray, np.ndarray]:
    block = ((h >> np.uint64(32)) % np.uint64(nblocks)).astype(np.int64)
    x = (h & np.uint64(0xFFFFFFFF))[:, None] * _SALT[None, :]
    bit = (x >> np.uint64(27)).astype(np.uint64) & np.uint64(31)
    masks = (np.uint32(1) << bit.astype(np.uint32)).astype(np.uint32)
    return block, masks


def build(hashes: np.ndarray, fpp: float = 0.01, max_bytes: int = 1 << 20) -> bytes:
    """Filter bytes sized for len(hashes) distinct values at ~fpp."""
    n = max(len(hashes), 1)
    m_bits = int(-n * np.log(max(min(fpp, 0.5), 1e-6)) / (np.log(2) ** 2))
    nblocks = max((m_bits + 255) // 256, 1)
    nblocks = min(nblocks, max_bytes // 32)
    words = np.zeros((nblocks, 8), dtype=np.uint32)
    if len(hashes):
        block, masks = _block_masks(hashes.astype(np.uint64), nblocks)
        for w in range(8):  # 8 scatter-ORs, vectorized over values
            np.bitwise_or.at(words[:, w], block, masks[:, w])
    return words.tobytes()


def might_contain(filter_bytes: bytes | memoryview, h: np.uint64) -> bool:
    words = np.frombuffer(filter_bytes, dtype=np.uint32).reshape(-1, 8)
    block, masks = _block_masks(np.array([h], dtype=np.uint64), len(words))
    return bool(((words[block[0]] & masks[0]) == masks[0]).all())


# ------------------------- parquet-SPEC split block ---------------------------
# The .wcd filter above is self-consistent (private format). The functions
# below are BIT-EXACT to parquet-format BloomFilter.md for interop files:
# XXH64 value hash (kernels/xxh.py), block index by the spec's multiply-
# shift range reduction ``((h >> 32) * nblocks) >> 32`` (NOT modulo), and
# the same 8-salt mask schedule (_SALT — identical constants).


def _spec_block_masks(h: np.ndarray, nblocks: int):
    block = (((h >> np.uint64(32)) * np.uint64(nblocks))
             >> np.uint64(32)).astype(np.int64)
    x = (h & np.uint64(0xFFFFFFFF))[:, None] * _SALT[None, :]
    bit = (x >> np.uint64(27)).astype(np.uint64) & np.uint64(31)
    masks = (np.uint32(1) << bit.astype(np.uint32)).astype(np.uint32)
    return block, masks


def spec_num_bytes(ndv: int, fpp: float = 0.01,
                   max_bytes: int = 1 << 20) -> int:
    """Power-of-two byte size for ``ndv`` distinct values at ~``fpp``,
    using parquet-java's split-block formula (BlockSplitBloomFilter.
    optimalNumOfBits): bits = -8n / ln(1 - fpp^(1/8)) — the k=8 fixed-
    hash variant, slightly larger than the classic -n*ln(p)/ln(2)^2 —
    rounded up to a power of two within [32 bytes, max]."""
    n = max(int(ndv), 1)
    p = max(min(fpp, 0.5), 1e-9)
    bits = -8.0 * n / np.log(1.0 - p ** (1.0 / 8.0))
    nbytes = 32
    while nbytes * 8 < bits and nbytes < max_bytes:
        nbytes *= 2
    return min(nbytes, max_bytes)


def spec_build(hashes: np.ndarray, nbytes: int) -> bytes:
    """Spec split-block bitset of ``nbytes`` (multiple of 32) bytes."""
    nblocks = max(nbytes // 32, 1)
    words = np.zeros((nblocks, 8), dtype=np.uint32)
    if len(hashes):
        block, masks = _spec_block_masks(hashes.astype(np.uint64), nblocks)
        for w in range(8):
            np.bitwise_or.at(words[:, w], block, masks[:, w])
    return words.tobytes()


def spec_might_contain(filter_bytes: bytes | memoryview,
                       h: int | np.uint64) -> bool:
    words = np.frombuffer(filter_bytes, dtype=np.uint32).reshape(-1, 8)
    block, masks = _spec_block_masks(
        np.array([h], dtype=np.uint64), len(words))
    return bool(((words[block[0]] & masks[0]) == masks[0]).all())

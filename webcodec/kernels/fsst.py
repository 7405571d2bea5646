"""FSST — Fast Static Symbol Table string compression.

Not present in the reference format (SURVEY.md §2.A12: parquet-java's Encoding
enum has no FSST); mandated as our extension by BASELINE.json north_star.
Public knowledge source: Boncz, Neumann, Muehleisen, "FSST: Fast Random Access
String Compression", VLDB 2020 (used by DuckDB / BtrBlocks).

Design (simplified but faithful):
- symbol table: <= 255 symbols of 1..8 bytes, built by iterative greedy
  counting over a small sample (<= 5 iterations, sample <= 16 KiB);
  code 255 is the escape marker (escape = 0xFF + literal byte, 2 bytes).
- encode: longest-match via a compiled alternation regex ordered by symbol
  length (C-speed scan; the per-match callback is the only Python).
- decode: fully vectorized numpy — escape markers located with a run-parity
  trick over 0xFF runs, symbol expansion via a (256, 8) byte-matrix gather.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

MAX_SYMBOLS = 255  # code 255 reserved as escape
MAX_SYMBOL_LEN = 8
ESCAPE = 255


class SymbolTable:
    __slots__ = ("symbols", "_pattern", "_sub_map", "_matrix", "_lens", "_enc_luts")

    def __init__(self, symbols: list[bytes]):
        assert len(symbols) <= MAX_SYMBOLS
        self.symbols = symbols
        self._enc_luts = None
        ordered = sorted(range(len(symbols)), key=lambda i: -len(symbols[i]))
        pat = b"|".join(re.escape(symbols[i]) for i in ordered)
        pat = (pat + b"|" if pat else b"") + b"(?s:.)"
        self._pattern = re.compile(pat)
        self._sub_map = {symbols[i]: bytes([i]) for i in range(len(symbols))}
        # decode gather matrix
        self._matrix = np.zeros((256, MAX_SYMBOL_LEN), dtype=np.uint8)
        self._lens = np.ones(256, dtype=np.int64)  # escapes/unknown default len 1
        for i, s in enumerate(symbols):
            self._matrix[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
            self._lens[i] = len(s)

    def serialize(self) -> bytes:
        out = bytearray([len(self.symbols)])
        for s in self.symbols:
            out.append(len(s))
            out += s
        return bytes(out)

    @classmethod
    def deserialize(cls, data: bytes | memoryview) -> tuple["SymbolTable", int]:
        buf = memoryview(data)
        count = buf[0]
        pos = 1
        symbols = []
        for _ in range(count):
            ln = buf[pos]
            pos += 1
            symbols.append(bytes(buf[pos : pos + ln]))
            pos += ln
        return cls(symbols), pos


def _tokenize(data: bytes, table: SymbolTable) -> list[bytes]:
    return table._pattern.findall(data)


def _dedupe_prefixes(ranked: list[bytes]) -> list[bytes]:
    """Keep at most ONE symbol of length >= 3 per 2-byte prefix (FSST-paper
    style restriction) so the vectorized encoder resolves longest-match with
    direct table lookups while staying exact greedy w.r.t. this table."""
    out: list[bytes] = []
    seen_long: set[bytes] = set()
    for s in ranked:
        if len(s) >= 3:
            p = s[:2]
            if p in seen_long:
                continue
            seen_long.add(p)
        out.append(s)
        if len(out) >= MAX_SYMBOLS:
            break
    return out


def cap_symbols(table: "SymbolTable", cap: int) -> "SymbolTable":
    """Variant table with symbols truncated to ``cap`` bytes (deduped, order
    kept). Shorter symbols can yield a more regular code stream that the page
    codec compresses better — the chunk trial picks empirically."""
    return SymbolTable(list(dict.fromkeys(s[:cap] for s in table.symbols))[:MAX_SYMBOLS])


def build_table(sample: bytes, iterations: int = 5) -> SymbolTable:
    """Iterative greedy symbol-table construction on a sample."""
    if not sample:
        return SymbolTable([])
    # iteration 0: frequent single bytes
    counts = np.bincount(np.frombuffer(sample, dtype=np.uint8), minlength=256)
    order = np.argsort(-counts)
    symbols = [bytes([int(b)]) for b in order if counts[b] > 0][:MAX_SYMBOLS]
    table = SymbolTable(symbols)
    for _ in range(iterations - 1):
        tokens = _tokenize(sample, table)
        gain: Counter[bytes] = Counter()
        for t in tokens:
            gain[t] += len(t)
        for a, b in zip(tokens, tokens[1:]):
            cat = a + b
            if len(cat) <= MAX_SYMBOL_LEN:
                gain[cat] += len(cat)
        ranked = [s for s, _ in gain.most_common(MAX_SYMBOLS * 4)]
        table = SymbolTable(_dedupe_prefixes(ranked))
    return table


def encode_regex(data: bytes, table: SymbolTable) -> bytes:
    """Reference scalar encode (used for differential tests and tiny inputs)."""
    sub_map = table._sub_map

    def repl(m: re.Match) -> bytes:
        s = m.group(0)
        code = sub_map.get(s)
        return code if code is not None else b"\xff" + s

    return table._pattern.sub(repl, data)


_CHASE_STRIDE = 16  # anchor spacing for the vectorized greedy chase
# (measured sweep on the text corpus: 16 edges out 32 — one fewer full
# pointer-doubling gather buys more than the 2x-longer anchor walk costs)

_POS_CACHE = np.empty(0, dtype=np.int64)


def _pos(n: int) -> np.ndarray:
    """Process-cached arange — avoids refilling an 8n-byte buffer per segment."""
    global _POS_CACHE
    if len(_POS_CACHE) < n:
        _POS_CACHE = np.arange(max(n, _SEGMENT), dtype=np.int64)
    return _POS_CACHE[:n]


def _encode_luts(table: "SymbolTable"):
    """Per-table encode lookup tables, built once and cached on the table."""
    if table._enc_luts is not None:
        return table._enc_luts
    NOSYM = np.uint8(255)
    lut1 = np.full(256, NOSYM, dtype=np.uint8)
    lut2 = np.full(65536, NOSYM, dtype=np.uint8)
    lut_long = np.full(65536, NOSYM, dtype=np.uint8)
    key_lo = np.zeros(256, dtype=np.uint32)
    mask_lo = np.zeros(256, dtype=np.uint32)
    key_hi = np.zeros(256, dtype=np.uint32)
    mask_hi = np.zeros(256, dtype=np.uint32)
    sym_len = np.zeros(256, dtype=np.uint8)
    for code, s in enumerate(table.symbols):
        L = len(s)
        sym_len[code] = L
        full = int.from_bytes(s, "little")
        m = (1 << (8 * L)) - 1
        key_lo[code] = full & 0xFFFFFFFF
        mask_lo[code] = m & 0xFFFFFFFF
        key_hi[code] = (full >> 32) & 0xFFFFFFFF
        mask_hi[code] = (m >> 32) & 0xFFFFFFFF
        if L == 1:
            lut1[s[0]] = code
        elif L == 2:
            lut2[s[0] | (s[1] << 8)] = code
        else:
            lut_long[s[0] | (s[1] << 8)] = code
    out = (lut1, lut2, lut_long, key_lo, mask_lo, key_hi, mask_hi, sym_len)
    table._enc_luts = out
    return out


# Segment size: smaller segments keep ~15 temporaries cache/allocator-warm.
# Measured sweep (text corpus, this VM): 1MB=15.3, 256KB=18.4, 128KB=20.2 MB/s
# with +0.02% size; below 64KB fixed costs win again.
_SEGMENT = 128 << 10


def encode(data: bytes, table: SymbolTable) -> bytes:
    """Segmented vectorized encode. Segment concatenation is exact: codes are
    position-independent against a static table, so restarting the greedy
    walk at a boundary yields a valid (at most one-token different) stream."""
    if len(data) <= _SEGMENT + (_SEGMENT >> 2):
        return _encode_segment(data, table)
    parts = []
    for s in range(0, len(data), _SEGMENT):
        parts.append(_encode_segment(data[s : s + _SEGMENT], table))
    return b"".join(parts)


def _encode_segment(data: bytes, table: SymbolTable) -> bytes:
    """Vectorized exact-greedy encode against the (prefix-restricted) table.

    Because build_table keeps at most one >=3-byte symbol per 2-byte prefix,
    longest-match at a position is resolved with direct lookups: the unique
    long candidate via a 64K table on the first two bytes (verified against
    its key — low 4 bytes wide, high bytes on the surviving subset only),
    else the exact 2-byte symbol, else the 1-byte symbol, else escape. The
    greedy token walk is vectorized with pointer doubling to stride-S anchors
    + lockstep chain advance; per-token code gathers happen only at the ~n/4
    token positions.
    """
    n = len(data)
    if n == 0:
        return b""
    if n < 4096 or not table.symbols:
        return encode_regex(data, table)
    raw = np.frombuffer(data, dtype=np.uint8)
    padded = np.empty(n + 8, dtype=np.uint8)
    padded[:n] = raw
    padded[n:] = 0

    NOSYM = np.uint8(255)
    lut1, lut2, lut_long, key_lo, mask_lo, key_hi, mask_hi, sym_len = _encode_luts(table)

    # contiguous windows via shift-or of aligned loads (no unaligned views)
    w2 = raw.astype(np.uint16)
    w2 |= padded[1 : n + 1].astype(np.uint16) << np.uint16(8)
    w2i = w2.astype(np.intp)  # one cast, reused by all 64K-table gathers
    w4 = w2.astype(np.uint32)
    w4 |= padded[2 : n + 2].astype(np.uint32) << np.uint32(16)
    w4 |= padded[3 : n + 3].astype(np.uint32) << np.uint32(24)

    cand = lut_long[w2i]
    candi = cand.astype(np.intp)
    cl = sym_len[candi]
    pos = _pos(n)
    long_hit = (cand != NOSYM) & ((w4 & mask_lo[candi]) == key_lo[candi])
    # a match may not run past the end — only the last 8 positions can,
    # so fix them up instead of paying a full-array compare
    tail = max(n - MAX_SYMBOL_LEN, 0)
    long_hit[tail:] &= pos[tail:] <= n - cl[tail:]
    # high-dword verify only where the low dword already matched a >4-byte symbol
    sub = np.flatnonzero(long_hit & (cl > 4))
    if len(sub):
        w4h = padded[sub + 4].astype(np.uint32)
        w4h |= padded[sub + 5].astype(np.uint32) << np.uint32(8)
        w4h |= padded[sub + 6].astype(np.uint32) << np.uint32(16)
        w4h |= padded[sub + 7].astype(np.uint32) << np.uint32(24)
        ci = candi[sub]
        bad = (w4h & mask_hi[ci]) != key_hi[ci]
        long_hit[sub[bad]] = False

    two_code = lut2[w2i]
    two_hit = two_code != NOSYM
    if n >= 1:
        two_hit[-1] = False
    one_code = lut1[raw]

    # layered masked stores beat nested np.where chains (no u8 intermediate
    # + final astype): 1-byte hit -> 1, then 2-byte -> 2, then long -> cl
    best_len = (one_code != NOSYM).astype(np.int32)
    best_len[two_hit] = 2
    np.putmask(best_len, long_hit, cl.astype(np.int32))

    # jump table with sentinel at n (escape advances 1)
    j1 = np.full(n + 1, n, dtype=np.int32)
    np.minimum(pos + np.maximum(best_len, 1), n, out=j1[:n], casting="unsafe")
    # pointer doubling with np.take(out=) ping-pong buffers: the naive
    # js = js[js] allocates a fresh n-array per round (~9% of segment wall)
    js = j1.copy()  # j1 itself feeds the chain advance below
    tmp = np.empty_like(js)
    s = 1
    while s < _CHASE_STRIDE:
        np.take(js, js, out=tmp)
        js, tmp = tmp, js
        s *= 2
    anchors = [0]
    a = 0
    while True:
        a = int(js[a])
        if a >= n:
            break
        anchors.append(a)
    A = np.array(anchors, dtype=np.int32)
    chains = np.empty((_CHASE_STRIDE, len(A)), dtype=np.int32)
    chains[0] = A
    for t in range(1, _CHASE_STRIDE):
        chains[t] = j1[chains[t - 1]]
    tok = chains.T.reshape(-1)
    tok = tok[tok < n].astype(np.intp)

    # per-token codes (subset gathers only); emit via cumsum scatter
    lh_t = long_hit[tok]
    th_t = two_hit[tok]
    bl_t = best_len[tok]
    code_t = np.where(lh_t, cand[tok], np.where(th_t, two_code[tok], one_code[tok]))
    esc = bl_t == 0
    out_off = np.empty(len(tok), dtype=np.int64)
    out_off[0] = 0
    np.cumsum(esc[:-1].astype(np.int64) + 1, out=out_off[1:])
    total = int(out_off[-1]) + (2 if len(tok) and esc[-1] else 1) if len(tok) else 0
    outb = np.empty(total, dtype=np.uint8)
    outb[out_off] = np.where(esc, ESCAPE, code_t)
    esc_idx = np.flatnonzero(esc)
    if len(esc_idx):
        outb[out_off[esc_idx] + 1] = raw[tok[esc_idx]]
    return outb.tobytes()


def decode(data: bytes | memoryview, table: SymbolTable) -> bytes:
    """Vectorized decode (no per-token Python)."""
    codes = np.frombuffer(data, dtype=np.uint8)
    n = len(codes)
    if n == 0:
        return b""
    is_esc = codes == ESCAPE
    if is_esc.any():
        # runs of consecutive 0xFF: markers at even offsets within each run
        flat = is_esc.view(np.uint8)
        change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
        starts = np.concatenate(([0], change))
        rlens = np.diff(np.concatenate((starts, [n])))
        esc_runs = flat[starts] == 1
        rs, rl = starts[esc_runs], rlens[esc_runs]
        mcounts = (rl + 1) // 2
        total_m = int(mcounts.sum())
        base = np.repeat(rs, mcounts)
        prev = np.concatenate(([0], np.cumsum(mcounts[:-1]))) if len(mcounts) else np.empty(0, np.int64)
        within = np.arange(total_m, dtype=np.int64) - np.repeat(prev, mcounts)
        markers = base + 2 * within
        if total_m and markers[-1] + 1 >= n:
            raise ValueError("truncated FSST escape at end of stream")
        is_marker = np.zeros(n, dtype=bool)
        is_marker[markers] = True
        is_literal = np.zeros(n + 1, dtype=bool)
        is_literal[markers + 1] = True
        is_literal = is_literal[:n]
    else:
        is_marker = np.zeros(n, dtype=bool)
        is_literal = is_marker
    token_pos = np.flatnonzero(~is_literal)
    # chunked expansion: bounds the (tokens x 8) gather matrix to ~2MB so the
    # allocator stays warm (same trick as the encode segmenting)
    STEP = 1 << 18
    col8 = np.arange(MAX_SYMBOL_LEN)
    parts: list[bytes] = []
    for s0 in range(0, len(token_pos), STEP):
        tp = token_pos[s0 : s0 + STEP]
        tc = codes[tp]
        tm = is_marker[tp]
        out_lens = np.where(tm, 1, table._lens[tc])
        mat = table._matrix[tc]
        if tm.any():
            mat = mat.copy()
            mat[tm, 0] = codes[tp[tm] + 1]
        mask = col8[None, :] < out_lens[:, None]
        parts.append(mat[mask].tobytes())
    return b"".join(parts)


# -- page-level helpers --------------------------------------------------------


def compress(data: bytes, sample_bytes: int = 1 << 14, table: SymbolTable | None = None) -> bytes:
    """Self-contained blob: serialized table + u64 payload len + encoded bytes.

    Pass a prebuilt ``table`` to amortize table construction across the pages
    of one column chunk (the reference builds its dictionary per chunk too).
    """
    if table is None:
        table = build_table(data[:sample_bytes])
    enc = encode(data, table)
    head = table.serialize()
    return len(head).to_bytes(4, "little") + head + len(enc).to_bytes(8, "little") + enc


def decompress(blob: bytes | memoryview) -> bytes:
    buf = memoryview(blob)
    hlen = int.from_bytes(buf[:4], "little")
    table, _ = SymbolTable.deserialize(buf[4 : 4 + hlen])
    pos = 4 + hlen
    elen = int.from_bytes(buf[pos : pos + 8], "little")
    pos += 8
    return decode(buf[pos : pos + elen], table)

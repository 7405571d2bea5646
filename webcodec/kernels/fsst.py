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
    __slots__ = ("symbols", "_pattern", "_sub_map", "_matrix", "_lens")

    def __init__(self, symbols: list[bytes]):
        assert len(symbols) <= MAX_SYMBOLS
        self.symbols = symbols
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
        best = [s for s, _ in gain.most_common(MAX_SYMBOLS)]
        table = SymbolTable(best)
    return table


def encode(data: bytes, table: SymbolTable) -> bytes:
    """Longest-match encode; unmatched bytes escape as 0xFF + byte."""
    sub_map = table._sub_map

    def repl(m: re.Match) -> bytes:
        s = m.group(0)
        code = sub_map.get(s)
        return code if code is not None else b"\xff" + s

    return table._pattern.sub(repl, data)


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
    tok_codes = codes[token_pos]
    tok_marker = is_marker[token_pos]
    out_lens = np.where(tok_marker, 1, table._lens[tok_codes])
    mat = table._matrix[tok_codes].copy()
    if tok_marker.any():
        lit_pos = token_pos[tok_marker] + 1
        mat[tok_marker, 0] = codes[lit_pos]
    mask = np.arange(MAX_SYMBOL_LEN)[None, :] < out_lens[:, None]
    return mat[mask].tobytes()


# -- page-level helpers --------------------------------------------------------


def compress(data: bytes, sample_bytes: int = 1 << 14) -> bytes:
    """Self-contained blob: serialized table + u64 payload len + encoded bytes."""
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

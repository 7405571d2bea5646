"""Deprecated BIT_PACKED level encoding (parquet-format Encodings.md: legal
only for rep/def levels, written by ancient parquet-mr/Impala): no modern
writer emits it, so the fixture file is HAND-CRAFTED here — a v1 data page
whose repetition AND definition levels are bit-packed (no u32 length
prefix) — and then read by BOTH pyarrow (the reference reader keeps legacy
support) and our interop reader, value-for-value.

Bit order: Arrow C++ (and Impala, whose files are the only real-world
source of BIT_PACKED levels pyarrow still reads) decodes these levels with
its generic LSB-first BitReader, while the spec prose and parquet-java use
MSB-first. Verified empirically: pyarrow 16 only accepts the LSB layout.
We match pyarrow, the differential reference (kernels/bitpack.py
pack_legacy_lsb)."""

import struct

import pyarrow as pa
import pyarrow.parquet as pq

from webcodec.kernels import bitpack
from webcodec.parquet_writer import (_f_i32, _f_struct, _file_metadata,
                                     _stop, _TOut)
from webcodec import parquet_interop as pi

ROWS = [[1, 2], [], None, [3, None, 4]]
# per-entry level streams for list<int32 (optional)> (max_rep 1, max_def 3)
REPS = [0, 1, 0, 0, 0, 1, 1]
DEFS = [3, 3, 1, 0, 3, 2, 3]
VALS = [1, 2, 3, 4]


def _page_header_bitpacked(n_values, usize, csize):
    dph = _TOut()
    last = 0
    last = _f_i32(dph, last, 1, n_values)
    last = _f_i32(dph, last, 2, 0)  # values: PLAIN
    last = _f_i32(dph, last, 3, 4)  # def levels: BIT_PACKED
    last = _f_i32(dph, last, 4, 4)  # rep levels: BIT_PACKED
    _stop(dph)
    ph = _TOut()
    last = 0
    last = _f_i32(ph, last, 1, 0)  # DATA_PAGE
    last = _f_i32(ph, last, 2, usize)
    last = _f_i32(ph, last, 3, csize)
    last = _f_struct(ph, last, 5, bytes(dph.buf))
    _stop(ph)
    return bytes(ph.buf)


def _craft(path):
    import numpy as np

    body = bytes(bitpack.pack_legacy_lsb(np.array(REPS, np.uint64), 1))
    body += bytes(bitpack.pack_legacy_lsb(np.array(DEFS, np.uint64), 2))
    body += struct.pack(f"<{len(VALS)}i", *VALS)
    page = _page_header_bitpacked(len(REPS), len(body), len(body)) + body
    t = pa.table({"a": pa.array(ROWS, pa.list_(pa.int32()))})
    groups = [[{
        # chunk sizes include the page HEADER bytes (spec: totals over the
        # whole chunk); the PageHeader's own sizes cover only the body
        "type": 1, "enc": 0, "name": "a", "path": ["a", "list", "element"],
        "num_values": len(REPS), "usize": len(page), "csize": len(page),
        "offset": 4, "stats": None,
    }]]
    footer = _file_metadata(t, groups, "uncompressed", len(ROWS))
    with open(path, "wb") as f:
        f.write(b"PAR1" + page + footer
                + struct.pack("<I", len(footer)) + b"PAR1")


def test_bitpacked_levels_both_readers(tmp_path):
    p = str(tmp_path / "bp.parquet")
    _craft(p)
    expect = pa.table({"a": pa.array(ROWS, pa.list_(pa.int32()))})
    ref = pq.read_table(p)  # pyarrow keeps legacy BIT_PACKED support
    assert ref.column("a").combine_chunks() == expect.column("a").combine_chunks()
    mine = pi.read_table_arrow(p)
    assert mine.column("a").combine_chunks() == expect.column("a").combine_chunks()

"""Differential parquet reader: decode REAL parquet pages with our kernels.

Purpose (SURVEY.md §7.2 differential test): the engine's own file format
deliberately deviates from parquet bytes (SURVEY.md §7.0 — bit-identical
*decode output* is the contract), so self-round-trip alone cannot prove the
level/RLE/bit-pack machinery matches reference semantics. This module parses
pyarrow/parquet-java-written files directly — thrift compact-protocol page
headers, v1 data pages, PLAIN, (PLAIN_/RLE_)DICTIONARY, DELTA_BINARY_PACKED,
DELTA_LENGTH_BYTE_ARRAY, DELTA_BYTE_ARRAY and BYTE_STREAM_SPLIT encodings,
RLE-encoded definition levels — and decodes them using ONLY webcodec kernels
(``rle.decode_spec``, ``bitpack``, ``delta``, ``bss``, numpy plain readers).
A value-for-value match against the reference reader is kernel-level format
parity.

Format evidence (public): the parquet-format spec (Encodings.md: RLE header
= ``groups << 1 | 1`` for bit-packed runs, ``count << 1`` + LE value bytes
for RLE runs; data page v1 = def levels [u32 length + hybrid] then values)
and the thrift compact protocol spec (field delta/type nibbles, zigzag
varints).

Scope: flat schemas, v1 AND v2 data pages (v2: levels stored uncompressed
outside the compressed values region, lengths in the page header), codecs
none/snappy/zstd/gzip/lz4, physical types INT32/INT64/FLOAT/DOUBLE/
BYTE_ARRAY. Enough to differential-test every kernel family the engine
relies on.
"""

from __future__ import annotations

import struct

import numpy as np

from webcodec.kernels import rle
from webcodec.kernels.varint import read_uvarint

# ---------------------------- thrift compact ---------------------------------

_STOP = 0


def _zigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _read_struct(buf: memoryview, pos: int) -> tuple[dict, int]:
    """Parse one thrift compact struct into {field_id: value}; values of
    nested structs are dicts; unneeded field types are skipped."""
    out: dict = {}
    last_fid = 0
    while True:
        byte = buf[pos]
        pos += 1
        if byte == _STOP:
            return out, pos
        delta = byte >> 4
        ftype = byte & 0x0F
        if delta == 0:  # long-form field id: zigzag varint
            u, pos = read_uvarint(buf, pos)
            fid = _zigzag(u)
        else:
            fid = last_fid + delta
        last_fid = fid
        if ftype in (1, 2):  # bool true/false encoded in the type nibble
            out[fid] = ftype == 1
        elif ftype == 3:  # byte
            out[fid] = int(np.int8(buf[pos]))
            pos += 1
        elif ftype in (4, 5, 6):  # i16/i32/i64: zigzag varint
            u, pos = read_uvarint(buf, pos)
            out[fid] = _zigzag(u)
        elif ftype == 7:  # double
            out[fid] = struct.unpack("<d", buf[pos : pos + 8])[0]
            pos += 8
        elif ftype == 8:  # binary/string
            ln, pos = read_uvarint(buf, pos)
            out[fid] = bytes(buf[pos : pos + ln])
            pos += ln
        elif ftype in (9, 10):  # list/set
            head = buf[pos]
            pos += 1
            size = head >> 4
            etype = head & 0x0F
            if size == 15:
                size, pos = read_uvarint(buf, pos)
            items = []
            for _ in range(size):
                if etype == 12:
                    v, pos = _read_struct(buf, pos)
                elif etype in (4, 5, 6):
                    u, pos = read_uvarint(buf, pos)
                    v = _zigzag(u)
                elif etype == 8:
                    ln, pos = read_uvarint(buf, pos)
                    v = bytes(buf[pos : pos + ln])
                    pos += ln
                elif etype in (1, 2):
                    v = buf[pos] == 1
                    pos += 1
                else:
                    raise NotImplementedError(f"thrift list elem type {etype}")
                items.append(v)
            out[fid] = items
        elif ftype == 12:  # struct
            out[fid], pos = _read_struct(buf, pos)
        else:
            raise NotImplementedError(f"thrift compact type {ftype}")


# ------------------------------- page decode ----------------------------------

_PAGE_DATA, _PAGE_DICT, _PAGE_DATA_V2 = 0, 2, 3  # PageType enum
_ENC_PLAIN, _ENC_PLAIN_DICT, _ENC_RLE, _ENC_RLE_DICT = 0, 2, 3, 8
_ENC_DELTA_BP, _ENC_DELTA_LEN_BA, _ENC_DELTA_BA, _ENC_BSS = 5, 6, 7, 9

_BSS_DTYPES = {
    "INT32": np.dtype(np.int32),
    "INT64": np.dtype(np.int64),
    "FLOAT": np.dtype(np.float32),
    "DOUBLE": np.dtype(np.float64),
}


def _decompress(payload: bytes, codec: str, usize: int) -> bytes:
    codec = codec.lower()
    if codec in ("uncompressed", "none"):
        return payload
    if codec == "gzip":
        import zlib

        return zlib.decompress(payload, wbits=31)
    import pyarrow as pa

    return pa.decompress(payload, decompressed_size=usize, codec=codec, asbytes=True)


def _plain_values(body: memoryview, n: int, phys: str):
    if phys == "INT32":
        return np.frombuffer(body, dtype=np.int32, count=n)
    if phys == "INT64":
        return np.frombuffer(body, dtype=np.int64, count=n)
    if phys == "FLOAT":
        return np.frombuffer(body, dtype=np.float32, count=n)
    if phys == "DOUBLE":
        return np.frombuffer(body, dtype=np.float64, count=n)
    if phys == "BYTE_ARRAY":
        out = []
        pos = 0
        for _ in range(n):
            (ln,) = struct.unpack_from("<I", body, pos)
            pos += 4
            out.append(bytes(body[pos : pos + ln]))
            pos += ln
        return out
    raise NotImplementedError(f"physical type {phys}")


def _delta_length_byte_array(body: memoryview, n: int) -> list:
    """DELTA_LENGTH_BYTE_ARRAY: a DELTA_BINARY_PACKED stream of lengths,
    immediately followed by the concatenated value bytes."""
    from webcodec.kernels import delta

    lens, off = delta.decode_stream(body, n)
    blob = body[off:]
    ends = np.cumsum(lens)
    starts = ends - lens
    return [bytes(blob[s:e]) for s, e in zip(starts, ends)]


def read_column_chunk(path: str, row_group: int, column: int) -> list:
    """Decode one column chunk of a real parquet file to a python list
    (None for nulls) using only webcodec kernels for levels/RLE/bit-pack."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    meta = pf.metadata.row_group(row_group).column(column)
    phys = meta.physical_type
    codec = meta.compression
    col_schema = pf.schema_arrow.field(column)
    max_def = 1 if col_schema.nullable else 0

    with open(path, "rb") as f:
        data = f.read()
    buf = memoryview(data)
    start = meta.dictionary_page_offset
    if start is None:
        start = meta.data_page_offset
    end = start + meta.total_compressed_size

    dict_values = None
    out: list = []
    pos = start
    rows = 0
    while pos < end and rows < meta.num_values:
        header, pos = _read_struct(buf, pos)
        ptype = header[1]
        usize, csize = header[2], header[3]
        raw_page = buf[pos : pos + csize]
        pos += csize
        if ptype == _PAGE_DICT:
            dph = header[7]
            body = memoryview(_decompress(bytes(raw_page), codec, usize))
            dict_values = _plain_values(body, dph[1], phys)
            continue
        mask = None
        if ptype == _PAGE_DATA:
            dph = header[5]
            n_values = dph[1]
            enc = dph[2]
            lvl_enc = dph.get(3, _ENC_RLE)  # definition_level_encoding
            body = memoryview(_decompress(bytes(raw_page), codec, usize))
            if max_def:
                if lvl_enc == _ENC_RLE:  # u32 length + hybrid stream
                    (lvl_len,) = struct.unpack_from("<I", body, 0)
                    levels = rle.decode_spec(body[4 : 4 + lvl_len], 1, n_values)
                    body = body[4 + lvl_len :]
                elif lvl_enc == 4:  # deprecated BIT_PACKED: MSB-first, no prefix
                    from webcodec.kernels import bitpack

                    nb = (n_values + 7) // 8
                    levels = bitpack.unpack_legacy(body[:nb], 1, n_values)
                    body = body[nb:]
                else:
                    raise NotImplementedError(f"level encoding {lvl_enc}")
                mask = levels.astype(bool)
                n_nonnull = int(mask.sum())
            else:
                n_nonnull = n_values
        elif ptype == _PAGE_DATA_V2:
            # v2: levels live UNCOMPRESSED ahead of the (optionally)
            # compressed values; lengths come from the header, def level
            # streams carry no u32 prefix
            dph = header[8]
            n_values = dph[1]
            n_nulls = dph.get(2, 0)
            enc = dph[4]
            def_len = dph.get(5, 0)
            rep_len = dph.get(6, 0)
            compressed = dph.get(7, True)
            lvl_bytes = raw_page[: rep_len + def_len]
            vals_bytes = bytes(raw_page[rep_len + def_len :])
            if compressed:
                vals_bytes = _decompress(vals_bytes, codec, usize - rep_len - def_len)
            body = memoryview(vals_bytes)
            if max_def:
                levels = rle.decode_spec(lvl_bytes[rep_len:], 1, n_values)
                mask = levels.astype(bool)
                n_nonnull = int(mask.sum())
                assert n_values - n_nonnull == n_nulls
            else:
                n_nonnull = n_values
        else:
            raise NotImplementedError(f"page type {ptype}")
        if enc in (_ENC_PLAIN_DICT, _ENC_RLE_DICT):
            width = body[0]
            idx = rle.decode_spec(body[1:], width, n_nonnull)
            vals = (
                [dict_values[i] for i in idx]
                if isinstance(dict_values, list)
                else dict_values[idx.astype(np.int64)]
            )
        elif enc == _ENC_PLAIN:
            vals = _plain_values(body, n_nonnull, phys)
        elif enc == _ENC_DELTA_BP:
            from webcodec.kernels import delta

            vals = delta.decode(body, n_nonnull)
            if phys == "INT32":
                vals = vals.astype(np.int32)
        elif enc == _ENC_DELTA_LEN_BA:
            vals = _delta_length_byte_array(body, n_nonnull)
        elif enc == _ENC_DELTA_BA:
            from webcodec.kernels import delta

            prefix_lens, off = delta.decode_stream(body, n_nonnull)
            suffixes = _delta_length_byte_array(body[off:], n_nonnull)
            vals = []
            prev = b""
            for plen, suf in zip(prefix_lens, suffixes):
                prev = prev[: int(plen)] + suf
                vals.append(prev)
        elif enc == _ENC_BSS:
            from webcodec.kernels import bss

            vals = bss.decode(body, _BSS_DTYPES[phys], n_nonnull)
        else:
            raise NotImplementedError(f"encoding {enc}")
        if mask is None:
            out.extend(v.item() if isinstance(v, np.generic) else v for v in vals)
        else:
            it = iter(vals)
            for ok in mask:
                if ok:
                    v = next(it)
                    out.append(v.item() if isinstance(v, np.generic) else v)
                else:
                    out.append(None)
        rows += n_values
    return out

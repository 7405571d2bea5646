"""webcodec file format: pages + column chunks + JSON footer.

Layout (reference parity SURVEY.md §2.C — ParquetFileWriter / PageHeader /
FileMetaData analogues; Parquet-compatible page-header *field set* per
SURVEY.md §7.0 design decision):

    magic "WCD1"
    [per column: optional dict page, data pages...]   (any order; offsets in footer)
    footer-json (utf8)
    u32 footer_len | u32 footer_crc | magic "WCD1"

Page on disk:  32-byte fixed header | compressed payload
Header fields: page_type u8 | encoding u8 | codec u8 | phys_type u8 |
               n_values u32 | n_nulls u32 | uncompressed_size u32 |
               compressed_size u32 | crc u32 | first_row u64
(the PageHeader field set from format-structures: type, sizes, crc, counts,
encoding — C5 parity).

Page payload (uncompressed):
    u32 validity_len | [validity RLE-hybrid bytes if n_nulls>0] | value bytes
"""

from __future__ import annotations

import io
import json
import os
import struct
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from webcodec import colcodec, selector
from webcodec.config import DEFAULT_CONFIG, EncoderConfig
from webcodec.kernels import dictionary, rle
from webcodec.stats import page_stats, raw_byte_size, sample_stats
from webcodec.types import (
    CODEC_NAMES,
    IS_VARLEN,
    Codec,
    Encoding,
    PhysType,
    arrow_type_from_json,
    arrow_type_json,
    phys_type_of,
    restore_array,
    widen_array,
    widened,
)

MAGIC = b"WCD1"
PAGE_HEADER = struct.Struct("<BBBBIIIIIQ")
PAGE_DATA, PAGE_DICT = 0, 1


_CODECS: dict = {}


def compress(data: bytes, codec: Codec, level: int | None = None) -> bytes:
    if codec == Codec.NONE:
        return data
    # level semantics per codec: zstd/brotli take any, gzip caps at 9,
    # snappy/lz4 take none — clamp/drop instead of crashing when a profile's
    # level override (e.g. archive's binary_compression_level=11) meets a
    # codec that rejects it
    if level is not None:
        if codec == Codec.GZIP:
            level = min(max(level, 1), 9)
        elif codec in (Codec.SNAPPY, Codec.LZ4):
            level = None
    if codec == Codec.GZIP:
        return zlib.compress(data, level if level is not None else 6)
    key = (codec, level)
    c = _CODECS.get(key)
    if c is None:
        # pa.compress() has no level knob — pa.Codec carries it (None =
        # the codec's own default, matching the reference writer)
        c = _CODECS[key] = pa.Codec(
            codec.name.lower(), compression_level=level
        )
    return c.compress(data, asbytes=True)


def decompress(data: bytes | memoryview, codec: Codec, out_size: int) -> bytes:
    if codec == Codec.NONE:
        return bytes(data)
    if codec == Codec.GZIP:
        return zlib.decompress(bytes(data))
    return pa.decompress(bytes(data), decompressed_size=out_size, codec=codec.name.lower(), asbytes=True)


class _PageOut:
    __slots__ = ("header", "payload", "meta")

    def __init__(self, header: bytes, payload: bytes, meta: dict):
        self.header, self.payload, self.meta = header, payload, meta


def _build_page(
    page_type: int,
    encoding: Encoding,
    codec: Codec,
    phys: PhysType,
    n_values: int,
    n_nulls: int,
    validity: bytes,
    values: bytes,
    first_row: int,
    stats: dict | None,
    check_crc: bool,
    level: int | None,
    crypto=None,
    aad_base: bytes = b"",
) -> _PageOut:
    # single-allocation assembly: `+` chains copy the multi-MB values
    # segment once per operand on the hot path
    body = b"".join((struct.pack("<I", len(validity)), validity, values))
    comp = compress(body, codec, level)
    if len(comp) >= len(body) and codec != Codec.NONE:
        comp, codec = body, Codec.NONE  # incompressible page: store raw
    if crypto is not None:
        # C12 modular encryption: nonce||ct||tag stored as the page payload;
        # CRC covers the ciphertext (corruption caught before decryption);
        # the AAD binds every plaintext header field (see crypto._page_aad)
        comp = crypto.encrypt_page(
            aad_base, page_type, first_row, n_values, comp,
            encoding=int(encoding), codec=int(codec), n_nulls=n_nulls,
            usize=len(body),
        )
    crc = zlib.crc32(comp) if check_crc else 0
    header = PAGE_HEADER.pack(
        page_type, int(encoding), int(codec), int(phys),
        n_values, n_nulls, len(body), len(comp), crc, first_row,
    )
    meta = {
        "n_values": n_values,
        "n_nulls": n_nulls,
        "first_row": first_row,
        "uncompressed_size": len(body),
        "compressed_size": len(comp),
    }
    if stats:
        meta.update(stats)
    return _PageOut(header, comp, meta)


def _fsst_trial(arr: pa.Array, codec: Codec, level: int | None, sample_bytes: int):
    """BtrBlocks-style sample trial: FSST only wins if the FINAL bytes (after
    the page codec) shrink >=10%. E.g. natural text: fsst+zstd ~4x smaller
    than zstd alone; short urls: fsst+zstd is a net LOSS vs zstd. Tries
    symbol-length variants (8 and 6) and returns the winning table — shorter
    symbols often produce a more codec-friendly code stream — or None when
    FSST is not worth it for this chunk."""
    from webcodec.kernels import fsst as _fsst

    # trial payload is 16x the table-build sample (default 256KB/16KB): at
    # smaller trial sizes the ranking between symbol-length variants flips
    # vs full-page scale (table overhead dominates); both scale with the
    # config's fsst_sample_bytes knob
    payload = colcodec.sample_payload(arr, 4096, sample_bytes * 16)
    if len(payload) < 1024:
        return None
    base_table = _fsst.build_table(payload[:sample_bytes])
    if not base_table.symbols:
        return None
    best, best_size = None, 0.9 * len(compress(payload, codec, level))
    for cap in (8, 6):
        table = base_table if cap == 8 else _fsst.cap_symbols(base_table, cap)
        enc = _fsst.encode(payload, table)
        size = len(compress(enc, codec, level)) + len(table.serialize())
        if size < best_size:
            best, best_size = table, size
    return best


def _page_ranges(n: int, avg_bytes: float, config: EncoderConfig) -> list[tuple[int, int]]:
    """Cut rows into pages by row limit and uncompressed byte target (B4 parity
    — sizes are known up front from Arrow buffers, no adaptive estimate needed)."""
    if n == 0:
        return [(0, 0)]
    by_bytes = max(int(config.data_page_size / max(avg_bytes, 1e-9)), 1)
    step = max(min(config.page_row_count_limit, by_bytes), 256)
    # the 256-row floor must yield for huge values (multi-MB media blobs):
    # a page body past u32 would overflow the header size fields — cap the
    # page at ~1 GB uncompressed
    if step * avg_bytes > (1 << 30):
        step = max(int((1 << 30) / max(avg_bytes, 1.0)), 1)
    return [(s, min(s + step, n)) for s in range(0, n, step)]


def _validity_of(arr: pa.Array) -> tuple[np.ndarray | None, int]:
    n_nulls = arr.null_count
    if n_nulls == 0:
        return None, 0
    mask = pc.is_valid(arr).to_numpy(zero_copy_only=False).astype(bool)
    return mask, int(n_nulls)


def _encode_chunk(
    name: str,
    arr: pa.Array,
    config: EncoderConfig,
    out: io.BufferedIOBase,
    offset0: int,
) -> tuple[dict, int]:
    """Encode one column chunk; writes pages; returns (chunk_meta, new_offset)."""
    orig_t = arr.type
    if isinstance(arr, pa.ChunkedArray) and arr.num_chunks == 1:
        arr = arr.chunk(0)  # zero-copy unwrap
    if isinstance(arr, pa.ChunkedArray):
        try:
            arr = arr.combine_chunks()
        except pa.ArrowInvalid:
            # >2GB varlen column: 32-bit offsets overflow on combine —
            # process at 64-bit offsets; the footer keeps the ORIGINAL type
            # (phys BINARY/STRING covers both widths)
            if pa.types.is_binary(orig_t):
                arr = arr.cast(pa.large_binary()).combine_chunks()
            elif pa.types.is_string(orig_t):
                arr = arr.cast(pa.large_string()).combine_chunks()
            else:
                raise
    phys = phys_type_of(arr.type)
    if phys == PhysType.LIST_FLOAT32 and arr.flatten().null_count:
        # the BSS fast path has no child-validity stream (embeddings never
        # have null elements); null children must take the generic LIST
        # layout or they'd silently round-trip as NaN
        phys = PhysType.LIST
    # narrow types (int8/16, uint8/16/32, float16) store WIDENED — the
    # parquet INT_8-over-INT32 stance; the footer keeps the original type
    # and decode casts back (types.widened). orig_t predates any >2GB
    # large_* widening above for the same reason.
    orig_json = arrow_type_json(orig_t)
    _w = widened(arr.type)
    if _w is not None:
        arr = widen_array(arr, _w)
    codec = CODEC_NAMES[config.compression_for(name).lower()]
    level = config.compression_level
    if phys == PhysType.BINARY and config.binary_compression_level is not None:
        level = config.binary_compression_level
    fcrypto = config.file_crypto()
    aad_base = (
        fcrypto.aad_base(name, config.encryption_group_ordinal) if fcrypto else b""
    )
    n = len(arr)
    raw = raw_byte_size(arr)
    stats = sample_stats(arr, phys, config.selector_sample_values)
    encoding = selector.choose(name, phys, stats, config)
    fb = selector.fallback_encoding(phys)
    trial_fsst_table = None
    if encoding == Encoding.FSST and config.encoding_for(name) == "auto":
        trial_fsst_table = _fsst_trial(
            arr.drop_null(), codec, level, config.fsst_sample_bytes
        )
        if trial_fsst_table is None:
            encoding = fb
    offset = offset0
    chunk: dict = {
        "name": name,
        "type": orig_json,
        "phys": int(phys),
        "codec": int(codec),
        "raw_bytes": int(raw),
        "pages": [],
        "dict": None,
    }

    avg_bytes = raw / max(n, 1)
    ranges = _page_ranges(n, avg_bytes, config)

    dict_values = None
    indices = None
    dp: _PageOut | None = None
    if encoding == Encoding.DICT:
        valid = arr.drop_null()
        dict_values, idx_valid = dictionary.build(valid)
        dict_raw = raw_byte_size(dict_values)
        if dict_raw > config.dictionary_pagesize_limit or len(dict_values) > 2**31 - 2:
            encoding = fb  # reference: shouldFallBack() on dict size (A7)
        else:
            # scatter indices back to full-length (null slots get 0; masked out)
            mask, _ = _validity_of(arr)
            if mask is None:
                indices = idx_valid
            else:
                indices = np.zeros(n, dtype=np.int64)
                indices[mask] = idx_valid
            dict_payload, dict_inner = colcodec.encode_dict_page(
                dict_values, phys, config.use_fsst, config.fsst_sample_bytes
            )
            dp = _build_page(
                PAGE_DICT, dict_inner, codec, phys, len(dict_values), 0, b"",
                dict_payload, 0, None, config.write_page_checksum, level,
                fcrypto, aad_base,
            )
            chunk["dict"] = {
                "n": len(dict_values),
                "inner_encoding": int(dict_inner),
                **{k: dp.meta[k] for k in ("uncompressed_size", "compressed_size")},
            }

    # split-block bloom for short varlen columns (C8; bloom-level pruning D2).
    # Runs AFTER the dictionary build: the bloom depends only on the value
    # SET, so when a dictionary exists we hash |dict| distinct values instead
    # of all n rows — O(ndv) vs O(rows), and dict columns are exactly the
    # ones where ndv << rows. (Correct even if the A7 guard later falls the
    # chunk back from DICT: the distinct set is encoding-independent.)
    if (
        config.bloom_filter_enabled
        and phys in IS_VARLEN
        and n > 0
        and stats.avg_len <= config.bloom_filter_max_avg_len
    ):
        import base64

        from webcodec.kernels import bloom

        bsrc = dict_values if dict_values is not None else (
            arr.drop_null() if arr.null_count else arr
        )
        offs, data_mv = colcodec.varlen_parts(bsrc)
        raw_np = np.frombuffer(data_mv, dtype=np.uint8, count=int(offs[-1])) if len(offs) > 1 else np.zeros(0, np.uint8)
        hashes = np.unique(bloom.hash_values(offs, raw_np)) if len(offs) > 1 else np.zeros(0, np.uint64)
        fb_bytes = bloom.build(hashes, config.bloom_filter_fpp, config.bloom_filter_max_bytes)
        chunk["bloom"] = {"ndv": int(len(hashes)), "b64": base64.b64encode(fb_bytes).decode()}

    encoded_total = 0
    tried_fallback = encoding == fb
    fsst_table = trial_fsst_table  # one symbol table per chunk, shared by all pages
    alp_hint = None  # one (mode, e, f) plan per chunk, shared by all pages
    pages_out: list[_PageOut] = []
    i = 0
    while i < len(ranges):
        s, e = ranges[i]
        sl = arr.slice(s, e - s)
        mask, n_nulls = _validity_of(sl)
        validity = rle.encode_validity(mask) if mask is not None else b""
        if encoding == Encoding.DICT:
            page_idx = indices[s:e]
            if mask is not None:
                page_idx = page_idx[mask]  # only non-null slots are stored
            values = colcodec.encode_dict_indices(page_idx, len(dict_values))
        else:
            nonnull = sl.drop_null() if n_nulls else sl
            if encoding == Encoding.FSST and fsst_table is None:
                from webcodec.kernels import fsst as _fsst

                fsst_table = _fsst.build_table(
                    colcodec.sample_payload(nonnull, 2048, config.fsst_sample_bytes)
                )
            if encoding == Encoding.ALP and alp_hint is None:
                from webcodec.kernels import alp as _alp

                whole = arr.drop_null() if arr.null_count else arr
                alp_hint = _alp.plan(colcodec.fixed_values(whole, phys))
            values = colcodec.encode_values(
                nonnull, phys, encoding, config.fsst_sample_bytes, fsst_table,
                alp_hint,
            )
        # A7 guard on the FIRST page: encoded (+dict) must beat raw, else fall back
        if i == 0 and not tried_fallback:
            page_raw = raw_byte_size(sl)
            dict_sz = chunk["dict"]["uncompressed_size"] if chunk["dict"] else 0
            if not selector.is_compression_satisfying(page_raw + 1, len(values) + len(validity), dict_sz):
                encoding = fb
                tried_fallback = True
                chunk["dict"] = None
                dict_values = None
                continue  # re-encode page 0 with the fallback
        st = page_stats(sl, phys, config.statistics_truncate_length,
                        unsigned64=orig_t.equals(pa.uint64())) if config.statistics_enabled else None
        p = _build_page(
            PAGE_DATA, encoding, codec, phys, e - s, n_nulls, validity, values,
            s, st, config.write_page_checksum, level, fcrypto, aad_base,
        )
        pages_out.append(p)
        encoded_total += len(values) + len(validity)
        i += 1

    if encoding == Encoding.DICT and dp is not None and chunk["dict"] is not None:
        out.write(dp.header)
        out.write(dp.payload)
        chunk["dict"]["offset"] = offset
        chunk["dict"]["size"] = PAGE_HEADER.size + len(dp.payload)
        offset += chunk["dict"]["size"]
    for p in pages_out:
        out.write(p.header)
        out.write(p.payload)
        p.meta["offset"] = offset
        p.meta["size"] = PAGE_HEADER.size + len(p.payload)
        offset += p.meta["size"]
        chunk["pages"].append(p.meta)

    chunk["encoding"] = int(encoding)
    chunk["encoded_bytes"] = int(encoded_total)
    chunk["compressed_bytes"] = int(
        sum(p["size"] for p in chunk["pages"])
        + (chunk["dict"]["size"] if chunk["dict"] else 0)
    )
    # chunk-level stats roll-up
    mins = [p["min"] for p in chunk["pages"] if p.get("min") is not None]
    maxs = [p["max"] for p in chunk["pages"] if p.get("max") is not None]
    chunk["stats"] = {
        "min": min(mins) if mins else None,
        "max": max(maxs) if maxs else None,
        # roll up from n_nulls (ALWAYS present in page meta) — the stats
        # field is absent when statistics_enabled=False, and a fabricated
        # null_count=0 would make isnull file-pruning drop matching rows
        "null_count": int(sum(p.get("n_nulls", 0) for p in chunk["pages"])),
    }
    return chunk, offset


_STRUCT_SEP = "\x1f"  # footer-internal child-chunk name separator


def _encode_any_chunks(
    name: str, arr: pa.Array, config: EncoderConfig, out: io.BufferedIOBase, offset0: int
) -> tuple[list[dict], int]:
    """Recursive shredding dispatcher (SURVEY §2 E1, full Dremel scope):
    struct / map / list<struct> / list<list|map> parents shred into aligned
    child chunks and RECURSE through this dispatcher, so arbitrary nesting
    (struct<struct<...>>, list<list<list<...>>>, struct<list<struct>>,
    map<_, struct>, list<map>) composes from the same four constructions.
    Every emitted chunk keeps the top-level row count, so page pruning,
    keep-masks and row-range splits apply unchanged at any depth."""
    if isinstance(arr, pa.ChunkedArray):
        if arr.num_chunks == 1:
            arr = arr.chunk(0)  # zero-copy unwrap — combine would copy
        else:
            try:
                arr = arr.combine_chunks()
            except pa.ArrowInvalid:
                # >2GB varlen column (32-bit offset overflow): _encode_chunk
                # handles the large_* widening itself — pass the chunked array
                # through (it only dispatches on .type here)
                if not (pa.types.is_binary(arr.type) or pa.types.is_string(arr.type)):
                    raise
    t = arr.type
    if (pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t)) and (
        pa.types.is_struct(t.value_type) or pa.types.is_map(t.value_type)
        or pa.types.is_list(t.value_type) or pa.types.is_decimal(t.value_type)
    ):
        # offset-width/fixed-length variants of NESTED lists normalize to
        # plain list<> so the recursive handlers below engage; they decode
        # as list<> (the flat-primitive variants restore exactly via the
        # chunk type — types.widened)
        arr = arr.cast(pa.list_(t.value_field))
        t = arr.type
    if pa.types.is_decimal(t):
        return _encode_decimal_chunks(name, arr, config, out, offset0)
    if pa.types.is_list(t) and pa.types.is_decimal(t.value_type):
        # list<decimal128> gets its own lo/hi-lane shredding; every other
        # nested-decimal composition reduces to it through the recursive
        # handlers below (map items/keys and list<list> #flat values are
        # re-wrapped as lists and re-dispatched here)
        return _encode_list_decimal_chunks(name, arr, config, out, offset0)
    if pa.types.is_struct(t):
        return _encode_struct_chunks(name, arr, config, out, offset0)
    if pa.types.is_map(t):
        return _encode_map_chunks(name, arr, config, out, offset0)
    if pa.types.is_list(t) and pa.types.is_struct(t.value_type):
        return _encode_list_struct_chunks(name, arr, config, out, offset0)
    if pa.types.is_list(t) and (
        pa.types.is_list(t.value_type) or pa.types.is_map(t.value_type)
    ):
        return _encode_list_list_chunks(name, arr, config, out, offset0)
    chunk, offset = _encode_chunk(name, arr, config, out, offset0)
    return [chunk], offset


def _decode_any_chunks(
    buf: memoryview, group: dict, chunk: dict, verify_crc: bool, keep: np.ndarray | None
) -> pa.Array:
    """Decode twin of :func:`_encode_any_chunks` — dispatch on parent meta."""
    if chunk.get("decimal"):
        return _decode_decimal_chunks(buf, group, chunk, verify_crc, keep)
    if chunk.get("struct"):
        return _decode_struct_chunks(buf, group, chunk, verify_crc, keep)
    if chunk.get("map"):
        return _decode_map_chunks(buf, group, chunk, verify_crc, keep)
    if chunk.get("liststruct"):
        return _decode_list_struct_chunks(buf, group, chunk, verify_crc, keep)
    if chunk.get("listlist"):
        return _decode_list_list_chunks(buf, group, chunk, verify_crc, keep)
    if chunk.get("listdecimal"):
        return _decode_list_decimal_chunks(buf, group, chunk, verify_crc, keep)
    return _decode_chunk(buf, chunk, verify_crc, keep=keep)


def _encode_decimal_chunks(
    name: str, arr: pa.Array, config: EncoderConfig, out: io.BufferedIOBase, offset0: int
) -> tuple[list[dict], int]:
    """decimal128(p,s) shredding (parquet stores decimals as int32/int64/FLBA
    by precision; we split the 128-bit little-endian unscaled value into two
    aligned int64 LANE chunks instead): the low lane IS the value for
    |v| < 2^63 and FOR+delta eats it; the high lane is pure sign extension
    there, so RLE collapses it to bytes. Full 38-digit precision round-trips
    bit-identically. Parent chunk carries validity + (precision, scale)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    validity = arr.is_valid()
    parent, offset = _encode_chunk(name, validity, config, out, offset0)
    parent["decimal"] = {
        "precision": arr.type.precision,
        "scale": arr.type.scale,
        "null_count": int(arr.null_count),
    }
    parent["raw_bytes"] = 16 * len(arr)
    lanes = np.frombuffer(
        arr.buffers()[1], dtype="<i8", count=2 * (arr.offset + len(arr))
    )[2 * arr.offset :]
    chunks = [parent]
    for suffix, lane in (("#lo", lanes[0::2]), ("#hi", lanes[1::2])):
        c, offset = _encode_chunk(
            f"{name}{_STRUCT_SEP}{suffix}",
            pa.array(np.ascontiguousarray(lane), pa.int64()),
            config, out, offset,
        )
        c["raw_bytes"] = 0  # raw accounted on the parent (16B/value)
        chunks.append(c)
    return chunks, offset


def _decode_decimal_chunks(
    buf: memoryview, group: dict, parent: dict, verify_crc: bool, keep: np.ndarray | None
) -> pa.Array:
    meta = parent["decimal"]
    name = parent["name"]
    lo = _decode_chunk(buf, _child_chunk(group, name, "#lo"), verify_crc, keep=keep)
    hi = _decode_chunk(buf, _child_chunk(group, name, "#hi"), verify_crc, keep=keep)
    n = len(lo)
    data = np.empty(2 * n, dtype="<i8")
    data[0::2] = lo.to_numpy(zero_copy_only=False)
    data[1::2] = hi.to_numpy(zero_copy_only=False)
    vbuf = None
    if meta["null_count"]:
        valid = _decode_chunk(buf, parent, verify_crc, keep=keep)
        m = np.asarray(valid, dtype=bool)
        vbuf = pa.py_buffer(np.packbits(m, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        pa.decimal128(meta["precision"], meta["scale"]), n,
        [vbuf, pa.py_buffer(data.tobytes())],
    )


def _encode_list_decimal_chunks(
    name: str, arr: pa.Array, config: EncoderConfig, out: io.BufferedIOBase, offset0: int
) -> tuple[list[dict], int]:
    """list<decimal128(p,s)> shredding: outer validity as BOOL parent; the
    values' lo/hi int64 lanes (same split as :func:`_encode_decimal_chunks`)
    wrapped as generic-LIST chunks SHARING the outer offsets, so FOR+delta
    and RLE apply per lane exactly as at top level; value validity travels
    as an aligned list<bool> when present. map<_, decimal> and
    list<list<decimal>> reduce to this through the map/list-list handlers'
    recursion. The #lo list's own offsets restore the outer offsets on
    decode (same trick as list<list>'s #lens chunk)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    values = arr.values  # DecimalArray, absolute w.r.t. arr.offsets
    validity = arr.is_valid()
    parent, offset = _encode_chunk(name, validity, config, out, offset0)
    parent["listdecimal"] = {
        "elem_name": arr.type.value_field.name,
        "elem_nullable": arr.type.value_field.nullable,
        "precision": values.type.precision,
        "scale": values.type.scale,
        "null_count": int(arr.null_count),
        "value_null_count": int(values.null_count),
    }
    parent["raw_bytes"] = 16 * len(values)
    lanes = np.frombuffer(
        values.buffers()[1], dtype="<i8", count=2 * (values.offset + len(values))
    )[2 * values.offset :]
    off = arr.offsets
    chunks = [parent]
    if values.null_count:
        vv = pa.ListArray.from_arrays(off, values.is_valid())
        c, offset = _encode_chunk(f"{name}{_STRUCT_SEP}#valid", vv, config, out, offset)
        chunks.append(c)
    for suffix, lane in (("#lo", lanes[0::2]), ("#hi", lanes[1::2])):
        ll = pa.ListArray.from_arrays(
            off, pa.array(np.ascontiguousarray(lane), pa.int64())
        )
        c, offset = _encode_chunk(f"{name}{_STRUCT_SEP}{suffix}", ll, config, out, offset)
        c["raw_bytes"] = 0  # raw accounted on the parent (16B/value)
        chunks.append(c)
    return chunks, offset


def _decode_list_decimal_chunks(
    buf: memoryview, group: dict, parent: dict, verify_crc: bool, keep: np.ndarray | None
) -> pa.Array:
    meta = parent["listdecimal"]
    name = parent["name"]
    lo_l = _decode_chunk(buf, _child_chunk(group, name, "#lo"), verify_crc, keep=keep)
    hi_l = _decode_chunk(buf, _child_chunk(group, name, "#hi"), verify_crc, keep=keep)
    lo = np.asarray(lo_l.flatten(), dtype=np.int64)
    hi = np.asarray(hi_l.flatten(), dtype=np.int64)
    n = len(lo)
    data = np.empty(2 * n, dtype="<i8")
    data[0::2] = lo
    data[1::2] = hi
    vbuf = None
    if meta["value_null_count"]:
        vv = _decode_chunk(buf, _child_chunk(group, name, "#valid"), verify_crc, keep=keep)
        m = np.asarray(vv.flatten(), dtype=bool)
        vbuf = pa.py_buffer(np.packbits(m, bitorder="little").tobytes())
    values = pa.Array.from_buffers(
        pa.decimal128(meta["precision"], meta["scale"]), n,
        [vbuf, pa.py_buffer(data.tobytes())],
    )
    validity_buf = None
    if meta["null_count"]:
        valid = _decode_chunk(buf, parent, verify_crc, keep=keep)
        m = np.asarray(valid, dtype=bool)
        validity_buf = pa.py_buffer(np.packbits(m, bitorder="little").tobytes())
    ltype = pa.list_(
        pa.field(meta["elem_name"], values.type, nullable=meta["elem_nullable"])
    )
    return pa.Array.from_buffers(
        ltype, len(lo_l), [validity_buf, lo_l.buffers()[1]], children=[values]
    )


def _encode_struct_chunks(
    name: str, arr: pa.Array, config: EncoderConfig, out: io.BufferedIOBase, offset0: int
) -> tuple[list[dict], int]:
    """One-level Dremel-style struct shredding (SURVEY §2 E1 subset): the
    parent chunk stores the struct's own validity as BOOL pages plus child
    field metadata; every child field becomes an ordinary column chunk
    (name-spaced) with its OWN codec selection — a dict-coded child next to
    a delta-coded one, exactly like top-level columns. Children are encoded
    raw (values under null parents included), so round-trip is bit-identical."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.type.num_fields == 0:
        raise TypeError(f"empty struct column unsupported: {name}")
    fnames = [arr.type.field(i).name for i in range(arr.type.num_fields)]
    if len(set(fnames)) != len(fnames):
        # Arrow permits duplicate struct field names; our child chunks are
        # name-spaced, so duplicates would all decode from the FIRST field's
        # chunk — silent wrong data. Refuse loudly.
        raise TypeError(
            f"struct column {name!r} has duplicate field names {fnames}; "
            "rename the fields before encoding"
        )
    validity = arr.is_valid()
    parent, offset = _encode_chunk(name, validity, config, out, offset0)
    parent["struct"] = {
        "fields": [
            {"name": f.name, "nullable": f.nullable} for f in arr.type
        ],
        "null_count": int(arr.null_count),
    }
    parent["raw_bytes"] = 0  # raw accounting lives on the children
    chunks = [parent]
    for i, f in enumerate(arr.type):
        cs, offset = _encode_any_chunks(
            f"{name}{_STRUCT_SEP}{f.name}", arr.field(i), config, out, offset
        )
        chunks.extend(cs)
    return chunks, offset


def _decode_struct_chunks(
    buf: memoryview, group: dict, parent: dict, verify_crc: bool, keep: np.ndarray | None
) -> pa.Array:
    """Reassemble a shredded struct column: decode the parent validity (BOOL)
    and every child chunk under the same keep-mask (row-range sync holds —
    all chunks of a group share page row numbering), then rebuild the exact
    original type via StructArray.from_arrays(fields=...)."""
    meta = parent["struct"]
    name = parent["name"]
    children, fields = [], []
    for fm in meta["fields"]:
        cname = f"{name}{_STRUCT_SEP}{fm['name']}"
        cchunk = next(c for c in group["chunks"] if c["name"] == cname)
        child = _decode_any_chunks(buf, group, cchunk, verify_crc, keep)
        children.append(child)
        fields.append(pa.field(fm["name"], child.type, nullable=fm["nullable"]))
    mask = None
    if meta["null_count"]:
        import pyarrow.compute as _pc

        valid = _decode_chunk(buf, parent, verify_crc, keep=keep)
        mask = _pc.invert(valid)
    return pa.StructArray.from_arrays(children, fields=fields, mask=mask)


def _encode_map_chunks(
    name: str, arr: pa.Array, config: EncoderConfig, out: io.BufferedIOBase, offset0: int
) -> tuple[list[dict], int]:
    """Map shredding (map = list<struct<key,value>> in Arrow): the parent
    chunk stores the map's own validity as BOOL pages; keys and values
    become two generic-LIST chunks SHARING the parent's offsets (lengths
    FOR+delta + child payload, independent codec selection per side — a
    dict-coded key column next to delta-coded values). Null maps are stored
    as empty entry lists; the parent validity restores them on decode."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    validity = arr.is_valid()
    parent, offset = _encode_chunk(name, validity, config, out, offset0)
    parent["map"] = {
        "null_count": int(arr.null_count),
        "item_nullable": arr.type.item_field.nullable,
    }
    parent["raw_bytes"] = 0  # raw accounting lives on the key/item chunks
    # MapArray subclasses ListArray: .offsets honors slicing, .values is the
    # entries struct (absolute — consistent with the offsets)
    entries = arr.values
    kl = pa.ListArray.from_arrays(arr.offsets, entries.field(0))
    il = pa.ListArray.from_arrays(arr.offsets, entries.field(1))
    chunks = [parent]
    for suffix, child in (("keys", kl), ("items", il)):
        cs, offset = _encode_any_chunks(
            f"{name}{_STRUCT_SEP}{suffix}", child, config, out, offset
        )
        chunks.extend(cs)
    return chunks, offset


def _decode_map_chunks(
    buf: memoryview, group: dict, parent: dict, verify_crc: bool, keep: np.ndarray | None
) -> pa.Array:
    """Reassemble a shredded map column: decode the keys/items lists under
    the same keep-mask, zip them back into the entries struct, and rebuild
    the MapArray from buffers (validity bitmap + the keys list's offsets)."""
    name = parent["name"]
    kl = _decode_any_chunks(
        buf, group,
        next(c for c in group["chunks"] if c["name"] == f"{name}{_STRUCT_SEP}keys"),
        verify_crc, keep,
    )
    il = _decode_any_chunks(
        buf, group,
        next(c for c in group["chunks"] if c["name"] == f"{name}{_STRUCT_SEP}items"),
        verify_crc, keep,
    )
    entries = pa.StructArray.from_arrays(
        [kl.flatten(), il.flatten()],
        fields=[
            pa.field("key", kl.type.value_type, nullable=False),
            pa.field("value", il.type.value_type, nullable=parent["map"]["item_nullable"]),
        ],
    )
    validity_buf = None
    if parent["map"]["null_count"]:
        valid = _decode_chunk(buf, parent, verify_crc, keep=keep)
        mask = np.asarray(valid, dtype=bool)
        validity_buf = pa.py_buffer(np.packbits(mask, bitorder="little").tobytes())
    mtype = pa.map_(entries.type.field(0), entries.type.field(1))
    return pa.Array.from_buffers(
        mtype, len(kl), [validity_buf, kl.buffers()[1]], children=[entries]
    )


def _encode_list_struct_chunks(
    name: str, arr: pa.Array, config: EncoderConfig, out: io.BufferedIOBase, offset0: int
) -> tuple[list[dict], int]:
    """list<struct<primitives>> shredding (E2/E3 analogue of Dremel repeated
    groups): the parent chunk stores the outer validity as BOOL pages; each
    struct field becomes a generic-LIST chunk SHARING the outer offsets, so
    per-field codec selection still applies. Entry (inner struct) validity,
    when present, travels as an aligned list<bool> chunk."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    st = arr.type.value_type
    fnames = [st.field(i).name for i in range(st.num_fields)]
    if len(set(fnames)) != len(fnames):
        raise TypeError(
            f"list<struct> column {name!r} has duplicate field names "
            f"{fnames}; rename the fields before encoding"
        )
    validity = arr.is_valid()
    parent, offset = _encode_chunk(name, validity, config, out, offset0)
    entries = arr.values  # StructArray, absolute w.r.t. arr.offsets
    off = arr.offsets
    parent["liststruct"] = {
        "elem_name": arr.type.value_field.name,
        "elem_nullable": arr.type.value_field.nullable,
        "entry_null_count": int(entries.null_count),
        "null_count": int(arr.null_count),
        "fields": [{"name": f.name, "nullable": f.nullable} for f in entries.type],
    }
    parent["raw_bytes"] = 0
    chunks = [parent]
    if entries.null_count:
        ev = pa.ListArray.from_arrays(off, entries.is_valid())
        c, offset = _encode_chunk(f"{name}{_STRUCT_SEP}#valid", ev, config, out, offset)
        chunks.append(c)
    for i, f in enumerate(entries.type):
        # each field wrapped as a list sharing the outer offsets; nested
        # field types recurse through the dispatcher (list<struct<...>>,
        # list<list<...>>, list<map<...>>)
        fl = pa.ListArray.from_arrays(off, entries.field(i))
        cs, offset = _encode_any_chunks(
            f"{name}{_STRUCT_SEP}{f.name}", fl, config, out, offset
        )
        chunks.extend(cs)
    return chunks, offset


def _decode_list_struct_chunks(
    buf: memoryview, group: dict, parent: dict, verify_crc: bool, keep: np.ndarray | None
) -> pa.Array:
    meta = parent["liststruct"]
    name = parent["name"]
    flats, fields = [], []
    first_list = None
    for fm in meta["fields"]:
        fl = _decode_any_chunks(
            buf, group,
            next(c for c in group["chunks"] if c["name"] == f"{name}{_STRUCT_SEP}{fm['name']}"),
            verify_crc, keep,
        )
        if first_list is None:
            first_list = fl
        flat = fl.flatten()
        flats.append(flat)
        fields.append(pa.field(fm["name"], flat.type, nullable=fm["nullable"]))
    mask = None
    if meta["entry_null_count"]:
        ev = _decode_chunk(
            buf,
            next(c for c in group["chunks"] if c["name"] == f"{name}{_STRUCT_SEP}#valid"),
            verify_crc, keep=keep,
        )
        mask = pa.array(~np.asarray(ev.flatten(), dtype=bool))
    entries = pa.StructArray.from_arrays(flats, fields=fields, mask=mask)
    validity_buf = None
    if meta["null_count"]:
        valid = _decode_chunk(buf, parent, verify_crc, keep=keep)
        m = np.asarray(valid, dtype=bool)
        validity_buf = pa.py_buffer(np.packbits(m, bitorder="little").tobytes())
    ltype = pa.list_(pa.field(meta["elem_name"], entries.type, nullable=meta["elem_nullable"]))
    return pa.Array.from_buffers(
        ltype, len(first_list), [validity_buf, first_list.buffers()[1]], children=[entries]
    )


def _encode_list_list_chunks(
    name: str, arr: pa.Array, config: EncoderConfig, out: io.BufferedIOBase, offset0: int
) -> tuple[list[dict], int]:
    """list<list<primitive>> shredding (E3, two repetition levels): outer
    validity as BOOL parent; inner lengths as an aligned list<int32> chunk
    (FOR+delta eats the small ints); inner validity as an aligned list<bool>
    when present; values two-level-flattened into an aligned list<primitive>
    chunk. All four chunks share outer row numbering, so page pruning and
    keep-masks compose for free."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    validity = arr.is_valid()
    parent, offset = _encode_chunk(name, validity, config, out, offset0)
    # inner repeated level: ListArray OR MapArray (same offsets layout),
    # absolute w.r.t. arr.offsets
    inner = arr.values
    inner_is_map = pa.types.is_map(inner.type)
    off_np = np.asarray(arr.offsets, dtype=np.int64)
    inner_off_np = np.frombuffer(
        inner.buffers()[1], dtype=np.int32, count=inner.offset + len(inner) + 1
    )[inner.offset :].astype(np.int64)
    parent["listlist"] = {
        "elem_name": arr.type.value_field.name,
        "elem_nullable": arr.type.value_field.nullable,
        "inner_kind": "map" if inner_is_map else "list",
        "inner_elem_name": "entries" if inner_is_map else inner.type.value_field.name,
        "inner_elem_nullable": (
            inner.type.item_field.nullable if inner_is_map
            else inner.type.value_field.nullable
        ),
        "inner_null_count": int(inner.null_count),
        "null_count": int(arr.null_count),
    }
    parent["raw_bytes"] = 0
    chunks = [parent]
    lens_child = pa.array(np.diff(inner_off_np).astype(np.int32), pa.int32())
    lens_l = pa.ListArray.from_arrays(arr.offsets, lens_child)
    c, offset = _encode_chunk(f"{name}{_STRUCT_SEP}#lens", lens_l, config, out, offset)
    chunks.append(c)
    if inner.null_count:
        iv = pa.ListArray.from_arrays(arr.offsets, inner.is_valid())
        c, offset = _encode_chunk(f"{name}{_STRUCT_SEP}#valid", iv, config, out, offset)
        chunks.append(c)
    flat_off = inner_off_np[off_np].astype(np.int32)
    flat_l = pa.ListArray.from_arrays(pa.array(flat_off, pa.int32()), inner.values)
    # two-level-flattened values: primitives land in one generic-LIST chunk;
    # deeper nesting (list<list<list>>, list<map>, struct values) recurses
    cs, offset = _encode_any_chunks(f"{name}{_STRUCT_SEP}#flat", flat_l, config, out, offset)
    chunks.extend(cs)
    return chunks, offset


def _decode_list_list_chunks(
    buf: memoryview, group: dict, parent: dict, verify_crc: bool, keep: np.ndarray | None
) -> pa.Array:
    meta = parent["listlist"]
    name = parent["name"]
    lens_l = _decode_chunk(
        buf, next(c for c in group["chunks"] if c["name"] == f"{name}{_STRUCT_SEP}#lens"),
        verify_crc, keep=keep,
    )
    flat_l = _decode_any_chunks(
        buf, group,
        next(c for c in group["chunks"] if c["name"] == f"{name}{_STRUCT_SEP}#flat"),
        verify_crc, keep,
    )
    lens_flat = np.asarray(lens_l.flatten(), dtype=np.int64)
    inner_off = np.zeros(len(lens_flat) + 1, dtype=np.int32)
    inner_off[1:] = np.cumsum(lens_flat)
    inner_validity = None
    if meta["inner_null_count"]:
        iv = _decode_chunk(
            buf, next(c for c in group["chunks"] if c["name"] == f"{name}{_STRUCT_SEP}#valid"),
            verify_crc, keep=keep,
        )
        inner_validity = np.asarray(iv.flatten(), dtype=bool)
    if meta.get("inner_kind") == "map":
        entries = flat_l.flatten()  # struct<key,value>
        itype = pa.map_(
            entries.type.field(0).with_nullable(False),
            entries.type.field(1).with_nullable(meta["inner_elem_nullable"]),
        )
        vbuf = (
            pa.py_buffer(np.packbits(inner_validity, bitorder="little").tobytes())
            if inner_validity is not None
            else None
        )
        inner = pa.Array.from_buffers(
            itype, len(lens_flat),
            [vbuf, pa.py_buffer(inner_off.tobytes())], children=[entries],
        )
    else:
        mask = pa.array(~inner_validity) if inner_validity is not None else None
        inner = pa.ListArray.from_arrays(
            pa.array(inner_off, pa.int32()), flat_l.flatten(), mask=mask
        )
        itype = pa.list_(
            pa.field(meta["inner_elem_name"], flat_l.type.value_type,
                     nullable=meta["inner_elem_nullable"])
        )
        if inner.type != itype:
            inner = inner.cast(itype)
    validity_buf = None
    if meta["null_count"]:
        valid = _decode_chunk(buf, parent, verify_crc, keep=keep)
        m = np.asarray(valid, dtype=bool)
        validity_buf = pa.py_buffer(np.packbits(m, bitorder="little").tobytes())
    ltype = pa.list_(pa.field(meta["elem_name"], itype, nullable=meta["elem_nullable"]))
    return pa.Array.from_buffers(
        ltype, len(lens_l), [validity_buf, lens_l.buffers()[1]], children=[inner]
    )


def _child_chunk(group: dict, parent_name: str, suffix: str) -> dict:
    return next(
        c for c in group["chunks"]
        if c["name"] == f"{parent_name}{_STRUCT_SEP}{suffix}"
    )


def _chunk_arrow_type(group: dict, chunk: dict) -> pa.DataType:
    """Arrow type of a chunk as projected to the user — nested parents
    rebuild their type from the child chunks, recursively."""
    if chunk.get("decimal"):
        return pa.decimal128(chunk["decimal"]["precision"], chunk["decimal"]["scale"])
    if chunk.get("struct"):
        fields = []
        for fm in chunk["struct"]["fields"]:
            cc = _child_chunk(group, chunk["name"], fm["name"])
            fields.append(
                pa.field(fm["name"], _chunk_arrow_type(group, cc), nullable=fm["nullable"])
            )
        return pa.struct(fields)
    if chunk.get("map"):
        kt = _chunk_arrow_type(group, _child_chunk(group, chunk["name"], "keys")).value_type
        vt = _chunk_arrow_type(group, _child_chunk(group, chunk["name"], "items")).value_type
        return pa.map_(
            pa.field("key", kt, nullable=False),
            pa.field("value", vt, nullable=chunk["map"]["item_nullable"]),
        )
    if chunk.get("liststruct"):
        meta = chunk["liststruct"]
        fields = []
        for fm in meta["fields"]:
            ct = _chunk_arrow_type(
                group, _child_chunk(group, chunk["name"], fm["name"])
            ).value_type
            fields.append(pa.field(fm["name"], ct, nullable=fm["nullable"]))
        return pa.list_(
            pa.field(meta["elem_name"], pa.struct(fields), nullable=meta["elem_nullable"])
        )
    if chunk.get("listlist"):
        meta = chunk["listlist"]
        vt = _chunk_arrow_type(
            group, _child_chunk(group, chunk["name"], "#flat")
        ).value_type
        if meta.get("inner_kind") == "map":
            itype = pa.map_(
                vt.field(0).with_nullable(False),
                vt.field(1).with_nullable(meta["inner_elem_nullable"]),
            )
        else:
            itype = pa.list_(
                pa.field(meta["inner_elem_name"], vt, nullable=meta["inner_elem_nullable"])
            )
        return pa.list_(pa.field(meta["elem_name"], itype, nullable=meta["elem_nullable"]))
    return arrow_type_from_json(chunk["type"])


def _encode_group(
    table: pa.Table, config: EncoderConfig, out: io.BufferedIOBase, offset: int
) -> tuple[list[dict], int]:
    chunks: list[dict] = []
    for name in table.column_names:
        if _STRUCT_SEP in name:
            # 0x1F namespaces shredded child chunks in the footer; a column
            # carrying it would be filtered out on read (silent data loss)
            # or collide with a sibling struct's child chunk
            raise ValueError(
                f"column name {name!r} contains the reserved separator "
                "U+001F; rename the column"
            )
        cs, offset = _encode_any_chunks(name, table.column(name), config, out, offset)
        chunks.extend(cs)
    return chunks, offset


def _schema_of(schema: pa.Schema) -> list[dict]:
    return [
        {"name": f.name, "type": arrow_type_json(f.type), "nullable": f.nullable}
        for f in schema
    ]


def _write_footer(out: io.BufferedIOBase, footer: dict) -> None:
    fj = json.dumps(footer, separators=(",", ":")).encode()
    out.write(fj)
    out.write(struct.pack("<II", len(fj), zlib.crc32(fj)))
    out.write(MAGIC)


def write_table(
    table: pa.Table,
    where: str | io.BufferedIOBase,
    config: EncoderConfig | None = None,
    extra_metadata: dict | None = None,
) -> dict:
    """Encode an Arrow table into one webcodec file; returns the footer dict."""
    config = config or DEFAULT_CONFIG
    config = _stamp_file_crypto(config)
    own = isinstance(where, str)
    out: io.BufferedIOBase = open(where, "wb") if own else where  # type: ignore[assignment]
    try:
        out.write(MAGIC)
        t0 = time.perf_counter()
        chunks, _ = _encode_group(table, config, out, len(MAGIC))
        encode_secs = time.perf_counter() - t0
        footer = {
            "version": 1,
            "num_rows": table.num_rows,
            "schema": _schema_of(table.schema),
            "chunks": chunks,
            "raw_bytes": int(sum(c["raw_bytes"] for c in chunks)),
            "compressed_bytes": int(sum(c["compressed_bytes"] for c in chunks)),
            "encode_secs": encode_secs,
            "created_by": "webcodec-0.1",
            "metadata": extra_metadata or {},
        }
        _attach_encryption_footer(footer, config)
        _write_footer(out, _wrap_footer_for_disk(footer, config))
        return footer
    finally:
        if own:
            out.close()


def _stamp_file_crypto(config: EncoderConfig) -> EncoderConfig:
    """Give an encrypting config FRESH per-file material: the AAD prefix
    (pages must not be relocatable between files) and the HKDF dek salt
    (each file encrypts under its own derived key — see crypto.derive_dek)."""
    if config.encryption_key is None:
        return config
    from dataclasses import replace

    from webcodec.crypto import DEK_SALT_LEN

    return replace(config, encryption_aad_prefix=os.urandom(8),
                   encryption_dek_salt=os.urandom(DEK_SALT_LEN))


def _attach_encryption_footer(footer: dict, config: EncoderConfig) -> None:
    if config.encryption_key is None:
        return
    import base64

    from webcodec import crypto as wcrypto

    if config.encryption_footer_mode not in (
            wcrypto.FOOTER_MODE_PLAINTEXT, wcrypto.FOOTER_MODE_ENCRYPTED):
        # a typo'd mode must not SILENTLY fall back to plaintext footers
        raise ValueError(
            f"encryption_footer_mode must be 'plaintext' or 'encrypted', "
            f"got {config.encryption_footer_mode!r}")

    footer["encryption"] = {
        "algorithm": wcrypto.ALGORITHM,
        "key_id": config.encryption_key_id,
        "aad_prefix": base64.b64encode(config.encryption_aad_prefix).decode(),
        "dek_salt": base64.b64encode(config.encryption_dek_salt).decode(),
        "footer_mode": config.encryption_footer_mode,
        "signature": "",
    }
    dek = wcrypto.derive_dek(
        bytes(config.encryption_key), bytes(config.encryption_dek_salt)
    )
    if config.encryption_footer_mode != wcrypto.FOOTER_MODE_ENCRYPTED:
        # plaintext-footer mode: integrity via GCM signature. Encrypted-
        # footer mode skips it — the whole-footer GCM blob authenticates.
        footer["encryption"]["signature"] = wcrypto.sign_footer(dek, footer)


def _wrap_footer_for_disk(footer: dict, config: EncoderConfig) -> dict:
    """Encrypted-footer mode (C12 parity with parquet's EF files): what hits
    disk is a tiny plaintext wrapper — algorithm, key_id, dek_salt — plus the
    GCM-encrypted footer JSON. A keyless reader learns nothing else (no
    schema, no chunk layout, no stats/blooms)."""
    from webcodec import crypto as wcrypto

    if (config.encryption_key is None
            or config.encryption_footer_mode != wcrypto.FOOTER_MODE_ENCRYPTED):
        return footer
    import base64

    dek = wcrypto.derive_dek(
        bytes(config.encryption_key), bytes(config.encryption_dek_salt)
    )
    blob = wcrypto.encrypt_footer_blob(
        dek, json.dumps(footer, separators=(",", ":")).encode()
    )
    return {
        "version": 1,
        "encrypted_footer": {
            "algorithm": wcrypto.ALGORITHM,
            "key_id": config.encryption_key_id,
            "dek_salt": base64.b64encode(config.encryption_dek_salt).decode(),
            "footer": base64.b64encode(blob).decode(),
        },
    }


def _unwrap_footer(footer: dict, encryption_key: bytes | None) -> dict:
    """Inverse of :func:`_wrap_footer_for_disk`; plaintext footers pass
    through untouched."""
    enc = footer.get("encrypted_footer")
    if not enc:
        return footer
    if encryption_key is None:
        raise ValueError(
            f"file footer is encrypted (algorithm={enc.get('algorithm')!r}, "
            f"key_id={enc.get('key_id')!r}); pass encryption_key"
        )
    import base64

    from webcodec import crypto as wcrypto

    alg = enc.get("algorithm")
    if alg != wcrypto.ALGORITHM and alg not in wcrypto._LEGACY_ALGORITHMS:
        raise ValueError(f"unsupported encryption algorithm {alg!r}")
    dek = wcrypto.derive_dek(
        bytes(encryption_key), base64.b64decode(enc["dek_salt"])
    )
    try:
        return json.loads(wcrypto.decrypt_footer_blob(
            dek, base64.b64decode(enc["footer"])
        ))
    except ValueError:
        if alg != wcrypto.ALGORITHM:
            raise ValueError(
                "footer decryption failed: wrong key or tampered footer"
                + wcrypto._LEGACY_HINT
            ) from None
        raise


def sort_indices_for_key(table: pa.Table, sort_key: str):
    """Row permutation for a ``sort_key`` spec, or None when no named column
    exists in ``table`` (same silent-skip stance as the historic single-key
    path — encode jobs share one key string across heterogeneous tables).

    Forms:
    - ``"col"`` — single-column ascending sort (historic behavior);
    - ``"a,b[,...]"`` — lexicographic multi-column sort;
    - ``"zorder(a,b[,c,d])"`` — Z-order/Morton clustering
      (:mod:`webcodec.kernels.zorder`): every listed column's page min/max
      stats stay narrow, so multi-dimension scans prune pages on each
      dimension instead of only the leading sort column.
    """
    spec = sort_key.strip()
    if spec.startswith("zorder(") and spec.endswith(")"):
        cols = [c.strip() for c in spec[len("zorder("):-1].split(",") if c.strip()]
        cols = [c for c in cols if c in table.column_names]
        if len(cols) >= 2:
            from webcodec.kernels.zorder import zorder_sort_indices

            return zorder_sort_indices(table, cols[:4])
        if cols:
            return pc.sort_indices(table, sort_keys=[(cols[0], "ascending")])
        return None
    keys = [c.strip() for c in spec.split(",") if c.strip() in table.column_names]
    if not keys:
        return None
    return pc.sort_indices(table, sort_keys=[(k, "ascending") for k in keys])


def write_batches(
    batches,
    where: str | io.BufferedIOBase,
    config: EncoderConfig | None = None,
    extra_metadata: dict | None = None,
    group_target_bytes: int = 128 << 20,
    sort_key: str | None = None,
) -> dict | None:
    """Bounded-memory writer: consume an ITERATOR of RecordBatches and cut a
    new row GROUP every ~group_target_bytes of raw Arrow bytes (C4 sizing
    applied inside one output file) — peak memory is one group, never the
    whole partition, so a skewed 10-GB Spark partition encodes in a 128-MB
    window. Single-group output is byte-identical to :func:`write_table`;
    multi-group output uses the same version-2 footer as append_files (the
    reader concatenates groups per column). ``sort_key`` sorts WITHIN each
    group (a globally-sorted partition comes from the upstream shuffle);
    it accepts a column, a comma list (lexicographic), or
    ``"zorder(a,b[,c,d])"`` — see :func:`sort_indices_for_key`.
    Returns the footer, or None when the iterator yields no rows (the caller
    decides whether an empty file makes sense)."""
    config = config or DEFAULT_CONFIG
    config = _stamp_file_crypto(config)
    own = isinstance(where, str)
    out: io.BufferedIOBase = open(where, "wb") if own else where  # type: ignore[assignment]
    try:
        out.write(MAGIC)
        offset = len(MAGIC)
        t0 = time.perf_counter()
        groups: list[dict] = []
        schema: pa.Schema | None = None
        acc: list[pa.RecordBatch] = []
        acc_bytes = 0

        def flush() -> None:
            nonlocal offset, acc, acc_bytes
            if not acc:
                return
            table = pa.Table.from_batches(acc)
            acc, acc_bytes = [], 0
            if sort_key:
                idx = sort_indices_for_key(table, sort_key)
                if idx is not None:
                    table = table.take(idx)
            gconfig = config
            if config.encryption_key is not None:
                from dataclasses import replace as _dc_replace

                # group ordinal feeds the AAD chain (pages of group N only
                # authenticate in slot N)
                gconfig = _dc_replace(config, encryption_group_ordinal=len(groups))
            chunks, offset = _encode_group(table, gconfig, out, offset)
            groups.append(
                {
                    "num_rows": table.num_rows,
                    "chunks": chunks,
                    "raw_bytes": int(sum(c["raw_bytes"] for c in chunks)),
                    "compressed_bytes": int(sum(c["compressed_bytes"] for c in chunks)),
                }
            )

        for b in batches:
            if schema is None:
                schema = b.schema
            if b.num_rows == 0:
                continue
            acc.append(b)
            acc_bytes += b.nbytes
            if acc_bytes >= group_target_bytes:
                flush()
        flush()
        if not groups:
            return None
        encode_secs = time.perf_counter() - t0
        common = {
            "num_rows": int(sum(g["num_rows"] for g in groups)),
            "schema": _schema_of(schema),
            "raw_bytes": int(sum(g["raw_bytes"] for g in groups)),
            "compressed_bytes": int(sum(g["compressed_bytes"] for g in groups)),
            "encode_secs": encode_secs,
            "created_by": "webcodec-0.1",
            "metadata": extra_metadata or {},
        }
        if len(groups) == 1:
            footer = {"version": 1, "chunks": groups[0]["chunks"], **common}
        else:
            footer = {"version": 2, "groups": groups, **common}
        _attach_encryption_footer(footer, config)
        _write_footer(out, _wrap_footer_for_disk(footer, config))
        return footer
    finally:
        if own:
            out.close()


# --------------------------- append / compaction ------------------------------


def read_footer_path(path: str, encryption_key: bytes | None = None) -> dict:
    """Footer of a file on disk WITHOUT reading the page bytes: read the
    12-byte trailer for the footer length, then just the footer slice."""
    with open(path, "rb") as f:
        f.seek(0, os.SEEK_END)
        size = f.tell()
        f.seek(max(size - 12, 0))
        tail = f.read(12)
        if len(tail) != 12 or tail[-4:] != MAGIC:
            raise ValueError(f"not a webcodec file: {path}")
        flen, fcrc = struct.unpack("<II", tail[:8])
        f.seek(size - 12 - flen)
        fj = f.read(flen)
    if zlib.crc32(fj) != fcrc:
        raise ValueError(f"footer crc mismatch: {path}")
    return _unwrap_footer(json.loads(fj), encryption_key)


def schema_signature(footer: dict) -> tuple:
    """Merge-compatibility key of a file: the sorted (chunk name, encodingless
    identity) set of its groups plus the logical schema (name, type) pairs.
    Two files merge byte-level only when these match — after schema evolution
    an old file LACKS the added column's chunks, and concatenating its groups
    with evolved groups silently null-fills / breaks projection (read_table
    takes chunk names from the footer column map, which assumes every group
    carries every chunk)."""
    groups = footer.get("groups") or [footer]
    chunk_names = frozenset(c["name"] for g in groups for c in g["chunks"])
    schema = tuple(sorted((f["name"], json.dumps(f["type"], sort_keys=True))
                          for f in footer["schema"]))
    return (chunk_names, schema)


def schema_signature_str(footer: dict) -> str:
    """Canonical string form of :func:`schema_signature` — stored in manifest
    entries at write time so compaction plans bin-packs from METADATA alone
    (a million driver-side footer reads just to group same-schema files
    defeats the sharded-manifest scaling work)."""
    names, schema = schema_signature(footer)
    return json.dumps([sorted(names), schema], sort_keys=True)


def append_files(dst: str, sources: list[str]) -> dict:
    """Byte-level merge WITHOUT decode (reference parity: C10,
    ParquetFileWriter.appendFile / appendRowGroups): page bytes of each source
    are copied verbatim; the merged footer carries one group per source with
    page offsets shifted. Decode concatenates groups per column.

    All sources must share one schema signature (chunk-name set + logical
    schema): merging a pre-evolution file with an evolved one would silently
    drop/null the added column on read — callers must re-encode instead.
    Encrypted files never byte-merge (each file's pages authenticate against
    its own random AAD prefix) — rewrite with the key instead."""
    for src in sources:
        try:
            enc = bool(read_footer_path(src).get("encryption"))
        except ValueError as e:
            if "footer is encrypted" not in str(e):
                raise
            enc = True  # encrypted-footer mode: same no-merge rule
        if enc:
            raise ValueError(
                "append_files: encrypted files cannot byte-merge (per-file "
                "AAD prefixes); use rewrite_encoded with the encryption key"
            )
    sig0 = schema_signature(read_footer_path(sources[0]))
    for src in sources[1:]:
        if schema_signature(read_footer_path(src)) != sig0:
            raise ValueError(
                "append_files: schema signature mismatch between "
                f"{sources[0]} and {src} (schema evolution?) — byte-level "
                "merge would lose data; rewrite/transcode these files instead"
            )
    groups = []
    first_schema = None
    with open(dst, "wb") as out:
        out.write(MAGIC)
        offset = len(MAGIC)
        for src in sources:
            with open(src, "rb") as f:
                data = f.read()
            footer = read_footer(data)
            if first_schema is None:
                first_schema = footer["schema"]  # reuse — no second full read
            flen = struct.unpack("<I", data[-12:-8])[0]
            body_start, body_end = len(MAGIC), len(data) - 12 - flen
            out.write(data[body_start:body_end])
            delta = offset - body_start
            for g in footer.get("groups") or [footer]:
                chunks = json.loads(json.dumps(g["chunks"]))  # deep copy
                for c in chunks:
                    if c.get("dict"):
                        c["dict"]["offset"] += delta
                    for p in c["pages"]:
                        p["offset"] += delta
                groups.append(
                    {
                        "num_rows": g["num_rows"],
                        "chunks": chunks,
                        "raw_bytes": g["raw_bytes"],
                        "compressed_bytes": g["compressed_bytes"],
                    }
                )
            offset += body_end - body_start
        footer = {
            "version": 2,
            "num_rows": int(sum(g["num_rows"] for g in groups)),
            "schema": first_schema,
            "groups": groups,
            "raw_bytes": int(sum(g["raw_bytes"] for g in groups)),
            "compressed_bytes": int(sum(g["compressed_bytes"] for g in groups)),
            "created_by": "webcodec-0.1",
            "metadata": {"compacted_from": len(sources)},
        }
        fj = json.dumps(footer, separators=(",", ":")).encode()
        out.write(fj)
        out.write(struct.pack("<II", len(fj), zlib.crc32(fj)))
        out.write(MAGIC)
    return footer


# ------------------------------ read path ------------------------------------


def read_footer(data: bytes | memoryview,
                encryption_key: bytes | None = None) -> dict:
    buf = memoryview(data)
    if bytes(buf[:4]) != MAGIC or bytes(buf[-4:]) != MAGIC:
        raise ValueError("not a webcodec file")
    flen, fcrc = struct.unpack("<II", buf[-12:-4])
    fj = bytes(buf[-12 - flen : -12])
    if zlib.crc32(fj) != fcrc:
        raise ValueError("footer crc mismatch")
    return _unwrap_footer(json.loads(fj), encryption_key)


def _read_page(buf: memoryview, offset: int, verify_crc: bool = True,
               crypto=None, aad_base: bytes = b""):
    h = PAGE_HEADER.unpack(buf[offset : offset + PAGE_HEADER.size])
    (ptype, enc, codec, phys, n_values, n_nulls, usize, csize, crc, first_row) = h
    payload = buf[offset + PAGE_HEADER.size : offset + PAGE_HEADER.size + csize]
    if verify_crc and crc and zlib.crc32(payload) != crc:
        raise ValueError(f"page crc mismatch at offset {offset}")
    if crypto is not None:
        # AAD binds ALL of the header's plaintext fields: a page relocated to
        # another file/chunk/slot or a doctored header (encoding/codec flip,
        # size or null-count forgery) fails authentication here
        payload = memoryview(
            crypto.decrypt_page(aad_base, ptype, first_row, n_values, payload,
                                encoding=enc, codec=codec, n_nulls=n_nulls,
                                usize=usize)
        )
    body = decompress(payload, Codec(codec), usize)
    (vlen,) = struct.unpack("<I", body[:4])
    validity = body[4 : 4 + vlen]
    values = memoryview(body)[4 + vlen :]
    return ptype, Encoding(enc), PhysType(phys), n_values, n_nulls, validity, values, first_row


def _rebuild_with_nulls(values: pa.Array, mask: np.ndarray, arrow_type: pa.DataType) -> pa.Array:
    """Expand a null-free decoded array to full length with a validity bitmap
    (implementation shared with the generic-list child path in colcodec)."""
    return colcodec.rebuild_with_nulls(values, mask, arrow_type)


def _chunk_crypto(chunk: dict):
    """(crypto, aad_base) of a chunk — read_table injects the per-read
    context as ``_crypto`` (+ ``_crypto_group`` ordinal) into every footer
    chunk dict (plaintext files carry none)."""
    fc = chunk.get("_crypto")
    if fc is None:
        return None, b""
    return fc, fc.aad_base(chunk["name"], chunk.get("_crypto_group", 0))


def _decode_dict_page_only(buf: memoryview, chunk: dict, verify_crc: bool = True) -> pa.Array:
    """Decode just a chunk's dictionary page (for dictionary-level pruning)."""
    d = chunk["dict"]
    fc, ab = _chunk_crypto(chunk)
    _, inner, _, dn, _, _, dvals, _ = _read_page(buf, d["offset"], verify_crc, fc, ab)
    t = arrow_type_from_json(chunk["type"])
    return colcodec.decode_dict_page(
        dvals, PhysType(chunk["phys"]), inner, dn, widened(t) or t
    )


def _decode_chunk(
    buf: memoryview, chunk: dict, verify_crc: bool = True, keep: np.ndarray | None = None
) -> pa.Array:
    """Decode a column chunk. With ``keep`` (group-relative boolean row mask),
    pages with no surviving rows are SKIPPED entirely and surviving pages are
    row-filtered — D3 row-range synchronization: every column of the group
    returns exactly the kept rows in order."""
    arrow_type = arrow_type_from_json(chunk["type"])
    # narrow types decode at their widened storage type, cast back at the end
    work_type = widened(arrow_type) or arrow_type
    phys = PhysType(chunk["phys"])
    fc, ab = _chunk_crypto(chunk)
    dict_values = None
    if chunk.get("dict"):
        d = chunk["dict"]
        _, inner, _, dn, _, _, dvals, _ = _read_page(buf, d["offset"], verify_crc, fc, ab)
        dict_values = colcodec.decode_dict_page(dvals, phys, inner, dn, work_type)
    parts: list[pa.Array] = []
    for pm in chunk["pages"]:
        sub = None
        if keep is not None:
            sub = keep[pm["first_row"] : pm["first_row"] + pm["n_values"]]
            if not sub.any():
                continue  # page-level skip: no IO-decode for this page
        ptype, enc, _, n_values, n_nulls, validity, values, _ = _read_page(
            buf, pm["offset"], verify_crc, fc, ab)
        n_valid = n_values - n_nulls
        if enc == Encoding.DICT:
            idx = colcodec.decode_dict_indices(values, n_valid)
            arr = dictionary.take(dict_values, idx)
            if arr.type != work_type:
                arr = arr.cast(work_type)
        else:
            arr = colcodec.decode_values(values, phys, enc, n_valid, work_type)
        if n_nulls:
            mask = rle.decode_validity(validity, n_values)
            arr = _rebuild_with_nulls(arr, mask, work_type)
        if arr.type != arrow_type:
            arr = restore_array(arr, arrow_type)
        if sub is not None and not sub.all():
            arr = arr.filter(pa.array(sub))
        parts.append(arr)
    if not parts:
        return pa.array([], type=arrow_type)
    return pa.concat_arrays(parts) if len(parts) > 1 else parts[0]


def _string_op_hits_dict(
    buf: memoryview, pc_chunk: dict, op: str, pattern: str, verify_crc: bool
) -> bool:
    """Dictionary-level pruning for substring ops (startswith/contains/
    endswith): exact scan of the dict page values — False means NO value in
    this chunk can match, so the whole chunk skips decode. This is the only
    prune tier available to contains/endswith (min/max is uninformative)."""
    import pyarrow.compute as _pc

    dvals = _decode_dict_page_only(buf, pc_chunk, verify_crc)
    if not (pa.types.is_string(dvals.type) or pa.types.is_large_string(dvals.type)):
        return True
    fn = {
        "startswith": _pc.starts_with,
        "contains": _pc.match_substring,
        "endswith": _pc.ends_with,
    }[op]
    return bool(_pc.any(fn(dvals, pattern=pattern)).as_py())


def _values_in_dict(buf: memoryview, pc_chunk: dict, values, verify_crc: bool) -> bool:
    """Dictionary-level pruning test (D2 DictionaryFilter parity): True when
    ANY of ``values`` appears in the chunk's dict page — exact, not
    probabilistic."""
    import pyarrow.compute as _pc

    dvals = _decode_dict_page_only(buf, pc_chunk, verify_crc)
    # compare in the ORIGINAL value domain: dict pages decode at the widened
    # storage type (e.g. int64 for uint64 columns), where an untyped
    # pa.scalar(2**63) overflows and a bit-pattern compare would be wrong
    orig = arrow_type_from_json(pc_chunk["type"])
    if not dvals.type.equals(orig):
        try:
            dvals = restore_array(dvals, orig)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            pass  # conservative: compare at the storage type as before
    for v in values:
        try:
            scalar = pa.scalar(v, type=dvals.type)
        except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError, TypeError):
            try:
                scalar = pa.scalar(v)
                if not scalar.type.equals(dvals.type):
                    scalar = scalar.cast(dvals.type)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                    OverflowError, TypeError):
                return True  # incomparable: stay conservative
        if _pc.any(_pc.equal(dvals, scalar)).as_py():
            return True
    return False


def _bloom_may_contain(pc_chunk: dict, values) -> bool:
    """Split-block bloom test for ==/in terms: False only when EVERY value
    provably misses (C8 bloom-level pruning)."""
    import base64

    from webcodec.kernels import bloom as _bloom

    if not all(isinstance(v, (str, bytes)) for v in values):
        return True
    fb = base64.b64decode(pc_chunk["bloom"]["b64"])
    return any(
        _bloom.might_contain(fb, _bloom.hash_one(v.encode() if isinstance(v, str) else v))
        for v in values
    )


def match_positions(
    source: str | bytes | memoryview, predicate, aliases=None,
    encryption_key: bytes | None = None,
) -> "np.ndarray":
    """GLOBAL row positions matching ``predicate`` (webcodec.predicate
    algebra) — the produce side of merge-on-read deletes: a delete job
    records these positions in a sidecar instead of rewriting the file.
    Decodes only the predicate's columns, whole file (positions must index
    the physical row space, so no pruning shortcuts). ``aliases`` (current
    name -> older names) localizes renamed columns to this file's chunk
    names; a column with no chunk here (added after the file) matches as
    all-null — no positions."""
    from webcodec import predicate as predmod

    conjuncts = predmod.normalize(predicate)
    if conjuncts is None:
        raise ValueError("match_positions requires a predicate")
    # ALWAYS localize — even with no renames, a column ADDED to the table
    # after this file was written has no chunk here and must read as
    # all-null (isnull matches every row, anything else matches none),
    # never as a bare StopIteration from the projection
    from webcodec.spark.decode_job import _chunk_names, local_names

    src = source if isinstance(source, str) else memoryview(source)
    lmap = local_names(
        _chunk_names(src, encryption_key=encryption_key),
        [c for c, _, _ in conjuncts], aliases or {},
    )
    localized = []
    for c, op, v in conjuncts:
        if c in lmap:
            localized.append((lmap[c], op, v))
        elif op == "isnull":
            continue  # column added after this file: all-null, all match
        else:
            return np.empty(0, dtype=np.int64)  # all-null matches nothing
    if not localized:
        footer = (read_footer_path(src, encryption_key) if isinstance(src, str)
                  else read_footer(src, encryption_key))
        return np.arange(int(footer["num_rows"]), dtype=np.int64)
    conjuncts = localized
    cols = sorted({c for c, _, _ in conjuncts})
    t = read_table(source, columns=cols, verify_crc=False,
                   encryption_key=encryption_key)
    mask = predmod.match_mask(t, conjuncts)
    return np.flatnonzero(mask.to_numpy(zero_copy_only=False))


def read_table(
    source: str | bytes | memoryview,
    columns: list[str] | None = None,
    predicate=None,
    verify_crc: bool = True,
    row_range: tuple[int, int] | None = None,
    drop_rows: "np.ndarray | None" = None,
    encryption_key: bytes | None = None,
) -> pa.Table:
    """Decode a webcodec file to an Arrow table.

    ``columns``: projection — only those chunks are decoded (D6 parity; free by
    columnar layout). ``predicate``: a (col, op, value) tuple or a LIST of
    them, ANDed (webcodec.predicate algebra: ==/</<=/>/>=, in, isnull,
    notnull, startswith — D4 parity with FilterApi/Operators). Pages that
    cannot match any conjunct are skipped across ALL columns via row-range
    sync (D3 parity), then the residual filter is applied exactly.
    ``row_range``: half-open [lo, hi) row slice of the file — only pages
    overlapping the range are decoded (same keep-mask machinery), enabling
    intra-file parallel reads: N tasks can scan one large file on disjoint
    ranges, the row-group-split analogue of the reference reader.
    ``drop_rows``: global row positions to EXCLUDE — merge-on-read
    positional deletes (Iceberg v2 delete-file analogue); merged into the
    same keep-mask machinery, so page skip and row-range sync apply.
    """
    from webcodec import predicate as predmod

    if isinstance(source, str):
        with open(source, "rb") as f:
            data = f.read()
    else:
        data = source
    buf = memoryview(data)
    footer = read_footer(buf, encryption_key)
    groups = footer.get("groups") or [footer]
    if footer.get("encryption") or encryption_key is not None:
        from webcodec import crypto as wcrypto

        fcr = wcrypto.reader_context(footer, encryption_key)
        if fcr is not None:
            # inject the per-read context into every chunk dict so the whole
            # decode tree (nested chunks included) decrypts transparently;
            # the group ordinal re-enters the AAD chain here
            for gi, g in enumerate(groups):
                for c in g["chunks"]:
                    c["_crypto"] = fcr
                    c["_crypto_group"] = gi
    # child chunks of shredded structs are footer-internal, not columns.
    # columns=[] means ZERO columns (e.g. a pure null-fill read of columns
    # added after this file) — `or` would silently decode the whole file
    names = columns if columns is not None else [
        c["name"] for c in groups[0]["chunks"] if _STRUCT_SEP not in c["name"]
    ]

    conjuncts = predmod.normalize(predicate)
    if conjuncts is not None:
        # schema evolution: a column absent from this (older) file is all-null
        # here — isnull terms are vacuously true, every other term matches no
        # row, so the whole file is predicate-free
        present = {c["name"] for c in groups[0]["chunks"]}
        missing_terms = [t for t in conjuncts if t[0] not in present]
        if missing_terms:
            if any(op != "isnull" for _, op, _ in missing_terms):
                fields = []
                for name in names:
                    chunk = next(c for c in groups[0]["chunks"] if c["name"] == name)
                    fields.append(pa.field(name, _chunk_arrow_type(groups[0], chunk)))
                return pa.schema(fields).empty_table()
            conjuncts = [t for t in conjuncts if t[0] in present] or None
    # predicate columns are decoded even when not projected (the residual
    # filter needs them for exactness), then dropped before returning
    decode_names = list(names)
    if conjuncts is not None:
        for c, _, _ in conjuncts:
            if c not in decode_names:
                decode_names.append(c)
    keep_rows: np.ndarray | None = None
    if conjuncts is not None:
        keep_rows = np.ones(footer["num_rows"], dtype=bool)
        any_skipped = False
        for col, op, value in conjuncts:
            term_keep = np.zeros(footer["num_rows"], dtype=bool)
            row_base = 0
            for g in groups:
                pc_chunk = next(c for c in g["chunks"] if c["name"] == col)
                if any(pc_chunk.get(k) for k in
                       ("struct", "map", "liststruct", "listlist", "decimal")):
                    raise ValueError(
                        f"predicates on nested/decimal columns unsupported: {col!r}"
                    )
                pred_phys = PhysType(pc_chunk["phys"])
                eq_values = [value] if op == "==" else (list(value) if op == "in" else None)
                if eq_values is not None and pc_chunk.get("bloom"):
                    if not _bloom_may_contain(pc_chunk, eq_values):
                        any_skipped = True  # whole group provably term-free
                        row_base += g["num_rows"]
                        continue
                if (
                    eq_values is not None
                    and pc_chunk.get("dict")
                    and Encoding(pc_chunk["encoding"]) == Encoding.DICT
                ):
                    if not _values_in_dict(buf, pc_chunk, eq_values, verify_crc):
                        any_skipped = True
                        row_base += g["num_rows"]
                        continue
                if (
                    op in predmod.STRING_OPS
                    and pc_chunk.get("dict")
                    and Encoding(pc_chunk["encoding"]) == Encoding.DICT
                ):
                    if not _string_op_hits_dict(buf, pc_chunk, op, value, verify_crc):
                        any_skipped = True
                        row_base += g["num_rows"]
                        continue
                for pm in pc_chunk["pages"]:
                    if predmod.term_matches(pm, op, value, pred_phys, pm["n_values"]):
                        s = row_base + pm["first_row"]
                        term_keep[s : s + pm["n_values"]] = True
                    else:
                        any_skipped = True
                row_base += g["num_rows"]
            keep_rows &= term_keep
        if not any_skipped:
            keep_rows = None  # nothing prunable; decode everything

    if row_range is not None:
        lo = max(int(row_range[0]), 0)
        hi = min(int(row_range[1]), footer["num_rows"])
        rng = np.zeros(footer["num_rows"], dtype=bool)
        rng[lo:hi] = True
        keep_rows = rng if keep_rows is None else (keep_rows & rng)

    if drop_rows is not None and len(drop_rows):
        live = np.ones(footer["num_rows"], dtype=bool)
        live[np.asarray(drop_rows, dtype=np.int64)] = False
        keep_rows = live if keep_rows is None else (keep_rows & live)

    if keep_rows is not None and not keep_rows.any():
        # every group provably predicate-free (or empty range): no decode work
        fields = []
        for name in names:
            chunk = next(c for c in groups[0]["chunks"] if c["name"] == name)
            fields.append(pa.field(name, _chunk_arrow_type(groups[0], chunk)))
        return pa.schema(fields).empty_table()

    arrays = []
    fields = []
    for name in decode_names:
        parts = []
        row_base = 0
        for g in groups:
            chunk = next(c for c in g["chunks"] if c["name"] == name)
            keep = (
                keep_rows[row_base : row_base + g["num_rows"]]
                if keep_rows is not None
                else None
            )
            parts.append(_decode_any_chunks(buf, g, chunk, verify_crc, keep))
            row_base += g["num_rows"]
        arr = pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts]) if len(parts) > 1 else parts[0]
        arrays.append(arr)
        fields.append(pa.field(name, arr.type))
    table = pa.Table.from_arrays(arrays, schema=pa.schema(fields))
    if conjuncts is not None:
        table = predmod.residual_filter(table, conjuncts)
        if decode_names != names:
            table = table.select(names)
    return table

"""Variant BINARY encoding helpers (parquet-format VariantEncoding.md /
VariantShredding.md) — the minimal toolkit the interop reader needs to
REASSEMBLE shredded variant columns into the unshredded storage pair
``(metadata, value)``:

- parse/extend a metadata dictionary (append-only, so field ids embedded in
  residual ``value`` binaries stay valid and those bytes can be spliced
  verbatim into the reconstructed value),
- measure the byte extent of an encoded value and walk object/array
  containers,
- encode scalars and build object/array containers.

Layout follows the public spec exactly (also implemented by
``pyspark.sql.variant_utils``, which the tests use as the differential
reference decoder): basic type in the low 2 header bits (0 primitive,
1 short string, 2 object, 3 array); objects carry size + sorted field-id
list + offsets + data; metadata is version|sorted|offset_size header +
dictionary offsets + key bytes."""

from __future__ import annotations

import struct

VERSION = 1

# primitive type-info ids (VariantEncoding.md)
NULL, TRUE, FALSE = 0, 1, 2
INT8, INT16, INT32, INT64 = 3, 4, 5, 6
DOUBLE = 7
DECIMAL4, DECIMAL8, DECIMAL16 = 8, 9, 10
DATE = 11
TIMESTAMP_TZ, TIMESTAMP_NTZ = 12, 13
FLOAT = 14
BINARY, LONG_STR = 15, 16

_PRIM_SIZES = {NULL: 0, TRUE: 0, FALSE: 0, INT8: 1, INT16: 2, INT32: 4,
               INT64: 8, DOUBLE: 8, DECIMAL4: 5, DECIMAL8: 9, DECIMAL16: 17,
               DATE: 4, TIMESTAMP_TZ: 8, TIMESTAMP_NTZ: 8, FLOAT: 4}


def _uint(b: bytes, pos: int, n: int) -> int:
    return int.from_bytes(b[pos:pos + n], "little")


# ------------------------------- metadata -----------------------------------

def parse_metadata(md: bytes) -> list[str]:
    """Dictionary keys, in id order."""
    if not md or (md[0] & 0x0F) != VERSION:
        raise ValueError("unsupported variant metadata version")
    osz = ((md[0] >> 6) & 0x3) + 1
    n = _uint(md, 1, osz)
    offs = [_uint(md, 1 + osz * (i + 1), osz) for i in range(n + 1)]
    base = 1 + osz * (n + 2)
    return [md[base + offs[i]:base + offs[i + 1]].decode() for i in range(n)]


def build_metadata(keys: list[str], sorted_flag: bool = False) -> bytes:
    data = [k.encode() for k in keys]
    total = sum(len(d) for d in data)
    osz = 1 if total <= 0xFF and len(keys) <= 0xFF else (
        2 if total <= 0xFFFF and len(keys) <= 0xFFFF else
        (3 if total <= 0xFFFFFF else 4))
    hdr = VERSION | (0x10 if sorted_flag else 0) | ((osz - 1) << 6)
    out = bytearray([hdr])
    out += len(keys).to_bytes(osz, "little")
    off = 0
    for d in data:
        out += off.to_bytes(osz, "little")
        off += len(d)
    out += off.to_bytes(osz, "little")
    for d in data:
        out += d
    return bytes(out)


def extend_metadata(md: bytes, names: list[str]) -> tuple[bytes, dict]:
    """Append any of ``names`` missing from the dictionary. Existing ids are
    preserved (append-only), so value binaries encoded against ``md`` remain
    valid against the result. Returns ``(new_md, {name: id})`` covering ALL
    dictionary keys. When nothing is missing the original bytes pass through
    untouched (including the sorted_strings flag)."""
    keys = parse_metadata(md)
    ids = {k: i for i, k in enumerate(keys)}
    missing = [n for n in names if n not in ids]
    if not missing:
        return md, ids
    for n in missing:
        ids[n] = len(keys)
        keys.append(n)
    return build_metadata(keys, sorted_flag=False), ids


# ------------------------------ value walking -------------------------------

def _container_layout(v: bytes, pos: int):
    """(is_object, size, id_size, offset_size, ids_pos) — header decode for
    object/array containers."""
    basic = v[pos] & 0x3
    info = v[pos] >> 2
    if basic == 2:  # object: b4 large | b3b2 id size | b1b0 offset size
        large = (info >> 4) & 1
        idsz = ((info >> 2) & 0x3) + 1
        osz = (info & 0x3) + 1
        szb = 4 if large else 1
        size = _uint(v, pos + 1, szb)
        return True, size, idsz, osz, pos + 1 + szb
    if basic == 3:  # array: b2 large | b1b0 offset size
        large = (info >> 2) & 1
        osz = (info & 0x3) + 1
        szb = 4 if large else 1
        size = _uint(v, pos + 1, szb)
        return False, size, 0, osz, pos + 1 + szb
    raise ValueError("not a container")


def value_extent(v: bytes, pos: int = 0) -> int:
    """Byte length of the encoded value starting at ``pos``."""
    basic = v[pos] & 0x3
    info = v[pos] >> 2
    if basic == 1:  # short string
        return 1 + info
    if basic == 0:
        if info in (BINARY, LONG_STR):
            return 1 + 4 + _uint(v, pos + 1, 4)
        if info in _PRIM_SIZES:
            return 1 + _PRIM_SIZES[info]
        raise ValueError(f"unknown primitive type info {info}")
    is_obj, size, idsz, osz, p = _container_layout(v, pos)
    if is_obj:
        offs_pos = p + size * idsz
    else:
        offs_pos = p
    data_pos = offs_pos + (size + 1) * osz
    return data_pos + _uint(v, offs_pos + size * osz, osz) - pos


def object_fields(v: bytes, pos: int = 0) -> list[tuple[int, bytes]]:
    """[(field_id, encoded_value_bytes)] of an OBJECT value."""
    is_obj, size, idsz, osz, p = _container_layout(v, pos)
    if not is_obj:
        raise ValueError("not an object")
    offs_pos = p + size * idsz
    data_pos = offs_pos + (size + 1) * osz
    out = []
    for i in range(size):
        fid = _uint(v, p + i * idsz, idsz)
        vp = data_pos + _uint(v, offs_pos + i * osz, osz)
        out.append((fid, bytes(v[vp:vp + value_extent(v, vp)])))
    return out


def array_elems(v: bytes, pos: int = 0) -> list[bytes]:
    """Encoded element bytes of an ARRAY value."""
    is_obj, size, _idsz, osz, p = _container_layout(v, pos)
    if is_obj:
        raise ValueError("not an array")
    data_pos = p + (size + 1) * osz
    out = []
    for i in range(size):
        vp = data_pos + _uint(v, p + i * osz, osz)
        out.append(bytes(v[vp:vp + value_extent(v, vp)]))
    return out


def is_object(v: bytes, pos: int = 0) -> bool:
    return (v[pos] & 0x3) == 2


def is_array(v: bytes, pos: int = 0) -> bool:
    return (v[pos] & 0x3) == 3


def decode_scalar(v: bytes, pos: int = 0):
    """Non-container value -> ``(kind, python_value)``. Kinds: "null",
    "bool", "int", "float", "double", "string", "binary", "date" (days),
    "ts_tz"/"ts_ntz" (micros), ("decimal", scale) (unscaled int). Raw
    integer forms are returned (days/micros/unscaled) — callers building
    arrow arrays feed them straight to the typed constructors."""
    basic = v[pos] & 0x3
    info = v[pos] >> 2
    if basic == 1:
        return "string", bytes(v[pos + 1:pos + 1 + info]).decode()
    if basic != 0:
        raise ValueError("container value")
    if info == NULL:
        return "null", None
    if info in (TRUE, FALSE):
        return "bool", info == TRUE
    if info in (INT8, INT16, INT32, INT64):
        n = _PRIM_SIZES[info]
        return "int", int.from_bytes(v[pos + 1:pos + 1 + n], "little",
                                     signed=True)
    if info == DOUBLE:
        return "double", struct.unpack_from("<d", v, pos + 1)[0]
    if info == FLOAT:
        return "float", struct.unpack_from("<f", v, pos + 1)[0]
    if info == DATE:
        return "date", int.from_bytes(v[pos + 1:pos + 5], "little",
                                      signed=True)
    if info in (TIMESTAMP_TZ, TIMESTAMP_NTZ):
        kind = "ts_tz" if info == TIMESTAMP_TZ else "ts_ntz"
        return kind, int.from_bytes(v[pos + 1:pos + 9], "little", signed=True)
    if info in (DECIMAL4, DECIMAL8, DECIMAL16):
        n = _PRIM_SIZES[info] - 1
        scale = v[pos + 1]
        return (("decimal", scale),
                int.from_bytes(v[pos + 2:pos + 2 + n], "little", signed=True))
    if info == LONG_STR:
        ln = _uint(v, pos + 1, 4)
        return "string", bytes(v[pos + 5:pos + 5 + ln]).decode()
    if info == BINARY:
        ln = _uint(v, pos + 1, 4)
        return "binary", bytes(v[pos + 5:pos + 5 + ln])
    raise ValueError(f"unknown primitive type info {info}")


# ------------------------------- encoding -----------------------------------

def _hdr(basic: int, info: int) -> int:
    return basic | (info << 2)


def encode_null() -> bytes:
    return bytes([_hdr(0, NULL)])


def encode_bool(b: bool) -> bytes:
    return bytes([_hdr(0, TRUE if b else FALSE)])


def encode_int(i: int) -> bytes:
    """Smallest of int8/16/32/64 (what the reference writers emit)."""
    for info, n in ((INT8, 1), (INT16, 2), (INT32, 4), (INT64, 8)):
        lo = -(1 << (8 * n - 1))
        if lo <= i < -lo:
            return bytes([_hdr(0, info)]) + i.to_bytes(n, "little", signed=True)
    raise OverflowError("int out of int64 range")


def encode_double(x: float) -> bytes:
    return bytes([_hdr(0, DOUBLE)]) + struct.pack("<d", x)


def encode_float(x: float) -> bytes:
    return bytes([_hdr(0, FLOAT)]) + struct.pack("<f", x)


def encode_string(s: str) -> bytes:
    b = s.encode()
    if len(b) <= 0x3F:
        return bytes([_hdr(1, len(b))]) + b
    return bytes([_hdr(0, LONG_STR)]) + struct.pack("<I", len(b)) + b


def encode_binary(b: bytes) -> bytes:
    return bytes([_hdr(0, BINARY)]) + struct.pack("<I", len(b)) + b


def encode_date_days(days: int) -> bytes:
    return bytes([_hdr(0, DATE)]) + days.to_bytes(4, "little", signed=True)


def encode_timestamp_micros(us: int, utc_adjusted: bool) -> bytes:
    info = TIMESTAMP_TZ if utc_adjusted else TIMESTAMP_NTZ
    return bytes([_hdr(0, info)]) + us.to_bytes(8, "little", signed=True)


def encode_decimal(unscaled: int, scale: int) -> bytes:
    for info, n in ((DECIMAL4, 4), (DECIMAL8, 8), (DECIMAL16, 16)):
        lo = -(1 << (8 * n - 1))
        if lo <= unscaled < -lo:
            return (bytes([_hdr(0, info), scale])
                    + unscaled.to_bytes(n, "little", signed=True))
    raise OverflowError("decimal unscaled value out of 16-byte range")


def _min_bytes(maxv: int) -> int:
    return 1 if maxv <= 0xFF else (2 if maxv <= 0xFFFF else
                                   (3 if maxv <= 0xFFFFFF else 4))


def build_object(fields: list[tuple[int, bytes]], key_of) -> bytes:
    """OBJECT value from ``[(field_id, encoded_value)]``. Fields are sorted
    by key NAME (spec requirement — readers binary-search on it); ``key_of``
    maps a field id to its dictionary key."""
    fields = sorted(fields, key=lambda f: key_of(f[0]))
    n = len(fields)
    data_len = sum(len(b) for _, b in fields)
    idsz = _min_bytes(max((f for f, _ in fields), default=0))
    osz = _min_bytes(data_len)
    large = n > 0xFF
    info = ((1 << 4) if large else 0) | ((idsz - 1) << 2) | (osz - 1)
    out = bytearray([_hdr(2, info)])
    out += n.to_bytes(4 if large else 1, "little")
    for fid, _ in fields:
        out += fid.to_bytes(idsz, "little")
    off = 0
    for _, b in fields:
        out += off.to_bytes(osz, "little")
        off += len(b)
    out += off.to_bytes(osz, "little")
    for _, b in fields:
        out += b
    return bytes(out)


def build_array(elems: list[bytes]) -> bytes:
    n = len(elems)
    data_len = sum(len(b) for b in elems)
    osz = _min_bytes(data_len)
    large = n > 0xFF
    info = ((1 << 2) if large else 0) | (osz - 1)
    out = bytearray([_hdr(3, info)])
    out += n.to_bytes(4 if large else 1, "little")
    off = 0
    for b in elems:
        out += off.to_bytes(osz, "little")
        off += len(b)
    out += off.to_bytes(osz, "little")
    for b in elems:
        out += b
    return bytes(out)

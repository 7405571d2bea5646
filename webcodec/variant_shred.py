"""Reassemble SHREDDED parquet VARIANT columns (VariantShredding.md read
side): the writer split a variant into ``metadata`` + residual ``value``
binaries plus a ``typed_value`` subtree of strongly-typed parquet columns;
this module reverses that, producing the unshredded ``<metadata, value>``
storage pair the rest of the engine (and our VARIANT export) speaks.

Reconstruction per the spec:
- the metadata dictionary is EXTENDED append-only with any shredded field
  names it lacks, so field ids embedded in residual ``value`` binaries stay
  valid and those bytes are spliced verbatim (no decode/re-encode),
- at each shredding node: a non-null ``typed_value`` wins (object groups
  recurse and merge residual object fields, list groups rebuild arrays,
  scalar leaves re-encode per VariantEncoding.md), else a non-null
  ``value`` is copied, else the field is absent,
- both null at the ROOT encodes variant null.

Per-row Python by construction — variable-length binary splicing has no
vector form; this is the interop edge path, not the decode hot path."""

from __future__ import annotations

import datetime

from . import variant_bin as vb

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_NTZ = datetime.datetime(1970, 1, 1)
_EPOCH_UTC = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)


def collect_field_names(storage_type) -> list[str]:
    """Every object field name appearing in ``typed_value`` subtrees of a
    shredded-variant storage struct — the names the reconstructed value may
    reference beyond the writer's own dictionary."""
    import pyarrow as pa

    names: list[str] = []

    def walk_typed(t):
        if pa.types.is_struct(t):  # object shredding: fields are keys
            for i in range(t.num_fields):
                f = t.field(i)
                names.append(f.name)
                walk_node(f.type)
        elif pa.types.is_list(t):  # array shredding: elements are nodes
            walk_node(t.value_type)
        # scalar leaf: no names

    def walk_node(t):
        if not pa.types.is_struct(t):
            return
        idx = t.get_field_index("typed_value")
        if idx >= 0:
            walk_typed(t.field(idx).type)

    walk_node(storage_type)
    return names


def _micros(dt: datetime.datetime, tz: bool) -> int:
    td = dt - (_EPOCH_UTC if tz else _EPOCH_NTZ)
    return (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds


def _encode_scalar(t, v) -> bytes:
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return vb.encode_bool(v)
    if pa.types.is_integer(t):
        return vb.encode_int(v)
    if pa.types.is_float64(t):
        return vb.encode_double(v)
    if pa.types.is_float32(t):
        return vb.encode_float(v)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return vb.encode_string(v)
    if pa.types.is_date32(t):
        return vb.encode_date_days((v - _EPOCH_DATE).days)
    if pa.types.is_timestamp(t):
        if t.unit == "ns":
            raise NotImplementedError("nanosecond shredded timestamps")
        return vb.encode_timestamp_micros(_micros(v, t.tz is not None),
                                          t.tz is not None)
    if pa.types.is_decimal(t):
        return vb.encode_decimal(int(v.scaleb(t.scale)), t.scale)
    if pa.types.is_binary(t) or pa.types.is_fixed_size_binary(t) \
            or pa.types.is_large_binary(t):
        return vb.encode_binary(bytes(v))
    raise NotImplementedError(f"shredded typed_value of type {t}")


def _rec(node_type, node: dict, ids: dict, keys: list):
    """One shredding node struct<value?, typed_value?> + its row dict ->
    encoded variant value bytes, or None when the field is absent."""
    import pyarrow as pa

    tv_idx = node_type.get_field_index("typed_value")
    v_idx = node_type.get_field_index("value")
    tv = node.get("typed_value") if tv_idx >= 0 else None
    v = node.get("value") if v_idx >= 0 else None
    if tv is None:
        return bytes(v) if v is not None else None
    tt = node_type.field(tv_idx).type
    if pa.types.is_struct(tt):  # object shredding
        fields: list[tuple[int, bytes]] = []
        shredded_names = set()
        for i in range(tt.num_fields):
            f = tt.field(i)
            shredded_names.add(f.name)
            child = tv[f.name]
            # a null field-node struct means the field is absent (same as
            # value+typed_value both null)
            enc = None if child is None else _rec(f.type, child, ids, keys)
            if enc is not None:
                fields.append((ids[f.name], enc))
        if v is not None:
            # residual: an object holding only non-shredded fields; ids are
            # valid under the extended dictionary, bytes splice verbatim
            for fid, fbytes in vb.object_fields(bytes(v)):
                if keys[fid] not in shredded_names:
                    fields.append((fid, fbytes))
        return vb.build_object(fields, lambda fid: keys[fid])
    if pa.types.is_list(tt):  # array shredding
        et = tt.value_type
        elems = []
        for e in tv:
            enc = _rec(et, e, ids, keys) if e is not None else None
            elems.append(enc if enc is not None else vb.encode_null())
        return vb.build_array(elems)
    return _encode_scalar(tt, tv)


def reassemble_storage(arr):
    """StructArray of the shredded physical layout -> StructArray of the
    unshredded storage pair struct<metadata: binary not null, value:
    binary>. Null input slots stay null."""
    import pyarrow as pa

    st = arr.type
    extra_names = collect_field_names(st)
    rows = arr.to_pylist()
    metas, vals, mask = [], [], []
    for row in rows:
        if row is None:
            metas.append(None)
            vals.append(None)
            mask.append(True)
            continue
        md, ids = vb.extend_metadata(bytes(row["metadata"]), extra_names)
        keys = vb.parse_metadata(md)
        enc = _rec(st, row, ids, keys)
        metas.append(md)
        vals.append(enc if enc is not None else vb.encode_null())
        mask.append(False)
    out_type = pa.struct([pa.field("metadata", pa.binary(), False),
                          pa.field("value", pa.binary())])
    meta_arr = pa.array(metas, pa.binary())
    val_arr = pa.array(vals, pa.binary())
    return pa.StructArray.from_arrays(
        [meta_arr, val_arr], fields=list(out_type),
        mask=pa.array(mask, pa.bool_()))


# ------------------------- write direction (shredding) ----------------------
# The inverse used by parquet EXPORT: infer a shredding schema from the
# data, split each <metadata, value> row into typed columns + residual
# binaries (the layout Spark 4 writes by default and can prune), keep the
# metadata byte-identical so residual field ids stay valid with ZERO
# re-encoding.

_SCALAR_KINDS = {"bool", "int", "float", "double", "string", "binary",
                 "date", "ts_tz", "ts_ntz"}
_MAX_SHRED_DEPTH = 4


def _kind_arrow(kind):
    import pyarrow as pa

    if isinstance(kind, tuple):  # ("decimal", scale)
        return pa.decimal128(38, kind[1])
    return {
        "bool": pa.bool_(), "int": pa.int64(), "float": pa.float32(),
        "double": pa.float64(), "string": pa.string(),
        "binary": pa.binary(), "date": pa.date32(),
        "ts_tz": pa.timestamp("us", tz="UTC"), "ts_ntz": pa.timestamp("us"),
    }[kind]


def _infer_node(pairs: list, depth: int) -> dict:
    """Shredding spec for one node from ``[(encoded_value, dict_keys)]``
    pairs (each row carries its own metadata, so field names must be
    resolved per source row): {"kind": "object", "fields": {name: spec}} |
    {"kind": "array", "elem": spec} | {"kind": "scalar", "stype": kind} |
    {"kind": "value_only"} (conflicting shapes/types -> no typed_value)."""
    if depth >= _MAX_SHRED_DEPTH:
        return {"kind": "value_only"}
    shapes = set()
    scalar_kind = None
    for v, _keys in pairs:
        if vb.is_object(v):
            shapes.add("object")
        elif vb.is_array(v):
            shapes.add("array")
        else:
            kind, _ = vb.decode_scalar(v)
            if kind == "null":
                continue  # variant null rides the value column anywhere
            shapes.add("scalar")
            if scalar_kind is None:
                scalar_kind = kind
            elif scalar_kind != kind:
                return {"kind": "value_only"}
    if len(shapes) != 1:
        return {"kind": "value_only"}
    shape = shapes.pop()
    if shape == "scalar":
        return {"kind": "scalar", "stype": scalar_kind}
    if shape == "array":
        elem_pairs = [(e, keys) for v, keys in pairs if vb.is_array(v)
                      for e in vb.array_elems(v)]
        return {"kind": "array", "elem": _infer_node(elem_pairs, depth + 1)}
    by_name: dict[str, list] = {}
    for v, keys in pairs:
        if vb.is_object(v):
            for fid, fb in vb.object_fields(v):
                by_name.setdefault(keys[fid], []).append((fb, keys))
    return {"kind": "object",
            "fields": {n: _infer_node(ps, depth + 1)
                       for n, ps in sorted(by_name.items())}}


def _node_arrow_type(spec: dict):
    """Arrow type of one shredding node struct<value?, typed_value?>."""
    import pyarrow as pa

    if spec["kind"] == "value_only":
        return pa.struct([pa.field("value", pa.binary())])
    if spec["kind"] == "scalar":
        tv = _kind_arrow(spec["stype"])
    elif spec["kind"] == "array":
        tv = pa.list_(pa.field("element", _node_arrow_type(spec["elem"]),
                               False))
    else:  # object
        tv = pa.struct([pa.field(n, _node_arrow_type(s), True)
                        for n, s in spec["fields"].items()])
    return pa.struct([pa.field("value", pa.binary()),
                      pa.field("typed_value", tv)])


def _scalar_py(kind, raw):
    """decode_scalar raw -> python value for the typed arrow constructor."""
    import decimal as _dec

    if kind == "date":
        return _EPOCH_DATE + datetime.timedelta(days=raw)
    if isinstance(kind, tuple):  # decimal: unscaled int + scale
        return _dec.Decimal(raw).scaleb(-kind[1])
    return raw  # ints for ts (epoch micros) feed pa.timestamp directly


def _split_node(spec: dict, v: bytes, keys: list):
    """Encoded value -> python dict matching _node_arrow_type(spec)."""
    if spec["kind"] == "value_only":
        return {"value": v}
    if spec["kind"] == "scalar":
        if not (vb.is_object(v) or vb.is_array(v)):
            kind, raw = vb.decode_scalar(v)
            if kind == spec["stype"]:
                return {"value": None, "typed_value": _scalar_py(kind, raw)}
        return {"value": v, "typed_value": None}
    if spec["kind"] == "array":
        if not vb.is_array(v):
            return {"value": v, "typed_value": None}
        elems = [_split_node(spec["elem"], e, keys) for e in vb.array_elems(v)]
        return {"value": None, "typed_value": elems}
    # object
    if not vb.is_object(v):
        return {"value": v, "typed_value": None}
    # keep each field's id alongside its bytes: residual fields reuse it
    # directly instead of an O(dictionary) keys.index scan per field
    present = {keys[fid]: (fid, fb) for fid, fb in vb.object_fields(v)}
    typed = {}
    for name, sub in spec["fields"].items():
        if name in present:
            typed[name] = _split_node(sub, present.pop(name)[1], keys)
        else:
            # absent field: group PRESENT with both children null (the
            # spec's required-group shape; Spark's reader rejects null
            # field groups as malformed)
            typed[name] = ({"value": None} if sub["kind"] == "value_only"
                           else {"value": None, "typed_value": None})
    residual = (vb.build_object(list(present.values()), lambda i: keys[i])
                if present else None)
    return {"value": residual, "typed_value": typed}


def shred_storage(arr):
    """<metadata, value> StructArray -> shredded StructArray
    struct<metadata, value?, typed_value?> per the inferred schema, or the
    input unchanged when the rows conflict at the root (Spark's own
    behavior). Metadata bytes pass through UNTOUCHED, so residual value
    binaries splice verbatim."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    rows = arr.to_pylist()
    live = [(bytes(r["value"]), vb.parse_metadata(bytes(r["metadata"])))
            for r in rows
            if r is not None and r["value"] is not None]
    typed_any = any(vb.is_object(v) or vb.is_array(v)
                    or vb.decode_scalar(v)[0] != "null" for v, _ in live)
    spec = _infer_node(live, 0)
    if spec["kind"] == "value_only" or not typed_any:
        return arr  # root conflict (or all-null): stay unshredded
    node_t = _node_arrow_type(spec)
    out_type = pa.struct([pa.field("metadata", pa.binary(), False)]
                         + list(node_t))
    out_rows = []
    for r in rows:
        if r is None:
            out_rows.append(None)
            continue
        md = bytes(r["metadata"])
        if r["value"] is None:
            out_rows.append({"metadata": md})
            continue
        split = _split_node(spec, bytes(r["value"]), vb.parse_metadata(md))
        split["metadata"] = md
        out_rows.append(split)
    return pa.array(out_rows, out_type)


def unshred(arr, path: tuple):
    """Walk ``arr`` down struct field names in ``path`` (the shredded
    variant group's position) and replace the storage subtree with the
    reassembled <metadata, value> pair, rebuilding ancestors."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not path:
        return reassemble_storage(arr)
    if not pa.types.is_struct(arr.type):
        raise NotImplementedError(
            "shredded VARIANT below a list/map is not supported")
    t = arr.type
    children, fields = [], []
    for i in range(t.num_fields):
        f = t.field(i)
        child = arr.field(i)
        if f.name == path[0]:
            child = unshred(child, path[1:])
            f = pa.field(f.name, child.type, f.nullable)
        children.append(child)
        fields.append(f)
    validity = arr.is_valid()
    return pa.StructArray.from_arrays(
        children, fields=fields,
        mask=pa.compute.invert(validity) if arr.null_count else None)

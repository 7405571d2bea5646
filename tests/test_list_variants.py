"""large_list and fixed_size_list variants (arrow's 64-bit-offset and
fixed-length list types): stored as plain list<> via types.widened — the
fixed_size_list<float,d> embedding shape thereby rides the LIST_FLOAT32
BSS fast path — and the chunk-footer type restores the exact variant on
decode. Nested-value variants (large_list<struct> etc.) normalize to
list<> at dispatch and decode as list<> (documented)."""

import numpy as np
import pyarrow as pa
import pytest

from webcodec import filefmt
from webcodec.config import EncoderConfig
from webcodec.types import arrow_type_from_json, arrow_type_json, widened


def _rt(tmp_path, t, cfg=None):
    p = str(tmp_path / "v.wcd")
    filefmt.write_table(t, p, cfg or EncoderConfig.speed())
    return filefmt.read_table(p)


CASES = [
    ("large_list_int", pa.large_list(pa.int64()), [[1, 2], [3], None, []]),
    ("large_list_str", pa.large_list(pa.string()), [["a", "b"], None, []]),
    ("fsl_double_nulls", pa.list_(pa.float64(), 2), [[1.0, 2.0], None, [3.0, 4.0]]),
    ("fsl_null_elems", pa.list_(pa.float32(), 2), [[1.0, None], [3.0, 4.0]]),
    ("fsl_int", pa.list_(pa.int32(), 3), [[1, 2, 3], [4, 5, 6], None]),
]


@pytest.mark.parametrize("name,dt,vals", CASES, ids=[c[0] for c in CASES])
def test_variant_roundtrip(tmp_path, name, dt, vals):
    t = pa.table({"a": pa.array(vals, dt)})
    assert _rt(tmp_path, t).equals(t)


def test_fsl_embedding_takes_bss_fast_path(tmp_path):
    rng = np.random.default_rng(1)
    emb = [rng.random(8).astype(np.float32).tolist() for _ in range(200)]
    t = pa.table({"e": pa.array(emb, pa.list_(pa.float32(), 8))})
    p = str(tmp_path / "e.wcd")
    footer = filefmt.write_table(t, p, EncoderConfig.speed())
    from webcodec.types import PhysType

    chunk = footer["chunks"][0]
    assert chunk["phys"] == int(PhysType.LIST_FLOAT32)
    assert filefmt.read_table(p).equals(t)


def test_nested_value_variants_decode_as_list(tmp_path):
    t = pa.table({"n": pa.array([[{"x": 1}], [None], None],
                                pa.large_list(pa.struct([("x", pa.int64())])))})
    back = _rt(tmp_path, t)
    lt = pa.list_(pa.field("item", pa.struct([("x", pa.int64())])))
    assert back.schema.field("n").type == lt
    assert back.column("n").cast(t.schema.field("n").type).equals(t.column("n"))


def test_type_json_roundtrip():
    for dt in (pa.large_list(pa.int64()), pa.list_(pa.float32(), 4),
               pa.list_(pa.field("item", pa.int32(), nullable=False), 2),
               pa.binary(16)):
        assert arrow_type_from_json(arrow_type_json(dt)) == dt
    assert widened(pa.large_list(pa.int64())) == pa.list_(pa.field("item", pa.int64()))
    assert widened(pa.list_(pa.float32(), 4)) == pa.list_(pa.field("item", pa.float32()))


def test_variant_encrypted_and_rowops(tmp_path):
    key = bytes(range(32))
    t = pa.table({"id": pa.array(range(10), pa.int64()),
                  "a": pa.array([[float(i), float(i + 1)] for i in range(10)],
                                pa.list_(pa.float64(), 2))})
    p = str(tmp_path / "k.wcd")
    filefmt.write_table(t, p, EncoderConfig(encryption_key=key))
    back = filefmt.read_table(p, encryption_key=key)
    assert back.equals(t)
    p2 = str(tmp_path / "r.wcd")
    filefmt.write_table(t, p2, EncoderConfig.speed())
    assert filefmt.read_table(p2, row_range=(2, 7)).equals(t.slice(2, 5))
    assert filefmt.read_table(p2, predicate=("id", ">=", 8)).equals(t.slice(8, 2))

"""Property-based round-trip tests (SURVEY.md §5.3 layer 2, hypothesis)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from webcodec.kernels import bitpack, delta, deltalength, fsst, prefix, rle

int64s = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=60, deadline=None)
@given(st.lists(int64s, max_size=400))
def test_delta_property(xs):
    v = np.array(xs, dtype=np.int64)
    assert (delta.decode(delta.encode(v), len(v)) == v).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**20), max_size=400), st.just(21))
def test_rle_property(xs, width):
    v = np.array(xs, dtype=np.uint64)
    assert (rle.decode(rle.encode(v, width), width, len(v)) == v).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**13 - 1), max_size=300))
def test_bitpack_property(xs):
    v = np.array(xs, dtype=np.uint64)
    assert (bitpack.unpack(bitpack.pack(v, 13), 13, len(v)) == v).all()


def _parts(values):
    arr = pa.array(values, type=pa.binary())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32, count=len(values) + 1).astype(np.int64)
    return offsets, bytes(arr.buffers()[2] or b"")


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(max_size=60), max_size=120))
def test_deltalength_property(values):
    offsets, data = _parts(values)
    out = deltalength.decode(deltalength.encode(offsets, data), len(values), pa.binary())
    assert out.to_pylist() == values


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(max_size=60), max_size=120))
def test_prefix_property(values):
    offsets, data = _parts(values)
    out = prefix.decode(prefix.encode(offsets, data), len(values), pa.binary())
    assert out.to_pylist() == values


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=3000))
def test_fsst_property(data):
    table = fsst.build_table(data[:1024])
    assert fsst.decode(fsst.encode(data, table), table) == data


@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=1500),
    st.integers(min_value=-1000, max_value=1000),
    st.sampled_from(["==", "<", "<=", ">", ">="]),
)
@settings(max_examples=60, deadline=None)
def test_predicate_pruning_equals_brute_filter(values, pivot, op):
    """Page/bloom pruning + residual filter == plain filter, for any data."""
    import io
    import operator

    import pyarrow as pa

    from webcodec import filefmt
    from webcodec.config import EncoderConfig

    t = pa.table({"v": pa.array(values, pa.int64()),
                  "s": pa.array([f"k{v}" for v in values])})
    buf = io.BytesIO()
    filefmt.write_table(t, buf, EncoderConfig(page_row_count_limit=32))
    got = filefmt.read_table(buf.getvalue(), predicate=("v", op, pivot))
    ops = {"==": operator.eq, "<": operator.lt, "<=": operator.le,
           ">": operator.gt, ">=": operator.ge}
    import pyarrow.compute as pc

    want = t.filter(ops[op](pc.field("v"), pivot))
    assert got.num_rows == want.num_rows
    assert got.column("v").combine_chunks().equals(want.column("v").combine_chunks())
    assert got.column("s").combine_chunks().equals(want.column("s").combine_chunks())


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(st.floats(allow_nan=False, allow_infinity=False, width=32),
                     max_size=8),
        ),
        max_size=200,
    ),
    st.integers(min_value=16, max_value=64),
)
@settings(max_examples=50, deadline=None)
def test_nullable_list_roundtrip(values, page_rows):
    """Null list entries must decode as NULLS, not empty lists (a null and []
    are different values — VERDICT r01 wrong-answer bug)."""
    import io

    from webcodec import filefmt
    from webcodec.config import EncoderConfig

    t = pa.table({"emb": pa.array(values, pa.list_(pa.float32()))})
    buf = io.BytesIO()
    filefmt.write_table(t, buf, EncoderConfig(page_row_count_limit=page_rows))
    got = filefmt.read_table(buf.getvalue())
    assert got.column("emb").combine_chunks().equals(t.column("emb").combine_chunks())


@given(
    st.lists(st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)),
             max_size=150),
    st.lists(st.one_of(st.none(), st.text(max_size=20)), max_size=150),
)
@settings(max_examples=40, deadline=None)
def test_nullable_scalar_roundtrip(ints, texts):
    import io

    from webcodec import filefmt
    from webcodec.config import EncoderConfig

    n = max(len(ints), len(texts))
    ints = (ints + [None] * n)[:n]
    texts = (texts + [None] * n)[:n]
    t = pa.table({"i": pa.array(ints, pa.int64()), "s": pa.array(texts, pa.string())})
    buf = io.BytesIO()
    filefmt.write_table(t, buf, EncoderConfig(page_row_count_limit=32))
    got = filefmt.read_table(buf.getvalue())
    assert got.column("i").combine_chunks().equals(t.column("i").combine_chunks())
    assert got.column("s").combine_chunks().equals(t.column("s").combine_chunks())

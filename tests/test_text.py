"""Vectorized text-kernel tests: md5v parity with hashlib, simhash64 parity
with the scalar reference construction, embedding_matrix layout handling."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from webcodec.kernels.md5v import md5_u64le_arrow
from webcodec.spark.text import embedding_matrix, simhash64


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(max_size=120), max_size=200))
def test_md5v_matches_hashlib(values):
    got = md5_u64le_arrow(pa.array(values, pa.binary()))
    want = np.array(
        [int.from_bytes(hashlib.md5(v).digest()[:8], "little") for v in values],
        dtype=np.uint64,
    )
    assert (got == want).all()


def _simhash_scalar(texts: list[str | None]) -> np.ndarray:
    """Scalar reference construction. NB: the round-1 implementation summed
    votes in uint64, so minority votes (2*s < n) wrapped to huge positives
    and set the bit — fingerprints degenerated to ~all-ones. The vote must be
    SIGNED (bit set iff strictly more than half the tokens have it)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        words = (t or "").split(" ")
        hs = np.array(
            [int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little") for w in words],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(hs)
        out[i] = np.packbits((votes > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
    return out.view(np.int64)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.text(alphabet="abcdefgh XYZ.,", max_size=60)),
        max_size=80,
    )
)
def test_simhash64_matches_scalar_reference(texts):
    got = simhash64(pa.array(texts, pa.string()))
    assert (got == _simhash_scalar(texts)).all()


def test_simhash_on_sliced_chunked_input():
    texts = [f"doc {i} common words here" for i in range(100)]
    arr = pa.array(texts)
    assert (simhash64(arr.slice(10, 50)) == _simhash_scalar(texts[10:60])).all()
    ch = pa.chunked_array([arr.slice(0, 30), arr.slice(30, 70)])
    assert (simhash64(ch) == _simhash_scalar(texts)).all()


def test_embedding_matrix_roundtrip():
    rng = np.random.default_rng(3)
    m = rng.standard_normal((40, 8)).astype(np.float32)
    arr = pa.array(m.tolist(), pa.list_(pa.float32()))
    got = embedding_matrix(arr)
    assert got.shape == (40, 8)
    assert np.allclose(got, m)
    got = embedding_matrix(arr.slice(5, 20))
    assert np.allclose(got, m[5:25])


def test_simhash_golden_sf0001():
    """Hard-signal regression: fingerprints over the driver's sf0.001 corpus
    must match the committed golden values (catches any silent semantic drift
    in tokenize/hash/vote)."""
    import json
    import os

    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001/documents.parquet"
    if not os.path.exists(src):
        import pytest

        pytest.skip("driver testdata not present")
    t = pq.read_table(src, columns=["doc_id", "text"])
    h = simhash64(t.column("text"))
    ids = t.column("doc_id").to_numpy()
    with open(os.path.join(os.path.dirname(__file__), "golden", "simhash_sf0001.json")) as f:
        g = json.load(f)
    assert len(ids) == g["n"]
    assert int(np.bitwise_xor.reduce(h.view(np.uint64))) == g["xor_all"]
    assert int(h.view(np.uint64).sum(dtype=np.uint64) % np.uint64(2**63)) == g["sum_mod"]
    by_id = dict(zip(ids.tolist(), h.tolist()))
    for k, v in g["first20"].items():
        assert by_id[int(k)] == v


def test_asof_join_strict_tie_semantics(spark):
    """events_asof_view: a view at EXACTLY the click's timestamp must not
    count (strict <); the latest earlier view wins; no view -> null."""
    import datetime as dt

    import pyspark.sql.functions as F

    from __spark_entry__ import _events_asof_view  # noqa: PLC2701

    base = dt.datetime(2024, 1, 1)
    us = dt.timedelta(microseconds=1)
    rows = [
        # user 1: view@10, view@20, click@20 (tie -> must pick 10), click@30 -> 20
        (1, base + 10 * us, 1, "view"),
        (2, base + 20 * us, 1, "view"),
        (3, base + 20 * us, 1, "click"),
        (4, base + 30 * us, 1, "click"),
        # user 2: click with no view at all -> nulls
        (5, base + 5 * us, 2, "click"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        src = f"{td}/events.parquet"
        df.write.mode("overwrite").parquet(src)
        out = {r["event_id"]: r for r in _events_asof_view(spark, td).collect()}
    epoch = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert out[3]["asof_view_ts"] == epoch + 10  # tie excluded
    assert out[4]["asof_view_ts"] == epoch + 20
    assert out[5]["asof_view_ts"] is None
    assert out[4]["since_view_us"] == 10

"""ANN quality: measured recall of the scale paths (LSH buckets, IVF cells)
against the brute-force exact top-k, on the driver's sf0.001 embeddings.
Seeds are fixed, so recall is deterministic; the floors are intentionally
loose (these are probe-one-bucket demos with documented recall/cost knobs)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001/embeddings.parquet"

pytestmark = pytest.mark.skipif(not os.path.exists(SRC), reason="driver testdata absent")


def _data():
    t = pq.read_table(SRC, columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], emb[order]


def _brute_topk(ids, emb, k=20):
    q = emb[ids == 0][0]
    dots = emb @ q
    mask = ids != 0
    cand = np.argsort(-dots[mask])
    return set(ids[mask][cand[:k]].tolist())


def test_lsh_bucket_recall():
    ids, emb = _data()
    want = _brute_topk(ids, emb)
    planes = np.random.default_rng(7).standard_normal((64, 6))
    sig = (emb @ planes) > 0
    bucket = np.packbits(sig.astype(np.uint8), axis=1, bitorder="little")[:, 0]
    qb = bucket[ids == 0][0]
    got = set(ids[(bucket == qb) & (ids != 0)].tolist())
    recall = len(got & want) / len(want)
    # one probe of 64 buckets holds ~1/64 of the corpus; same-bucket bias
    # must beat random chance by a wide margin
    assert recall >= 0.1, recall
    assert len(got) < len(ids) * 0.25  # actually pruned the corpus


def test_ivf_cell_recall():
    ids, emb = _data()
    want = _brute_topk(ids, emb)
    rng = np.random.default_rng(7)
    k = 16
    X = emb[:512]
    C = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(8):
        cell = np.argmax(X @ C.T, axis=1)
        for j in range(k):
            m = cell == j
            if m.any():
                v = X[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[j] = v / n
    cells = np.argmax(emb @ C.T, axis=1)
    q = emb[ids == 0][0]
    probe = np.argsort(-(C @ q))[:4]  # nprobe=4, as in the simsearch_ivf query
    got = set(ids[np.isin(cells, probe) & (ids != 0)].tolist())
    recall = len(got & want) / len(want)
    # multi-probe concentrates the neighborhood while scanning ~1/4 of rows
    assert recall >= 0.3, recall
    assert len(got) < len(ids) * 0.5

"""Predicate algebra tests (SURVEY.md §2.D4: FilterApi/Operators parity).

Layers: exact residual semantics per op (hand-computed), pruning == brute
force for random conjuncts (hypothesis), and a page-skip instrumentation test
proving the two-sided range actually avoids decode work.
"""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webcodec import filefmt, predicate
from webcodec.config import EncoderConfig


def _write(t: pa.Table, **cfg) -> bytes:
    buf = io.BytesIO()
    filefmt.write_table(t, buf, EncoderConfig(**cfg))
    return buf.getvalue()


@pytest.fixture(scope="module")
def sample() -> bytes:
    n = 1000
    t = pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array([["en", "de", "fr", None][i % 4] for i in range(n)]),
            "url": pa.array([f"https://site{i % 7:02d}.com/p{i}" for i in range(n)]),
        }
    )
    return _write(t, page_row_count_limit=64)


def test_residual_ops_exact(sample):
    got = filefmt.read_table(sample, predicate=[("lang", "in", ["en", "fr"])])
    assert got.num_rows == 500
    assert set(got.column("lang").to_pylist()) == {"en", "fr"}

    got = filefmt.read_table(sample, predicate=[("lang", "isnull", None)])
    assert got.num_rows == 250
    assert got.column("lang").null_count == 250

    got = filefmt.read_table(sample, predicate=[("lang", "notnull", None)])
    assert got.num_rows == 750 and got.column("lang").null_count == 0

    got = filefmt.read_table(sample, predicate=[("url", "startswith", "https://site03.")])
    assert got.num_rows == 1000 // 7 + (1 if 3 < 1000 % 7 else 0)
    assert all(u.startswith("https://site03.") for u in got.column("url").to_pylist())

    # conjunction: two-sided range AND equality
    got = filefmt.read_table(
        sample, predicate=[("id", ">=", 100), ("id", "<", 300), ("lang", "==", "en")]
    )
    ids = got.column("id").to_pylist()
    assert ids == [i for i in range(100, 300) if i % 4 == 0]


def test_predicate_column_not_in_projection(sample):
    got = filefmt.read_table(
        sample, columns=["url"], predicate=[("id", ">=", 990), ("lang", "notnull", None)]
    )
    assert got.column_names == ["url"]
    assert got.num_rows == len([i for i in range(990, 1000) if i % 4 != 3])


def test_two_sided_range_skips_pages(sample, monkeypatch):
    """D3: a selective closed range on a sorted column must decode only the
    overlapping pages (plus dict pages), not the whole file."""
    calls = {"n": 0}
    orig = filefmt._read_page

    def counting_read_page(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(filefmt, "_read_page", counting_read_page)
    full = filefmt.read_table(sample)
    full_pages = calls["n"]
    calls["n"] = 0
    got = filefmt.read_table(sample, predicate=[("id", ">=", 260), ("id", "<", 300)])
    assert got.num_rows == 40
    assert got.column("id").to_pylist() == list(range(260, 300))
    # 1000 rows at the 256-row page floor = 4 data pages per column; the range
    # overlaps exactly one page per column (+ dict pages), vs 13 total reads
    assert calls["n"] < full_pages // 2
    monkeypatch.setattr(filefmt, "_read_page", orig)


def test_file_level_pruning_conjuncts(tmp_path):
    from webcodec.spark.table import SnapshotTable

    tbl = SnapshotTable(str(tmp_path / "t"))
    tbl.init()
    tbl.commit(
        [
            {"partition_id": 0, "path": "data/a", "rows": 10, "raw_bytes": 1,
             "compressed_bytes": 1,
             "column_stats": {"x": {"min": 0, "max": 5, "null_count": 0}}},
            {"partition_id": 1, "path": "data/b", "rows": 10, "raw_bytes": 1,
             "compressed_bytes": 1,
             "column_stats": {"x": {"min": 10, "max": 20, "null_count": 3}}},
        ],
        [{"name": "x", "type": "bigint", "nullable": True}],
    )
    assert [f["path"] for f in tbl.data_files([("x", ">=", 8), ("x", "<", 30)])] == ["data/b"]
    assert [f["path"] for f in tbl.data_files([("x", "in", [2, 3])])] == ["data/a"]
    assert [f["path"] for f in tbl.data_files([("x", "isnull", None)])] == ["data/b"]
    assert len(tbl.data_files([("x", "notnull", None)])) == 2
    assert tbl.data_files([("x", ">", 20)]) == []


_OPGEN = st.sampled_from(["==", "<", "<=", ">", ">=", "in", "isnull", "notnull"])


@given(
    st.lists(st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
             min_size=1, max_size=400),
    st.lists(st.tuples(_OPGEN, st.integers(min_value=-50, max_value=50)),
             min_size=1, max_size=3),
)
@settings(max_examples=60, deadline=None)
def test_conjunct_pruning_equals_brute_filter(values, terms):
    """Pruned+residual read == python brute force, for any conjunct mix."""
    t = pa.table({"v": pa.array(values, pa.int64())})
    data = _write(t, page_row_count_limit=32)
    conj = []
    for op, pivot in terms:
        if op == "in":
            conj.append(("v", "in", [pivot, pivot + 3]))
        elif op in ("isnull", "notnull"):
            conj.append(("v", op, None))
        else:
            conj.append(("v", op, pivot))
    got = filefmt.read_table(data, predicate=conj).column("v").to_pylist()

    def keep(x):
        for col, op, pv in conj:
            if op == "isnull":
                if x is not None:
                    return False
            elif op == "notnull":
                if x is None:
                    return False
            elif x is None:
                return False
            elif op == "==" and x != pv:
                return False
            elif op == "<" and not x < pv:
                return False
            elif op == "<=" and not x <= pv:
                return False
            elif op == ">" and not x > pv:
                return False
            elif op == ">=" and not x >= pv:
                return False
            elif op == "in" and x not in pv:
                return False
        return True

    assert got == [x for x in values if keep(x)]


@given(st.lists(st.text(alphabet="abc", max_size=6), min_size=1, max_size=200),
       st.text(alphabet="abc", max_size=3))
@settings(max_examples=60, deadline=None)
def test_startswith_pruning_equals_brute_filter(values, prefix):
    t = pa.table({"s": pa.array(values, pa.string())})
    data = _write(t, page_row_count_limit=16, statistics_truncate_length=4)
    got = filefmt.read_table(data, predicate=("s", "startswith", prefix))
    assert got.column("s").to_pylist() == [v for v in values if v.startswith(prefix)]


def test_normalize_rejects_unknown_op():
    with pytest.raises(ValueError):
        predicate.normalize([("x", "regex", "y")])


def test_contains_endswith_residual_exact(sample):
    got = filefmt.read_table(sample, predicate=[("url", "contains", "site04")])
    assert got.num_rows > 0
    assert all("site04" in u for u in got.column("url").to_pylist())

    got = filefmt.read_table(sample, predicate=[("url", "endswith", "/p7")])
    assert got.column("url").to_pylist() == ["https://site00.com/p7"]


def test_substring_ops_prune_at_dict_level(monkeypatch):
    """contains/endswith on a DICT-encoded column whose dictionary provably
    lacks the pattern must skip ALL page decode for that chunk."""
    n = 2000
    t = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array([["en", "de", "fr", "es"][i % 4] for i in range(n)]),
    })
    data = _write(t, page_row_count_limit=256)
    calls = {"n": 0}
    orig = filefmt._read_page

    def counting_read_page(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(filefmt, "_read_page", counting_read_page)
    got = filefmt.read_table(data, predicate=[("lang", "contains", "zz")])
    assert got.num_rows == 0
    dict_only = calls["n"]
    calls["n"] = 0
    full = filefmt.read_table(data)
    assert full.num_rows == n
    # miss path reads at most the dict page(s), never the data pages
    assert dict_only < calls["n"] // 2
    monkeypatch.setattr(filefmt, "_read_page", orig)
    # hit path stays exact
    got = filefmt.read_table(data, predicate=[("lang", "endswith", "n")])
    assert set(got.column("lang").to_pylist()) == {"en"}

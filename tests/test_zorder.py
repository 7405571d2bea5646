"""Z-order (Morton) multi-column clustering: sort_key="zorder(a,b)".

A single-column sort gives narrow page min/max stats for that column only;
the Z-curve keeps EVERY participating column locally clustered, so page
stats prune multi-dimensional scans on each dimension (Iceberg/Delta
OPTIMIZE ZORDER analogue, public Morton construction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from webcodec import filefmt
from webcodec.config import EncoderConfig
from webcodec.kernels.zorder import rank_quantize, zorder_key, zorder_sort_indices


def test_zorder_key_is_morton_on_grid():
    """On a 4x4 grid of equally-spaced values the key order must be the
    classic Z curve: (0,0) (0,1) (1,0) (1,1) (0,2) ... — x then y
    interleaved, x owning the more significant bit of each pair."""
    xs, ys = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    t = pa.table({"x": xs.ravel(), "y": ys.ravel()})
    order = zorder_sort_indices(t, ["x", "y"])
    walked = [(t.column("x")[int(i)].as_py(), t.column("y")[int(i)].as_py())
              for i in order]
    assert walked[:8] == [(0, 0), (0, 1), (1, 0), (1, 1), (0, 2), (0, 3), (1, 2), (1, 3)]
    # every consecutive pair stays within one quadrant hop (curve locality)
    z = zorder_key(t, ["x", "y"])
    assert len(np.unique(z)) == 16


def test_rank_quantize_handles_types_and_nulls():
    col = pa.chunked_array([pa.array(["b", None, "a", "c"])])
    q = rank_quantize(col, 4)
    assert q[2] < q[0] < q[3] < q[1]  # a < b < c < null(last)
    f = rank_quantize(pa.chunked_array([pa.array([3.5, -1.0, 2.25])]), 3)
    assert f[1] < f[2] < f[0]


def test_sort_indices_for_key_forms():
    t = pa.table({"a": [2, 1, 2, 1], "b": [0, 1, 1, 0]})
    one = t.take(filefmt.sort_indices_for_key(t, "a"))
    assert one.column("a").to_pylist() == [1, 1, 2, 2]
    lex = t.take(filefmt.sort_indices_for_key(t, "a,b"))
    assert list(zip(lex.column("a").to_pylist(), lex.column("b").to_pylist())) == [
        (1, 0), (1, 1), (2, 0), (2, 1)]
    assert filefmt.sort_indices_for_key(t, "nope") is None
    assert filefmt.sort_indices_for_key(t, "zorder(nope,mope)") is None
    # zorder with one resolvable column degrades to a plain sort
    z1 = t.take(filefmt.sort_indices_for_key(t, "zorder(a,nope)"))
    assert z1.column("a").to_pylist() == [1, 1, 2, 2]
    with pytest.raises(ValueError, match="2..4"):
        zorder_key(t, ["a"])


def _kept_pages(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(pages overlapping [lo, hi), total pages) for ``col`` from the footer
    page stats — the exact inputs the reader's page-skip machinery uses."""
    with open(path, "rb") as f:
        footer = filefmt.read_footer(f.read())
    groups = footer.get("groups") or [footer]
    kept = total = 0
    for g in groups:
        for c in g["chunks"]:
            if c["name"] != col:
                continue
            for p in c["pages"]:
                total += 1
                if p.get("min") is None or (p["min"] < hi and p["max"] >= lo):
                    kept += 1
    return kept, total


def test_zorder_prunes_both_dimensions(tmp_path):
    """60k rows over two independent uniform dims: ts-sorted files prune ts
    probes but keep ~all pages for a user_id probe; zorder(ts,user_id)
    prunes BOTH probes, at sqrt-ish cost on each."""
    rng = np.random.default_rng(7)
    n = 60_000
    t = pa.table({
        "ts": rng.integers(0, 1 << 30, n),
        "user_id": rng.integers(0, 1 << 30, n),
        "v": rng.integers(0, 100, n),
    })
    cfg = EncoderConfig(page_row_count_limit=2_000)
    p_ts = str(tmp_path / "ts.wcd")
    p_z = str(tmp_path / "z.wcd")
    filefmt.write_batches(iter(t.to_batches()), p_ts, cfg, sort_key="ts")
    filefmt.write_batches(iter(t.to_batches()), p_z, cfg, sort_key="zorder(ts,user_id)")

    lo, hi = 0, (1 << 30) // 20  # 5% selectivity probe on either dim
    ts_on_user = _kept_pages(p_ts, "user_id", lo, hi)
    z_on_user = _kept_pages(p_z, "user_id", lo, hi)
    z_on_ts = _kept_pages(p_z, "ts", lo, hi)
    assert ts_on_user[0] == ts_on_user[1]  # single-key sort: no pruning off-key
    assert z_on_user[0] < z_on_user[1] / 2  # z-order prunes the second dim
    assert z_on_ts[0] < z_on_ts[1] / 2  # ... and still prunes the first

    # correctness: both files decode to the same multiset, and a two-sided
    # predicate returns exactly the brute-force rows
    pred = [("user_id", ">=", lo), ("user_id", "<", hi)]
    got = filefmt.read_table(p_z, predicate=pred)
    u = t.column("user_id").to_numpy()
    assert got.num_rows == int(((u >= lo) & (u < hi)).sum())
    assert filefmt.read_table(p_z).num_rows == n


def test_zorder_through_spark_datasource(spark, tmp_path):
    """option('sort_key', 'zorder(...)') flows through the DataSource writer
    and the table round-trips exactly."""
    from webcodec.spark.datasource import WebcodecDataSource

    spark.dataSource.register(WebcodecDataSource)
    df = spark.range(20_000).selectExpr(
        "cast(id * 2654435761 % 1048576 as long) AS ts",
        "cast(id * 40503 % 1048576 as long) AS user_id",
        "cast(id as long) AS v",
    )
    out = str(tmp_path / "t")
    (df.write.format("webcodec").mode("append").option("path", out)
     .option("sort_key", "zorder(ts,user_id)").save())
    back = spark.read.format("webcodec").option("path", out).load()
    assert back.count() == 20_000
    assert back.agg({"v": "sum"}).collect()[0][0] == df.agg({"v": "sum"}).collect()[0][0]
    assert df.exceptAll(back).count() == 0

"""File-level round-trip tests (SURVEY.md §5.3 layers 3-4)."""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from webcodec import filefmt
from webcodec.config import EncoderConfig
from webcodec.fixtures import webpages, webpages_variant
from webcodec.types import Encoding


def _roundtrip(table: pa.Table, config: EncoderConfig | None = None) -> tuple[pa.Table, dict]:
    buf = io.BytesIO()
    footer = filefmt.write_table(table, buf, config)
    out = filefmt.read_table(buf.getvalue())
    return out, footer


def assert_tables_equal(a: pa.Table, b: pa.Table):
    assert a.schema.names == b.schema.names
    for name in a.schema.names:
        ca, cb = a.column(name).combine_chunks(), b.column(name).combine_chunks()
        assert ca.to_pylist() == cb.to_pylist(), f"column {name} mismatch"


def test_webpages_roundtrip():
    t = webpages(5_000)
    out, footer = _roundtrip(t)
    assert_tables_equal(t, out)
    assert footer["num_rows"] == 5_000


@pytest.mark.parametrize(
    "variant", ["nulls", "const", "unique", "sorted", "binary", "empty", "one", "widechars"]
)
def test_variant_roundtrip(variant):
    t = webpages_variant(variant, 1_000)
    out, _ = _roundtrip(t)
    assert_tables_equal(t, out)


@pytest.mark.parametrize("codec", ["none", "gzip", "zstd", "snappy", "lz4", "brotli"])
def test_codecs(codec):
    t = webpages(1_000)
    out, footer = _roundtrip(t, EncoderConfig(compression=codec))
    assert_tables_equal(t, out)


def test_selector_choices_on_webpages():
    t = webpages(20_000)
    _, footer = _roundtrip(t)
    enc = {c["name"]: Encoding(c["encoding"]) for c in footer["chunks"]}
    assert enc["lang"] == Encoding.DICT        # cardinality 6
    assert enc["warc_ts"] == Encoding.DELTA_BINARY_PACKED  # sorted ts
    assert enc["url"] in (Encoding.DICT, Encoding.FSST, Encoding.DELTA_LENGTH, Encoding.DELTA_BYTE_ARRAY)
    assert enc["text"] in (Encoding.FSST, Encoding.DELTA_LENGTH)


def test_sorted_urls_get_prefix_encoding():
    t = webpages_variant("sorted", 5_000)
    _, footer = _roundtrip(t)
    enc = {c["name"]: Encoding(c["encoding"]) for c in footer["chunks"]}
    assert enc["url"] == Encoding.DELTA_BYTE_ARRAY


def test_size_guard_never_worse_than_raw():
    """A7 invariant: encoded bytes (pre-compression) <= raw bytes + page overhead."""
    for variant in ["unique", "binary"]:
        t = webpages_variant(variant, 2_000)
        _, footer = _roundtrip(t, EncoderConfig(compression="none"))
        for c in footer["chunks"]:
            overhead = 64 * (len(c["pages"]) + 1) + 2048
            assert c["encoded_bytes"] <= c["raw_bytes"] + overhead, c["name"]


def test_size_budget_vs_reference_writer():
    """north_star: total compressed bytes <= pq.write_table at matched codec."""
    t = webpages(20_000)
    buf_ref = io.BytesIO()
    pq.write_table(t, buf_ref, compression="zstd")
    ref_size = buf_ref.tell()
    buf = io.BytesIO()
    footer = filefmt.write_table(t, buf, EncoderConfig(compression="zstd"))
    assert buf.tell() <= ref_size, f"ours {buf.tell()} > reference {ref_size}"


def test_projection_reads_only_requested_columns():
    t = webpages(2_000)
    buf = io.BytesIO()
    filefmt.write_table(t, buf)
    out = filefmt.read_table(buf.getvalue(), columns=["url", "lang"])
    assert out.schema.names == ["url", "lang"]
    assert out.column("url").to_pylist() == t.column("url").to_pylist()


def test_predicate_pruning_correct():
    t = webpages(20_000)
    buf = io.BytesIO()
    cfg = EncoderConfig(page_row_count_limit=1_000)
    filefmt.write_table(t, buf, cfg)
    lo = t.column("warc_ts")[15_000].as_py()
    out = filefmt.read_table(buf.getvalue(), predicate=("warc_ts", ">=", int(lo.timestamp() * 1e6)))
    import pyarrow.compute as pc

    expect = t.filter(pc.greater_equal(t.column("warc_ts"), pa.scalar(lo)))
    assert out.num_rows == expect.num_rows


def test_footer_stats_present():
    t = webpages(2_000)
    _, footer = _roundtrip(t)
    lang = next(c for c in footer["chunks"] if c["name"] == "lang")
    assert lang["stats"]["min"] == "de"
    assert lang["stats"]["max"] == "zh"
    assert lang["stats"]["null_count"] == 0


def test_crc_detects_corruption():
    t = webpages(500)
    buf = io.BytesIO()
    filefmt.write_table(t, buf)
    data = bytearray(buf.getvalue())
    data[100] ^= 0xFF
    with pytest.raises(ValueError):
        filefmt.read_table(bytes(data))


def test_timestamp_precision_is_exact():
    t = webpages(1_000)
    out, _ = _roundtrip(t)
    a = t.column("warc_ts").cast(pa.int64()).to_pylist()
    b = out.column("warc_ts").combine_chunks().cast(pa.int64()).to_pylist()
    assert a == b


def test_embeddings_list_float32():
    rng = np.random.default_rng(7)
    vecs = [rng.standard_normal(8).astype(np.float32).tolist() for _ in range(200)]
    t = pa.table({"vec_id": pa.array(range(200), pa.int64()), "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    out, _ = _roundtrip(t)
    assert_tables_equal(t, out)


def test_timestamp_ns_roundtrip_and_pruning(tmp_path):
    """timestamp[ns] columns (e.g. pyarrow reading Spark's INT96 output)
    round-trip bit-identical and prune correctly against datetime
    predicates; only the Spark boundary truncates to micros."""
    import datetime as dt

    import numpy as np
    import pyarrow as pa

    from webcodec.filefmt import read_table, write_table

    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    us = np.arange(100, dtype=np.int64) * 1_000_000 + base
    t = pa.table({
        "id": pa.array(np.arange(100, dtype=np.int64)),
        "ts": pa.array(us * 1000 + 7, pa.timestamp("ns")),  # sub-us payload
    })
    p = str(tmp_path / "ns.wcd")
    write_table(t, p)
    back = read_table(p)
    assert back.equals(t)  # bit-identical, sub-us nanos preserved
    cut = dt.datetime(2024, 1, 1) + dt.timedelta(seconds=50)
    got = read_table(p, predicate=[("ts", ">=", cut)])
    assert got.num_rows == 50


def _struct_table(n=5000, with_nulls=True):
    import numpy as np

    rng = np.random.default_rng(7)
    mask = pa.array((np.arange(n) % 11) == 3) if with_nulls else None
    inner = pa.StructArray.from_arrays(
        [
            pa.array(rng.integers(0, 5, n)),
            pa.array([f"u{i % 7}" if i % 9 else None for i in range(n)]),
            pa.array(rng.random(n), pa.float64()),
        ],
        fields=[
            pa.field("a", pa.int64(), nullable=False),
            pa.field("b", pa.string()),
            pa.field("c", pa.float64()),
        ],
        mask=mask,
    )
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "s": inner,
        "txt": pa.array(["x" * int(i % 13) for i in range(n)]),
    })


def test_struct_roundtrip_bit_identical(tmp_path):
    """One-level struct shredding (E1 subset): parent validity + per-child
    chunks with independent codec selection; round-trip is bit-identical
    including struct nulls and nullable/non-nullable children."""
    from webcodec.filefmt import read_table, write_table

    t = _struct_table()
    p = str(tmp_path / "s.wcd")
    write_table(t, p)
    back = read_table(p)
    assert back.equals(t)
    assert back.schema.equals(t.schema)  # exact field nullability preserved


def test_struct_projection_pruning_and_predicate_guard(tmp_path):
    from webcodec.filefmt import read_table, write_table

    t = _struct_table()
    p = str(tmp_path / "s.wcd")
    write_table(t, p)
    proj = read_table(p, columns=["s"])
    assert proj.column_names == ["s"]
    assert proj.column("s").combine_chunks().equals(t.column("s").combine_chunks())
    # row-range sync: struct children filter under the same keep mask
    got = read_table(p, predicate=[("id", ">=", 4000)])
    assert got.num_rows == 1000
    assert got.column("s").combine_chunks().equals(t.column("s").slice(4000).combine_chunks())
    with pytest.raises(ValueError, match="nested/decimal columns unsupported"):
        read_table(p, predicate=[("s", "==", 1)])


def test_struct_append_merge(tmp_path):
    """Byte-level append (C10) copies struct parent+child chunks verbatim."""
    from webcodec.filefmt import append_files, read_table, write_table

    t = _struct_table(n=2000, with_nulls=False)
    p1, p2, dst = (str(tmp_path / f) for f in ("a.wcd", "b.wcd", "m.wcd"))
    write_table(t.slice(0, 1200), p1)
    write_table(t.slice(1200), p2)
    append_files(dst, [p1, p2])
    back = read_table(dst)
    assert back.num_rows == 2000
    assert back.column("s").combine_chunks().equals(t.column("s").combine_chunks())


def test_struct_nested_roundtrip(tmp_path):
    """r2 rejected struct-in-struct; the r3 recursive dispatcher shreds it
    (deep-shape coverage lives in test_encoding_matrix)."""
    from webcodec.filefmt import read_table, write_table

    inner = pa.StructArray.from_arrays([pa.array([1, 2])], names=["x"])
    outer = pa.StructArray.from_arrays([inner], names=["in"])
    t = pa.table({"s": outer})
    write_table(t, str(tmp_path / "n.wcd"))
    assert read_table(str(tmp_path / "n.wcd")).equals(t)


def _map_table(n=5000, with_nulls=True):
    import numpy as np

    rng = np.random.default_rng(11)
    maps = []
    for i in range(n):
        if with_nulls and i % 11 == 3:
            maps.append(None)
        else:
            k = int(rng.integers(0, 5))
            maps.append(
                {f"k{j}": (None if (i + j) % 17 == 5 else int(rng.integers(0, 100)))
                 for j in range(k)}
            )
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "m": pa.array(maps, pa.map_(pa.string(), pa.int64())),
    })


def test_map_roundtrip_bit_identical(tmp_path):
    """Map shredding: parent validity + keys/items generic-LIST chunks;
    round-trip preserves map nulls, null values, empty maps, entry order."""
    from webcodec.filefmt import read_table, write_table

    t = _map_table()
    p = str(tmp_path / "m.wcd")
    write_table(t, p)
    back = read_table(p)
    assert back.equals(t)
    assert back.schema.equals(t.schema)


def test_map_projection_predicate_append(tmp_path):
    from webcodec.filefmt import append_files, read_table, write_table

    t = _map_table()
    p = str(tmp_path / "m.wcd")
    write_table(t, p)
    proj = read_table(p, columns=["m"])
    assert proj.column("m").combine_chunks().equals(t.column("m").combine_chunks())
    got = read_table(p, predicate=[("id", ">=", 4000)])
    assert got.num_rows == 1000
    assert got.column("m").combine_chunks().equals(t.column("m").slice(4000).combine_chunks())
    with pytest.raises(ValueError, match="nested/decimal columns unsupported"):
        read_table(p, predicate=[("m", "==", 1)])
    p2, dst = str(tmp_path / "b.wcd"), str(tmp_path / "c.wcd")
    write_table(t.slice(3000), p2)
    append_files(dst, [p, p2])
    assert read_table(dst).num_rows == 5000 + 2000


def test_map_string_values(tmp_path):
    from webcodec.filefmt import read_table, write_table

    t = pa.table({
        "m": pa.array([{"a": "x", "b": None}, {}, None, {"c": "y"}],
                      pa.map_(pa.string(), pa.string()))
    })
    p = str(tmp_path / "m.wcd")
    write_table(t, p)
    assert read_table(p).equals(t)


def _nested_table(n=4000):
    import numpy as np

    rng = np.random.default_rng(5)
    ls = []
    for i in range(n):
        if i % 11 == 3:
            ls.append(None)
        else:
            k = int(rng.integers(0, 4))
            ls.append([
                None if (i + j) % 13 == 6 else
                {"a": int(rng.integers(0, 100)), "b": (None if (i + j) % 7 == 2 else f"s{j}")}
                for j in range(k)
            ])
    lst = pa.array(ls, pa.list_(pa.struct([
        pa.field("a", pa.int64()), pa.field("b", pa.string())])))
    ll = []
    for i in range(n):
        if i % 17 == 5:
            ll.append(None)
        else:
            k = int(rng.integers(0, 3))
            ll.append([
                None if (i + j) % 19 == 7 else
                [int(x) for x in rng.integers(0, 50, int(rng.integers(0, 4)))]
                for j in range(k)
            ])
    llt = pa.array(ll, pa.list_(pa.list_(pa.int64())))
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)), "ls": lst, "ll": llt})


def test_list_struct_and_list_list_roundtrip(tmp_path):
    """E2/E3: list<struct> and list<list> shredding round-trips bit-identical
    including nulls at every level and empty lists."""
    from webcodec.filefmt import read_table, write_table

    t = _nested_table()
    p = str(tmp_path / "n.wcd")
    write_table(t, p)
    back = read_table(p)
    assert back.equals(t)
    assert back.schema.equals(t.schema)


def test_nested_predicate_projection_append(tmp_path):
    from webcodec.filefmt import append_files, read_table, write_table

    t = _nested_table()
    p = str(tmp_path / "n.wcd")
    write_table(t, p)
    got = read_table(p, predicate=[("id", ">=", 3000)])
    assert got.num_rows == 1000
    for c in ("ls", "ll"):
        assert got.column(c).combine_chunks().equals(t.column(c).slice(3000).combine_chunks())
    proj = read_table(p, columns=["ll"])
    assert proj.column_names == ["ll"]
    p2, dst = str(tmp_path / "b.wcd"), str(tmp_path / "c.wcd")
    write_table(t.slice(2000), p2)
    append_files(dst, [p, p2])
    assert read_table(dst).num_rows == 6000


def test_list_list_float32(tmp_path):
    from webcodec.filefmt import read_table, write_table

    t = pa.table({"v": pa.array([[[1.0, 2.0], [3.0]], None, [], [[]], [None]],
                                pa.list_(pa.list_(pa.float32())))})
    p = str(tmp_path / "f.wcd")
    write_table(t, p)
    assert read_table(p).equals(t)

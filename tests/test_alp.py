"""ALP floating-point codec: exactness for every input, mode selection,
size wins, and end-to-end through the file format + selector."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webcodec import filefmt
from webcodec.config import EncoderConfig
from webcodec.kernels import alp, bss


def rt(x: np.ndarray) -> np.ndarray:
    return alp.decode(alp.encode(x), x.dtype, len(x))


def assert_bitwise(a: np.ndarray, b: np.ndarray):
    assert a.dtype == b.dtype
    assert a.tobytes() == b.tobytes()  # NaN payloads and -0.0 included


def test_decimal_doubles_mode0_and_smaller_than_bss():
    rng = np.random.default_rng(7)
    x = np.round(rng.random(50_000) * 500, 2)
    enc = alp.encode(x)
    assert enc[0] == 0  # decimal mode
    assert_bitwise(rt(x), x)
    z = pa.Codec("zstd", 3)
    assert len(z.compress(enc)) < 0.5 * len(z.compress(bss.encode(x)))


def test_trailing_zero_magnitudes_use_f():
    x = (np.arange(1, 20_001, dtype=np.float64) * 1e6).round()
    enc = alp.encode(x)
    assert enc[0] == 0
    assert_bitwise(rt(x), x)


def test_random_doubles_mode_rd():
    rng = np.random.default_rng(11)
    x = rng.standard_normal(30_000) * np.exp(rng.standard_normal(30_000) * 4)
    enc = alp.encode(x)
    assert enc[0] == 1  # RD mode
    assert_bitwise(rt(x), x)
    # pre-codec RD beats raw width
    assert len(enc) < 0.95 * x.nbytes


def test_specials_and_signed_zero_bitwise():
    x = np.array(
        [0.0, -0.0, np.nan, -np.nan, np.inf, -np.inf, 1e308, -1e-308,
         5e-324, 1.25, -2.5, np.float64(2**62) * 3.0],
        dtype=np.float64,
    )
    assert_bitwise(rt(x), x)


def test_mostly_decimal_with_exceptions_stays_mode0():
    rng = np.random.default_rng(3)
    x = np.round(rng.random(10_000) * 100, 2)
    x[::97] = np.nan  # ~1% exceptions
    enc = alp.encode(x)
    assert enc[0] == 0
    assert_bitwise(rt(x), x)


def test_float32_both_modes():
    rng = np.random.default_rng(5)
    dec = np.round(rng.random(20_000) * 90, 1).astype(np.float32)
    enc = alp.encode(dec)
    assert enc[0] == 0
    assert_bitwise(rt(dec), dec)
    rnd = rng.standard_normal(20_000).astype(np.float32) * np.float32(1e10)
    raw = rng.random(20_000).astype(np.float32)  # full mantissa entropy
    mix = (rnd * raw).astype(np.float32)
    assert_bitwise(rt(mix), mix)


def test_empty_and_single():
    for x in (np.zeros(0, np.float64), np.array([3.14]), np.zeros(0, np.float32),
              np.array([np.nan], dtype=np.float32)):
        assert_bitwise(rt(x), x)


def test_constant_column():
    x = np.full(10_000, 12.75)
    enc = alp.encode(x)
    assert_bitwise(rt(x), x)
    assert len(enc) < 500  # FOR collapses a constant to miniblock headers


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=300
    )
)
def test_hypothesis_doubles_bitwise(vals):
    x = np.array(vals, dtype=np.float64)
    assert_bitwise(rt(x), x)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=True, allow_infinity=True, width=32), max_size=300
    )
)
def test_hypothesis_floats_bitwise(vals):
    x = np.array(vals, dtype=np.float32)
    assert_bitwise(rt(x), x)


def test_file_roundtrip_selector_picks_alp(tmp_path):
    rng = np.random.default_rng(9)
    vals = np.round(rng.random(5_000) * 500, 2)
    t = pa.table({"value": vals, "noise": rng.standard_normal(5_000)})
    path = str(tmp_path / "t.wcd")
    filefmt.write_table(t, path, EncoderConfig())
    back = filefmt.read_table(path)
    assert back.column("value").to_pylist() == t.column("value").to_pylist()
    assert back.column("noise").to_pylist() == t.column("noise").to_pylist()
    footer = filefmt.read_footer_path(path)
    chunks = {c["name"]: c for c in (footer.get("groups") or [footer])[0]["chunks"]}
    from webcodec.types import Encoding

    assert chunks["value"]["encoding"] == int(Encoding.ALP)


def test_file_roundtrip_with_nulls(tmp_path):
    vals = [1.25, None, 3.5, None, 100.01] * 100
    t = pa.table({"v": pa.array(vals, type=pa.float64())})
    path = str(tmp_path / "n.wcd")
    filefmt.write_table(t, path, EncoderConfig())
    back = filefmt.read_table(path)
    assert back.column("v").to_pylist() == vals


def test_bss_still_reachable_by_override(tmp_path):
    rng = np.random.default_rng(1)
    t = pa.table({"v": rng.standard_normal(1_000)})
    path = str(tmp_path / "b.wcd")
    cfg = EncoderConfig(column_encoding={"v": "byte_stream_split"})
    filefmt.write_table(t, path, cfg)
    footer = filefmt.read_footer_path(path)
    chunks = {c["name"]: c for c in (footer.get("groups") or [footer])[0]["chunks"]}
    from webcodec.types import Encoding

    assert chunks["v"]["encoding"] == int(Encoding.BYTE_STREAM_SPLIT)
    assert filefmt.read_table(path).column("v").to_pylist() == t.column("v").to_pylist()

"""Reader robustness: corrupted files must raise clean errors, never return
wrong data silently (CRC + footer validation)."""

from __future__ import annotations

import io

import numpy as np
import pytest

from webcodec import filefmt
from webcodec.config import EncoderConfig
from webcodec.fixtures import webpages


@pytest.fixture(scope="module")
def encoded() -> bytes:
    t = webpages(1_000)
    buf = io.BytesIO()
    filefmt.write_table(t, buf, EncoderConfig())
    return buf.getvalue()


def test_truncated_file(encoded):
    for cut in (3, 10, len(encoded) // 2, len(encoded) - 5):
        with pytest.raises((ValueError, Exception)):
            filefmt.read_table(encoded[:cut])


def test_bad_magic(encoded):
    bad = b"XXXX" + encoded[4:]
    with pytest.raises(ValueError, match="not a webcodec file"):
        filefmt.read_table(bad)


def test_footer_crc_detected(encoded):
    # flip one byte inside the footer json region
    flen = int.from_bytes(encoded[-12:-8], "little")
    pos = len(encoded) - 12 - flen + flen // 2
    bad = bytearray(encoded)
    bad[pos] ^= 0xFF
    with pytest.raises(ValueError, match="footer crc"):
        filefmt.read_table(bytes(bad))


def test_page_corruption_detected(encoded):
    """Flip bytes in page payload regions: every corruption either raises a
    clean error (crc mismatch / decode error) or — never — returns success
    with silently wrong data."""
    t = webpages(1_000)
    rng = np.random.default_rng(7)
    flen = int.from_bytes(encoded[-12:-8], "little")
    data_end = len(encoded) - 12 - flen
    detected = 0
    for _ in range(25):
        pos = int(rng.integers(8, data_end))
        bad = bytearray(encoded)
        bad[pos] ^= 0xFF
        try:
            got = filefmt.read_table(bytes(bad))
        except Exception:  # noqa: BLE001 — any clean error is a pass
            detected += 1
            continue
        # decoded without error: data must STILL be correct (the flip may hit
        # padding/unused bytes) — compare against the pristine decode
        want = filefmt.read_table(encoded)
        assert got.equals(want), f"silent corruption at offset {pos}"
        detected += 1
    assert detected == 25

"""Multimodal plumbing tests: dict-level pruning + media feature extraction."""

from __future__ import annotations

import pyarrow as pa
import pytest

from webcodec import filefmt
from webcodec.config import EncoderConfig
from webcodec.fixtures import webpages


def test_dictionary_level_pruning(tmp_path):
    """D2 DictionaryFilter parity: == on a value absent from a DICT chunk's
    dictionary skips the chunk exactly (blooms disabled to isolate)."""
    t = webpages(2_000)
    path = str(tmp_path / "t.wcd")
    footer = filefmt.write_table(t, path, EncoderConfig(bloom_filter_enabled=False))
    from webcodec.types import Encoding

    lang_chunk = next(c for c in footer["chunks"] if c["name"] == "lang")
    assert Encoding(lang_chunk["encoding"]) == Encoding.DICT
    got = filefmt.read_table(path, columns=["lang"], predicate=("lang", "==", "xx"))
    assert got.num_rows == 0
    import pyarrow.compute as pc

    got = filefmt.read_table(path, columns=["lang"], predicate=("lang", "==", "fr"))
    assert got.num_rows == t.filter(pc.equal(t.column("lang"), "fr")).num_rows


@pytest.mark.spark
def test_media_feature_extraction(spark, tmp_path):
    import pyarrow.parquet as pq

    from webcodec.spark.media import extract_media_features

    t = webpages(1_000)
    src = str(tmp_path / "pages.parquet")
    pq.write_table(t, src)
    df = spark.read.parquet(src).withColumnRenamed("warc_ts", "ts")
    from pyspark.sql import functions as F

    media = df.select(F.monotonically_increasing_id().alias("mid"), F.col("html"))
    feats = extract_media_features(media, "mid", "html")
    rows = feats.collect()
    assert len(rows) == 1_000
    r0 = rows[0]
    assert r0["format"] == "html"
    assert r0["n_bytes"] > 0
    assert 64 <= r0["width"] < 256 and 64 <= r0["height"] < 256
    assert r0["decoded"] is False  # stub path (no PIL in this container)
    assert len(r0["feature"]) == 8
    # deterministic: second run produces identical features
    rows2 = extract_media_features(media, "mid", "html").collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_media_stub_matches_scalar_md5():
    """The vectorized stub must reproduce the per-row md5 construction
    exactly: dims from digest bytes 0/1, features from digest[:8]."""
    import hashlib

    import numpy as np
    import pyarrow.compute as pc

    from webcodec.kernels.md5v import md5_u64le_arrow

    blobs = [b"", b"<html>x</html>", b"GIF89a trailer", bytes(range(256)) * 3, b"\x89PNGabc"]
    arr = pa.array(blobs, pa.binary())
    h64 = md5_u64le_arrow(pc.binary_slice(arr, 0, 256))
    hb = h64.view(np.uint8).reshape(len(blobs), 8)
    for i, blob in enumerate(blobs):
        d = hashlib.md5(blob[:256]).digest()
        assert hb[i, 0] == d[0] and hb[i, 1] == d[1]
        assert bytes(hb[i]) == d[:8]
        w, h = 64 + d[0] % 192, 64 + d[1] % 192
        assert (64 + hb[i, 0] % 192, 64 + hb[i, 1] % 192) == (w, h)


# ---------------------- real BMP/PPM decode (r4) ----------------------


def test_imaging_roundtrip_random_pixels():
    import numpy as np

    from webcodec.imaging import decode_bmp, decode_image, decode_ppm, encode_bmp, encode_ppm

    rng = np.random.default_rng(3)
    for w in (1, 2, 3, 5, 8, 13):  # odd widths exercise BMP row padding
        for h in (1, 2, 7):
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert np.array_equal(decode_bmp(encode_bmp(px)), px), (w, h)
            assert np.array_equal(decode_ppm(encode_ppm(px)), px), (w, h)
            assert np.array_equal(decode_image(encode_bmp(px)), px)


def test_imaging_bmp_top_down_and_orientation():
    """Negative biHeight = top-down rows; bottom-up files must flip."""
    import struct

    import numpy as np

    from webcodec.imaging import decode_bmp, encode_bmp

    px = np.zeros((4, 3, 3), np.uint8)
    px[0] = [255, 0, 0]  # top row red
    blob = bytearray(encode_bmp(px))
    out = decode_bmp(bytes(blob))
    assert tuple(out[0, 0]) == (255, 0, 0)  # bottom-up flip applied
    # rewrite height as negative (top-down): rows then read in file order
    struct.pack_into("<i", blob, 22, -4)
    out2 = decode_bmp(bytes(blob))
    assert tuple(out2[3, 0]) == (255, 0, 0)  # red lands at the BOTTOM now


def test_imaging_ppm_comments_and_errors():
    import numpy as np
    import pytest as _pytest

    from webcodec.imaging import decode_bmp, decode_ppm, encode_ppm

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    blob = b"P6 # a comment\n3 # width\n2\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(blob), px)
    with _pytest.raises(ValueError, match="truncated PPM"):
        decode_ppm(encode_ppm(px)[:-1])
    with _pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6 1 1 65535\n" + b"\0" * 6)
    with _pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + b"\0" * 60)
    with _pytest.raises(ValueError, match="truncated BMP"):
        from webcodec.imaging import encode_bmp

        decode_bmp(encode_bmp(px)[:-1])


def test_decode_image_stats_spark(spark):
    """Spark op: BMP/PPM rows decode to exact sums; opaque blobs pass
    through undecoded."""
    import numpy as np
    import pyarrow as pa

    from webcodec.imaging import encode_bmp, encode_ppm
    from webcodec.spark.media import decode_image_stats

    px1 = np.full((2, 5, 3), 10, np.uint8)
    px2 = np.full((3, 4, 3), 200, np.uint8)
    t = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "blob": pa.array([encode_bmp(px1), encode_ppm(px2), b"\xff\xd8\xffjpeg..."],
                         pa.binary()),
    })
    df = spark.createDataFrame(t.to_pandas())
    rows = {r["media_id"]: r for r in decode_image_stats(df, "media_id", "blob").collect()}
    assert rows[1]["format"] == "bmp" and rows[1]["sum_r"] == 10 * 2 * 5
    assert rows[1]["width"] == 5 and rows[1]["height"] == 2 and rows[1]["decoded"]
    assert rows[2]["format"] == "ppm" and rows[2]["sum_g"] == 200 * 3 * 4
    assert rows[3]["format"] == "unknown" and not rows[3]["decoded"]
    assert rows[3]["width"] == -1


def test_media_features_real_decoder_wired(spark):
    """r5: extract_media_features routes BMP/PPM blobs through the REAL
    numpy decoders — real dims, decoded=true, features = exact integer
    pixel stats (k-128)/128 — while opaque blobs keep the stub embedding
    with decoded=false."""
    import numpy as np
    import pyarrow as pa

    from webcodec.imaging import encode_bmp, encode_ppm
    from webcodec.spark.media import extract_media_features

    px = np.zeros((3, 5, 3), np.uint8)
    px[:, :, 0] = 9          # sum_r = 135
    px[0, 0] = (20, 1, 2)    # top-left
    bmp = encode_bmp(px)
    ppm = encode_ppm(px)
    t = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "blob": pa.array([bmp, ppm, b"plain text, no magic"], pa.binary()),
    })
    df = spark.createDataFrame(t.to_pandas())
    rows = {r["media_id"]: r
            for r in extract_media_features(df, "media_id", "blob").collect()}
    for mid, blob, fmt in ((1, bmp, "bmp"), (2, ppm, "ppm")):
        r = rows[mid]
        assert r["format"] == fmt and r["decoded"]
        assert (r["width"], r["height"]) == (5, 3)
        sum_r = 9 * 15 + (20 - 9)
        want_k = [sum_r % 256, (1 + 2) % 256, (2 + 1) % 256, 5, 3, 20,
                  15 % 256, len(blob) % 256]
        want_k[1] = (0 * 15 + 1) % 256  # sum_g: one pixel overridden to 1
        want_k[2] = (0 * 15 + 2) % 256
        got = [round(f * 128 + 128) for f in r["feature"]]
        assert got == want_k, (fmt, got, want_k)
    r3 = rows[3]
    assert r3["format"] == "unknown" and not r3["decoded"]
    assert len(r3["feature"]) == 8  # stub embedding, same shape


def test_decode_image_stats_corrupt_blob_passthrough(spark):
    """ADVICE r4: a blob with the right magic but corrupt body must pass
    through as decoded=false/format='corrupt' instead of failing the Spark
    task."""
    import numpy as np
    import pyarrow as pa

    from webcodec.imaging import encode_bmp
    from webcodec.spark.media import decode_image_stats

    good = encode_bmp(np.full((2, 2, 3), 7, np.uint8))
    t = pa.table({
        "media_id": pa.array([1, 2, 3, 4], pa.int64()),
        "blob": pa.array([good, good[:30], b"P6\n999999999 2\n255\nxx", b""],
                         pa.binary()),
    })
    df = spark.createDataFrame(t.to_pandas())
    rows = {r["media_id"]: r
            for r in decode_image_stats(df, "media_id", "blob").collect()}
    assert rows[1]["decoded"] and rows[1]["sum_r"] == 7 * 4
    for mid in (2, 3):
        assert not rows[mid]["decoded"] and rows[mid]["format"] == "corrupt"
        assert rows[mid]["width"] == -1
    assert not rows[4]["decoded"] and rows[4]["format"] == "unknown"


def test_text_lookalike_blobs_never_sniff_as_images(spark):
    """2-byte ASCII magics: ordinary text starting with "BM"/"P6" must sniff
    as 'unknown' (not bmp/ppm) in BOTH media paths — the strict structural
    sniff (BMP reserved-zeros, PPM header grammar) rejects it. A truncated
    REAL image still sniffs as its format and reports corrupt/undecoded."""
    import numpy as np
    import pyarrow as pa

    from webcodec.imaging import decode_image, encode_bmp, encode_ppm, sniff_image
    from webcodec.spark.media import decode_image_stats, extract_media_features

    texts = [b"BMW crash report: the vehicle " + b"x" * 64,
             b"P6 spark plugs are rated for " + b"y" * 64,
             b"P6 9mm rounds"]  # digit after ws: sniffs ppm, decodes corrupt
    assert sniff_image(texts[0]) is None and decode_image(texts[0]) is None
    assert sniff_image(texts[1]) is None and decode_image(texts[1]) is None
    assert sniff_image(texts[2]) == "ppm"

    good_bmp = encode_bmp(np.full((2, 2, 3), 9, np.uint8))
    good_ppm = encode_ppm(np.full((3, 2, 3), 5, np.uint8))
    assert sniff_image(good_bmp) == "bmp" and sniff_image(good_ppm) == "ppm"
    assert sniff_image(good_bmp[:30]) == "bmp"  # truncated real image

    t = pa.table({
        "media_id": pa.array(list(range(5)), pa.int64()),
        "blob": pa.array([texts[0], texts[1], good_bmp, good_ppm,
                          good_bmp[:30]], pa.binary()),
    })
    df = spark.createDataFrame(t.to_pandas())
    feats = {r["media_id"]: r
             for r in extract_media_features(df, "media_id", "blob").collect()}
    assert feats[0]["format"] == "unknown" and not feats[0]["decoded"]
    assert feats[1]["format"] == "unknown" and not feats[1]["decoded"]
    assert feats[2]["format"] == "bmp" and feats[2]["decoded"]
    assert feats[3]["format"] == "ppm" and feats[3]["decoded"]
    assert feats[4]["format"] == "bmp" and not feats[4]["decoded"]

    stats = {r["media_id"]: r
             for r in decode_image_stats(df, "media_id", "blob").collect()}
    assert stats[0]["format"] == "unknown" and not stats[0]["decoded"]
    assert stats[1]["format"] == "unknown" and not stats[1]["decoded"]
    assert stats[2]["decoded"] and stats[2]["sum_r"] == 9 * 4
    assert stats[4]["format"] == "corrupt" and not stats[4]["decoded"]

"""Dependency-free raster codecs: 24-bit uncompressed BMP and binary PPM (P6).

Pure numpy, no image libraries — this makes the multimodal media path REAL
in this container: `webcodec.spark.media.decode_image_stats` decodes actual
pixels instead of the hash stub whenever a blob is BMP/PPM (formats chosen
because their specs are public, tiny, and decodable with buffer reshapes —
the same Arrow-in/numpy-kernel shape a JPEG decoder would slot into).

Format evidence (public): the Windows BITMAPFILEHEADER/BITMAPINFOHEADER
layout (14 + 40 bytes, little-endian, bottom-up BGR rows padded to 4 bytes)
and the netpbm P6 spec (ASCII header ``P6 <w> <h> <maxval>`` with ``#``
comments, then raw RGB bytes).
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------- BMP (24-bit) ---------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """H x W x 3 uint8 RGB -> 24-bit uncompressed bottom-up BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects an (H, W, 3) uint8 array")
    h, w, _ = pixels.shape
    row_raw = w * 3
    stride = (row_raw + 3) & ~3
    img = np.zeros((h, stride), np.uint8)
    # bottom-up row order, BGR channel order (the on-disk BMP layout)
    img[:, :row_raw] = pixels[::-1, :, ::-1].reshape(h, row_raw)
    data = img.tobytes()
    off = 14 + 40
    file_header = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + info_header + data


def decode_bmp(blob: bytes | memoryview) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (H, W, 3) uint8 RGB (top-down)."""
    b = memoryview(blob)
    if len(b) < 54 or bytes(b[:2]) != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", b, 10)
    (header_size,) = struct.unpack_from("<I", b, 14)
    if header_size < 40:
        raise ValueError("unsupported BMP header (BITMAPCOREHEADER)")
    w, hgt = struct.unpack_from("<ii", b, 18)
    _planes, bpp = struct.unpack_from("<HH", b, 26)
    (compression,) = struct.unpack_from("<I", b, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP (got bpp={bpp}, "
                         f"compression={compression})")
    bottom_up = hgt > 0
    h = abs(hgt)
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    stride = (w * 3 + 3) & ~3
    need = data_off + stride * h
    if len(b) < need:
        raise ValueError("truncated BMP pixel data")
    arr = np.frombuffer(b, np.uint8, count=stride * h, offset=data_off)
    px = arr.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return px[::-1] if bottom_up else px


# --------------------------------- PPM (P6) -----------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """H x W x 3 uint8 RGB -> binary PPM (P6, maxval 255)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_ppm expects an (H, W, 3) uint8 array")
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(pixels).tobytes()


def _ppm_tokens(b: memoryview, count: int) -> tuple[list[int], int]:
    """First ``count`` whitespace-separated integer tokens after the magic,
    skipping ``#`` comments; returns (tokens, offset after the single
    whitespace byte that terminates the last token — the pixel data start)."""
    toks: list[int] = []
    i = 2  # past "P6"
    n = len(b)
    while len(toks) < count:
        while i < n and b[i] in b" \t\r\n":
            i += 1
        if i < n and b[i] == ord("#"):
            while i < n and b[i] not in b"\r\n":
                i += 1
            continue
        j = i
        while j < n and b[j] not in b" \t\r\n":
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(int(bytes(b[i:j])))
        i = j
    if i >= n:
        raise ValueError("truncated PPM header")
    return toks, i + 1  # exactly ONE whitespace byte after maxval (spec)


def decode_ppm(blob: bytes | memoryview) -> np.ndarray:
    """Binary PPM (P6, maxval <= 255) -> (H, W, 3) uint8 RGB."""
    b = memoryview(blob)
    if len(b) < 9 or bytes(b[:2]) != b"P6":
        raise ValueError("not a P6 PPM")
    (w, h, maxval), off = _ppm_tokens(b, 3)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PPM dimensions {w}x{h}")
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    if len(b) < off + need:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(b, np.uint8, count=need, offset=off).reshape(h, w, 3)


# legal BITMAPINFOHEADER-family sizes (BITMAPCOREHEADER 12 through
# BITMAPV5HEADER 124) — a 4-byte LE match at offset 14 is structural
# evidence ASCII text can't produce (it would need "(\0\0\0" etc.)
_BMP_DIB_SIZES = frozenset({12, 40, 52, 56, 64, 108, 124})


def sniff_image(blob: bytes | memoryview) -> str | None:
    """STRICT format sniff: 'bmp' / 'ppm' / None. Two ASCII letters alone
    are not evidence ("BMW crash report" and "P6 spark plugs" are text, not
    rasters), so the sniff also requires structure ordinary text can't have:
    for BMP either the four reserved header bytes are zero (what every
    common writer emits) or the DIB header size at offset 14 is a legal
    BITMAPINFOHEADER-family value (covers writers that stamp the reserved
    words); for P6 the magic must be followed by the netpbm header grammar
    (whitespace/comments, then a width digit — exactly what decode_ppm's
    tokenizer accepts)."""
    b = memoryview(blob)
    head = bytes(b[:2])
    if head == b"BM":
        # a TRUNCATED real BMP still sniffs as bmp and fails decode loudly
        if len(b) >= 10 and bytes(b[6:10]) == b"\x00" * 4:
            return "bmp"
        if len(b) >= 18:
            (dib,) = struct.unpack_from("<I", b, 14)
            if dib in _BMP_DIB_SIZES:
                return "bmp"
        return None
    if head == b"P6" and len(b) >= 3 and b[2] in b" \t\r\n#":
        # after the magic the netpbm grammar allows whitespace and '#'
        # comments (to end-of-line) before the width digit — mirror
        # decode_ppm's tokenizer so the sniff never rejects what the
        # decoder accepts; plain text like "P6 spark plugs" fails here
        i = 2
        while i < len(b):
            if b[i] in b" \t\r\n":
                i += 1
            elif b[i] == 0x23:  # '#' comment runs to end of line
                while i < len(b) and b[i] not in b"\r\n":
                    i += 1
            else:
                break
        if i < len(b) and 0x30 <= b[i] <= 0x39:
            return "ppm"
        # header entirely whitespace/comments so far (e.g. a truncated
        # comment-first PPM): with a '#' present that is still grammar
        # evidence text lacks; bare trailing whitespace is not
        if i >= len(b) and 0x23 in bytes(b[2:]):
            return "ppm"
    return None


def decode_image(blob: bytes | memoryview) -> np.ndarray | None:
    """Decode a BMP or PPM blob to (H, W, 3) uint8 RGB; None when the blob
    sniffs as neither (callers fall back to their stub/opaque path). A blob
    that SNIFFS as an image but has a corrupt/truncated body still raises
    ValueError — that distinction ('corrupt image' vs 'not an image') is
    what scraped-media pipelines act on."""
    fmt = sniff_image(blob)
    if fmt == "bmp":
        return decode_bmp(blob)
    if fmt == "ppm":
        return decode_ppm(blob)
    return None

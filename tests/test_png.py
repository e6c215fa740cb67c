"""Vendored PNG codec tests: writer/reader round-trip, all five scanline
filters (hand-encoded IDAT), RGB/RGBA luminance, box resize, and the
unsupported-feature gates."""

import struct
import zlib

import numpy as np
import pytest

from pdx_spark.functions.png import (box_resize, is_png, read_png,
                                     to_luminance, write_png_gray)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body)))


def _png_with_filters(img: np.ndarray, filters: list[int],
                      color_type: int = 0) -> bytes:
    """Hand-encode an 8-bit PNG choosing a filter type per scanline —
    exercises the reader's filter reconstruction, which the (filter-0)
    writer never does."""
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    a = np.asarray(img, dtype=np.int32)
    h = a.shape[0]
    flat = a.reshape(h, -1)
    stride = flat.shape[1]
    prev = np.zeros(stride, dtype=np.int32)
    scan = bytearray()
    for y in range(h):
        row, f = flat[y], filters[y]
        if f == 0:
            enc = row.copy()
        elif f == 1:
            enc = row.copy()
            enc[ch:] = (row[ch:] - row[:-ch]) % 256
        elif f == 2:
            enc = (row - prev) % 256
        elif f == 3:
            enc = row.copy()
            for x in range(stride):
                left = row[x - ch] if x >= ch else 0
                enc[x] = (row[x] - ((left + prev[x]) >> 1)) % 256
        elif f == 4:
            enc = row.copy()
            for x in range(stride):
                left = row[x - ch] if x >= ch else 0
                ul = prev[x - ch] if x >= ch else 0
                p = left + prev[x] - ul
                pa, pb, pc = abs(p - left), abs(p - prev[x]), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else \
                    (prev[x] if pb <= pc else ul)
                enc[x] = (row[x] - pred) % 256
        scan += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = row
    w = a.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(scan)))
            + _chunk(b"IEND", b""))


def test_write_read_roundtrip_gray():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(13, 9), dtype=np.uint8)
    data = write_png_gray(img)
    assert is_png(data)
    assert np.array_equal(read_png(data), img)


def test_all_five_filters_reconstruct_gray():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 11), dtype=np.uint8)
    data = _png_with_filters(img, [0, 1, 2, 3, 4])
    assert np.array_equal(read_png(data), img)


def test_filters_reconstruct_rgb_and_rgba():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    assert np.array_equal(
        read_png(_png_with_filters(rgb, [4, 3, 2, 1, 0], color_type=2)), rgb)
    rgba = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    assert np.array_equal(
        read_png(_png_with_filters(rgba, [1, 4, 2, 3, 0], color_type=6)),
        rgba)


def test_luminance_weights():
    img = np.zeros((1, 3, 3), dtype=np.uint8)
    img[0, 0] = (255, 0, 0)
    img[0, 1] = (0, 255, 0)
    img[0, 2] = (0, 0, 255)
    lum = to_luminance(img)[0]
    assert np.allclose(lum, [255 * .299, 255 * .587, 255 * .114])


def test_box_resize_exact_means():
    img = np.arange(64, dtype=np.float64).reshape(8, 8)
    out = box_resize(img, 4, 4)
    assert out.shape == (4, 4)
    # each 2x2 cell mean
    want = img.reshape(4, 2, 4, 2).mean(axis=(1, 3))
    assert np.allclose(out, want)
    # non-divisible shapes still cover every pixel
    out2 = box_resize(np.ones((7, 5)), 4, 4)
    assert np.allclose(out2, 1.0)


def test_unsupported_pngs_raise():
    with pytest.raises(ValueError, match="signature"):
        read_png(b"not a png at all")
    img = np.zeros((2, 2), dtype=np.uint8)
    # 16-bit depth rejected
    deep = bytearray(write_png_gray(img))
    deep[24] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError, match="unsupported"):
        read_png(bytes(deep))
    # interlaced rejected
    inter = bytearray(write_png_gray(img))
    inter[28] = 1  # IHDR interlace byte
    with pytest.raises(ValueError, match="interlaced"):
        read_png(bytes(inter))

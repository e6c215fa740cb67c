"""Minimal pure-stdlib PNG codec (zlib + struct — no external deps).

Why vendored: the multimodal `decode_image(real=True)` path must be a
REAL decoder, but this environment ships no image libraries. PNG's
baseline format is small enough to implement exactly from the public
spec (RFC 2083): zlib-compressed scanlines, five per-line filters,
big-endian chunk framing. Supported: 8-bit depth, color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced. Anything else raises
ValueError — callers fall back to Pillow when present.

The writer emits 8-bit grayscale (filter 0, one IDAT) so tests can
round-trip real pixels without any image library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _MAGIC


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def read_png(data: bytes) -> np.ndarray:
    """data -> uint8 array, shape (H, W) for grayscale or (H, W, C).
    Alpha channels are returned as-is (callers composite or drop)."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + body + crc (crc not verified)
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8 or ctype_n not in _CHANNELS or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color_type={ctype_n})")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    ch = _CHANNELS[ctype_n]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = raw[y * (stride + 1): (y + 1) * (stride + 1)]
        ftype, cur = line[0], np.frombuffer(
            line[1:], dtype=np.uint8).astype(np.int32)
        if ftype == 0:          # None
            rec = cur
        elif ftype == 1:        # Sub
            rec = cur.copy()
            for x in range(ch, stride):
                rec[x] = (rec[x] + rec[x - ch]) & 0xFF
        elif ftype == 2:        # Up
            rec = (cur + prev) & 0xFF
        elif ftype == 3:        # Average
            rec = cur.copy()
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:        # Paeth
            rec = cur.copy()
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                ul = prev[x - ch] if x >= ch else 0
                rec[x] = (rec[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def write_png_gray(img: np.ndarray) -> bytes:
    """uint8 (H, W) -> 8-bit grayscale non-interlaced PNG bytes."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("write_png_gray wants (H, W) uint8")
    h, w = a.shape

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    scan = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan))
            + chunk(b"IEND", b""))


def to_luminance(img: np.ndarray) -> np.ndarray:
    """(H, W[, C]) uint8 -> (H, W) float64 luminance, ITU-R 601 weights
    (the same formula Pillow's convert('L') documents). Alpha ignored."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 2:
        return a
    if a.shape[2] == 2:                       # gray + alpha
        return a[:, :, 0]
    return (a[:, :, 0] * 299 + a[:, :, 1] * 587 + a[:, :, 2] * 114) / 1000.0


def box_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(H, W) -> (out_h, out_w) by area (box) averaging over near-equal
    row/col bins — deterministic, kernel-free downsample."""
    a = np.asarray(img, dtype=np.float64)
    h, w = a.shape
    ry = np.linspace(0, h, out_h + 1).round().astype(int)
    rx = np.linspace(0, w, out_w + 1).round().astype(int)
    out = np.empty((out_h, out_w), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            cell = a[ry[i]:max(ry[i + 1], ry[i] + 1),
                     rx[j]:max(rx[j + 1], rx[j] + 1)]
            out[i, j] = cell.mean()
    return out

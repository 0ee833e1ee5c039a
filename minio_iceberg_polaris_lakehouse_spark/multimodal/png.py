"""Pure-stdlib+numpy PNG codec for the multimodal decode kernels.

Built from the PUBLIC PNG specification (RFC 2083 / W3C PNG): 8-byte
signature, length-prefixed CRC-checked chunks (IHDR/IDAT/IEND), zlib
deflate of filtered scanlines, and the five per-row filter types
(None/Sub/Up/Average/Paeth). Supports 8-bit grayscale (color type 0) and
8-bit RGB (color type 2) — the shapes the engine's image kernels emit and
consume. The container ships no image libraries, so this ~150-line codec
makes the X4 decode path REAL (tests cross-validate both directions
against the independent Java ImageIO implementation in Spark's JVM).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 grayscale or (h, w, 3) uint8 RGB array.
    Scanlines use filter type 0 (None) — simple, spec-valid, and zlib
    still compresses the typical synthetic content well."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type = 0
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type = 2
        h, w = arr.shape[:2]
    else:
        raise ValueError(f"unsupported pixel shape {arr.shape}")
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(blob: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale/RGB PNG to a uint8 array ((h, w) or
    (h, w, 3)). Verifies the signature and every chunk CRC; applies all
    five scanline filters; interlacing (Adam7) is not supported."""
    if blob[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        typ = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", blob[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r}: CRC mismatch")
        if typ == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8 or color_type not in (0, 2):
                raise ValueError(
                    f"unsupported PNG: bit depth {bit_depth}, color type {color_type}"
                )
            if interlace:
                raise ValueError("interlaced PNG not supported")
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = 1 if color_type == 0 else 3
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT length mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        row = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                row[i] = (row[i] + row[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = row
        prev = row
    arr = np.frombuffer(bytes(out), dtype=np.uint8)
    return arr.reshape((height, width) if channels == 1 else (height, width, 3))


def mean_luma(pixels: np.ndarray) -> int:
    """Integer mean luma: grayscale mean, or ITU-R BT.601 luma for RGB."""
    if pixels.ndim == 2:
        return int(pixels.mean())
    r, g, b = pixels[..., 0], pixels[..., 1], pixels[..., 2]
    return int((0.299 * r + 0.587 * g + 0.114 * b).mean())


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index maps — vectorized, no
    per-pixel Python loop."""
    sh, sw = pixels.shape[:2]
    rows = (np.arange(height) * sh // height).clip(0, sh - 1)
    cols = (np.arange(width) * sw // width).clip(0, sw - 1)
    return pixels[rows][:, cols]

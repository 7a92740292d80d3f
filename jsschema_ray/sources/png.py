"""Minimal pure-Python PNG codec (RGB8, filter 0) built on zlib + numpy.

The container has no image libraries (no PIL), so the BASELINE's
decoded-image invariant (PSNR >= 40 dB / lossless byte-equal; BASELINE.json
input_hint) is exercised with REAL PNG bytes produced and parsed here —
the PNG format is public (RFC 2083). Lossy codecs (JPEG/WebP) are stubbed
at the decode step (stages/multimodal.py) with the Ray-side plumbing kept
real, as the driver instructions direct.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """RGB8 HxWx3 uint8 array -> PNG bytes (color type 2, filter 0)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_png expects HxWx3 uint8")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 (None) per scanline
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes, verify_crc: bool = False) -> np.ndarray:
    """PNG bytes -> RGB8 HxWx3 uint8 array. Supports what encode_png emits
    (8-bit RGB, filter 0); anything else raises ValueError."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    w = h = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        if verify_crc:
            (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
            if crc != (zlib.crc32(tag + payload) & 0xFFFFFFFF):
                raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", payload)
            if (depth, ctype, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise ValueError("unsupported PNG variant (need 8-bit RGB)")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = 1 + w * 3
    if len(raw) != h * stride:
        raise ValueError("bad decompressed size")
    raw = raw.reshape(h, stride)
    if (raw[:, 0] != 0).any():
        raise ValueError("unsupported PNG filter (only 0/None)")
    return raw[:, 1:].reshape(h, w, 3).copy()


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)

"""Pure-Python/numpy PNG codec (RFC 2083 / ISO 15948).

PNG's compression layer is DEFLATE, which the Python standard library
provides for real (``zlib``) — so unlike JPEG there is nothing to
hand-roll beyond the container: chunk framing with CRC-32, scanline
filters, and pixel layout. This module implements:

- encode: 8-bit grayscale, filter type 0, single IDAT — a fully
  standard PNG any viewer opens;
- decode: 8-bit greyscale / truecolor (RGB) / truecolor+alpha /
  greyscale+alpha, all five scanline filters (None/Sub/Up/Average/
  Paeth), non-interlaced. Color collapses to luma via the Rec.601
  weights so downstream features are a single grid.

Interlaced (Adam7), palette, and sub-byte depths raise
``NotImplementedError`` — gated, not faked, same policy as
``functions/jpeg.py``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_gray(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode a 2-D uint8 array as an 8-bit grayscale PNG."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2 or a.size == 0:
        raise ValueError("encode_gray expects a non-empty 2-D array")
    h, w = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type None per scanline
    raw[:, 1:] = a
    idat = zlib.compress(raw.tobytes(), compress_level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse the per-scanline filters; returns (h, w*ch) uint8."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub: per-channel prefix sum mod 256
            # cur[x] = (line[x] + cur[x-ch]) & 0xFF unrolls to a running
            # sum down each channel column; int64 cumsum is exact, and a
            # single final mask equals masking every step (mod-add
            # associativity) — no per-byte Python loop.
            cur = np.cumsum(line.reshape(-1, ch), axis=0, dtype=np.int64).reshape(
                stride
            ) & 0xFF
        elif ftype in (3, 4):  # Average / Paeth need a sequential left scan
            cur = np.zeros(stride, np.int64)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                if ftype == 3:
                    cur[x] = (line[x] + (left + prev[x]) // 2) & 0xFF
                else:
                    up = prev[x]
                    ul = prev[x - ch] if x >= ch else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                    cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_gray(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a uint8 luma grid.

    Greyscale passes through; RGB/RGBA collapse via Rec.601
    (0.299 R + 0.587 G + 0.114 B); alpha is ignored. Palette,
    interlace, and 1/2/4/16-bit depths raise ``NotImplementedError``.
    Structurally malformed streams surface as ``ValueError`` (same
    classification contract as jpeg.decode_gray: never a raw
    struct/zlib/index error from parse internals, so the decode UDF
    can report per-row).
    """
    try:
        return _decode_gray_impl(data)
    except (KeyError, IndexError, struct.error, OverflowError, zlib.error) as exc:
        raise ValueError(f"malformed PNG stream: {exc!r}") from exc


def _decode_gray_impl(data: bytes) -> np.ndarray:
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = 0
    ctype = -1
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth}")
            if ctype == 3:
                raise NotImplementedError("palette PNG")
            if ctype not in _CHANNELS:
                raise ValueError(f"bad PNG color type {ctype}")
            if interlace:
                raise NotImplementedError("Adam7 interlaced PNG")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if not (w and h) or ctype < 0:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (w * ch + 1):
        raise ValueError("PNG pixel data size mismatch")
    px = _unfilter(raw, h, w, ch).reshape(h, w, ch)
    if ctype == 0:
        return px[:, :, 0].copy()
    if ctype == 4:  # grey + alpha
        return px[:, :, 0].copy()
    rgb = px[:, :, :3].astype(np.float64)
    luma = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    return np.clip(np.round(luma), 0, 255).astype(np.uint8)

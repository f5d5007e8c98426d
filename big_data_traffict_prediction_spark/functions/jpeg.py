"""Pure-numpy baseline JPEG codec (grayscale + YCbCr color, ITU-T T.81).

The container this repo runs in has no image libraries, and the
multimodal operators gate compressed formats behind
``NotImplementedError`` rather than fake them. This module closes the
gap for JPEG the honest way: a REAL baseline encoder/decoder built
from the public spec (ITU-T T.81 / ISO 10918-1) with the standard
Annex K quantization + Huffman tables — output is decodable by any
stock viewer, and the decoder reads any 1- or 3-component baseline
sequential JPEG with an interleaved scan, whoever produced it.

Scope (all honestly gated, never faked):
- encode: 8-bit grayscale (``encode_gray``) and RGB color
  (``encode_color`` — YCbCr Rec.601 full range per JFIF, 4:4:4 or
  4:2:0 chroma subsampling, Annex-K luma tables in slot 0 + chroma
  tables in slot 1), baseline DCT, JFIF container, quality scaling
  per the classic libjpeg 5000/q | 200−2q formula, optional restart
  markers (DRI/RSTn).
- decode: baseline sequential (SOF0) AND progressive (SOF2 —
  spectral selection, successive approximation, DC/AC first +
  refinement scans, EOB runs, per T.81 Annex G), 1 or 3 components,
  any sampling factors ≤ 4 — integer AND non-integer ratios, via a
  nearest-neighbor index-map chroma upsampler — restart intervals
  supported; 8-bit extended sequential
  (SOF1) decodes on the baseline path; multi-scan baseline streams —
  one Ns=1 scan per component (libjpeg's non-interleaved mode) or
  partially-interleaved subsets (1 < Ns < Nf, e.g. the classic
  Y-then-CbCr layout) — decode through the same shared coefficient
  store the progressive path uses. ``decode_gray`` returns the
  (luma) Y plane; ``decode_rgb`` full color. 12-bit precision,
  lossless / arithmetic-coded, and 4-component (CMYK) streams raise
  ``NotImplementedError``.
- progressive encode (``encode_progressive``): libjpeg-style scan
  script (DC first w/ point transform, spectral-split AC first scans,
  AC refinement, DC refinement) for grayscale and YCbCr color —
  exists so the decoder can be property-tested against streams with
  every scan kind.

Everything block-parallel is vectorized numpy (DCT/quantization run
as one einsum over all blocks); only the entropy coder is a per-block
Python loop, which is fine for the Arrow-batch sizes the multimodal
operators feed it (thumbnails and small frames), and the Spark-side
plumbing keeps the whole codec inside ``mapInPandas`` workers.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------- standard tables
# ITU-T T.81 Annex K.1: luminance quantization (zigzag-natural order).
STD_LUMA_QUANT = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3: luminance DC Huffman (BITS, HUFFVAL).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# Annex K.5: luminance AC Huffman.
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Annex K.2: chrominance quantization (natural order).
STD_CHROMA_QUANT = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.4: chrominance DC Huffman (BITS, HUFFVAL).
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

# Annex K.6: chrominance AC Huffman.
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Zigzag scan order (natural index for each zigzag position).
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal 8-point DCT-II basis: forward D = C @ B @ C.T.
_K = np.arange(8)
_DCT_C = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) * np.where(
    _K[:, None] == 0, np.sqrt(1 / 8), np.sqrt(2 / 8)
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(DC_BITS, DC_VALS)
_AC_ENC = _canonical_codes(AC_BITS, AC_VALS)
_DC_CHROMA_ENC = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
_AC_CHROMA_ENC = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def quant_table(quality: int) -> np.ndarray:
    """Annex-K luminance table scaled by the classic quality formula."""
    return _scaled_quant(STD_LUMA_QUANT, quality)


def chroma_quant_table(quality: int) -> np.ndarray:
    """Annex-K chrominance table scaled by the same quality formula."""
    return _scaled_quant(STD_CHROMA_QUANT, quality)


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def byte_align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad per spec

    def emit_marker(self, marker: int) -> None:
        """Byte-align and append a raw marker (markers are NOT stuffed)."""
        self.byte_align()
        self.buf.append(0xFF)
        self.buf.append(marker)

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude(v: int, size: int) -> int:
    """One's-complement amplitude bits (negative values offset)."""
    return v if v >= 0 else v + (1 << size) - 1


def _zigzag_blocks(plane: np.ndarray, q: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Pad a 2-D uint8 plane (edge mode) to ph×pw, forward-DCT +
    quantize every 8×8 block at once, return the (by, bx, 64) zigzag
    coefficient grid in row-major block order."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64)
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(
        -1, 8, 8
    )
    # Vectorized forward DCT + quantization over ALL blocks at once.
    dct = np.einsum("ux,nxy,vy->nuv", _DCT_C, blocks - 128.0, _DCT_C)
    coefs = np.round(dct / q).astype(np.int64)
    return coefs.reshape(-1, 64)[:, ZIGZAG].reshape(ph // 8, pw // 8, 64)


def _emit_block(bw: _BitWriter, blk: np.ndarray, prev_dc: int, dc_enc, ac_enc) -> int:
    """Huffman-encode one zigzag block; returns the new DC predictor."""
    diff = int(blk[0]) - prev_dc
    size = _category(diff)
    code, length = dc_enc[size]
    bw.write(code, length)
    if size:
        bw.write(_amplitude(diff, size), size)
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last = nz[-1] + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_enc[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size = _category(v)
        c, ln = ac_enc[(run << 4) | size]
        bw.write(c, ln)
        bw.write(_amplitude(v, size), size)
        run = 0
    if last < 63:
        c, ln = ac_enc[0x00]  # EOB
        bw.write(c, ln)
    return int(blk[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


_APP0_JFIF = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"


def _gray_headers(q: np.ndarray, h: int, w: int, sof_marker: int) -> bytes:
    """SOI through the Huffman tables for a 1-component stream — the
    single source of truth shared by the baseline and progressive
    encoders (their bit-for-bit decode equality depends on identical
    tables/headers)."""
    return (
        b"\xff\xd8"
        + _seg(0xFFE0, _APP0_JFIF)
        + _seg(0xFFDB, b"\x00" + bytes(q.reshape(64)[ZIGZAG].astype(np.uint8)))
        + _seg(sof_marker, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
        + _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
        + _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    )


def _color_headers(
    qy: np.ndarray, qc: np.ndarray, h: int, w: int, samp_y: int, sof_marker: int
) -> bytes:
    """SOI through the Huffman tables for a 3-component YCbCr stream."""
    return (
        b"\xff\xd8"
        + _seg(0xFFE0, _APP0_JFIF)
        + _seg(0xFFDB, b"\x00" + bytes(qy.reshape(64)[ZIGZAG].astype(np.uint8)))
        + _seg(0xFFDB, b"\x01" + bytes(qc.reshape(64)[ZIGZAG].astype(np.uint8)))
        + _seg(
            sof_marker,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        + _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
        + _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
        + _seg(0xFFC4, b"\x01" + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS))
        + _seg(0xFFC4, b"\x11" + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS))
    )


def _color_coef_grids(a: np.ndarray, quality: int, subsampling: str):
    """Shared color preprocessing: RGB -> YCbCr -> subsample ->
    quantized zigzag block grids. Returns
    (y_zz, [cb_zz, cr_zz], mcux, mcuy, hs, vs, qy, qc)."""
    factors = {"4:2:0": (2, 2), "4:4:4": (1, 1)}
    if subsampling not in factors:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    hs, vs = factors[subsampling]
    h, w = a.shape[:2]
    y, cb, cr = _rgb_to_ycbcr(a)
    qy, qc = quant_table(quality), chroma_quant_table(quality)
    mcux, mcuy = -(-w // (8 * hs)), -(-h // (8 * vs))
    y_zz = _zigzag_blocks(
        np.clip(np.round(y), 0, 255).astype(np.uint8), qy, mcuy * 8 * vs, mcux * 8 * hs
    )
    chroma = [
        _zigzag_blocks(
            np.clip(np.round(_box_subsample(p, vs, hs)), 0, 255).astype(np.uint8),
            qc,
            mcuy * 8,
            mcux * 8,
        )
        for p in (cb, cr)
    ]
    return y_zz, chroma, mcux, mcuy, hs, vs, qy, qc


def encode_gray(arr: np.ndarray, quality: int = 75, restart_interval: int = 0) -> bytes:
    """Encode a 2-D uint8 array as a baseline JFIF JPEG.

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every that-many MCUs (DC predictor reset, byte-aligned) — the
    error-resilience feature camera firmware JPEGs commonly use."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2 or a.size == 0:
        raise ValueError("encode_gray expects a non-empty 2-D array")
    h, w = a.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    q = quant_table(quality)
    zz = _zigzag_blocks(a, q, ph, pw).reshape(-1, 64)

    bw = _BitWriter()
    prev_dc = 0
    for i, blk in enumerate(zz):
        if restart_interval and i and i % restart_interval == 0:
            bw.emit_marker(0xD0 + ((i // restart_interval - 1) % 8))
            prev_dc = 0
        prev_dc = _emit_block(bw, blk, prev_dc, _DC_ENC, _AC_ENC)
    entropy = bw.flush()

    out = _gray_headers(q, h, w, 0xFFC0)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))  # DRI
    out += _seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += entropy
    out += b"\xff\xd9"  # EOI
    return out


# Rec.601 full-range RGB <-> YCbCr (the JFIF color space).
def _rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    y, cb, cr = (p.astype(np.float64) for p in (y, cb, cr))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _box_subsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Mean-pool by (fy, fx), edge-padding ragged borders first."""
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def encode_color(
    arr: np.ndarray,
    quality: int = 75,
    subsampling: str = "4:2:0",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline JFIF JPEG.

    YCbCr (Rec.601 full range per JFIF), Annex-K luminance tables for
    Y (quant/Huffman slot 0) and chrominance tables for Cb/Cr (slot
    1). ``subsampling`` is ``"4:2:0"`` (2×2 Y blocks + one Cb + one Cr
    per 16×16 MCU — the overwhelmingly common camera layout) or
    ``"4:4:4"`` (no chroma subsampling). ``restart_interval`` counts
    MCUs, resetting all three DC predictors."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3 or a.size == 0:
        raise ValueError("encode_color expects a non-empty (h, w, 3) array")
    h, w = a.shape[:2]
    # Y padded to the full MCU grid; chroma subsampled then padded to
    # its own 8-multiple grid (mcux × mcuy blocks).
    y_zz, chroma, mcux, mcuy, hs, vs, qy, qc = _color_coef_grids(
        a, quality, subsampling
    )

    bw = _BitWriter()
    prev = [0, 0, 0]  # DC predictors: Y, Cb, Cr
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.emit_marker(0xD0 + ((mcu_i // restart_interval - 1) % 8))
                prev = [0, 0, 0]
            for v in range(vs):
                for u in range(hs):
                    prev[0] = _emit_block(
                        bw, y_zz[my * vs + v, mx * hs + u], prev[0], _DC_ENC, _AC_ENC
                    )
            for ci, czz in enumerate(chroma, start=1):
                prev[ci] = _emit_block(
                    bw, czz[my, mx], prev[ci], _DC_CHROMA_ENC, _AC_CHROMA_ENC
                )
            mcu_i += 1
    entropy = bw.flush()

    out = _color_headers(qy, qc, h, w, (hs << 4) | vs, 0xFFC0)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0x3F, 0]))  # SOS
    out += entropy
    out += b"\xff\xd9"  # EOI
    return out


# ----------------------------------------------- progressive encoder


def _emit_ac_first_block(
    bw: _BitWriter, blk: np.ndarray, ss: int, se: int, al: int, ac_enc
) -> None:
    """AC first-pass block (G.1.2.2 encoder side): point-transformed
    magnitudes, ZRL for 16-zero runs, a single-block EOB0 when the band
    ends early (this encoder never accumulates multi-block EOB runs —
    valid, just less compact)."""
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        if v < 0:
            t = -t
        while r > 15:
            c, ln = ac_enc[0xF0]
            bw.write(c, ln)
            r -= 16
        size = _category(t)
        c, ln = ac_enc[(r << 4) | size]
        bw.write(c, ln)
        bw.write(_amplitude(t, size), size)
        r = 0
    if r:
        c, ln = ac_enc[0x00]  # EOB0: this block only
        bw.write(c, ln)


def _emit_ac_refine_block(
    bw: _BitWriter, blk: np.ndarray, ss: int, se: int, al: int, ac_enc
) -> None:
    """AC refinement block (G.1.2.3 encoder side): newly-significant
    coefficients as run/1 + sign bit; previously-nonzero coefficients
    contribute buffered correction bits emitted after the next symbol
    (the interleaving the decoder's forward walk expects)."""
    pending: list[int] = []
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        while r > 15:
            c, ln = ac_enc[0xF0]
            bw.write(c, ln)
            for b in pending:
                bw.write(b, 1)
            pending = []
            r -= 16
        if t > 1:  # already nonzero at the previous precision
            pending.append(t & 1)
            continue
        c, ln = ac_enc[(r << 4) | 1]
        bw.write(c, ln)
        bw.write(1 if v > 0 else 0, 1)
        for b in pending:
            bw.write(b, 1)
        pending = []
        r = 0
    if r or pending:
        c, ln = ac_enc[0x00]
        bw.write(c, ln)
        for b in pending:
            bw.write(b, 1)


def _sos_payload(
    comp_sel: list[tuple[int, int, int]], ss: int, se: int, ah: int, al: int
) -> bytes:
    body = bytes([len(comp_sel)])
    for cid, td, ta in comp_sel:
        body += bytes([cid, (td << 4) | ta])
    return body + bytes([ss, se, (ah << 4) | al])


def encode_progressive(
    arr: np.ndarray,
    quality: int = 75,
    subsampling: str = "4:2:0",
    restart_interval: int = 0,
) -> bytes:
    """Encode a 2-D grayscale or (h, w, 3) RGB uint8 array as a
    PROGRESSIVE (SOF2) JFIF JPEG, libjpeg-style scan script: DC first
    pass at Al=1, spectral-split AC first passes at Al=1, AC
    refinement to Al=0, DC refinement last. Decoding it recovers
    exactly the same quantized coefficients as the baseline encoder at
    the same quality — the entropy layer is lossless — so
    ``decode_gray(encode_progressive(x))`` equals
    ``decode_gray(encode_gray(x))`` bit-for-bit.
    ``restart_interval`` (grayscale path) emits RSTn markers every
    that-many blocks within EVERY scan — DC predictors and EOB runs
    reset per spec, exercising the restart machinery of progressive
    decoders."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2 and a.size:
        return _encode_progressive_gray(a, quality, restart_interval)
    if a.ndim == 3 and a.shape[2] == 3 and a.size:
        if restart_interval:
            raise ValueError("restart_interval supported on the grayscale path")
        return _encode_progressive_color(a, quality, subsampling)
    raise ValueError("encode_progressive expects 2-D gray or (h, w, 3) RGB")


def _rst_markers(bw: _BitWriter, i: int, ri: int) -> None:
    """Emit the byte-aligned RSTn marker before block ``i`` when a
    restart interval ``ri`` is active (same cadence as encode_gray)."""
    if ri and i and i % ri == 0:
        bw.emit_marker(0xD0 + ((i // ri - 1) % 8))


def _encode_progressive_gray(a: np.ndarray, quality: int, ri: int = 0) -> bytes:
    h, w = a.shape
    nby, nbx = -(-h // 8), -(-w // 8)
    q = quant_table(quality)
    zz = _zigzag_blocks(a, q, nby * 8, nbx * 8)  # (nby, nbx, 64)
    flat = zz.reshape(-1, 64)

    out = _gray_headers(q, h, w, 0xFFC2)
    if ri:
        out += _seg(0xFFDD, struct.pack(">H", ri))  # DRI

    # scan 1: DC first, point transform Al=1 (arithmetic shift per G.1.2.1)
    bw = _BitWriter()
    pred = 0
    for i, blk in enumerate(flat):
        if ri and i and i % ri == 0:
            _rst_markers(bw, i, ri)
            pred = 0
        t = int(blk[0]) >> 1
        diff = t - pred
        pred = t
        size = _category(diff)
        c, ln = _DC_ENC[size]
        bw.write(c, ln)
        if size:
            bw.write(_amplitude(diff, size), size)
    out += _seg(0xFFDA, _sos_payload([(1, 0, 0)], 0, 0, 0, 1)) + bw.flush()

    # scans 2+3: AC first passes, spectral split, Al=1
    for ss, se in ((1, 5), (6, 63)):
        bw = _BitWriter()
        for i, blk in enumerate(flat):
            _rst_markers(bw, i, ri)  # EOBRUN is already flushed per block
            _emit_ac_first_block(bw, blk, ss, se, 1, _AC_ENC)
        out += _seg(0xFFDA, _sos_payload([(1, 0, 0)], ss, se, 0, 1)) + bw.flush()

    # scan 4: AC refinement to full precision
    bw = _BitWriter()
    for i, blk in enumerate(flat):
        _rst_markers(bw, i, ri)
        _emit_ac_refine_block(bw, blk, 1, 63, 0, _AC_ENC)
    out += _seg(0xFFDA, _sos_payload([(1, 0, 0)], 1, 63, 1, 0)) + bw.flush()

    # scan 5: DC refinement — one raw bit per block
    bw = _BitWriter()
    for i, blk in enumerate(flat):
        _rst_markers(bw, i, ri)
        bw.write(int(blk[0]) & 1, 1)
    out += _seg(0xFFDA, _sos_payload([(1, 0, 0)], 0, 0, 1, 0)) + bw.flush()
    return out + b"\xff\xd9"


def _encode_progressive_color(a: np.ndarray, quality: int, subsampling: str) -> bytes:
    h, w = a.shape[:2]
    y_zz, chroma, mcux, mcuy, hs, vs, qy, qc = _color_coef_grids(
        a, quality, subsampling
    )
    grids = [y_zz, *chroma]
    samps = [(hs, vs), (1, 1), (1, 1)]
    # each component's own (non-interleaved) grid for the AC scans
    own = [_comp_block_dims(hi, vi, hs, vs, h, w) for hi, vi in samps]

    out = _color_headers(qy, qc, h, w, (hs << 4) | vs, 0xFFC2)

    dc_encs = [_DC_ENC, _DC_CHROMA_ENC, _DC_CHROMA_ENC]
    ac_encs = [_AC_ENC, _AC_CHROMA_ENC, _AC_CHROMA_ENC]
    all_sel = [(1, 0, 0), (2, 1, 1), (3, 1, 1)]

    # scan 1: DC first, all components interleaved over the MCU grid
    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, ((hi, vi), grid) in enumerate(zip(samps, grids)):
                for v in range(vi):
                    for u in range(hi):
                        t = int(grid[my * vi + v, mx * hi + u, 0]) >> 1
                        diff = t - preds[ci]
                        preds[ci] = t
                        size = _category(diff)
                        c, ln = dc_encs[ci][size]
                        bw.write(c, ln)
                        if size:
                            bw.write(_amplitude(diff, size), size)
    out += _seg(0xFFDA, _sos_payload(all_sel, 0, 0, 0, 1)) + bw.flush()

    # AC first passes (Al=1): luma spectrally split, chroma full band
    ac_script = [(0, 1, 5), (1, 1, 63), (2, 1, 63), (0, 6, 63)]
    for ci, ss, se in ac_script:
        nby, nbx = own[ci]
        bw = _BitWriter()
        for cy in range(nby):
            for cx in range(nbx):
                _emit_ac_first_block(bw, grids[ci][cy, cx], ss, se, 1, ac_encs[ci])
        out += _seg(0xFFDA, _sos_payload([all_sel[ci]], ss, se, 0, 1)) + bw.flush()

    # AC refinement passes to Al=0
    for ci in (0, 1, 2):
        nby, nbx = own[ci]
        bw = _BitWriter()
        for cy in range(nby):
            for cx in range(nbx):
                _emit_ac_refine_block(bw, grids[ci][cy, cx], 1, 63, 0, ac_encs[ci])
        out += _seg(0xFFDA, _sos_payload([all_sel[ci]], 1, 63, 1, 0)) + bw.flush()

    # final scan: DC refinement, interleaved raw bits
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for (hi, vi), grid in zip(samps, grids):
                for v in range(vi):
                    for u in range(hi):
                        bw.write(int(grid[my * vi + v, mx * hi + u, 0]) & 1, 1)
    out += _seg(0xFFDA, _sos_payload(all_sel, 0, 0, 1, 0)) + bw.flush()
    return out + b"\xff\xd9"


# ----------------------------------------------------------- decoder


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy stream")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                # stuffed zero byte follows a literal 0xFF
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("unexpected marker in entropy stream")
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Discard pad bits, consume the next RSTn marker (byte-aligned
        per spec)."""
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


def _decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol decode map."""
    out: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_gray(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/8-bit SOF1) or progressive (SOF2) JPEG
    to a uint8 luma grid.

    Single-component streams pass through; 3-component (YCbCr) color
    streams return the upsampled Y plane — exactly the Rec.601 luma,
    mirroring png.decode_gray's color collapse. Restart-interval
    (DRI/RSTn) streams are fully supported, in progressive scans too;
    12-bit precision, lossless/arithmetic-coded, 4-component (CMYK)
    and non-interleaved multi-scan *baseline* streams raise
    ``NotImplementedError`` — gated, not faked. Structurally malformed
    foreign streams (truncated segments, references to undeclared
    tables, garbage lengths, invalid scan headers) surface as
    ``ValueError`` — never raw ``KeyError``/``IndexError``/
    ``struct.error`` from parse internals, so a corrupt blob in a
    media column fails with a classifiable error the decode UDF can
    report per-row.
    """
    planes, h, w = _decode_baseline(data)
    return planes[0]  # 1-comp: the image; 3-comp: Y = Rec.601 luma


def decode_rgb(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/8-bit SOF1) or progressive (SOF2) JPEG
    to (h, w, 3) uint8 RGB.

    3-component streams convert YCbCr→RGB (Rec.601 full range, the
    JFIF mapping); single-component streams replicate the gray plane
    across channels. Same gates/errors as ``decode_gray``."""
    planes, h, w = _decode_baseline(data)
    if len(planes) == 1:
        return np.repeat(planes[0][:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(*planes)


def _decode_baseline(data: bytes) -> tuple[list[np.ndarray], int, int]:
    """Shared parse: full-resolution uint8 planes (1 → gray, 3 →
    Y/Cb/Cr in SOF order, chroma upsampled by replication) plus h, w."""
    try:
        return _decode_impl(data)
    except (KeyError, IndexError, struct.error, OverflowError) as exc:
        raise ValueError(f"malformed JPEG stream: {exc!r}") from exc


def _reconstruct(
    comps: list[tuple[int, int, int, int]],
    per_comp: list[np.ndarray],
    qtables: dict[int, np.ndarray],
    mcux: int,
    mcuy: int,
    hmax: int,
    vmax: int,
    h: int,
    w: int,
) -> list[np.ndarray]:
    """Natural-order (n_blocks, 64) coefficient grids -> uint8 planes:
    dequantize, inverse DCT, reassemble each component's block grid,
    crop to its own resolution, upsample to full by replication."""
    planes = []
    for (cid, hi, vi, tq), blocks in zip(comps, per_comp):
        deq = blocks.reshape(-1, 8, 8) * qtables[tq]
        pix = np.einsum(
            "xu,nuv,yv->nxy", _DCT_C.T, deq.astype(np.float64), _DCT_C.T
        )
        pix = np.clip(np.round(pix + 128.0), 0, 255).astype(np.uint8)
        by, bx = mcuy * vi, mcux * hi
        grid = pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(
            by * 8, bx * 8
        )
        # crop to the component's own resolution, then upsample to
        # full resolution by nearest-neighbor INDEX MAP: out[y, x] =
        # plane[y·vi // vmax, x·hi // hmax]. For integer ratios this
        # is bit-identical to the old np.repeat replication
        # (y // (vmax/vi) == y·vi // vmax when vi | vmax — pinned by
        # test), and it is exact for NON-integer ratios too (e.g.
        # 3:2), so no sampling-factor combination needs a gate; T.81
        # deliberately leaves the upsampling filter to the decoder.
        ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
        plane = grid[:ch, :cw]
        if vi != vmax or hi != hmax:
            ys = (np.arange(h, dtype=np.int64) * vi) // vmax
            xs = (np.arange(w, dtype=np.int64) * hi) // hmax
            plane = plane[ys][:, xs]
        planes.append(plane[:h, :w])
    return planes


def _decode_impl(data: bytes) -> tuple[list[np.ndarray], int, int]:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    comps: list[tuple[int, int, int, int]] = []  # (id, hi, vi, tq)
    dri = 0
    progressive = False
    coef: list[np.ndarray] | None = None  # per comp (by, bx, 64) ZIGZAG order
    seq_seen: set[int] = set()  # comp indices already scanned (multi-scan baseline)
    scans_seen = 0
    hmax = vmax = mcux = mcuy = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: any marker may be preceded by any number of
        # 0xFF fill bytes — skip them or a padded stream misreads the
        # fill byte itself as a (length-bearing) marker.
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        (seg_len,) = struct.unpack_from(">H", data, pos)
        payload = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq > 1:
                    raise ValueError(f"invalid DQT precision field {pq}")
                if pq:
                    # Pq=1: 16-bit big-endian entries. Nominally paired
                    # with 12-bit samples (T.81 B.2.4.1), but real
                    # 8-bit crawl files carry them too (libjpeg
                    # accepts); dequantization is precision-agnostic,
                    # so decode them rather than gate the whole file.
                    zz = (
                        np.frombuffer(payload, ">u2", 64, p + 1)
                        .astype(np.int64)
                    )
                else:
                    zz = np.frombuffer(payload, np.uint8, 64, p + 1).astype(
                        np.int64
                    )
                nat = np.empty(64, np.int64)
                nat[ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
                p += 1 + (128 if pq else 64)
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(tc, th)] = _decode_tree(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):
            # SOF0 baseline / SOF1 extended sequential / SOF2 progressive.
            # An 8-bit-precision SOF1 stream is Huffman-baseline-
            # compatible (extended adds only 12-bit precision and two
            # extra table slots), so it decodes on the SOF0 path;
            # 12-bit stays gated below.
            progressive = marker == 0xC2
            prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit sample precision")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG (only grayscale and YCbCr)"
                )
            if len(payload) < 6 + 3 * ncomp:
                raise ValueError("truncated SOF segment")
            comps = [
                (payload[6 + 3 * i], payload[7 + 3 * i] >> 4,
                 payload[7 + 3 * i] & 0xF, payload[8 + 3 * i])
                for i in range(ncomp)
            ]
            if any(hi < 1 or vi < 1 or hi > 4 or vi > 4 for _, hi, vi, _ in comps):
                raise ValueError("invalid sampling factors")
            if not (w and h):
                raise ValueError("zero image dimensions")
            hmax = max(hi for _, hi, _, _ in comps)
            vmax = max(vi for _, _, vi, _ in comps)
            # non-integer chroma ratios (e.g. 3:2) decode via the
            # nearest-neighbor index map in _reconstruct — no gate
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            if progressive:
                # persistent coefficient store, filled scan by scan;
                # sized to the full interleaved MCU grid (a superset of
                # each component's own non-interleaved grid)
                coef = [
                    np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
                    for _, hi, vi, _ in comps
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("non-baseline JPEG (lossless/arithmetic)")
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            (dri,) = struct.unpack(">H", payload)
        elif marker == 0xDA:  # SOS → entropy data follows
            if not comps:
                raise ValueError("SOS before SOF")
            if progressive:
                end = _entropy_end(data, pos)
                _progressive_scan(
                    data[pos:end], payload, comps, coef, htables,
                    mcux, mcuy, hmax, vmax, h, w, dri,
                )
                scans_seen += 1
                pos = end
                continue
            ns = payload[0]
            if ns != len(comps):
                # T.81 A.2.2/A.2.3: a sequential frame may carry its
                # components across SEVERAL scans — one non-interleaved
                # (Ns=1) scan per component (libjpeg's non-interleaved
                # baseline mode), or partially-interleaved scans
                # grouping a subset (the classic Y-then-CbCr layout).
                # Blocks land in the same interleaved-superset
                # coefficient store the progressive path uses, and
                # reconstruction happens once every component has been
                # scanned.
                if ns > 1:
                    # partially-interleaved: the scan's components
                    # interleave per MCU with their OWN sampling
                    # factors on the FRAME's MCU grid (T.81 A.2.3);
                    # restart intervals count MCUs.
                    if coef is None:
                        coef = [
                            np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
                            for _, hi, vi, _ in comps
                        ]
                    idxs: list[int] = []
                    scan = []
                    for i in range(ns):
                        cid, tsel = payload[1 + 2 * i], payload[2 + 2 * i]
                        ci = next(
                            (k for k, c in enumerate(comps) if c[0] == cid),
                            None,
                        )
                        if ci is None:
                            raise ValueError(
                                f"scan references unknown component {cid}"
                            )
                        if ci in seq_seen or ci in idxs:
                            raise ValueError(
                                f"duplicate sequential scan for component {cid}"
                            )
                        idxs.append(ci)
                        _, hi, vi, _ = comps[ci]
                        scan.append(
                            (
                                htables[(0, tsel >> 4)],
                                htables[(1, tsel & 0xF)],
                                hi,
                                vi,
                            )
                        )
                    end = _entropy_end(data, pos)
                    per = _decode_entropy(data[pos:end], scan, mcux, mcuy, dri)
                    for ci, nat in zip(idxs, per):
                        _, hi, vi, _ = comps[ci]
                        # store keeps zigzag order; _decode_entropy
                        # emits natural — invert the scatter
                        coef[ci][...] = nat[:, ZIGZAG].reshape(
                            mcuy * vi, mcux * hi, 64
                        )
                        seq_seen.add(ci)
                    pos = end
                    continue
                if coef is None:
                    coef = [
                        np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
                        for _, hi, vi, _ in comps
                    ]
                cid, tsel = payload[1], payload[2]
                ci = next(
                    (i for i, c in enumerate(comps) if c[0] == cid), None
                )
                if ci is None:
                    raise ValueError(f"scan references unknown component {cid}")
                if ci in seq_seen:
                    # T.81 sequential mode: each component appears in at
                    # most one scan per frame; a duplicate would silently
                    # overwrite already-decoded coefficients.
                    raise ValueError(
                        f"duplicate sequential scan for component {cid}"
                    )
                _, hi, vi, _ = comps[ci]
                dc_tab = htables[(0, tsel >> 4)]
                ac_tab = htables[(1, tsel & 0xF)]
                bh, bw_ = _comp_block_dims(hi, vi, hmax, vmax, h, w)
                end = _entropy_end(data, pos)
                br = _BitReader(data[pos:end])
                prev_dc = 0
                unit = 0
                for byi in range(bh):
                    for bxi in range(bw_):
                        if dri and unit and unit % dri == 0:
                            # non-interleaved: the restart interval
                            # counts data units (one block per MCU)
                            br.sync_restart()
                            prev_dc = 0
                        zz = _decode_one_block(br, dc_tab, ac_tab, prev_dc)
                        prev_dc = int(zz[0])
                        coef[ci][byi, bxi] = zz
                        unit += 1
                seq_seen.add(ci)
                pos = end
                continue
            if seq_seen:
                # a full-interleave scan would silently re-decode
                # components already delivered by per-component scans
                raise ValueError(
                    "full-interleave scan after per-component scans"
                )
            bcomps = comps
            bhmax, bvmax = hmax, vmax
            bmcux, bmcuy = mcux, mcuy
            if ns == 1:
                # T.81 A.2.2: a scan with Ns=1 is NON-interleaved — one
                # data unit per MCU in the component's own raster order,
                # sampling factors notwithstanding. Treating declared
                # 2x2 factors as interleaved MCUs mis-laid blocks of
                # spec-valid grayscale streams (caught in review; the
                # pre-color decoder ignored sampling factors here).
                bcomps = [(comps[0][0], 1, 1, comps[0][3])]
                bhmax = bvmax = 1
                bmcux, bmcuy = -(-w // 8), -(-h // 8)
            # scan-order table selectors, matched to SOF comps by id
            sel = {payload[1 + 2 * i]: payload[2 + 2 * i] for i in range(ns)}
            scan = []
            for cid, hi, vi, tq in bcomps:
                if cid not in sel:
                    raise ValueError(f"scan references unknown component {cid}")
                td, ta = sel[cid] >> 4, sel[cid] & 0xF
                scan.append((htables[(0, td)], htables[(1, ta)], hi, vi))
            end = _entropy_end(data, pos)
            per_comp = _decode_entropy(data[pos:end], scan, bmcux, bmcuy, dri)
            return (
                _reconstruct(
                    bcomps, per_comp, qtables, bmcux, bmcuy, bhmax, bvmax, h, w
                ),
                h,
                w,
            )
        # APPn / COM / others: skipped
    if coef is not None and (
        (progressive and scans_seen)
        or (not progressive and len(seq_seen) == len(comps))
    ):
        # zigzag store -> natural order, then the shared reconstruction
        per_comp = []
        for zz in coef:
            nat = np.zeros_like(zz.reshape(-1, 64))
            nat[:, ZIGZAG] = zz.reshape(-1, 64)
            per_comp.append(nat)
        return (
            _reconstruct(comps, per_comp, qtables, mcux, mcuy, hmax, vmax, h, w),
            h,
            w,
        )
    if not progressive and seq_seen:
        raise ValueError(
            f"multi-scan baseline stream ended with only {len(seq_seen)} of "
            f"{len(comps)} components scanned"
        )
    raise ValueError("no scan data found")


def _entropy_end(data: bytes, start: int) -> int:
    """Index of the first real marker after the entropy-coded data."""
    p = start
    while p < len(data) - 1:
        if data[p] == 0xFF and data[p + 1] not in (0x00, *range(0xD0, 0xD8)):
            return p
        p += 1
    return len(data)


def _decode_one_block(br: _BitReader, dc_tab, ac_tab, prev_dc: int) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    size = _read_symbol(br, dc_tab)
    # T.81 F.1.2.1: DC size category ≤ 11 for 8-bit precision. A
    # corrupted DHT can declare any byte as a "size" symbol; reading
    # that many amplitude bits would build an unbounded int (found by
    # the byte-flip fuzz test as an int64 OverflowError).
    if size > 11:
        raise ValueError(f"invalid DC size category {size}")
    diff = _extend(br.read(size), size) if size else 0
    zz[0] = prev_dc + diff
    k = 1
    while k < 64:
        sym = _read_symbol(br, ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0xF
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(br.read(size), size)
        k += 1
    return zz


def _comp_block_dims(
    hi: int, vi: int, hmax: int, vmax: int, h: int, w: int
) -> tuple[int, int]:
    """A component's OWN (non-interleaved) block-grid dims: ceil of its
    subsampled resolution over 8 (T.81 A.2.2)."""
    ch, cw = -(-h * vi // vmax), -(-w * hi // hmax)
    return -(-ch // 8), -(-cw // 8)


def _dc_unit(
    br: _BitReader,
    carr: np.ndarray,
    byi: int,
    bxi: int,
    dc_tab,
    preds: list[int],
    si: int,
    ah: int,
    al: int,
) -> None:
    """One DC data unit of a progressive scan (G.1.2.1 / G.1.2.3)."""
    if ah == 0:  # first pass: baseline diff coding of v >> Al
        size = _read_symbol(br, dc_tab)
        if size > 11:
            raise ValueError(f"invalid DC size category {size}")
        diff = _extend(br.read(size), size) if size else 0
        preds[si] += diff
        carr[byi, bxi, 0] = preds[si] << al
    else:  # refinement: one raw bit appends bit Al (two's complement |=)
        if br.read_bit():
            carr[byi, bxi, 0] |= 1 << al


def _ac_first_unit(
    br: _BitReader, blk: np.ndarray, ss: int, se: int, al: int, ac_tab, eobrun: int
) -> int:
    """One block of an AC FIRST scan (G.1.2.2); returns remaining EOBRUN."""
    if eobrun:
        return eobrun - 1  # whole band zero for this block
    k = ss
    while k <= se:
        sym = _read_symbol(br, ac_tab)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            # EOBn: run of (1 << r) + ext blocks ending here, incl. this one
            return (1 << r) + (br.read(r) if r else 0) - 1
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(br.read(s), s) << al
        k += 1
    return 0


def _ac_refine_unit(
    br: _BitReader, blk: np.ndarray, ss: int, se: int, al: int, ac_tab, eobrun: int
) -> int:
    """One block of an AC REFINEMENT scan (G.1.2.3): newly-significant
    coefficients arrive as run/1 symbols with a sign bit; every
    previously-nonzero coefficient passed over contributes one
    correction bit (sign-magnitude append of bit Al). Returns the
    remaining EOBRUN."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_symbol(br, ac_tab)
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r < 15:  # EOBn → rest of this block refines below
                    eobrun = (1 << r) + (br.read(r) if r else 0)
                    break
                newval = 0  # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement AC size must be 1")
                newval = p1 if br.read_bit() else m1
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    # correction bit for a previously-nonzero coefficient
                    if br.read_bit() and not (abs(c) >> al) & 1:
                        blk[k] = c + (p1 if c > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if k <= se and newval:
                blk[k] = newval
            k += 1
        else:
            return 0  # walked the whole band, no EOB pending
    # EOB mode: remaining coefficients of this block get correction bits
    while k <= se:
        c = int(blk[k])
        if c != 0 and br.read_bit() and not (abs(c) >> al) & 1:
            blk[k] = c + (p1 if c > 0 else m1)
        k += 1
    return eobrun - 1


def _progressive_scan(
    entropy: bytes,
    payload: bytes,
    comps: list[tuple[int, int, int, int]],
    coef: list[np.ndarray],
    htables: dict[tuple[int, int], dict[tuple[int, int], int]],
    mcux: int,
    mcuy: int,
    hmax: int,
    vmax: int,
    h: int,
    w: int,
    dri: int,
) -> None:
    """Decode one SOF2 scan into the persistent ZIGZAG-order
    coefficient store (T.81 Annex G.2): DC scans may interleave
    several components over the MCU grid; AC scans are always
    single-component over that component's own block grid. Restart
    markers reset DC predictors and the EOB run."""
    ns = payload[0]
    if ns < 1 or len(payload) < 4 + 2 * ns:
        raise ValueError("truncated SOS header")
    ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
    ahal = payload[3 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0xF
    if al > 13 or ah > 13:
        raise ValueError("bad successive-approximation bit positions")
    if ah and ah != al + 1:
        raise ValueError("refinement scan must have Ah = Al + 1")
    by_id = {cid: i for i, (cid, _, _, _) in enumerate(comps)}
    sel: list[tuple[int, int, int]] = []  # (comp index, Td, Ta)
    for i in range(ns):
        cid = payload[1 + 2 * i]
        if cid not in by_id:
            raise ValueError(f"scan references unknown component {cid}")
        tsel = payload[2 + 2 * i]
        sel.append((by_id[cid], tsel >> 4, tsel & 0xF))
    br = _BitReader(entropy)
    mcu_i = 0
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("DC scan must have Se = 0")
        preds = [0] * ns
        if ns == 1:  # non-interleaved: the component's own grid
            ci, td, _ = sel[0]
            _, hi, vi, _ = comps[ci]
            dc_tab = htables[(0, td)] if ah == 0 else None
            nby, nbx = _comp_block_dims(hi, vi, hmax, vmax, h, w)
            for cy in range(nby):
                for cx in range(nbx):
                    if dri and mcu_i and mcu_i % dri == 0:
                        br.sync_restart()
                        preds = [0] * ns
                    _dc_unit(br, coef[ci], cy, cx, dc_tab, preds, 0, ah, al)
                    mcu_i += 1
        else:  # interleaved over the full MCU grid
            tabs = [htables[(0, td)] if ah == 0 else None for _, td, _ in sel]
            for my in range(mcuy):
                for mx in range(mcux):
                    if dri and mcu_i and mcu_i % dri == 0:
                        br.sync_restart()
                        preds = [0] * ns
                    for si, (ci, _, _) in enumerate(sel):
                        _, hi, vi, _ = comps[ci]
                        for v in range(vi):
                            for u in range(hi):
                                _dc_unit(
                                    br, coef[ci], my * vi + v, mx * hi + u,
                                    tabs[si], preds, si, ah, al,
                                )
                    mcu_i += 1
    else:  # AC scan
        if ns != 1:
            raise ValueError("AC progressive scan must be single-component")
        if not ss <= se <= 63:
            raise ValueError("bad spectral band")
        ci, _, ta = sel[0]
        _, hi, vi, _ = comps[ci]
        ac_tab = htables[(1, ta)]
        carr = coef[ci]
        unit = _ac_first_unit if ah == 0 else _ac_refine_unit
        eobrun = 0
        nby, nbx = _comp_block_dims(hi, vi, hmax, vmax, h, w)
        for cy in range(nby):
            for cx in range(nbx):
                if dri and mcu_i and mcu_i % dri == 0:
                    br.sync_restart()
                    eobrun = 0
                eobrun = unit(br, carr[cy, cx], ss, se, al, ac_tab, eobrun)
                mcu_i += 1


def _decode_entropy(
    data: bytes,
    scan: list[tuple[dict, dict, int, int]],
    mcux: int,
    mcuy: int,
    dri: int = 0,
) -> list[np.ndarray]:
    """Interleaved-scan entropy decode: per MCU, each component
    contributes vi×hi blocks in raster order (T.81 A.2.3). Returns one
    (n_blocks, 64) natural-order array per component, blocks stored in
    (block_row, block_col) order of the component's own grid."""
    br = _BitReader(data)
    out = [
        np.zeros((mcuy * vi * mcux * hi, 64), dtype=np.int64)
        for _, _, hi, vi in scan
    ]
    prev = [0] * len(scan)
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_i and mcu_i % dri == 0:
                br.sync_restart()
                prev = [0] * len(scan)
            for ci, (dc_tab, ac_tab, hi, vi) in enumerate(scan):
                for v in range(vi):
                    for u in range(hi):
                        zz = _decode_one_block(br, dc_tab, ac_tab, prev[ci])
                        prev[ci] = int(zz[0])
                        b = (my * vi + v) * (mcux * hi) + (mx * hi + u)
                        out[ci][b, ZIGZAG] = zz
            mcu_i += 1
    return out

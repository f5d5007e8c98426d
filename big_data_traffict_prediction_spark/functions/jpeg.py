"""Pure-numpy baseline JPEG codec (grayscale, ITU-T T.81).

The container this repo runs in has no image libraries, and the
multimodal operators gate compressed formats behind
``NotImplementedError`` rather than fake them. This module closes the
gap for JPEG the honest way: a REAL baseline encoder/decoder built
from the public spec (ITU-T T.81 / ISO 10918-1) with the standard
Annex K quantization + Huffman tables — output is decodable by any
stock viewer, and the decoder reads any single-component (grayscale)
baseline sequential JPEG, whoever produced it.

Scope (all honestly gated, never faked):
- encode: 8-bit grayscale, baseline DCT, JFIF container, quality
  scaling per the classic libjpeg 5000/q | 200−2q formula, optional
  restart markers (DRI/RSTn).
- decode: baseline sequential (SOF0), ONE component, restart
  intervals supported. Color / progressive raise
  ``NotImplementedError``.

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


def quant_table(quality: int) -> np.ndarray:
    """Annex-K luminance table scaled by the classic quality formula."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (STD_LUMA_QUANT * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


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
    padded = np.pad(a, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.float64)
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(
        -1, 8, 8
    )
    q = quant_table(quality)
    # Vectorized forward DCT + quantization over ALL blocks at once.
    dct = np.einsum("ux,nxy,vy->nuv", _DCT_C, blocks - 128.0, _DCT_C)
    coefs = np.round(dct / q).astype(np.int64)
    zz = coefs.reshape(-1, 64)[:, ZIGZAG]

    bw = _BitWriter()
    prev_dc = 0
    for i, blk in enumerate(zz):
        if restart_interval and i and i % restart_interval == 0:
            bw.emit_marker(0xD0 + ((i // restart_interval - 1) % 8))
            prev_dc = 0
        diff = int(blk[0]) - prev_dc
        prev_dc = int(blk[0])
        size = _category(diff)
        code, length = _DC_ENC[size]
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
                c, ln = _AC_ENC[0xF0]  # ZRL
                bw.write(c, ln)
                run -= 16
            size = _category(v)
            c, ln = _AC_ENC[(run << 4) | size]
            bw.write(c, ln)
            bw.write(_amplitude(v, size), size)
            run = 0
        if last < 63:
            c, ln = _AC_ENC[0x00]  # EOB
            bw.write(c, ln)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xFFDB, b"\x00" + bytes(q.reshape(64)[ZIGZAG].astype(np.uint8)))  # DQT
    out += seg(  # SOF0: 8-bit, h×w, 1 component (id 1, 1×1 sampling, qtable 0)
        0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"
    )
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))  # DHT DC 0
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))  # DHT AC 0
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))  # DRI
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += entropy
    out += b"\xff\xd9"  # EOI
    return out


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
    """Decode a baseline sequential single-component JPEG to uint8.

    Restart-interval (DRI/RSTn) streams are fully supported; color,
    progressive, and arithmetic-coded streams raise
    ``NotImplementedError`` — gated, not faked. Structurally malformed
    foreign streams (truncated segments, references to undeclared
    tables, garbage lengths) surface as ``ValueError`` — never raw
    ``KeyError``/``IndexError``/``struct.error`` from parse internals,
    so a corrupt blob in a media column fails with a classifiable
    error the decode UDF can report per-row.
    """
    try:
        return _decode_gray_impl(data)
    except (KeyError, IndexError, struct.error) as exc:
        raise ValueError(f"malformed JPEG stream: {exc!r}") from exc


def _decode_gray_impl(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = 0
    comp_q = 0
    comp_dc = comp_ac = 0
    dri = 0
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
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(payload, np.uint8, 64, p + 1).astype(np.int64)
                nat = np.empty(64, np.int64)
                nat[ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(tc, th)] = _decode_tree(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if ncomp != 1:
                raise NotImplementedError("only single-component (grayscale) JPEG")
            comp_q = payload[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("non-baseline JPEG (progressive/extended)")
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            (dri,) = struct.unpack(">H", payload)
        elif marker == 0xDA:  # SOS → entropy data follows
            comp_dc = payload[2] >> 4
            comp_ac = payload[2] & 0xF
            end = _entropy_end(data, pos)
            blocks = _decode_entropy(
                data[pos:end],
                htables[(0, comp_dc)],
                htables[(1, comp_ac)],
                n_blocks=(-(-h // 8)) * (-(-w // 8)),
                dri=dri,
            )
            pos = end
            # Dequantize + vectorized inverse DCT over all blocks.
            deq = blocks.reshape(-1, 8, 8) * qtables[comp_q]
            pix = np.einsum("xu,nuv,yv->nxy", _DCT_C.T, deq.astype(np.float64), _DCT_C.T)
            pix = np.clip(np.round(pix + 128.0), 0, 255).astype(np.uint8)
            bw_, bh_ = -(-w // 8), -(-h // 8)
            grid = pix.reshape(bh_, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(
                bh_ * 8, bw_ * 8
            )
            return grid[:h, :w]
        # APPn / COM / others: skipped
    raise ValueError("no scan data found")


def _entropy_end(data: bytes, start: int) -> int:
    """Index of the first real marker after the entropy-coded data."""
    p = start
    while p < len(data) - 1:
        if data[p] == 0xFF and data[p + 1] not in (0x00, *range(0xD0, 0xD8)):
            return p
        p += 1
    return len(data)


def _decode_entropy(
    data: bytes,
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
    n_blocks: int,
    dri: int = 0,
) -> np.ndarray:
    br = _BitReader(data)
    out = np.zeros((n_blocks, 64), dtype=np.int64)
    prev_dc = 0
    for b in range(n_blocks):
        if dri and b and b % dri == 0:
            br.sync_restart()
            prev_dc = 0
        zz = np.zeros(64, dtype=np.int64)
        size = _read_symbol(br, dc_tab)
        diff = _extend(br.read(size), size) if size else 0
        prev_dc += diff
        zz[0] = prev_dc
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
        out[b, ZIGZAG] = zz
    return out

"""PNG codec (functions/png.py): lossless round trip, foreign-stream
decode across all five filters and color types, chunk integrity,
honest gates, and Spark pipeline integration."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from big_data_traffict_prediction_spark.functions.png import (
    _SIG,
    _chunk,
    decode_gray,
    encode_gray,
)


def _foreign_png(px: np.ndarray, ctype: int, filters: list[int]) -> bytes:
    """Independent encoder (not the module's) writing chosen per-line
    filter types, to prove decode handles streams we did not write."""
    h, w = px.shape[:2]
    ch = px.shape[2] if px.ndim == 3 else 1
    flat = px.reshape(h, w * ch).astype(np.int64)
    lines = bytearray()
    prev = np.zeros(w * ch, np.int64)
    for y in range(h):
        cur = flat[y]
        ft = filters[y % len(filters)]
        lines.append(ft)
        enc = np.zeros(w * ch, np.int64)
        for x in range(w * ch):
            left = cur[x - ch] if x >= ch else 0
            up, ul = prev[x], (prev[x - ch] if x >= ch else 0)
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            enc[x] = (cur[x] - pred) & 0xFF
        lines += bytes(enc.astype(np.uint8))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )


def test_gray_round_trip_lossless():
    rng = np.random.default_rng(11)
    for shape in [(1, 1), (5, 7), (16, 16), (23, 41)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert (decode_gray(encode_gray(img)) == img).all(), shape


def test_foreign_rgb_all_filters_decodes_to_luma():
    rng = np.random.default_rng(12)
    rgb = rng.integers(0, 256, (11, 6, 3), dtype=np.uint8)
    out = decode_gray(_foreign_png(rgb, ctype=2, filters=[0, 1, 2, 3, 4]))
    exp = np.clip(
        np.round(
            0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        ),
        0,
        255,
    ).astype(np.uint8)
    assert (out == exp).all()


def test_foreign_rgba_and_grey_alpha():
    rng = np.random.default_rng(13)
    rgba = rng.integers(0, 256, (7, 5, 4), dtype=np.uint8)
    assert decode_gray(_foreign_png(rgba, ctype=6, filters=[4])).shape == (7, 5)
    ga = rng.integers(0, 256, (7, 5, 2), dtype=np.uint8)
    out = decode_gray(_foreign_png(ga, ctype=4, filters=[1, 2]))
    assert (out == ga[:, :, 0]).all()  # grey channel passes through


def test_crc_and_gates():
    img = np.zeros((8, 8), np.uint8)
    data = bytearray(encode_gray(img))
    data[40] ^= 0xFF  # corrupt inside IDAT → CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        decode_gray(bytes(data))
    with pytest.raises(ValueError):
        decode_gray(b"\xff\xd8not a png")
    # palette and interlace are gated, not faked
    ihdr_pal = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    pal = _SIG + _chunk(b"IHDR", ihdr_pal)
    with pytest.raises(NotImplementedError):
        decode_gray(pal)
    ihdr_i = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    inter = _SIG + _chunk(b"IHDR", ihdr_i)
    with pytest.raises(NotImplementedError):
        decode_gray(inter)


def test_spark_pipeline_decodes_png_images(spark, sf_dir):
    """encode_media(image_codec='png') → decode_features must equal the
    lossless PGM path bit-for-bit (both are lossless containers)."""
    from big_data_traffict_prediction_spark.functions.multimodal import (
        decode_features,
        encode_media,
        media_table,
    )

    m = media_table(spark, sf_dir).limit(90)
    png_rows = {
        r.media_id: r
        for r in decode_features(encode_media(m, image_codec="png"))
        .filter("kind = 'image'")
        .collect()
    }
    pgm_rows = {
        r.media_id: r
        for r in decode_features(encode_media(m, image_codec="pgm"))
        .filter("kind = 'image'")
        .collect()
    }
    assert png_rows and set(png_rows) == set(pgm_rows)
    for mid, pr in png_rows.items():
        gr = pgm_rows[mid]
        assert pr.decoded_ok and (pr.width, pr.height) == (gr.width, gr.height)
        assert pr.level_mean == gr.level_mean and pr.feature == gr.feature


def test_corrupt_png_streams_raise_classifiable_errors():
    """Same classification contract as the JPEG codec: any single-byte
    flip or truncation either decodes or raises ValueError /
    NotImplementedError — never a raw struct/zlib/index error (found:
    a flipped chunk-length field asked struct for a 1.5 GB buffer)."""
    import numpy as np

    from big_data_traffict_prediction_spark.functions.png import (
        decode_gray,
        encode_gray,
    )

    data = encode_gray((np.arange(256) % 251).astype(np.uint8).reshape(16, 16))
    for pos in range(2, len(data) - 2, 3):
        mutated = bytearray(data)
        mutated[pos] ^= 0x5A
        try:
            out = decode_gray(bytes(mutated))
            assert out.dtype == np.uint8
        except (ValueError, NotImplementedError):
            pass
    for cut in range(1, len(data), 5):
        try:
            decode_gray(bytes(data[:cut]))
        except (ValueError, NotImplementedError):
            pass

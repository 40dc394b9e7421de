"""Native codec-free image decode (BMP BI_RGB 24/32-bit, binary PPM/PGM)
— byte-exact against hand-built fixtures, plus the end-to-end resize path
running on genuinely decoded rasters.

The fixtures are synthesized here with struct.pack from the public format
specs (BMP: BITMAPFILEHEADER + BITMAPINFOHEADER; PNM: ASCII header +
raster), so every expected luma byte is hand-derivable:
luma = (299 R + 587 G + 114 B) // 1000 (integer BT.601)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from db_integration_via_kafka_ksql_spark.operators import multimodal as M


def make_bmp(rgb_rows: list[list[tuple[int, int, int]]], bpp: int = 24,
             top_down: bool = False) -> bytes:
    """Build a BI_RGB BMP from row-major top-down RGB pixel rows."""
    h = len(rgb_rows)
    w = len(rgb_rows[0])
    bypp = bpp // 8
    stride = (w * bypp + 3) & ~3
    rows = rgb_rows if top_down else rgb_rows[::-1]  # BMP default bottom-up
    raster = bytearray()
    for row in rows:
        line = bytearray()
        for r, g, b in row:
            line += bytes([b, g, r] + ([0] if bpp == 32 else []))  # BGR(A)
        line += b"\x00" * (stride - len(line))
        raster += line
    data_offset = 14 + 40
    file_size = data_offset + len(raster)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, (-h if top_down else h), 1, bpp, 0, len(raster), 2835, 2835, 0, 0,
    )
    return header + info + bytes(raster)


def make_ppm(rgb_rows: list[list[tuple[int, int, int]]],
             comment: bool = False) -> bytes:
    h, w = len(rgb_rows), len(rgb_rows[0])
    hdr = b"P6\n" + (b"# synthetic fixture\n" if comment else b"")
    hdr += f"{w} {h}\n255\n".encode()
    return hdr + bytes(c for row in rgb_rows for px in row for c in px)


def make_pgm(gray_rows: list[list[int]]) -> bytes:
    h, w = len(gray_rows), len(gray_rows[0])
    return f"P5\n{w} {h}\n255\n".encode() + bytes(
        v for row in gray_rows for v in row
    )


def luma(r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b) // 1000


PIXELS = [  # 3x2, top-down: primaries + greys — exercises padding (stride 12 != 9)
    [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
    [(255, 255, 255), (0, 0, 0), (17, 130, 201)],
]
EXPECTED = bytes(luma(*px) for row in PIXELS for px in row)


def test_bmp_24bit_bottom_up_byte_exact():
    w, h, raw = M.decode_image(make_bmp(PIXELS))
    assert (w, h) == (3, 2)
    assert raw == EXPECTED


def test_bmp_top_down_matches_bottom_up():
    # same logical image stored both ways decodes to the same raster
    assert M.decode_image(make_bmp(PIXELS, top_down=True))[2] == EXPECTED


def test_bmp_32bit_alpha_ignored():
    w, h, raw = M.decode_image(make_bmp(PIXELS, bpp=32))
    assert (w, h, raw) == (3, 2, EXPECTED)


def test_ppm_byte_exact_with_comment():
    for comment in (False, True):
        w, h, raw = M.decode_image(make_ppm(PIXELS, comment=comment))
        assert (w, h, raw) == (3, 2, EXPECTED)


def test_pgm_passthrough():
    rows = [[0, 128, 255], [7, 99, 200]]
    w, h, raw = M.decode_image(make_pgm(rows))
    assert (w, h) == (3, 2)
    assert raw == bytes(v for row in rows for v in row)


def test_sniff_formats():
    assert M.sniff_media_format(make_bmp(PIXELS)) == "bmp"
    assert M.sniff_media_format(make_ppm(PIXELS)) == "pnm"
    assert M.sniff_media_format(make_pgm([[1]])) == "pnm"
    assert M.sniff_media_format(b"\x89PNG\r\n\x1a\nrest") == "png"
    assert M.sniff_media_format(b"\xff\xd8\xff\xe0") == "jpeg"
    assert M.sniff_media_format(b"plain text") is None
    # 'P6' not followed by whitespace is NOT a PNM (e.g. a doc "P6abc...")
    assert M.sniff_media_format(b"P6abc") is None
    # round-9 ADVICE: a bare 2-byte payload must not sniff as PNM — the
    # empty slice payload[2:3] is a member of b" \t\r\n" under bytes
    # membership, which the tuple-membership guard avoids
    assert M.sniff_media_format(b"P5") is None
    assert M.sniff_media_format(b"P6") is None


def test_pnm_maxval_rescaled_and_invalid_rejected():
    """Round-9 ADVICE: PNM samples are fractions of maxval — a maxval<255
    image must rescale to 0..255 (spec), and maxval<1 is malformed."""
    # P5 with maxval 15: value v decodes to round(v * 255 / 15) = 17*v
    pgm = b"P5\n3 1\n15\n" + bytes([0, 7, 15])
    w, h, raw = M.decode_image(pgm)
    assert (w, h) == (3, 1)
    assert raw == bytes([0, (7 * 255 + 7) // 15, 255])
    # P6 with maxval 1 (bitmap-like): channels scale to 0/255 before luma
    ppm = b"P6\n1 1\n1\n" + bytes([1, 0, 1])
    assert M.decode_image(ppm)[2] == bytes([(299 * 255 + 114 * 255) // 1000])
    with pytest.raises(ValueError):
        M.decode_image(b"P5\n1 1\n0\n\x00")
    with pytest.raises(ValueError):
        M.decode_image(b"P5\n1 1\n-3\n\x00")


def test_compressed_formats_stay_explicit_stub():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)
    with pytest.raises(NotImplementedError):
        M.decode_image(b"not an image at all")


def test_malformed_payloads_raise_value_error():
    bmp = make_bmp(PIXELS)
    with pytest.raises(ValueError):
        M.decode_image(bmp[: len(bmp) - 4])  # truncated raster
    with pytest.raises(ValueError):
        M.decode_image(make_ppm(PIXELS)[:-2])  # truncated raster
    with pytest.raises(ValueError):
        M.decode_image(b"P6\n3 2\n")  # truncated header
    # RLE-compressed BMP (compression=1) needs a codec -> NotImplemented
    rle = bytearray(bmp)
    rle[30] = 1
    with pytest.raises(NotImplementedError):
        M.decode_image(bytes(rle))


def test_resize_runs_on_genuinely_decoded_rasters(spark):
    """End-to-end: BMP/PPM payloads through resize_images(decode=decode_image)
    — the resized bytes must equal a numpy nearest-neighbor reference over
    the HAND-COMPUTED luma raster, proving decode feeds the real resize."""
    # 4x4 gradient image so the 2x2 resize picks distinct sources
    grad = [
        [(16 * (4 * y + x), 8 * (4 * y + x), 255 - 16 * (4 * y + x))
         for x in range(4)]
        for y in range(4)
    ]
    payloads = [(0, make_bmp(grad)), (1, make_ppm(grad)), (2, make_bmp(PIXELS))]
    media = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out = {
        r["doc_id"]: r
        for r in M.resize_images(media, dst_width=2, dst_height=2,
                                 decode=M.decode_image).collect()
    }

    def nn_reference(rgb_rows):
        h, w = len(rgb_rows), len(rgb_rows[0])
        gray = np.array(
            [[luma(*px) for px in row] for row in rgb_rows], dtype=np.uint8
        )
        rows = np.arange(2) * h // 2
        cols = np.arange(2) * w // 2
        return gray[rows[:, None], cols[None, :]].tobytes()

    assert (out[0]["src_width"], out[0]["src_height"]) == (4, 4)
    assert bytes(out[0]["resized"]) == nn_reference(grad)
    assert bytes(out[1]["resized"]) == nn_reference(grad)  # PPM == BMP image
    assert (out[2]["src_width"], out[2]["src_height"]) == (3, 2)
    assert bytes(out[2]["resized"]) == nn_reference(PIXELS)

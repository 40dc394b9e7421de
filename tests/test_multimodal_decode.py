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
    # PNG (round 12) and baseline JPEG (round 13) decode natively; a
    # garbage body behind either signature is malformed, not a stub
    with pytest.raises(ValueError):
        M.decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError):
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


def _ahash_model(raw: bytes, w: int, h: int):
    """Sequential reference of the integer aHash (block mean, floor
    threshold, strict >, bit k = gy*8+gx split into 32-bit halves)."""
    means = []
    for gy in range(8):
        for gx in range(8):
            y0, y1 = gy * h // 8, (gy + 1) * h // 8
            x0, x1 = gx * w // 8, (gx + 1) * w // 8
            cnt = (y1 - y0) * (x1 - x0)
            if cnt <= 0:
                means.append(0)
                continue
            s = sum(
                raw[y * w + x] for y in range(y0, y1) for x in range(x0, x1)
            )
            means.append(s // cnt)
    thr = sum(means) // 64
    bits = [1 if m > thr else 0 for m in means]
    lo = sum(b << k for k, b in enumerate(bits[:32]))
    hi = sum(b << k for k, b in enumerate(bits[32:]))
    return lo, hi


def test_image_ahash_matches_model_on_fake_decode(spark):
    """mapInPandas aHash vs the sequential model over raw-byte rasters of
    several geometries (including w < 8: empty grid blocks) + NULL
    payload and sub-width payload conventions."""
    payloads = [
        (0, bytes(range(256)) * 2),          # L=512: w=1 -> 8x1 grid use
        (1, bytes([7] * 71)),                # w=8,h=8 uniform: hash (0, 0)
        (2, bytes([(i * 37) % 256 for i in range(500)])),
        (3, None),                           # NULL -> (0, 0, 0, 0)
        (4, b"xy"),                          # L=2: w=3 > L -> h=0
    ]
    media = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in M.image_ahash(media).collect()}
    for did, p in payloads:
        r = got[did]
        if p is None:
            assert tuple(r)[1:] == (0, 0, 0, 0)
            continue
        w = len(p) % 64 + 1
        h = len(p) // w
        assert (r["width"], r["height"]) == (w, h)
        if h == 0:
            assert (r["ahash_lo"], r["ahash_hi"]) == (0, 0)
            continue
        assert (r["ahash_lo"], r["ahash_hi"]) == _ahash_model(p[: w * h], w, h)
    # full-grid uniform raster: no block exceeds the mean -> zero hash
    assert (got[1]["ahash_lo"], got[1]["ahash_hi"]) == (0, 0)


def test_image_ahash_real_decode_and_neardup_pairs(spark):
    """aHash over genuinely decoded BMP rasters: a gradient image, its
    EXACT copy, a one-pixel perturbation, and an inverted image. The
    copy pairs at hamming 0, the perturbation within the radius, the
    inverted image far outside it — and the banded pair join returns
    exactly the brute-force pairs (pigeonhole recall at <= 3)."""
    side = 16
    grad = [
        [((x * 16) % 256,) * 3 for x in range(side)] for _ in range(side)
    ]
    pert = [row[:] for row in grad]
    pert[3][3] = (255, 255, 255)
    inv = [[(255 - px[0],) * 3 for px in row] for row in grad]
    media = spark.createDataFrame(
        [
            (0, make_bmp(grad)),
            (1, make_bmp(grad)),
            (2, make_bmp(pert)),
            (3, make_bmp(inv)),
        ],
        "doc_id long, payload binary",
    )
    hashes = {
        r["doc_id"]: (r["ahash_lo"], r["ahash_hi"])
        for r in M.image_ahash(media, decode=M.decode_image).collect()
    }
    assert hashes[0] == hashes[1]

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    assert ham(hashes[0], hashes[2]) <= 3
    assert ham(hashes[0], hashes[3]) > 3
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in M.image_neardup_pairs(
            media, max_hamming=3, decode=M.decode_image
        ).collect()
    }
    brute = {
        (a, b): ham(hashes[a], hashes[b])
        for a in hashes
        for b in hashes
        if a < b and ham(hashes[a], hashes[b]) <= 3
    }
    assert pairs == brute
    assert pairs[(0, 1)] == 0 and (0, 2) in pairs and (0, 3) not in pairs


def test_audio_pcm_stats_known_waveforms(spark):
    """Hand-built s16le payloads: a constant tone, a +/- square wave with
    a clipped peak, pure silence, an odd trailing byte, and NULL."""
    import struct

    def pcm(samples):
        return b"".join(struct.pack("<h", s) for s in samples)

    payloads = [
        (0, pcm([1000] * 4)),                       # constant tone
        (1, pcm([-32768, 32767, 0, -100])),         # clipped peak + near-silence
        (2, pcm([0, 1, -1, 511, -511])),            # all below the 512 threshold
        (3, pcm([5000]) + b"\x07"),                 # odd trailing byte ignored
        (4, None),
        (5, b""),
    ]
    media = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {r["doc_id"]: tuple(r)[1:] for r in M.audio_pcm_stats(media).collect()}
    assert got[0] == (4, 4000, 1000, 4 * 1000 * 1000, 0)
    assert got[1] == (
        4,
        32768 + 32767 + 0 + 100,
        32768,
        32768**2 + 32767**2 + 100**2,
        500,  # 0 and -100 are silent -> 2/4
    )
    assert got[2] == (5, 1024, 511, 1 + 1 + 511**2 + 511**2, 1000)
    assert got[3] == (1, 5000, 5000, 25_000_000, 0)
    assert got[4] == (0, 0, 0, 0, 0)
    assert got[5] == (0, 0, 0, 0, 0)


def test_neardup_bands_derive_from_radius(spark):
    """max_hamming > 3 must keep pigeonhole-exact recall: the band count
    is derived (h+1 bands), so a radius-6 search still returns EXACTLY
    the brute-force pairs, where the old fixed 4x16 layout silently lost
    any pair differing in all four bands."""
    side = 16  # 8x8 aHash blocks of 2x2 pixels each
    base = [[((x * 16) % 256,) * 3 for x in range(side)] for _ in range(side)]
    rasters = [base]
    # raster k whitens k whole blocks in the dark half of the gradient:
    # each flips ~one hash bit, spreading pair distances across 1..8
    for k in range(1, 9):
        img = [row[:] for row in base]
        for b in range(k):
            by, bx = 2 * (b % 8), 2 * (b // 8)
            for dy in range(2):
                for dx in range(2):
                    img[by + dy][bx + dx] = (255, 255, 255)
        rasters.append(img)
    media = spark.createDataFrame(
        [(i, make_bmp(r)) for i, r in enumerate(rasters)],
        "doc_id long, payload binary",
    )
    hashes = {
        r["doc_id"]: (r["ahash_lo"], r["ahash_hi"])
        for r in M.image_ahash(media, decode=M.decode_image).collect()
    }

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    for radius in (0, 5, 6):
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in M.image_neardup_pairs(
                media, max_hamming=radius, decode=M.decode_image
            ).collect()
        }
        brute = {
            (a, b): ham(hashes[a], hashes[b])
            for a in hashes
            for b in hashes
            if a < b and ham(hashes[a], hashes[b]) <= radius
        }
        assert pairs == brute, radius
    # sanity: the fixture actually exercises the widened radius
    assert any(3 < h <= 6 for h in (
        ham(hashes[a], hashes[b]) for a in hashes for b in hashes if a < b
    ))


def test_neardup_refuses_degenerate_radius(spark):
    media = spark.createDataFrame([(0, b"")], "doc_id long, payload binary")
    with pytest.raises(ValueError, match="bands"):
        M.image_neardup_pairs(media, max_hamming=16)
    with pytest.raises(ValueError, match=">= 0"):
        M.image_neardup_pairs(media, max_hamming=-1)


# ---------------------------------------------------------------- PNG --
import zlib


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_filter_line(line, prev, bpp, ftype):
    """Forward PNG filter (the encoder side) — independent python model
    of the decoder's unfilter."""
    out = bytearray(line)
    if ftype == 0:
        pass
    elif ftype == 1:
        for x in range(len(line) - 1, bpp - 1, -1):
            out[x] = (line[x] - line[x - bpp]) & 0xFF
    elif ftype == 2:
        for x in range(len(line)):
            out[x] = (line[x] - prev[x]) & 0xFF
    elif ftype == 3:
        for x in range(len(line)):
            a = line[x - bpp] if x >= bpp else 0
            out[x] = (line[x] - ((a + prev[x]) >> 1)) & 0xFF
    elif ftype == 4:
        for x in range(len(line)):
            a = line[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (line[x] - pred) & 0xFF
    return bytes(out)


def make_png(raster, color_type, filters=None, interlace=0, depth=8):
    """Minimal PNG encoder: `raster` is an h x w x ch numpy array
    (uint8); `filters` picks the per-row filter type (default cycles
    0..4 so every filter is exercised)."""
    import struct

    h, w, ch = raster.shape
    stride = w * ch
    body = bytearray()
    prev = bytes(stride)
    for y in range(h):
        ftype = (filters[y] if filters else y % 5)
        line = raster[y].tobytes()
        body.append(ftype)
        body += _png_filter_line(line, prev, ch, ftype)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
        + _png_chunk(b"IEND", b"")
    )


def _test_raster(h, w, ch, seed=3):
    # deterministic, hits high-frequency patterns so every filter's
    # reconstruction path carries non-trivial values
    vals = np.arange(h * w * ch, dtype=np.int64)
    return ((vals * 151 + seed * 7919) % 256).astype(np.uint8).reshape(
        h, w, ch
    )


def test_png_roundtrip_every_filter_and_color_type():
    for color_type, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        raster = _test_raster(10, 7, ch)
        w, h, gray = M.decode_image(make_png(raster, color_type))
        assert (w, h) == (7, 10)
        got = np.frombuffer(gray, dtype=np.uint8).reshape(10, 7)
        if color_type in (0, 4):
            want = raster[..., 0]
        else:
            px = raster[..., :3].astype(np.int64)
            want = (
                (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2])
                // 1000
            ).astype(np.uint8)
        assert np.array_equal(got, want), color_type


def test_png_paeth_filter_roundtrip():
    # every row Paeth-filtered: the trickiest predictor reconstructs
    # bit-exactly, including the first row (b=c=0) and first pixel (a=0)
    raster = _test_raster(9, 11, 3, seed=8)
    payload = make_png(raster, 2, filters=[4] * 9)
    w, h, gray = M.decode_image(payload)
    px = raster.astype(np.int64)
    want = (
        (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
    ).astype(np.uint8)
    assert np.array_equal(
        np.frombuffer(gray, dtype=np.uint8).reshape(9, 11), want
    )


def test_png_rejects_unsupported_shapes():
    raster = _test_raster(4, 4, 3)
    with pytest.raises(NotImplementedError, match="interlace"):
        M.decode_image(make_png(raster, 2, interlace=1))
    with pytest.raises(NotImplementedError, match="8 only"):
        M.decode_image(make_png(raster, 2, depth=16))
    bad = bytearray(make_png(raster, 2))
    bad[-20] ^= 0xFF  # corrupt inside IDAT: CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        M.decode_image(bytes(bad))


def test_png_ahash_matches_bmp_twin(spark):
    """The same raster through PNG and BMP must produce bit-identical
    aHashes (both decode to the same luma raster), and the banded
    near-dup join pairs them at hamming 0."""
    side = 16
    rgb = [
        [((x * 16) % 256, (y * 7) % 256, (x * y) % 256) for x in range(side)]
        for y in range(side)
    ]
    raster = np.array(rgb, dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (0, make_bmp(rgb)),
            (1, make_png(raster, 2)),           # RGB PNG, cycling filters
            # RGBA twin: opaque alpha channel must not affect the luma
            (2, make_png(
                np.dstack([raster, np.full((side, side, 1), 255, np.uint8)]),
                6,
            )),
        ],
        "doc_id long, payload binary",
    )
    hashes = {
        r["doc_id"]: (r["ahash_lo"], r["ahash_hi"])
        for r in M.image_ahash(media, decode=M.decode_image).collect()
    }
    assert hashes[0] == hashes[1] == hashes[2]
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in M.image_neardup_pairs(
            media, max_hamming=0, decode=M.decode_image
        ).collect()
    }
    assert pairs == {(0, 1): 0, (0, 2): 0, (1, 2): 0}


def test_png_hardening_against_crafted_payloads():
    """ADVICE r12: (a) an IHDR claiming huge dims must refuse BEFORE
    allocating/inflating; (b) a deflate stream expanding past the IHDR
    geometry is a decompression bomb — detected via bounded inflate,
    never materialized; (c) truncation inside a chunk's trailing CRC is
    the ValueError contract, not struct.error."""
    import struct

    # (a) tiny payload, giant claimed dims: ValueError before inflate
    ihdr = struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 2, 0, 0, 0)
    bomb_hdr = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 100))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="pixel cap"):
        M.decode_image(bomb_hdr)

    # (b) plausible dims, but the stream inflates far past the geometry
    raster = _test_raster(4, 4, 3)
    good = make_png(raster, 2, filters=[0] * 4)
    oversized = zlib.compress(b"\x00" * (1 << 20))  # 1 MB of zeros, tiny wire
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", oversized)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="geometry"):
        M.decode_image(bomb)

    # (c) truncate inside the IEND CRC: ValueError, not struct.error
    with pytest.raises(ValueError, match="truncated"):
        M.decode_image(good[:-2])

    # (d) truncated zlib stream (stream shorter than geometry)
    idat_full = zlib.compress(
        b"".join(b"\x00" + raster[y].tobytes() for y in range(4))
    )
    short = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", idat_full[: len(idat_full) // 2])
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        M.decode_image(short)

    # and the hardened path still decodes a clean payload identically
    w, h, gray = M.decode_image(good)
    assert (w, h) == (4, 4)


# --------------------------------------------------------------- JPEG --
import struct as _struct


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:  # pad the tail with 1s (T.81 F.1.2.3)
            self.write(1, 1)


def _enc_tables():
    """Trivial but VALID canonical tables emitted in DHT: all DC size
    symbols at length 4, all AC run/size symbols at length 8 (162 codes
    fit in 8 bits with the all-ones code unused)."""
    dc_counts = [0] * 16
    dc_counts[3] = 12  # 12 symbols of length 4
    dc_symbols = list(range(12))
    ac_counts = [0] * 16
    ac_symbols = [0x00, 0xF0] + [
        (run << 4) | size for run in range(16) for size in range(1, 11)
    ]
    ac_counts[7] = len(ac_symbols)  # all at length 8
    codes = {}
    for kind, counts, symbols in (
        ("dc", dc_counts, dc_symbols), ("ac", ac_counts, ac_symbols)
    ):
        code, k, table = 0, 0, {}
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                table[symbols[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1
        codes[kind] = (counts, symbols, table)
    return codes


_FDCT_A = None


def _fdct(block):
    """Float forward DCT (test-side reference encoder only)."""
    global _FDCT_A
    if _FDCT_A is None:
        A = np.zeros((8, 8))
        for u in range(8):
            c = (1 / np.sqrt(2)) if u == 0 else 1.0
            for x in range(8):
                A[u, x] = c / 2 * np.cos((2 * x + 1) * u * np.pi / 16)
        _FDCT_A = A
    return _FDCT_A @ block @ _FDCT_A.T


def _enc_block(bw, block, pred, dc_tab, ac_tab):
    """Quantize (q=1) + entropy-encode one 8x8 spatial block; returns
    the new DC predictor."""
    coeffs = np.round(_fdct(block.astype(np.float64) - 128.0)).astype(int)
    zz = [coeffs.flat[i] for i in M._JPEG_ZIGZAG]
    diff = zz[0] - pred

    def emit(tab, sym, val, size):
        code, length = tab[sym]
        bw.write(code, length)
        if size:
            bw.write(val if val >= 0 else val + (1 << size) - 1, size)

    size = int(abs(diff)).bit_length()
    emit(dc_tab, size, diff, size)
    run = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            emit(ac_tab, 0xF0, 0, 0)
            run -= 16
        s = int(abs(v)).bit_length()
        emit(ac_tab, (run << 4) | s, v, s)
        run = 0
    if run:
        emit(ac_tab, 0x00, 0, 0)  # EOB
    return zz[0]


def _pad_to_blocks(plane, bh, bw_):
    h, w = plane.shape
    H = (h + bh - 1) // bh * bh
    W = (w + bw_ - 1) // bw_ * bw_
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def make_jpeg(raster, subsample="gray", restart_interval=0):
    """Minimal baseline JPEG encoder (quant tables all 1s, flat Huffman
    tables declared in DHT): 'gray' single-component, '444' YCbCr 1x1,
    '420' YCbCr with 2x2 luma sampling."""
    codes = _enc_tables()
    dc_counts, dc_syms, dc_tab = codes["dc"]
    ac_counts, ac_syms, ac_tab = codes["ac"]
    if subsample == "gray":
        planes = [(_pad_to_blocks(raster, 8, 8), 1, 1)]
        h, w = raster.shape
    else:
        r = raster[..., 0].astype(np.int64)
        g = raster[..., 1].astype(np.int64)
        b = raster[..., 2].astype(np.int64)
        y = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
        cb = np.clip(128 + (-169 * r - 331 * g + 500 * b) // 1000, 0, 255
                     ).astype(np.uint8)
        cr = np.clip(128 + (500 * r - 419 * g - 81 * b) // 1000, 0, 255
                     ).astype(np.uint8)
        h, w = y.shape
        if subsample == "444":
            planes = [(_pad_to_blocks(p, 8, 8), 1, 1) for p in (y, cb, cr)]
        else:  # 420: chroma averaged 2x2
            yp = _pad_to_blocks(y, 16, 16)
            sub = lambda p: _pad_to_blocks(  # noqa: E731
                ((p[0::2, 0::2].astype(int) + p[1::2, 1::2]) // 2
                 ).astype(np.uint8) if p.shape[0] % 2 == 0 and
                p.shape[1] % 2 == 0 else
                ((_pad_to_blocks(p, 2, 2)[0::2, 0::2].astype(int)
                  + _pad_to_blocks(p, 2, 2)[1::2, 1::2]) // 2
                 ).astype(np.uint8), 8, 8)
            planes = [(yp, 2, 2), (sub(cb), 1, 1), (sub(cr), 1, 1)]
    ncomp = len(planes)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + _struct.pack(">HB", 67, 0) + bytes([1] * 64)  # DQT q=1
    sof = _struct.pack(">BHHB", 8, h, w, ncomp)
    for i, (_, ch, cv) in enumerate(planes):
        sof += bytes([i + 1, (ch << 4) | cv, 0])
    out += b"\xff\xc0" + _struct.pack(">H", 2 + len(sof)) + sof
    for tc, counts, syms in ((0, dc_counts, dc_syms), (1, ac_counts, ac_syms)):
        body = bytes([tc << 4]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + _struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + _struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + _struct.pack(">H", 2 + len(sos)) + sos
    hmax = max(p[1] for p in planes)
    vmax = max(p[2] for p in planes)
    if ncomp == 1:
        mcus_x = (w + 7) // 8
        mcus_y = (h + 7) // 8
    else:
        mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
        mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    bw = _JpegBitWriter()
    preds = [0] * ncomp
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            out += bw.out
            bw = _JpegBitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            preds = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for ci, (plane, ch, cv) in enumerate(planes):
            for by in range(cv):
                for bx in range(ch):
                    yy = (my * cv + by) * 8
                    xx = (mx * ch + bx) * 8
                    preds[ci] = _enc_block(
                        bw, plane[yy : yy + 8, xx : xx + 8], preds[ci],
                        dc_tab, ac_tab,
                    )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def test_jpeg_grayscale_roundtrip_near_lossless():
    """Single-component baseline JPEG with q=1 tables: the only error is
    DCT/IDCT rounding, so every pixel lands within 2 of the source."""
    raster = _test_raster(24, 17, 1)[..., 0]  # odd width: partial blocks
    payload = make_jpeg(raster, "gray")
    w, h, gray = M.decode_image(payload)
    assert (w, h) == (17, 24)
    got = np.frombuffer(gray, dtype=np.uint8).reshape(24, 17).astype(int)
    assert np.abs(got - raster.astype(int)).max() <= 2


def test_jpeg_restart_markers_do_not_change_pixels():
    raster = _test_raster(16, 16, 1)[..., 0]
    base = M.decode_image(make_jpeg(raster, "gray"))
    with_rst = M.decode_image(make_jpeg(raster, "gray", restart_interval=2))
    assert base == with_rst


def test_jpeg_420_interleave_reassembles_y():
    """4:2:0 (2x2 luma per MCU): the decoder must re-tile interleaved Y
    blocks correctly; chroma blocks are consumed but never reconstructed."""
    side = 32
    rgb = np.array(
        [
            [((x * 16) % 256, (y * 7) % 256, (x * y) % 256)
             for x in range(side)]
            for y in range(side)
        ],
        dtype=np.uint8,
    )
    payload = make_jpeg(rgb, "420")
    w, h, gray = M.decode_image(payload)
    assert (w, h) == (side, side)
    got = np.frombuffer(gray, dtype=np.uint8).reshape(side, side).astype(int)
    px = rgb.astype(np.int64)
    want = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
    assert np.abs(got - want).max() <= 2


def test_jpeg_ahash_matches_bmp_twin(spark):
    """VERDICT r12 #6 done-criterion: JPEG and BMP twins of one raster
    produce bit-identical aHashes (the PNG test pattern), and the banded
    near-dup join pairs them at hamming 0 — the full multimodal chain
    now runs end-to-end on a JPEG corpus with no codec library."""
    side = 16
    rgb = [
        [((x * 16) % 256, (y * 7) % 256, (x * y) % 256) for x in range(side)]
        for y in range(side)
    ]
    raster = np.array(rgb, dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (0, make_bmp(rgb)),
            (1, make_jpeg(raster, "444")),
            (2, make_jpeg(raster, "420")),
        ],
        "doc_id long, payload binary",
    )
    hashes = {
        r["doc_id"]: (r["ahash_lo"], r["ahash_hi"])
        for r in M.image_ahash(media, decode=M.decode_image).collect()
    }
    assert hashes[0] == hashes[1] == hashes[2]
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in M.image_neardup_pairs(
            media, max_hamming=0, decode=M.decode_image
        ).collect()
    }
    assert pairs == {(0, 1): 0, (0, 2): 0, (1, 2): 0}


def test_jpeg_rejects_unsupported_variants():
    raster = _test_raster(8, 8, 1)[..., 0]
    good = bytearray(make_jpeg(raster, "gray"))
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="progressive"):
        M.decode_image(bytes(prog))
    with pytest.raises(ValueError, match="truncated"):
        M.decode_image(bytes(good[:20]))
    # huge claimed dims refuse before allocating (shared pixel cap)
    big = bytearray(make_jpeg(raster, "gray"))
    sof_at = bytes(big).find(b"\xff\xc0")
    _struct.pack_into(">HH", big, sof_at + 5, 60000, 60000)
    with pytest.raises(ValueError, match="pixel cap"):
        M.decode_image(bytes(big))


# ------------------------------------------------------ audio fingerprint --
def _audio_fp_model(b: bytes):
    """Sequential python reference of audio_energy_fingerprint: 65 equal
    segments (sample j -> segment j*65 DIV k), integer energies,
    energy-rose bits, two 32-bit halves."""
    k = len(b) // 2
    if k == 0:
        return 0, 0, 0
    xs = struct.unpack(f"<{k}h", b[: 2 * k])
    e = [0] * 65
    for j, x in enumerate(xs):
        e[j * 65 // k] += x * x
    bits = [1 if e[t + 1] > e[t] else 0 for t in range(64)]
    lo = sum(bit << i for i, bit in enumerate(bits[:32]))
    hi = sum(bit << i for i, bit in enumerate(bits[32:]))
    return k, lo, hi


def test_audio_fingerprint_matches_python_model(spark):
    """The vectorized reduceat segmentation equals the sequential model
    on every length class: long (k >> 65), exact multiples, short
    (k < 65, empty segments), single-sample, empty, odd byte, NULL."""
    import struct as _s

    payloads = [
        b"".join(
            _s.pack("<h", ((i * 2731 + 17) % 4096 - 2048)) for i in range(n)
        )
        for n in (1000, 130, 65, 64, 7, 1)
    ]
    payloads.append(b"")
    payloads.append(b"\x07")  # odd trailing byte ignored
    rows = [(i, p) for i, p in enumerate(payloads)] + [(99, None)]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: (r["n_samples"], r["fp_lo"], r["fp_hi"])
        for r in M.audio_energy_fingerprint(media).collect()
    }
    for i, p in enumerate(payloads):
        assert got[i] == _audio_fp_model(p), (i, len(p))
    assert got[99] == (0, 0, 0)


def test_audio_neardup_planted_pair(spark):
    """A mild amplitude change preserves the energy CONTOUR (hamming
    small); an unrelated waveform does not pair. Empty payloads never
    pair despite identical (0,0) fingerprints."""
    import struct as _s

    base = [
        int(1500 * (1 + ((t // 40) % 5))) * (1 if t % 2 else -1)
        for t in range(520)
    ]
    quiet = [x * 9 // 10 for x in base]  # 10% quieter, same contour
    other = [
        int(1500 * (1 + ((t // 40 + 3 * (t // 160)) % 7))) * (1 if t % 3 else -1)
        for t in range(520)
    ]
    enc = lambda xs: b"".join(_s.pack("<h", x) for x in xs)  # noqa: E731
    media = spark.createDataFrame(
        [(0, enc(base)), (1, enc(quiet)), (2, enc(other)),
         (3, b""), (4, b"")],
        "doc_id long, payload binary",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in M.audio_neardup_pairs(media, max_hamming=3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= 3
    assert not any(3 in p or 4 in p for p in pairs), pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_jpeg_malformed_inputs_raise_valueerror_contract():
    """ADVICE r13: malformed JPEG input must raise the decoder's
    ValueError contract (the PNG truncation discipline), never a raw
    IndexError / struct.error / opaque numpy broadcast error.

    Covers: entropy stream cut mid-scan, entropy cut right at the SOS
    header, and short DQT/DHT/DRI/SOF/SOS segment bodies."""

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    raster = _test_raster(16, 16, 1)[..., 0]
    good = bytes(make_jpeg(raster, "gray"))
    sos_at = good.find(b"\xff\xda")
    sos_len = struct.unpack_from(">H", good, sos_at + 2)[0]
    entropy_at = sos_at + 2 + sos_len
    # cut exactly at the entropy start, and a few bytes into it
    for cut in (entropy_at, entropy_at + 3):
        with pytest.raises(ValueError, match="truncated in entropy stream"):
            M.decode_image(good[:cut])

    soi = b"\xff\xd8"
    # DQT body shorter than the 65 bytes a table needs
    with pytest.raises(ValueError, match="DQT segment truncated"):
        M.decode_image(soi + seg(0xDB, b"\x00\x01\x02\x03"))
    # DHT body shorter than the 17-byte counts header
    with pytest.raises(ValueError, match="DHT segment truncated"):
        M.decode_image(soi + seg(0xC4, b"\x00\x01\x02"))
    # DHT counts claim more symbols than the body carries
    counts = bytes([0x00]) + bytes([16]) + bytes(15)  # 16 syms, none present
    with pytest.raises(ValueError, match="DHT segment truncated"):
        M.decode_image(soi + seg(0xC4, counts))
    # DRI body shorter than its 2-byte interval
    with pytest.raises(ValueError, match="DRI segment truncated"):
        M.decode_image(soi + seg(0xDD, b"\x07"))
    # SOF body shorter than its fixed header
    with pytest.raises(ValueError, match="SOF segment truncated"):
        M.decode_image(soi + seg(0xC0, b"\x08\x00\x10"))
    # SOF ncomp claims components the body doesn't carry
    sof_short = struct.pack(">BHHB", 8, 16, 16, 3) + b"\x01\x11\x00"
    with pytest.raises(ValueError, match="SOF segment truncated"):
        M.decode_image(soi + seg(0xC0, sof_short))
    # SOS body shorter than its component list
    sof_ok = struct.pack(">BHHB", 8, 16, 16, 1) + b"\x01\x11\x00"
    with pytest.raises(ValueError, match="SOS segment truncated"):
        M.decode_image(
            soi
            + seg(0xDB, bytes([0x00]) + bytes(64))
            + seg(0xC0, sof_ok)
            + seg(0xDA, b"\x02\x01")  # claims 2 scan comps, carries half
        )
    # a segment whose declared length is < 2 (would slice negatively)
    with pytest.raises(ValueError, match="segment length < 2"):
        M.decode_image(soi + b"\xff\xdb\x00\x01" + bytes(8))

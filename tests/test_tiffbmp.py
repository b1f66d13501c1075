"""BMP and baseline-TIFF codec coverage (stages/tiffbmp.py).

No Pillow in this container, so parity is structural + analytic: the
fixture encoders cover every decoder branch with exact round-trips, and
hand-built byte-level fixtures pin the wire formats (BMP RLE escapes,
TIFF LZW early-change code stream, PackBits ops) independently of the
encoders.
"""
import struct

import numpy as np
import pytest

from iresearch_ray.stages import tiffbmp as tb


def _rng(seed=5):
    return np.random.default_rng(seed)


def _rgb(h=13, w=17, seed=5):
    return _rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bpp", [24, 32])
def test_bmp_truecolor_roundtrip(bpp):
    rgb = _rgb()
    for topdown in (False, True):
        out = tb.decode_bmp(tb.encode_bmp(rgb, bpp=bpp, topdown=topdown))
        assert np.array_equal(out, rgb), (bpp, topdown)


def test_bmp_16bpp_565_bitfields():
    rgb = _rgb(seed=7)
    out = tb.decode_bmp(tb.encode_bmp(rgb, bpp=16))
    v = rgb.astype(np.int64)
    want = np.stack([
        (v[:, :, 0] >> 3) * 255 // 31,
        (v[:, :, 1] >> 2) * 255 // 63,
        (v[:, :, 2] >> 3) * 255 // 31,
    ], axis=-1).astype(np.uint8)
    assert np.array_equal(out, want)


@pytest.mark.parametrize("bpp", [1, 4, 8])
def test_bmp_palette_roundtrip(bpp):
    cols = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]],
                    np.uint8)
    idx = (_rng(bpp).integers(0, min(4, 1 << bpp), (11, 14))
           .astype(np.uint8))
    img = cols[idx]
    out = tb.decode_bmp(tb.encode_bmp(img, bpp=bpp))
    assert np.array_equal(out, img)


def test_bmp_rle8_roundtrip_and_escapes():
    cols = np.array([[1, 2, 3], [200, 100, 50], [7, 8, 9]], np.uint8)
    idx = np.zeros((6, 10), np.uint8)
    idx[1, :] = 1          # full-row run
    idx[2, 3:5] = 2        # short run mid-row
    idx[4] = (np.arange(10) % 3).astype(np.uint8)  # literal-ish
    img = cols[idx]
    out = tb.decode_bmp(tb.encode_bmp(img, bpp=8, rle=True))
    assert np.array_equal(out, img)
    # hand-built stream: run, delta (skipped pixels = palette 0), EOL,
    # absolute mode, EOF — pins the escape semantics byte by byte
    pal = struct.pack("<3B x 3B x", 10, 20, 30, 100, 110, 120)  # BGRX x2
    data = bytes([
        3, 1,          # run: 3 x index 1
        0, 2, 2, 0,    # delta: skip 2 right
        2, 1,          # run: 2 x index 1
        0, 0,          # EOL
        0, 3, 1, 0, 1, 0,  # absolute: 3 literals (1,0,1) + pad
        0, 1,          # EOF
    ])
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + 8 + len(data), 0, 0,
                      14 + 40 + 8)
    info = struct.pack("<IiiHHIIiiII", 40, 8, 2, 1, 8, 1, len(data),
                       0, 0, 2, 0)
    px = tb.decode_bmp(hdr + info + pal + data)
    # bottom-up: coded row 0 is the BOTTOM row
    bot = px[1]
    c0, c1 = (30, 20, 10), (120, 110, 100)
    assert [tuple(p) for p in bot] == [c1, c1, c1, c0, c0, c1, c1, c0]
    top = px[0]
    assert [tuple(p) for p in top[:3]] == [c1, c0, c1]  # absolute mode


def test_bmp_corrupt_raises_cleanly():
    rgb = _rgb(5, 5)
    good = tb.encode_bmp(rgb, bpp=24)
    with pytest.raises(ValueError):
        tb.decode_bmp(good[:20])
    with pytest.raises(ValueError):
        tb.decode_bmp(b"XX" + good[2:])
    bad = bytearray(tb.encode_bmp(rgb, bpp=24))
    bad[2] = 0  # shrink declared size is tolerated; truncate pixels isn't
    with pytest.raises(ValueError):
        tb.decode_bmp(bytes(bad)[:-8])


# ---------------------------------------------------------------------------
# TIFF
# ---------------------------------------------------------------------------


def test_tiff_deflate_roundtrip_and_legacy_id():
    rgb = _rgb(seed=23)
    t = tb.encode_tiff(rgb, compression="deflate", predictor=2,
                       rows_per_strip=4)
    assert np.array_equal(tb.decode_tiff(t), rgb)
    # legacy deflate id 32946 decodes identically: patch Compression
    buf = bytearray(t)
    ifd = struct.unpack("<I", buf[4:8])[0]
    n = struct.unpack("<H", buf[ifd : ifd + 2])[0]
    for k in range(n):
        off = ifd + 2 + 12 * k
        if struct.unpack_from("<H", buf, off)[0] == 259:
            struct.pack_into("<H", buf, off + 8, 32946)
    assert np.array_equal(tb.decode_tiff(bytes(buf)), rgb)


@pytest.mark.parametrize("comp", ["none", "packbits", "lzw", "deflate"])
@pytest.mark.parametrize("pred", [1, 2])
def test_tiff_rgb_roundtrip(comp, pred):
    rgb = _rgb()
    for be in (False, True):
        t = tb.encode_tiff(rgb, compression=comp, predictor=pred,
                           big_endian=be, rows_per_strip=5)
        assert np.array_equal(tb.decode_tiff(t), rgb), (comp, pred, be)


@pytest.mark.parametrize("photometric", [None, "gray0", "palette"])
def test_tiff_gray_modes(photometric):
    gray = _rng(11).integers(0, 256, (9, 12), dtype=np.uint8)
    t = tb.encode_tiff(gray, compression="packbits",
                       photometric=photometric, rows_per_strip=4)
    out = tb.decode_tiff(t)
    if photometric == "palette":
        # identity gray ColorMap -> 3-channel output, all channels equal
        assert np.array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))
    else:
        assert np.array_equal(out, gray)


def test_tiff_16bit_and_rgba():
    rgb = _rgb(seed=13)
    t = tb.encode_tiff(rgb, compression="lzw", predictor=2, depth=16)
    assert np.array_equal(tb.decode_tiff(t), rgb)
    rgba = _rng(17).integers(0, 256, (9, 7, 4), dtype=np.uint8)
    out = tb.decode_tiff(tb.encode_tiff(rgba, compression="packbits"))
    assert out.shape == (9, 7, 4) and np.array_equal(out, rgba)


def test_tiff_lzw_early_change_kat():
    """Known-answer LZW: a run long enough to cross the 511-entry early
    width change must round-trip AND the decoder must accept the stream
    the early-change coder emits (a LATE-change pair would desync here)."""
    data = bytes(range(256)) * 5 + b"\x07" * 300
    enc = tb._tiff_lzw_encode(data)
    assert tb._tiff_lzw_decode(enc, len(data)) == data
    # hand-built minimal stream: Clear, 'A', 'B', code258('AB'), EOI
    def emit(codes, nbits_seq):
        acc, nacc, out = 0, 0, bytearray()
        for c, nb in zip(codes, nbits_seq):
            acc = (acc << nb) | c
            nacc += nb
            while nacc >= 8:
                out.append((acc >> (nacc - 8)) & 0xFF)
                nacc -= 8
        if nacc:
            out.append((acc << (8 - nacc)) & 0xFF)
        return bytes(out)
    stream = emit([256, 65, 66, 258, 257], [9, 9, 9, 9, 9])
    assert tb._tiff_lzw_decode(stream, 4) == b"ABAB"


def test_tiff_packbits_kat():
    # 0x02 'ABC' literal, 0xFE 'Z' = 3 repeats, 0x80 noop
    assert tb._packbits_decode(b"\x02ABC\xfeZ\x80", 6) == b"ABCZZZ"
    assert tb._packbits_decode(tb._packbits_encode(b"AAAABCD" * 9), 63) \
        == b"AAAABCD" * 9


def test_image_decode_stage_auto_mixed_formats(ray_session):
    """ImageDecode(decoder='auto') sniffs container magic and decodes a
    MIXED-format corpus column through one actor stage — PPM, PNG, JPEG,
    GIF, BMP (RLE8) and TIFF (LZW + predictor) payloads of one shape;
    lossless formats byte-match, JPEG stays within quantization error;
    a corrupt payload drops only its own row under on_error='skip'."""
    import pyarrow as pa
    import ray.data as rd

    from iresearch_ray.stages.gif import encode_gif
    from iresearch_ray.stages.jpeg import encode_jpeg
    from iresearch_ray.stages.multimodal import (ImageDecode, encode_png,
                                                 encode_ppm)

    rng = _rng(21)
    cols = np.array([[250, 10, 10], [10, 250, 10], [10, 10, 250],
                     [40, 40, 40]], np.uint8)
    idx = rng.integers(0, 4, (16, 16)).astype(np.uint8)
    img = cols[idx]
    payloads = [
        encode_ppm(img),
        encode_png(img),
        encode_jpeg(img, quality=95),
        encode_gif([idx], cols),  # index frames + palette
        tb.encode_bmp(img, bpp=8, rle=True),
        tb.encode_tiff(img, compression="lzw", predictor=2,
                       rows_per_strip=7),
        b"\x00garbage",  # skipped
    ]
    tbl = pa.table({
        "item_id": pa.array(range(len(payloads)), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })
    out = (rd.from_arrow(tbl)
           .map_batches(ImageDecode(height=16, width=16, decoder="auto",
                                    on_error="skip"),
                        batch_size=4, batch_format="pyarrow",
                        concurrency=1)
           ).to_pandas().sort_values("item_id").reset_index(drop=True)
    assert out["item_id"].tolist() == [0, 1, 2, 3, 4, 5]
    for _, row in out.iterrows():
        px = np.asarray(row["pixels"], np.uint8).reshape(16, 16, 3)
        err = np.abs(px.astype(int) - img.astype(int))
        if row["item_id"] == 2:  # JPEG: lossy but close
            assert err.mean() < 12.0
        else:
            assert err.max() == 0, row["item_id"]


def test_tiff_unsupported_and_corrupt_raise_cleanly():
    rgb = _rgb(6, 6)
    good = tb.encode_tiff(rgb, compression="lzw")
    with pytest.raises(ValueError):
        tb.decode_tiff(good[:6])
    with pytest.raises(ValueError):
        tb.decode_tiff(b"XX" + good[2:])
    with pytest.raises(ValueError):
        tb.decode_tiff(good[:-10])  # truncated strip/LZW
    # tiled layout refused with a clear message
    t = bytearray(tb.encode_tiff(rgb))
    # rewrite the first IFD tag id to 322 (TileWidth)
    n_off = struct.unpack("<I", t[4:8])[0]
    struct.pack_into("<H", t, n_off + 2, 322)
    with pytest.raises(ValueError, match="tiled"):
        tb.decode_tiff(bytes(t))

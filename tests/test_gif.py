"""GIF codec (stages/gif.py): LZW round-trips, container features
(interlace, local palettes, transparency, disposal composition), the
header-only meta probe, and the Ray actor-pool stages end-to-end."""

import numpy as np
import pyarrow as pa
import pytest

from iresearch_ray.stages.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_meta,
)


def test_lzw_roundtrip_fuzz():
    """Raw LZW at several alphabet widths, including streams long enough
    to force 12-bit codes and a dictionary reset at 4096 entries."""
    rng = np.random.default_rng(5)
    for mcs in (2, 3, 4, 8):
        for n in (1, 10, 300, 40_000):
            px = rng.integers(0, 1 << mcs, n, dtype=np.uint8).tobytes()
            assert _lzw_decode(_lzw_encode(px, mcs), mcs, n) == px, (mcs, n)
    # highly repetitive input exercises the KwKwK (code == next_code) case
    px = (b"\x01\x01" * 5000) + bytes(range(4)) * 100
    assert _lzw_decode(_lzw_encode(px, 2), 2, len(px)) == px


def test_lzw_golden_hand_decoded():
    """Decode a tiny LZW stream assembled BY HAND from the GIF89a spec's
    bit-packing rules (LSB-first), independent of our encoder — catches a
    symmetric encoder/decoder packing bug that round-trips would hide.

    min_code_size=2: clear=4, eoi=5, first dict code=6, width starts 3.
    Stream: CLEAR(4), 1, 2, code6(=[1,2]), EOI(5).
    After CLEAR: prev=None. '1' → out [1]. '2' → dict[6]=[1,2], out [2].
    '6' → out [1,2] (width grew to 4 after dict hit 8 entries? no — dict
    adds 6 then 7; width grows at next_code==8, not reached).
    Codes at width 3: 100 001 010 110 101 packed LSB-first:
      bits in arrival order: 001(=4) 100(=1)... wait — LSB-first means
      code value's low bit lands in the stream's low bit.  4=0b100, 1=0b001,
      2=0b010, 6=0b110, 5=0b101 → byte0 = 100 | 001<<3 | 010<<6 = 0b10001100
      (0x8C), byte1 = 0(carry of 010=0b010>>2=0) | 110<<1 | 101<<4 =
      0b01011100 | ... computed below in code to avoid arithmetic slips."""
    codes = [(4, 3), (1, 3), (2, 3), (6, 3), (5, 3)]
    bits = 0
    nbits = 0
    out = bytearray()
    for code, width in codes:
        bits |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bits & 0xFF)
            bits >>= 8
            nbits -= 8
    if nbits:
        out.append(bits & 0xFF)
    assert _lzw_decode(bytes(out), 2, 10) == bytes([1, 2, 1, 2])


def test_gif_single_frame_and_interlace():
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (13, 17), dtype=np.uint8)
    for il in (False, True):
        frames = decode_gif(encode_gif([idx], pal, interlace=il))
        assert len(frames) == 1 and frames[0][0] == 0
        assert np.array_equal(frames[0][1], pal[idx])


def test_gif_animation_sampling_and_meta():
    rng = np.random.default_rng(8)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    fr = [rng.integers(0, 16, (8, 8), dtype=np.uint8) for _ in range(7)]
    g = encode_gif(fr, pal, delays_cs=[5] * 7, loop=3)
    out = decode_gif(g, every=2)
    assert [f for f, _ in out] == [0, 2, 4, 6]
    for f, px in out:
        assert np.array_equal(px, pal[fr[f]])
    assert [f for f, _ in decode_gif(g, every=3, limit=2)] == [0, 3]
    meta = gif_meta(g)
    assert meta["version"] == "89a"
    assert meta["n_frames"] == 7
    assert meta["delays_cs"] == [5] * 7
    assert meta["loop"] == 3
    assert meta["width"] == 8 and meta["height"] == 8


def test_gif_delta_frames_transparency_disposal():
    """Region placement + transparent holes + disposal 3 (restore
    previous) and 2 (restore background) — the composition semantics a
    real animated GIF relies on."""
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    base = np.full((10, 10), 3, np.uint8)
    patch = np.full((4, 4), 7, np.uint8)
    patch[0, 0] = 2  # transparent hole
    g = encode_gif(
        [base, patch, patch],
        pal,
        screen=(10, 10),
        regions=[(0, 0), (2, 2), (5, 5)],
        transparent=2,
        disposals=[0, 3, 2],
    )
    out = decode_gif(g)
    f0, f1, f2 = (px for _, px in out)
    assert np.array_equal(f0, pal[base])
    assert np.array_equal(f1[2, 2], f0[2, 2])  # hole keeps prior pixel
    assert np.array_equal(f1[3, 3], pal[7])
    assert np.array_equal(f2[3, 3], f0[3, 3])  # disposal 3 undid frame 1
    assert np.array_equal(f2[6, 6], pal[7])


def test_gif_local_palettes():
    rng = np.random.default_rng(10)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    lp = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    fr = [rng.integers(0, 8, (6, 6), dtype=np.uint8) for _ in range(2)]
    out = decode_gif(encode_gif(fr, pal, local_palettes=[None, lp]))
    assert np.array_equal(out[0][1], pal[fr[0]])
    assert np.array_equal(out[1][1], lp[fr[1]])


def test_gif_rejects_garbage_and_truncation():
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    good = encode_gif([rng.integers(0, 4, (6, 6), dtype=np.uint8)], pal)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"JUNK" + good)
    with pytest.raises(ValueError):
        decode_gif(good[:20])  # cut inside the first block
    # truncated LZW data → pixel-count mismatch, not garbage pixels
    with pytest.raises(ValueError):
        decode_gif(good[:-8] + bytes([0, 0x3B]))


def test_gif_through_ray_stages(ray_session):
    """ImageDecode(decoder='gif') and FrameSample(decoder='gif') over
    genuine GIF bytes — the full actor-pool stages."""
    import ray.data as rd

    from iresearch_ray.stages.multimodal import FrameSample, ImageDecode

    rng = np.random.default_rng(12)
    pal = rng.integers(0, 256, (32, 3), dtype=np.uint8)

    # images
    idxs = [rng.integers(0, 32, (8, 8), dtype=np.uint8) for _ in range(6)]
    tbl = pa.table(
        {
            "item_id": pa.array(range(6), pa.int64()),
            "payload": pa.array(
                [encode_gif([ix], pal, interlace=bool(i % 2)) for i, ix in enumerate(idxs)],
                pa.binary(),
            ),
            "height": pa.array([8] * 6, pa.int32()),
            "width": pa.array([8] * 6, pa.int32()),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            ImageDecode(height=8, width=8, decoder="gif"),
            batch_format="pyarrow",
            batch_size=3,
        )
        .to_pandas()
        .sort_values("item_id")
        .reset_index(drop=True)
    )
    assert len(out) == 6
    for i in range(6):
        got = np.array(list(out["pixels"][i]), dtype=np.uint8).reshape(8, 8, 3)
        assert np.array_equal(got, pal[idxs[i]])

    # animations through FrameSample, every 3rd frame
    vids = []
    fr_all = []
    for _ in range(3):
        fr = [rng.integers(0, 32, (8, 8), dtype=np.uint8) for _ in range(9)]
        fr_all.append(fr)
        vids.append(encode_gif(fr, pal, delays_cs=[4] * 9))
    vtbl = pa.table(
        {
            "item_id": pa.array(range(3), pa.int64()),
            "payload": pa.array(vids, pa.binary()),
            "n_frames": pa.array([9] * 3, pa.int32()),
        }
    )
    vout = (
        rd.from_arrow(vtbl)
        .map_batches(
            FrameSample(every=3, height=8, width=8, decoder="gif"),
            batch_format="pyarrow",
            batch_size=2,
        )
        .to_pandas()
        .sort_values(["item_id", "frame_idx"])
        .reset_index(drop=True)
    )
    assert list(vout["frame_idx"]) == [0, 3, 6] * 3
    for _, row in vout.iterrows():
        got = np.array(list(row["pixels"]), dtype=np.uint8).reshape(8, 8, 3)
        exp = pal[fr_all[int(row["item_id"])][int(row["frame_idx"])]]
        assert np.array_equal(got, exp)

    # corrupt payload with on_error='skip' drops the item, keeps the rest
    bad = pa.table(
        {
            "item_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array([vids[0], b"GIF89a\x01"], pa.binary()),
            "n_frames": pa.array([9, 9], pa.int32()),
        }
    )
    sout = (
        rd.from_arrow(bad)
        .map_batches(
            FrameSample(every=3, height=8, width=8, decoder="gif", on_error="skip"),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    assert sorted(set(sout["item_id"])) == [0]

"""B-slice (bi-prediction + spatial direct) coverage for the from-scratch
H.264 codec.

Verification stance (same as the CAVLC I/P suites): no third-party H.264
implementation exists in this sandbox, so parity is structural — the
fixture encoder drives the decoder's own parse+recon body per macroblock
(bit-exact consumption asserted inside encode_bframe_slice), full
streams decode back in DISPLAY order, and analytic cases pin the
semantics: directZeroPrediction static identity, integer-translation
exactness through both lists, the BI average hitting an exact midpoint,
explicit weighted bi-prediction reproducing a cross-fade exactly, and
the §8.7.2.1 two-list boundary-strength rules as unit cases.
"""
import hashlib

import numpy as np
import pytest

from iresearch_ray.stages import h264


def _rng(seed=3):
    return np.random.default_rng(seed)


def _noise_frame(h=48, w=48, seed=3):
    return _rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


def _gop_frames(n=5, h=48, w=64, seed=11):
    rng = _rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)]
    for k in range(n - 1):
        nxt = np.roll(frames[-1], (k % 3) - 1, axis=1).astype(int)
        nxt += rng.integers(-4, 5, nxt.shape)
        frames.append(np.clip(nxt, 0, 255).astype(np.uint8))
    return frames


# ---------------------------------------------------------------------------
# analytic semantics
# ---------------------------------------------------------------------------


def test_static_scene_b_skip_identity():
    """Lossless (PCM) anchors + static scene: the first B MB has no
    decoded neighbors, so spatial direct derives directZeroPrediction
    (both refIdx < 0 -> 0/0, zero MVs) and every B MB collapses to
    B_Skip; the B picture decodes byte-identical to the anchors and its
    NAL shrinks to a slice header + one skip run."""
    f = _noise_frame()
    st = h264.encode_h264_annexb([f, f, f], qp=20, kinds="pcm",
                                 gop="ibp", b_kinds="bdirect",
                                 p_kinds="p16")
    frames = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in frames] == [0, 1, 2]
    Y0, Cb0, Cr0 = frames[0][1]
    for i in (1, 2):
        for a, b in zip(frames[i][1], (Y0, Cb0, Cr0)):
            assert np.array_equal(a, b)
    # decode order is I, P, B: the LAST NAL is the all-skip B slice
    assert len(st.split(b"\x00\x00\x00\x01")[-1]) < 12


def test_b_direct_zero_prediction_unit():
    """_direct_mb_base on a frame with no decoded neighbors returns the
    directZeroPrediction shape (§8.4.1.2.2: both MinPositive refIdx are
    -1 -> refIdx 0/0, zero MVs)."""
    fr = h264._Frame(4, 4)
    fr.slice_no[:] = 0
    r0, r1, mvp0, mvp1, zero_pred = h264._direct_mb_base(fr, 1, 1)
    assert zero_pred and r0 == 0 and r1 == 0
    assert not mvp0.any() and not mvp1.any()


def test_b_integer_translation_exact_in_interior():
    """B picture of a pure translation midway between its anchors: both
    single-list predictions are exact integer-pel copies, so MBs away
    from the wrap column reconstruct EXACTLY whatever mode the planner
    picks."""
    base = _noise_frame(48, 64, seed=7)
    mid = np.roll(base, 2, axis=1)
    mov = np.roll(base, 4, axis=1)
    st = h264.encode_h264_annexb([base, mid, mov], qp=10, kinds="pcm",
                                 gop="ibp", b_kinds="b16",
                                 p_kinds="p16")
    out = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in out] == [0, 1, 2]
    Y, Cb, Cr = out[1][1]
    src_y, src_cb, src_cr = h264.rgb_to_yuv420(mid)
    assert np.array_equal(Y[:, 16:], src_y[:, 16:])
    assert np.array_equal(Cb[:, 8:], src_cb[:, 8:])
    assert np.array_equal(Cr[:, 8:], src_cr[:, 8:])


def test_b_bi_average_exact_midpoint():
    """Flat anchors at 100 and 104 with a flat 102 B source: the default
    §8.4.2.3.1 BI average (100 + 104 + 1) >> 1 == 102 is exact, the
    planner must pick BI (both single-list SADs are nonzero), and the B
    picture decodes byte-identical to its source."""
    mk = lambda v: np.full((48, 48, 3), v, np.uint8)
    st = h264.encode_h264_annexb([mk(100), mk(102), mk(104)], qp=20,
                                 kinds="pcm", gop="ibp", b_kinds="b16",
                                 p_kinds="i16")
    out = h264.decode_annexb(st, rgb=False)
    Y, _, _ = out[1][1]
    src = h264.rgb_to_yuv420(mk(102))[0]
    assert np.array_equal(Y, src)


def test_weighted_biprediction_crossfade_exact():
    """Explicit weighted bi-prediction (weighted_bipred_idc 1)
    reproduces a 3:1 cross-fade with offsets EXACTLY: with logWD=2,
    w0=3/o0=2, w1=1/o1=5 the §8.4.2.3.2 formula is
    (3*p0 + p1 + 4) >> 3, then + (2+5+1)>>1 = +4 — over lossless (PCM)
    flat anchors 96 and 160 that is (288+160+4)>>3 + 4 == 60, and the
    chroma weights w=4/w=4 at the same denom keep 128 a fixed point —
    so the flat-60 B source quantizes to zero residual everywhere and
    decodes byte-identical."""
    mk = lambda v: np.full((48, 48, 3), v, np.uint8)
    wl0 = [(2, 3, 2, 2, 4, 0, 4, 0)]
    wl1 = [(2, 1, 5, 2, 4, 0, 4, 0)]
    st = h264.encode_h264_annexb([mk(96), mk(60), mk(160)], qp=20,
                                 kinds="pcm", gop="ibr",
                                 b_kinds="b16bi", b_weights=(wl0, wl1))
    out = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in out] == [0, 1, 2]
    Y, Cb, Cr = out[1][1]
    assert (Y == 60).all()
    assert (Cb == 128).all() and (Cr == 128).all()


def test_temporal_direct_constant_velocity_exact():
    """§8.4.1.2.3 temporal direct on a constant-velocity translation:
    the co-located P block carries the full displacement MV, the POC
    ratio tb/td = 2/4 scales it to exactly half (mvL0 = (128*mvCol+128)
    >> 8), and mvL1 = mvL0 - mvCol points the mirrored half into the
    future anchor — so every direct B MB has zero residual and B_Skips
    to an EXACT reconstruction in the interior.  Spatial direct CANNOT
    do this at the first MB (no neighbors -> directZeroPrediction), so
    this pins the temporal path specifically."""
    base = _noise_frame(48, 64, seed=7)
    mid = np.roll(base, 1, axis=1)
    mov = np.roll(base, 2, axis=1)
    st = h264.encode_h264_annexb([base, mid, mov], qp=10, kinds="pcm",
                                 gop="ibp", b_kinds="bdirect",
                                 p_kinds="p16", b_direct="temporal")
    out = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in out] == [0, 1, 2]
    Y, Cb, Cr = out[1][1]
    src_y, src_cb, src_cr = h264.rgb_to_yuv420(mid)
    # interior LUMA only: the roll wraps at the left edge (L0 side) and
    # the mirrored mvL1 reads one past the right edge (clamped pad), so
    # the outermost MB columns legitimately carry residual; chroma of a
    # 1-luma-pel shift lands on a HALF chroma pel (bilinear ≠ the 2x2
    # subsampling mean), so chroma is residual-coded — near, not equal
    assert np.array_equal(Y[:, 16:48], src_y[:, 16:48])
    assert np.abs(Cb[:, 8:24].astype(int)
                  - src_cb[:, 8:24].astype(int)).max() <= 3


def test_implicit_weights_unit():
    """§8.4.2.3.1 implicit weights: equal POC distance -> 32/32; a B at
    1/4 of the anchor gap weighs the NEAR anchor 48 and the far one 16;
    coincident anchors fall back to 32/32."""
    mk = lambda poc: h264._RefPic(np.zeros((16, 16)), np.zeros((8, 8)),
                                  np.zeros((8, 8)), poc=poc)
    w = h264._implicit_weights([mk(0)], [mk(4)], 2)
    assert w[(0, 0)] == (32, 32)
    w = h264._implicit_weights([mk(0)], [mk(8)], 2)
    assert w[(0, 0)] == (48, 16)
    w = h264._implicit_weights([mk(0)], [mk(8)], 6)
    assert w[(0, 0)] == (16, 48)
    w = h264._implicit_weights([mk(4)], [mk(4)], 2)
    assert w[(0, 0)] == (32, 32)


def test_implicit_weighted_biprediction_exact_ramp():
    """Implicit weighting end-to-end: flat PCM anchors 96 (POC 0) and
    160 (POC 8) with three B pictures between them.  The POC-distance
    weights are (48,16)/(32,32)/(16,48), so the exact implicit
    predictions are 112 / 128 / 144 — sources built to those values
    decode byte-identical, and chroma 128 stays a fixed point for every
    pair (w0 + w1 == 64)."""
    mk = lambda v: np.full((48, 48, 3), v, np.uint8)
    seq = [mk(96), mk(112), mk(128), mk(144), mk(160)]
    st = h264.encode_h264_annexb(seq, qp=20, kinds="pcm", gop="ibbbp",
                                 b_kinds="b16bi", p_kinds="i16",
                                 b_weights="implicit")
    out = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in out] == [0, 1, 2, 3, 4]
    for i, want in ((1, 112), (2, 128), (3, 144)):
        Y, Cb, Cr = out[i][1]
        assert (Y == want).all(), i
        assert (Cb == 128).all() and (Cr == 128).all()


@pytest.mark.parametrize("b_direct,b_weights", [
    ("temporal", None), ("spatial", "implicit"), ("temporal", "implicit"),
])
def test_gop_roundtrip_direct_and_weight_modes(b_direct, b_weights):
    frames = _gop_frames(5, seed=31)
    st = h264.encode_h264_annexb(frames, qp=22, kinds="i16", gop="ibpbp",
                                 b_kinds="bmix", p_kinds="p16",
                                 b_direct=b_direct, b_weights=b_weights,
                                 deblock_idc=0, n_refs=2)
    out = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in out] == [0, 1, 2, 3, 4]
    for (i, (Y, _, _)), f in zip(out, frames):
        src = h264.rgb_to_yuv420(f)[0].astype(int)
        assert np.abs(Y.astype(int) - src).mean() < 4.5, i


def test_flat_static_deblock_on_b_bs_zero():
    """Flat static scene with the loop filter ON and a B picture whose
    blocks all carry the same (picture, mv) prediction sets: §8.7.2.1
    must give bS 0 on every internal edge, so the filter must not touch
    a single sample."""
    flat = np.full((48, 48, 3), 128, np.uint8)
    st = h264.encode_h264_annexb([flat, flat, flat], qp=30, kinds="i16",
                                 gop="ibp", b_kinds="bdirect",
                                 p_kinds="p16", deblock_idc=0)
    for i, (Y, Cb, Cr) in h264.decode_annexb(st, rgb=False):
        assert (Y == 128).all() and (Cb == 128).all() and (Cr == 128).all()


# ---------------------------------------------------------------------------
# §8.7.2.1 two-list boundary strength (unit cases)
# ---------------------------------------------------------------------------


def _bi_frame():
    fr = h264._Frame(2, 1)  # two MBs side by side
    fr.slice_no[:] = 0
    fr.tcY[:] = 0
    return fr


def _fill(fr, mbx, refi0, mv0, pid0, refi1=None, mv1=None, pid1=None):
    s = np.s_[0:4, 4 * mbx:4 * mbx + 4]
    fr.refi[s] = refi0
    fr.mv[s] = mv0
    fr.pid0[s] = pid0
    if refi1 is not None:
        fr.refi1[s] = refi1
        fr.mv1[s] = mv1
        fr.pid1[s] = pid1


def test_bs_bipred_same_pictures_crossed_pairing_is_zero():
    """p predicts (picA, mvX) from L0 and (picB, mvY) from L1; q holds
    the SAME predictions with the lists SWAPPED: the picture-paired MV
    comparison passes, so bS must be 0 — a list-index comparison would
    wrongly give 1."""
    fr = _bi_frame()
    _fill(fr, 0, 0, (8, 0), 7, refi1=0, mv1=(0, 8), pid1=9)
    _fill(fr, 1, 0, (0, 8), 9, refi1=0, mv1=(8, 0), pid1=7)
    assert h264._bs_seg(fr, 0, 3, 0, 4, True) == 0


def test_bs_bipred_vs_unipred_and_picture_mismatch():
    fr = _bi_frame()
    _fill(fr, 0, 0, (0, 0), 7, refi1=0, mv1=(0, 0), pid1=9)
    _fill(fr, 1, 0, (0, 0), 7)  # one MV vs two -> bS 1
    assert h264._bs_seg(fr, 0, 3, 0, 4, True) == 1
    fr = _bi_frame()
    _fill(fr, 0, 0, (0, 0), 7)
    _fill(fr, 1, 0, (0, 0), 8)  # different picture -> bS 1
    assert h264._bs_seg(fr, 0, 3, 0, 4, True) == 1


def test_bs_same_picture_twice_either_pairing_passes():
    """Both sides predict twice from ONE picture: bS is 1 only if BOTH
    pairings fail the quarter-pel distance test."""
    fr = _bi_frame()
    _fill(fr, 0, 0, (0, 0), 7, refi1=1, mv1=(8, 8), pid1=7)
    _fill(fr, 1, 0, (8, 8), 7, refi1=1, mv1=(0, 0), pid1=7)
    assert h264._bs_seg(fr, 0, 3, 0, 4, True) == 0  # crossed pairing
    fr = _bi_frame()
    _fill(fr, 0, 0, (0, 0), 7, refi1=1, mv1=(8, 8), pid1=7)
    _fill(fr, 1, 0, (8, 8), 7, refi1=1, mv1=(16, 0), pid1=7)
    assert h264._bs_seg(fr, 0, 3, 0, 4, True) == 1  # both pairings fail


# ---------------------------------------------------------------------------
# round-trips over the B mode surface
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("b_kinds", ["bdirect", "b16", "b16bi", "b16x8",
                                     "b8x16", "b8x8", "bmix"])
def test_gop_roundtrip_b_kinds(b_kinds):
    """Every B macroblock shape (incl. B_Direct_8x8 sub-blocks and
    intra-in-B via bmix) survives the encoder's per-MB decode-drive and
    a full decode-back in display order, with stable quality."""
    frames = _gop_frames(5)
    st = h264.encode_h264_annexb(frames, qp=22, kinds="i16", gop="ibpbp",
                                 b_kinds=b_kinds, p_kinds="p16")
    out = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in out] == [0, 1, 2, 3, 4]
    for (i, (Y, _, _)), f in zip(out, frames):
        src = h264.rgb_to_yuv420(f)[0].astype(int)
        assert np.abs(Y.astype(int) - src).mean() < 4.5, (b_kinds, i)


def test_b_roundtrip_deblock_multislice_and_second_gop():
    """Loop filter on, two slices per picture, and a second IDR GOP:
    held-back B pictures straddling the IDR keep their display slots."""
    frames = _gop_frames(7, seed=19)
    st = h264.encode_h264_annexb(frames, qp=24, kinds="mixed",
                                 gop="ibp", b_kinds="bmix",
                                 p_kinds="pmix", slices=2, deblock_idc=0)
    out = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in out] == list(range(7))
    for (i, (Y, _, _)), f in zip(out, frames):
        src = h264.rgb_to_yuv420(f)[0].astype(int)
        assert np.abs(Y.astype(int) - src).mean() < 5.5, i


def test_b_multiple_references_both_lists():
    """n_refs=2 exercises te(v) ref_idx signalling in BOTH lists (the B
    default lists mix past and future, so list 0 holds two entries once
    two anchors precede the B in POC terms)."""
    frames = _gop_frames(5, seed=13)
    st = h264.encode_h264_annexb(frames, qp=22, kinds="i16",
                                 gop="ippbp", b_kinds="bmix",
                                 p_kinds="p16", n_refs=2)
    out = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in out] == [0, 1, 2, 3, 4]
    for (i, (Y, _, _)), f in zip(out, frames):
        src = h264.rgb_to_yuv420(f)[0].astype(int)
        assert np.abs(Y.astype(int) - src).mean() < 4.5, i


def test_b_sampling_keeps_reference_chain_and_display_slots():
    """every=2 samples on DECODE order but display indices stay stable:
    anchors still decode (they are references) and sampled frames
    byte-match the full decode."""
    frames = _gop_frames(6, seed=21)
    st = h264.encode_h264_annexb(frames, qp=20, kinds="i16", gop="ibpbp",
                                 b_kinds="b16", p_kinds="p16")
    full = dict(h264.decode_annexb(st, rgb=False))
    out = h264.decode_annexb(st, every=2, rgb=False)
    # decode order of display [i b p b p | i]: [0, 2, 1, 4, 3, 5];
    # sampled decode slots 0/2/4 are display frames 0, 1, 3
    assert [i for i, _ in out] == [0, 1, 3]
    for i, planes in out:
        for a, b in zip(planes, full[i]):
            assert np.array_equal(a, b)


def test_trailing_b_without_future_anchor_becomes_p():
    frames = _gop_frames(4, seed=9)
    st = h264.encode_h264_annexb(frames, qp=22, kinds="i16", gop="ipbb",
                                 b_kinds="b16", p_kinds="p16")
    out = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in out] == [0, 1, 2, 3]


def test_cabac_b_raises():
    frames = _gop_frames(3)
    with pytest.raises(ValueError, match="CABAC P/B"):
        h264.encode_h264_annexb(frames, qp=24, gop="ibp",
                                entropy="cabac")


def test_mp4_avc1_b_frames_roundtrip_and_sampling():
    """avc1 MP4 with an IBP GOP: samples decode through the MP4 walk in
    display order, and every=2 sampling still threads the reference
    chain while skipped frames keep their display slots."""
    from iresearch_ray.stages import mp4

    frames = _gop_frames(5, h=32, w=48, seed=5)
    v = mp4.encode_mp4_h264(frames, fps=5, qp=20, kinds="i16", gop="ibp")
    meta = mp4.mp4_meta(v)
    assert (meta["codec"], meta["n_frames"]) == ("avc1", 5)
    out = mp4.decode_mp4_h264(v, every=1, rgb=False)
    assert [i for i, _ in out] == [0, 1, 2, 3, 4]
    for (i, (Y, _, _)), f in zip(out, frames):
        src = h264.rgb_to_yuv420(f)[0].astype(int)
        assert np.abs(Y.astype(int) - src).mean() < 4.0, i
    full = dict(out)
    out2 = mp4.decode_mp4_h264(v, every=2, rgb=False)
    for i, planes in out2:
        for a, b in zip(planes, full[i]):
            assert np.array_equal(a, b)


def test_corrupt_b_stream_fuzz_raises_cleanly():
    """Truncations and byte flips over a real IBP stream (both direct
    modes, implicit weighting) must surface as ValueError (or decode
    fine when the damage misses live bits) — never IndexError or another
    internal crash.  The B layer adds new parse surfaces (POC fields,
    direct flag, two ref lists, B mb/sub types, co-located lookups), so
    it gets its own fuzz."""
    frames = _gop_frames(4, h=32, w=32, seed=31)
    streams = [
        h264.encode_h264_annexb(frames, qp=22, kinds="i16", gop="ibp",
                                b_kinds="bmix", p_kinds="p16",
                                deblock_idc=0),
        h264.encode_h264_annexb(frames, qp=24, kinds="i16", gop="ibpb",
                                b_direct="temporal",
                                b_weights="implicit"),
    ]
    rng = _rng(33)
    for st in streams:
        for cut in sorted(rng.integers(10, len(st), 25).tolist()):
            try:
                h264.decode_annexb(st[:cut], rgb=False)
            except ValueError:
                pass
        for _ in range(60):
            pos = int(rng.integers(8, len(st)))
            bad = bytearray(st)
            bad[pos] ^= int(rng.integers(1, 256))
            try:
                h264.decode_annexb(bytes(bad), rgb=False)
            except ValueError:
                pass


def test_golden_b_stream_and_planes_pinned():
    """sha256-pinned B-stream golden: any change to the B bitstream
    layout, the two-list MV prediction, spatial direct, bi-prediction
    rounding, POC emission, or the B deblock bS derivation shows up here
    (regenerate deliberately, never accidentally)."""
    frames = _gop_frames(4, seed=23)
    st = h264.encode_h264_annexb(frames, qp=20, kinds="mixed", gop="ibp",
                                 b_kinds="bmix", p_kinds="pmix",
                                 deblock_idc=0)
    out = h264.decode_annexb(st, rgb=False)
    Y, Cb, Cr = out[1][1]
    assert hashlib.sha256(st).hexdigest() == \
        "40b3ad0db275962acb2d7290e35ee2f10e1e6a7bb601d6a1101e78f9d9088d7e"
    assert hashlib.sha256(
        Y.tobytes() + Cb.tobytes() + Cr.tobytes()).hexdigest() == \
        "2414eb59f2a73d7c1407af8d38520cf325dd6b568ff5bff94cf1fd2ffb59916c"

"""P-slice (inter prediction) coverage for the from-scratch H.264 codec.

Verification stance (same as the CAVLC/CABAC I-slice suites): no
third-party H.264 implementation exists in this sandbox, so parity is
structural — the fixture encoder drives the decoder's own parse+recon
body per macroblock (bit-exact consumption asserted inside
encode_pframe_slice), full streams decode back, and analytic cases pin
the semantics (all-skip identity, integer-translation exactness, the
6-tap interpolator reproducing affine signals exactly).
"""
import hashlib
import struct

import numpy as np
import pyarrow as pa
import pytest

from iresearch_ray.stages import h264


def _rng(seed=3):
    return np.random.default_rng(seed)


def _noise_frame(h=48, w=48, seed=3):
    return _rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# interpolation kernels (§8.4.2.2)
# ---------------------------------------------------------------------------


def test_mc_luma_affine_exact_all_16_positions():
    """The 6-tap [1,-5,20,20,-5,1]/32 reproduces affine signals exactly,
    and the quarter-pel averages stay exact when the quarter step is an
    integer — so a ramp pins every one of the 16 sub-pel positions
    analytically.  ASYMMETRIC slopes (4/pel in x, 8/pel in y) so a
    transposed position mapping cannot cancel out."""
    h = w = 6
    pad = 6
    ys, xs = np.mgrid[0:h + 2 * pad, 0:w + 2 * pad]
    ref = (4 * xs + 8 * ys).astype(np.int64)  # max 12*17 = 204 < 256
    for mvy in range(-4, 8):
        for mvx in range(-4, 8):
            got = h264._mc_luma(ref, pad, pad, w, h, mvx, mvy)
            want = ref[pad:pad + h, pad:pad + w] + mvx + 2 * mvy
            assert np.array_equal(got, want), (mvx, mvy)


def test_mc_luma_integer_copy_and_bounds():
    ref = _rng(1).integers(0, 256, (40, 40)).astype(np.int64)
    got = h264._mc_luma(ref, 8, 8, 16, 16, 4, -8)
    assert np.array_equal(got, ref[6:22, 9:25])
    with pytest.raises(ValueError, match="padded range"):
        h264._mc_luma(ref, 0, 0, 16, 16, -64, 0)


def test_mc_chroma_affine_exact_all_64_positions():
    """Bilinear eighth-pel on an asymmetric ramp (8/pel x, 16/pel y) is
    exact at every fraction."""
    h = w = 3
    pad = 3
    ys, xs = np.mgrid[0:h + 2 * pad, 0:w + 2 * pad]
    ref = (8 * xs + 16 * ys).astype(np.int64)  # max 24*8 = 192
    for mvy in range(-8, 16):
        for mvx in range(-8, 16):
            got = h264._mc_chroma(ref, pad, pad, w, h, mvx, mvy)
            want = ref[pad:pad + h, pad:pad + w] + mvx + 2 * mvy
            assert np.array_equal(got, want), (mvx, mvy)


# ---------------------------------------------------------------------------
# MV prediction (§8.4.1.3) and P_Skip MV (§8.4.1.1)
# ---------------------------------------------------------------------------


def _frame_with_nbrs(nbrs):
    """4x4-MB frame; nbrs = {(mby, mbx): (refi, (mvx, mvy)) | 'intra'}."""
    fr = h264._Frame(4, 4)
    fr.cur_slice = 0
    for (mby, mbx), v in nbrs.items():
        fr.slice_no[mby, mbx] = 0
        fr.mb_done[mby, mbx] = True
        s = np.s_[4 * mby:4 * mby + 4, 4 * mbx:4 * mbx + 4]
        if v == "intra":
            continue  # refi stays -1 (available, intra)
        r, mv = v
        fr.refi[s] = r
        fr.mv[s] = mv
        fr.mvdec[s] = True
    return fr


def test_mv_pred_median_and_single_match():
    # A, B, C all inter ref0 -> component-wise median
    fr = _frame_with_nbrs({(1, 0): (0, (8, 0)), (0, 1): (0, (0, 12)),
                           (0, 2): (0, (4, 4))})
    fr.slice_no[1, 1] = 0
    mvp = h264._mv_pred(fr, 4, 4, 4, 4, 0)
    assert tuple(mvp) == (4, 4)
    # exactly one neighbor matches the ref -> its mv verbatim
    fr = _frame_with_nbrs({(1, 0): (1, (8, 0)), (0, 1): (0, (0, 12)),
                           (0, 2): (1, (4, 4))})
    fr.slice_no[1, 1] = 0
    assert tuple(h264._mv_pred(fr, 4, 4, 4, 4, 0)) == (0, 12)
    # B and C unavailable, A available -> mvA (even when A's ref differs)
    fr = _frame_with_nbrs({(1, 0): (0, (-4, 8))})
    fr.slice_no[1, 1] = 0
    assert tuple(h264._mv_pred(fr, 4, 4, 4, 4, 0)) == (-4, 8)
    # intra neighbors contribute zero vectors to the median
    fr = _frame_with_nbrs({(1, 0): "intra", (0, 1): (0, (0, 12)),
                           (0, 2): (0, (4, 4))})
    fr.slice_no[1, 1] = 0
    assert tuple(h264._mv_pred(fr, 4, 4, 4, 4, 0)) == (0, 4)


def test_mv_pred_directional_partitions():
    fr = _frame_with_nbrs({(1, 0): (0, (8, 0)), (0, 1): (0, (0, 12)),
                           (0, 2): (0, (4, 4))})
    fr.slice_no[1, 1] = 0
    # 16x8 top takes B when refs match; bottom takes A
    assert tuple(h264._mv_pred(fr, 4, 4, 4, 2, 0, "16x8_top")) == (0, 12)
    assert tuple(h264._mv_pred(fr, 4, 4, 4, 2, 0, "16x8_bot")) == (8, 0)
    # 8x16 left takes A; right takes C (above-right of the partition)
    assert tuple(h264._mv_pred(fr, 4, 4, 2, 4, 0, "8x16_left")) == (8, 0)
    assert tuple(h264._mv_pred(fr, 6, 4, 2, 4, 0, "8x16_right")) == (4, 4)


def test_skip_mv_edge_conditions():
    # top-left MB: A and B unavailable -> zero MV
    fr = h264._Frame(4, 4)
    fr.slice_no[0, 0] = 0
    assert tuple(h264._skip_mv(fr, 0, 0)) == (0, 0)
    # zero-MV ref0 neighbor forces zero
    fr = _frame_with_nbrs({(1, 0): (0, (0, 0)), (0, 1): (0, (4, 8)),
                           (0, 2): (0, (4, 8))})
    fr.slice_no[1, 1] = 0
    assert tuple(h264._skip_mv(fr, 4, 4)) == (0, 0)
    # otherwise: the 16x16 predictor
    fr = _frame_with_nbrs({(1, 0): (0, (8, 4)), (0, 1): (0, (4, 8)),
                           (0, 2): (0, (4, 8))})
    fr.slice_no[1, 1] = 0
    assert tuple(h264._skip_mv(fr, 4, 4)) == (4, 8)


# ---------------------------------------------------------------------------
# analytic whole-stream cases
# ---------------------------------------------------------------------------


def test_static_scene_all_skip_identity():
    """Lossless (PCM) I reference + static scene: every P MB collapses to
    P_Skip and the P pictures decode byte-identical to the I picture; the
    P NALs shrink to a slice header + one skip run."""
    f = _noise_frame()
    st = h264.encode_h264_annexb([f, f, f], qp=20, kinds="pcm",
                                 gop="ipp", p_kinds="p16")
    frames = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in frames] == [0, 1, 2]
    Y0, Cb0, Cr0 = frames[0][1]
    for i in (1, 2):
        for a, b in zip(frames[i][1], (Y0, Cb0, Cr0)):
            assert np.array_equal(a, b)
    nal_sizes = [len(p) for p in st.split(b"\x00\x00\x00\x01")[1:]]
    assert nal_sizes[-1] < 10 and nal_sizes[-2] < 10  # all-skip P NALs


def test_integer_translation_exact_in_interior():
    """P picture of a pure 2-pel translation over a lossless reference:
    MBs away from the wrap column reconstruct EXACTLY through MC alone."""
    base = _noise_frame(48, 64, seed=7)
    mov = np.roll(base, 2, axis=1)
    st = h264.encode_h264_annexb([base, mov], qp=10, kinds="pcm",
                                 gop="ip", p_kinds="p16")
    (i0, _), (i1, (Y, Cb, Cr)) = h264.decode_annexb(st, rgb=False)
    src_y, src_cb, src_cr = h264.rgb_to_yuv420(mov)
    assert np.array_equal(Y[:, 16:], src_y[:, 16:])
    assert np.array_equal(Cb[:, 8:], src_cb[:, 8:])
    assert np.array_equal(Cr[:, 8:], src_cr[:, 8:])


def test_flat_static_deblock_on_bs_zero():
    """Flat static scene with the loop filter ON: P MBs are all P_Skip
    with equal MVs, equal refs and no coefficients — boundary strength 0
    everywhere, so the filter must not touch a single sample."""
    flat = np.full((48, 48, 3), 128, np.uint8)
    st = h264.encode_h264_annexb([flat, flat, flat], qp=30, kinds="i16",
                                 gop="ipp", p_kinds="p16", deblock_idc=0)
    for i, (Y, Cb, Cr) in h264.decode_annexb(st, rgb=False):
        assert (Y == 128).all() and (Cb == 128).all() and (Cr == 128).all()


# ---------------------------------------------------------------------------
# round-trips over the partition/mode surface
# ---------------------------------------------------------------------------


def _gop_frames(n=5, h=48, w=64, seed=11):
    rng = _rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)]
    for k in range(n - 1):
        nxt = np.roll(frames[-1], (k % 3) - 1, axis=1).astype(int)
        nxt += rng.integers(-4, 5, nxt.shape)
        frames.append(np.clip(nxt, 0, 255).astype(np.uint8))
    return frames


@pytest.mark.parametrize("p_kinds", ["p16", "p16x8", "p8x16", "p8x8",
                                     "pmix"])
def test_gop_roundtrip_partitions(p_kinds):
    """Every P partition shape (incl. sub-8x8 and intra-in-P via pmix)
    survives the encoder's per-MB decode-drive and a full decode-back,
    with stable quality across the GOP."""
    frames = _gop_frames(4)
    st = h264.encode_h264_annexb(frames, qp=22, kinds="i16", gop="ippp",
                                 p_kinds=p_kinds)
    out = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in out] == [0, 1, 2, 3]
    for (i, (Y, _, _)), f in zip(out, frames):
        src = h264.rgb_to_yuv420(f)[0].astype(int)
        assert np.abs(Y.astype(int) - src).mean() < 4.0, (p_kinds, i)


def test_gop_roundtrip_deblock_and_multislice():
    frames = _gop_frames(4)
    st = h264.encode_h264_annexb(frames, qp=24, kinds="mixed", gop="ippp",
                                 p_kinds="pmix", slices=2, deblock_idc=0)
    out = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in out] == [0, 1, 2, 3]
    for (i, (Y, _, _)), f in zip(out, frames):
        src = h264.rgb_to_yuv420(f)[0].astype(int)
        assert np.abs(Y.astype(int) - src).mean() < 5.0, i


def test_sampling_still_decodes_reference_chain():
    """every=2 must still decode the odd P pictures (they are references
    for the sampled ones)."""
    frames = _gop_frames(5)
    st = h264.encode_h264_annexb(frames, qp=20, kinds="i16", gop="ipppp",
                                 p_kinds="p16")
    out = h264.decode_annexb(st, every=2, rgb=False)
    assert [i for i, _ in out] == [0, 2, 4]
    full = dict(h264.decode_annexb(st, rgb=False))
    for i, planes in out:
        for a, b in zip(planes, full[i]):
            assert np.array_equal(a, b)


def test_idr_resets_reference_chain():
    frames = _gop_frames(4)
    st = h264.encode_h264_annexb(frames, qp=20, kinds="i16", gop="ip",
                                 p_kinds="p16")  # i p i p
    out = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in out] == [0, 1, 2, 3]


def test_non_idr_intra_refresh():
    """gop pattern 'r' emits NON-IDR intra pictures (nal_type 1, I
    slices, non-IDR header): they decode in BOTH entropy coders and keep
    the reference chain alive for following P pictures."""
    frames = _gop_frames(4)
    # CAVLC: i p r p — the final P references the refresh picture
    st = h264.encode_h264_annexb(frames, qp=22, kinds="i16", gop="iprp",
                                 p_kinds="p16")
    out = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in out] == [0, 1, 2, 3]
    for (i, (Y, _, _)), f in zip(out, frames):
        src = h264.rgb_to_yuv420(f)[0].astype(int)
        assert np.abs(Y.astype(int) - src).mean() < 4.0, i
    # the refresh NAL really is non-IDR (type 1) and carries I slices
    nal_types = [nt for nt, _ in h264.split_annexb(st)]
    assert nal_types == [7, 8, 5, 1, 1, 1]
    # CABAC: non-IDR I pictures decode too (unlike CABAC P, which skips)
    st2 = h264.encode_h264_annexb(frames[:2], qp=22, kinds="i16", gop="ir",
                                  entropy="cabac")
    out2 = h264.decode_annexb(st2, rgb=False)
    assert [i for i, _ in out2] == [0, 1]


def test_cabac_gop_raises():
    with pytest.raises(ValueError, match="CABAC P"):
        h264.encode_h264_annexb([_noise_frame()], qp=20, gop="ipp",
                                entropy="cabac")


@pytest.mark.parametrize("n_refs", [2, 3])
def test_multiple_reference_frames(n_refs):
    """Alternating scenes make the 2-back reference a near-perfect match
    while the previous frame is noise — so the encoder must pick
    ref_idx 1 (signalled as te(v): single inverted bit at 2 refs, ue(v)
    at 3) and the decoder must motion-compensate from the right DPB
    entry.  Evidence: the multi-ref P NALs are far smaller AND decode
    far closer to the source than the single-ref encode of the same
    sequence."""
    rng = _rng(17)
    A = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    B = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    seq = [A, B, A, B]  # frames 2/3 match refs two back, not one back
    sizes = {}
    for nr in (1, n_refs):
        st = h264.encode_h264_annexb(seq, qp=16, kinds="pcm", gop="ippp",
                                     p_kinds="p16", n_refs=nr)
        nals = st.split(b"\x00\x00\x00\x01")[1:]
        sizes[nr] = sum(len(n) for n in nals[4:])  # P NALs of frames 2+3
        out = h264.decode_annexb(st, rgb=False)
        assert [i for i, _ in out] == [0, 1, 2, 3]
        if nr > 1:
            # frame 2 = scene A over a LOSSLESS 2-back A reference: the
            # encoder must pick ref_idx 1 with zero MV and zero residual,
            # so it decodes byte-identical to the PCM IDR
            for a, b in zip(out[2][1], out[0][1]):
                assert np.array_equal(a, b)
    assert sizes[n_refs] < sizes[1] / 4, sizes


@pytest.mark.parametrize("wp,fade", [
    # 75% multiplicative fade: w=3, denom=2 — ((v*3 + 2) >> 4-2) matches
    ((2, 3, 0, 0, 1, 0, 1, 0), lambda v: (v * 3 + 2) >> 2),
    # additive brightening: denom=0, w=1, o=9
    ((0, 1, 9, 0, 1, 0, 1, 0), lambda v: v + 9),
])
def test_weighted_prediction_fade_exact(wp, fade):
    """Explicit weighted prediction reproduces a fade EXACTLY: grayscale
    frames keep Y == gray value and chroma == 128 through the RGB
    conversion, the faded frame equals the §8.4.2.3.2 weighted transform
    of the lossless reference, so every P MB has zero residual and the
    picture decodes byte-identical to the source."""
    rng = _rng(29)
    v0 = rng.integers(40, 200, (48, 48), dtype=np.uint8)
    f0 = np.repeat(v0[:, :, None], 3, axis=2)
    v1 = fade(v0.astype(np.int64)).astype(np.uint8)
    f1 = np.repeat(v1[:, :, None], 3, axis=2)
    st = h264.encode_h264_annexb([f0, f1], qp=20, kinds="pcm", gop="ip",
                                 p_kinds="p16", p_weights=[wp])
    out = h264.decode_annexb(st, rgb=False)
    assert [i for i, _ in out] == [0, 1]
    Y, Cb, Cr = out[1][1]
    assert np.array_equal(Y, v1)
    assert (Cb == 128).all() and (Cr == 128).all()
    # the whole P picture is weighted P_Skip: header + one skip run
    assert len(st.split(b"\x00\x00\x00\x01")[-1]) < 12


def test_mp4_avc1_p_frames_roundtrip_and_sampling():
    """avc1 MP4 with an IPPP GOP: every sample decodes through the MP4
    walk (one sample = one access unit), and every=2 sampling still
    threads the P reference chain (sampled frames byte-match the full
    decode)."""
    from iresearch_ray.stages import mp4

    frames = _gop_frames(4, h=32, w=48, seed=5)
    v = mp4.encode_mp4_h264(frames, fps=5, qp=20, kinds="i16", gop="ippp",
                            p_kinds="pmix")
    meta = mp4.mp4_meta(v)
    assert (meta["codec"], meta["n_frames"]) == ("avc1", 4)
    out = mp4.decode_mp4_h264(v, every=1, rgb=False)
    assert [i for i, _ in out] == [0, 1, 2, 3]
    for (i, (Y, _, _)), f in zip(out, frames):
        src = h264.rgb_to_yuv420(f)[0].astype(int)
        assert np.abs(Y.astype(int) - src).mean() < 4.0, i
    full = dict(out)
    out2 = mp4.decode_mp4_h264(v, every=2, rgb=False)
    assert [i for i, _ in out2] == [0, 2]
    for i, planes in out2:
        for a, b in zip(planes, full[i]):
            assert np.array_equal(a, b)


def test_corrupt_stream_fuzz_raises_cleanly():
    """Truncations and byte flips over a real IPPP stream must surface as
    ValueError (or decode fine when the damage misses live bits) — never
    IndexError or another internal crash.  At corpus scale corrupt files
    are a certainty; a clean error type is what on_error='skip' keys on."""
    frames = _gop_frames(3, h=32, w=32, seed=31)
    streams = [
        h264.encode_h264_annexb(frames, qp=22, kinds="i16", gop="ipp",
                                p_kinds="pmix", deblock_idc=0),
        h264.encode_h264_annexb(frames[:2], qp=24, kinds="mix",
                                entropy="cabac"),
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


def test_frame_sample_on_error_skip():
    """A corrupt video payload in a batch drops ONLY its own rows under
    on_error='skip' (all-or-nothing per item), and still raises under the
    default strict mode."""
    from iresearch_ray.stages import mp4
    from iresearch_ray.stages.multimodal import FrameSample

    frames = _gop_frames(3, h=32, w=32, seed=35)
    good = mp4.encode_mp4_h264(frames, fps=5, qp=20, kinds="i16",
                               gop="ipp", p_kinds="p16")
    bad = good[:200] + bytes(40) + good[260:]  # clobber moov/mdat bytes
    batch = pa.table({
        "item_id": pa.array([0, 1, 2], pa.int64()),
        "payload": pa.array([good, bad, good], pa.binary()),
        "mime": pa.array(["video/mp4"] * 3),
        "n_frames": pa.array([3] * 3, pa.int32()),
        "fps": pa.array([5.0] * 3, pa.float32()),
    })
    out = FrameSample(every=1, height=32, width=32, decoder="h264_mp4",
                      on_error="skip")(batch)
    assert sorted(set(out["item_id"].to_pylist())) == [0, 2]
    assert out.num_rows == 6  # 3 frames from each surviving item
    with pytest.raises((ValueError, struct.error)):
        FrameSample(every=1, height=32, width=32, decoder="h264_mp4")(batch)


def test_image_decode_on_error_skip():
    from iresearch_ray.stages.multimodal import ImageDecode, encode_ppm

    rng = _rng(37)
    px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    good = encode_ppm(px)
    batch = pa.table({
        "item_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([good, b"garbage"], pa.binary()),
        "mime": pa.array(["image/x-ppm"] * 2),
        "width": pa.array([8, 8], pa.int32()),
        "height": pa.array([8, 8], pa.int32()),
    })
    out = ImageDecode(height=8, width=8, decoder="ppm", on_error="skip")(batch)
    assert out["item_id"].to_pylist() == [0]
    got = np.asarray(out["pixels"].combine_chunks().flatten()).reshape(8, 8, 3)
    assert np.array_equal(got, px)
    with pytest.raises(ValueError):
        ImageDecode(height=8, width=8, decoder="ppm")(batch)


def test_golden_p_stream_and_planes_pinned():
    """sha256-pinned P-stream golden: any change to the inter bitstream
    layout, MV prediction, interpolation, or deblock bS derivation shows
    up here (regenerate deliberately, never accidentally)."""
    frames = _gop_frames(3, seed=23)
    st = h264.encode_h264_annexb(frames, qp=20, kinds="mixed", gop="ipp",
                                 p_kinds="pmix", deblock_idc=0)
    Y, Cb, Cr = h264.decode_annexb(st, rgb=False)[2][1]
    assert hashlib.sha256(st).hexdigest() == \
        "8b06d8f0f5ae145393fadd109d09be57de46d07a3c70820bb07e266db310a93b"
    assert hashlib.sha256(
        Y.tobytes() + Cb.tobytes() + Cr.tobytes()).hexdigest() == \
        "0c332155d745dabe10cf8f133b1bda3fae6ace6f70bfc931ae9d5391228e092c"

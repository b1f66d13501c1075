"""From-scratch H.264 baseline I-frame codec (stages/h264.py) + MP4 avc1
integration (stages/mp4.py) — closes VERDICT r4 "What's missing #1".

Validation strategy (no external H.264 implementation exists in this
sandbox — disclosed in the module header):
- STRUCTURAL: every CAVLC VLC table is a prefix-free code with Kraft ≤ 1
  (the spec tables legitimately reserve some codespace, so Kraft < 1 is
  allowed; any transcription typo that merges/collides codewords fails);
- BEHAVIOURAL: byte-exact encode→decode round-trips over fuzzed
  coefficient sets covering every coeff_token context, level-suffix
  escalation and run_before tails;
- ANALYTIC: I_PCM is lossless plane passthrough; a flat-128 frame decodes
  to exactly 128 everywhere at any QP (DC prediction + zero residual);
  quantization error scales with QP and is near-zero at QP 4;
- PINNED: a fixed synthetic frame encodes to byte-identical stream bytes
  and decodes to byte-identical planes (sha256 goldens) — any change to
  tables, transforms, prediction or bit plumbing trips this.
"""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from iresearch_ray.stages import h264, mp4

GOLD_STREAM = "caca6037b4d8179d5ec9b0dbc17d9edeab57151fbe30dee393b0e601c3e9b2e8"
GOLD_Y = "6e5d89f999282dbb588ed49bdd66fa066a0dd6a6999e8e66767767872ecf1c10"
GOLD_CB = "5f53997371b485963ddea75e0fcc9a4173daa697ec5def4b692611f1269a0d51"
GOLD_CR = "9b904765f6f56f2bb7ef2f43326d24dbe2480838a90d31273072757fb4529322"


def _test_frame(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        (128 + 80 * np.sin(xx / 9) + 20 * np.cos(yy / 5)).clip(0, 255),
        (xx * 255 / w), (yy * 255 / h)], axis=-1).astype(np.uint8)


def test_vlc_tables_structural():
    for name, tab in h264.all_prefix_tables().items():
        codes = sorted(tab.values(), key=len)
        for i, a in enumerate(codes):
            for b in codes[i + 1:]:
                assert not b.startswith(a), (name, a, b)
        kraft = sum(2.0 ** -len(b) for b in tab.values())
        assert kraft <= 1.0 + 1e-12, (name, kraft)


def test_cavlc_residual_roundtrip_fuzz():
    rng = np.random.default_rng(0)
    for _ in range(1500):
        nc = int(rng.choice([-1, 0, 1, 2, 3, 4, 7, 8, 16]))
        size = 4 if nc == -1 else int(rng.choice([15, 16]))
        tc = int(rng.integers(0, size + 1))
        coeffs = np.zeros(size, np.int64)
        if tc:
            pos = rng.choice(size, tc, replace=False)
            mag = rng.choice([1, 1, 1, 2, 3, 7, 15, 40, 500, 3000], tc)
            coeffs[pos] = mag * rng.choice([-1, 1], tc)
            coeffs = h264._enforce_t1(coeffs)
        bw = h264.BitWriter()
        h264.encode_residual_block(bw, coeffs, nc)
        bw.u(1, 1)
        bw.byte_align_zero()
        got = h264.decode_residual_block(h264.BitReader(bw.getvalue()), nc, size)
        assert np.array_equal(got, coeffs), (nc, coeffs.tolist(), got.tolist())


def test_transform_chain_quant_noise_bound():
    rng = np.random.default_rng(1)
    for qp, bound in ((0, 2), (10, 3), (24, 14)):
        for _ in range(100):
            X = rng.integers(-60, 60, (4, 4)).astype(np.int64)
            W = h264.transform4x4(X)
            q = h264.quant4x4(W, qp)
            r = h264.itransform4x4(h264.dequant4x4(h264.scan_order(q), qp))
            assert np.abs(r - X).max() <= bound


def test_exp_golomb_roundtrip():
    bw = h264.BitWriter()
    vals = list(range(40)) + [255, 1023]
    for v in vals:
        bw.ue(v)
    svals = [0, 1, -1, 7, -7, 40, -40]
    for v in svals:
        bw.se(v)
    bw.rbsp_trailing()
    br = h264.BitReader(bw.getvalue())
    assert [br.ue() for _ in vals] == vals
    assert [br.se() for _ in svals] == svals


def test_rbsp_emulation_roundtrip():
    raw = bytes([0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 9, 255, 0, 0])
    assert h264.rbsp_from_ebsp(h264.ebsp_from_rbsp(raw)) == raw


def test_pcm_lossless_planes():
    frame = _test_frame()
    src = h264.rgb_to_yuv420(frame)
    stream = h264.encode_h264_annexb([frame], qp=30, kinds="pcm")
    Y, Cb, Cr = h264.decode_annexb(stream, rgb=False)[0][1]
    assert np.array_equal(Y, src[0])
    assert np.array_equal(Cb, src[1])
    assert np.array_equal(Cr, src[2])


def test_flat_frame_decodes_exactly():
    """Analytic golden: flat 128 → DC prediction 128, zero residual, exact
    reconstruction at ANY qp for every MB kind."""
    flat = np.full((32, 32, 3), 128, np.uint8)
    for qp in (0, 24, 48):
        for kinds in ("i16", "i4", "mixed"):
            stream = h264.encode_h264_annexb([flat], qp=qp, kinds=kinds)
            Y, Cb, Cr = h264.decode_annexb(stream, rgb=False)[0][1]
            assert (Y == 128).all() and (Cb == 128).all() and (Cr == 128).all()


def test_qp_controls_rate_and_distortion():
    frame = _test_frame()
    src = h264.rgb_to_yuv420(frame)
    sizes, errs = [], []
    for qp in (4, 20, 36):
        stream = h264.encode_h264_annexb([frame], qp=qp, kinds="i16")
        Y = h264.decode_annexb(stream, rgb=False)[0][1][0]
        sizes.append(len(stream))
        errs.append(np.abs(Y.astype(int) - src[0].astype(int)).mean())
    assert sizes[0] > sizes[1] > sizes[2]  # rate falls with qp
    assert errs[0] < 0.3                   # near-lossless at qp 4
    assert errs[0] <= errs[1] <= errs[2]   # distortion rises with qp


def test_golden_stream_and_planes_pinned():
    frame = _test_frame()
    stream = h264.encode_h264_annexb([frame], qp=24, kinds="mixed")
    assert hashlib.sha256(stream).hexdigest() == GOLD_STREAM
    Y, Cb, Cr = h264.decode_annexb(stream, rgb=False)[0][1]
    assert hashlib.sha256(Y.tobytes()).hexdigest() == GOLD_Y
    assert hashlib.sha256(Cb.tobytes()).hexdigest() == GOLD_CB
    assert hashlib.sha256(Cr.tobytes()).hexdigest() == GOLD_CR


def test_cabac_engine_roundtrip_fuzz():
    """§9.3.3.2/§9.3.4 arithmetic engines are exact inverses over fuzzed
    decision/bypass/terminate mixes on every context, and both sides land
    in identical context states."""
    import random

    random.seed(7)
    for _ in range(25):
        qp = random.randint(0, 51)
        enc_ctx, dec_ctx = h264.CabacContexts(qp), h264.CabacContexts(qp)
        enc = h264.CabacEncoder()
        ops = []
        for _ in range(random.randint(1, 400)):
            r = random.random()
            if r < 0.6:
                ctx, bit = random.randint(0, 435), random.randint(0, 1)
                enc.decision(enc_ctx, ctx, bit)
                ops.append(("d", ctx, bit))
            elif r < 0.9:
                bit = random.randint(0, 1)
                enc.bypass(bit)
                ops.append(("b", None, bit))
            else:
                enc.terminate(0)
                ops.append(("t", None, 0))
        enc.terminate(1)
        ops.append(("t", None, 1))
        enc.flush()
        dec = h264.CabacDecoder(h264._bits_to_bytes(enc.getbits()), 0)
        for kind, ctx, bit in ops:
            got = dec.decision(dec_ctx, ctx) if kind == "d" else (
                dec.bypass() if kind == "b" else dec.terminate())
            assert got == bit
        assert np.array_equal(enc_ctx.state, dec_ctx.state)
        assert np.array_equal(enc_ctx.mps, dec_ctx.mps)


def test_cabac_context_init():
    """Init states are in-range for every SliceQP and actually depend on
    QP (the (m, n) slopes are live, not neutral)."""
    for qp in (0, 10, 26, 40, 51):
        c = h264.CabacContexts(qp)
        assert c.state.shape == (436,)
        assert (c.state >= 0).all() and (c.state <= 62).all()
        assert set(np.unique(c.mps)) <= {0, 1}
    a, b = h264.CabacContexts(10), h264.CabacContexts(40)
    assert (a.state != b.state).any() or (a.mps != b.mps).any()


def _cabac_encode_picture(frame, qp, kinds, slices=1, deblock_idc=1):
    """Encode one CABAC picture with a shared frame state; returns
    (annexb_stream, encoder_recon_planes)."""
    h, w = frame.shape[:2]
    w_mbs, h_mbs = (w + 15) // 16, (h + 15) // 16
    sps_rbsp = h264.write_sps(w_mbs, h_mbs, w, h, profile=77)
    pps_rbsp = h264.write_pps(entropy=1)
    sps, pps = h264.parse_sps(sps_rbsp), h264.parse_pps(pps_rbsp)
    src = h264.rgb_to_yuv420(frame)
    fr = h264._Frame(w_mbs, h_mbs)
    cycle = ("i16", "i4", "pcm")
    kf = (lambda x, y: cycle[(x + y) % 3]) if kinds == "mixed" \
        else (lambda x, y: kinds)
    total = w_mbs * h_mbs
    bounds = [round(i * total / slices) for i in range(slices + 1)]
    out = [b"\x00\x00\x00\x01" + h264._nal(7, sps_rbsp),
           b"\x00\x00\x00\x01" + h264._nal(8, pps_rbsp)]
    for si in range(slices):
        rbsp = h264.encode_iframe_slice_cabac(
            src, sps, pps, qp, kf, first_mb=bounds[si],
            n_mbs=bounds[si + 1] - bounds[si], fr=fr,
            deblock_idc=deblock_idc)
        fr.cur_slice += 1
        out.append(b"\x00\x00\x00\x01" + h264._nal(5, rbsp))
    return b"".join(out), (fr.Y.astype(np.uint8), fr.Cb.astype(np.uint8),
                           fr.Cr.astype(np.uint8))


def test_cabac_stream_roundtrip_exact():
    """Decoder output == encoder reconstruction for every MB kind, QP band
    and slice split.  The encoder drives the DECODER's own _mb_cabac body
    (via _CabacWrite), so a pass proves the whole bin chain — contexts,
    binarizations, significance maps, level escapes — inverts exactly.
    The 80x112 frame spans 35 MBs, covering all planner variants
    (qp_delta unary > 1, cbp_luma 0, cbp_chroma 0/1/2, cbf-0 blocks)."""
    frame = _test_frame(80, 112)
    for kinds in ("i16", "i4", "mixed"):
        for qp in (10, 26, 40):
            for slices in (1, 3):
                st, (ey, ecb, ecr) = _cabac_encode_picture(
                    frame, qp, kinds, slices=slices)
                (idx, (Y, Cb, Cr)), = h264.decode_annexb(st, rgb=False)
                assert idx == 0
                assert np.array_equal(Y, ey), (kinds, qp, slices)
                assert np.array_equal(Cb, ecb), (kinds, qp, slices)
                assert np.array_equal(Cr, ecr), (kinds, qp, slices)


def test_cabac_golden_pinned():
    """Byte-identical CABAC stream + decoded luma for a fixed frame — any
    drift in the init tables, rangeTabLPS, transition tables or bin
    plumbing trips this."""
    frame = _test_frame()
    st = h264.encode_h264_annexb([frame], qp=24, kinds="mixed",
                                 entropy="cabac")
    assert hashlib.sha256(st).hexdigest() == \
        "d85bd68c105c7e81a51ed0206d8da79c5e8f5e9df0dc9e6d187914e98b2acadf"
    Y = h264.decode_annexb(st, rgb=False)[0][1][0]
    assert hashlib.sha256(Y.tobytes()).hexdigest() == \
        "74ac8ebdef5bd2d931dc23c7cc1619967fafb1696d69c8f506217d6e8bea6b88"


def test_cabac_via_public_encoder():
    """encode_h264_annexb(entropy='cabac') produces a Main-profile stream
    that decodes; PCM kinds are substituted (never raise)."""
    frame = _test_frame(48, 64)
    st = h264.encode_h264_annexb([frame, frame], qp=20, kinds="mixed",
                                 entropy="cabac")
    nals = h264.split_annexb(st)
    assert h264.parse_sps(nals[0][1])["profile"] == 77
    frames = h264.decode_annexb(st, rgb=False)
    assert [f[0] for f in frames] == [0, 1]
    assert np.array_equal(frames[0][1][0], frames[1][1][0])


def test_cabac_adapts_and_compresses():
    """Behavioural check that context adaptation is live: on smooth
    content the CABAC stream is measurably smaller than the CAVLC stream
    of the same picture shape."""
    yy, xx = np.mgrid[0:64, 0:96]
    smooth = np.stack([128 + 30 * np.sin(xx / 40),
                       128 + 20 * np.cos(yy / 30),
                       np.full_like(xx, 100)], axis=-1).astype(np.uint8)
    cavlc = h264.encode_h264_annexb([smooth], qp=28, kinds="i16")
    cabac = h264.encode_h264_annexb([smooth], qp=28, kinds="i16",
                                    entropy="cabac")
    assert len(cabac) < len(cavlc)


def test_cabac_deblock_composes():
    """Loop filter runs after CABAC decode exactly as after CAVLC: a flat
    picture is invariant, and idc is honoured per slice."""
    flat = np.full((48, 48, 3), 128, np.uint8)
    for idc in (0, 2):
        st = h264.encode_h264_annexb([flat], qp=32, kinds="i16", slices=2,
                                     deblock_idc=idc, entropy="cabac")
        Y, Cb, Cr = h264.decode_annexb(st, rgb=False)[0][1]
        assert (Y == 128).all() and (Cb == 128).all() and (Cr == 128).all()


def test_i8_transform_analytics():
    """8x8 scan/dequant/inverse-transform ground truths: the zigzag
    generator reproduces the pinned 4x4 scan (asserted at import), a
    DC-only block reconstructs flat with the exact §8.5.13 scaling, and
    forward+quant roundtrips coarse content at low QP."""
    lv = np.zeros(64, np.int32)
    lv[0] = 1
    res = h264.itransform8x8(h264.dequant8x8(lv, 36))
    assert (res == (16 * 20 + 32) >> 6).all()  # ls=16*20, <<0, +32>>6
    # forward/quant/dequant/inverse approximates identity at qp 0
    rng = np.random.default_rng(1)
    block = rng.integers(-60, 60, (8, 8)).astype(np.int64)
    scan = h264.scan_order8(h264.quant8x8(h264.transform8x8(block), 0))
    back = h264.itransform8x8(h264.dequant8x8(scan, 0))
    assert np.abs(back - block).max() <= 2


def test_i8_cavlc_roundtrip():
    """High-profile CAVLC: I_8x8 MBs (interleaved 4x4 residual blocks)
    encode with the decode-back self-check and re-decode; a flat frame is
    exact at any QP (DC prediction + zero residual)."""
    frame = _test_frame(80, 112)
    for kinds in ("i8", "mixed8"):
        st = h264.encode_h264_annexb([frame], qp=26, kinds=kinds)
        nals = h264.split_annexb(st)
        assert h264.parse_sps(nals[0][1])["profile"] == 100
        assert h264.parse_pps(nals[1][1])["transform_8x8"] == 1
        Y, _, _ = h264.decode_annexb(st, rgb=False)[0][1]
        assert Y.shape == (80, 112)
    flat = np.full((48, 48, 3), 128, np.uint8)
    for qp in (0, 26, 51):
        st = h264.encode_h264_annexb([flat], qp=qp, kinds="i8")
        Y, Cb, Cr = h264.decode_annexb(st, rgb=False)[0][1]
        assert (Y == 128).all() and (Cb == 128).all() and (Cr == 128).all()


def _cabac_encode_picture8(frame, qp, kinds, slices=1):
    h, w = frame.shape[:2]
    w_mbs, h_mbs = (w + 15) // 16, (h + 15) // 16
    sps_rbsp = h264.write_sps(w_mbs, h_mbs, w, h, profile=100)
    pps_rbsp = h264.write_pps(entropy=1, transform_8x8=1)
    sps, pps = h264.parse_sps(sps_rbsp), h264.parse_pps(pps_rbsp)
    src = h264.rgb_to_yuv420(frame)
    fr = h264._Frame(w_mbs, h_mbs)
    cyc = ("i16", "i4", "i8", "pcm")
    kf = (lambda x, y: cyc[(x + y) % 4]) if kinds == "mixed8" \
        else (lambda x, y: kinds)
    total = w_mbs * h_mbs
    bounds = [round(i * total / slices) for i in range(slices + 1)]
    out = [b"\x00\x00\x00\x01" + h264._nal(7, sps_rbsp),
           b"\x00\x00\x00\x01" + h264._nal(8, pps_rbsp)]
    for si in range(slices):
        rbsp = h264.encode_iframe_slice_cabac(
            src, sps, pps, qp, kf, first_mb=bounds[si],
            n_mbs=bounds[si + 1] - bounds[si], fr=fr)
        fr.cur_slice += 1
        out.append(b"\x00\x00\x00\x01" + h264._nal(5, rbsp))
    return b"".join(out), (fr.Y.astype(np.uint8), fr.Cb.astype(np.uint8),
                           fr.Cr.astype(np.uint8))


def test_i8_cabac_roundtrip_exact():
    """CABAC ctxBlockCat-5 residuals + transform_size_8x8_flag: decoder
    output == encoder recon for pure-i8 and the 4-way mixed cycle, across
    QP bands and slice splits (the t8-flag neighbor context crosses MB
    and slice boundaries in the 3-slice case)."""
    frame = _test_frame(80, 112)
    for kinds in ("i8", "mixed8"):
        for qp in (10, 26, 40):
            for slices in (1, 3):
                st, (ey, ecb, ecr) = _cabac_encode_picture8(
                    frame, qp, kinds, slices=slices)
                (idx, (Y, Cb, Cr)), = h264.decode_annexb(st, rgb=False)
                assert np.array_equal(Y, ey), (kinds, qp, slices)
                assert np.array_equal(Cb, ecb), (kinds, qp, slices)
                assert np.array_equal(Cr, ecr), (kinds, qp, slices)


def test_i8_deblock_composes():
    """t8 MBs expose only the 8-aligned internal luma edges to the loop
    filter: a flat picture stays exact with the filter on."""
    flat = np.full((48, 64, 3), 128, np.uint8)
    st = h264.encode_h264_annexb([flat], qp=34, kinds="i8", deblock_idc=0)
    Y, Cb, Cr = h264.decode_annexb(st, rgb=False)[0][1]
    assert (Y == 128).all() and (Cb == 128).all() and (Cr == 128).all()


def test_high_profile_pps_tail():
    """The High-profile PPS tail parses (transform_8x8_mode + second
    chroma offset); scaling matrices raise clearly; a Baseline PPS still
    reports transform_8x8 == 0."""
    assert h264.parse_pps(h264.write_pps())["transform_8x8"] == 0
    p = h264.parse_pps(h264.write_pps(entropy=1, transform_8x8=1))
    assert p["transform_8x8"] == 1 and p["entropy"] == 1
    bw = h264.BitWriter()
    for v in (0, 0):
        bw.ue(v)
    bw.u(0, 1)
    bw.u(0, 1)
    bw.ue(0)
    bw.ue(0)
    bw.ue(0)
    bw.u(0, 1)
    bw.u(0, 2)
    bw.se(0)
    bw.se(0)
    bw.se(0)
    bw.u(1, 1)
    bw.u(0, 1)
    bw.u(0, 1)
    bw.u(1, 1)  # transform_8x8_mode
    bw.u(1, 1)  # pic_scaling_matrix_present -> must raise
    bw.rbsp_trailing()
    with pytest.raises(ValueError, match="scaling matrices"):
        h264.parse_pps(bw.getvalue())


def test_mp4_avc1_high_profile():
    """High-profile (8x8 + CABAC) avc1 MP4 decodes through the demux."""
    f1 = _test_frame(32, 48)
    v = mp4.encode_mp4_h264([f1], fps=5, qp=8, kinds="mixed8",
                            entropy="cabac")
    frames = mp4.decode_mp4_h264(v, rgb=False)
    assert len(frames) == 1
    src = h264.rgb_to_yuv420(f1)
    assert np.abs(frames[0][1][0].astype(int) - src[0].astype(int)).mean() \
        < 1.5


def test_cabac_pcm_engine_reinit():
    """I_PCM inside CABAC slices: the arithmetic engine flushes at the
    terminate bin, raw planes splice at the byte boundary, and the engine
    re-initialises with CONTEXT STATE PRESERVED — a pure-PCM picture is
    lossless, and PCM MBs interleaved with coded MBs stay exact."""
    frame = _test_frame(48, 64)
    src = h264.rgb_to_yuv420(frame)
    st = h264.encode_h264_annexb([frame], qp=30, kinds="pcm",
                                 entropy="cabac")
    Y, Cb, Cr = h264.decode_annexb(st, rgb=False)[0][1]
    assert np.array_equal(Y, src[0])
    assert np.array_equal(Cb, src[1]) and np.array_equal(Cr, src[2])
    # mixed cycle (i16/i4/pcm): PCM MBs lossless mid-stream, the coded
    # MBs around them still round-trip exactly vs the encoder recon
    st2, (ey, ecb, ecr) = _cabac_encode_picture(frame, 26, "mixed")
    (_, (Y2, Cb2, Cr2)), = h264.decode_annexb(st2, rgb=False)
    assert np.array_equal(Y2, ey)
    assert np.array_equal(Cb2, ecb) and np.array_equal(Cr2, ecr)
    # every 3rd MB of the cycle is PCM: those pixels equal the source
    for mby in range(3):
        for mbx in range(4):
            if (mbx + mby) % 3 == 2:
                s = np.s_[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16]
                assert np.array_equal(Y2[s], src[0][s])


def test_non_idr_samples_skipped():
    frame = _test_frame(32, 32)
    stream = h264.encode_h264_annexb([frame, frame], qp=24, kinds="i16")
    # splice a fake non-IDR NAL (type 1) between the two IDRs
    parts = stream.split(b"\x00\x00\x00\x01")
    assert len(parts) == 5  # '', sps, pps, idr, idr
    # slice header: first_mb_in_slice = ue(0) = '1', slice_type = ue(3)
    # = '00100' (SP slice — the one frame shape that stays
    # unsupported/skipped now that non-IDR I, CAVLC P AND CAVLC B
    # decode), so the AU grouping sees a NEW non-IDR AU
    fake_p = bytes([0x41]) + b"\x90\x20\x30"
    doctored = (b"\x00\x00\x00\x01" + parts[1] + b"\x00\x00\x00\x01" + parts[2]
                + b"\x00\x00\x00\x01" + parts[3]
                + b"\x00\x00\x00\x01" + fake_p
                + b"\x00\x00\x00\x01" + parts[4])
    frames = h264.decode_annexb(doctored, rgb=False)
    # both IDRs decode; the SP NAL consumed an access-unit slot but was
    # never entropy-decoded
    assert [f[0] for f in frames] == [0, 2]


def test_mp4_avc1_roundtrip_and_sampling():
    f1 = _test_frame(32, 48)
    f2 = np.roll(f1, 5, axis=1)
    v = mp4.encode_mp4_h264([f1, f2], fps=5, qp=8, kinds="mixed")
    meta = mp4.mp4_meta(v)
    assert (meta["codec"], meta["width"], meta["height"], meta["n_frames"]) \
        == ("avc1", 48, 32, 2)
    frames = mp4.decode_mp4_h264(v, every=1, rgb=False)
    assert len(frames) == 2
    src = h264.rgb_to_yuv420(f1)
    Y = frames[0][1][0]
    assert np.abs(Y.astype(int) - src[0].astype(int)).mean() < 1.0  # qp8
    assert len(mp4.decode_mp4_h264(v, every=2)) == 1  # skip never decodes
    # pcm-only avc1: lossless planes through the container
    v2 = mp4.encode_mp4_h264([f1], qp=8, kinds="pcm")
    Y2, _, _ = mp4.decode_mp4_h264(v2, rgb=False)[0][1]
    assert np.array_equal(Y2, src[0])
    # mjpeg decode entry politely routes avc1 elsewhere
    with pytest.raises(ValueError, match="decode_mp4_h264"):
        mp4.decode_mp4_mjpeg(v)


def test_mp4_avc1_cabac_roundtrip():
    """Main-profile (CABAC) avc1 MP4s decode through the same demux +
    sampler path as Baseline ones."""
    f1 = _test_frame(32, 48)
    f2 = np.roll(f1, 5, axis=1)
    v = mp4.encode_mp4_h264([f1, f2], fps=5, qp=8, kinds="mixed",
                            entropy="cabac")
    meta = mp4.mp4_meta(v)
    assert (meta["codec"], meta["n_frames"]) == ("avc1", 2)
    frames = mp4.decode_mp4_h264(v, every=1, rgb=False)
    assert len(frames) == 2
    src = h264.rgb_to_yuv420(f1)
    Y = frames[0][1][0]
    assert np.abs(Y.astype(int) - src[0].astype(int)).mean() < 1.5  # qp8
    assert len(mp4.decode_mp4_h264(v, every=2)) == 1


def test_framesample_stage_h264(ray_session):
    """FrameSample actor stage with decoder='h264_mp4' over a Ray Dataset —
    the engine-side plumbing the 100 TB pipeline uses."""
    import ray.data as rd

    from iresearch_ray.stages.multimodal import FrameSample

    f1 = _test_frame(16, 16)
    # one Baseline/CAVLC item and one High-profile CABAC+8x8 item through
    # the SAME actor stage — profile dispatch is per payload
    payloads = [
        mp4.encode_mp4_h264([f1, np.roll(f1, 1, axis=0)], qp=8,
                            kinds="i16"),
        mp4.encode_mp4_h264([f1, np.roll(f1, 2, axis=0)], qp=8,
                            kinds="i8", entropy="cabac"),
    ]
    tbl = pa.table({
        "item_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
        "n_frames": pa.array([2, 2], pa.int64()),
    })
    ds = rd.from_arrow(tbl).map_batches(
        FrameSample(every=1, height=16, width=16, decoder="h264_mp4"),
        batch_format="pyarrow", concurrency=1, batch_size=2,
    )
    out = ds.to_pandas()
    assert len(out) == 4  # 2 items x 2 frames
    assert set(out["item_id"]) == {0, 1}


def test_crop_non_multiple_of_16():
    frame = _test_frame(30, 40)  # crops to 30x40 from 32x48 MB grid
    stream = h264.encode_h264_annexb([frame], qp=8, kinds="i16")
    img = h264.decode_annexb(stream, rgb=True)[0][1]
    assert img.shape == (30, 40, 3)


def test_multi_slice_pictures():
    """Real encoders split a picture into several slices; consecutive IDR
    slices must assemble into ONE access unit, and slice-boundary
    availability (neighbors in another slice are unavailable for
    prediction/nC) must hold on BOTH sides — the encoder's self-check
    (decoder consumes its exact bits per MB) makes any asymmetry a hard
    failure, and reconstruction must stay within quant error of the
    source."""
    frame = _test_frame()
    src = h264.rgb_to_yuv420(frame)
    for slices in (2, 3, 5):
        stream = h264.encode_h264_annexb([frame], qp=8, kinds="mixed",
                                         slices=slices)
        assert stream.count(b"\x00\x00\x00\x01") == slices + 2
        frames = h264.decode_annexb(stream, rgb=False)
        assert len(frames) == 1  # slices grouped into one picture
        Y = frames[0][1][0]
        err = np.abs(Y.astype(int) - src[0].astype(int))
        assert err.mean() < 1.0 and err.max() <= 4
    # flat frame stays EXACT across slice boundaries (DC fallback = 128)
    flat = np.full((32, 32, 3), 128, np.uint8)
    st = h264.encode_h264_annexb([flat], qp=30, kinds="i4", slices=2)
    Y, Cb, Cr = h264.decode_annexb(st, rgb=False)[0][1]
    assert (Y == 128).all() and (Cb == 128).all() and (Cr == 128).all()
    # two multi-slice frames keep AU boundaries straight
    st2 = h264.encode_h264_annexb([frame, frame], qp=24, kinds="i16",
                                  slices=2)
    assert [f[0] for f in h264.decode_annexb(st2, rgb=False)] == [0, 1]
    # a picture with a missing slice raises instead of returning garbage
    parts = st2.split(b"\x00\x00\x00\x01")
    broken = b"\x00\x00\x00\x01" + b"\x00\x00\x00\x01".join(
        [parts[1], parts[2], parts[3]])  # sps, pps, first slice only
    with pytest.raises(ValueError, match="missing macroblocks"):
        h264.decode_annexb(broken, rgb=False)

# ---------------------------------------------------------------------------
# in-loop deblocking filter (§8.7)
# ---------------------------------------------------------------------------


def _scalar_filter_line(p3, p2, p1, p0, q0, q1, q2, q3, bs4, alpha, beta,
                        tc0, chroma):
    """Independent per-line transliteration of §8.7.2.3/8.7.2.4 (the spec's
    scalar equations, written without looking at the vectorized kernel) —
    the parity oracle for h264._filter_lines."""
    if not (abs(p0 - q0) < alpha and abs(p1 - p0) < beta
            and abs(q1 - q0) < beta):
        return p2, p1, p0, q0, q1, q2
    ap = abs(p2 - p0) < beta
    aq = abs(q2 - q0) < beta
    if bs4:
        if chroma:
            return (p2, p1, (2 * p1 + p0 + q1 + 2) >> 2,
                    (2 * q1 + q0 + p1 + 2) >> 2, q1, q2)
        small = abs(p0 - q0) < (alpha >> 2) + 2
        np2, np1, np0 = p2, p1, (2 * p1 + p0 + q1 + 2) >> 2
        if ap and small:
            np0 = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
            np1 = (p2 + p1 + p0 + q0 + 2) >> 2
            np2 = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
        nq2, nq1, nq0 = q2, q1, (2 * q1 + q0 + p1 + 2) >> 2
        if aq and small:
            nq0 = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
            nq1 = (q2 + q1 + q0 + p0 + 2) >> 2
            nq2 = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
        return np2, np1, np0, nq0, nq1, nq2
    tc = tc0 + 1 if chroma else tc0 + int(ap) + int(aq)
    d = max(-tc, min(tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3))
    np0 = max(0, min(255, p0 + d))
    nq0 = max(0, min(255, q0 - d))
    np1, nq1 = p1, q1
    if not chroma:
        if ap:
            np1 = p1 + max(-tc0, min(tc0,
                                     (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1))
        if aq:
            nq1 = q1 + max(-tc0, min(tc0,
                                     (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1))
    return p2, np1, np0, nq0, nq1, q2


def test_deblock_filter_lines_scalar_parity():
    rng = np.random.default_rng(7)
    for _ in range(300):
        n = int(rng.integers(1, 17))
        lines = [rng.integers(0, 256, n).astype(np.int64) for _ in range(8)]
        # half the time make the edge "smooth" so the filter actually fires
        if rng.random() < 0.5:
            base = rng.integers(40, 200)
            lines = [np.clip(base + rng.integers(-3, 4, n), 0, 255)
                     .astype(np.int64) for _ in range(8)]
        bs4 = bool(rng.random() < 0.5)
        chroma = bool(rng.random() < 0.3)
        ia = int(rng.integers(0, 52))
        ib = int(rng.integers(0, 52))
        alpha = int(h264._ALPHA[ia])
        beta = int(h264._BETA[ib])
        tc0 = int(h264._TC0[int(rng.integers(0, 3))][ia])
        got = h264._filter_lines(*lines, bs4, alpha, beta, tc0, chroma)
        for j in range(n):
            want = _scalar_filter_line(*(int(ln[j]) for ln in lines),
                                       bs4, alpha, beta, tc0, chroma)
            for g, w in zip(got, want):
                assert int(g[j]) == w, (bs4, chroma, ia, ib, j)


def test_deblock_flat_picture_invariant():
    """Strong/weak/chroma filters are all weighted means — a flat picture
    is a fixed point, so flat-128 decodes exactly even with the loop
    filter ON."""
    flat = np.full((32, 32, 3), 128, np.uint8)
    for kinds in ("i16", "i4", "mixed"):
        st = h264.encode_h264_annexb([flat], qp=32, kinds=kinds,
                                     deblock_idc=0)
        Y, Cb, Cr = h264.decode_annexb(st, rgb=False)[0][1]
        assert (Y == 128).all() and (Cb == 128).all() and (Cr == 128).all()


def test_deblock_improves_smooth_content_at_high_qp():
    """The point of the loop filter: on smooth content quantized hard, the
    deblocked reconstruction is strictly closer to the source than the
    unfiltered one, and the two streams differ only in the idc symbol so
    any difference in output is the filter itself."""
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = np.stack([(60 + 1.9 * xx + 1.1 * yy) % 256] * 3,
                      axis=-1).astype(np.uint8)
    src_y = h264.rgb_to_yuv420(smooth)[0].astype(int)
    st_off = h264.encode_h264_annexb([smooth], qp=40, kinds="i16",
                                     deblock_idc=1)
    st_on = h264.encode_h264_annexb([smooth], qp=40, kinds="i16",
                                    deblock_idc=0)
    y_off = h264.decode_annexb(st_off, rgb=False)[0][1][0].astype(int)
    y_on = h264.decode_annexb(st_on, rgb=False)[0][1][0].astype(int)
    assert not np.array_equal(y_off, y_on)  # the filter fired
    mae_off = np.abs(y_off - src_y).mean()
    mae_on = np.abs(y_on - src_y).mean()
    assert mae_on < mae_off, (mae_on, mae_off)
    # near-lossless content must NOT be smeared: at qp 4 the gradients are
    # real (|p0-q0| tiny but tc0 ~ 0), output stays near the source
    st4 = h264.encode_h264_annexb([smooth], qp=4, kinds="i16",
                                  deblock_idc=0)
    y4 = h264.decode_annexb(st4, rgb=False)[0][1][0].astype(int)
    assert np.abs(y4 - src_y).mean() < 0.5


def test_deblock_idc2_respects_slice_boundaries():
    """idc=2 filters everywhere EXCEPT across slice boundaries.  Two
    streams identical but for the idc symbol: the unfiltered recon is
    identical, so outputs may differ only where the cross-slice edge
    filter (idc=0) fired — at/after the boundary row — and must be
    byte-identical well above it."""
    frame = _test_frame(64, 64)  # 4x4 MBs; 2 slices -> boundary at y=32
    st0 = h264.encode_h264_annexb([frame], qp=38, kinds="i16", slices=2,
                                  deblock_idc=0)
    st2 = h264.encode_h264_annexb([frame], qp=38, kinds="i16", slices=2,
                                  deblock_idc=2)
    y0 = h264.decode_annexb(st0, rgb=False)[0][1][0]
    y2 = h264.decode_annexb(st2, rgb=False)[0][1][0]
    # the boundary edge modifies p2..q2 = rows 29..34; everything above is
    # untouched by the only differing edge
    assert np.array_equal(y0[:29], y2[:29])
    assert not np.array_equal(y0[29:35], y2[29:35])


def test_deblock_i_pcm_qp_zero():
    """§8.7.2: I_PCM macroblocks deblock with QPY = 0, so an all-PCM
    picture has qPav = 0 -> alpha = 0 -> the filter never fires and PCM
    stays lossless even with idc=0."""
    frame = _test_frame()
    src = h264.rgb_to_yuv420(frame)
    st = h264.encode_h264_annexb([frame], qp=30, kinds="pcm", deblock_idc=0)
    Y, Cb, Cr = h264.decode_annexb(st, rgb=False)[0][1]
    assert np.array_equal(Y, src[0])
    assert np.array_equal(Cb, src[1])
    assert np.array_equal(Cr, src[2])

"""Audio stages — REAL end-to-end: genuine RIFF/WAVE bytes, stdlib wave
parse, PCM decode, DSP features.  Physics checks: a synthesized sine's
dominant FFT band matches its frequency; resampling preserves duration."""

import numpy as np
import pyarrow as pa
import pytest

from iresearch_ray.stages.audio import (
    AudioDecode,
    AudioFeatures,
    AudioResample,
    decode_wav,
    encode_wav,
    synth_audio_table,
)


def test_wav_roundtrip():
    sr = 8000
    t = np.arange(sr) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    payload = encode_wav(x, sr)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    y, sr2 = decode_wav(payload)
    assert sr2 == sr and y.size == x.size
    assert np.max(np.abs(y - x)) < 1e-3  # 16-bit quantization bound


def test_decode_stage_and_dominant_band(ray_session):
    import ray.data as rd

    tbl = synth_audio_table(12, sr=8000, secs=0.5)
    ds = rd.from_arrow(tbl).map_batches(AudioDecode(), batch_format="pyarrow")
    dec = ds.to_pandas().set_index("item_id")
    assert (dec["sample_rate"] == 8000).all()
    assert (dec["n_samples"] == 4000).all()

    feats = (
        rd.from_arrow(tbl)
        .map_batches(AudioDecode(), batch_format="pyarrow")
        .map_batches(AudioFeatures(frame_len=512, n_bands=13), batch_format="pyarrow")
        .to_pandas()
        .set_index("item_id")
    )
    freqs = dict(zip(tbl["item_id"].to_pylist(), tbl["freq_hz"].to_pylist()))
    n_bins = 512 // 2 + 1
    edges = np.linspace(0, n_bins, 14).astype(int)
    for item, row in feats.iterrows():
        emb = np.asarray(row["embedding"])
        assert emb.shape == (15,)
        got_band = int(np.argmax(emb[2:]))
        # expected band of the sine's FFT bin at 8 kHz / 512-point frames
        bin_hz = 8000 / 512
        sine_bin = freqs[item] / bin_hz
        exp_band = int(np.searchsorted(edges, sine_bin, side="right")) - 1
        assert abs(got_band - exp_band) <= 1  # edge bins may straddle


def test_resample_halves_length(ray_session):
    import ray.data as rd

    tbl = synth_audio_table(4, sr=8000, secs=0.25)
    out = (
        rd.from_arrow(tbl)
        .map_batches(AudioDecode(), batch_format="pyarrow")
        .map_batches(AudioResample(target_rate=4000), batch_format="pyarrow")
        .to_pandas()
    )
    assert (out["sample_rate"] == 4000).all()
    assert (out["n_samples"] == 1000).all()


def test_decode_rejects_non_pcm16():
    with pytest.raises(Exception):
        decode_wav(b"not a wav at all")

# ---------------------------------------------------------------------------
# Non-PCM16 WAV sample formats (from-scratch RIFF walker + G.711/float/wide
# PCM decode).  Hand-built byte vectors break encoder/decoder circularity:
# the G.711 endpoints below are the published 16-bit mappings.


def _wav_header(tag, sr, bits, data, extensible=False):
    import struct

    block = max(1, bits // 8)
    if extensible:
        # 40-byte fmt: cbSize=22, wValidBits, dwChannelMask, SubFormat GUID
        guid = struct.pack("<H", tag) + b"\x00\x00" + bytes(
            [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
             0x00, 0x38, 0x9B, 0x71])
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * block, block, bits)
        fmt += struct.pack("<HHI", 22, bits, 0x4) + guid
    else:
        fmt = struct.pack("<HHIIHH", tag, 1, sr, sr * block, block, bits)
    body = b"WAVE"
    # a 3-byte unknown chunk first: exercises skip + odd-size word alignment
    for cid, cbody in ((b"junk", b"abc"), (b"fmt ", fmt), (b"data", data)):
        body += cid + struct.pack("<I", len(cbody)) + cbody
        if len(cbody) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_g711_decode_pinned_endpoints():
    """Published 16-bit G.711 expansion endpoints (ITU-T G.711):
    mu-law 0x00→-32124, 0x80→+32124, 0xFF→0; A-law 0x2A→-32256,
    0xAA→+32256, 0x55→-8, 0xD5→+8."""
    mu = _wav_header(7, 8000, 8, bytes([0x00, 0x80, 0xFF, 0x7F]))
    x, sr = decode_wav(mu)
    assert sr == 8000
    got = np.round(x * 32768.0).astype(int)
    assert got.tolist() == [-32124, 32124, 0, 0]

    al = _wav_header(6, 8000, 8, bytes([0x2A, 0xAA, 0x55, 0xD5]))
    y, _ = decode_wav(al)
    got = np.round(y * 32768.0).astype(int)
    assert got.tolist() == [-32256, 32256, -8, 8]


def test_g711_decode_tables_are_odd_symmetric():
    from iresearch_ray.stages.audio import _ALAW2LIN, _ULAW2LIN

    # each magnitude appears once positive and once negative; monotone
    # within a sign half when walked in code order
    for tab in (_ULAW2LIN, _ALAW2LIN):
        vals = np.sort(tab.astype(np.int64))
        assert np.array_equal(vals, -vals[::-1]) or (
            # mu-law has two zero codes (+0 and -0) so the multiset is
            # symmetric apart from the doubled zero
            np.count_nonzero(tab == 0) == 2
            and np.array_equal(np.sort(np.abs(vals)), np.sort(np.abs(vals)))
        )
        assert int(np.max(np.abs(tab))) in (32124, 32256)


def test_g711_roundtrip_bounds():
    """encode→decode error ≤ half the largest quantization step (1024/2
    in the 16-bit domain) for full-scale material, and much smaller for
    quiet material (the whole point of companding)."""
    from iresearch_ray.stages.audio import (
        alaw_encode,
        ulaw_encode,
        _ALAW2LIN,
        _ULAW2LIN,
    )

    rng = np.random.default_rng(3)
    pcm = rng.integers(-32767, 32768, size=4096)
    for enc, tab in ((ulaw_encode, _ULAW2LIN), (alaw_encode, _ALAW2LIN)):
        peak = int(np.max(np.abs(tab)))  # 32124 (mu) / 32256 (A)
        dec = tab[enc(pcm)].astype(np.int64)
        in_range = np.abs(pcm) <= peak
        assert np.max(np.abs(dec - pcm)[in_range]) <= 512
        # beyond the codec peak the error is pure clipping
        assert np.max(np.abs(dec - pcm)[~in_range]) <= 32767 - peak
        quiet = rng.integers(-100, 101, size=1024)
        dq = tab[enc(quiet)].astype(np.int64)
        assert np.max(np.abs(dq - quiet)) <= 8


def test_wide_pcm_and_float_formats():
    import struct

    sr = 16000
    # 24-bit: hand-assembled little-endian triples, incl. negative values
    vals24 = [0, 1, -1, 8388607, -8388608, 4660]
    data = b"".join(struct.pack("<i", v)[:3] for v in vals24)
    x, _ = decode_wav(_wav_header(1, sr, 24, data))
    assert np.allclose(x, np.array(vals24) / 8388608.0, atol=1e-7)

    # 32-bit PCM
    vals32 = [0, 2147483647, -2147483648, 65536]
    x, _ = decode_wav(_wav_header(1, sr, 32, struct.pack("<4i", *vals32)))
    assert np.allclose(x, np.array(vals32) / 2147483648.0, atol=1e-7)

    # 8-bit unsigned PCM: midpoint 128
    x, _ = decode_wav(_wav_header(1, sr, 8, bytes([128, 255, 0, 192])))
    assert np.allclose(x, [0.0, 127 / 128, -1.0, 0.5], atol=1e-7)

    # IEEE float32/float64 are exact
    f = [0.25, -0.75, 1.0, -1.0]
    x, _ = decode_wav(_wav_header(3, sr, 32, struct.pack("<4f", *f)))
    assert np.array_equal(x, np.array(f, np.float32))
    x, _ = decode_wav(_wav_header(3, sr, 64, struct.pack("<4d", *f)))
    assert np.array_equal(x, np.array(f, np.float32))


def test_extensible_wrapper_and_stereo_downmix():
    import struct

    # EXTENSIBLE wrapper around float32, stereo: downmix = channel mean
    left = np.array([0.5, -0.5, 1.0], np.float32)
    right = np.array([0.0, 0.5, 0.0], np.float32)
    inter = np.empty(6, np.float32)
    inter[0::2], inter[1::2] = left, right
    payload = _wav_header(3, 44100, 32, inter.tobytes(), extensible=True)
    # patch channel count to 2 inside the extensible fmt chunk
    pos = payload.index(b"fmt ") + 8
    payload = payload[:pos + 2] + struct.pack("<H", 2) + payload[pos + 4:]
    x, sr = decode_wav(payload)
    assert sr == 44100
    assert np.allclose(x, (left + right) / 2, atol=1e-7)


def test_encode_wav_fmt_roundtrip_all_formats():
    from iresearch_ray.stages.audio import encode_wav_fmt

    sr = 8000
    t = np.arange(sr // 4) / sr
    x = 0.6 * np.sin(2 * np.pi * 300 * t)
    tol = {"pcm16": 1e-3, "pcm24": 1e-5, "pcm32": 1e-6,
           "float32": 1e-7, "float64": 1e-7,
           # G.711 half-step at this amplitude (segment ~6): 256/32768
           "mulaw": 0.016, "alaw": 0.016}
    for fmt, bound in tol.items():
        y, sr2 = decode_wav(encode_wav_fmt(x, sr, fmt=fmt))
        assert sr2 == sr and y.size == x.size, fmt
        assert np.max(np.abs(y - x)) < bound, fmt


def test_mixed_g711_batch_through_decode_stage(ray_session):
    import ray.data as rd

    tbl = synth_audio_table(6, sr=8000, secs=0.25, fmt="mulaw")
    out = (
        rd.from_arrow(tbl)
        .map_batches(AudioDecode(), batch_format="pyarrow")
        .to_pandas()
    )
    assert (out["sample_rate"] == 8000).all()
    assert (out["n_samples"] == 2000).all()
    # dominant-band physics still holds through the companded path
    from iresearch_ray.stages.audio import dominant_band

    freqs = tbl["freq_hz"].to_pylist()
    payloads = tbl["payload"].to_pylist()
    bin_hz = 8000 / 512
    edges = np.linspace(0, 512 // 2 + 1, 14).astype(int)
    for f, p in zip(freqs[:3], payloads[:3]):
        exp_band = int(np.searchsorted(edges, f / bin_hz, side="right")) - 1
        assert abs(dominant_band(p) - exp_band) <= 1

# ---------------------------------------------------------------------------
# ADPCM (IMA tag 0x11 / Microsoft tag 0x02).  The vectorized decoders run
# the per-step recurrence across all blocks x channels at once; the scalar
# oracles below re-implement the published block layout sample-by-sample,
# so a vectorization bug (interleave order, nibble order, state carry)
# cannot hide.  Encoders track the decoder's state, so round-trips assert
# EXACT equality, not a tolerance.

_IMA_INDEX_TAB = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_scalar_decode(data, align, ch):
    """Spec-literal scalar IMA ADPCM decode (independent of the numpy
    implementation): 4-byte per-channel headers, 4-byte nibble groups
    round-robin over channels, LOW nibble first."""
    import struct

    from iresearch_ray.stages.audio import _IMA_STEP

    out = []
    for b0 in range(0, len(data) - align + 1, align):
        blk = data[b0 : b0 + align]
        preds, idxs = [], []
        for c in range(ch):
            p, i, _r = struct.unpack_from("<hBB", blk, 4 * c)
            preds.append(p)
            idxs.append(min(max(i, 0), 88))
        frames = [list(preds)]
        body = blk[4 * ch :]
        samples = [[] for _ in range(ch)]
        for g in range(len(body) // 4):
            c = g % ch
            for byte in body[g * 4 : (g + 1) * 4]:
                for code in (byte & 0x0F, byte >> 4):
                    step = int(_IMA_STEP[idxs[c]])
                    diff = step >> 3
                    if code & 1:
                        diff += step >> 2
                    if code & 2:
                        diff += step >> 1
                    if code & 4:
                        diff += step
                    if code & 8:
                        diff = -diff
                    preds[c] = min(max(preds[c] + diff, -32768), 32767)
                    idxs[c] = min(max(idxs[c] + _IMA_INDEX_TAB[code & 7], 0), 88)
                    samples[c].append(preds[c])
        for t in range(len(samples[0])):
            frames.append([samples[c][t] for c in range(ch)])
        out.extend(v for fr in frames for v in fr)
    return np.array(out, np.int32)


def _ms_scalar_decode(data, align, ch):
    """Spec-literal scalar MS ADPCM decode: channel-major 7*ch-byte header,
    HIGH nibble first, channels alternating nibble-by-nibble."""
    coef = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
            (460, -208), (392, -232)]
    adapt = [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409,
             307, 230, 230, 230]
    out = []
    for b0 in range(0, len(data) - align + 1, align):
        blk = data[b0 : b0 + align]
        pidx = [min(blk[c], 6) for c in range(ch)]

        def rd16(off):
            v = blk[off] | (blk[off + 1] << 8)
            return (v ^ 0x8000) - 0x8000

        o = ch
        idelta = [rd16(o + 2 * c) for c in range(ch)]
        o += 2 * ch
        s1 = [rd16(o + 2 * c) for c in range(ch)]
        o += 2 * ch
        s2 = [rd16(o + 2 * c) for c in range(ch)]
        o += 2 * ch
        frames = [list(s2), list(s1)]
        nibs = []
        for byte in blk[o:]:
            nibs.append(byte >> 4)
            nibs.append(byte & 0x0F)
        n = (len(nibs) // ch) * ch
        cur = [0] * ch
        for t in range(n):
            c = t % ch
            code = nibs[t]
            signed = code - 16 if code >= 8 else code
            c1, c2 = coef[pidx[c]]
            pred = ((s1[c] * c1 + s2[c] * c2) >> 8) + signed * idelta[c]
            pred = min(max(pred, -32768), 32767)
            idelta[c] = min(max((adapt[code] * idelta[c]) >> 8, 16), 1 << 20)
            s2[c], s1[c] = s1[c], pred
            cur[c] = pred
            if c == ch - 1:
                frames.append(list(cur))
        out.extend(v for fr in frames for v in fr)
    return np.array(out, np.int32)


def test_ima_step_table_published_endpoints():
    from iresearch_ray.stages.audio import _IMA_STEP

    assert len(_IMA_STEP) == 89
    assert int(_IMA_STEP[0]) == 7 and int(_IMA_STEP[88]) == 32767
    assert np.all(np.diff(_IMA_STEP) > 0)  # strictly increasing


def test_ima_vectorized_matches_scalar_oracle_random():
    from iresearch_ray.stages.audio import _ima_adpcm_decode

    rng = np.random.default_rng(7)
    for ch, align in ((1, 32), (2, 72), (1, 256), (2, 40)):
        data = bytes(rng.integers(0, 256, size=align * 5, dtype=np.uint8))
        got = _ima_adpcm_decode(data, align, ch)
        want = _ima_scalar_decode(data, align, ch)
        assert np.array_equal(got, want), (ch, align)


def test_ms_vectorized_matches_scalar_oracle_random():
    from iresearch_ray.stages.audio import _ms_adpcm_decode

    rng = np.random.default_rng(9)
    for ch, align in ((1, 24), (2, 30), (1, 256), (2, 128)):
        data = bytes(rng.integers(0, 256, size=align * 5, dtype=np.uint8))
        got = _ms_adpcm_decode(data, align, ch)
        want = _ms_scalar_decode(data, align, ch)
        assert np.array_equal(got, want), (ch, align)


def _adpcm_wav(tag, sr, align, data, nframes, ch=1):
    import struct

    fmt = struct.pack("<HHIIHH", tag, ch, sr, sr, align, 4)
    fmt += struct.pack("<H", 0)  # cbSize=0 is tolerated by the walker
    body = b"WAVE"
    for cid, cbody in (
        (b"fmt ", fmt),
        (b"fact", struct.pack("<I", nframes)),
        (b"data", data),
    ):
        body += cid + struct.pack("<I", len(cbody)) + cbody
        if len(cbody) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_ima_encode_decode_exact_with_fact_truncation():
    from iresearch_ray.stages.audio import ima_adpcm_encode

    rng = np.random.default_rng(21)
    # smooth-ish random walk (what ADPCM is for), odd length so the final
    # block is padded and the fact chunk is load-bearing
    pcm = np.clip(np.cumsum(rng.integers(-900, 901, size=1531)), -32768, 32767)
    data, ref = ima_adpcm_encode(pcm.astype(np.int16), block_align=256)
    assert len(ref) == len(pcm)
    payload = _adpcm_wav(0x11, 8000, 256, data, nframes=len(ref))
    y, sr = decode_wav(payload)
    assert sr == 8000 and y.size == len(pcm)  # fact truncated the padding
    got = np.round(y.astype(np.float64) * 32768.0).astype(np.int64)
    assert np.array_equal(got, ref.astype(np.int64))


def test_ms_encode_decode_exact_with_fact_truncation():
    from iresearch_ray.stages.audio import ms_adpcm_encode

    rng = np.random.default_rng(22)
    pcm = np.clip(np.cumsum(rng.integers(-700, 701, size=1207)), -32768, 32767)
    data, ref = ms_adpcm_encode(pcm.astype(np.int16), block_align=256)
    assert len(ref) == len(pcm)
    payload = _adpcm_wav(0x02, 8000, 256, data, nframes=len(ref))
    y, sr = decode_wav(payload)
    assert sr == 8000 and y.size == len(pcm)
    got = np.round(y.astype(np.float64) * 32768.0).astype(np.int64)
    assert np.array_equal(got, ref.astype(np.int64))


def test_encode_wav_fmt_adpcm_roundtrip_tolerance():
    from iresearch_ray.stages.audio import encode_wav_fmt

    sr = 8000
    t = np.arange(sr // 2) / sr
    x = 0.6 * np.sin(2 * np.pi * 300 * t)
    for fmt, bound in (("ima_adpcm", 0.06), ("ms_adpcm", 0.12)):
        y, sr2 = decode_wav(encode_wav_fmt(x, sr, fmt=fmt))
        assert sr2 == sr and y.size == x.size, fmt
        assert np.max(np.abs(y - x)) < bound, fmt
        # and it genuinely compressed: 4-bit codes ~= 1/4 the PCM16 bytes
        assert len(encode_wav_fmt(x, sr, fmt=fmt)) < x.size * 2 * 0.35


def test_adpcm_batch_through_decode_stage(ray_session):
    import ray.data as rd

    from iresearch_ray.stages.audio import dominant_band

    for fmt in ("ima_adpcm", "ms_adpcm"):
        tbl = synth_audio_table(4, sr=8000, secs=0.25, fmt=fmt)
        out = (
            rd.from_arrow(tbl)
            .map_batches(AudioDecode(), batch_format="pyarrow")
            .to_pandas()
        )
        assert (out["sample_rate"] == 8000).all(), fmt
        assert (out["n_samples"] == 2000).all(), fmt
        # dominant-band physics survives the 4-bit codec
        freqs = tbl["freq_hz"].to_pylist()
        payloads = tbl["payload"].to_pylist()
        bin_hz = 8000 / 512
        edges = np.linspace(0, 512 // 2 + 1, 14).astype(int)
        for f, p in zip(freqs[:2], payloads[:2]):
            exp = int(np.searchsorted(edges, f / bin_hz, side="right")) - 1
            assert abs(dominant_band(p) - exp) <= 1, fmt


def test_aiff_roundtrip_all_formats():
    """AIFF / AIFF-C decode across the COMM/SSND surface: big-endian PCM
    8/16/24, the 'sowt' little-endian variant, 'fl32', and G.711 'ulaw'
    (shared expander tables) — all through the container-magic dispatch,
    with the 80-bit extended sample rate round-tripping exactly for the
    real-world rates."""
    from iresearch_ray.stages.audio import (_f80_decode, _f80_encode,
                                            decode_audio, encode_aiff)

    sr = 8000
    t = np.arange(sr // 4) / sr
    x = 0.6 * np.sin(2 * np.pi * 300 * t)
    tol = {"pcm16": 1e-3, "pcm8": 2e-2, "pcm24": 1e-5,
           "sowt16": 1e-3, "fl32": 1e-7, "ulaw": 0.016}
    for fmt, bound in tol.items():
        y, sr2 = decode_audio(encode_aiff(x, sr, fmt=fmt))
        assert sr2 == sr and y.size == x.size, fmt
        assert np.max(np.abs(y - x)) < bound, fmt
    for r in (8000, 11025, 22050, 44100, 48000, 96000):
        assert _f80_decode(_f80_encode(float(r))) == r
    # stereo downmix matches the WAV convention (mean)
    left = 0.25 * np.sin(2 * np.pi * 200 * t)
    right = 0.75 * np.sin(2 * np.pi * 200 * t)
    inter = np.empty(2 * t.size)
    inter[0::2] = left
    inter[1::2] = right
    import struct as _s

    mono = encode_aiff(inter, sr, fmt="pcm16")
    pos = mono.index(b"COMM") + 8
    stereo = mono[:pos] + _s.pack(">HI", 2, t.size) + mono[pos + 6:]
    y, _ = decode_audio(stereo)
    assert np.max(np.abs(y - (left + right) / 2)) < 1e-3


def test_aiff_corrupt_raises_cleanly():
    from iresearch_ray.stages.audio import decode_audio, encode_aiff

    good = encode_aiff(np.zeros(100), 8000)
    import pytest as _pt

    with _pt.raises(ValueError):
        decode_audio(good[:20])
    with _pt.raises(ValueError):
        decode_audio(b"FORM\x00\x00\x00\x04QQQQ")
    with _pt.raises(ValueError):  # unsupported AIFC compression
        decode_audio(good.replace(b"COMM", b"COMM", 1)[:0]
                     or b"FORM" + good[4:8] + b"AIFC" + good[12:])

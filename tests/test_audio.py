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

"""From-scratch FLAC codec (stages/flac.py, RFC 9639) — REAL end-to-end.

Strategy mirrors tests/test_h264*.py: the fixture encoder is only ever
trusted THROUGH the decoder (FLAC is lossless, so any bit-level
disagreement is a hard failure), circularity is broken by hand-built
bitstreams packed with an INDEPENDENT in-test bit packer, and determinism
is pinned with a sha256 stream golden.  Tamper tests prove the CRC-8 /
CRC-16 / MD5 integrity checks are live."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from iresearch_ray.stages.flac import (
    crc8,
    crc16,
    decode_flac,
    decode_flac_pcm,
    encode_flac,
)


def _sine_pcm(n=5000, freq=440.0, sr=16000, amp=30000, noise=0.0, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = amp * np.sin(2 * np.pi * freq * t) + noise * rng.standard_normal(n)
    return np.clip(np.round(x), -32768, 32767).astype(np.int64)


# ------------------------------------------------------------ round-trips


def test_mono_roundtrip_lossless_and_compressed():
    pcm = _sine_pcm(noise=600)
    enc = encode_flac(pcm, 16000, bps=16, block_size=1024)
    dec, sr, bps = decode_flac_pcm(enc)
    assert sr == 16000 and bps == 16
    assert np.array_equal(dec[:, 0], pcm)
    assert len(enc) < 2 * pcm.size  # genuinely smaller than raw PCM


@pytest.mark.parametrize(
    "mode", ["auto", "independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_modes_roundtrip(mode):
    left = _sine_pcm(3000, 220, amp=25000, noise=300)
    right = _sine_pcm(3000, 223, amp=24000, noise=300, seed=8)
    st = np.stack([left, right], axis=1)
    enc = encode_flac(st, 44100, block_size=512, stereo_mode=mode)
    dec, sr, _ = decode_flac_pcm(enc)
    assert sr == 44100
    assert np.array_equal(dec, st)


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_bit_depths_roundtrip(bps):
    amp = (1 << (bps - 1)) - 100
    pcm = _sine_pcm(2500, 350, amp=amp, noise=amp / 80)
    np.clip(pcm, -(1 << (bps - 1)), (1 << (bps - 1)) - 1, out=pcm)
    enc = encode_flac(pcm, 8000, bps=bps, block_size=576)
    dec, _, got_bps = decode_flac_pcm(enc)
    assert got_bps == bps
    assert np.array_equal(dec[:, 0], pcm)


def test_partial_last_frame_and_tiny_inputs():
    pcm = _sine_pcm(4100)  # 4096 + 4-sample last frame
    assert np.array_equal(
        decode_flac_pcm(encode_flac(pcm, 16000, block_size=4096))[0][:, 0], pcm
    )
    for n in (1, 2, 5, 192):
        p = np.arange(n, dtype=np.int64) * 3 - 7
        assert np.array_equal(
            decode_flac_pcm(encode_flac(p, 8000, block_size=192))[0][:, 0], p
        ), n


def test_silence_wasted_bits_escape_verbatim_paths():
    z = np.zeros(3000, np.int64)  # CONSTANT subframes
    assert np.array_equal(decode_flac_pcm(encode_flac(z, 8000))[0][:, 0], z)
    w = (_sine_pcm(2000) >> 3) << 3  # 3 common trailing zero bits
    enc = encode_flac(w, 8000)
    assert np.array_equal(decode_flac_pcm(enc)[0][:, 0], w)
    p = _sine_pcm(700, noise=500)
    esc = encode_flac(p, 8000, force_escape=True)  # escape partitions
    assert np.array_equal(decode_flac_pcm(esc)[0][:, 0], p)
    ver = encode_flac(p, 8000, force_verbatim=True)  # VERBATIM subframes
    assert np.array_equal(decode_flac_pcm(ver)[0][:, 0], p)
    assert len(ver) > len(esc) or len(ver) >= 2 * p.size  # verbatim ~raw


def test_lpc_subframes_engage_on_ar_signal():
    """A resonant AR(2) process is LPC territory — assert the encoder
    actually chose LPC subframes (decoded type >= 32), so the decoder's
    LPC branch is load-bearing, not just reachable."""
    rng = np.random.default_rng(3)
    n = 12000
    x = np.zeros(n)
    e = rng.standard_normal(n) * 300
    for i in range(2, n):
        x[i] = 1.6 * x[i - 1] - 0.8 * x[i - 2] + e[i]
    pcm = np.clip(np.round(x), -32768, 32767).astype(np.int64)
    enc = encode_flac(pcm, 16000)
    dec, _, _ = decode_flac_pcm(enc)
    assert np.array_equal(dec[:, 0], pcm)

    import iresearch_ray.stages.flac as F

    types = []
    orig = F._decode_subframe

    def spy(br, nn, bb):
        types.append(int(br.bits[br.pos + 1:br.pos + 7]
                         @ (1 << np.arange(5, -1, -1))))
        return orig(br, nn, bb)

    F._decode_subframe = spy
    try:
        F.decode_flac_pcm(enc)
    finally:
        F._decode_subframe = orig
    assert any(t >= 32 for t in types), types


# ------------------------------------------------------------ integrity


def test_crc_and_md5_tamper_detection():
    pcm = _sine_pcm(3000, noise=200)
    enc = bytearray(encode_flac(pcm, 16000, block_size=1024))
    bad = bytearray(enc)
    bad[len(bad) // 2] ^= 0x10  # flip a residual bit mid-frame
    with pytest.raises(ValueError):
        decode_flac_pcm(bytes(bad))
    bad2 = bytearray(enc)
    bad2[4 + 4 + 18] ^= 0xFF  # first MD5 byte inside STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        decode_flac_pcm(bytes(bad2))


def test_stream_golden_determinism():
    pcm = _sine_pcm(4100, 220, noise=150, seed=42)
    enc = encode_flac(pcm, 16000, block_size=2048)
    assert enc == encode_flac(pcm, 16000, block_size=2048)
    # pinned digest: regenerating this stream must stay byte-identical
    # across sessions (seeded input, deterministic encoder) — same golden
    # discipline as tests/test_h264.py
    assert hashlib.sha256(enc).hexdigest() == (
        "e4caf04d781ce0c2cb0c36cd6d094549605a7a2fc6ecf678ce3caa77e7650f5e"
    )


# --------------------------------------------- independent hand-built stream


class _Packer:
    """Independent MSB-first bit packer — deliberately NOT the module's
    BitWriter, so a shared bug cannot hide."""

    def __init__(self):
        self.bits = []

    def put(self, v, n):
        self.bits += [(v >> (n - 1 - i)) & 1 for i in range(n)]

    def bytes(self):
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j in range(8):
                b = (b << 1) | self.bits[i + j]
            out.append(b)
        return bytes(out)


def test_decode_handbuilt_constant_stream():
    """Hand-assemble a minimal FLAC file (one frame, one CONSTANT
    subframe) bit by bit from the RFC 9639 field layout and check the
    decoder reads exactly the intended samples."""
    n, sr, bps, value = 192, 8000, 16, -1234

    si = _Packer()
    si.put(n, 16)          # min block
    si.put(n, 16)          # max block
    si.put(0, 24)          # min frame (unknown)
    si.put(0, 24)          # max frame
    si.put(sr, 20)
    si.put(0, 3)           # channels - 1
    si.put(bps - 1, 5)
    si.put(n, 36)          # total samples
    streaminfo = si.bytes()
    pcm = np.full((n, 1), value, np.int64)
    from iresearch_ray.stages.flac import _pack_pcm

    md5 = hashlib.md5(_pack_pcm(pcm, bps)).digest()

    hdr = _Packer()
    hdr.put(0x3FFE, 14)    # sync
    hdr.put(0, 1)          # reserved
    hdr.put(0, 1)          # fixed block size strategy
    hdr.put(1, 4)          # block size code 1 -> 192
    hdr.put(4, 4)          # sample rate code 4 -> 8000
    hdr.put(0, 4)          # 1 channel
    hdr.put(4, 3)          # sample size code 4 -> 16 bit
    hdr.put(0, 1)          # reserved
    hdr.put(0, 8)          # coded frame number 0
    hdr_bytes = hdr.bytes()

    body = _Packer()
    body.put(0, 1)                     # subframe pad
    body.put(0, 6)                     # CONSTANT
    body.put(0, 1)                     # no wasted bits
    body.put(value & 0xFFFF, 16)       # the constant, two's complement
    body.put(0, (-len(body.bits)) % 8)  # byte alignment padding
    frame_wo_crc16 = hdr_bytes + bytes([crc8(hdr_bytes)]) + body.bytes()
    frame = frame_wo_crc16 + crc16(frame_wo_crc16).to_bytes(2, "big")

    stream = (
        b"fLaC"
        + bytes([0x80])               # last metadata block, STREAMINFO
        + (34).to_bytes(3, "big")
        + streaminfo
        + md5
        + frame
    )
    dec, got_sr, got_bps = decode_flac_pcm(stream)
    assert got_sr == sr and got_bps == bps
    assert np.array_equal(dec, pcm)


def test_decode_handbuilt_fixed_order1_rice_stream():
    """Hand-build a FIXED order-1 subframe with one rice(1) partition:
    samples 10, 12, 11, 13 → warmup 10, residuals +2, -1, +2 (zigzag
    4, 1, 4 → rice p=1: q=2 r=0, q=0 r=1, q=2 r=0)."""
    n, sr, bps = 4, 8000, 8
    samples = np.array([[10], [12], [11], [13]], np.int64)

    si = _Packer()
    si.put(n, 16); si.put(n, 16); si.put(0, 24); si.put(0, 24)
    si.put(sr, 20); si.put(0, 3); si.put(bps - 1, 5); si.put(n, 36)
    from iresearch_ray.stages.flac import _pack_pcm

    md5 = hashlib.md5(_pack_pcm(samples, bps)).digest()

    hdr = _Packer()
    hdr.put(0x3FFE, 14); hdr.put(0, 1); hdr.put(0, 1)
    hdr.put(6, 4)        # block size: 8-bit value follows
    hdr.put(4, 4)        # 8 kHz
    hdr.put(0, 4)        # mono
    hdr.put(1, 3)        # 8-bit samples
    hdr.put(0, 1)
    hdr.put(0, 8)        # frame number
    hdr.put(n - 1, 8)    # block size - 1
    hdr_bytes = hdr.bytes()

    body = _Packer()
    body.put(0, 1)
    body.put(8 | 1, 6)   # FIXED order 1
    body.put(0, 1)       # no wasted bits
    body.put(10, 8)      # warmup sample
    body.put(0, 2)       # residual method 0 (4-bit rice)
    body.put(0, 4)       # partition order 0
    body.put(1, 4)       # rice parameter 1
    for q, r in ((2, 0), (0, 1), (2, 0)):
        body.put(1, q + 1)   # q zeros then a 1
        body.put(r, 1)
    pad = (-len(body.bits)) % 8
    body.put(0, pad)
    frame_wo = hdr_bytes + bytes([crc8(hdr_bytes)]) + body.bytes()
    frame = frame_wo + crc16(frame_wo).to_bytes(2, "big")
    stream = (b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
              + si.bytes() + md5 + frame)
    dec, got_sr, got_bps = decode_flac_pcm(stream)
    assert np.array_equal(dec, samples)


# ------------------------------------------------------------ stage wiring


def test_audio_decode_stage_mixed_formats(ray_session):
    import ray.data as rd

    from iresearch_ray.stages.audio import (
        AudioDecode,
        dominant_band,
        synth_audio_table,
    )

    tbl = synth_audio_table(8, sr=8000, secs=0.4, fmt="mixed")
    mimes = tbl["mime"].to_pylist()
    assert "audio/flac" in mimes and "audio/wav" in mimes
    ds = rd.from_arrow(tbl).map_batches(AudioDecode(), batch_format="pyarrow")
    dec = ds.to_pandas().set_index("item_id").sort_index()
    assert (dec["sample_rate"] == 8000).all()
    assert (dec["n_samples"] == 3200).all()

    # physics: dominant FFT band tracks the seeded frequency, FLAC rows too
    n_bands, sr = 13, 8000
    for row in tbl.to_pylist():
        band = dominant_band(row["payload"], n_bands=n_bands)
        expect = int(row["freq_hz"] / (sr / 2) * n_bands)
        assert abs(band - expect) <= 1, (row["item_id"], band, expect)


def test_flac_float_decode_matches_wav_of_same_signal():
    from iresearch_ray.stages.audio import decode_audio, encode_wav

    sr = 8000
    t = np.arange(3200) / sr
    x = 0.6 * np.sin(2 * np.pi * 500 * t)
    wav_x, _ = decode_audio(encode_wav(x, sr))
    flac_x, flac_sr = decode_audio(encode_flac(x, sr, bps=16))
    assert flac_sr == sr
    # same 16-bit quantization grid up to the ±1-LSB rounding difference
    # between the two encoders' float→int conversions
    assert np.max(np.abs(wav_x - flac_x)) <= 2.0 / 32768


def test_wide_residuals_use_rice2_and_stay_bounded():
    """32-bit random samples are the degenerate-rice stress case: the
    encoder must pick rice2/escape so output stays ~width bits/sample
    (a 4-bit-param-only encoder explodes into multi-KB unary runs) and
    the decode must still be bit-exact."""
    rng = np.random.default_rng(17)
    x32 = rng.integers(-2**31, 2**31, 2000).astype(np.int64)
    enc = encode_flac(x32, 16000, bps=32)
    dec, _, bps = decode_flac_pcm(enc)
    assert bps == 32
    assert np.array_equal(dec[:, 0], x32)
    assert len(enc) * 8 < 34 * x32.size + 2048  # ~33 bits/sample + headers

    # the 5-bit escape width field caps at 31 — forcing escape on wider
    # residuals must raise, never silently truncate
    with pytest.raises(ValueError, match="escape"):
        encode_flac(x32, 16000, bps=32, force_escape=True)


def test_decode_cost_linear_in_clip_length():
    """Regression for the quadratic rice decode (whole-stream jump table
    per partition): a 4x longer clip must decode in well under 16x the
    time.  Wall-time ratios are noisy on this host, so the bound is loose
    (8x) but still far below quadratic."""
    import time

    rng = np.random.default_rng(2)

    def clip(secs):
        n = secs * 16000
        t = np.arange(n) / 16000
        x = 20000 * np.sin(2 * np.pi * 300 * t) + 2000 * rng.standard_normal(n)
        return np.clip(np.round(x), -32768, 32767).astype(np.int64)

    small, big = clip(2), clip(8)
    enc_s, enc_b = encode_flac(small, 16000), encode_flac(big, 16000)
    t0 = time.time()
    assert np.array_equal(decode_flac_pcm(enc_s)[0][:, 0], small)
    dt_s = time.time() - t0
    t0 = time.time()
    assert np.array_equal(decode_flac_pcm(enc_b)[0][:, 0], big)
    dt_b = time.time() - t0
    assert dt_b < max(8 * dt_s, dt_s + 2.0), (dt_s, dt_b)


def test_multichannel_and_20bit_roundtrip():
    """3-channel independent coding and a non-byte-multiple bit depth
    (20-bit: MD5 is zeroed per spec, CRCs still verify)."""
    rng = np.random.default_rng(9)
    tri = np.stack([_sine_pcm(1500, f, amp=20000, noise=200, seed=s)
                    for f, s in ((220, 1), (330, 2), (440, 3))], axis=1)
    enc = encode_flac(tri, 16000, block_size=576)
    dec, _, _ = decode_flac_pcm(enc)
    assert np.array_equal(dec, tri)

    p20 = np.clip(np.round(400000 * np.sin(np.arange(2000) / 9.0)
                           + 900 * rng.standard_normal(2000)),
                  -(1 << 19), (1 << 19) - 1).astype(np.int64)
    enc20 = encode_flac(p20, 8000, bps=20, block_size=576)
    dec20, _, bps = decode_flac_pcm(enc20)
    assert bps == 20
    assert np.array_equal(dec20[:, 0], p20)


def test_uncommon_block_size_and_odd_sample_rate():
    """block_size=1000 exercises the 16-bit uncommon-size header field
    (code 7); an off-table sample rate (11025) rides the sr-from-
    STREAMINFO path (code 0)."""
    pcm = _sine_pcm(3100, 500, sr=11025, noise=100)
    enc = encode_flac(pcm, 11025, block_size=1000)
    dec, sr, _ = decode_flac_pcm(enc)
    assert sr == 11025
    assert np.array_equal(dec[:, 0], pcm)


def test_decode_explicit_sample_rate_fields():
    """Hand-build frames using header sample-rate codes 12 (8-bit kHz),
    13 (16-bit Hz) and 14 (16-bit tens-of-Hz) — paths the fixture encoder
    never emits (it always uses the table or STREAMINFO)."""
    n, bps, value = 192, 16, 77
    pcm = np.full((n, 1), value, np.int64)
    from iresearch_ray.stages.flac import _pack_pcm

    for sr_code, extra_bits, extra_val, want_sr in (
        (12, 8, 32, 32000), (13, 16, 11025, 11025), (14, 16, 4410, 44100)
    ):
        si = _Packer()
        si.put(n, 16); si.put(n, 16); si.put(0, 24); si.put(0, 24)
        si.put(want_sr, 20); si.put(0, 3); si.put(bps - 1, 5); si.put(n, 36)
        md5 = hashlib.md5(_pack_pcm(pcm, bps)).digest()
        hdr = _Packer()
        hdr.put(0x3FFE, 14); hdr.put(0, 1); hdr.put(0, 1)
        hdr.put(1, 4)             # block size 192
        hdr.put(sr_code, 4)
        hdr.put(0, 4); hdr.put(4, 3); hdr.put(0, 1)
        hdr.put(0, 8)             # frame number
        hdr.put(extra_val, extra_bits)  # explicit sample rate field
        hdr_bytes = hdr.bytes()
        body = _Packer()
        body.put(0, 1); body.put(0, 6); body.put(0, 1)
        body.put(value, 16)
        body.put(0, (-len(body.bits)) % 8)
        frame_wo = hdr_bytes + bytes([crc8(hdr_bytes)]) + body.bytes()
        frame = frame_wo + crc16(frame_wo).to_bytes(2, "big")
        stream = (b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
                  + si.bytes() + md5 + frame)
        dec, got_sr, _ = decode_flac_pcm(stream)
        assert got_sr == want_sr, sr_code
        assert np.array_equal(dec, pcm)

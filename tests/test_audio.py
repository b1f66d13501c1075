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

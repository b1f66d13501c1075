"""Audio column stages — REAL decode path (task brief "multimodal columns").

Unlike the image/video stages (stages/multimodal.py), audio needs no
external library: WAV (RIFF) containers parse with the stdlib ``wave``
module and 16-bit PCM decodes with one ``np.frombuffer`` — so this modality
is real end-to-end in this sandbox: real container parsing, real PCM
decode, real DSP features (framed RMS / zero-crossing rate / FFT band
energies), real linear resampling.

Every stage is an actor-pool ``map_batches`` class: setup (band matrix,
window) happens once per actor in ``__init__``; ``__call__`` transforms one
Arrow batch.  Payloads are opaque ``binary`` columns; decoded samples are
``list<float32>`` (variable length) with a ``sample_rate`` column alongside.
Use small ``batch_size`` for long clips (memory-aware: batch × concurrency
must fit the worker heap).
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pyarrow as pa

AUDIO_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
    ]
)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (float32 mono samples in [-1, 1], sample_rate).
    Real parse via stdlib ``wave``; 16-bit PCM only (the pinned corpus
    format).  Multi-channel input is mean-downmixed."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        raw = w.readframes(n)
    x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Container dispatch on magic bytes: RIFF/WAVE or native FLAC
    (stages/flac.py — from-scratch RFC 9639 decoder, the format speech
    corpora actually ship).  Same contract either way: (float32 mono
    samples in [-1, 1], sample_rate)."""
    if payload[:4] == b"fLaC":
        from iresearch_ray.stages.flac import decode_flac

        return decode_flac(payload)
    if payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise ValueError("unsupported audio container (expected WAV or FLAC)")


def encode_wav(samples: np.ndarray, sr: int) -> bytes:
    """float samples in [-1, 1] → 16-bit PCM mono WAV bytes (the synth-
    corpus writer; also the round-trip partner of decode_wav in tests)."""
    pcm = np.clip(np.asarray(samples, np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class AudioDecode:
    """binary WAV/FLAC payload → (samples: list<float32>, sample_rate,
    n_samples); container dispatch per row, so one batch can mix formats."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        samples, rates = [], []
        for payload in batch["payload"].to_pylist():
            x, sr = decode_audio(payload)
            samples.append(x)
            rates.append(sr)
        flat = np.concatenate(samples) if samples else np.array([], np.float32)
        offsets = np.concatenate(([0], np.cumsum([len(s) for s in samples]))).astype(np.int64)
        return pa.table(
            {
                "item_id": batch["item_id"],
                # large_list: int64 offsets — a batch of long clips can
                # exceed 2^31 total samples, which would wrap int32 offsets
                "samples": pa.LargeListArray.from_arrays(
                    pa.array(offsets), pa.array(flat, pa.float32())
                ),
                "sample_rate": pa.array(rates, pa.int32()),
                "n_samples": pa.array([len(s) for s in samples], pa.int64()),
            }
        )


class AudioResample:
    """Linear-interpolation resample to a target rate (real math)."""

    def __init__(self, target_rate: int = 8000):
        self.target = target_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["samples"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        rates = batch["sample_rate"].to_numpy(zero_copy_only=False)
        out, rates_out = [], []
        for i in range(batch.num_rows):
            x = np.asarray(col[i].as_py(), dtype=np.float32)
            sr = int(rates[i])
            if sr == self.target or x.size == 0:
                out.append(x)
            else:
                n_out = max(1, int(round(x.size * self.target / sr)))
                t_old = np.arange(x.size, dtype=np.float64) / sr
                t_new = np.arange(n_out, dtype=np.float64) / self.target
                out.append(np.interp(t_new, t_old, x).astype(np.float32))
            rates_out.append(self.target)
        flat = np.concatenate(out) if out else np.array([], np.float32)
        offsets = np.concatenate(([0], np.cumsum([len(s) for s in out]))).astype(np.int64)
        return pa.table(
            {
                "item_id": batch["item_id"],
                "samples": pa.LargeListArray.from_arrays(
                    pa.array(offsets), pa.array(flat, pa.float32())
                ),
                "sample_rate": pa.array(rates_out, pa.int32()),
                "n_samples": pa.array([len(s) for s in out], pa.int64()),
            }
        )


class AudioFeatures:
    """Clip → fixed-dim embedding: framed RMS energy + zero-crossing rate +
    ``n_bands`` FFT band log-energies, averaged over frames.  The band
    matrix and Hann window are built ONCE per actor (the model-load seam);
    per batch the work is framing + one rFFT per clip."""

    def __init__(self, frame_len: int = 512, hop: int = 256, n_bands: int = 13):
        self.frame_len = frame_len
        self.hop = hop
        self.n_bands = n_bands
        self.window = np.hanning(frame_len).astype(np.float64)
        n_bins = frame_len // 2 + 1
        edges = np.linspace(0, n_bins, n_bands + 1).astype(np.int64)
        self.band_of = np.repeat(np.arange(n_bands), np.diff(edges))

    def _frames(self, x: np.ndarray) -> np.ndarray:
        if x.size < self.frame_len:
            x = np.pad(x, (0, self.frame_len - x.size))
        n = 1 + (x.size - self.frame_len) // self.hop
        idx = np.arange(self.frame_len)[None, :] + self.hop * np.arange(n)[:, None]
        return x[idx]

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["samples"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dim = 2 + self.n_bands
        feats = np.empty((batch.num_rows, dim), dtype=np.float32)
        for i in range(batch.num_rows):
            x = np.asarray(col[i].as_py(), dtype=np.float64)
            fr = self._frames(x)
            rms = np.sqrt((fr**2).mean(axis=1))
            zcr = (np.diff(np.signbit(fr), axis=1) != 0).mean(axis=1)
            spec = np.abs(np.fft.rfft(fr * self.window, axis=1)) ** 2
            bands = np.zeros((fr.shape[0], self.n_bands))
            np.add.at(bands.T, self.band_of, spec.T)
            logb = np.log1p(bands)
            feats[i, 0] = rms.mean()
            feats[i, 1] = zcr.mean()
            feats[i, 2:] = logb.mean(axis=0)
        return pa.table(
            {
                "item_id": batch["item_id"],
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), dim
                ),
            }
        )


def dominant_band(payload: bytes, frame_len: int = 512, n_bands: int = 13) -> int:
    """Index of the strongest FFT band of a clip — test/oracle helper."""
    x, _sr = decode_audio(payload)
    f = AudioFeatures(frame_len=frame_len, n_bands=n_bands)
    t = f(pa.table({"item_id": pa.array([0], pa.int64()),
                    "samples": pa.array([x.tolist()], pa.list_(pa.float32()))}))
    emb = np.asarray(t["embedding"][0].as_py())
    return int(np.argmax(emb[2:]))


def synth_audio_table(n: int, sr: int = 8000, secs: float = 0.5, seed: int = 11,
                      fmt: str = "wav") -> pa.Table:
    """Deterministic REAL-audio corpus: per item a sine at a seeded
    frequency plus light noise.  ``fmt``: "wav" (16-bit PCM RIFF), "flac"
    (genuinely compressed native FLAC via stages/flac.py), or "mixed"
    (alternating — exercises AudioDecode's per-row container dispatch)."""
    if fmt not in ("wav", "flac", "mixed"):
        raise ValueError(f"synth_audio_table: unknown fmt {fmt!r}")
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * secs)) / sr
    payloads, freqs, mimes = [], [], []
    for i in range(n):
        f = float(rng.integers(200, 3500))
        x = 0.7 * np.sin(2 * np.pi * f * t) + 0.01 * rng.standard_normal(t.size)
        use_flac = fmt == "flac" or (fmt == "mixed" and i % 2)
        if use_flac:
            from iresearch_ray.stages.flac import encode_flac

            payloads.append(encode_flac(x, sr, bps=16))
            mimes.append("audio/flac")
        else:
            payloads.append(encode_wav(x, sr))
            mimes.append("audio/wav")
        freqs.append(f)
    return pa.table(
        {
            "item_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "freq_hz": pa.array(freqs, pa.float64()),
        }
    )

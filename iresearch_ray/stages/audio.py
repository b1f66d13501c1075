"""Audio column stages — REAL decode path (task brief "multimodal columns").

Unlike the image/video stages (stages/multimodal.py), audio needs no
external library: WAV (RIFF) containers parse with a from-scratch chunk
walker and every common sample format decodes with vectorized numpy — so
this modality is real end-to-end in this sandbox: real container parsing,
real PCM / G.711 / float decode, real DSP features (framed RMS /
zero-crossing rate / FFT band energies), real linear resampling.

Supported WAVE sample formats (decode_wav):
- PCM (wFormatTag 1): 8-bit unsigned, 16/24/32-bit signed little-endian
- IEEE float (tag 3): float32 / float64
- ITU-T G.711 A-law (tag 6) and mu-law (tag 7) — the telephony formats;
  expansion is computed from the G.711 segment/chord formulas (sign,
  3-bit exponent, 4-bit mantissa), not a transcribed table, and the
  encoders quantize by nearest decoded value so round-trip correctness
  follows from the decoder alone (repo convention: fixture encoders are
  only trusted THROUGH the decoder; hand-built byte vectors in tests pin
  the decode formulas to the published 16-bit endpoints +/-32124 /
  +/-32256).
- WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE): SubFormat GUID's leading 16-bit
  code remapped to any of the above.

Every stage is an actor-pool ``map_batches`` class: setup (band matrix,
window) happens once per actor in ``__init__``; ``__call__`` transforms one
Arrow batch.  Payloads are opaque ``binary`` columns; decoded samples are
``list<float32>`` (variable length) with a ``sample_rate`` column alongside.
Use small ``batch_size`` for long clips (memory-aware: batch × concurrency
must fit the worker heap).
"""

from __future__ import annotations

import io
import struct
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


# ---------------------------------------------------------------------------
# G.711 expansion (ITU-T G.711 segment/chord layout).  Each code byte is
# sign(1) | exponent(3) | mantissa(4); the linear value is reconstructed
# arithmetically, scaled to the conventional 16-bit domain (mu-law peaks at
# +/-32124, A-law at +/-32256).  Tables are DERIVED here from the formula,
# once at import, then decode is a vectorized 256-entry lookup.

def _ulaw_decode_table() -> np.ndarray:
    u = np.arange(256, dtype=np.int64) ^ 0xFF  # G.711 transmits mu-law inverted
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84  # bias 132 folded per segment
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    a = np.arange(256, dtype=np.int64) ^ 0x55  # even bits inverted on the wire
    seg = (a >> 4) & 0x07
    mant = a & 0x0F
    t = (mant << 4) + 8  # segment 0: step 16, half-step offset 8
    t = np.where(seg >= 1, ((mant << 4) + 0x108) << np.maximum(seg - 1, 0), t)
    # in A-law the sign bit SET means positive (opposite of mu-law)
    return np.where(a & 0x80, t, -t).astype(np.int16)


_ULAW2LIN = _ulaw_decode_table()
_ALAW2LIN = _alaw_decode_table()
# Encode = nearest decoded value (ties toward the lower code).  Correctness
# rides entirely on the decode tables: quantization cells are the midpoints
# between consecutive decoded values, so decode(encode(x)) is within half a
# local step of x by construction.
_ULAW_ORDER = np.argsort(_ULAW2LIN, kind="stable").astype(np.uint8)
_ULAW_SORTED = _ULAW2LIN[_ULAW_ORDER].astype(np.int64)
_ALAW_ORDER = np.argsort(_ALAW2LIN, kind="stable").astype(np.uint8)
_ALAW_SORTED = _ALAW2LIN[_ALAW_ORDER].astype(np.int64)


def _g711_encode(pcm16: np.ndarray, sorted_vals: np.ndarray,
                 order: np.ndarray) -> np.ndarray:
    x = np.asarray(pcm16, np.int64)
    hi = np.searchsorted(sorted_vals, x, side="left")
    hi = np.clip(hi, 1, len(sorted_vals) - 1)
    lo = hi - 1
    pick_hi = (sorted_vals[hi] - x) < (x - sorted_vals[lo])
    return order[np.where(pick_hi, hi, lo)]


def ulaw_encode(pcm16: np.ndarray) -> np.ndarray:
    """int16 linear → G.711 mu-law code bytes (nearest-value quantizer)."""
    return _g711_encode(pcm16, _ULAW_SORTED, _ULAW_ORDER)


def alaw_encode(pcm16: np.ndarray) -> np.ndarray:
    """int16 linear → G.711 A-law code bytes (nearest-value quantizer)."""
    return _g711_encode(pcm16, _ALAW_SORTED, _ALAW_ORDER)


# ---------------------------------------------------------------------------
# RIFF/WAVE container — from-scratch chunk walker (chunks are word-aligned:
# an odd-sized chunk is followed by one pad byte).  The stdlib ``wave``
# module only reads integer PCM; real corpora also ship G.711, float and
# EXTENSIBLE files, so the walker + format dispatch below replace it on the
# decode side.

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_ALAW = 0x0006
_WAVE_FORMAT_MULAW = 0x0007
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def _riff_chunks(payload: bytes):
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]  # clips at EOF (truncated file)
        yield cid, body
        pos += 8 + size + (size & 1)


def _decode_samples(tag: int, bits: int, data: bytes) -> np.ndarray:
    """Raw sample bytes → float32 in [-1, 1] (interleaved, channel-agnostic)."""
    if tag == _WAVE_FORMAT_PCM:
        if bits == 8:  # 8-bit PCM is unsigned with midpoint 128
            return (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
        if bits == 16:
            return np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
        if bits == 24:
            b = np.frombuffer(data, np.uint8)[: (len(data) // 3) * 3].reshape(-1, 3)
            x = (b[:, 0].astype(np.int32)
                 | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int32) << 16))
            x = (x << 8) >> 8  # sign-extend 24 → 32
            return x.astype(np.float32) / 8388608.0
        if bits == 32:
            return np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
        raise ValueError(f"unsupported PCM bit depth {bits}")
    if tag == _WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            return np.frombuffer(data, "<f4").astype(np.float32)
        if bits == 64:
            return np.frombuffer(data, "<f8").astype(np.float32)
        raise ValueError(f"unsupported float bit depth {bits}")
    if tag == _WAVE_FORMAT_ALAW:
        return _ALAW2LIN[np.frombuffer(data, np.uint8)].astype(np.float32) / 32768.0
    if tag == _WAVE_FORMAT_MULAW:
        return _ULAW2LIN[np.frombuffer(data, np.uint8)].astype(np.float32) / 32768.0
    raise ValueError(f"unsupported WAVE format tag 0x{tag:04x}")


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (float32 mono samples in [-1, 1], sample_rate).
    From-scratch chunk walk; PCM 8/16/24/32-bit, IEEE float32/64, G.711
    A-law/mu-law, and WAVE_FORMAT_EXTENSIBLE wrappers of any of those.
    Multi-channel input is mean-downmixed; unknown chunks are skipped."""
    fmt = data = None
    for cid, body in _riff_chunks(payload):
        if cid == b"fmt " and fmt is None:
            fmt = body
        elif cid == b"data" and data is None:
            data = body
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    tag, ch, sr, _byterate, _align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == _WAVE_FORMAT_EXTENSIBLE:
        if len(fmt) < 40:
            raise ValueError("EXTENSIBLE fmt chunk too short")
        # SubFormat GUID at offset 24; its leading 16-bit code IS the format
        tag = int.from_bytes(fmt[24:26], "little")
    x = _decode_samples(tag, bits, data)
    if ch > 1:
        x = x[: (x.size // ch) * ch].reshape(-1, ch).mean(axis=1).astype(np.float32)
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


def encode_wav_fmt(samples: np.ndarray, sr: int, fmt: str = "pcm16") -> bytes:
    """float samples in [-1, 1] → mono WAV bytes in any decode-supported
    sample format — the fixture partner for the non-PCM decode paths.
    ``fmt``: pcm16 | pcm24 | pcm32 | float32 | float64 | mulaw | alaw.
    Non-PCM files get the real-world shape: an 18-byte fmt chunk
    (cbSize=0) plus a ``fact`` chunk carrying the frame count."""
    x = np.clip(np.asarray(samples, np.float64), -1.0, 1.0)
    pcm16 = np.round(x * 32767.0).astype(np.int64)
    if fmt == "pcm16":
        tag, bits, data = _WAVE_FORMAT_PCM, 16, pcm16.astype("<i2").tobytes()
    elif fmt == "pcm24":
        v = np.round(x * 8388607.0).astype(np.int32)
        b = np.empty((v.size, 3), np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        tag, bits, data = _WAVE_FORMAT_PCM, 24, b.tobytes()
    elif fmt == "pcm32":
        v = np.round(x * 2147483647.0).astype("<i4")
        tag, bits, data = _WAVE_FORMAT_PCM, 32, v.tobytes()
    elif fmt == "float32":
        tag, bits, data = _WAVE_FORMAT_IEEE_FLOAT, 32, x.astype("<f4").tobytes()
    elif fmt == "float64":
        tag, bits, data = _WAVE_FORMAT_IEEE_FLOAT, 64, x.astype("<f8").tobytes()
    elif fmt == "mulaw":
        tag, bits, data = _WAVE_FORMAT_MULAW, 8, ulaw_encode(pcm16).tobytes()
    elif fmt == "alaw":
        tag, bits, data = _WAVE_FORMAT_ALAW, 8, alaw_encode(pcm16).tobytes()
    else:
        raise ValueError(f"encode_wav_fmt: unknown fmt {fmt!r}")
    nframes = len(x)
    block = max(1, bits // 8)
    pcm_like = tag == _WAVE_FORMAT_PCM
    fmt_body = struct.pack("<HHIIHH", tag, 1, sr, sr * block, block, bits)
    if not pcm_like:
        fmt_body += struct.pack("<H", 0)  # cbSize=0 (18-byte fmt, G.711 norm)
    chunks = [(b"fmt ", fmt_body)]
    if not pcm_like:
        chunks.append((b"fact", struct.pack("<I", nframes)))
    chunks.append((b"data", data))
    body = b"WAVE"
    for cid, cbody in chunks:
        body += cid + struct.pack("<I", len(cbody)) + cbody
        if len(cbody) & 1:
            body += b"\x00"  # word alignment pad
    return b"RIFF" + struct.pack("<I", len(body)) + body


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
    (genuinely compressed native FLAC via stages/flac.py), "mixed"
    (alternating — exercises AudioDecode's per-row container dispatch), or
    any ``encode_wav_fmt`` sample format ("mulaw", "alaw", "pcm24",
    "pcm32", "float32", "float64") for the non-PCM WAV decode paths."""
    wav_fmts = ("mulaw", "alaw", "pcm24", "pcm32", "float32", "float64")
    if fmt not in ("wav", "flac", "mixed") + wav_fmts:
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
        elif fmt in wav_fmts:
            payloads.append(encode_wav_fmt(x, sr, fmt=fmt))
            mimes.append("audio/wav")
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

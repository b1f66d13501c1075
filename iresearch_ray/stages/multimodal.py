"""Multimodal column stages — task brief "multimodal columns".

Image / audio / video payloads are opaque Arrow ``binary`` columns with
typed metadata columns alongside (mime, width/height or sample_rate/frames,
etc.).  Each stage is an actor-pool ``map_batches`` class: expensive setup
(codec init, model load) happens ONCE per actor in ``__init__``; ``__call__``
transforms one Arrow batch.  Use small ``batch_size`` for large payloads so
batch × concurrency fits the worker heap (task brief "memory-aware").

The sandbox has no image/audio libraries, so REAL decoding is stubbed:

* ``decoder="fake"`` (default) — a clearly-marked DETERMINISTIC FAKE that
  derives pixel/sample arrays from an md5 stream over the payload bytes.
  Output shapes/dtypes are exactly what a real decoder would produce, so
  every downstream stage (resize, feature extract, frame sample) and all
  Ray plumbing (schema, fixed-size-list layout, actor signature) is real
  and tested.
* ``decoder="pil"`` / ``"libav"`` — raise ``NotImplementedError`` unless the
  library import succeeds (it won't in this container) — the seam where a
  real deployment plugs in Pillow / PyAV.

Suggested usage::

    ds.map_batches(ImageDecode(height=8, width=8), batch_size=64,
                   concurrency=(2, 8), num_cpus=1, batch_format="pyarrow")
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

VIDEO_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("n_frames", pa.int32()),
        ("fps", pa.float32()),
    ]
)


def _fake_pixels(payload: bytes, h: int, w: int, c: int = 3) -> np.ndarray:
    """DETERMINISTIC FAKE decode: md5-keyed byte stream shaped (h, w, c).
    NOT a real image decode — stands in for PIL.Image.open in this
    container (see module docstring)."""
    n = h * w * c
    out = np.empty(n, dtype=np.uint8)
    digest = hashlib.md5(payload).digest()
    reps = (n + len(digest) - 1) // len(digest)
    stream = (digest * reps)[:n]
    out[:] = np.frombuffer(stream, dtype=np.uint8)
    return out.reshape(h, w, c)


class ImageDecode:
    """binary payload → fixed-size pixel tensor column (list<uint8> flat,
    plus shape columns).  Actor-pool stage; decoder selected at init."""

    def __init__(self, height: int = 8, width: int = 8, decoder: str = "fake"):
        self.h, self.w = height, width
        self.decoder = decoder
        if decoder == "pil":
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError as e:  # pragma: no cover - no PIL in container
                raise NotImplementedError(
                    "real image decode needs Pillow; use decoder='fake' here"
                ) from e
        elif decoder != "fake":
            raise ValueError(f"unknown decoder {decoder!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels = []
        for payload in batch["payload"].to_pylist():
            if self.decoder == "fake":
                px = _fake_pixels(payload or b"", self.h, self.w)
            else:  # pragma: no cover
                raise NotImplementedError
            pixels.append(px.ravel())
        flat = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(pixels) if pixels else np.array([], np.uint8)),
            self.h * self.w * 3,
        )
        return pa.table(
            {
                "item_id": batch["item_id"],
                "pixels": flat,
                "height": pa.array([self.h] * batch.num_rows, pa.int32()),
                "width": pa.array([self.w] * batch.num_rows, pa.int32()),
            }
        )


class ImageResize:
    """Nearest-neighbor resize of decoded pixel tensors (vectorized numpy
    index grid — real math, works on fake or real pixels alike)."""

    def __init__(self, out_h: int, out_w: int):
        self.oh, self.ow = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = int(batch["height"][0].as_py())
        w = int(batch["width"][0].as_py())
        n = batch.num_rows
        flat = batch["pixels"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        imgs = flat.reshape(n, h, w, 3)
        yi = (np.arange(self.oh) * h // self.oh).astype(np.int64)
        xi = (np.arange(self.ow) * w // self.ow).astype(np.int64)
        out = imgs[:, yi][:, :, xi]  # (n, oh, ow, 3)
        flat_out = pa.FixedSizeListArray.from_arrays(
            pa.array(out.reshape(-1)), self.oh * self.ow * 3
        )
        return pa.table(
            {
                "item_id": batch["item_id"],
                "pixels": flat_out,
                "height": pa.array([self.oh] * n, pa.int32()),
                "width": pa.array([self.ow] * n, pa.int32()),
            }
        )


class ImageFeatures:
    """Pixel tensor → feature vector.  The "model" is a deterministic
    seeded random projection loaded ONCE per actor in __init__ (the
    model-load seam); inference is one batched matmul per Arrow batch."""

    def __init__(self, in_h: int = 8, in_w: int = 8, dim: int = 16, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((in_h * in_w * 3, dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat = batch["pixels"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        n = batch.num_rows
        x = flat.reshape(n, -1).astype(np.float32) / 255.0
        feats = x @ self.proj  # (n, dim) one vectorized matmul per batch
        return pa.table(
            {
                "item_id": batch["item_id"],
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), self.proj.shape[1]
                ),
            }
        )


class FrameSample:
    """Video payload → every k-th frame as an image-shaped row (flat_map
    style: output rows ≠ input rows).  Frames come from the fake decoder;
    a real deployment swaps in PyAV keyframe extraction."""

    def __init__(self, every: int = 10, height: int = 8, width: int = 8):
        self.every = every
        self.h, self.w = height, width

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, fidx = [], [], []
        for i in range(batch.num_rows):
            payload = batch["payload"][i].as_py() or b""
            n_frames = int(batch["n_frames"][i].as_py())
            for f in range(0, n_frames, self.every):
                # frame f = fake-decode of payload salted with the frame index
                px = _fake_pixels(payload + f.to_bytes(4, "big"), self.h, self.w)
                ids.append(batch["item_id"][i].as_py())
                fidx.append(f)
                frames.append(px.ravel())
        flat = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(frames) if frames else np.array([], np.uint8)),
            self.h * self.w * 3,
        )
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "pixels": flat,
                "height": pa.array([self.h] * len(ids), pa.int32()),
                "width": pa.array([self.w] * len(ids), pa.int32()),
            }
        )


def synth_image_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake image corpus (payload = seeded random bytes)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, 64, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "item_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/fake"] * n, pa.string()),
            "width": pa.array([8] * n, pa.int32()),
            "height": pa.array([8] * n, pa.int32()),
        }
    )


def synth_video_table(n: int, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, 128, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "item_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["video/fake"] * n, pa.string()),
            "n_frames": pa.array([30] * n, pa.int32()),
            "fps": pa.array([30.0] * n, pa.float32()),
        }
    )

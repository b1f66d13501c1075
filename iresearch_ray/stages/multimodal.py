"""Multimodal column stages — task brief "multimodal columns".

Image / audio / video payloads are opaque Arrow ``binary`` columns with
typed metadata columns alongside (mime, width/height or sample_rate/frames,
etc.).  Each stage is an actor-pool ``map_batches`` class: expensive setup
(codec init, model load) happens ONCE per actor in ``__init__``; ``__call__``
transforms one Arrow batch.  Use small ``batch_size`` for large payloads so
batch × concurrency fits the worker heap (task brief "memory-aware").

Decoders, by honesty level:

* ``decoder="ppm"`` (images) / ``"ppm_stream"`` (video) — REAL decodes with
  zero external libraries: binary PPM (P6) header parse + frombuffer, and a
  concatenated-P6 video container for frame sampling.  Round-trip tested
  against genuine bytes.  (Audio is likewise fully real — stages/audio.py.)
* ``decoder="png"`` — a REAL COMPRESSED format, decoded with stdlib zlib +
  numpy only: chunk/CRC parse, inflate, and all five scanline filters
  (None/Sub/Up/Average/Paeth) unfiltered.  FULL spec surface: bit depths
  1/2/4/8/16, color types gray/RGB/palette/gray+alpha/RGBA, Adam7
  interlace, PLTE + tRNS (palette alpha and gray/RGB color keys) —
  correctness-grade (per-row Python for the two sequentially-dependent
  filters); swap in Pillow via ``"pil"`` for production throughput.
* ``decoder="gif"`` — REAL GIF87a/89a (stages/gif.py): LZW decompression,
  global/local palettes, 4-pass interlace, transparency + all disposal
  methods; single images here, animations via ``FrameSample``.
* ``decoder="jpeg"`` — REAL JPEG (ITU-T T.81): marker walk, canonical
  Huffman entropy decode, dequant + de-zigzag + matrix IDCT, JFIF
  YCbCr→RGB, restart intervals (stages/jpeg.py, numpy + stdlib only).
  Covers baseline SOF0 at any integer sampling (4:4:4/4:2:2/4:2:0/4:1:1)
  AND progressive SOF2 (spectral selection + successive approximation,
  §G.1.2) — i.e. every shape common web/camera encoders emit; arithmetic
  coding / 12-bit / hierarchical raise pointing at the PIL seam.
  Correctness-grade throughput.
* ``decoder="fake"`` (default for compressed formats) — a clearly-marked
  DETERMINISTIC FAKE deriving pixels from an md5 stream over the payload.
  Output shapes/dtypes are exactly what a real decoder would produce, so
  every downstream stage (resize, feature extract, frame sample) and all
  Ray plumbing (schema, fixed-size-list layout, actor signature) is real
  and tested.
* ``decoder="pil"`` / ``"libav"`` — raise ``NotImplementedError`` unless the
  library import succeeds (it won't in this container) — the seam where a
  real deployment plugs in Pillow / PyAV for JPEG/PNG/mp4.

Suggested usage::

    ds.map_batches(ImageDecode(height=8, width=8), batch_size=64,
                   concurrency=(2, 8), num_cpus=1, batch_format="pyarrow")
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

from iresearch_ray.stages.jpeg import decode_jpeg, encode_jpeg

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


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6) bytes — a REAL image container
    writable/parsable with zero external libraries."""
    h, w, c = pixels.shape
    assert c == 3
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (h, w, 3) uint8 — a REAL decode: header
    parse (whitespace/comment-tolerant) + one frombuffer.  Raises on
    malformed input.  Returns the pixels; trailing bytes (e.g. the next
    frame of a concatenated-PPM stream) are ignored by the caller contract
    via decode_ppm_stream."""
    px, _end = _decode_ppm_at(payload, 0)
    return px


def _decode_ppm_at(buf: bytes, off: int) -> tuple[np.ndarray, int]:
    if buf[off : off + 2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos = off + 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    n = w * h * 3
    data = buf[pos : pos + n]
    if len(data) != n:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3), pos + n


def decode_ppm_stream(payload: bytes) -> list[np.ndarray]:
    """Concatenated-PPM video container (the pinned raw 'video' format):
    back-to-back P6 frames → list of (h, w, 3) uint8 frames.  Real
    container parsing, zero external libraries."""
    frames: list[np.ndarray] = []
    off = 0
    while off < len(payload):
        px, off = _decode_ppm_at(payload, off)
        frames.append(px)
    return frames


# ---------------------------------------------------------------------------
# PNG — real compressed-format codec, stdlib zlib + numpy only
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big")
        + tag
        + data
        + (zlib.crc32(tag + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _paeth_pred(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec §9.4) over int arrays."""
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))


# Adam7 pass layout: (x0, y0, dx, dy) per PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _pack_row(samples: np.ndarray, bitdepth: int) -> bytes:
    """1-D int samples → packed scanline bytes (MSB-first, byte-padded)."""
    if bitdepth == 8:
        return samples.astype(np.uint8).tobytes()
    if bitdepth == 16:
        return samples.astype(">u2").tobytes()
    per = 8 // bitdepth
    n = len(samples)
    pad = (-n) % per
    s = np.concatenate([samples, np.zeros(pad, samples.dtype)]).astype(np.uint8)
    # each sample → bitdepth bits, MSB first within the byte
    bits = np.unpackbits(s[:, None], axis=1)[:, 8 - bitdepth :]
    return np.packbits(bits.reshape(-1)).tobytes()


def _unpack_row(row: bytes, w: int, channels: int, bitdepth: int) -> np.ndarray:
    """Packed scanline bytes → (w, channels) int array of raw samples."""
    if bitdepth == 8:
        return (
            np.frombuffer(row, np.uint8, w * channels)
            .reshape(w, channels)
            .astype(np.int64)
        )
    if bitdepth == 16:
        return (
            np.frombuffer(row, ">u2", w * channels)
            .reshape(w, channels)
            .astype(np.int64)
        )
    bits = np.unpackbits(np.frombuffer(row, np.uint8))
    vals = bits[: (len(bits) // bitdepth) * bitdepth].reshape(-1, bitdepth)
    weights = 1 << np.arange(bitdepth - 1, -1, -1)
    return (vals @ weights)[: w * channels].reshape(w, channels).astype(np.int64)


def _filter_rows(
    rows: np.ndarray, bpp: int, filter_type: int
) -> bytes:
    """(h, stride) uint8 scanline bytes → filtered raw stream (one filter
    byte + ``stride`` filtered bytes per row), applying ``filter_type`` to
    every row.  Operates on BYTES with the spec's filter unit ``bpp``."""
    h, stride = rows.shape
    raw = bytearray()
    prev = np.zeros(stride, np.int16)
    for y in range(h):
        row = rows[y].astype(np.int16)
        left = np.zeros(stride, np.int16)
        left[bpp:] = row[:-bpp]
        ul = np.zeros(stride, np.int16)
        ul[bpp:] = prev[:-bpp]
        if filter_type == 0:
            f = row
        elif filter_type == 1:
            f = row - left
        elif filter_type == 2:
            f = row - prev
        elif filter_type == 3:
            f = row - (left + prev) // 2
        elif filter_type == 4:
            f = row - _paeth_pred(left, prev, ul)
        else:
            raise ValueError(f"bad filter_type {filter_type}")
        raw.append(filter_type)
        raw += (f % 256).astype(np.uint8).tobytes()
        prev = row
    return bytes(raw)


def encode_png(
    pixels: np.ndarray,
    filter_type: int = 0,
    *,
    bitdepth: int = 8,
    palette: np.ndarray | None = None,
    trns: bytes | np.ndarray | None = None,
    interlace: bool = False,
) -> bytes:
    """numpy pixels → REAL PNG bytes, covering the full spec surface the
    decoder supports (test fixture — a deployment uses Pillow):

    * ``(h, w)`` / ``(h, w, 1)`` gray, ``(h, w, 2)`` gray+alpha,
      ``(h, w, 3)`` RGB, ``(h, w, 4)`` RGBA — ``bitdepth`` 8 or 16
      (uint16 input for 16).
    * gray may also use ``bitdepth`` 1/2/4 (raw sample values).
    * ``palette=(N, 3) uint8`` → color type 3: ``pixels`` are ``(h, w)``
      indices, ``bitdepth`` 1/2/4/8; ``trns`` = per-entry alpha bytes.
    * ``trns`` on gray/RGB = the transparent color key as a sample tuple.
    * ``interlace=True`` emits Adam7 passes.
    * ``filter_type`` applies that scanline filter to every row so each
      of the decoder's five unfilter paths can be exercised."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    chunks = []
    if palette is not None:
        if c != 1 or bitdepth not in (1, 2, 4, 8):
            raise ValueError("palette PNG needs (h, w) indices, depth 1/2/4/8")
        color = 3
        pal = np.asarray(palette, np.uint8)
        chunks.append(_png_chunk(b"PLTE", pal.tobytes()))
        if trns is not None:
            chunks.append(_png_chunk(b"tRNS", bytes(np.asarray(trns, np.uint8))))
    else:
        color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
        if bitdepth in (1, 2, 4) and color != 0:
            raise ValueError("sub-byte depth is gray-only")
        if trns is not None:
            if color not in (0, 2):
                raise ValueError("color-key tRNS is for gray/RGB only")
            key = np.asarray(trns).reshape(-1).astype(">u2")
            chunks.append(_png_chunk(b"tRNS", key.tobytes()))
    bpp = max(1, (c * bitdepth + 7) // 8)

    def pass_raw(img: np.ndarray) -> bytes:
        ph, pw = img.shape[:2]
        if ph == 0 or pw == 0:
            return b""
        rows = np.stack(
            [
                np.frombuffer(_pack_row(img[y].reshape(-1), bitdepth), np.uint8)
                for y in range(ph)
            ]
        )
        return _filter_rows(rows, bpp, filter_type)

    if interlace:
        raw = b"".join(
            pass_raw(px[y0::dy, x0::dx]) for x0, y0, dx, dy in _ADAM7
        )
    else:
        raw = pass_raw(px)
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([bitdepth, color, 0, 0, 1 if interlace else 0])
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + b"".join(chunks)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, stride: int, bpp: int, off: int = 0) -> np.ndarray:
    """Invert PNG scanline filtering: ``h`` rows of (1 filter byte +
    ``stride`` bytes) starting at ``raw[off]`` → (h, stride) uint8.
    Filters None/Up are fully vectorized; Sub is per-lane cumsum;
    Average/Paeth carry a true sequential left-dependency and run per
    byte within the row (correctness-grade — production uses Pillow)."""
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        base = off + y * (stride + 1)
        ft = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, offset=base + 1).astype(np.int32)
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = (line + prev) % 256
        elif ft == 1:
            rec = line.copy()
            for lane in range(bpp):  # recon = running sum along the byte lane
                rec[lane::bpp] = np.cumsum(line[lane::bpp], dtype=np.int64) % 256
        elif ft == 3:
            rec = line.tolist()
            pv = prev.tolist()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + (left + pv[x]) // 2) % 256
            rec = np.array(rec, np.int32)
        elif ft == 4:
            rec = line.tolist()
            pv = prev.tolist()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = pv[x]
                cc = pv[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else cc)
                rec[x] = (rec[x] + pred) % 256
            rec = np.array(rec, np.int32)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """REAL full-spec PNG decode with stdlib zlib + numpy: chunk walk with
    CRC verification, IDAT inflate, scanline unfilter (all five filters,
    byte-level ``bpp`` unit), every valid IHDR combination — bit depths
    1/2/4/8/16, color types 0/2/3/4/6 — Adam7 interlace, PLTE, and tRNS
    (palette alpha AND gray/RGB color-key transparency).

    Output contract: uint8 for depths ≤ 8, uint16 for 16-bit, shaped
    (h, w, channels).  Sub-byte GRAY samples are rescaled to full 8-bit
    range (× 255/(2^d−1), exact for the bit-replication values PNG
    viewers use); palette indices are looked up in PLTE → (h, w, 3)
    RGB, or (h, w, 4) RGBA when a tRNS chunk supplies per-entry alpha.
    A color-key tRNS on gray/RGB appends an alpha channel."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    while pos + 12 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(payload[pos + 8 + ln : pos + 12 + ln], "big")
        if (zlib.crc32(tag + data) & 0xFFFFFFFF) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bitdepth, color, _comp, _filt, interlace = ihdr[8:13]
    _CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
    _VALID = {
        0: (1, 2, 4, 8, 16),
        2: (8, 16),
        3: (1, 2, 4, 8),
        4: (8, 16),
        6: (8, 16),
    }
    if color not in _CHANNELS or bitdepth not in _VALID[color] or interlace > 1:
        raise ValueError(
            f"invalid PNG IHDR (bitdepth={bitdepth} color={color} interlace={interlace})"
        )
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    c = _CHANNELS[color]
    bpp = max(1, (c * bitdepth + 7) // 8)
    raw = zlib.decompress(bytes(idat))

    def read_pass(pw: int, ph: int, off: int) -> tuple[np.ndarray, int]:
        stride = (pw * c * bitdepth + 7) // 8
        rows = _unfilter(raw, ph, stride, bpp, off)
        samples = np.stack(
            [_unpack_row(rows[y].tobytes(), pw, c, bitdepth) for y in range(ph)]
        )  # (ph, pw, c) raw sample values
        return samples, off + ph * (stride + 1)

    if interlace:
        img = np.zeros((h, w, c), np.int64)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            sub, off = read_pass(pw, ph, off)
            img[y0::dy, x0::dx] = sub
        expect = off
    else:
        img, expect = read_pass(w, h, 0)
    if expect != len(raw):
        raise ValueError("PNG IDAT length mismatch")

    maxval = (1 << bitdepth) - 1
    if color == 3:
        rgb = plte[np.clip(img[:, :, 0], 0, len(plte) - 1)]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
            return np.concatenate(
                [rgb, alpha[np.clip(img[:, :, 0], 0, len(plte) - 1)][:, :, None]],
                axis=2,
            )
        return rgb
    if color == 0 and bitdepth < 8:
        img = img * (255 // maxval)  # exact bit-replication scale for 1/2/4
    dtype = np.uint16 if bitdepth == 16 else np.uint8
    out = img.astype(dtype)
    if trns is not None and color in (0, 2):
        key = np.frombuffer(trns, ">u2").astype(np.int64)
        if color == 0 and bitdepth < 8:
            key = key * (255 // maxval)
        opaque = maxval if bitdepth == 16 else 255
        alpha = np.where(
            (out.astype(np.int64) == key[None, None, :]).all(axis=2), 0, opaque
        ).astype(dtype)
        out = np.concatenate([out, alpha[:, :, None]], axis=2)
    return out


def _to_rgb(px: np.ndarray) -> np.ndarray:
    """(h, w, c) → (h, w, 3) uint8: gray broadcast, alpha dropped,
    16-bit samples scaled down to 8 (high byte — exact for bit-replicated
    values)."""
    if px.dtype == np.uint16:
        px = (px >> 8).astype(np.uint8)
    c = px.shape[2]
    if c == 3:
        return px
    if c == 1:
        return np.repeat(px, 3, axis=2)
    if c == 2:  # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]


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

    def __init__(self, height: int = 8, width: int = 8, decoder: str = "fake",
                 on_error: str = "raise"):
        self.h, self.w = height, width
        self.decoder = decoder
        if on_error not in ("raise", "skip"):
            raise ValueError(f"on_error must be raise|skip, got {on_error!r}")
        self.on_error = on_error
        if decoder == "pil":
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError as e:  # pragma: no cover - no PIL in container
                raise NotImplementedError(
                    "real image decode needs Pillow; use decoder='fake' or "
                    "'ppm'/'png' (real, dependency-free) here"
                ) from e
        elif decoder not in ("fake", "ppm", "png", "jpeg", "gif", "bmp",
                             "tiff", "auto"):
            raise ValueError(f"unknown decoder {decoder!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels = []
        keep = []
        for row, payload in enumerate(batch["payload"].to_pylist()):
            try:
                px = self._decode(payload)
            except (ValueError, struct.error, zlib.error):
                # corrupt payloads at corpus scale: on_error='skip' drops
                # the row instead of failing the whole pipeline
                if self.on_error == "raise":
                    raise
                continue
            keep.append(row)
            pixels.append(px.ravel())
        flat = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(pixels) if pixels else np.array([], np.uint8)),
            self.h * self.w * 3,
        )
        ids = batch["item_id"] if len(keep) == batch.num_rows \
            else batch["item_id"].take(pa.array(keep, pa.int64()))
        return pa.table(
            {
                "item_id": ids,
                "pixels": flat,
                "height": pa.array([self.h] * len(keep), pa.int32()),
                "width": pa.array([self.w] * len(keep), pa.int32()),
            }
        )

    def _decode(self, payload) -> np.ndarray:
        if self.decoder == "fake":
            return _fake_pixels(payload or b"", self.h, self.w)
        if self.decoder == "ppm":
            # REAL decode (P6 container); dimensions come from the
            # header and must match the declared tensor shape
            px = decode_ppm(payload or b"")
            if px.shape != (self.h, self.w, 3):
                raise ValueError(
                    f"PPM is {px.shape[:2]}, stage expects {(self.h, self.w)}"
                )
            return px
        if self.decoder == "png":
            # REAL compressed decode (stdlib zlib inflate + unfilter)
            px = _to_rgb(decode_png(payload or b""))
            if px.shape != (self.h, self.w, 3):
                raise ValueError(
                    f"PNG is {px.shape[:2]}, stage expects {(self.h, self.w)}"
                )
            return px
        if self.decoder == "jpeg":
            # REAL baseline-JPEG decode (Huffman + IDCT, stages/jpeg.py)
            px = decode_jpeg(payload or b"")
            if px.ndim == 2:  # grayscale scan → (h, w, 1) for _to_rgb
                px = px[:, :, None]
            px = _to_rgb(px)
            if px.shape != (self.h, self.w, 3):
                raise ValueError(
                    f"JPEG is {px.shape[:2]}, stage expects {(self.h, self.w)}"
                )
            return px
        if self.decoder == "gif":
            # REAL GIF decode (stages/gif.py: LZW + palette + interlace);
            # a multi-frame GIF used as an image yields its first frame
            from iresearch_ray.stages.gif import decode_gif

            frames = decode_gif(payload or b"", limit=1)
            if not frames:
                raise ValueError("GIF has no frames")
            px = frames[0][1]
            if px.shape != (self.h, self.w, 3):
                raise ValueError(
                    f"GIF is {px.shape[:2]}, stage expects {(self.h, self.w)}"
                )
            return px
        if self.decoder in ("bmp", "tiff", "auto"):
            # REAL BMP / baseline-TIFF decode (stages/tiffbmp.py); "auto"
            # sniffs the container magic and routes to ANY of the real
            # decoders — the shape a mixed-format corpus column needs
            px = _decode_sniffed(payload or b"", self.decoder)
            px = _to_rgb(px if px.ndim == 3 else px[:, :, None])
            if px.shape != (self.h, self.w, 3):
                raise ValueError(
                    f"image is {px.shape[:2]}, stage expects "
                    f"{(self.h, self.w)}"
                )
            return px
        raise NotImplementedError  # pragma: no cover


def _decode_sniffed(payload: bytes, decoder: str) -> np.ndarray:
    """Magic-sniffing image dispatch over the REAL in-engine codecs."""
    from iresearch_ray.stages.tiffbmp import decode_bmp, decode_tiff

    if decoder == "bmp":
        return decode_bmp(payload)
    if decoder == "tiff":
        return decode_tiff(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"II", b"MM"):
        return decode_tiff(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if payload[:4] in (b"GIF8",):
        from iresearch_ray.stages.gif import decode_gif

        frames = decode_gif(payload, limit=1)
        if not frames:
            raise ValueError("GIF has no frames")
        return frames[0][1]
    raise ValueError("unrecognized image container magic")


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
    style: output rows ≠ input rows).  ``decoder="ppm_stream"`` REALLY
    parses the pinned concatenated-PPM container (back-to-back P6 frames,
    zero external libs); ``decoder="mjpeg_avi"`` REALLY parses a RIFF-AVI
    MJPG container (stages/avi.py); ``decoder="mjpeg_mp4"`` REALLY parses
    an ISO-BMFF MP4 sample table (stages/mp4.py) and decodes Motion-JPEG
    tracks — in both, every frame is an independent JPEG, so skipped
    frames are never entropy-decoded; ``decoder="h264_mp4"`` REALLY decodes
    avc1 tracks with the from-scratch decoder (stages/h264.py: CAVLC and
    CABAC I pictures, 4x4 and High-profile 8x8 transforms, CAVLC
    P pictures — quarter-pel inter prediction, P_Skip, DPB — AND CAVLC
    B pictures — bi-prediction, spatial AND temporal direct,
    explicit/implicit weighting, POC display-order restore; CABAC-P/B
    samples are skipped without entropy decode);
    ``decoder="gif"`` REALLY
    decodes animated GIF (stages/gif.py: LZW, palettes, interlace,
    transparency + disposal composition — frames are deltas, so earlier
    frames are still decoded); ``"fake"`` keeps the deterministic
    stand-in; a real deployment swaps in PyAV only for what is left
    (CABAC-P/B recon, webm/vp9/H.265)."""

    def __init__(self, every: int = 10, height: int = 8, width: int = 8,
                 decoder: str = "fake", on_error: str = "raise"):
        self.every = every
        self.h, self.w = height, width
        if decoder not in ("fake", "ppm_stream", "mjpeg_avi", "mjpeg_mp4",
                           "h264_mp4", "gif"):
            raise ValueError(f"unknown decoder {decoder!r}")
        if on_error not in ("raise", "skip"):
            raise ValueError(f"on_error must be raise|skip, got {on_error!r}")
        self.decoder = decoder
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, fidx = [], [], []
        for i in range(batch.num_rows):
            try:
                self._one(batch, i, ids, frames, fidx)
            except (ValueError, struct.error):
                # corrupt payloads are a fact of life at corpus scale:
                # on_error='skip' drops the ITEM (its rows simply don't
                # appear) instead of failing the whole pipeline; 'raise'
                # (default) keeps strict semantics for fixtures/tests
                if self.on_error == "raise":
                    raise
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

    def _one(self, batch: pa.Table, i: int, ids, frames, fidx) -> None:
        """Decode/sample one item, appending its frame rows.  Appends are
        deferred until each frame is validated, so a mid-item failure
        under on_error='skip' cannot leave partial rows: rows for an item
        land all-or-nothing."""
        out_ids, out_frames, out_fidx = [], [], []
        payload = batch["payload"][i].as_py() or b""
        item_id = batch["item_id"][i].as_py()
        if self.decoder in ("mjpeg_avi", "mjpeg_mp4", "h264_mp4", "gif"):
            if self.decoder == "mjpeg_avi":
                from iresearch_ray.stages.avi import decode_avi_mjpeg as _dec
            elif self.decoder == "h264_mp4":
                from iresearch_ray.stages.mp4 import decode_mp4_h264 as _dec
            elif self.decoder == "gif":
                # animated GIF as video: frames are delta-composited, so
                # earlier frames are still decoded (unlike MJPEG skip)
                from iresearch_ray.stages.gif import decode_gif as _dec
            else:
                from iresearch_ray.stages.mp4 import decode_mp4_mjpeg as _dec

            for f, px in _dec(payload, every=self.every):
                if px.shape != (self.h, self.w, 3):
                    raise ValueError("frame shape mismatch")
                out_ids.append(item_id)
                out_fidx.append(f)
                out_frames.append(px.ravel())
        elif self.decoder == "ppm_stream":
            all_frames = decode_ppm_stream(payload)
            for f in range(0, len(all_frames), self.every):
                px = all_frames[f]
                if px.shape != (self.h, self.w, 3):
                    raise ValueError("frame shape mismatch")
                out_ids.append(item_id)
                out_fidx.append(f)
                out_frames.append(px.ravel())
        else:
            n_frames = int(batch["n_frames"][i].as_py())
            for f in range(0, n_frames, self.every):
                # frame f = fake-decode of payload salted with the frame index
                px = _fake_pixels(payload + f.to_bytes(4, "big"), self.h, self.w)
                out_ids.append(item_id)
                out_fidx.append(f)
                out_frames.append(px.ravel())
        ids.extend(out_ids)
        fidx.extend(out_fidx)
        frames.extend(out_frames)


def synth_ppm_table(n: int, h: int = 8, w: int = 8, seed: int = 42) -> tuple:
    """REAL-PPM image corpus: payload = genuine P6 bytes of seeded pixels."""
    rng = np.random.default_rng(seed)
    payloads, pix = [], []
    for _ in range(n):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        pix.append(px)
        payloads.append(encode_ppm(px))
    t = pa.table(
        {
            "item_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/x-portable-pixmap"] * n, pa.string()),
            "width": pa.array([w] * n, pa.int32()),
            "height": pa.array([h] * n, pa.int32()),
        }
    )
    return t, pix


def synth_ppm_video_table(n: int, n_frames: int = 12, h: int = 8, w: int = 8, seed: int = 9) -> pa.Table:
    """REAL concatenated-PPM video corpus."""
    rng = np.random.default_rng(seed)
    payloads = []
    for _ in range(n):
        payloads.append(
            b"".join(
                encode_ppm(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
                for _ in range(n_frames)
            )
        )
    return pa.table(
        {
            "item_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["video/x-ppm-stream"] * n, pa.string()),
            "n_frames": pa.array([n_frames] * n, pa.int32()),
            "fps": pa.array([10.0] * n, pa.float32()),
        }
    )


def synth_mjpeg_avi_table(
    n: int, n_frames: int = 12, h: int = 8, w: int = 8, seed: int = 9
) -> tuple:
    """REAL MJPG-AVI video corpus: payload = genuine RIFF-AVI bytes whose
    '00dc' chunks are baseline JPEGs of SMOOTH seeded frames (block-constant
    pixels, so the lossy round-trip is near-exact and tests can bound the
    reconstruction error).  Returns (table, frames-per-item)."""
    from iresearch_ray.stages.avi import encode_avi_mjpeg

    rng = np.random.default_rng(seed)
    payloads, all_frames = [], []
    for _ in range(n):
        frames = []
        for _f in range(n_frames):
            # one color per 8x8 JPEG block: DC-only content survives
            # quantization almost exactly
            blocks = rng.integers(0, 256, ((h + 7) // 8, (w + 7) // 8, 3), dtype=np.uint8)
            px = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)[:h, :w]
            frames.append(np.ascontiguousarray(px))
        all_frames.append(frames)
        payloads.append(encode_avi_mjpeg(frames, fps=10, quality=95))
    t = pa.table(
        {
            "item_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["video/x-msvideo"] * n, pa.string()),
            "n_frames": pa.array([n_frames] * n, pa.int32()),
            "fps": pa.array([10.0] * n, pa.float32()),
        }
    )
    return t, all_frames


def synth_mjpeg_mp4_table(
    n: int, n_frames: int = 12, h: int = 8, w: int = 8, seed: int = 9
) -> tuple:
    """REAL MJPEG-in-MP4 video corpus: payload = genuine ISO-BMFF bytes
    whose samples are baseline JPEGs of SMOOTH seeded frames (same content
    strategy as synth_mjpeg_avi_table).  Returns (table, frames-per-item)."""
    from iresearch_ray.stages.mp4 import encode_mp4_mjpeg

    rng = np.random.default_rng(seed)
    payloads, all_frames = [], []
    for _ in range(n):
        frames = []
        for _f in range(n_frames):
            blocks = rng.integers(0, 256, ((h + 7) // 8, (w + 7) // 8, 3), dtype=np.uint8)
            px = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)[:h, :w]
            frames.append(np.ascontiguousarray(px))
        all_frames.append(frames)
        payloads.append(encode_mp4_mjpeg(frames, fps=10, quality=95))
    t = pa.table(
        {
            "item_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["video/mp4"] * n, pa.string()),
            "n_frames": pa.array([n_frames] * n, pa.int32()),
            "fps": pa.array([10.0] * n, pa.float32()),
        }
    )
    return t, all_frames


def synth_png_table(n: int, h: int = 8, w: int = 8, seed: int = 42) -> tuple:
    """REAL-PNG image corpus: payload = genuine PNG bytes of seeded pixels,
    cycling through all five scanline filter types across items so a decode
    sweep exercises every unfilter path."""
    rng = np.random.default_rng(seed)
    payloads, pix = [], []
    for i in range(n):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        pix.append(px)
        payloads.append(encode_png(px, filter_type=i % 5))
    t = pa.table(
        {
            "item_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/png"] * n, pa.string()),
            "width": pa.array([w] * n, pa.int32()),
            "height": pa.array([h] * n, pa.int32()),
        }
    )
    return t, pix


def synth_jpeg_table(
    n: int, h: int = 8, w: int = 8, seed: int = 42, quality: int = 95
) -> tuple:
    """REAL-JPEG image corpus: payload = genuine baseline-JFIF bytes of
    seeded SMOOTH images (low-frequency gradients — JPEG is lossy, so the
    fixture keeps reconstruction error small and the test asserts a
    tolerance, not equality).  Alternates RGB and grayscale scans so both
    SOF0 component layouts are exercised."""
    rng = np.random.default_rng(seed)
    payloads, pix = [], []
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        a, b, c = rng.uniform(0.2, 2.0, 3)
        base = 128 + 90 * np.sin(a * yy / h * np.pi) * np.cos(b * xx / w * np.pi + c)
        if i % 2:
            px = np.clip(base, 0, 255).astype(np.uint8)  # grayscale
        else:
            px = np.clip(
                np.stack([base, 255 - base, np.roll(base, 2, axis=1)], axis=-1), 0, 255
            ).astype(np.uint8)
        pix.append(px if px.ndim == 3 else np.repeat(px[:, :, None], 3, axis=2))
        payloads.append(encode_jpeg(px, quality=quality))
    t = pa.table(
        {
            "item_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/jpeg"] * n, pa.string()),
            "width": pa.array([w] * n, pa.int32()),
            "height": pa.array([h] * n, pa.int32()),
        }
    )
    return t, pix


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

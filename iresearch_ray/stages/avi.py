"""Minimal RIFF-AVI container with MJPG video streams — the first REAL
compressed VIDEO format in the multimodal path (SURVEY §2.12; the pinned
concatenated-PPM stream stays as the raw path, PyAV as the documented
swap-in for mp4/webm).

Motion JPEG is the simplest widely-deployed compressed video coding: every
frame is an independent baseline JPEG, so the dependency-free codec in
stages/jpeg.py carries the whole decode and frame sampling can seek to any
frame without inter-frame state — exactly the access pattern FrameSample
needs (decode only every k-th frame).

Layout written/parsed here (everything little-endian, chunks even-padded):

    RIFF <size> 'AVI '
      LIST <size> 'hdrl'
        'avih' <56>  main header (us/frame, total frames, w, h, ...)
        LIST <size> 'strl'
          'strh' <56>  stream header (fccType 'vids', handler 'MJPG')
          'strf' <40>  BITMAPINFOHEADER (biCompression 'MJPG')
      LIST <size> 'movi'
        '00dc' <n> <jpeg bytes>      (one per frame)
      'idx1' <16*frames>  frame index (offset, length per '00dc')

The parser is tolerant of unknown chunks (skips by size) and decodes via
the 'movi' walk, using 'idx1' only as a cross-check when present.
"""

from __future__ import annotations

import struct

import numpy as np

from iresearch_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 95
) -> bytes:
    """Encode (h, w, 3) uint8 frames as an MJPG AVI (one baseline JPEG per
    frame).  All frames must share one shape."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one shape")
        jpegs.append(encode_jpeg(f, quality=quality))

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,                 # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        len(frames),       # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        max(len(j) for j in jpegs),  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,        # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIIhhhh",
            0, 0, 0,          # flags, priority, language
            0,                # initial frames
            1, fps,           # scale, rate → fps
            0, len(frames),   # start, length
            max(len(j) for j in jpegs),
            10_000,           # quality
            0,                # sample size (0: varying)
            0, 0, w, h,       # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)
    # idx1: per-frame (ckid, flags, offset-from-movi-list-type, length)
    idx_entries = []
    off = 4  # offsets count from the 'movi' fourcc
    for j in jpegs:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _walk_chunks(buf: memoryview, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) over a chunk sequence."""
    while pos + 8 <= end:
        fourcc = bytes(buf[pos : pos + 4])
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def avi_mjpeg_meta(payload: bytes) -> dict:
    """Header-only probe: (width, height, n_frames, fps) without touching
    the frame data — the cheap schema/metadata pass over a video column."""
    buf = memoryview(payload)
    if len(payload) < 12 or bytes(buf[:4]) != b"RIFF" or bytes(buf[8:12]) != b"AVI ":
        raise ValueError("not a RIFF AVI payload")
    for fourcc, p, size in _walk_chunks(buf, 12, len(payload)):
        if fourcc == b"LIST" and bytes(buf[p : p + 4]) == b"hdrl":
            for fc2, p2, s2 in _walk_chunks(buf, p + 4, p + size):
                if fc2 == b"avih":
                    v = struct.unpack_from("<14I", buf, p2)
                    fps = round(1_000_000 / v[0]) if v[0] else 0
                    return {
                        "width": v[8],
                        "height": v[9],
                        "n_frames": v[4],
                        "fps": fps,
                    }
    raise ValueError("no avih header in AVI")


def decode_avi_mjpeg(
    payload: bytes, every: int = 1
) -> list[tuple[int, np.ndarray]]:
    """Decode every ``every``-th MJPG frame → [(frame_idx, (h, w, 3))…].
    Skipped frames are never entropy-decoded (each JPEG is independent),
    so sampling cost scales with frames KEPT, not stream length."""
    if every < 1:
        raise ValueError("every must be >= 1")
    buf = memoryview(payload)
    if len(payload) < 12 or bytes(buf[:4]) != b"RIFF" or bytes(buf[8:12]) != b"AVI ":
        raise ValueError("not a RIFF AVI payload")
    out: list[tuple[int, np.ndarray]] = []
    frame = 0
    for fourcc, p, size in _walk_chunks(buf, 12, len(payload)):
        if fourcc != b"LIST" or bytes(buf[p : p + 4]) != b"movi":
            continue
        for fc2, p2, s2 in _walk_chunks(buf, p + 4, p + size):
            if fc2[2:] not in (b"dc", b"db"):  # compressed/uncompressed video
                continue
            if frame % every == 0:
                px = decode_jpeg(bytes(buf[p2 : p2 + s2]))
                if px.ndim == 2:
                    px = np.repeat(px[:, :, None], 3, axis=2)
                out.append((frame, px))
            frame += 1
    if frame == 0:
        raise ValueError("no video chunks in AVI movi list")
    return out

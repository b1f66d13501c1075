"""GIF87a/GIF89a codec — stdlib + numpy only, no external image libraries.

Real-world reach for the multimodal stack (task brief "multimodal
columns"): GIF is the one legacy web format that still shows up in every
scraped corpus, both as single images and as short animations.  This
module gives the engine a genuine decode path so animated GIFs flow
through the same ``FrameSample`` actor-pool stage as AVI/MP4 video and
single-frame GIFs through ``ImageDecode`` — no PIL seam.

Implemented from the public GIF89a specification:

* header + logical screen descriptor, global color table
* image descriptors with local color tables and the 4-pass interlace
* LZW decompression: LSB-first bit packing, variable code width 3..12,
  deferred CLEAR handling, the (code == next_code) KwKwK case
* graphic control extensions: transparency index, frame delays, and all
  disposal methods (none / keep / restore-background / restore-previous)
* NETSCAPE looping extension and comment/plain-text/app block skipping
* a fixture ENCODER with a real LZW compressor (dictionary reset at 4096,
  same width-growth rule), optional interlace, per-frame local palettes,
  transparency and disposal — so every decoder path round-trips against
  known pixels without external tools.

Frame semantics: GIF frames are DELTA-composited onto a logical-screen
canvas, so unlike MJPEG-AVI/MP4 (independent frames, skipped frames never
entropy-decoded) sampling frame k requires decoding frames 0..k.
``decode_gif(every=k)`` therefore decodes sequentially but only
materializes every k-th composed frame, and stops early when ``limit``
frames have been emitted.

Scale stance: one GIF is decoded entirely inside one actor task
(payloads are small — the format caps at 256 colors); parallelism comes
from the Ray Data actor pool across items, same as the JPEG/H.264 paths.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE = 0x2C
_EXT = 0x21
_GCE = 0xF9
_APP = 0xFF

# interlace pass layout: (row offset, row stride) per GIF89a appendix E
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytes:
    """GIF-flavor LZW: LSB-first bit stream, CLEAR/EOI codes, 12-bit cap.
    Decodes at most ``max_pixels`` output bytes (a well-formed stream
    yields exactly the image's pixel count)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reservoir over the whole sub-block-joined stream
    bits = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    # dictionary as (prefix_code, last_byte) pairs; roots are implicit
    prefix = np.zeros(4096, np.int32)
    suffix = np.zeros(4096, np.uint8)
    next_code = eoi + 1
    prev = -1
    out = bytearray()
    tail = bytearray()  # scratch for expanding one code
    while len(out) < max_pixels:
        while nbits < width:
            if pos >= len(data):
                # truncated streams terminate output; caller validates count
                return bytes(out)
            bits |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bits & ((1 << width) - 1)
        bits >>= width
        nbits -= width
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("LZW stream starts with a non-root code")
            out.append(code)
            prev = code
            continue
        if code > next_code or code == eoi or code == clear:
            raise ValueError("corrupt LZW code")
        # expand `code` (or the KwKwK case when code == next_code)
        tail.clear()
        c = prev if code == next_code else code
        while c >= clear:
            tail.append(suffix[c])
            c = int(prefix[c])
        first = c
        tail.append(first)
        tail.reverse()
        if code == next_code:
            tail.append(first)
        out += tail
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return bytes(out)


def _lzw_encode(pixels: bytes, min_code_size: int) -> bytes:
    """GIF LZW compressor for the fixture encoder: emits CLEAR up front,
    resets the dictionary at 4096, LSB-first packing — a real compressor
    whose output any conformant GIF reader accepts."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bits = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bits, nbits
        bits |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bits & 0xFF)
            bits >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = -1
    for b in pixels:
        if prev < 0:
            prev = b
            continue
        key = (prev, b)
        if key in table:
            prev = table[key]
            continue
        emit(prev, width)
        if next_code < 4096:
            table[key] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prev = b
    if prev >= 0:
        emit(prev, width)
    emit(eoi, width)
    if nbits:
        out.append(bits & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container walk
# ---------------------------------------------------------------------------


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Join length-prefixed sub-blocks starting at ``pos`` until the 0
    terminator; returns (data, position after terminator)."""
    parts = []
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        parts.append(payload[pos : pos + n])
        if len(parts[-1]) != n:
            raise ValueError("truncated GIF sub-block")
        pos += n


def _chunk_sub_blocks(data: bytes) -> bytes:
    """Inverse of _sub_blocks for the encoder: ≤255-byte length-prefixed
    runs plus the 0 terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        run = data[i : i + 255]
        out.append(len(run))
        out += run
    out.append(0)
    return bytes(out)


def _parse_header(payload: bytes):
    if payload[:3] != b"GIF" or payload[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    bg = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    return w, h, bg, gct, pos, payload[3:6].decode()


def gif_meta(payload: bytes) -> dict:
    """Header-only probe (no LZW decode): version, logical screen size,
    frame count, per-frame delays (centiseconds), loop count (NETSCAPE
    extension; 0 = forever, None = not animated/absent), interlace use."""
    w, h, _bg, gct, pos, version = _parse_header(payload)
    n_frames = 0
    delays = []
    delay = 0
    loop = None
    interlaced = False
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == _TRAILER:
            break
        if b == _EXT:
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == _GCE and len(data) >= 4:
                delay = struct.unpack_from("<H", data, 1)[0]
            elif label == _APP and data[:11] == b"NETSCAPE2.0" and len(data) >= 14:
                loop = struct.unpack_from("<H", data, 12)[0]
        elif b == _IMAGE:
            _l, _t, _iw, _ih = struct.unpack_from("<HHHH", payload, pos)
            packed = payload[pos + 8]
            pos += 9
            if packed & 0x80:
                pos += 3 * (2 << (packed & 0x07))
            if packed & 0x40:
                interlaced = True
            pos += 1  # LZW min code size
            _data, pos = _sub_blocks(payload, pos)
            n_frames += 1
            delays.append(delay)
            delay = 0
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    return {
        "version": version,
        "width": w,
        "height": h,
        "n_frames": n_frames,
        "delays_cs": delays,
        "loop": loop,
        "interlaced": interlaced,
        "has_global_palette": gct is not None,
    }


def decode_gif(
    payload: bytes, every: int = 1, limit: int | None = None
) -> list[tuple[int, np.ndarray]]:
    """Decode a GIF into composed logical-screen frames: returns
    ``[(frame_idx, (h, w, 3) uint8), ...]`` for every ``every``-th frame,
    at most ``limit`` of them (frames are delta-composited, so earlier
    frames are still LZW-decoded; decoding STOPS once the last sampled
    frame is materialized).  Transparency holes show the background
    color; disposal methods 0–3 are honored."""
    w, h, bg, gct, pos, _version = _parse_header(payload)
    bg_rgb = (
        gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    out: list[tuple[int, np.ndarray]] = []
    frame_idx = 0
    transparent = -1
    disposal = 0
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == _TRAILER:
            break
        if b == _EXT:
            label = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            if label == _GCE and len(data) >= 4:
                packed = data[0]
                disposal = (packed >> 2) & 0x07
                transparent = data[3] if packed & 0x01 else -1
            continue
        if b != _IMAGE:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        left, top, iw, ih = struct.unpack_from("<HHHH", payload, pos)
        packed = payload[pos + 8]
        pos += 9
        pal = gct
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            pal = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF frame has no color table")
        mcs = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        if left + iw > w or top + ih > h:
            raise ValueError("GIF frame exceeds logical screen")
        idx = np.frombuffer(_lzw_decode(data, mcs, iw * ih), np.uint8)
        if len(idx) != iw * ih:
            raise ValueError("GIF frame pixel count mismatch")
        if packed & 0x40:  # interlaced: rows arrive in 4 passes
            rows = np.empty((ih, iw), np.uint8)
            flat = idx.reshape(-1, iw)
            r = 0
            for off, step in _INTERLACE:
                n_rows = len(range(off, ih, step))
                rows[off::step] = flat[r : r + n_rows]
                r += n_rows
            idx = rows
        else:
            idx = idx.reshape(ih, iw)
        region = canvas[top : top + ih, left : left + iw]
        saved = region.copy() if disposal == 3 else None
        rgb = pal[np.clip(idx, 0, len(pal) - 1)]
        if transparent >= 0:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        if frame_idx % every == 0:
            out.append((frame_idx, canvas.copy()))
            if limit is not None and len(out) >= limit:
                return out
        # disposal AFTER the frame is shown
        if disposal == 2:
            region[:] = bg_rgb
        elif disposal == 3 and saved is not None:
            region[:] = saved
        disposal = 0
        transparent = -1
        frame_idx += 1
    return out


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    *,
    delays_cs: list[int] | None = None,
    transparent: int | None = None,
    disposals: list[int] | None = None,
    interlace: bool = False,
    local_palettes: list[np.ndarray | None] | None = None,
    loop: int | None = 0,
    regions: list[tuple[int, int]] | None = None,
    screen: tuple[int, int] | None = None,
    bg: int = 0,
) -> bytes:
    """Index frames + palette → REAL GIF89a bytes (test fixture).

    ``frames`` are (h, w) uint8 INDEX arrays (quantization is the
    caller's job — fixtures work index-space so round-trips are exact).
    ``regions`` places each frame at (left, top) on a ``screen`` larger
    than the frame (delta-frame tests); ``local_palettes[i]`` overrides
    the global palette for frame i.  ``transparent``/``disposals`` wire
    the GCE fields; ``interlace`` emits the 4-pass row order."""
    pal = np.asarray(palette, np.uint8)
    n = len(pal)
    size_bits = max(1, int(np.ceil(np.log2(max(n, 2)))))
    n_slots = 1 << size_bits
    h0, w0 = frames[0].shape
    sw, sh = (screen if screen is not None else (w0, h0))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", sw, sh)
    out.append(0x80 | (size_bits - 1))  # GCT present, size
    out.append(bg)
    out.append(0)  # aspect
    out += pal.tobytes() + bytes((n_slots - n) * 3)
    if loop is not None:
        out += bytes([_EXT, _APP, 11]) + b"NETSCAPE2.0"
        out += bytes([3, 1]) + struct.pack("<H", loop) + bytes([0])
    for i, fr in enumerate(frames):
        fr = np.asarray(fr, np.uint8)
        ih, iw = fr.shape
        left, top = (regions[i] if regions is not None else (0, 0))
        delay = delays_cs[i] if delays_cs is not None else 0
        disp = disposals[i] if disposals is not None else 0
        if delay or transparent is not None or disp:
            packed = (disp & 0x07) << 2 | (1 if transparent is not None else 0)
            out += bytes([_EXT, _GCE, 4, packed])
            out += struct.pack("<H", delay)
            out += bytes([transparent or 0, 0])
        out.append(_IMAGE)
        out += struct.pack("<HHHH", left, top, iw, ih)
        lpal = local_palettes[i] if local_palettes is not None else None
        if lpal is not None:
            lp = np.asarray(lpal, np.uint8)
            lbits = max(1, int(np.ceil(np.log2(max(len(lp), 2)))))
            out.append(0x80 | (0x40 if interlace else 0) | (lbits - 1))
            out += lp.tobytes() + bytes(((1 << lbits) - len(lp)) * 3)
        else:
            out.append(0x40 if interlace else 0)
        if interlace:
            fr = np.concatenate([fr[off::step] for off, step in _INTERLACE])
        mcs = max(2, size_bits if lpal is None else max(2, int(np.ceil(np.log2(max(len(lpal), 2))))))
        out.append(mcs)
        out += _chunk_sub_blocks(_lzw_encode(fr.tobytes(), mcs))
    out.append(_TRAILER)
    return bytes(out)

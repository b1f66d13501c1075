"""Minimal ISO Base Media File Format (MP4, ISO/IEC 14496-12) demuxer —
real container parsing for the most common video wrapper, zero external
libs (SURVEY §2.12).

What is REAL here: the box walk (ftyp/moov/trak/mdia/minf/stbl/mdat,
64-bit largesize), the full sample-table resolution (stsd codec + dims,
stts timing, stsc sample→chunk mapping, stsz sizes, stco/co64 chunk
offsets → exact per-sample byte ranges), the header-only ``mp4_meta``
probe, and decode of Motion-JPEG tracks (sample entry ``jpeg``/``mjpa``,
the QuickTime-lineage MJPEG-in-MP4 shape) through the dependency-free
codec in stages/jpeg.py — frame sampling never entropy-decodes skipped
samples, mirroring stages/avi.py.

ALSO real (r5): ``decode_mp4_h264`` — avc1 tracks decode IN-ENGINE via
the from-scratch decoder (stages/h264.py), BOTH entropy coders (CAVLC
and CABAC) and BOTH transform sizes (4x4 and the High-profile 8x8) for
I pictures, plus CAVLC P pictures (quarter-pel inter prediction,
P_Skip, DPB with default list order): avcC SPS/PPS parse,
length-prefixed NAL walk, one sample = one access unit.  Sample shapes
the engine cannot decode (CABAC P, B) are skipped without entropy
decode, mirroring the MJPEG samplers.  What remains at the PyAV seam:
CABAC-P/B reconstruction, H.265/VP9/AV1.

The matching ``encode_mp4_mjpeg`` writes the simplest legal layout (one
``mdat``, one chunk, uniform durations, ``jpeg`` VisualSampleEntry) and
exists to generate REAL fixtures for the demuxer tests.
"""

from __future__ import annotations

import struct

import numpy as np

from iresearch_ray.stages.jpeg import decode_jpeg, encode_jpeg

_MJPEG_FOURCC = (b"jpeg", b"mjpa", b"mjpb")


# ---------------------------------------------------------------------------
# box plumbing
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + fourcc + payload


def _full_box(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def _walk_boxes(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for the boxes in [pos, end)."""
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        fourcc = bytes(buf[pos + 4 : pos + 8])
        hdr = 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            hdr = 16
        elif size == 0:  # extends to end of enclosing container
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("MP4 box size out of bounds")
        yield fourcc, pos + hdr, pos + size
        pos += size


def _find_box(buf: bytes, pos: int, end: int, fourcc: bytes) -> tuple[int, int]:
    for fc, s, e in _walk_boxes(buf, pos, end):
        if fc == fourcc:
            return s, e
    raise ValueError(f"MP4 missing {fourcc.decode('latin1')!r} box")


# ---------------------------------------------------------------------------
# demuxer
# ---------------------------------------------------------------------------


def _parse_video_track(buf: bytes) -> dict:
    """moov walk → the first 'vide' track's sample table, fully resolved."""
    if len(buf) < 12 or buf[4:8] not in (b"ftyp", b"moov", b"mdat", b"free",
                                          b"wide", b"skip"):
        raise ValueError("not an ISO-BMFF (MP4) payload")
    moov_s, moov_e = _find_box(buf, 0, len(buf), b"moov")
    for fc, tk_s, tk_e in _walk_boxes(buf, moov_s, moov_e):
        if fc != b"trak":
            continue
        md_s, md_e = _find_box(buf, tk_s, tk_e, b"mdia")
        hd_s, _ = _find_box(buf, md_s, md_e, b"hdlr")
        if buf[hd_s + 8 : hd_s + 12] != b"vide":
            continue
        # mdhd: timescale for this track's time units
        mh_s, _ = _find_box(buf, md_s, md_e, b"mdhd")
        ver = buf[mh_s]
        timescale = struct.unpack_from(
            ">I", buf, mh_s + (20 if ver == 1 else 12))[0]
        mi_s, mi_e = _find_box(buf, md_s, md_e, b"minf")
        sb_s, sb_e = _find_box(buf, mi_s, mi_e, b"stbl")

        # stsd: codec fourcc + coded dimensions (VisualSampleEntry)
        sd_s, _ = _find_box(buf, sb_s, sb_e, b"stsd")
        entry = sd_s + 8  # version/flags + entry_count
        codec = bytes(buf[entry + 4 : entry + 8])
        width, height = struct.unpack_from(">HH", buf, entry + 8 + 24)
        # avc1 carries codec config (SPS/PPS) in an avcC child box after
        # the 78-byte VisualSampleEntry body
        avcc = None
        entry_size = struct.unpack_from(">I", buf, entry)[0]
        child = entry + 8 + 78
        if child + 8 <= entry + entry_size:
            for cfc, c_s, c_e in _walk_boxes(buf, child, entry + entry_size):
                if cfc == b"avcC":
                    avcc = bytes(buf[c_s:c_e])
                    break

        # stts: (count, delta) runs → per-sample durations
        st_s, _ = _find_box(buf, sb_s, sb_e, b"stts")
        n_ent = struct.unpack_from(">I", buf, st_s + 4)[0]
        runs = [struct.unpack_from(">II", buf, st_s + 8 + 8 * i) for i in range(n_ent)]

        # stsz: sizes
        sz_s, _ = _find_box(buf, sb_s, sb_e, b"stsz")
        uniform, n_samples = struct.unpack_from(">II", buf, sz_s + 4)
        if uniform:
            sizes = np.full(n_samples, uniform, np.int64)
        else:
            sizes = np.frombuffer(
                buf, ">u4", n_samples, sz_s + 12).astype(np.int64)

        # stco / co64: chunk offsets
        try:
            co_s, _ = _find_box(buf, sb_s, sb_e, b"stco")
            n_chunks = struct.unpack_from(">I", buf, co_s + 4)[0]
            offsets = np.frombuffer(buf, ">u4", n_chunks, co_s + 8).astype(np.int64)
        except ValueError:
            co_s, _ = _find_box(buf, sb_s, sb_e, b"co64")
            n_chunks = struct.unpack_from(">I", buf, co_s + 4)[0]
            offsets = np.frombuffer(buf, ">u8", n_chunks, co_s + 8).astype(np.int64)

        # stsc: (first_chunk, samples_per_chunk, _) runs → per-chunk counts
        sc_s, _ = _find_box(buf, sb_s, sb_e, b"stsc")
        n_sc = struct.unpack_from(">I", buf, sc_s + 4)[0]
        sc = [struct.unpack_from(">III", buf, sc_s + 8 + 12 * i) for i in range(n_sc)]

        # resolve (offset, size) per sample
        spans: list[tuple[int, int]] = []
        si = 0
        for ci in range(n_chunks):
            per = 0
            for first, count, _sdi in sc:
                if first <= ci + 1:  # first_chunk is 1-based
                    per = count
            off = int(offsets[ci])
            for _ in range(per):
                if si >= n_samples:
                    break
                spans.append((off, int(sizes[si])))
                off += int(sizes[si])
                si += 1
        if si != n_samples:
            raise ValueError("MP4 sample table inconsistent (stsc/stsz/stco)")
        return {
            "codec": codec.decode("latin1"),
            "avcC": avcc,
            "width": int(width),
            "height": int(height),
            "timescale": int(timescale),
            "durations": runs,
            "n_frames": int(n_samples),
            "spans": spans,
        }
    raise ValueError("MP4 has no video ('vide') track")


def mp4_meta(payload: bytes) -> dict:
    """Header-only probe: codec/dims/frame count/fps without touching mdat."""
    t = _parse_video_track(payload)
    total = sum(c * d for c, d in t["durations"]) or 1
    fps = round(t["n_frames"] * t["timescale"] / total)
    return {
        "codec": t["codec"],
        "width": t["width"],
        "height": t["height"],
        "n_frames": t["n_frames"],
        "fps": int(fps),
    }


def mp4_sample_spans(payload: bytes) -> tuple[str, list[tuple[int, int]]]:
    """(codec, [(byte offset, size) per sample]) — demux without decode;
    this works for ANY codec including avc1 (feed spans to a real decoder
    behind the PyAV seam)."""
    t = _parse_video_track(payload)
    return t["codec"], t["spans"]


def decode_mp4_mjpeg(payload: bytes, every: int = 1) -> list[tuple[int, np.ndarray]]:
    """[(frame index, (h, w, 3) uint8)] for every k-th sample of a
    Motion-JPEG track.  Skipped samples are never entropy-decoded (the
    sample table gives exact byte ranges).  Non-MJPEG codecs raise."""
    if every < 1:
        raise ValueError("every must be >= 1")
    t = _parse_video_track(payload)
    if t["codec"].encode() not in _MJPEG_FOURCC:
        raise ValueError(
            f"MP4 track codec {t['codec']!r}: for avc1 use decode_mp4_h264 "
            "(in-engine CAVLC I-frame decode); other inter-frame codecs "
            "need the PyAV seam (decoder='libav')")
    out = []
    for f in range(0, t["n_frames"], every):
        off, size = t["spans"][f]
        px = decode_jpeg(payload[off : off + size])
        if px.ndim == 2:
            px = np.stack([px] * 3, axis=-1)
        out.append((f, px))
    return out


# ---------------------------------------------------------------------------
# fixture muxer
# ---------------------------------------------------------------------------


def _mux_single_chunk(samples: list[bytes], sample_entry: bytes, fps: int,
                      w: int, h: int) -> bytes:
    """Shared minimal muxer: one mdat, one chunk, uniform durations."""
    n = len(samples)
    timescale = int(fps) * 1000
    delta = 1000
    duration = n * delta
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(samples)
    first_off = len(ftyp) + 8
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full_box(b"stsz", 0, 0, struct.pack(">II", 0, n)
                     + b"".join(struct.pack(">I", len(j)) for j in samples))
    stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, first_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full_box(b"vmhd", 0, 1, b"\x00" * 8)
    dref = _full_box(b"dref", 0, 0, struct.pack(">I", 1)
                     + _full_box(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full_box(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                     + b"VideoHandler\x00")
    mdhd = _full_box(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, duration)
                     + struct.pack(">HH", 0x55C4, 0))  # language 'und'
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full_box(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0, duration)
                     + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
                     + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                                    0x40000000)
                     + struct.pack(">II", w << 16, h << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full_box(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, duration)
                     + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
                     + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                                    0x40000000)
                     + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + _box(b"mdat", mdat_payload) + moov


def encode_mp4_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 95) -> bytes:
    """(h, w, 3) uint8 frames → a minimal MJPEG-in-MP4 file (one mdat, one
    chunk, uniform durations, 'jpeg' VisualSampleEntry)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one shape")
        jpegs.append(encode_jpeg(f, quality=quality))
    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)          # reserved + data_ref_index
        + b"\x00" * 16                               # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4 + struct.pack(">H", 1)         # reserved + frame_count
        + b"\x00" * 32                               # compressorname
        + struct.pack(">Hh", 24, -1),                # depth, pre_defined
    )
    return _mux_single_chunk(jpegs, sample_entry, fps, w, h)


# ---------------------------------------------------------------------------
# H.264 in MP4 (avc1 + avcC) — in-engine CAVLC I-frame decode (stages/h264)
# ---------------------------------------------------------------------------


def _parse_avcc(avcc: bytes) -> tuple[int, list[bytes], list[bytes]]:
    """(nal_length_size, sps_nals, pps_nals) from an avcC payload."""
    if len(avcc) < 7 or avcc[0] != 1:
        raise ValueError("bad avcC")
    length_size = (avcc[4] & 3) + 1
    n_sps = avcc[5] & 0x1F
    pos = 6
    sps = []
    for _ in range(n_sps):
        ln = struct.unpack_from(">H", avcc, pos)[0]
        sps.append(avcc[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    n_pps = avcc[pos]
    pos += 1
    pps = []
    for _ in range(n_pps):
        ln = struct.unpack_from(">H", avcc, pos)[0]
        pps.append(avcc[pos + 2 : pos + 2 + ln])
        pos += 2 + ln
    return length_size, sps, pps


def decode_mp4_h264(payload: bytes, every: int = 1, rgb: bool = True):
    """[(frame index, (h, w, 3) uint8 RGB)] for every k-th sample of an
    avc1 track, decoded by the from-scratch decoder (stages/h264.py).
    IDR and CAVLC P/B samples decode fully (one sample = one access
    unit; P uses the default short-term order, B the POC-ordered lists
    with spatial direct); CABAC P/B samples are SKIPPED without entropy
    decoding — the IDR-sampling semantics that mirror the AVI sampler's
    skip.  Sampling is on SAMPLE (decode) order; output is emitted in
    DISPLAY order with display indices, restored per IDR GOP from the
    stream's own POC (the sample table carries no ctts here) — a no-op
    for B-less tracks."""
    from iresearch_ray.stages import h264

    if every < 1:
        raise ValueError("every must be >= 1")
    t = _parse_video_track(payload)
    if t["codec"] != "avc1":
        raise ValueError(f"not an avc1 track: {t['codec']!r}")
    if not t["avcC"]:
        raise ValueError("avc1 sample entry has no avcC config")
    length_size, sps_nals, pps_nals = _parse_avcc(t["avcC"])
    sps = h264.parse_sps(h264.rbsp_from_ebsp(sps_nals[0][1:]))
    pps = h264.parse_pps(h264.rbsp_from_ebsp(pps_nals[0][1:]))
    gop = h264.GopDecoder(sps, pps)
    out = []
    base = 0
    pending: list = []  # [(poc, planes | None)] of the current IDR GOP

    def flush_gop():
        nonlocal base
        for disp, (_poc, planes) in enumerate(
                sorted(pending, key=lambda e: e[0])):
            if planes is not None:
                Y, Cb, Cr = planes
                if rgb:
                    out.append((base + disp, h264._yuv420_to_rgb(
                        Y, Cb, Cr, t["width"], t["height"])))
                else:
                    out.append((base + disp, (Y, Cb, Cr)))
        base += len(pending)
        pending.clear()

    for f in range(t["n_frames"]):
        off, size = t["spans"][f]
        nals = [(nt, ri, rbsp) for nt, ri, rbsp in h264.iter_avc_nals_hdr(
            payload[off : off + size], length_size) if nt in (1, 5)]
        if not nals:
            continue
        if nals[0][0] == 5:
            flush_gop()
        # unsampled IDR: want=False skips the entropy decode entirely
        # (the IDR-only fast path) but keeps the POC/display slot;
        # GopDecoder clears the DPB so dependents never mispredict
        planes, poc = gop.decode_au(nals, want=not (nals[0][0] == 5
                                                    and f % every))
        pending.append((poc, planes if f % every == 0 else None))
    flush_gop()
    return out


def encode_mp4_h264(frames: list[np.ndarray], fps: int = 10, qp: int = 26,
                    kinds: str = "mixed", deblock_idc: int = 1,
                    entropy: str = "cavlc", gop: str = "i",
                    p_kinds: str = "pmix", b_kinds: str = "bmix",
                    b_direct: str = "spatial",
                    b_weights=None) -> bytes:
    """(h, w, 3) uint8 frames → a minimal avc1 MP4 (one mdat, one chunk,
    4-byte-length-prefixed NALs, avcC with one SPS/PPS) through the
    from-scratch encoder — the REAL-fixture generator for
    decode_mp4_h264.  ``entropy``: 'cavlc' (Baseline) or 'cabac' (Main
    profile).  ``gop``/``p_kinds`` as in h264.encode_h264_annexb: a
    pattern over {'i','p'} cycled across frames (one sample per access
    unit; P samples get nal_ref_idc 2, so real demuxers see a Baseline
    IPP stream)."""
    from iresearch_ray.stages import h264

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for fimg in frames:
        if fimg.shape[:2] != (h, w):
            raise ValueError("all frames must share one shape")
    stream = h264.encode_h264_annexb(
        frames, qp=qp, kinds=kinds, deblock_idc=deblock_idc,
        entropy=entropy, gop=gop, p_kinds=p_kinds, b_kinds=b_kinds,
        b_direct=b_direct, b_weights=b_weights)
    sps_nal = pps_nal = None
    profile = 66
    samples = []
    for nt, ri, rbsp in h264.split_annexb_hdr(stream):
        nal = bytes([(ri << 5) | nt]) + h264.ebsp_from_rbsp(rbsp)
        if nt == 7:
            sps_nal = nal
            profile = h264.parse_sps(rbsp)["profile"]
        elif nt == 8:
            pps_nal = nal
        elif nt in (1, 5):
            samples.append(struct.pack(">I", len(nal)) + nal)

    avcc = (bytes([1, profile, 0, 20, 0xFC | 3, 0xE0 | 1])
            + struct.pack(">H", len(sps_nal)) + sps_nal
            + bytes([1]) + struct.pack(">H", len(pps_nal)) + pps_nal)
    sample_entry = _box(
        b"avc1",
        b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + b"\x00" * 4 + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
        + _box(b"avcC", avcc),
    )
    return _mux_single_chunk(samples, sample_entry, fps, w, h)

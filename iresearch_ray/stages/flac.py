"""From-scratch FLAC codec (RFC 9639) — no external audio libraries.

Decoder: full native-FLAC subset a real speech/music corpus uses —
STREAMINFO parse, frame sync with CRC-8/CRC-16 verification, UTF-8-style
coded frame/sample numbers, CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32)
subframes, rice + rice2 residual partitions with escape codes, wasted
bits, all four channel layouts (independent, left/side, right/side,
mid/side), and the STREAMINFO MD5 check on the decoded PCM.  Speech
corpora (LibriSpeech, MLS, …) ship FLAC, so this closes the most common
real-world *audio* seam the same way stages/h264.py closes the video one.

Encoder: a deterministic fixture encoder used by tests and corpus
synthesis.  It emits genuinely compressed streams (fixed + quantized-LPC
prediction, per-partition optimal rice parameters, per-frame stereo-mode
search, wasted-bit detection, escape partitions on demand) and its output
is only trusted through the decoder: every test round-trips and FLAC is
lossless, so ANY bit-level disagreement between the two implementations
is a hard test failure.  Structural goldens are additionally pinned by
hand-built bitstreams in tests/test_flac.py (an independent in-test bit
packer, not this module's writer).

Performance shape: rice residual decode — the bulk of the bits in a real
stream — is vectorized (terminator chase by binary lifting over the
frame's set-bit index, then one gather per partition for all remainders);
only the inherently sequential LPC recurrence runs as a per-sample loop.
The stage-level contract is the same as stages/audio.py: decode runs
inside actor-pool ``map_batches`` with small batch sizes for long clips.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MAGIC = b"fLaC"

# ---------------------------------------------------------------- CRCs
# CRC-8 poly x^8+x^2+x+1 (0x07) and CRC-16 poly x^16+x^15+x^2+1 (0x8005),
# MSB-first, init 0 — RFC 9639 §9.2/§9.3.


def _make_crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = np.zeros(256, np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if (r & top) else (r << 1)
        tbl[b] = r & mask
    return tbl


_CRC8_TBL = _make_crc_table(0x07, 8)
_CRC16_TBL = _make_crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC8_TBL[r ^ b])
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ int(_CRC16_TBL[(r >> 8) ^ b])
    return r


# ---------------------------------------------------------------- bit I/O


class BitReader:
    """MSB-first reader over an unpacked bit array (1 byte of RAM per
    payload bit; no whole-stream index — rice/unary scans work over local
    windows so decode cost and memory stay linear in clip length)."""

    def __init__(self, data: bytes):
        self.data = data
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > self.bits.size:
            raise ValueError("flac: bitstream truncated")
        v = self.bits[self.pos:end]
        self.pos = end
        return int(v @ (1 << np.arange(n - 1, -1, -1, dtype=np.int64)))

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        start, win = self.pos, 64
        while start < self.bits.size:
            seg = self.bits[start:start + win]
            nz = np.flatnonzero(seg)
            if nz.size:
                nxt = start + int(nz[0])
                q = nxt - self.pos
                self.pos = nxt + 1
                return q
            start += win
            win *= 2
        raise ValueError("flac: bitstream truncated in unary code")

    def read_signed_array(self, n: int, width: int) -> np.ndarray:
        """n signed big-endian ints of `width` bits — one vectorized gather."""
        if n == 0 or width == 0:
            return np.zeros(n, np.int64)
        end = self.pos + n * width
        if end > self.bits.size:
            raise ValueError("flac: bitstream truncated")
        m = self.bits[self.pos:end].reshape(n, width).astype(np.int64)
        self.pos = end
        v = m @ (1 << np.arange(width - 1, -1, -1, dtype=np.int64))
        return v - ((v >> (width - 1)) << width)

    def align(self) -> None:
        self.pos = (self.pos + 7) // 8 * 8


class BitWriter:
    """MSB-first writer (encoder side)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, value: int, n: int) -> None:
        if n == 0:
            return
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)

    def align(self) -> None:
        if self.nacc:
            self.put(0, 8 - self.nacc)

    def bit_len(self) -> int:
        return 8 * len(self.buf) + self.nacc

    def extend(self, other: "BitWriter") -> None:
        """Append another writer's bits (possibly unaligned) verbatim."""
        for b in other.buf:
            self.put(b, 8)
        if other.nacc:
            self.put(other.acc, other.nacc)

    def getvalue(self) -> bytes:
        assert self.nacc == 0, "unaligned"
        return bytes(self.buf)


# ------------------------------------------------- coded numbers (UTF-8-ish)


def _encode_coded_number(v: int) -> bytes:
    """RFC 9639 §9.1.5: UTF-8-style encoding extended to 36 bits."""
    if v < 0x80:
        return bytes([v])
    for nbytes, prefix in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8),
                           (6, 0xFC), (7, 0xFE)):
        payload_bits = 6 * (nbytes - 1) + (7 - nbytes if nbytes < 7 else 0)
        if v < (1 << payload_bits):
            out = bytearray(nbytes)
            for i in range(nbytes - 1, 0, -1):
                out[i] = 0x80 | (v & 0x3F)
                v >>= 6
            out[0] = prefix | v
            return bytes(out)
    raise ValueError("coded number out of range")


def _read_coded_number(br: BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError("flac: bad coded number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("flac: bad coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# ---------------------------------------------------------------- residuals


def _rice_decode(br: BitReader, n: int, p: int) -> np.ndarray:
    """Decode n rice(p) codes — vectorized AND linear in stream length.

    The terminating '1' of code k is the first set bit at/after its start,
    and code k+1 starts p+1 bits after that terminator, so terminator
    *indices* into the partition's local set-bit list follow the map
    ``F[i] = searchsorted(ones, ones[i]+1+p)``.  The index path is
    materialized by binary lifting (O(n log n) gathers, no per-sample
    Python loop) over a LOCAL window of the bit array — sized from the
    expected code length and doubled on under-run — so cost never scales
    with the whole stream (a per-partition whole-stream index would make
    decode quadratic in clip length)."""
    if n == 0:
        return np.zeros(0, np.int64)
    if n == 1:
        q = br.read_unary()
        rem = br.read(p)
        u = (q << p) | rem
        return np.array([(u >> 1) ^ -(u & 1)], np.int64)
    pos = br.pos
    win = 64 + n * (p + 3)
    while True:
        seg = br.bits[pos:pos + win]
        ones = np.flatnonzero(seg).astype(np.int64)
        term = _chase_terminators(ones, n, p) if ones.size >= n else None
        if term is not None and term[-1] + 1 + p <= seg.size:
            starts = np.empty(n, np.int64)
            starts[0] = 0
            starts[1:] = term[:-1] + 1 + p
            q = term - starts
            if not np.any(q < 0):
                break
        if pos + win >= br.bits.size:
            raise ValueError("flac: bitstream truncated in rice partition")
        win *= 2
    if p:
        rem = (
            seg[(term + 1)[:, None] + np.arange(p)].astype(np.int64)
            @ (1 << np.arange(p - 1, -1, -1, dtype=np.int64))
        )
        u = (q << p) | rem
    else:
        u = q
    br.pos = pos + int(term[-1]) + 1 + p
    return (u >> 1) ^ -(u & 1)


def _chase_terminators(ones: np.ndarray, n: int, p: int):
    """Binary-lifted chase of n terminator positions through the local
    set-bit list; None when the window provably ends too early."""
    step = np.searchsorted(ones, ones + 1 + p).astype(np.int64)
    ran_off = step >= ones.size
    if ran_off.any():
        step = np.minimum(step, ones.size - 1)
    idx = np.empty(n, np.int64)
    idx[0] = 0
    filled = 1
    jump = step
    while filled < n:
        take = min(filled, n - filled)
        idx[filled:filled + take] = jump[idx[:take]]
        filled += take
        if filled < n:
            jump = jump[jump]
    term = ones[idx]
    # a clipped step inside the path means the window was too small —
    # positions stop strictly increasing there
    if n > 1 and np.any(np.diff(term) <= 0):
        return None
    return term


def _decode_residual(br: BitReader, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    esc = (1 << pbits) - 1
    po = br.read(4)
    nparts = 1 << po
    if block_size % nparts or (block_size >> po) <= order:
        raise ValueError("flac: invalid partition order")
    out = []
    for part in range(nparts):
        cnt = (block_size >> po) - (order if part == 0 else 0)
        p = br.read(pbits)
        if p == esc:
            raw = br.read(5)
            out.append(br.read_signed_array(cnt, raw))
        else:
            out.append(_rice_decode(br, cnt, p))
    return np.concatenate(out)


def _encode_residual(bw: BitWriter, res: np.ndarray, block_size: int,
                     order: int, partition_order: int,
                     force_escape: bool = False) -> None:
    po = partition_order
    while po and (block_size % (1 << po) or (block_size >> po) <= order):
        po -= 1
    u = ((res << 1) ^ (res >> 63)).astype(np.uint64)  # zigzag

    # pass 1: per partition, optimal rice p over the FULL 0..30 range and
    # the escape alternative; the residual-level coding method (rice = 4-bit
    # params vs rice2 = 5-bit) follows from the largest p any partition
    # wants — rice2 is what keeps wide (24/32-bit) residuals from exploding
    # into degenerate unary runs
    plans = []
    start = 0
    for part in range(1 << po):
        cnt = (block_size >> po) - (order if part == 0 else 0)
        seg = u[start:start + cnt]
        sseg = res[start:start + cnt]
        start += cnt
        mx = int(sseg.max()) if cnt else 0
        mn = int(sseg.min()) if cnt else 0
        width = max(1, mx.bit_length() + 1, max(0, -mn - 1).bit_length() + 1)
        if force_escape and width > 31:
            raise ValueError(
                "flac: force_escape with residuals wider than the 5-bit "
                "escape field's 31-bit max — encode with rice instead"
            )
        best_p, best_cost = 0, None
        for p in range(31):
            cost = cnt * (p + 1) + int((seg >> np.uint64(p)).sum())
            if best_cost is None or cost < best_cost:
                best_p, best_cost = p, cost
        # escape beats rice on high-entropy residuals (bounded at ~width
        # bits/sample where degenerate rice quotients explode unary)
        esc_cost = 5 + cnt * width if width <= 31 else None
        use_esc = force_escape or (esc_cost is not None
                                   and esc_cost < best_cost)
        plans.append((use_esc, width, best_p, seg, sseg))

    method = 1 if any(not e and p > 14 for e, _w, p, _s, _ss in plans) else 0
    pbits, esc_code = (5, 31) if method else (4, 15)
    bw.put(method, 2)
    bw.put(po, 4)
    for use_esc, width, best_p, seg, sseg in plans:
        if use_esc:
            bw.put(esc_code, pbits)
            bw.put(width, 5)
            for v in sseg.tolist():
                bw.put(int(v), width)
            continue
        bw.put(best_p, pbits)
        for v in seg.tolist():
            q = int(v) >> best_p
            bw.put_unary(q)
            bw.put(int(v) & ((1 << best_p) - 1), best_p)


# ---------------------------------------------------------------- predictors

_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _restore_fixed(warmup: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Invert order-k differencing with k nested cumsums (vectorized).

    A FIXED-order-k subframe's residual IS the k-th finite difference of
    the signal, so reconstruction needs no recurrence loop: at each level
    the (k-1)-th difference sequence is a cumsum seeded by its first
    warmup-derived element D^{k-1}[k-1] = diff(warmup, k-1)[0]."""
    if order == 0:
        return res.astype(np.int64)
    w = warmup.astype(np.int64)
    x = res.astype(np.int64)
    for k in range(order, 0, -1):
        seed = np.diff(w, k - 1)[0] if k > 1 else w[0]
        x = np.cumsum(np.concatenate(([seed], x)))
    return x


def _restore_lpc(warmup: np.ndarray, res: np.ndarray, coefs: list[int],
                 shift: int) -> np.ndarray:
    # inherently sequential recurrence (s[i] depends on s[i-1..i-order]) —
    # plain-int loop; Python's >> is the arithmetic shift the spec requires
    out = [int(v) for v in warmup]
    order = len(coefs)
    for r in res.tolist():
        acc = 0
        for j in range(order):
            acc += coefs[j] * out[-1 - j]
        out.append((acc >> shift) + int(r))
    return np.asarray(out, np.int64)


# ---------------------------------------------------------------- decoder

_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _parse_streaminfo(data: bytes) -> dict:
    if data[:4] != _MAGIC:
        raise ValueError("flac: bad magic")
    pos, info = 4, None
    while True:
        hdr = data[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        body = data[pos + 4:pos + 4 + length]
        if btype == 0:
            if length != 34:
                raise ValueError("flac: bad STREAMINFO length")
            br = BitReader(body)
            info = {
                "min_block": br.read(16), "max_block": br.read(16),
                "min_frame": br.read(24), "max_frame": br.read(24),
                "sample_rate": br.read(20),
                "channels": br.read(3) + 1,
                "bps": br.read(5) + 1,
                "total_samples": br.read(36),
                "md5": body[18:34],
            }
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    info["frames_at"] = pos
    return info


def _decode_subframe(br: BitReader, n: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: bad subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if stype == 0:
        out = np.full(n, br.read_signed(eff), np.int64)
    elif stype == 1:
        out = br.read_signed_array(n, eff)
    elif 8 <= stype <= 12:
        order = stype - 8
        warm = br.read_signed_array(order, eff)
        res = _decode_residual(br, n, order)
        out = _restore_fixed(warm, res, order)
    elif stype >= 32:
        order = (stype & 31) + 1
        warm = br.read_signed_array(order, eff)
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid lpc precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative lpc shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, n, order)
        out = _restore_lpc(warm, res, coefs, shift)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    return out << wasted if wasted else out


def _decode_frame(br: BitReader, info: dict) -> tuple[np.ndarray, int]:
    """One frame at the current (byte-aligned) position → (samples[n, ch], sr)."""
    hdr_start = br.pos // 8
    if br.read(14) != 0x3FFE:
        raise ValueError("flac: lost frame sync")
    if br.read(1):
        raise ValueError("flac: reserved frame header bit")
    br.read(1)  # blocking strategy (number field is parsed either way)
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    ss_code = br.read(3)
    if br.read(1):
        raise ValueError("flac: reserved frame header bit")
    _read_coded_number(br)
    if bs_code == 0:
        raise ValueError("flac: reserved block size code")
    elif bs_code == 6:
        n = br.read(8) + 1
    elif bs_code == 7:
        n = br.read(16) + 1
    else:
        n = _BLOCK_SIZES[bs_code]
    if sr_code == 0:
        sr = info["sample_rate"]
    elif sr_code == 12:
        sr = br.read(8) * 1000
    elif sr_code == 13:
        sr = br.read(16)
    elif sr_code == 14:
        sr = br.read(16) * 10
    elif sr_code == 15:
        raise ValueError("flac: invalid sample rate code")
    else:
        sr = _SAMPLE_RATES[sr_code]
    bps = info["bps"] if ss_code == 0 else _SAMPLE_SIZES.get(ss_code)
    if bps is None:
        raise ValueError("flac: reserved sample size code")
    hdr_end = br.pos // 8
    want_crc8 = br.read(8)
    if crc8(br.data[hdr_start:hdr_end]) != want_crc8:
        raise ValueError("flac: frame header CRC-8 mismatch")

    if ch_code < 8:
        chans = [_decode_subframe(br, n, bps) for _ in range(ch_code + 1)]
        pcm = np.stack(chans, axis=1)
    elif ch_code in (8, 9, 10):
        side0 = ch_code == 9  # right/side stores side first
        a = _decode_subframe(br, n, bps + (1 if side0 else 0))
        b = _decode_subframe(br, n, bps + (0 if side0 else 1))
        if ch_code == 8:      # left/side: a=left, b=side=l-r
            left, right = a, a - b
        elif ch_code == 9:    # right/side: a=side=l-r, b=right
            left, right = b + a, b
        else:                 # mid/side
            mid, side = a, b
            left = ((mid << 1) | (side & 1)) + side >> 1
            right = left - side
        pcm = np.stack([left, right], axis=1)
    else:
        raise ValueError("flac: reserved channel assignment")
    br.align()
    want_crc16 = br.read(16)
    if crc16(br.data[hdr_start:br.pos // 8 - 2]) != want_crc16:
        raise ValueError("flac: frame CRC-16 mismatch")
    return pcm, sr


def decode_flac_pcm(payload: bytes) -> tuple[np.ndarray, int, int]:
    """FLAC bytes → (int32 PCM shaped [n_samples, channels], sample_rate, bps).

    Verifies every frame's CRC-8/CRC-16 and, when bits-per-sample is a
    whole number of bytes and STREAMINFO carries a non-zero MD5, the
    stream-level MD5 of the decoded PCM — decode is end-to-end checked."""
    info = _parse_streaminfo(payload)
    br = BitReader(payload)
    br.pos = info["frames_at"] * 8
    frames, got, total = [], 0, info["total_samples"]
    while (total and got < total) or (not total and br.pos // 8 < len(payload)):
        pcm, _sr = _decode_frame(br, info)
        frames.append(pcm)
        got += pcm.shape[0]
    out = (np.concatenate(frames, axis=0) if frames
           else np.zeros((0, info["channels"]), np.int64))
    if total and out.shape[0] != total:
        raise ValueError("flac: sample count mismatch")
    bps = info["bps"]
    if bps % 8 == 0 and info["md5"] != b"\0" * 16:
        if hashlib.md5(_pack_pcm(out, bps)).digest() != info["md5"]:
            raise ValueError("flac: MD5 mismatch on decoded PCM")
    return out.astype(np.int32), info["sample_rate"], bps


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (float32 mono samples in [-1, 1], sample_rate) — the
    same contract as stages/audio.decode_wav (multi-channel mean-downmix)."""
    pcm, sr, bps = decode_flac_pcm(payload)
    x = pcm.astype(np.float32) / float(1 << (bps - 1))
    return x.mean(axis=1).astype(np.float32), sr


def _pack_pcm(pcm: np.ndarray, bps: int) -> bytes:
    """Interleaved little-endian packing at bps/8 bytes — the MD5 input."""
    nbytes = bps // 8
    flat = pcm.astype(np.int64).reshape(-1)
    le = np.zeros((flat.size, nbytes), np.uint8)
    v = flat & ((1 << bps) - 1)
    for i in range(nbytes):
        le[:, i] = (v >> (8 * i)) & 0xFF
    return le.tobytes()


# ---------------------------------------------------------------- encoder


def _quantize_one(coefs: np.ndarray, precision: int):
    cmax = np.abs(coefs).max()
    if not np.isfinite(cmax) or cmax == 0:
        return None
    shift = min(14, max(0, precision - 1 - int(np.floor(np.log2(cmax))) - 1))
    q = np.round(coefs * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    if np.any(q >= lim) or np.any(q < -lim) or not q.any():
        return None
    return q.tolist(), shift


def _quantize_lpc(x: np.ndarray, max_order: int, precision: int = 12):
    """Windowed autocorrelation + Levinson-Durbin over ALL orders
    1..max_order, quantized to `precision`-bit ints with a 5-bit shift;
    returns the (coefs, shift, precision, residual) with the smallest
    actual integer residual mass, or None (caller falls back to FIXED).

    Trying every order matters: on narrowband signals the autocorrelation
    matrix is near-singular past the true model order and high-order fits
    blow up — order 2 is near-exact for a pure sinusoid while order 8 is
    garbage.  The per-order coefficient sets fall out of one Levinson
    recursion; the window (Welch — same role as libFLAC's default Tukey)
    removes the finite-block taper bias that otherwise skews even the
    true-order fit by a few percent."""
    n = x.size
    if n <= max_order * 2:
        return None
    i = np.arange(n, dtype=np.float64)
    win = 1.0 - ((i - (n - 1) / 2.0) / ((n + 1) / 2.0)) ** 2
    f = x.astype(np.float64) * win
    ac = np.array([np.dot(f[: n - k], f[k:]) for k in range(max_order + 1)])
    if ac[0] <= 0:
        return None
    err = ac[0]
    a = np.zeros(max_order + 1)
    best = None
    for o in range(1, max_order + 1):
        k = (ac[o] - np.dot(a[1:o], ac[o - 1:0:-1])) / err
        a[1:o] = a[1:o] - k * a[o - 1:0:-1]
        a[o] = k
        err *= 1 - k * k
        q = _quantize_one(a[1:o + 1], precision)
        if q is not None:
            coefs, shift = q
            res = _lpc_residual(x, coefs, shift)
            # tiny per-order penalty so near-ties resolve to fewer coefs
            cost = int(np.abs(res).sum()) + o * precision * 4
            if best is None or cost < best[0]:
                best = (cost, coefs, shift, res)
        if err <= 0:
            break
    if best is None:
        return None
    return best[1], best[2], precision, best[3]


def _lpc_residual(x: np.ndarray, coefs: list[int], shift: int) -> np.ndarray:
    order = len(coefs)
    xi = x.astype(np.int64)
    pred = np.zeros(xi.size - order, np.int64)
    for j, c in enumerate(coefs):
        pred += c * xi[order - 1 - j: xi.size - 1 - j]
    return xi[order:] - (pred >> shift)


def _encode_subframe(x: np.ndarray, bps: int, max_lpc_order: int,
                     partition_order: int, force_escape: bool,
                     force_verbatim: bool) -> BitWriter:
    bw = BitWriter()
    n = x.size
    xi = x.astype(np.int64)
    wasted = 0
    if np.any(xi) and not force_verbatim:
        nz = xi[xi != 0]
        # min over 2^tz(v) = 2^min(tz) — powers of two are monotone
        wasted = min(int(np.log2(int((nz & -nz).min()))), bps - 1)
        if wasted:
            xi = xi >> wasted
    eff = bps - wasted

    def header(stype: int) -> None:
        bw.put(0, 1)
        bw.put(stype, 6)
        if wasted:
            bw.put(1, 1)
            bw.put_unary(wasted - 1)
        else:
            bw.put(0, 1)

    if not force_verbatim and np.all(xi == xi[0]):
        header(0)
        bw.put(int(xi[0]), eff)
        return bw
    if force_verbatim:
        header(1)
        for v in xi.tolist():
            bw.put(int(v), eff)
        return bw

    # candidate search: fixed 0-4 by sum-of-abs-residual, then optional LPC
    diffs = [xi]
    order, best_cost = 0, int(np.abs(xi).sum())
    for o in range(1, 5):
        d = np.diff(diffs[-1])
        if d.size == 0:
            break
        diffs.append(d)
        cost = int(np.abs(d).sum())
        if cost < best_cost:
            order, best_cost = o, cost
    res = diffs[order]
    lpc = None
    if max_lpc_order >= 1:
        q = _quantize_lpc(xi, min(max_lpc_order, max(1, n // 4)), 12)
        if q is not None:
            coefs, shift, prec, lres = q
            if int(np.abs(lres).sum()) < int(np.abs(res).sum()):
                lpc = (coefs, shift, prec, lres)
    if lpc is not None:
        coefs, shift, prec, lres = lpc
        order = len(coefs)
        header(32 | (order - 1))
        for v in xi[:order].tolist():
            bw.put(int(v), eff)
        bw.put(prec - 1, 4)
        bw.put(shift, 5)
        for c in coefs:
            bw.put(int(c), prec)
        _encode_residual(bw, lres, n, order, partition_order, force_escape)
    else:
        header(8 | order)
        for v in xi[:order].tolist():
            bw.put(int(v), eff)
        _encode_residual(bw, res, n, order, partition_order, force_escape)
    return bw


def encode_flac(samples: np.ndarray, sr: int, bps: int = 16,
                block_size: int = 4096, stereo_mode: str = "auto",
                max_lpc_order: int = 8, partition_order: int = 2,
                force_escape: bool = False,
                force_verbatim: bool = False) -> bytes:
    """Deterministic fixture encoder → native FLAC bytes.

    ``samples``: int array shaped (n,) or (n, channels) already at `bps`
    (floats in [-1, 1] are converted).  ``stereo_mode``: auto | independent
    | left_side | right_side | mid_side.  The stream it emits is only ever
    validated THROUGH decode_flac_pcm (losslessness is the oracle)."""
    x = np.asarray(samples)
    if np.issubdtype(x.dtype, np.floating):
        x = np.clip(np.round(x * ((1 << (bps - 1)) - 1)), -(1 << (bps - 1)),
                    (1 << (bps - 1)) - 1)
    x = x.astype(np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n_total, ch = x.shape
    if ch > 8:
        raise ValueError("flac: at most 8 channels")

    frames = bytearray()
    min_fr = max_fr = min_blk = max_blk = None
    for f_idx, start in enumerate(range(0, n_total, block_size)):
        blk = x[start:start + block_size]
        n = blk.shape[0]
        candidates: list[tuple[int, list[np.ndarray], list[int]]] = []

        def sub(arrs: list[np.ndarray], bumps: list[int], code: int):
            ws = [_encode_subframe(a, bps + b, max_lpc_order,
                                   partition_order, force_escape,
                                   force_verbatim)
                  for a, b in zip(arrs, bumps)]
            candidates.append((code, ws, sum(w.bit_len() for w in ws)))

        if ch == 2 and stereo_mode != "independent":
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            mid = (left + right) >> 1
            if stereo_mode in ("auto", "left_side"):
                sub([left, side], [0, 1], 8)
            if stereo_mode in ("auto", "right_side"):
                sub([side, right], [1, 0], 9)
            if stereo_mode in ("auto", "mid_side"):
                sub([mid, side], [0, 1], 10)
        if ch != 2 or stereo_mode in ("auto", "independent"):
            sub([blk[:, c] for c in range(ch)], [0] * ch, ch - 1)
        code, subs, _bits = min(candidates, key=lambda t: t[2])

        hw = BitWriter()
        hw.put(0x3FFE, 14)
        hw.put(0, 1)
        hw.put(0, 1)  # fixed block size strategy → frame number
        bs_code = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8,
                   512: 9, 1024: 10, 2048: 11, 4096: 12, 8192: 13,
                   16384: 14, 32768: 15}.get(n)
        hw.put(bs_code if bs_code else (6 if n <= 256 else 7), 4)
        sr_code = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                   22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
                   96000: 11}.get(sr, 0)
        hw.put(sr_code, 4)
        hw.put(code, 4)
        hw.put({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        hw.put(0, 1)
        for b in _encode_coded_number(f_idx):
            hw.put(b, 8)
        if bs_code is None:
            hw.put(n - 1, 8 if n <= 256 else 16)
        hw.align()
        hdr = hw.getvalue()
        fw = BitWriter()
        for w in subs:
            fw.extend(w)
        fw.align()
        body = hdr + bytes([crc8(hdr)]) + fw.getvalue()
        frame = body + crc16(body).to_bytes(2, "big")
        frames += frame
        min_fr = len(frame) if min_fr is None else min(min_fr, len(frame))
        max_fr = len(frame) if max_fr is None else max(max_fr, len(frame))
        min_blk = n if min_blk is None else min(min_blk, n)
        max_blk = n if max_blk is None else max(max_blk, n)

    si = BitWriter()
    si.put(min_blk or block_size, 16)
    si.put(max_blk or block_size, 16)
    si.put(min_fr or 0, 24)
    si.put(max_fr or 0, 24)
    si.put(sr, 20)
    si.put(ch - 1, 3)
    si.put(bps - 1, 5)
    si.put(n_total, 36)
    md5 = (hashlib.md5(_pack_pcm(x, bps)).digest()
           if bps % 8 == 0 else b"\0" * 16)
    body = si.getvalue() + md5
    assert len(body) == 34
    return (_MAGIC + bytes([0x80]) + len(body).to_bytes(3, "big") + body
            + bytes(frames))

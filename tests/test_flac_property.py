"""Property-based FLAC round-trip fuzz (hypothesis) — losslessness over
arbitrary int16 signals, block sizes, channel layouts, and encoder knobs.

FLAC is lossless by definition, so encode→decode equality over adversarial
inputs (constants, impulses, full-scale swings, trailing-zero patterns,
denormal-ish tiny blocks) is a complete oracle for BOTH implementations at
once; hypothesis shrinks any failure to a minimal signal."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from iresearch_ray.stages.flac import decode_flac_pcm, encode_flac


@st.composite
def pcm_signals(draw):
    n = draw(st.integers(min_value=1, max_value=1200))
    ch = draw(st.sampled_from([1, 2]))
    kind = draw(st.sampled_from(["random", "smooth", "impulse", "const"]))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    if kind == "random":
        x = rng.integers(-32768, 32768, (n, ch)).astype(np.int64)
    elif kind == "smooth":
        t = np.arange(n)[:, None] / max(n, 2)
        f = rng.uniform(0.5, 40, (1, ch))
        x = np.round(30000 * np.sin(2 * np.pi * f * t)).astype(np.int64)
    elif kind == "impulse":
        x = np.zeros((n, ch), np.int64)
        for _ in range(min(n, 5)):
            x[rng.integers(0, n), rng.integers(0, ch)] = int(
                rng.integers(-32768, 32768)
            )
    else:
        x = np.full((n, ch), int(rng.integers(-32768, 32768)), np.int64)
    if draw(st.booleans()):  # common trailing zeros → wasted-bits path
        x = (x >> 4) << 4
    return x


@settings(max_examples=40, deadline=None)
@given(
    pcm=pcm_signals(),
    block=st.sampled_from([192, 256, 576, 1024]),
    mode=st.sampled_from(
        ["auto", "independent", "left_side", "right_side", "mid_side"]
    ),
    lpc=st.sampled_from([0, 4, 8]),
    po=st.integers(min_value=0, max_value=3),
    escape=st.booleans(),
)
def test_flac_roundtrip_property(pcm, block, mode, lpc, po, escape):
    if pcm.shape[1] == 1 and mode != "auto":
        mode = "independent"
    enc = encode_flac(
        pcm, 16000, bps=16, block_size=block, stereo_mode=mode,
        max_lpc_order=lpc, partition_order=po, force_escape=escape,
    )
    dec, sr, bps = decode_flac_pcm(enc)
    assert sr == 16000 and bps == 16
    assert dec.shape == pcm.shape
    assert np.array_equal(dec, pcm)

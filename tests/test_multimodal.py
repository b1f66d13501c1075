"""Multimodal stage plumbing tests: decode (deterministic fake) → resize →
features → frame-sample, all as actor-pool map_batches over Arrow."""

import numpy as np
import pytest

from iresearch_ray.stages import multimodal as mm


@pytest.fixture(scope="module")
def img_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(mm.synth_image_table(40))


def test_decode_pipeline(img_ds):
    out = img_ds.map_batches(
        mm.ImageDecode, fn_constructor_kwargs={"height": 8, "width": 8},
        batch_format="pyarrow", batch_size=16, concurrency=2, num_cpus=1,
    )
    t = out.take_all()
    assert len(t) == 40
    assert len(t[0]["pixels"]) == 8 * 8 * 3
    # determinism: same payload → same pixels
    a = mm._fake_pixels(b"xyz", 8, 8)
    b = mm._fake_pixels(b"xyz", 8, 8)
    assert (a == b).all()
    assert not (a == mm._fake_pixels(b"xyzw", 8, 8)).all()


def test_decode_resize_features_chain(img_ds):
    out = (
        img_ds.map_batches(
            mm.ImageDecode, fn_constructor_kwargs={"height": 8, "width": 8},
            batch_format="pyarrow", batch_size=16, concurrency=2, num_cpus=1,
        )
        .map_batches(
            mm.ImageResize, fn_constructor_kwargs={"out_h": 4, "out_w": 4},
            batch_format="pyarrow", batch_size=16, concurrency=2, num_cpus=1,
        )
        .map_batches(
            mm.ImageFeatures, fn_constructor_kwargs={"in_h": 4, "in_w": 4, "dim": 16},
            batch_format="pyarrow", batch_size=16, concurrency=2, num_cpus=1,
        )
    )
    rows = out.take_all()
    assert len(rows) == 40
    assert len(rows[0]["embedding"]) == 16
    # feature projection is deterministic per payload: recompute row 0 by hand
    px = mm._fake_pixels(mm.synth_image_table(40)["payload"][0].as_py(), 8, 8)
    yi = (np.arange(4) * 8 // 4)
    small = px[yi][:, yi].ravel().astype(np.float32) / 255.0
    proj = np.random.default_rng(42).standard_normal((4 * 4 * 3, 16)).astype(np.float32)
    want = small @ proj
    by_id = {r["item_id"]: np.asarray(r["embedding"]) for r in rows}
    assert np.allclose(by_id[0], want, atol=1e-5)


def test_frame_sample(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(mm.synth_video_table(5))
    out = ds.map_batches(
        mm.FrameSample, fn_constructor_kwargs={"every": 10},
        batch_format="pyarrow", batch_size=4, concurrency=2, num_cpus=1,
    )
    rows = out.take_all()
    # 30 frames, every 10th → frames 0, 10, 20 per video
    assert len(rows) == 5 * 3
    assert sorted({r["frame_idx"] for r in rows}) == [0, 10, 20]


def test_real_decoder_is_gated():
    with pytest.raises(NotImplementedError):
        mm.ImageDecode(decoder="pil")

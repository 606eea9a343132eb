"""count_batch (cross-image pooled windows) must equal per-image count()."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from countr_tpu.config import CounTRConfig
from countr_tpu.engine.inference import CountingEngine
from countr_tpu.models.countr import CounTR

CFG = CounTRConfig(
    img_size=384, patch_size=16, embed_dim=32, depth=1, num_heads=2,
    decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
    head_width=32,
)


@pytest.fixture(scope="module")
def engine():
    model = CounTR(CFG)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 384, 384, 3)),
        jnp.zeros((1, 3, 64, 64, 3)), 3,
    )
    return CountingEngine(model, params, batch_windows=4)


def test_count_batch_matches_single(rng, engine):
    imgs = [
        rng.uniform(0, 1, (384, 600, 3)).astype(np.float32),
        rng.uniform(0, 1, (384, 416, 3)).astype(np.float32),  # grid mode
        rng.uniform(0, 1, (384, 384, 3)).astype(np.float32),
    ]
    boxes = [rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32) for _ in imgs]
    rects = [
        [(50, 50, 120, 130), (10, 20, 60, 80), (200, 300, 280, 380)],
        [(5, 5, 12, 12), (50, 50, 120, 130), (10, 20, 60, 80)],  # tiny -> grid
        [(30, 30, 90, 100), (120, 40, 200, 110), (250, 250, 310, 330)],
    ]
    batch = engine.count_batch(imgs, boxes, rects, shot_num=3)
    for i in range(3):
        single = engine.count(imgs[i], boxes[i], rects[i], shot_num=3)
        assert batch[i].grid_mode == single.grid_mode
        assert batch[i].count == pytest.approx(single.count, rel=2e-4), i
        assert batch[i].raw_count == pytest.approx(single.raw_count, rel=2e-4)
        assert batch[i].e_cnt == pytest.approx(single.e_cnt, rel=2e-4, abs=1e-6)
        np.testing.assert_allclose(
            batch[i].density, single.density, atol=1e-4, rtol=1e-3
        )


def test_count_batch_uint8_matches_float(rng, engine):
    """uint8 rows + device /255 must equal the float path for
    8-bit-sourced pixels (the real test pipeline). The /255 lands in a
    DIFFERENT compiled program on the u8 path (fused into the model),
    so downstream fusion/rounding can differ by a few float32 ulps —
    the tolerance covers that, not any semantic difference."""
    img_u8 = rng.integers(0, 256, (384, 512, 3), dtype=np.uint8)
    boxes = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    rects = [(30, 30, 90, 100), (120, 40, 200, 110), (250, 250, 310, 330)]
    b_u8 = engine.count_batch([img_u8], [boxes], [rects], shot_num=3)[0]
    b_f = engine.count_batch(
        [img_u8.astype(np.float32) / 255.0], [boxes], [rects], shot_num=3
    )[0]
    assert b_u8.count == pytest.approx(b_f.count, rel=1e-6)
    np.testing.assert_allclose(b_u8.density, b_f.density, atol=5e-6)


def test_resample_maps_match_cv2(rng):
    """Device grid-crop resize maps must reproduce cv2 INTER_LINEAR on
    float images (the reference's tensor Resize path)."""
    import cv2

    from countr_tpu.engine.stitch import resample_maps

    for (src_h, src_w, dst_h, dst_w) in [(128, 139, 384, 417), (128, 128, 384, 384), (40, 300, 384, 416)]:
        img = rng.uniform(0, 1, (src_h, src_w, 3)).astype(np.float32)
        want = cv2.resize(img, (dst_w, dst_h), interpolation=cv2.INTER_LINEAR)
        iy0, iy1, wy1 = resample_maps(src_h, dst_h)
        ix0, ix1, wx1 = resample_maps(src_w, dst_w)
        cols = img[:, ix0] * (1 - wx1)[None, :, None] + img[:, ix1] * wx1[None, :, None]
        got = cols[iy0] * (1 - wy1)[:, None, None] + cols[iy1] * wy1[:, None, None]
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_count_batch_grid_uint8(rng, engine):
    """Grid-mode images no longer poison the uint8 upload: the 9-crop
    resize runs on device and must match the host cv2 single path."""
    img_u8 = rng.integers(0, 256, (384, 464, 3), dtype=np.uint8)
    plain_u8 = rng.integers(0, 256, (384, 512, 3), dtype=np.uint8)
    boxes = [rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32) for _ in range(2)]
    rects = [
        [(5, 5, 12, 12), (50, 50, 120, 130), (10, 20, 60, 80)],  # tiny -> grid
        [(30, 30, 90, 100), (120, 40, 200, 110), (250, 250, 310, 330)],
    ]
    engine.h2d_bytes = 0
    batch = engine.count_batch([img_u8, plain_u8], boxes, rects, shot_num=3)
    # mixed set stays uint8: 2 source rows at 1 byte/px, bucketed to 4
    # rows x 384 x 512 wide — far below one float row
    assert engine.h2d_bytes < 4 * 384 * 512 * 3 * 2, engine.h2d_bytes
    for i, img in enumerate([img_u8, plain_u8]):
        single = engine.count(img, boxes[i], rects[i], shot_num=3)
        assert batch[i].grid_mode == single.grid_mode
        assert batch[i].count == pytest.approx(single.count, rel=5e-4), i
        assert batch[i].e_cnt == pytest.approx(single.e_cnt, rel=5e-4, abs=1e-6)
        np.testing.assert_allclose(
            batch[i].density, single.density, atol=1e-4, rtol=1e-3
        )
    assert batch[0].grid_mode and not batch[1].grid_mode


def test_count_batch_grid_narrow(rng, engine):
    """Narrow (<384) grid-mode image through the device resample path."""
    img = rng.integers(0, 256, (384, 368, 3), dtype=np.uint8)
    boxes = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    rects = [(5, 5, 12, 12), (40, 40, 80, 90), (100, 100, 150, 160)]
    batch = engine.count_batch([img], [boxes], [rects], shot_num=3)[0]
    single = engine.count(img, boxes, rects, shot_num=3)
    assert batch.grid_mode and single.grid_mode
    assert batch.count == pytest.approx(single.count, rel=5e-4)
    np.testing.assert_allclose(batch.density, single.density, atol=1e-4, rtol=1e-3)


def test_count_batch_no_density(rng, engine):
    img = rng.uniform(0, 1, (384, 512, 3)).astype(np.float32)
    r = engine.count_batch([img], [None], [[]], shot_num=0, return_density=False)[0]
    assert r.density is None and np.isfinite(r.count)


def test_count_batch_sharded_mesh(rng, engine):
    """Window batches sharded over the 8-device CPU mesh must match the
    single-device path."""
    from countr_tpu.parallel.mesh import get_mesh

    model = engine.model
    mesh_engine = CountingEngine(
        model, engine.params, batch_windows=8, mesh=get_mesh()
    )
    img = rng.uniform(0, 1, (384, 600, 3)).astype(np.float32)
    boxes = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    rects = [(50, 50, 120, 130), (10, 20, 60, 80), (200, 300, 280, 380)]
    a = mesh_engine.count_batch([img], [boxes], [rects], shot_num=3)[0]
    b = engine.count_batch([img], [boxes], [rects], shot_num=3)[0]
    assert a.count == pytest.approx(b.count, rel=1e-5)
    np.testing.assert_allclose(a.density, b.density, atol=1e-5, rtol=1e-4)


def test_count_batch_zero_shot(rng, engine):
    imgs = [rng.uniform(0, 1, (384, 512, 3)).astype(np.float32) for _ in range(2)]
    batch = engine.count_batch(imgs, [None, None], [[], []], shot_num=0)
    for i in range(2):
        single = engine.count(imgs[i], None, [], shot_num=0)
        assert batch[i].count == pytest.approx(single.count, rel=2e-4)

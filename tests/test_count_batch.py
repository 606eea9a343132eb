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


def test_count_batch_uint8_exact(rng, engine):
    """uint8 rows + device /255 must equal the float path exactly for
    8-bit-sourced pixels (the real test pipeline)."""
    img_u8 = rng.integers(0, 256, (384, 512, 3), dtype=np.uint8)
    boxes = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    rects = [(30, 30, 90, 100), (120, 40, 200, 110), (250, 250, 310, 330)]
    b_u8 = engine.count_batch([img_u8], [boxes], [rects], shot_num=3)[0]
    b_f = engine.count_batch(
        [img_u8.astype(np.float32) / 255.0], [boxes], [rects], shot_num=3
    )[0]
    assert b_u8.count == pytest.approx(b_f.count, rel=1e-6)
    np.testing.assert_allclose(b_u8.density, b_f.density, atol=1e-6)


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

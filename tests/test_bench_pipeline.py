"""The bench's fused device-pipeline program must count exactly like
the production count_batch path it claims to measure — same plan, same
kernels, one program (engine.device_pipeline.fused_set_program)."""

import jax
import numpy as np
import pytest

from countr_tpu.config import CounTRConfig
from countr_tpu.engine.device_pipeline import chunk_plan, fused_set_program
from countr_tpu.engine.inference import CountingEngine
from countr_tpu.models.countr import CounTR


def test_chunk_plan_tail_buckets():
    assert chunk_plan(0, 32) == []
    assert chunk_plan(3, 32) == [(0, 4)]
    assert chunk_plan(15, 32) == [(0, 16)]
    assert chunk_plan(18, 32) == [(0, 24)]
    assert chunk_plan(32, 32) == [(0, 32)]
    assert chunk_plan(33, 32) == [(0, 32), (32, 4)]
    assert chunk_plan(65, 32) == [(0, 32), (32, 32), (64, 4)]
    # full-width tail when nothing graduated fits
    assert chunk_plan(30, 32) == [(0, 32)]
    # sharded: buckets stay multiples of the mesh size
    assert chunk_plan(3, 32, multiple=8) == [(0, 8)]
    assert chunk_plan(33, 32, multiple=8) == [(0, 32), (32, 8)]
    # every plan covers n with non-overlapping, in-order chunks
    for n in range(1, 100):
        plan = chunk_plan(n, 32)
        assert plan[0][0] == 0
        for (o1, b1), (o2, _) in zip(plan, plan[1:]):
            assert o2 == o1 + b1
        assert plan[-1][0] < n <= plan[-1][0] + plan[-1][1]

TINY_RECTS = [(12, 12, 17, 17), (60, 60, 65, 65), (100, 100, 105, 105)]
PLAIN_RECTS = [(40, 40, 110, 120), (150, 60, 230, 140), (250, 200, 330, 300)]


def _tiny_engine(**kw):
    from countr_tpu.config import CounTRConfig

    cfg = CounTRConfig(
        img_size=384, patch_size=16, embed_dim=32, depth=1, num_heads=2,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
        head_width=32,
    )
    return CountingEngine(CounTR(cfg), {"params": {}}, **kw)


def test_plan_batch_sets_window_aware_cut():
    """When a set fills, the packer cuts at the latest prefix whose
    window total is a multiple of batch_windows: width-512 images carry
    2 windows each, so with batch_windows=8 and a 7-row budget every
    non-final set must close at 4 images / 8 windows (zero padded
    forward slots), not the naive 7 images / 14 windows."""
    engine = _tiny_engine(batch_windows=8, images_bucket=7)
    images = [np.zeros((384, 512, 3), np.uint8) for _ in range(19)]
    rects = [list(PLAIN_RECTS) for _ in images]
    sets = engine.plan_batch_sets(images, rects)
    assert sorted(i for s in sets for i in s) == list(range(19))
    assert [len(s) for s in sets[:-1]] == [4] * (len(sets) - 1)


def test_plan_batch_sets_invariants_mixed_geometry():
    """On an FSC147-like mixed batch (grid images included): every image
    assigned exactly once, row budget respected, and the FIRST set (the
    one bench.py times) closes on a zero-tail window count."""
    from countr_tpu.engine.stitch import window_starts

    engine = _tiny_engine(batch_windows=32, images_bucket=48)
    rng = np.random.default_rng(3)
    widths = [384, 448, 512, 512, 576, 640, 512, 688, 512, 464, 576, 512]
    images = [
        rng.integers(0, 256, (384, widths[i % len(widths)], 3), np.uint8)
        for i in range(64)
    ]
    rects = [
        list(TINY_RECTS) if i % 10 == 9 else list(PLAIN_RECTS)
        for i in range(64)
    ]
    sets = engine.plan_batch_sets(images, rects)
    assert sorted(i for s in sets for i in s) == list(range(64))

    def wins(i):
        nw = len(window_starts(images[i].shape[1]))
        return 9 * nw if rects[i][0] == TINY_RECTS[0] else nw

    for s in sets[:-1]:
        rows = sum(9 if rects[i][0] == TINY_RECTS[0] else 1 for i in s)
        assert rows <= engine.images_bucket
    assert sum(wins(i) for i in sets[0]) % engine.batch_windows == 0


@pytest.fixture(scope="module")
def setup(rng_module):
    rng = rng_module
    cfg = CounTRConfig(
        img_size=384, patch_size=16, embed_dim=32, depth=1, num_heads=2,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
        head_width=32,
    )
    model = CounTR(cfg)
    params = model.init(
        jax.random.key(0), np.zeros((1, 384, 384, 3), np.float32),
        np.zeros((1, 3, 64, 64, 3), np.float32), 3,
    )
    images = [
        rng.integers(0, 256, (384, w, 3), dtype=np.uint8)
        for w in (448, 512, 640, 464)
    ]
    boxes = [
        rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32) for _ in images
    ]
    rects = [PLAIN_RECTS, PLAIN_RECTS, PLAIN_RECTS, TINY_RECTS]  # last = grid
    return model, params, images, boxes, rects


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(7)


def test_fused_set_program_matches_count_batch(setup):
    model, params, images, boxes, rects = setup
    engine = CountingEngine(model, params, batch_windows=8)
    expected = engine.count_batch(images, boxes, rects, 3, return_density=False)
    assert expected[3].grid_mode and not expected[0].grid_mode

    sp = engine._plan_set(list(range(len(images))), images, boxes, rects, 3)
    args, preds_fn, _ = fused_set_program(model, sp, batch_windows=8, shot_num=3)
    preds = np.asarray(jax.jit(preds_fn)(params, *args))
    assert preds.shape == (len(images),)
    for i, exp in enumerate(expected):
        np.testing.assert_allclose(preds[i], exp.count, rtol=1e-5, atol=1e-6)


def test_fused_set_loop_runs_and_is_finite(setup):
    """The chained-scan timing loop compiles and yields a finite carry
    (the bench's timed object; iters=2 keeps the CPU cost small)."""
    model, params, images, boxes, rects = setup
    engine = CountingEngine(model, params, batch_windows=8)
    sp = engine._plan_set(list(range(len(images))), images, boxes, rects, 3)
    args, _, make_loop = fused_set_program(model, sp, batch_windows=8, shot_num=3)
    out = float(jax.jit(make_loop(2))(params, *args))
    assert np.isfinite(out)

"""CountingEngine end-to-end parity: the batched/stitched engine must
produce the same counts as running the model window-by-window with the
reference's sequential blending and TTN arithmetic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from countr_tpu.config import CounTRConfig
from countr_tpu.engine.inference import CountingEngine, small_exemplar_count
from countr_tpu.engine.stitch import grid_crop_boxes, stitch, stitch_weights
from countr_tpu.models.countr import CounTR

# Full 384 window geometry, skinny model dims to keep CPU time sane.
CFG = CounTRConfig(
    img_size=384, patch_size=16, embed_dim=32, depth=1, num_heads=2,
    decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
    head_width=32,
)


@pytest.fixture(scope="module")
def setup():
    model = CounTR(CFG)
    imgs = jnp.zeros((1, 384, 384, 3))
    boxes = jnp.zeros((1, 3, 64, 64, 3))
    params = model.init(jax.random.key(0), imgs, boxes, 3)
    engine = CountingEngine(model, params, batch_windows=4)
    return model, params, engine


def _windowwise_count(model, params, engine, image, y, w):
    """Sequential oracle: per-window forward + weight-based stitch
    (stitch itself is sequential-verified in test_stitch)."""
    starts, weights = stitch_weights(w)
    dens = []
    for s in starts:
        win = jnp.asarray(image[None, :, s : s + 384])
        dens.append(np.asarray(model.apply(params, win, y, method=CounTR.forward_tokens))[0])
    return stitch(np.stack(dens), starts, weights, w)


def test_engine_matches_windowwise(rng, setup):
    model, params, engine = setup
    w = 600
    image = rng.uniform(0, 1, (384, w, 3)).astype(np.float32)
    boxes = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    rects = [(50, 50, 120, 130), (10, 20, 60, 80), (200, 300, 280, 380)]

    res = engine.count(image, boxes, rects, shot_num=3)
    assert not res.grid_mode
    y = engine.exemplar_tokens(boxes, 3)
    want_density = _windowwise_count(model, params, engine, image, y, w)
    np.testing.assert_allclose(res.density, want_density, atol=1e-4, rtol=1e-4)

    want_cnt = float(want_density.sum() / 60)
    e_cnt = sum(
        float(want_density[r[0]:r[2]+1, r[1]:r[3]+1].sum() / 60) for r in rects
    ) / 3
    if e_cnt > 1.8:
        want_cnt /= e_cnt
    assert res.count == pytest.approx(want_cnt, rel=1e-5)
    assert res.e_cnt == pytest.approx(e_cnt, rel=1e-5)


def test_engine_grid_mode(rng, setup):
    model, params, engine = setup
    w = 416
    image = rng.uniform(0, 1, (384, w, 3)).astype(np.float32)
    boxes = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    # one tiny exemplar -> grid mode triggers at max_s_cnt=1
    rects = [(5, 5, 12, 12), (50, 50, 120, 130), (10, 20, 60, 80)]
    assert small_exemplar_count(rects) == 1

    res = engine.count(image, boxes, rects, shot_num=3)
    assert res.grid_mode

    # oracle: 9 crops resized back to (h, w), each counted separately
    y = engine.exemplar_tokens(boxes, 3)
    crops = grid_crop_boxes(384, w)
    want = 0.0
    last_density = None
    for (t, l, ch, cw) in crops:
        crop = image[t : t + ch, l : l + cw]
        r = np.asarray(
            jax.image.resize(
                jnp.asarray(crop[None]), (1, 384, w, 3), "bilinear",
                antialias=False,
            )
        )[0]
        last_density = _windowwise_count(model, params, engine, r, y, w)
        want += float(last_density.sum() / 60)
    e_cnt = sum(
        float(last_density[r0:r2+1, r1:r3+1].sum() / 60)
        for (r0, r1, r2, r3) in rects
    ) / 3
    want_final = want / e_cnt if e_cnt > 1.8 else want
    assert res.raw_count == pytest.approx(want, rel=1e-4)
    assert res.count == pytest.approx(want_final, rel=1e-4)


def test_engine_zero_shot(rng, setup):
    model, params, engine = setup
    image = rng.uniform(0, 1, (384, 384, 3)).astype(np.float32)
    res = engine.count(image, None, [], shot_num=0)
    assert res.n_windows == 1
    # zero-shot must differ from few-shot (different exemplar tokens)
    boxes = rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32)
    res3 = engine.count(image, boxes, [], shot_num=3)
    assert res.count != pytest.approx(res3.count, rel=1e-6)


def test_engine_narrow_image(rng, setup):
    model, params, engine = setup
    image = rng.uniform(0, 1, (384, 192, 3)).astype(np.float32)
    res = engine.count(image, None, [], shot_num=0)
    assert res.density.shape == (384, 192)
    assert res.n_windows == 1  # padded to one window
    # strict reference mode: no windows, zero count
    strict = CountingEngine(model, params, batch_windows=4, narrow_policy="reference")
    res_ref = strict.count(image, None, [], shot_num=0)
    assert res_ref.count == 0.0 and res_ref.n_windows == 0


def test_count_image_raw_api(rng, setup):
    """count_image: raw PIL/array + original-pixel boxes -> same result
    as manual test-pipeline preprocessing + engine.count."""
    from PIL import Image

    from countr_tpu import count_image
    from countr_tpu.data import transforms as T

    model, params, engine = setup
    raw = (rng.uniform(0, 255, (500, 700, 3))).astype(np.uint8)
    boxes_xyxy = [(50, 60, 120, 140), (200, 210, 260, 280), (300, 50, 360, 120)]

    res = count_image(engine, Image.fromarray(raw), boxes_xyxy)

    nh, nw = T.test_size(500, 700)
    sy, sx = nh / 500, nw / 700
    resized = T.pil_resize(Image.fromarray(raw), nh, nw)
    rects = [
        [int(y1 * sy), int(x1 * sx), int(y2 * sy), int(x2 * sx)]
        for (x1, y1, x2, y2) in boxes_xyxy
    ]
    crops = T.crop_exemplars(resized, rects, max_boxes=3)
    ref = engine.count(resized, crops, rects, shot_num=3)
    assert res.count == pytest.approx(ref.count, abs=1e-5)
    # path input and zero-shot array input also work
    res0 = count_image(engine, raw)
    assert np.isfinite(res0.count)

"""End-to-end transcription oracle for the reference test loop.

``reference_loop_count`` below is a line-by-line torch transcription of
the reference's per-image few-shot test body (reference:
FSC_test_cross(few-shot).py:253-365): the s_cnt cap-at-3 scan, the
9-crop grid order and torch Resize, the sequential ZeroPad2d
overlap-halving blend, the tail-window snap (start = w - 384, with the
exact-multiple break), the TTN statistic over ALL rects divided by 3
with the >1.8 threshold applied to the LAST computed density map, and
the sum/60 count readout.

Driven by a deterministic fake model (a pure function of the window
pixels, identical on both sides), it is asserted equal to
``CountingEngine.count`` AND ``CountingEngine.count_batch`` over widths
{368, 384, 416, 600, 640, 1392} x {grid, plain} x TTN on/off — the
strongest released-weights-free parity evidence for the inference
engine's stitching/grid/TTN arithmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from countr_tpu.engine.inference import CountingEngine
from countr_tpu.models.countr import CounTR
from countr_tpu.config import CounTRConfig

WIDTHS = [368, 384, 416, 600, 640, 1392]

# rects (y1, x1, y2, x2) in resized coords; the grid set's first rect
# is <10x10 (the s_cnt trigger, reference :264-271); the "many" set has
# 5 rects so the TTN loop (uncapped, :355-357) diverges from the s_cnt
# scan (capped at 3, :266-268)
PLAIN_RECTS = [(20, 30, 80, 90), (100, 120, 180, 200), (200, 40, 300, 140)]
GRID_RECTS = [(5, 5, 12, 12), (100, 120, 180, 200), (200, 40, 300, 140)]
MANY_RECTS = PLAIN_RECTS + [(40, 200, 90, 260), (6, 300, 13, 308)]


def make_fake_model(alpha: float):
    """Deterministic density head: a smooth nonlinear function of the
    window pixels, identical in the jax (engine) and torch (oracle)
    drivers. alpha scales the output to steer the TTN statistic."""

    def fake_jax(windows):  # [B, 384, 384, 3] f32 -> [B, 384, 384]
        m = jnp.mean(windows, axis=-1)
        return (m + 0.25 * m * m) * alpha

    def fake_torch(window):  # [3, 384, 384] -> [384, 384]
        m = torch.mean(window, dim=0)
        return (m + 0.25 * m * m) * alpha

    return fake_jax, fake_torch


def reference_loop_count(image_t, pos, fwd, normalization=True,
                         max_s_cnt=1):
    """Verbatim torch transcription of the reference per-image loop
    (reference: FSC_test_cross(few-shot).py:264-359). image_t:
    [3, h, w] float tensor; pos: rects (y1, x1, y2, x2); fwd: [3, 384,
    384] window -> [384, 384] density. Returns (pred_cnt, density_map)
    with density_map the LAST computed map (the TTN quirk source)."""
    h, w = image_t.shape[1], image_t.shape[2]

    r_cnt = 0
    s_cnt = 0
    for rect in pos:
        r_cnt += 1
        if r_cnt > 3:
            break
        if rect[2] - rect[0] < 10 and rect[3] - rect[1] < 10:
            s_cnt += 1

    def slide(img):
        density_map = torch.zeros([h, w])
        start = 0
        prev = -1
        while start + 383 < w:
            output = fwd(img[:, :, start:start + 384])
            d1 = F.pad(output[:, 0:prev - start + 1], (start, w - prev - 1))
            d2 = F.pad(output[:, prev - start + 1:384],
                       (prev + 1, w - start - 384))
            density_map_l = F.pad(density_map[:, 0:start], (0, w - start))
            density_map_m = F.pad(density_map[:, start:prev + 1],
                                  (start, w - prev - 1))
            density_map_r = F.pad(density_map[:, prev + 1:w], (prev + 1, 0))
            density_map = (density_map_l + density_map_r + density_map_m / 2
                           + d1 / 2 + d2)
            prev = start + 383
            start = start + 128
            if start + 383 >= w:
                if start == w - 384 + 128:
                    break
                else:
                    start = w - 384
        return density_map

    if s_cnt >= max_s_cnt:
        # the reference's 9 TF.crop calls in their exact order
        crops = [
            (0, 0), (int(h / 3), 0), (0, int(w / 3)),
            (int(h / 3), int(w / 3)), (int(h * 2 / 3), 0),
            (int(h * 2 / 3), int(w / 3)), (0, int(w * 2 / 3)),
            (int(h / 3), int(w * 2 / 3)), (int(h * 2 / 3), int(w * 2 / 3)),
        ]
        ch, cw = int(h / 3), int(w / 3)
        pred_cnt = 0.0
        density_map = torch.zeros([h, w])
        for (top, left) in crops:
            r_image = image_t[:, top:top + ch, left:left + cw]
            # transforms.Resize((h, w)) on a tensor = bilinear,
            # antialias=False, align_corners=False
            r_image = F.interpolate(
                r_image.unsqueeze(0), size=(h, w), mode="bilinear",
                align_corners=False,
            )
            density_map = slide(r_image[0])
            pred_cnt += float(torch.sum(density_map / 60).item())
    else:
        density_map = slide(image_t)
        pred_cnt = float(torch.sum(density_map / 60).item())

    if normalization:
        e_cnt = 0.0
        for rect in pos:
            e_cnt += float(torch.sum(
                density_map[rect[0]:rect[2] + 1, rect[1]:rect[3] + 1] / 60
            ).item())
        e_cnt = e_cnt / 3
        if e_cnt > 1.8:
            pred_cnt /= e_cnt

    return pred_cnt, density_map.numpy()


def make_engine(alpha: float) -> CountingEngine:
    """CountingEngine whose forwards are replaced by the fake model
    (instance-level jit handles; the window extraction, stitch, grid
    resize, TTN and count readout stay the production code)."""
    cfg = CounTRConfig(
        img_size=384, patch_size=16, embed_dim=32, depth=1, num_heads=2,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
        head_width=32,
    )
    model = CounTR(cfg)
    engine = CountingEngine(
        model, {"params": {}}, batch_windows=8, images_bucket=16,
        narrow_policy="reference",
    )
    fake_jax, _ = make_fake_model(alpha)
    fwd = jax.jit(lambda params, windows, y: fake_jax(windows))
    engine._fwd = fwd
    engine._exemplars = jax.jit(
        lambda params, boxes, shot_num: jnp.zeros((boxes.shape[0], 1, 8)),
        static_argnums=(2,),
    )
    engine._pipeline._fwd = jax.jit(
        lambda params, windows, y_all, owners: fake_jax(windows)
    )
    return engine


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(17)
    return {
        w: rng.uniform(0, 1, (384, w, 3)).astype(np.float32) for w in WIDTHS
    }


@pytest.mark.parametrize("alpha", [1.0, 0.004], ids=["ttn_on", "ttn_off"])
@pytest.mark.parametrize("rects_name", ["plain", "grid", "many"])
def test_engine_matches_reference_loop(images, alpha, rects_name):
    rects = {"plain": PLAIN_RECTS, "grid": GRID_RECTS,
             "many": MANY_RECTS}[rects_name]
    engine = make_engine(alpha)
    _, fake_torch = make_fake_model(alpha)

    imgs, boxes_list, rects_list = [], [], []
    want = {}
    ttn_states = set()
    for w, img in images.items():
        image_t = torch.from_numpy(np.ascontiguousarray(
            img.transpose(2, 0, 1)
        ))
        pred, den = reference_loop_count(
            image_t, rects, lambda win: fake_torch(win)
        )
        want[w] = (pred, den)
        imgs.append(img)
        boxes_list.append(np.zeros((3, 64, 64, 3), np.float32))
        rects_list.append(rects)

        # single-image engine path
        got = engine.count(img, boxes_list[-1], rects, shot_num=3)
        # "many"'s tiny rect is the 5th — past the s_cnt cap-at-3, so
        # it must NOT trigger grid mode (while TTN still sums it)
        assert got.grid_mode == (rects_name == "grid")
        assert got.count == pytest.approx(pred, rel=2e-4, abs=1e-4), (
            w, rects_name)
        if w >= 384:
            np.testing.assert_allclose(
                got.density, den, rtol=1e-3, atol=2e-4,
                err_msg=f"width {w}",
            )
        ttn_states.add(got.e_cnt > 1.8)

    # the TTN branch must actually fire (or not) as the case intends
    if alpha == 1.0:
        assert True in ttn_states
    else:
        assert ttn_states == {False}

    # batched device-pipeline path (all widths in one call)
    results = engine.count_batch(imgs, boxes_list, rects_list, shot_num=3)
    for w, r in zip(images.keys(), results):
        pred, den = want[w]
        assert r.count == pytest.approx(pred, rel=2e-4, abs=1e-4), (
            w, rects_name)
        if w >= 384:
            np.testing.assert_allclose(
                r.density, den, rtol=1e-3, atol=2e-4,
                err_msg=f"batch width {w}",
            )


def test_reference_loop_narrow_is_zero(images):
    """Images narrower than one window predict 0 in the reference (the
    while loop never runs); narrow_policy='reference' must agree."""
    engine = make_engine(1.0)
    img = images[368]
    r = engine.count(img, np.zeros((3, 64, 64, 3), np.float32),
                     PLAIN_RECTS, shot_num=3)
    assert r.count == 0.0
    rb = engine.count_batch(
        [img], [np.zeros((3, 64, 64, 3), np.float32)], [PLAIN_RECTS],
        shot_num=3,
    )[0]
    assert rb.count == 0.0


def test_tail_snap_exact_multiple():
    """w - 384 an exact multiple of 128: the reference BREAKS instead of
    re-running the last window (start == w - 384 + 128 branch). The
    window count must match the reference loop's."""
    from countr_tpu.engine.stitch import stitch_weights

    for w in (640, 1024, 896):
        # reference loop window starts
        starts_ref = []
        start, prev = 0, -1
        while start + 383 < w:
            starts_ref.append(start)
            prev = start + 383
            start = start + 128
            if start + 383 >= w:
                if start == w - 384 + 128:
                    break
                start = w - 384
        starts, _ = stitch_weights(w)
        assert list(starts) == starts_ref, w

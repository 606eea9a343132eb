"""Device-side augmentation (countr_tpu.ops.augment): exactness tests
for the deterministic pieces (blur kernel, density synthesis, jitter
primitives) and distribution/shape tests for the random chain, plus the
device-aug train-step and dataset paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from countr_tpu.ops import augment as A


def test_blur_matches_cv2(rng):
    """gaussian_blur == cv2.GaussianBlur(ksize=(7,9), reflect101) for a
    fixed sigma (the reference's blur: util/FSC147.py:373)."""
    import cv2

    img = rng.uniform(0, 1, (64, 80, 3)).astype(np.float32)
    for sigma in (0.3, 1.0, 1.9):
        want = cv2.GaussianBlur(
            img, ksize=(7, 9), sigmaX=sigma, sigmaY=sigma,
            borderType=cv2.BORDER_REFLECT101,
        )
        got = np.asarray(A.gaussian_blur(jnp.asarray(img), sigma))
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_density_matches_scipy(rng):
    """density_from_dots == gaussian_filter(dot map, sigma=1)*60 — the
    loss target must be EXACT, not just distributional (reference:
    util/FSC147.py:274-279)."""
    from scipy import ndimage

    pts = np.stack(
        [rng.integers(0, 384, 200), rng.integers(0, 384, 200)], 1
    ).astype(np.int16)
    dmap = np.zeros((384, 384), np.float32)
    for x, y in pts:
        dmap[y, x] = 1.0
    want = ndimage.gaussian_filter(dmap, sigma=1.0, order=0) * 60.0
    pad = np.zeros((512, 2), np.int16)
    pad[:200] = pts
    got = np.asarray(A.density_from_dots(jnp.asarray(pad), 200))
    np.testing.assert_allclose(got, want, atol=1e-4)
    # mass conservation (reflect boundary): sum == 60 * unique dots
    uniq = len({(int(x), int(y)) for x, y in pts})
    assert got.sum() == pytest.approx(60.0 * uniq, rel=1e-5)


def test_density_empty_and_duplicates():
    dots = np.asarray([[5, 5], [5, 5], [10, 10]], np.int16)
    pad = np.zeros((16, 2), np.int16)
    pad[:3] = dots
    got = np.asarray(A.density_from_dots(jnp.asarray(pad), 3))
    # duplicates overwrite (binary map) -> mass 2*60
    assert got.sum() == pytest.approx(120.0, rel=1e-5)
    none = np.asarray(A.density_from_dots(jnp.asarray(pad), 0))
    assert none.sum() == 0.0


def test_jitter_primitives_match_host(rng):
    """brightness/contrast/saturation blends and the hue rotation match
    the host formulas for fixed factors."""
    import cv2

    img = rng.uniform(0, 1, (32, 40, 3)).astype(np.float32)
    j = jnp.asarray(img)
    f = 1.13
    np.testing.assert_allclose(
        np.asarray(A._brightness(j, f)), np.clip(img * f, 0, 1), atol=1e-6
    )
    gray = img @ np.asarray([0.299, 0.587, 0.114], np.float32)
    np.testing.assert_allclose(
        np.asarray(A._contrast(j, f)),
        np.clip(f * img + (1 - f) * gray.mean(), 0, 1), atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(A._saturation(j, f)),
        np.clip(f * img + (1 - f) * gray[..., None], 0, 1), atol=1e-6,
    )
    # hue: device HSV round trip vs cv2's
    shift = 0.11
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    hsv[..., 0] = (hsv[..., 0] + shift * 360.0) % 360.0
    want = np.clip(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB), 0, 1)
    got = np.asarray(A._hue(j, shift))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_photometric_distribution(rng):
    """The random chain keeps values in [0,1] and perturbs around the
    input with roughly the numpy spec's spread."""
    img = jnp.full((48, 48, 3), 0.5, jnp.float32)
    outs = []
    fn = jax.jit(A.photometric)
    for i in range(24):
        outs.append(np.asarray(fn(jax.random.key(i), img)))
    outs = np.stack(outs)
    assert outs.min() >= 0.0 and outs.max() <= 1.0
    # noise sigma 0.1 survives jitter/blur at least partially
    assert 0.005 < outs.std() < 0.25
    # mean stays near 0.5 (brightness/contrast are centered on 1)
    assert abs(outs.mean() - 0.5) < 0.15


def test_photometric_distribution_matches_host(rng):
    """Distribution-level parity of the device photometric chain vs the
    numpy/cv2 spec (transforms.gaussian_noise/color_jitter/
    gaussian_blur): over many seeds, the ensemble mean image and the
    per-sample deviation spread must agree."""
    from countr_tpu.data import transforms as T

    base = rng.uniform(0.2, 0.8, (48, 48, 3)).astype(np.float32)
    n = 24
    host = []
    for i in range(n):
        r = np.random.default_rng(100 + i)
        x = T.gaussian_noise(r, base)
        x = T.color_jitter(r, x)
        x = T.gaussian_blur(r, x)
        host.append(x)
    host = np.stack(host)
    fn = jax.jit(A.photometric)
    dev = np.stack([
        np.asarray(fn(jax.random.key(200 + i), jnp.asarray(base)))
        for i in range(n)
    ])
    # ensemble mean: both chains are centered on the input
    assert np.abs(host.mean(0) - dev.mean(0)).mean() < 0.05
    # spread of the per-sample perturbation
    h_dev = np.abs(host - base).mean(axis=(1, 2, 3))
    d_dev = np.abs(dev - base).mean(axis=(1, 2, 3))
    assert abs(h_dev.mean() - d_dev.mean()) < 0.035, (h_dev.mean(), d_dev.mean())
    assert d_dev.mean() > 0.02  # the chain is actually perturbing


def test_augment_batch_mosaic_flag(rng):
    """apply_photo=0 rows (mosaic) pass through exactly as u8/255."""
    imgs = rng.integers(0, 256, (2, 384, 384, 3), dtype=np.uint8)
    dots = np.zeros((2, 8, 2), np.int16)
    dots[0, 0] = (10, 20)
    n = np.asarray([1, 0], np.int32)
    photo = np.asarray([0.0, 1.0], np.float32)
    out, den = jax.jit(A.augment_batch)(
        jax.random.key(0), jnp.asarray(imgs), jnp.asarray(dots), n, photo
    )
    np.testing.assert_allclose(
        np.asarray(out[0]), imgs[0].astype(np.float32) / 255.0, atol=1e-7
    )
    assert float(den[0].sum()) == pytest.approx(60.0, rel=1e-5)
    assert float(den[1].sum()) == 0.0
    # photo row actually changed
    assert np.abs(np.asarray(out[1]) - imgs[1] / 255.0).max() > 1e-3


def test_train_dataset_device_items(rng):
    """TrainDataset(device_aug=True) sample contract + dot bookkeeping."""
    from tests.test_data import fsc_dir as _  # noqa: F401
    from countr_tpu.data.fsc147 import FSC147Meta, TrainDataset

    # reuse the synthetic fixture machinery via a tiny local dir
    import json
    import os
    import tempfile

    from PIL import Image

    with tempfile.TemporaryDirectory() as root:
        imdir = os.path.join(root, "images_384_VarV2")
        os.mkdir(imdir)
        anno, ids = {}, []
        for i in range(3):
            im_id = f"img_{i}.jpg"
            ids.append(im_id)
            h, w = 400, 520
            Image.fromarray(
                rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            ).save(os.path.join(imdir, im_id))
            pts = np.stack(
                [rng.uniform(5, w - 5, 30), rng.uniform(5, h - 5, 30)], 1
            )
            boxes = [[[10, 10], [10, 40], [40, 40], [40, 10]]] * 3
            anno[im_id] = {
                "points": pts.tolist(), "box_examples_coordinates": boxes,
            }
        with open(os.path.join(root, "annotation_FSC147_384.json"), "w") as f:
            json.dump(anno, f)
        with open(os.path.join(root, "Train_Test_Val_FSC_147.json"), "w") as f:
            json.dump({"train": ids, "val": ids[:1], "test": ids[:1]}, f)
        with open(os.path.join(root, "ImageClasses_FSC147.txt"), "w") as f:
            f.write("\n".join(f"{i} widget" for i in ids))
        meta = FSC147Meta.load(root)
        ds = TrainDataset(meta, device_aug=True, seed=3)
        saw_mosaic = saw_plain = False
        for epoch in range(6):
            ds.set_epoch(epoch)
            for i in range(len(ds)):
                s = ds[i]
                assert s["image_u8"].shape == (384, 384, 3)
                assert s["image_u8"].dtype == np.uint8
                assert s["dots"].shape == (ds.MAX_DEVICE_DOTS, 2)
                assert s["dots"].dtype == np.int16
                k = int(s["n_dots"])
                assert 0 <= k <= 30 * 4  # mosaic can stack 4 cells
                if k:
                    d = s["dots"][:k]
                    assert d.min() >= 0 and d.max() < 384
                assert s["boxes"].shape == (3, 64, 64, 3)
                if s["apply_photo"] == 0.0:
                    saw_mosaic = True
                    assert s["m_flag"] in (0, 1)
                else:
                    saw_plain = True
                    assert s["m_flag"] == 0
        assert saw_mosaic and saw_plain


def test_finetune_step_device_aug(rng):
    """Device-aug train step: loss finite, params update, works with a
    sharded global batch on the 8-device mesh."""
    from countr_tpu.config import CounTRConfig, TrainConfig
    from countr_tpu.engine.train import (
        init_train_state, make_finetune_step, make_optimizer,
    )
    from countr_tpu.models.countr import CounTR
    from countr_tpu.parallel.mesh import batch_sharding, get_mesh, replicated_sharding

    cfg = CounTRConfig(
        img_size=384, patch_size=16, embed_dim=32, depth=1, num_heads=2,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
        head_width=32,
    )
    model = CounTR(cfg)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 384, 384, 3)),
        jnp.zeros((1, 3, 64, 64, 3)), 3,
    )["params"]
    tcfg = TrainConfig(batch_size=8, epochs=2, warmup_epochs=1, lr=1e-4)
    tx, _ = make_optimizer(tcfg, steps_per_epoch=1, world_batch=8)
    state = init_train_state(params, tx)
    mesh = get_mesh()
    bsh, rsh = batch_sharding(mesh), replicated_sharding(mesh)
    state = jax.tree.map(lambda x: jax.device_put(x, rsh), state)

    dots = np.zeros((8, 64, 2), np.int16)
    dots[:, :5] = rng.integers(0, 384, (8, 5, 2))
    batch = {
        "image_u8": jax.device_put(
            rng.integers(0, 256, (8, 384, 384, 3), dtype=np.uint8), bsh
        ),
        "dots": jax.device_put(dots, bsh),
        "n_dots": jax.device_put(np.full(8, 5, np.int32), bsh),
        "apply_photo": jax.device_put(
            np.asarray([1, 0] * 4, np.float32), bsh
        ),
        "boxes": jax.device_put(
            rng.uniform(0, 1, (8, 3, 64, 64, 3)).astype(np.float32), bsh
        ),
    }
    step = make_finetune_step(model, tcfg, device_aug=True)
    leaves0 = [np.asarray(l).copy() for l in jax.tree.leaves(state.params)]
    state, m = step(state, batch, jax.random.key(1), 3)
    state, m = step(state, batch, jax.random.key(2), 3)  # step 0 lr=0 (warmup)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["mae"]))
    leaves1 = [np.asarray(l) for l in jax.tree.leaves(state.params)]
    assert any(
        not np.allclose(a, b) for a, b in zip(leaves0, leaves1)
    ), "no param changed"

"""Resident CARPK store vs the host reference transform.

The resident path must reproduce carpk_train_sample's outputs
(reference: FSC_finetune_CARPK.py:204-240): same 384x384 train image
(to fp32 resize rounding), same exemplar crops, same density."""

import numpy as np
import pytest

from tests.test_carpk import carpk_dir  # fixture  # noqa: F401


@pytest.fixture(scope="module")
def store_and_src(tmp_path_factory):
    # build once per module (uploads the fixture images to the CPU "device")
    import tests.test_carpk as tc

    root = tc.carpk_dir.__wrapped__(tmp_path_factory)
    from countr_tpu.data.carpk import CarpkLocal
    from countr_tpu.engine.carpk_store import build_carpk_store

    src = CarpkLocal(root, "train")
    return build_carpk_store(src), src


def test_image_matches_host_resize(store_and_src):
    import cv2

    from countr_tpu.engine.carpk_store import materialize_carpk_batch

    store, src = store_and_src
    geo = _identity_geo(store, [0, 1])
    imgs, _ = materialize_carpk_batch(store.arrays, geo)
    for p, i in enumerate((0, 1)):
        image_f = src[i]["image"].astype(np.float32) / 255.0
        want = cv2.resize(image_f, (683, 384), interpolation=cv2.INTER_LINEAR)[
            0:384, 0:384
        ]
        np.testing.assert_allclose(np.asarray(imgs[p]), want, atol=2e-6)


def test_exemplar_matches_host_crop(store_and_src):
    from countr_tpu.data.carpk import _crop_resize64
    from countr_tpu.engine.carpk_store import (
        exemplar_geometry, materialize_carpk_batch,
    )

    store, src = store_and_src
    rng = np.random.default_rng(7)
    idxs = np.asarray([0, 1])
    geo = exemplar_geometry(rng, store, idxs)
    geo["img_idx"] = idxs.astype(np.int32)
    _, boxes = materialize_carpk_batch(store.arrays, geo)
    # re-derive which box each sample picked (same rng stream)
    rng2 = np.random.default_rng(7)
    for p, i in enumerate(idxs):
        bxs = store.boxes_xywh[int(i)]
        box = bxs[int(rng2.integers(0, len(bxs)))]
        image_f = src[int(i)]["image"].astype(np.float32) / 255.0
        want = _crop_resize64(image_f, box)
        got = np.asarray(boxes[p, 0])
        np.testing.assert_allclose(got, want, atol=2e-6)
        # the single exemplar is tiled to all 3 shot slots
        np.testing.assert_array_equal(np.asarray(boxes[p, 1]), got)


def test_density_matches_host(store_and_src):
    import jax
    import jax.numpy as jnp

    from countr_tpu.data.carpk import carpk_train_sample
    from countr_tpu.ops.augment import density_from_dots

    store, src = store_and_src
    for i in range(2):
        host = carpk_train_sample(np.random.default_rng(0), src[i])
        got = density_from_dots(
            store.arrays["dots"][i], store.arrays["n_dots"][i]
        )
        np.testing.assert_allclose(
            np.asarray(got), host["gt_density"], atol=1e-5
        )


def test_store_step_runs_and_learns_shapes(store_and_src):
    import jax
    import jax.numpy as jnp

    from countr_tpu.config import CounTRConfig, TrainConfig
    from countr_tpu.engine.carpk_store import exemplar_geometry
    from countr_tpu.engine.train import (
        init_train_state, make_carpk_store_step, make_optimizer,
    )
    from countr_tpu.models.countr import CounTR

    store, src = store_and_src
    cfg = CounTRConfig(
        img_size=384, patch_size=16, embed_dim=32, depth=1, num_heads=2,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
        freeze_encoder=False, head_width=32,
    )
    model = CounTR(cfg)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 384, 384, 3)),
        jnp.zeros((1, 3, 64, 64, 3)), 1,
    )["params"]
    tcfg = TrainConfig(batch_size=2, epochs=2, warmup_epochs=1,
                       loss_mask_p=1.0)
    tx, _ = make_optimizer(tcfg, 1, 2, freeze_encoder=False)
    state = init_train_state(params, tx)
    step = make_carpk_store_step(model, tcfg)
    geo = exemplar_geometry(np.random.default_rng(1), store, np.asarray([0, 1]))
    geo["img_idx"] = np.asarray([0, 1], np.int32)
    state, m = step(state, store.arrays, geo, jax.random.key(2))
    assert np.isfinite(float(m["loss"])) and float(m["loss"]) > 0
    assert np.isfinite(float(m["mae"]))


def _identity_geo(store, idxs):
    """Geometry batch with arbitrary (unused-in-test) exemplar maps."""
    from countr_tpu.engine.carpk_store import exemplar_geometry

    geo = exemplar_geometry(np.random.default_rng(0), store, np.asarray(idxs))
    geo["img_idx"] = np.asarray(idxs, np.int32)
    return geo

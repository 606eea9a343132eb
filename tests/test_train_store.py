"""Resident-store training (engine.train_store): device-materialized
batches must reproduce the host geometry pipeline."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from countr_tpu.data import transforms as T
from countr_tpu.engine import train_store as TS


@pytest.fixture(scope="module")
def store_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("store_fsc")
    imdir = root / "images_384_VarV2"
    imdir.mkdir()
    rng = np.random.default_rng(11)
    anno, ids = {}, []
    sizes = [(400, 500), (384, 600), (500, 420), (420, 480)]
    for i, (h, w) in enumerate(sizes):
        im_id = f"img_{i}.jpg"
        ids.append(im_id)
        # save as PNG content in .jpg name? keep jpg; decode noise is
        # irrelevant — host and device read the SAME store pixels
        Image.fromarray(rng.integers(0, 256, (h, w, 3)).astype(np.uint8)).save(
            imdir / im_id
        )
        k = 80 if i == 0 else 20  # img_0 rich enough for type-1 mosaic
        pts = np.stack([rng.uniform(5, w - 5, k), rng.uniform(5, h - 5, k)], 1)
        boxes = [[[10, 10], [10, 40], [40, 40], [40, 10]]] * 3
        anno[im_id] = {"points": pts.tolist(), "box_examples_coordinates": boxes}
    (root / "annotation_FSC147_384.json").write_text(json.dumps(anno))
    (root / "Train_Test_Val_FSC_147.json").write_text(
        json.dumps({"train": ids, "val": ids[:1], "test": ids[:1]})
    )
    (root / "ImageClasses_FSC147.txt").write_text(
        "\n".join(f"{i} widget" for i in ids)
    )
    from countr_tpu.data.fsc147 import FSC147Meta

    meta = FSC147Meta.load(str(root))
    store = TS.build_store(meta, ids, log=lambda *_: None)
    return meta, store


def _host_image(meta, store, i):
    """The float image the store's pixels represent."""
    im_id = store.ids[i]
    img = meta.open_image(im_id)
    w0, h0 = img.size
    u8 = T.pil_resize_u8(img, *T.flex_size(h0, w0))
    return u8.astype(np.float32) / 255.0


def test_store_catalog(store_fixture):
    meta, store = store_fixture
    packed = np.asarray(store.pixels)
    px = np.stack(
        [(packed >> 16) & 0xFF, (packed >> 8) & 0xFF, packed & 0xFF], -1
    ).astype(np.uint8)
    for i, im_id in enumerate(store.ids):
        h, w = int(store.h_np[i]), int(store.w_np[i])
        base = int(np.asarray(store.base)[i])
        flat = px[base : base + h * w].reshape(h, w, 3)
        want = (_host_image(meta, store, i) * 255).round().astype(np.uint8)
        np.testing.assert_array_equal(flat, want)


def test_affine_sample_matches_cv2(store_fixture):
    """Device affine+flip+crop == cv2.warpAffine -> hflip -> crop on
    the float image (cv2 quantizes coords to 1/32 px; tolerance
    reflects that)."""
    import cv2

    meta, store = store_fixture
    rng = np.random.default_rng(5)
    i = 1
    imgf = _host_image(meta, store, i)
    nh, nw = imgf.shape[:2]
    for flip in (False, True):
        M = T.draw_affine_matrix(rng, nh, nw)
        left = int(rng.integers(0, nw - 384 + 1))
        top = int(rng.integers(0, nh - 384 + 1))
        warped = cv2.warpAffine(
            imgf, M, (nw, nh), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT,
        )
        if flip:
            warped = warped[:, ::-1]
        want = warped[top : top + 384, left : left + 384]
        C, d = TS.compose_affine(M, flip, left, top, nw)
        got = np.asarray(
            jax.jit(TS._affine_sample)(
                store.pixels, store.base[i], store.width[i],
                store.height[i], store.width[i], jnp.asarray(C), jnp.asarray(d),
            )
        )
        assert np.abs(got - want).mean() < 5e-3
        assert np.abs(got - want).max() < 0.08


def test_mosaic_sample_matches_host(store_fixture):
    """Device mosaic == tensor_resize + _blend_mosaic on floats."""
    from countr_tpu.data.fsc147 import _blend_mosaic

    meta, store = store_fixture
    rng = np.random.default_rng(7)
    bl = 14
    resize_l = 192 + 2 * bl
    cells, tops, lefts, lens = [], [], [], []
    cells_img = []
    for i in range(4):
        j = int(rng.integers(0, len(store.ids)))
        h, w = int(store.h_np[j]), int(store.w_np[j])
        length = int(rng.integers(250, min(385, min(h, w) + 1)))
        top = int(rng.integers(0, h - length + 1))
        left = int(rng.integers(0, w - length + 1))
        cells.append(j)
        tops.append(top)
        lefts.append(left)
        lens.append(length)
        imgf = _host_image(meta, store, j)
        crop = imgf[top : top + length, left : left + length]
        cells_img.append(T.tensor_resize(crop, resize_l, resize_l))
    zeros = [np.zeros((resize_l, resize_l), np.float32)] * 4
    want, _den = _blend_mosaic(cells_img, zeros, bl, resize_l)
    got = np.asarray(
        jax.jit(TS._mosaic_sample)(
            store.pixels, store.base[jnp.asarray(cells)],
            store.width[jnp.asarray(cells)],
            jnp.asarray(tops), jnp.asarray(lefts), jnp.asarray(lens),
            jnp.asarray(bl),
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert want.shape == (384, 384, 3)


def test_mosaic_params_match_host_pixels(store_fixture):
    """_mosaic_params' draws + dot bookkeeping == the host _mosaic with
    an identically-seeded rng (same draw order), for both mosaic types."""
    from countr_tpu.data.fsc147 import TrainDataset

    meta, store = store_fixture
    ds = TrainDataset(meta, seed=0, store_index=store.index)
    for idx, im_id in [(0, store.ids[0]), (1, store.ids[1])]:  # type1, type2
        anno = meta.annotations[im_id]
        dots = np.asarray(anno["points"], np.float64).reshape(-1, 2)
        image, _, sy, sx, nh, nw = ds._load_resized(im_id)
        rng_a = np.random.default_rng(42)
        rng_b = np.random.default_rng(42)
        img_host, den_host, mf_host = ds._mosaic(
            rng_a, im_id, image, dots, sy, sx, nh, nw
        )
        cell_ids, tops, lefts, lens, bl, pts, mf = ds._mosaic_params(
            rng_b, im_id, dots, sy, sx, nh, nw
        )
        assert mf == mf_host
        # dots: the host density's nonzero coords == the param dots
        ys, xs = np.nonzero(den_host)
        host_pts = sorted(zip(xs.tolist(), ys.tolist()))
        got_pts = sorted(map(tuple, pts.tolist()))
        assert got_pts == host_pts
        # pixels: device mosaic from the params == host mosaic image
        cj = jnp.asarray([store.index[c] for c in cell_ids])
        got_img = np.asarray(
            jax.jit(TS._mosaic_sample)(
                store.pixels, store.base[cj], store.width[cj],
                jnp.asarray(tops), jnp.asarray(lefts), jnp.asarray(lens),
                jnp.asarray(bl),
            )
        )
        np.testing.assert_allclose(got_img, img_host, atol=2e-5)


def test_store_step_end_to_end(store_fixture):
    """Full resident-store fine-tune step on the CPU mesh: finite loss,
    params move, batch is parameters-only."""
    from countr_tpu.config import CounTRConfig, TrainConfig
    from countr_tpu.data.fsc147 import TrainDataset
    from countr_tpu.data.loader import DataLoader
    from countr_tpu.engine.train import (
        init_train_state, make_optimizer, make_store_finetune_step,
    )
    from countr_tpu.models.countr import CounTR

    meta, store = store_fixture
    ds = TrainDataset(meta, seed=0, store_index=store.index)
    dl = DataLoader(ds, 4, shuffle=True, num_workers=0, drop_last=True, seed=0)
    batch = next(iter(dl.epoch(0)))
    for k in ("img_idx", "affine_C", "is_mosaic", "dots", "n_dots"):
        assert k in batch, k
    assert "image" not in batch and "image_u8" not in batch

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
    tcfg = TrainConfig(batch_size=4, epochs=2, warmup_epochs=0, lr=1e-4)
    tx, _ = make_optimizer(tcfg, 1, 4)
    state = init_train_state(params, tx)
    step = make_store_finetune_step(model, tcfg)
    dev_batch = {
        k: jnp.asarray(batch[k]) for k in (
            "img_idx", "affine_C", "affine_d", "is_mosaic", "cell_idx",
            "cell_top", "cell_left", "cell_len", "blend_l", "dots", "n_dots",
        )
    }
    leaves0 = [np.asarray(l).copy() for l in jax.tree.leaves(state.params)]
    state, m = step(state, store.arrays, dev_batch, jax.random.key(1), 3)
    state, m = step(state, store.arrays, dev_batch, jax.random.key(2), 3)
    assert np.isfinite(float(m["loss"]))
    leaves1 = [np.asarray(l) for l in jax.tree.leaves(state.params)]
    assert any(not np.allclose(a, b) for a, b in zip(leaves0, leaves1))


def test_store_step_sharded_matches_unsharded(store_fixture):
    """The resident fine-tune step over the 8-device mesh (pool
    replicated, geometry sharded on 'data') must produce the same loss
    and parameter update as the single-device run — the multi-chip
    resident training mode (reference equivalent: DDP-wrapped training,
    FSC_finetune_cross.py:229-231)."""
    from countr_tpu.config import CounTRConfig, TrainConfig
    from countr_tpu.data.fsc147 import TrainDataset
    from countr_tpu.data.loader import DataLoader
    from countr_tpu.engine.train import (
        init_train_state, make_optimizer, make_store_finetune_step,
    )
    from countr_tpu.models.countr import CounTR
    from countr_tpu.parallel.mesh import (
        batch_sharding, get_mesh, replicated_sharding,
    )

    meta, store = store_fixture
    import countr_tpu.engine.train_store as TS_mod

    mesh = get_mesh(8)
    bsh, rsh = batch_sharding(mesh), replicated_sharding(mesh)
    mstore = TS_mod.build_store(
        meta, list(store.ids), log=lambda *_: None, mesh=mesh
    )
    ds = TrainDataset(meta, seed=0, store_index=mstore.index)
    ds.set_epoch(1)
    items = [ds[i % len(ds)] for i in range(8)]
    keys = ("img_idx", "affine_C", "affine_d", "is_mosaic", "cell_idx",
            "cell_top", "cell_left", "cell_len", "blend_l", "dots", "n_dots")
    batch = {k: np.stack([np.asarray(s[k]) for s in items]) for k in keys}

    cfg = CounTRConfig(
        img_size=384, patch_size=16, embed_dim=32, depth=1, num_heads=2,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
        head_width=32,
    )
    model = CounTR(cfg)
    tcfg = TrainConfig(batch_size=8, epochs=2, warmup_epochs=0, lr=1e-4)
    tx, _ = make_optimizer(tcfg, 1, 8)
    step = make_store_finetune_step(model, tcfg)

    def run(sharded: bool):
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 384, 384, 3)),
            jnp.zeros((1, 3, 64, 64, 3)), 3,
        )["params"]
        st = init_train_state(params, tx)
        if sharded:
            st = jax.tree.map(lambda x: jax.device_put(x, rsh), st)
            dev = {k: jax.device_put(np.asarray(batch[k]), bsh) for k in keys}
            arrays = mstore.arrays
        else:
            dev = {k: jnp.asarray(batch[k]) for k in keys}
            arrays = store.arrays
        st, m = step(st, arrays, dev, jax.random.key(1), 3)
        return float(m["loss"]), jax.device_get(st.params)

    # the materialized pixels must be identical across placements
    mat = jax.jit(TS_mod.materialize_batch, static_argnums=(2,))
    img_1, box_1 = mat(
        store.arrays, {k: jnp.asarray(batch[k]) for k in keys[:9]}, None
    )
    img_8, box_8 = mat(
        mstore.arrays,
        {k: jax.device_put(batch[k], bsh) for k in keys[:9]}, None,
    )
    np.testing.assert_allclose(
        np.asarray(img_8), np.asarray(img_1), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(box_8), np.asarray(box_1), atol=2e-6
    )

    loss_1, params_1 = run(False)
    loss_8, params_8 = run(True)
    assert loss_8 == pytest.approx(loss_1, rel=1e-5)
    # after one AdamW step the update is +-lr*m/sqrt(v); where the
    # gradient is ~0 the cross-placement reduction-order noise can flip
    # the sign, so elementwise diffs are bounded by ~2*lr, not by float
    # noise — assert that bound (lr=1e-4)
    for a, b in zip(jax.tree.leaves(params_1), jax.tree.leaves(params_8)):
        np.testing.assert_allclose(a, b, atol=2.5e-4)


def test_pretrain_store_step_sharded(store_fixture):
    """Resident MAE pretrain step over the 8-device mesh: same loss as
    the single-device run."""
    import dataclasses

    from countr_tpu.config import MAE_PRESETS, TrainConfig
    from countr_tpu.data.fsc147 import PretrainDataset
    from countr_tpu.engine.train import (
        init_train_state, make_optimizer, make_store_pretrain_step,
    )
    from countr_tpu.models.mae import MaskedAutoencoderViT
    from countr_tpu.parallel.mesh import (
        batch_sharding, get_mesh, replicated_sharding,
    )

    meta, _ = store_fixture
    ids = list(meta.splits["train"])
    mesh = get_mesh(8)
    bsh, rsh = batch_sharding(mesh), replicated_sharding(mesh)
    p_plain = TS.build_pretrain_store(meta, ids, log=lambda *_: None)
    p_mesh = TS.build_pretrain_store(meta, ids, log=lambda *_: None, mesh=mesh)
    ds = PretrainDataset(meta, seed=0, store=p_plain)
    items = [ds[i % len(ds)] for i in range(8)]
    keys = ("img_idx", "crop_top", "crop_left", "crop_h", "crop_w",
            "transposed", "flip")
    batch = {k: np.stack([s[k] for s in items]) for k in keys}

    cfg = dataclasses.replace(
        MAE_PRESETS["mae_vit_base_patch16"], embed_dim=32, depth=1,
        num_heads=2, decoder_embed_dim=32, decoder_depth=1,
        decoder_num_heads=2,
    )
    model = MaskedAutoencoderViT(cfg)
    tcfg = TrainConfig(batch_size=8, epochs=2, warmup_epochs=0, lr=1e-4)
    tx, _ = make_optimizer(tcfg, 1, 8)
    step = make_store_pretrain_step(model, p_plain.max_w)

    def run(sharded: bool):
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 384, 384, 3)), jax.random.key(1)
        )["params"]
        st = init_train_state(params, tx)
        if sharded:
            st = jax.tree.map(lambda x: jax.device_put(x, rsh), st)
            dev = {k: jax.device_put(batch[k], bsh) for k in keys}
            arrays = p_mesh.arrays
        else:
            dev = {k: jnp.asarray(batch[k]) for k in keys}
            arrays = p_plain.arrays
        st, m = step(st, arrays, dev, jax.random.key(2))
        return float(m["loss"])

    assert run(True) == pytest.approx(run(False), rel=1e-5)


def test_materialize_mosaic_prefix_bucketing(store_fixture):
    """Sorted batch + bucketed n_mosaic == full materialization: the
    mosaic-prefix fast path (mosaic_bucket / sort_mosaic_first) must
    change nothing but the amount of wasted compute."""
    from countr_tpu.data.fsc147 import TrainDataset
    from countr_tpu.data.loader import DataLoader

    meta, store = store_fixture
    ds = TrainDataset(meta, seed=3, store_index=store.index)
    dl = DataLoader(ds, 4, shuffle=True, num_workers=0, drop_last=True, seed=3)
    mat = jax.jit(TS.materialize_batch, static_argnums=(2,))
    keys = ("img_idx", "affine_C", "affine_d", "is_mosaic", "cell_idx",
            "cell_top", "cell_left", "cell_len", "blend_l")
    seen_k = set()
    for epoch in range(8):
        batch = next(iter(dl.epoch(epoch)))
        srt, k = TS.sort_mosaic_first(batch)
        seen_k.add(min(k, 3))
        m = np.asarray(srt["is_mosaic"])
        assert (np.diff(m) <= 0).all(), "mosaic samples must form a prefix"
        assert k == int((m > 0).sum())
        nb = TS.mosaic_bucket(k, 4)
        assert nb >= k and nb in (0, 2, 4)
        dev = {kk: jnp.asarray(srt[kk]) for kk in keys}
        want_img, want_box = mat(store.arrays, dev, None)
        got_img, got_box = mat(store.arrays, dev, nb)
        np.testing.assert_array_equal(np.asarray(got_img), np.asarray(want_img))
        np.testing.assert_array_equal(np.asarray(got_box), np.asarray(want_box))
        if seen_k >= {0, 1, 2, 3}:
            break
    assert len(seen_k) >= 2, "fixture batches never varied mosaic count"


def test_mosaic_bucket_values():
    assert [TS.mosaic_bucket(k, 8) for k in range(9)] == [
        0, 2, 2, 4, 4, 8, 8, 8, 8]
    assert TS.mosaic_bucket(0, 3) == 0
    assert TS.mosaic_bucket(3, 3) == 3
    assert TS.mosaic_bucket(1, 1) == 1


# ---------------------------------------------------------------------------
# Pretrain resident store
# ---------------------------------------------------------------------------


def test_pretrain_store_bicubic_matches_pil(store_fixture):
    """Device RandomResizedCrop materialization == PIL crop+BICUBIC
    resize (PIL quantizes u8 filter weights to 8 bits -> tolerance)."""
    from PIL import Image as PILImage

    meta, _ = store_fixture
    ids = list(meta.splits["train"])
    pstore = TS.build_pretrain_store(meta, ids, log=lambda *_: None)

    for i, transposed_expected in [(0, False), (2, True)]:
        # fixture sizes: img_0 400x500 (landscape), img_2 500x420
        # (portrait: h>w -> stored transposed)
        assert bool(pstore.t_np[i]) == transposed_expected
        w = int(pstore.w_np[i])
        # reconstruct the stored image and the ORIGINAL-orientation one
        px = np.asarray(pstore.pixels)
        base = int(np.asarray(pstore.base)[i])
        # pool layout is column-major [w, 384]; logical layout is its
        # transpose (384 rows)
        stored = px[base : base + 384 * w].reshape(w, 384, 3).transpose(1, 0, 2)
        orig = stored.transpose(1, 0, 2) if transposed_expected else stored
        h0, w0 = orig.shape[:2]
        rng = np.random.default_rng(3)
        for flip in (0, 1):
            from countr_tpu.data.fsc147 import PretrainDataset

            top, left, ch, cw = PretrainDataset.sample_crop(rng, h0, w0)
            pil = PILImage.fromarray(orig).crop(
                (left, top, left + cw, top + ch)
            ).resize((384, 384), PILImage.BICUBIC)
            want = np.asarray(pil, np.float32) / 255.0
            if flip:
                want = want[:, ::-1]
            # device call with STORED-layout params
            if transposed_expected:
                b_top, b_left, b_ch, b_cw = left, top, cw, ch
            else:
                b_top, b_left, b_ch, b_cw = top, left, ch, cw
            batch = {
                "img_idx": jnp.asarray([i], jnp.int32),
                "crop_top": jnp.asarray([b_top], jnp.int32),
                "crop_left": jnp.asarray([b_left], jnp.int32),
                "crop_h": jnp.asarray([b_ch], jnp.int32),
                "crop_w": jnp.asarray([b_cw], jnp.int32),
                "transposed": jnp.asarray([int(transposed_expected)], jnp.int8),
                "flip": jnp.asarray([flip], jnp.int8),
            }
            got = np.asarray(
                jax.jit(TS.materialize_pretrain_batch, static_argnums=(2,))(
                    pstore.arrays, batch, pstore.max_w
                )
            )[0]
            assert np.abs(got - want).mean() < 4e-3, (i, flip)
            assert np.abs(got - want).max() < 0.06, (i, flip)


def test_pretrain_store_step(store_fixture):
    """Resident MAE pretrain step: finite loss on the CPU mesh."""
    import dataclasses

    from countr_tpu.config import MAE_PRESETS, TrainConfig
    from countr_tpu.data.fsc147 import PretrainDataset
    from countr_tpu.data.loader import DataLoader
    from countr_tpu.engine.train import (
        init_train_state, make_optimizer, make_store_pretrain_step,
    )
    from countr_tpu.models.mae import MaskedAutoencoderViT

    meta, _ = store_fixture
    pstore = TS.build_pretrain_store(
        meta, list(meta.splits["train"]), log=lambda *_: None
    )
    ds = PretrainDataset(meta, seed=0, store=pstore)
    dl = DataLoader(ds, 4, shuffle=True, num_workers=0, drop_last=True, seed=0)
    batch = next(iter(dl.epoch(0)))
    assert "image" not in batch and "crop_h" in batch

    cfg = dataclasses.replace(
        MAE_PRESETS["mae_vit_base_patch16"], embed_dim=32, depth=1,
        num_heads=2, decoder_embed_dim=32, decoder_depth=1,
        decoder_num_heads=2,
    )
    model = MaskedAutoencoderViT(cfg)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 384, 384, 3)), jax.random.key(1)
    )["params"]
    tcfg = TrainConfig(batch_size=4, epochs=2, warmup_epochs=0, lr=1e-4)
    tx, _ = make_optimizer(tcfg, 1, 4)
    state = init_train_state(params, tx)
    step = make_store_pretrain_step(model, pstore.max_w)
    dev = {k: jnp.asarray(batch[k]) for k in (
        "img_idx", "crop_top", "crop_left", "crop_h", "crop_w",
        "transposed", "flip",
    )}
    state, m = step(state, pstore.arrays, dev, jax.random.key(2))
    state, m = step(state, pstore.arrays, dev, jax.random.key(3))
    assert np.isfinite(float(m["loss"]))


def test_pipelined_step_matches_serial(store_fixture):
    """The software-pipelined resident step (train on carried batch k
    while materializing batch k+1 in the same program) must reproduce
    the serial step's loss/metric/param trajectory exactly — same
    pixels, photometric keys, and loss-mask key per batch."""
    from countr_tpu.config import CounTRConfig, TrainConfig
    from countr_tpu.data.fsc147 import TrainDataset
    from countr_tpu.data.loader import DataLoader
    from countr_tpu.engine.train import (
        init_train_state, make_optimizer, make_store_finetune_step,
        make_store_finetune_step_pipelined, make_store_materialize,
        make_store_train_phase,
    )
    from countr_tpu.models.countr import CounTR

    meta, store = store_fixture
    ds = TrainDataset(meta, seed=0, store_index=store.index)
    dl = DataLoader(ds, 4, shuffle=True, num_workers=0, drop_last=True, seed=0)
    gkeys = ("img_idx", "affine_C", "affine_d", "is_mosaic", "cell_idx",
             "cell_top", "cell_left", "cell_len", "blend_l", "dots", "n_dots")
    batches = []
    for ep in range(4):
        for b in dl.epoch(ep):
            batches.append({k: jnp.asarray(b[k]) for k in gkeys})
    assert len(batches) >= 3
    rngs = [jax.random.fold_in(jax.random.key(5), i) for i in range(len(batches))]
    shots = [3, 1, 0, 2][: len(batches)] + [3] * max(0, len(batches) - 4)

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
    tcfg = TrainConfig(batch_size=4, epochs=2, warmup_epochs=0, lr=1e-4)
    tx, _ = make_optimizer(tcfg, 1, 4)

    # serial trajectory
    st_a = init_train_state(jax.tree.map(jnp.copy, params), tx)
    step = make_store_finetune_step(model, tcfg)
    losses_a = []
    for b, r, s in zip(batches, rngs, shots):
        st_a, m = step(st_a, store.arrays, b, r, s)
        losses_a.append(float(m["loss"]))

    # pipelined trajectory: prime with batch 0, steps train k while
    # materializing k+1, drain the last carry with the train phase
    st_b = init_train_state(jax.tree.map(jnp.copy, params), tx)
    prime = make_store_materialize()
    pstep = make_store_finetune_step_pipelined(model, tcfg)
    train_phase = make_store_train_phase(model, tcfg)
    carry = prime(store.arrays, batches[0], rngs[0])
    losses_b = []
    for k in range(len(batches) - 1):
        st_b, m, carry = pstep(
            st_b, store.arrays, carry, batches[k + 1], rngs[k + 1], shots[k]
        )
        losses_b.append(float(m["loss"]))
    st_b, m = train_phase(st_b, carry, shots[len(batches) - 1])
    losses_b.append(float(m["loss"]))

    assert losses_a == pytest.approx(losses_b, rel=1e-4, abs=1e-7)
    # params track to float-fusion noise: the pipelined program fuses
    # materialization into the step program so per-op rounding can
    # differ by ~1 ulp in the pixels, which Adam's grad/sqrt(v)
    # normalization amplifies on a fresh random-init model (v ~ g^2 on
    # the first steps). The loss sequence above is the trajectory
    # proof; the param check only guards against a wrong-batch or
    # wrong-key wiring (which would diverge by whole percents).
    for a, b2 in zip(jax.tree.leaves(st_a.params), jax.tree.leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=0.05, atol=2e-4)

"""End-to-end learning dynamics: overfitting one batch must drive the
loss down sharply — validates grads, optimizer wiring, schedules, and
the frozen-encoder masking together."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from countr_tpu.config import CounTRConfig, MAEConfig, TrainConfig
from countr_tpu.engine.train import (
    init_train_state, make_finetune_step, make_optimizer, make_pretrain_step,
)
from countr_tpu.models.countr import CounTR
from countr_tpu.models.mae import MaskedAutoencoderViT

TINY = CounTRConfig(
    img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=4,
    decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4,
    head_width=32,
)


def test_finetune_overfits_one_batch(rng):
    model = CounTR(TINY)
    tcfg = TrainConfig(batch_size=4, epochs=1000, warmup_epochs=1, lr=2e-3)
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (4, 3, 64, 64, 3)), jnp.float32)
    # fittable smooth target (iid noise would bottom out at its variance)
    yy, xx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64), indexing="ij")
    gt = jnp.asarray(
        np.broadcast_to((np.sin(6 * xx) * np.cos(4 * yy) + 1.2)[None], (4, 64, 64)),
        jnp.float32,
    )
    batch = {"image": imgs, "gt_density": gt, "boxes": boxes}

    params = model.init(jax.random.key(0), imgs, boxes, 3)["params"]
    tx, _ = make_optimizer(tcfg, steps_per_epoch=1, world_batch=4,
                           freeze_encoder=True)
    state = init_train_state(params, tx)
    step = make_finetune_step(model, tcfg)

    losses = []
    for i in range(60):
        state, m = step(state, batch, jax.random.key(7), 3)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[1] * 0.5, (losses[1], losses[-1])
    assert np.isfinite(losses[-1])


def test_mae_overfits_one_batch(rng):
    cfg = MAEConfig(
        img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=4,
        decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4,
    )
    model = MaskedAutoencoderViT(cfg)
    tcfg = TrainConfig(batch_size=4, epochs=100, warmup_epochs=1, lr=1e-3)
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.key(0), imgs, jax.random.key(1))["params"]
    tx, _ = make_optimizer(tcfg, steps_per_epoch=1, world_batch=4)
    state = init_train_state(params, tx)
    step = make_pretrain_step(model)
    losses = []
    for i in range(60):
        state, m = step(state, imgs, jax.random.key(5))  # fixed mask
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[1] * 0.5, (losses[1], losses[-1])


def test_mae_loss_variants(rng):
    """norm_pix_loss and masked_loss change the objective value."""
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    base_cfg = MAEConfig(
        img_size=64, patch_size=16, embed_dim=64, depth=1, num_heads=4,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=4,
    )
    m0 = MaskedAutoencoderViT(base_cfg)
    p = m0.init(jax.random.key(0), imgs, jax.random.key(1))
    l0, _, _ = m0.apply(p, imgs, jax.random.key(2))

    m_np = MaskedAutoencoderViT(dataclasses.replace(base_cfg, norm_pix_loss=True))
    l_np, _, _ = m_np.apply(p, imgs, jax.random.key(2))
    assert float(l_np) != pytest.approx(float(l0))

    m_masked = MaskedAutoencoderViT(base_cfg, masked_loss=True)
    l_m, pred, mask = m_masked.apply(p, imgs, jax.random.key(2))
    # masked mean over half the patches differs from the all-patch mean
    assert float(l_m) != pytest.approx(float(l0))
    # reference relation: all-patch mean = masked*0.5 + visible*0.5
    from countr_tpu.models.mae import patchify

    target = np.asarray(patchify(imgs, 16))
    per_patch = np.mean((np.asarray(pred) - target) ** 2, -1)
    mk = np.asarray(mask)
    masked_mean = (per_patch * mk).sum() / mk.sum()
    assert float(l_m) == pytest.approx(masked_mean, rel=1e-5)

"""Training engine units: LR schedule parity, decay mask, optimizer
step, encoder transfer."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from countr_tpu.config import CounTRConfig, MAEConfig, TrainConfig
from countr_tpu.engine.schedule import warmup_cosine
from countr_tpu.engine.train import (
    decay_mask, init_train_state, make_finetune_step, make_optimizer,
    make_pretrain_step, transfer_encoder,
)
from countr_tpu.models.countr import CounTR
from countr_tpu.models.mae import MaskedAutoencoderViT

TINY = CounTRConfig(
    img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=4,
    decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=4,
    head_width=32,
)


def _reference_lr(epoch_float, lr, min_lr, epochs, warmup):
    """Direct transcription of the reference formula
    (util/lr_sched.py:9-21)."""
    if epoch_float < warmup:
        return lr * epoch_float / warmup
    return min_lr + (lr - min_lr) * 0.5 * (
        1.0 + math.cos(math.pi * (epoch_float - warmup) / (epochs - warmup))
    )


def test_schedule_matches_reference():
    sched = warmup_cosine(1e-3, epochs=100, warmup_epochs=10,
                          steps_per_epoch=50, min_lr=1e-6)
    for step in [0, 1, 250, 499, 500, 501, 2500, 4999]:
        want = _reference_lr(step / 50, 1e-3, 1e-6, 100, 10)
        # schedule math runs in fp32 on device
        assert float(sched(step)) == pytest.approx(want, rel=1e-4, abs=1e-9), step


def test_decay_mask_groups():
    model = CounTR(TINY)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 3, 64, 64, 3)), 1,
    )["params"]
    mask = decay_mask(params)
    # kernels decay, biases/norm scales/shot_token don't
    assert mask["decoder_embed"]["kernel"] is True
    assert mask["decoder_embed"]["bias"] is False
    assert mask["norm"]["scale"] is False
    assert mask["shot_token"] is False
    assert mask["exemplar_encoder"]["conv1"]["kernel"] is True


def test_finetune_step_updates_decoder_only():
    model = CounTR(TINY)
    tcfg = TrainConfig(batch_size=2, epochs=2, warmup_epochs=1)
    params = model.init(
        jax.random.key(0), jnp.zeros((2, 64, 64, 3)),
        jnp.zeros((2, 3, 64, 64, 3)), 2,
    )["params"]
    tx, _ = make_optimizer(tcfg, steps_per_epoch=2, world_batch=2,
                           freeze_encoder=True)
    state = init_train_state(params, tx)
    before = jax.device_get(params)  # state buffers are donated by the step
    batch = {
        "image": jnp.ones((2, 64, 64, 3)) * 0.4,
        "gt_density": jnp.ones((2, 64, 64)) * 0.1,
        "boxes": jnp.ones((2, 3, 64, 64, 3)) * 0.3,
    }
    step = make_finetune_step(model, tcfg)
    # two steps: the warmup LR is exactly 0 at step 0 (reference
    # formula), so the first update is a no-op by construction
    new_state, m = step(state, batch, jax.random.key(1), 2)
    new_state, m = step(new_state, batch, jax.random.key(2), 2)
    assert float(m["loss"]) > 0 and np.isfinite(float(m["loss"]))
    assert int(new_state.step) == 2
    # frozen encoder params unchanged; decoder params changed
    after = jax.device_get(new_state.params)
    same = jax.tree.map(
        lambda a, b: bool(np.array_equal(a, b)),
        before["blocks_0"], after["blocks_0"],
    )
    assert all(jax.tree.leaves(same))
    assert not np.array_equal(
        before["decoder_embed"]["kernel"], after["decoder_embed"]["kernel"]
    )


def test_pretrain_step_runs():
    cfg = MAEConfig(
        img_size=64, patch_size=16, embed_dim=64, depth=1, num_heads=4,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=4,
    )
    model = MaskedAutoencoderViT(cfg)
    params = model.init(
        jax.random.key(0), jnp.zeros((2, 64, 64, 3)), jax.random.key(1)
    )["params"]
    tcfg = TrainConfig(batch_size=2, epochs=2, warmup_epochs=1)
    tx, _ = make_optimizer(tcfg, steps_per_epoch=2, world_batch=2)
    state = init_train_state(params, tx)
    step = make_pretrain_step(model)
    imgs = jnp.ones((2, 64, 64, 3)) * 0.5
    s1, m1 = step(state, imgs, jax.random.key(2))
    s2, m2 = step(s1, imgs, jax.random.key(3))
    assert np.isfinite(float(m2["loss"]))
    assert int(s2.step) == 2


def test_transfer_encoder():
    cm = CounTR(TINY)
    cp = cm.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 3, 64, 64, 3)), 1,
    )
    mae_cfg = MAEConfig(
        img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=4,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=4,
    )
    mm = MaskedAutoencoderViT(mae_cfg)
    mp = mm.init(jax.random.key(7), jnp.zeros((1, 64, 64, 3)), jax.random.key(1))
    out = transfer_encoder(mp, cp, depth=2)
    np.testing.assert_array_equal(
        out["params"]["blocks_1"]["attn"]["qkv"]["kernel"],
        mp["params"]["blocks_1"]["attn"]["qkv"]["kernel"],
    )
    # decoder stays from the counting model
    np.testing.assert_array_equal(
        out["params"]["decoder_embed"]["kernel"],
        cp["params"]["decoder_embed"]["kernel"],
    )

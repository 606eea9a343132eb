"""Gradient accumulation (optax.MultiSteps wrapping the frozen-encoder
multi_transform) — reference accum_iter semantics
(FSC_finetune_cross.py:312-315): params change only every accum_iter
micro-steps."""

import jax
import jax.numpy as jnp
import numpy as np

from countr_tpu.config import CounTRConfig, TrainConfig
from countr_tpu.engine.train import (
    init_train_state, make_finetune_step, make_optimizer,
)
from countr_tpu.models.countr import CounTR

TINY = CounTRConfig(
    img_size=64, patch_size=16, embed_dim=32, depth=1, num_heads=2,
    decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
    head_width=32,
)


def test_accum_iter_updates_every_k_steps(rng):
    model = CounTR(TINY)
    tcfg = TrainConfig(batch_size=2, epochs=10, warmup_epochs=0, lr=1e-3,
                       accum_iter=2)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (2, 3, 64, 64, 3)), jnp.float32)
    gt = jnp.ones((2, 64, 64)) * 0.5
    batch = {"image": imgs, "gt_density": gt, "boxes": boxes}
    params = model.init(jax.random.key(0), imgs, boxes, 1)["params"]
    tx, _ = make_optimizer(tcfg, steps_per_epoch=2, world_batch=2,
                           freeze_encoder=True)
    state = init_train_state(params, tx)
    step = make_finetune_step(model, tcfg)

    def snap(s):
        return np.asarray(jax.device_get(s.params["decoder_embed"]["kernel"]))

    p0 = snap(state)
    state, _ = step(state, batch, jax.random.key(1), 1)
    p1 = snap(state)  # first micro-step: grads accumulated, no update
    np.testing.assert_array_equal(p0, p1)
    state, _ = step(state, batch, jax.random.key(2), 1)
    p2 = snap(state)  # second micro-step: optimizer applies
    assert not np.array_equal(p1, p2)

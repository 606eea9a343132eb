"""Per-step warmup + half-cycle cosine LR schedule.

Matches the reference's fractional-epoch semantics
(reference: util/lr_sched.py:9-21, called per accumulation step at
FSC_finetune_cross.py:270-271 with epoch_float = step/steps_per_epoch
+ epoch): linear warmup to ``lr`` over ``warmup_epochs``, then
min_lr + (lr - min_lr) * 0.5 * (1 + cos(pi * progress)).
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine(
    lr: float,
    *,
    epochs: int,
    warmup_epochs: int,
    steps_per_epoch: int,
    min_lr: float = 0.0,
):
    """Returns an optax-compatible schedule fn: step -> lr."""

    def schedule(step):
        e = step / steps_per_epoch  # fractional epoch
        warm = lr * e / jnp.maximum(warmup_epochs, 1e-8)
        progress = (e - warmup_epochs) / jnp.maximum(epochs - warmup_epochs, 1e-8)
        cos = min_lr + (lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(e < warmup_epochs, warm, cos)

    return schedule

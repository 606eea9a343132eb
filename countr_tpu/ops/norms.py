"""Normalization ops, functional, NHWC layouts.

Numerics match the reference's torch modules:
- LayerNorm(eps=1e-6) over the channel dim (reference:
  models_mae_cross.py:214 — partial(nn.LayerNorm, eps=1e-6)).
- GroupNorm(8, 256) with affine, eps=1e-5 (reference:
  models_mae_cross.py:80-100 density head).
- InstanceNorm2d with affine=False, eps=1e-5 and no running stats —
  torch defaults (reference: models_mae_cross.py:47-71 exemplar CNN).

All statistics are computed in fp32 regardless of compute dtype, then
cast back — on TPU the VPU does this at full rate and it keeps bf16
runs stable.
"""

from __future__ import annotations

import jax.numpy as jnp


def _normalize(x: jnp.ndarray, axes, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
    return (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))


def layer_norm(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """LayerNorm over the last dim. x: [..., C]; scale/bias: [C]."""
    y = _normalize(x, axes=-1, eps=eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm on NHWC input. x: [N, H, W, C]; scale/bias: [C].

    Statistics are per (sample, group) over (H, W, C/G), matching
    torch.nn.GroupNorm on the NCHW equivalent.
    """
    n, h, w, c = x.shape
    g = num_groups
    xg = x.reshape(n, h, w, g, c // g)
    y = _normalize(xg, axes=(1, 2, 4), eps=eps).reshape(n, h, w, c)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm (affine=False) on NHWC input: per (sample, channel)
    statistics over (H, W)."""
    y = _normalize(x, axes=(1, 2), eps=eps)
    return y.astype(x.dtype)

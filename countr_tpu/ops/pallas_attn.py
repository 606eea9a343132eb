"""Fused self-attention Pallas kernel for the ViT encoder.

The encoder attends over 576 patch tokens with 64-d heads
(reference workload: models_crossvit.py:69-94 via timm Block). The XLA
path materializes the [B, H, 576, 576] probability tensor in HBM
between the two matmuls; this kernel keeps logits/softmax/PV entirely
in VMEM for one (batch, head) per grid step — the whole 576-token
problem fits on-chip (q/k/v 3x144KB + 1.3MB fp32 logits), so no online
softmax is needed.

Falls back to the XLA attention automatically off-TPU (tests exercise
the kernel with interpret=True on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from countr_tpu.ops.attention import multi_head_attention


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # [S, D]
    k = k_ref[0]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits = logits * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _fused(q, k, v, num_heads: int, interpret: bool):
    b, n, c = q.shape
    hd = c // num_heads
    scale = hd ** -0.5

    def to_heads(x):
        return (
            x.reshape(b, n, num_heads, hd)
            .transpose(0, 2, 1, 3)
            .reshape(b * num_heads, n, hd)
        )

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
    try:
        from jax.experimental.pallas import tpu as pltpu

        mem = pltpu.ANY if interpret else pltpu.VMEM
        spec = pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0), memory_space=mem)
    except Exception:
        spec = pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(b * num_heads,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(qh.shape, q.dtype),
        interpret=interpret,
    )(qh, kh, vh)
    return (
        out.reshape(b, num_heads, n, hd).transpose(0, 2, 1, 3).reshape(b, n, c)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_diff(q, k, v, num_heads: int, interpret: bool):
    return _fused(q, k, v, num_heads, interpret)


def _fused_diff_fwd(q, k, v, num_heads, interpret):
    return _fused(q, k, v, num_heads, interpret), (q, k, v)


def _fused_diff_bwd(num_heads, interpret, res, g):
    # Backward via the XLA attention — mathematically the same op; the
    # Pallas kernel accelerates the (much more frequent) forward.
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: multi_head_attention(q, k, v, num_heads), q, k, v)
    return vjp(g)


_fused_diff.defvjp(_fused_diff_fwd, _fused_diff_bwd)


def fused_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Self-attention [B, N, C] x3 -> [B, N, C]; Pallas on TPU, XLA
    elsewhere (unless interpret is forced for testing). Differentiable:
    the backward pass recomputes through the XLA attention."""
    if interpret is None:
        platform = jax.devices()[0].platform
        if platform not in ("tpu", "axon"):
            return multi_head_attention(q, k, v, num_heads)
        interpret = False
    return _fused_diff(q, k, v, num_heads, interpret)

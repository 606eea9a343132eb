"""Fused self-attention Pallas kernel for the ViT encoder/decoder.

The encoder attends over 576 patch tokens with 64-d heads
(reference workload: models_crossvit.py:69-94 via timm Block). The XLA
path materializes the [B, H, 576, 576] probability tensor in HBM
between the two matmuls; this kernel keeps logits/softmax/PV entirely
in VMEM. One grid step processes ONE batch element with every head
statically unrolled inside the kernel (q/k/v blocks are [N, C] lane
slices — no [B,H,N,D] head transposes ever materialize in HBM, and the
grid is B steps instead of B*H, which removed ~40% of the kernel's
wall time at the bench shape: grid-step overhead dominated the tiny
per-(batch,head) dots of the previous layout).

VMEM budget per step (encoder, N=576, C=768, bf16): q/k/v/out blocks
4 x 864 KB + one [576, 576] fp32 logits tile 1.3 MB, well under 16 MB
with double buffering.

Falls back to the XLA attention automatically off-TPU (tests exercise
the kernel with interpret=True on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from countr_tpu.ops.attention import multi_head_attention


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int, scale: float):
    bb = q_ref.shape[0]
    hd = q_ref.shape[-1] // num_heads
    # softmax in base 2: exp(s*l) == exp2(s*log2(e)*l), so log2(e) folds
    # into the static scale and the VPU skips one multiply per logit.
    scale2 = scale * 1.4426950408889634
    for bi in range(bb):  # static unroll over the block's batch elems
        for h in range(num_heads):  # static unroll; hd-aligned lane slices
            sl = slice(h * hd, (h + 1) * hd)
            q = q_ref[bi, :, sl]  # [N, hd]
            k = k_ref[bi, :, sl]
            v = v_ref[bi, :, sl]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            logits = logits * scale2
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp2(logits - m)
            s = jnp.sum(p, axis=-1, keepdims=True)
            # Normalize AFTER the PV dot: dividing the [N, hd] output is
            # hd/N times the work of dividing the [N, N] probabilities.
            out = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[bi, :, sl] = (out / s).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _fused(q, k, v, num_heads: int, interpret: bool, block_b: int = 1):
    b, n, c = q.shape
    hd = c // num_heads
    scale = hd ** -0.5
    while b % block_b:
        block_b //= 2
    kwargs = {}
    try:
        from jax.experimental.pallas import tpu as pltpu

        mem = pl.ANY if interpret else pltpu.VMEM
        spec = pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0), memory_space=mem)
        if not interpret:
            # The head-unrolled kernel's scoped stack slightly exceeds
            # the 16 MB default; v5e has 128 MB of physical VMEM.
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024
            )
    except Exception:
        spec = pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads, scale=scale),
        grid=(b // block_b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
        **kwargs,
    )(q, k, v)


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
    *, num_heads: int, scale: float,
):
    """Recompute-P attention backward, entirely in VMEM.

    The XLA VJP of this op materializes three [B, H, N, N] fp32
    tensors in HBM (the recomputed probabilities P, dP, and dS); at
    the decoder's shapes (6 blocks x [8, 16, 576, 576]) that made the
    decoder backward 7x its forward (docs/PROFILE.md). Here each
    (batch, head) recomputes its [N, N] tile and consumes it in place.
    """
    bb = q_ref.shape[0]
    hd = q_ref.shape[-1] // num_heads
    for bi in range(bb):  # static unroll, mirroring the forward kernel
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            q = q_ref[bi, :, sl]  # [N, hd]
            k = k_ref[bi, :, sl]
            v = v_ref[bi, :, sl]
            g = g_ref[bi, :, sl]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            logits = logits * scale
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            pn = p / jnp.sum(p, axis=-1, keepdims=True)  # [N, N] fp32
            pc = pn.astype(v.dtype)
            # dV = P^T dO
            dv = jax.lax.dot_general(
                pc, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            # dP = dO V^T
            dp = jax.lax.dot_general(
                g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            # dS = P * (dP - rowsum(dP * P)); the softmax-Jacobian row
            # correction. scale folds in here so dQ/dK are plain dots.
            d = jnp.sum(dp * pn, axis=-1, keepdims=True)
            ds = ((dp - d) * pn * scale).astype(q.dtype)
            dq = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dq_ref[bi, :, sl] = dq.astype(dq_ref.dtype)
            dk_ref[bi, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[bi, :, sl] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _fused_bwd(q, k, v, g, num_heads: int, interpret: bool, block_b: int = 1):
    b, n, c = q.shape
    hd = c // num_heads
    scale = hd ** -0.5
    while b % block_b:
        block_b //= 2
    kwargs = {}
    try:
        from jax.experimental.pallas import tpu as pltpu

        mem = pl.ANY if interpret else pltpu.VMEM
        spec = pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0), memory_space=mem)
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            )
    except Exception:
        spec = pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0))
    shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, num_heads=num_heads, scale=scale),
        grid=(b // block_b,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
        **kwargs,
    )(q, k, v, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_diff(q, k, v, num_heads: int, interpret: bool):
    return _fused(q, k, v, num_heads, interpret)


def _fused_diff_fwd(q, k, v, num_heads, interpret):
    return _fused(q, k, v, num_heads, interpret), (q, k, v)


def _fused_diff_bwd(num_heads, interpret, res, g):
    q, k, v = res
    return _fused_bwd(q, k, v, g, num_heads, interpret)


_fused_diff.defvjp(_fused_diff_fwd, _fused_diff_bwd)


def fused_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Self-attention [B, N, C] x3 -> [B, N, C]; Pallas on TPU, XLA
    elsewhere (unless interpret is forced for testing). Differentiable:
    the backward is its own recompute-P Pallas kernel (no [B, H, N, N]
    tensor ever touches HBM in either direction)."""
    if interpret is None:
        platform = jax.devices()[0].platform
        if platform not in ("tpu", "axon"):
            return multi_head_attention(q, k, v, num_heads)
        interpret = False
    return _fused_diff(q, k, v, num_heads, interpret)

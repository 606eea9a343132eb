"""Multi-head attention core (XLA path).

Used for both encoder self-attention (576 image tokens, reference:
models_crossvit.py:69-94 / timm Block) and decoder cross-attention
(576 queries over <=3 exemplar tokens, reference:
models_crossvit.py:96-128). Softmax is computed in fp32; the matmuls
take the compute dtype so the MXU runs bf16 when requested. A fused
Pallas kernel for the encoder path lives in
countr_tpu.ops.pallas_attn and is selected by model config.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def matmul_precision(dtype) -> jax.lax.Precision:
    """fp32 compute -> HIGHEST (exact parity with the fp32 reference
    test path); bf16 compute -> DEFAULT (single-pass MXU)."""
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(dtype) == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    scale: float | None = None,
    precision: jax.lax.Precision | None = None,
) -> jnp.ndarray:
    """Scaled-dot-product attention over projected q/k/v.

    q: [B, Nq, C]; k, v: [B, Nk, C]. Returns [B, Nq, C] (heads merged,
    before the output projection). ``scale`` defaults to head_dim**-0.5
    (reference: models_crossvit.py:75,102).
    """
    b, nq, c = q.shape
    nk = k.shape[1]
    hd = c // num_heads
    if scale is None:
        scale = hd ** -0.5

    qh = q.reshape(b, nq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, nk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, nk, num_heads, hd).transpose(0, 2, 1, 3)

    if precision is None:
        precision = matmul_precision(q.dtype)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk",
        qh,
        kh,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    logits = logits * jnp.float32(scale)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs.astype(v.dtype),
        vh,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return out.transpose(0, 2, 1, 3).reshape(b, nq, c).astype(q.dtype)


def cross_attention_smallk(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    precision: jax.lax.Precision | None = None,
) -> jnp.ndarray:
    """Attention specialized for few key/value tokens (the interaction
    decoder attends 576 queries over <=3 exemplar tokens, reference:
    models_crossvit.py:96-128).

    Same math as :func:`multi_head_attention` but with the head dim
    kept in place — no [B,H,N,D] transposes are materialized for what
    amounts to a handful of weighted sums, which matters when nk is
    tiny and the op is layout-bound rather than FLOP-bound.
    """
    b, nq, c = q.shape
    nk = k.shape[1]
    hd = c // num_heads
    scale = hd ** -0.5
    if precision is None:
        precision = matmul_precision(q.dtype)
    qh = q.reshape(b, nq, num_heads, hd)
    kh = k.reshape(b, nk, num_heads, hd)
    vh = v.reshape(b, nk, num_heads, hd)
    logits = jnp.einsum(
        "bqhd,bkhd->bqhk", qh, kh,
        preferred_element_type=jnp.float32, precision=precision,
    )
    logits = logits * jnp.float32(scale)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bqhk,bkhd->bqhd", probs.astype(v.dtype), vh,
        preferred_element_type=jnp.float32, precision=precision,
    )
    return out.reshape(b, nq, c).astype(q.dtype)

"""Fused attention half-block Pallas kernel (TPU).

Computes ``x + proj(MHA(qkv(LayerNorm(x))))`` — the entire attention
residual branch of a pre-norm transformer block — in ONE kernel.

Why: with the standalone Pallas LN and attention kernels, each block's
attention branch materializes four intermediates in HBM (LN output,
fused qkv, attention output, projection output) because custom calls
are fusion barriers for XLA. At the encoder bench shape
([32, 576, 768] bf16, 28 MB per tensor) that is ~450 MB of avoidable
HBM traffic per block across 12 encoder + 6 decoder blocks. This
kernel reads x once, keeps LN/qkv/logits/softmax/PV/proj entirely in
VMEM (weights stay resident across grid steps — constant index map),
and writes only the post-residual stream.

Numerics match the unfused path op-for-op: fp32 LN statistics and
affine, bf16 matmul operands with fp32 MXU accumulation, bf16 bias
adds and residual. Differentiable via custom VJP: the backward
recomputes LN/qkv in XLA and reuses the recompute-P attention backward
kernel (ops/pallas_attn._fused_bwd), so no [B, H, N, N] tensor touches
HBM in either direction and weight grads come back fp32.

reference semantics: timm 0.4 Block attention branch
(reference: models_crossvit.py:69-94, 130-156 — LN eps 1e-6, fused
qkv with bias, per-head softmax(QK^T/sqrt(hd))V, linear proj).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from countr_tpu.ops.attention import multi_head_attention
from countr_tpu.ops.norms import layer_norm as xla_layer_norm
from countr_tpu.ops.pallas_attn import _fused, _fused_bwd


def _attn_block_kernel(
    x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    o_ref, *, num_heads: int, eps: float,
):
    bb = x_ref.shape[0]
    c = x_ref.shape[-1]
    hd = c // num_heads
    # base-2 softmax: log2(e) folds into the static scale (one VPU
    # multiply per logit saved; softmax value is identical).
    scale = hd ** -0.5 * 1.4426950408889634
    f32 = jnp.float32
    for bi in range(bb):  # static unroll over the block's batch elems
        x = x_ref[bi]  # [N, C] bf16
        x32 = x.astype(f32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        xn32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
        xn32 = xn32 * lns_ref[...].astype(f32) + lnb_ref[...].astype(f32)
        xn = xn32.astype(x.dtype)
        qkv = jax.lax.dot_general(
            xn, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(x.dtype) + bqkv_ref[...].astype(x.dtype)
        heads = []
        for h in range(num_heads):  # static unroll; hd-aligned lane slices
            q = qkv[:, h * hd:(h + 1) * hd]
            k = qkv[:, c + h * hd:c + (h + 1) * hd]
            v = qkv[:, 2 * c + h * hd:2 * c + (h + 1) * hd]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )
            logits = logits * scale
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp2(logits - m)
            s = jnp.sum(p, axis=-1, keepdims=True)
            # Normalize AFTER the PV dot (hd/N times the divide work).
            out = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            heads.append((out / s).astype(x.dtype))
        att = jnp.concatenate(heads, axis=-1)  # [N, C]
        y = jax.lax.dot_general(
            att, wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(x.dtype) + bproj_ref[...].astype(x.dtype)
        o_ref[bi] = x + y


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10))
def _fused_block(
    x, lns, lnb, wqkv, bqkv, wproj, bproj,
    num_heads: int, eps: float, interpret: bool, block_b: int = 1,
):
    b, n, c = x.shape
    cd = x.dtype
    wqkv_c, bqkv_c = wqkv.astype(cd), bqkv.astype(cd)
    wproj_c, bproj_c = wproj.astype(cd), bproj.astype(cd)
    while b % block_b:
        block_b //= 2
    kwargs = {}
    try:
        from jax.experimental.pallas import tpu as pltpu

        mem = pl.ANY if interpret else pltpu.VMEM
        xspec = pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0), memory_space=mem)
        vspec = lambda d: pl.BlockSpec(  # noqa: E731
            (d,), lambda i: (0,), memory_space=mem
        )
        mspec = lambda r, co: pl.BlockSpec(  # noqa: E731
            (r, co), lambda i: (0, 0), memory_space=mem
        )
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            )
    except Exception:
        xspec = pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0))
        vspec = lambda d: pl.BlockSpec((d,), lambda i: (0,))  # noqa: E731
        mspec = lambda r, co: pl.BlockSpec((r, co), lambda i: (0, 0))  # noqa: E731
    return pl.pallas_call(
        functools.partial(_attn_block_kernel, num_heads=num_heads, eps=eps),
        grid=(b // block_b,),
        in_specs=[
            xspec, vspec(c), vspec(c), mspec(c, 3 * c), vspec(3 * c),
            mspec(c, c), vspec(c),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        **kwargs,
    )(x, lns.astype(jnp.float32), lnb.astype(jnp.float32),
      wqkv_c, bqkv_c, wproj_c, bproj_c)


def _unfused_reference(x, lns, lnb, wqkv, bqkv, wproj, bproj, num_heads, eps):
    """XLA composition with op-for-op identical numerics (CPU fallback
    and the recompute spine of the backward)."""
    cd = x.dtype
    xn = xla_layer_norm(x, lns, lnb, eps=eps)
    qkv = (
        jnp.einsum("bnc,cd->bnd", xn, wqkv.astype(cd)) + bqkv.astype(cd)
    )
    q, k, v = jnp.split(qkv, 3, axis=-1)
    att = multi_head_attention(q, k, v, num_heads)
    y = jnp.einsum("bnc,cd->bnd", att, wproj.astype(cd)) + bproj.astype(cd)
    return x + y


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_block_diff(
    x, lns, lnb, wqkv, bqkv, wproj, bproj, num_heads, eps, interpret
):
    return _fused_block(
        x, lns, lnb, wqkv, bqkv, wproj, bproj, num_heads, eps, interpret
    )


def _fused_block_fwd(x, lns, lnb, wqkv, bqkv, wproj, bproj, nh, eps, interp):
    out = _fused_block(x, lns, lnb, wqkv, bqkv, wproj, bproj, nh, eps, interp)
    return out, (x, lns, lnb, wqkv, bqkv, wproj, bproj)


def _fused_block_bwd(num_heads, eps, interpret, res, g):
    x, lns, lnb, wqkv, bqkv, wproj, bproj = res
    cd = x.dtype
    f32 = jnp.float32
    b, n, c = x.shape
    # Recompute the branch forward (LN + qkv in XLA, attention via the
    # Pallas forward kernel — cheap relative to the [N, N] recompute the
    # attention backward does anyway).
    xn, ln_vjp = jax.vjp(
        lambda xx, s, bb_: xla_layer_norm(xx, s, bb_, eps=eps), x, lns, lnb
    )
    qkv = jnp.einsum("bnc,cd->bnd", xn, wqkv.astype(cd)) + bqkv.astype(cd)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if interpret or jax.devices()[0].platform not in ("tpu", "axon"):
        att = multi_head_attention(q, k, v, num_heads)
        _, attn_vjp = jax.vjp(
            lambda q_, k_, v_: multi_head_attention(q_, k_, v_, num_heads),
            q, k, v,
        )
        attn_bwd = attn_vjp
    else:
        att = _fused(q, k, v, num_heads, interpret)
        attn_bwd = lambda gg: _fused_bwd(  # noqa: E731
            q, k, v, gg, num_heads, interpret
        )
    gf = g
    # proj: y = att @ wproj + bproj  (weights held fp32, cast at use —
    # grads accumulate fp32 like flax Dense's cast-through VJP)
    datt = jnp.einsum("bnd,cd->bnc", gf, wproj.astype(cd))
    dwproj = jnp.einsum(
        "bnc,bnd->cd", att.astype(f32), gf.astype(f32)
    ).astype(wproj.dtype)
    dbproj = jnp.sum(gf.astype(f32), axis=(0, 1)).astype(bproj.dtype)
    dq, dk, dv = attn_bwd(datt)
    dqkv = jnp.concatenate(
        [dq.astype(cd), dk.astype(cd), dv.astype(cd)], axis=-1
    )
    dxn = jnp.einsum("bnd,cd->bnc", dqkv, wqkv.astype(cd))
    dwqkv = jnp.einsum(
        "bnc,bnd->cd", xn.astype(f32), dqkv.astype(f32)
    ).astype(wqkv.dtype)
    dbqkv = jnp.sum(dqkv.astype(f32), axis=(0, 1)).astype(bqkv.dtype)
    dx_ln, dlns, dlnb = ln_vjp(dxn)
    dx = g + dx_ln
    return dx, dlns, dlnb, dwqkv, dbqkv, dwproj, dbproj


_fused_block_diff.defvjp(_fused_block_fwd, _fused_block_bwd)


def _mlp_block_kernel(
    x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    *, eps: float, approx_gelu: bool,
):
    bb = x_ref.shape[0]
    f32 = jnp.float32
    for bi in range(bb):
        x = x_ref[bi]  # [N, C]
        x32 = x.astype(f32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        xn32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
        xn32 = xn32 * lns_ref[...].astype(f32) + lnb_ref[...].astype(f32)
        xn = xn32.astype(x.dtype)
        h = jax.lax.dot_general(
            xn, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(x.dtype) + b1_ref[...].astype(x.dtype)
        if approx_gelu:
            h = jax.nn.gelu(h, approximate=True)
        else:
            h = jax.nn.gelu(h.astype(f32), approximate=False).astype(x.dtype)
        y = jax.lax.dot_general(
            h, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(x.dtype) + b2_ref[...].astype(x.dtype)
        o_ref[bi] = x + y


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10))
def _fused_mlp(
    x, lns, lnb, w1, b1, w2, b2,
    eps: float, approx_gelu: bool, interpret: bool, block_b: int = 1,
):
    b, n, c = x.shape
    hid = w1.shape[1]
    cd = x.dtype
    while b % block_b:
        block_b //= 2
    kwargs = {}
    try:
        from jax.experimental.pallas import tpu as pltpu

        mem = pl.ANY if interpret else pltpu.VMEM
        xspec = pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0), memory_space=mem)
        vspec = lambda d: pl.BlockSpec(  # noqa: E731
            (d,), lambda i: (0,), memory_space=mem
        )
        mspec = lambda r, co: pl.BlockSpec(  # noqa: E731
            (r, co), lambda i: (0, 0), memory_space=mem
        )
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024
            )
    except Exception:
        xspec = pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0))
        vspec = lambda d: pl.BlockSpec((d,), lambda i: (0,))  # noqa: E731
        mspec = lambda r, co: pl.BlockSpec((r, co), lambda i: (0, 0))  # noqa: E731
    return pl.pallas_call(
        functools.partial(_mlp_block_kernel, eps=eps, approx_gelu=approx_gelu),
        grid=(b // block_b,),
        in_specs=[
            xspec, vspec(c), vspec(c), mspec(c, hid), vspec(hid),
            mspec(hid, c), vspec(c),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        **kwargs,
    )(x, lns.astype(jnp.float32), lnb.astype(jnp.float32),
      w1.astype(cd), b1.astype(cd), w2.astype(cd), b2.astype(cd))


def _unfused_mlp_reference(x, lns, lnb, w1, b1, w2, b2, eps, approx_gelu):
    cd = x.dtype
    xn = xla_layer_norm(x, lns, lnb, eps=eps)
    h = jnp.einsum("bnc,cd->bnd", xn, w1.astype(cd)) + b1.astype(cd)
    if approx_gelu:
        h = jax.nn.gelu(h, approximate=True)
    else:
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(cd)
    y = jnp.einsum("bnc,cd->bnd", h, w2.astype(cd)) + b2.astype(cd)
    return x + y


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_mlp_diff(x, lns, lnb, w1, b1, w2, b2, eps, approx_gelu, interpret):
    return _fused_mlp(x, lns, lnb, w1, b1, w2, b2, eps, approx_gelu, interpret)


def _fused_mlp_fwd(x, lns, lnb, w1, b1, w2, b2, eps, approx_gelu, interpret):
    out = _fused_mlp(x, lns, lnb, w1, b1, w2, b2, eps, approx_gelu, interpret)
    return out, (x, lns, lnb, w1, b1, w2, b2)


def _fused_mlp_bwd(eps, approx_gelu, interpret, res, g):
    x, lns, lnb, w1, b1, w2, b2 = res
    # The branch is pure XLA math — jax.vjp over the reference
    # composition IS the backward (the fusion only changes scheduling).
    _, vjp = jax.vjp(
        lambda *a: _unfused_mlp_reference(*a, eps, approx_gelu),
        x, lns, lnb, w1, b1, w2, b2,
    )
    return vjp(g)


_fused_mlp_diff.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def fused_mlp_block(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_fc1: jnp.ndarray,
    b_fc1: jnp.ndarray,
    w_fc2: jnp.ndarray,
    b_fc2: jnp.ndarray,
    eps: float = 1e-6,
    approx_gelu: bool = True,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``x + fc2(gelu(fc1(LN(x))))`` for [B, N, C] activations — the
    MLP residual branch of a pre-norm block as ONE Pallas kernel on
    TPU; the numerically-identical XLA composition elsewhere."""
    if interpret is None:
        platform = jax.devices()[0].platform
        if platform not in ("tpu", "axon"):
            return _unfused_mlp_reference(
                x, ln_scale, ln_bias, w_fc1, b_fc1, w_fc2, b_fc2, eps,
                approx_gelu,
            )
        interpret = False
    return _fused_mlp_diff(
        x, ln_scale, ln_bias, w_fc1, b_fc1, w_fc2, b_fc2, eps,
        approx_gelu, interpret,
    )


def fused_attention_block(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_qkv: jnp.ndarray,
    b_qkv: jnp.ndarray,
    w_proj: jnp.ndarray,
    b_proj: jnp.ndarray,
    num_heads: int,
    eps: float = 1e-6,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``x + proj(MHA(qkv(LN(x))))`` for [B, N, C] activations.

    One fused Pallas kernel on TPU; the numerically-identical XLA
    composition elsewhere (unless ``interpret`` is forced for tests).
    Weights are the fp32 flax params (``attn/qkv``, ``attn/proj``,
    ``norm1`` containers); casts to the activation dtype happen at use.
    """
    if interpret is None:
        platform = jax.devices()[0].platform
        if platform not in ("tpu", "axon"):
            return _unfused_reference(
                x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj,
                num_heads, eps,
            )
        interpret = False
    return _fused_block_diff(
        x, ln_scale, ln_bias, w_qkv, b_qkv, w_proj, b_proj,
        num_heads, eps, interpret,
    )


# ----------------------------------------------------------------------
# Fused CROSS-attention residual branch (the interaction decoder's
# second branch): x + proj(smallk_attn(q(LN(x)), k, v)) with k/v
# precomputed from the (tiny) exemplar token stream. Unlike the
# self-attention branch there is no [N, N] logits tensor at all —
# logits are [N, ny<=8] — so the win is purely the four avoided HBM
# round-trips (LN out, q, attention out, proj out) around small,
# head-fragmented matmuls. reference: models_crossvit.py:96-128, the
# decoder cross-attention the CrossAttention module mirrors.
# ----------------------------------------------------------------------


def _cross_block_kernel(
    x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, k_ref, v_ref, wproj_ref,
    bproj_ref, o_ref, *, num_heads: int, eps: float,
):
    bb = x_ref.shape[0]
    c = x_ref.shape[-1]
    hd = c // num_heads
    scale = hd ** -0.5 * 1.4426950408889634  # base-2 softmax
    f32 = jnp.float32
    for bi in range(bb):
        x = x_ref[bi]  # [N, C]
        x32 = x.astype(f32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        xn32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
        xn32 = xn32 * lns_ref[...].astype(f32) + lnb_ref[...].astype(f32)
        xn = xn32.astype(x.dtype)
        q = jax.lax.dot_general(
            xn, wq_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(x.dtype) + bq_ref[...].astype(x.dtype)
        kk = k_ref[bi]  # [ny, C]
        vv = v_ref[bi]
        heads = []
        for h in range(num_heads):
            qh = q[:, h * hd:(h + 1) * hd]
            kh = kk[:, h * hd:(h + 1) * hd]
            vh = vv[:, h * hd:(h + 1) * hd]
            logits = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=f32
            ) * scale  # [N, ny]
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp2(logits - m)
            s = jnp.sum(p, axis=-1, keepdims=True)
            out = jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            heads.append((out / s).astype(x.dtype))
        att = jnp.concatenate(heads, axis=-1)
        y = jax.lax.dot_general(
            att, wproj_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        ).astype(x.dtype) + bproj_ref[...].astype(x.dtype)
        o_ref[bi] = x + y


@functools.partial(jax.jit, static_argnums=(9, 10, 11, 12))
def _fused_cross(
    x, lns, lnb, wq, bq, k, v, wproj, bproj,
    num_heads: int, eps: float, interpret: bool, block_b: int = 1,
):
    b, n, c = x.shape
    ny = k.shape[1]
    cd = x.dtype
    while b % block_b:
        block_b //= 2
    kwargs = {}
    try:
        from jax.experimental.pallas import tpu as pltpu

        mem = pl.ANY if interpret else pltpu.VMEM
        xspec = pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0), memory_space=mem)
        kvspec = pl.BlockSpec((block_b, ny, c), lambda i: (i, 0, 0), memory_space=mem)
        vspec = lambda d: pl.BlockSpec(  # noqa: E731
            (d,), lambda i: (0,), memory_space=mem
        )
        mspec = lambda r, co: pl.BlockSpec(  # noqa: E731
            (r, co), lambda i: (0, 0), memory_space=mem
        )
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            )
    except Exception:
        xspec = pl.BlockSpec((block_b, n, c), lambda i: (i, 0, 0))
        kvspec = pl.BlockSpec((block_b, ny, c), lambda i: (i, 0, 0))
        vspec = lambda d: pl.BlockSpec((d,), lambda i: (0,))  # noqa: E731
        mspec = lambda r, co: pl.BlockSpec((r, co), lambda i: (0, 0))  # noqa: E731
    return pl.pallas_call(
        functools.partial(_cross_block_kernel, num_heads=num_heads, eps=eps),
        grid=(b // block_b,),
        in_specs=[
            xspec, vspec(c), vspec(c), mspec(c, c), vspec(c), kvspec, kvspec,
            mspec(c, c), vspec(c),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        **kwargs,
    )(x, lns.astype(jnp.float32), lnb.astype(jnp.float32),
      wq.astype(cd), bq.astype(cd), k.astype(cd), v.astype(cd),
      wproj.astype(cd), bproj.astype(cd))


def _unfused_cross_reference(x, lns, lnb, wq, bq, k, v, wproj, bproj,
                             num_heads, eps):
    """XLA composition with op-for-op identical numerics (CPU fallback
    and the backward's recompute spine)."""
    from countr_tpu.ops.attention import cross_attention_smallk

    cd = x.dtype
    xn = xla_layer_norm(x, lns, lnb, eps=eps)
    q = jnp.einsum("bnc,cd->bnd", xn, wq.astype(cd)) + bq.astype(cd)
    att = cross_attention_smallk(q, k.astype(cd), v.astype(cd), num_heads)
    y = jnp.einsum("bnc,cd->bnd", att, wproj.astype(cd)) + bproj.astype(cd)
    return x + y


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _fused_cross_diff(x, lns, lnb, wq, bq, k, v, wproj, bproj,
                      num_heads, eps, interpret):
    return _fused_cross(
        x, lns, lnb, wq, bq, k, v, wproj, bproj, num_heads, eps, interpret
    )


def _fused_cross_fwd(x, lns, lnb, wq, bq, k, v, wproj, bproj, nh, eps,
                     interp):
    out = _fused_cross(x, lns, lnb, wq, bq, k, v, wproj, bproj, nh, eps,
                       interp)
    return out, (x, lns, lnb, wq, bq, k, v, wproj, bproj)


def _fused_cross_bwd(num_heads, eps, interpret, res, g):
    # No [N, N] tensor exists in this branch (logits are [N, ny<=8]), so
    # jax.vjp over the XLA reference IS the backward — the fusion only
    # changes forward scheduling.
    _, vjp = jax.vjp(
        lambda *a: _unfused_cross_reference(*a, num_heads, eps), *res
    )
    return vjp(g)


_fused_cross_diff.defvjp(_fused_cross_fwd, _fused_cross_bwd)


def fused_cross_attention_block(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_q: jnp.ndarray,
    b_q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    w_proj: jnp.ndarray,
    b_proj: jnp.ndarray,
    num_heads: int,
    eps: float = 1e-6,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``x + proj(smallk_attn(q(LN(x)), k, v))`` for [B, N, C] queries
    over precomputed [B, ny<=8, C] key/value streams — the interaction
    decoder's cross-attention residual branch as ONE Pallas kernel on
    TPU; the numerically-identical XLA composition elsewhere.

    NOT wired into CrossAttentionBlock: on TPU v5e it measured 2x slower
    than the XLA composition (0.176 -> 0.367 ms/branch at b32, decoder
    geometry N=576/C=512/ny=4; scripts/ab_cross_block.py) — the kv
    stream is too small for the fusion to beat XLA's own fusion of the
    tiny einsums. Kept as a validated kernel (tests/test_pallas_block.py,
    scripts/validate_fast_mode.py) and as the recorded negative result
    (docs/PROFILE.md)."""
    if interpret is None:
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        interpret = False
        if not on_tpu:
            return _unfused_cross_reference(
                x, ln_scale, ln_bias, w_q, b_q, k, v, w_proj, b_proj,
                num_heads, eps,
            )
    if k.shape[1] > 8:  # kernel assumes a tiny kv stream
        return _unfused_cross_reference(
            x, ln_scale, ln_bias, w_q, b_q, k, v, w_proj, b_proj,
            num_heads, eps,
        )
    return _fused_cross_diff(
        x, ln_scale, ln_bias, w_q, b_q, k, v, w_proj, b_proj,
        num_heads, eps, interpret,
    )

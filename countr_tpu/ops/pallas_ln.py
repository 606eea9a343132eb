"""Fused LayerNorm Pallas kernel (TPU).

XLA's LayerNorm lowering on this workload costs ~0.34 ms per call at
[32, 576, 768] (scripts/profile_encoder2.py) — 5x the HBM-bandwidth
floor — because the fp32-upcast stats and the affine run as separate
passes. This kernel does one pass: read a row tile, compute fp32
mean/var in registers, normalize + affine, write bf16. Numerics are
identical to ops.norms.layer_norm (fp32 stats, rsqrt, fp32 affine).

Used by models.vit.LayerNorm on TPU for bf16 activations; the fp32
parity path and CPU tests keep the XLA formulation. Differentiable via
custom VJP: backward recomputes through the XLA layer_norm (cheap, and
training parity stays on one code path).

reference semantics: torch nn.LayerNorm(eps) over the channel dim
(reference: models_mae_cross.py:214).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from countr_tpu.ops.norms import layer_norm as xla_layer_norm


def _ln_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    x32 = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _fused_ln(x, scale, bias, eps: float, interpret: bool):
    orig_shape = x.shape
    c = orig_shape[-1]
    rows = 1
    for d in orig_shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, c)
    # Row-tile the grid; 512 rows x 768 ch x bf16 = 768 KB per block.
    tile = 512
    while rows % tile:
        tile //= 2
    grid = rows // tile
    try:
        from jax.experimental.pallas import tpu as pltpu

        mem = pl.ANY if interpret else pltpu.VMEM
        xspec = pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=mem)
        pspec = pl.BlockSpec((c,), lambda i: (0,), memory_space=mem)
    except Exception:
        xspec = pl.BlockSpec((tile, c), lambda i: (i, 0))
        pspec = pl.BlockSpec((c,), lambda i: (0,))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(grid,),
        in_specs=[xspec, pspec, pspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        interpret=interpret,
    )(x2, scale, bias)
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_ln_diff(x, scale, bias, eps: float, interpret: bool):
    return _fused_ln(x, scale, bias, eps, interpret)


def _fused_ln_fwd(x, scale, bias, eps, interpret):
    return _fused_ln(x, scale, bias, eps, interpret), (x, scale, bias)


def _fused_ln_bwd(eps, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: xla_layer_norm(x, s, b, eps=eps), x, scale, bias
    )
    return vjp(g)


_fused_ln_diff.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def fused_layer_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-6,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """LayerNorm over the last dim; Pallas on TPU, XLA elsewhere."""
    if interpret is None:
        platform = jax.devices()[0].platform
        if platform not in ("tpu", "axon"):
            return xla_layer_norm(x, scale, bias, eps=eps)
        interpret = False
    return _fused_ln_diff(x, scale, bias, eps, interpret)

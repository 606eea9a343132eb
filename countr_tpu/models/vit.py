"""ViT building blocks (flax.linen), shared by the counting model and
the MAE pre-training model.

First-party replacements for the timm 0.4.x imports the reference
relies on (reference: models_mae_cross.py:13, models_mae_noct.py:6 —
`from timm.models.vision_transformer import PatchEmbed, Block`):

- ``PatchEmbed``: the reference uses a stride-16 Conv2d; on TPU we
  express the identical linear map as reshape -> one big [B*L, 768] x
  [768, D] matmul that tiles perfectly onto the MXU (the conv-as-
  linear equivalence is exact; the converter reorders the torch conv
  kernel into (kh, kw, cin) row order).
- ``Block``: pre-norm encoder block, fused qkv projection, qkv_bias
  True, exact (erf) GELU, MLP ratio 4 — timm 0.4 semantics.

Dropout/DropPath are omitted: every reference entry point instantiates
blocks with drop=attn_drop=drop_path=0 (reference: models_crossvit.py:
130-150 defaults, models_mae_cross.py:32-34).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from countr_tpu.models.init import xavier_uniform
from countr_tpu.ops.attention import matmul_precision, multi_head_attention


class PatchEmbed(nn.Module):
    """[B, H, W, C] -> [B, (H/p)*(W/p), D] patch tokens."""

    patch_size: int
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x = x.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        x = nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=xavier_uniform,
            precision=matmul_precision(self.dtype),
            name="proj",
        )(x.astype(self.dtype))
        return x


class Mlp(nn.Module):
    """Dense -> GELU -> Dense (timm Mlp, reference:
    models_crossvit.py:46-67). GELU is exact erf by default;
    ``approx_gelu`` selects the tanh approximation in the compute dtype
    (error below bf16 rounding; ~2 ms/layer cheaper on v5e)."""

    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32
    approx_gelu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        prec = matmul_precision(self.dtype)
        x = nn.Dense(
            self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=xavier_uniform, precision=prec, name="fc1",
        )(x)
        if self.approx_gelu:
            x = nn.gelu(x, approximate=True)
        else:
            x = nn.gelu(x.astype(jnp.float32), approximate=False).astype(self.dtype)
        x = nn.Dense(
            self.out_dim, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=xavier_uniform, precision=prec, name="fc2",
        )(x)
        return x


class LayerNorm(nn.Module):
    """fp32-statistics LayerNorm with learned scale/bias.

    bf16 activations take the fused single-pass Pallas kernel on TPU
    (ops/pallas_ln.py, ~3x the XLA lowering's bandwidth); fp32 parity
    runs and non-TPU backends use the XLA formulation below.
    """

    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        if jnp.dtype(self.dtype) == jnp.bfloat16 and x.dtype == jnp.bfloat16:
            from countr_tpu.ops.pallas_ln import fused_layer_norm

            return fused_layer_norm(x, scale, bias, eps=self.eps)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


class _LNParams(nn.Module):
    """Parameter container matching ``LayerNorm`` exactly (same param
    names/shapes/inits), so the fused attention-block path and the
    module path share one checkpoint layout."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class _DenseParams(nn.Module):
    """Parameter container matching ``nn.Dense`` (kernel [in, out],
    zero bias, xavier-uniform kernel)."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", xavier_uniform, (self.in_dim, self.out_dim), jnp.float32
        )
        b = self.param(
            "bias", nn.initializers.zeros, (self.out_dim,), jnp.float32
        )
        return k, b


class _AttnParams(nn.Module):
    """Parameter container matching ``SelfAttention`` (children ``qkv``
    and ``proj``), for the fused attention-block kernel."""

    dim: int

    @nn.compact
    def __call__(self):
        qkv = _DenseParams(self.dim, 3 * self.dim, name="qkv")()
        proj = _DenseParams(self.dim, self.dim, name="proj")()
        return qkv, proj


class SelfAttention(nn.Module):
    """Fused-qkv MHSA (reference: models_crossvit.py:69-94)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        prec = matmul_precision(self.dtype)
        qkv = nn.Dense(
            3 * c, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=xavier_uniform, precision=prec, name="qkv",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # The fused kernel computes at the input dtype; fp32-parity
        # runs stay on the HIGHEST-precision XLA path.
        if self.use_pallas and jnp.dtype(self.dtype) == jnp.bfloat16:
            from countr_tpu.ops.pallas_attn import fused_attention

            y = fused_attention(q, k, v, self.num_heads)
        else:
            y = multi_head_attention(q, k, v, self.num_heads, precision=prec)
        return nn.Dense(
            c, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=xavier_uniform, precision=prec, name="proj",
        )(y)


class _MlpParams(nn.Module):
    """Parameter container matching ``Mlp`` (children ``fc1``/``fc2``)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        fc1 = _DenseParams(self.dim, self.hidden, name="fc1")()
        fc2 = _DenseParams(self.hidden, self.dim, name="fc2")()
        return fc1, fc2


def fused_mlp_branch(x, ln_name, mlp_name, parent, hidden, ln_eps,
                     approx_gelu):
    """``x + fc2(gelu(fc1(LN(x))))`` via the one-kernel Pallas fused MLP
    block (ops/pallas_block.py); same param tree as LayerNorm + Mlp."""
    from countr_tpu.ops.pallas_block import fused_mlp_block

    c = x.shape[-1]
    lns, lnb = _LNParams(c, name=ln_name, parent=parent)()
    (w1, b1), (w2, b2) = _MlpParams(c, hidden, name=mlp_name, parent=parent)()
    return fused_mlp_block(
        x, lns, lnb, w1, b1, w2, b2, eps=ln_eps, approx_gelu=approx_gelu
    )


def fused_attn_branch(x, ln_name, attn_name, parent, num_heads, ln_eps):
    """``x + proj(MHA(qkv(LN(x))))`` via the one-kernel Pallas fused
    attention block (ops/pallas_block.py). Declares the SAME param tree
    as the LayerNorm/SelfAttention module pair it replaces."""
    from countr_tpu.ops.pallas_block import fused_attention_block

    c = x.shape[-1]
    lns, lnb = _LNParams(c, name=ln_name, parent=parent)()
    (qkv_k, qkv_b), (proj_k, proj_b) = _AttnParams(
        c, name=attn_name, parent=parent
    )()
    return fused_attention_block(
        x, lns, lnb, qkv_k, qkv_b, proj_k, proj_b, num_heads, eps=ln_eps
    )


class Block(nn.Module):
    """Pre-norm transformer encoder block (timm 0.4 Block semantics).

    In the bf16 fast mode (``use_pallas``), the whole attention branch
    (LN1 + qkv + MHA + proj + residual) runs as ONE Pallas kernel — no
    intermediate ever touches HBM (ops/pallas_block.py). The param tree
    is identical to the module path, so checkpoints are shared."""

    num_heads: int
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    fused_block: bool = True
    approx_gelu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        # x.dtype guard: the fused kernel runs at the stream dtype; an
        # fp32 stream entering a bf16-configured block falls back to the
        # module path (which keeps the caller's dtype through the
        # residual) instead of silently casting the residual stream.
        if (
            self.use_pallas
            and self.fused_block
            and jnp.dtype(self.dtype) == jnp.bfloat16
            and x.dtype == jnp.bfloat16
        ):
            # Attention branch only: fusing the MLP branch the same way
            # was measured SLOWER (0.889 -> 0.950 ms/branch at the
            # encoder bench shape, scripts/ab_fused_block.py) — XLA's
            # one big [B*N, C] matmul beats the per-sample grid. The
            # fused_mlp_block kernel is kept as the measured record.
            x = fused_attn_branch(
                x, "norm1", "attn", self, self.num_heads, self.ln_eps,
            )
            x = x + Mlp(
                int(c * self.mlp_ratio), c, dtype=self.dtype,
                approx_gelu=self.approx_gelu, name="mlp",
            )(LayerNorm(self.ln_eps, self.dtype, name="norm2")(x))
            return x
        x = x + SelfAttention(
            self.num_heads, dtype=self.dtype, use_pallas=self.use_pallas,
            name="attn",
        )(LayerNorm(self.ln_eps, self.dtype, name="norm1")(x))
        x = x + Mlp(
            int(c * self.mlp_ratio), c, dtype=self.dtype,
            approx_gelu=self.approx_gelu, name="mlp",
        )(LayerNorm(self.ln_eps, self.dtype, name="norm2")(x))
        return x

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


class Block(nn.Module):
    """Pre-norm transformer encoder block (timm 0.4 Block semantics)."""

    num_heads: int
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    approx_gelu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        x = x + SelfAttention(
            self.num_heads, dtype=self.dtype, use_pallas=self.use_pallas,
            name="attn",
        )(LayerNorm(self.ln_eps, self.dtype, name="norm1")(x))
        x = x + Mlp(
            int(c * self.mlp_ratio), c, dtype=self.dtype,
            approx_gelu=self.approx_gelu, name="mlp",
        )(LayerNorm(self.ln_eps, self.dtype, name="norm2")(x))
        return x

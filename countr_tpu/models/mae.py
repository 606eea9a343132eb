"""MAE pre-training model (no cls token).

TPU-native equivalent of the reference MaskedAutoencoderViTNoCT
(reference: models_mae_noct.py:11-204): random masking by argsort of
uniform noise (jittable — fixed len_keep gives static shapes), encoder
over visible tokens, lightweight decoder reconstructing all patches.

Reference quirk reproduced on purpose: the training loss averages over
ALL patches, not just masked ones (reference: models_mae_noct.py:193-195
uses an all-ones mask; the masked variant is commented out at :197).
A ``masked_loss`` flag exposes the standard MAE loss as an option.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from countr_tpu.config import MAEConfig
from countr_tpu.models.init import xavier_uniform
from countr_tpu.ops.attention import matmul_precision
from countr_tpu.ops.posembed import get_2d_sincos_pos_embed
from countr_tpu.models.vit import Block, LayerNorm, PatchEmbed


def patchify(imgs: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, L, p*p*3] with (ph, pw, c) pixel order,
    matching the reference einsum 'nchpwq->nhwpqc'
    (reference: models_mae_noct.py:82-94)."""
    b, h, w, c = imgs.shape
    gh, gw = h // p, w // p
    x = imgs.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, p * p * c)


def unpatchify(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B, L, p*p*3] -> [B, H, W, 3] (reference: models_mae_noct.py:96-108)."""
    b, l, d = x.shape
    g = int(l ** 0.5)
    c = d // (p * p)
    x = x.reshape(b, g, g, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, g * p, g * p, c)


def random_masking(
    rng: jax.Array, x: jnp.ndarray, mask_ratio: float
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-sample random masking by argsort of uniform noise
    (reference: models_mae_noct.py:110-135).

    Returns (x_masked [B, len_keep, D], mask [B, L] with 1 = removed,
    ids_restore [B, L])."""
    b, l, d = x.shape
    len_keep = int(l * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (b, l))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    mask = jnp.ones((b, l), x.dtype).at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_masked, mask, ids_restore


class MaskedAutoencoderViT(nn.Module):
    cfg: MAEConfig
    masked_loss: bool = False  # reference behavior: loss over ALL patches

    def setup(self):
        cfg = self.cfg
        self.patch_embed = PatchEmbed(cfg.patch_size, cfg.embed_dim, cfg.dtype)
        self.blocks = [
            Block(
                cfg.num_heads, cfg.mlp_ratio, cfg.ln_eps, cfg.dtype,
                use_pallas=cfg.use_pallas_attention,
                fused_block=cfg.fused_attn_block,
                approx_gelu=cfg.approx_gelu, name=f"blocks_{i}",
            )
            for i in range(cfg.depth)
        ]
        self.norm = LayerNorm(cfg.ln_eps, cfg.dtype, name="norm")
        prec = matmul_precision(cfg.dtype)
        self.decoder_embed = nn.Dense(
            cfg.decoder_embed_dim, dtype=cfg.dtype, param_dtype=jnp.float32,
            kernel_init=xavier_uniform, precision=prec, name="decoder_embed",
        )
        self.mask_token = self.param(
            "mask_token",
            nn.initializers.normal(stddev=0.02),
            (1, 1, cfg.decoder_embed_dim),
            jnp.float32,
        )
        self.decoder_blocks = [
            Block(
                cfg.decoder_num_heads, cfg.mlp_ratio, cfg.ln_eps, cfg.dtype,
                use_pallas=cfg.use_pallas_attention,
                fused_block=cfg.fused_attn_block,
                approx_gelu=cfg.approx_gelu, name=f"decoder_blocks_{i}",
            )
            for i in range(cfg.decoder_depth)
        ]
        self.decoder_norm = LayerNorm(cfg.ln_eps, cfg.dtype, name="decoder_norm")
        self.decoder_pred = nn.Dense(
            cfg.patch_size ** 2 * cfg.in_chans, dtype=cfg.dtype,
            param_dtype=jnp.float32, kernel_init=xavier_uniform,
            precision=prec, name="decoder_pred",
        )
        self.pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(cfg.embed_dim, cfg.grid_size)
        )
        self.decoder_pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(cfg.decoder_embed_dim, cfg.grid_size)
        )

    def encode(self, imgs: jnp.ndarray, rng: jax.Array, mask_ratio: float):
        """Patchify, add pos, mask, run encoder
        (reference: models_mae_noct.py:137-152)."""
        x = self.patch_embed(imgs)
        x = x + self.pos_embed.astype(x.dtype)
        x, mask, ids_restore = random_masking(rng, x, mask_ratio)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x), mask, ids_restore

    def decode(self, x: jnp.ndarray, ids_restore: jnp.ndarray) -> jnp.ndarray:
        """Append mask tokens, unshuffle, decode, predict pixels
        (reference: models_mae_noct.py:154-175)."""
        x = self.decoder_embed(x)
        b, n_vis, c = x.shape
        l = ids_restore.shape[1]
        mask_tokens = jnp.broadcast_to(
            self.mask_token.astype(x.dtype), (b, l - n_vis, c)
        )
        x = jnp.concatenate([x, mask_tokens], axis=1)
        x = jnp.take_along_axis(x, ids_restore[:, :, None], axis=1)
        x = x + self.decoder_pos_embed.astype(x.dtype)
        for blk in self.decoder_blocks:
            x = blk(x)
        x = self.decoder_norm(x)
        return self.decoder_pred(x)

    def loss(
        self, imgs: jnp.ndarray, pred: jnp.ndarray, mask: jnp.ndarray
    ) -> jnp.ndarray:
        """Per-patch MSE (reference: models_mae_noct.py:177-198)."""
        target = patchify(imgs, self.cfg.patch_size).astype(jnp.float32)
        if self.cfg.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / jnp.sqrt(var + 1e-6)
        per_patch = jnp.mean(
            jnp.square(pred.astype(jnp.float32) - target), axis=-1
        )
        if self.masked_loss:
            m = mask.astype(jnp.float32)
            return jnp.sum(per_patch * m) / jnp.sum(m)
        return jnp.mean(per_patch)

    def __call__(
        self, imgs: jnp.ndarray, rng: jax.Array, mask_ratio: float | None = None
    ):
        """Returns (loss, pred [B,L,p*p*3], mask [B,L])
        (reference: models_mae_noct.py:200-204)."""
        if mask_ratio is None:
            mask_ratio = self.cfg.mask_ratio
        latent, mask, ids_restore = self.encode(imgs, rng, mask_ratio)
        pred = self.decode(latent, ids_restore)
        loss = self.loss(imgs, pred, mask)
        return loss, pred, mask

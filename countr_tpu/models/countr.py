"""CounTR counting model: frozen ViT encoder + exemplar CNN +
cross-attention interaction decoder + density regression head.

TPU-native re-design of the reference SupervisedMAE
(reference: models_mae_cross.py:18-207):

- NHWC everywhere; convs and the patch-embed matmul hit the MXU.
- ``shot_num`` is a static (trace-time) argument — there are only four
  values (0..3), each compiles once; the exemplar CNN runs the shot dim
  folded into the batch in a single pass instead of the reference's
  Python loop over shots (reference: models_mae_cross.py:162-171).
- The encoder output is stop_gradient'ed, matching the reference's
  torch.no_grad() encoder freeze (reference: models_mae_cross.py:204-205).

forward contract (reference: models_mae_cross.py:201-207):
  imgs  [B, 384, 384, 3] float in [0,1]
  boxes [B, 3, 64, 64, 3] exemplar crops (slots beyond shot_num ignored)
  -> density [B, 384, 384], count = density.sum()/60
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from countr_tpu.config import CounTRConfig
from countr_tpu.models.init import conv_bias_init, torch_conv_kernel, xavier_uniform
from countr_tpu.ops.attention import (
    cross_attention_smallk, matmul_precision, multi_head_attention,
)
from countr_tpu.ops.norms import group_norm, instance_norm
from countr_tpu.ops.posembed import get_2d_sincos_pos_embed
from countr_tpu.ops.subpixel import (
    gn_phase_apply, gn_phase_stats, phase_conv2x_core, pred_phase_flat,
    ring_strips, scatter_ring, upsample2x_phase,
)
from countr_tpu.ops.upsample import upsample2x_bilinear
from countr_tpu.models.vit import Block, LayerNorm, Mlp, PatchEmbed, SelfAttention


class CrossAttention(nn.Module):
    """Separate-wq/wk/wv cross-attention: image tokens query exemplar
    tokens (reference: models_crossvit.py:96-128)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        prec = matmul_precision(self.dtype)
        dense = lambda name: nn.Dense(  # noqa: E731
            c, dtype=self.dtype, param_dtype=jnp.float32, precision=prec,
            kernel_init=xavier_uniform, name=name,
        )
        q = dense("wq")(x)
        k = dense("wk")(y)
        v = dense("wv")(y)
        if y.shape[1] <= 8:
            out = cross_attention_smallk(q, k, v, self.num_heads, precision=prec)
        else:
            out = multi_head_attention(q, k, v, self.num_heads, precision=prec)
        return dense("proj")(out)


class CrossAttentionBlock(nn.Module):
    """self-attn -> cross-attn -> MLP, each pre-norm residual; only the
    query side is normalized before cross-attention
    (reference: models_crossvit.py:130-156)."""

    num_heads: int
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    fused_block: bool = True
    approx_gelu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        # Fused path requires the stream ALREADY bf16: casting here would
        # silently drop residual-stream precision for an fp32 input where
        # the module path keeps the caller's dtype through the residual.
        if (
            self.use_pallas
            and self.fused_block
            and jnp.dtype(self.dtype) == jnp.bfloat16
            and x.dtype == jnp.bfloat16
        ):
            from countr_tpu.models.vit import fused_attn_branch

            x = fused_attn_branch(
                x, "norm0", "selfattn", self, self.num_heads, self.ln_eps,
            )
        else:
            x = x + SelfAttention(
                self.num_heads, dtype=self.dtype, use_pallas=self.use_pallas,
                name="selfattn",
            )(LayerNorm(self.ln_eps, self.dtype, name="norm0")(x))
        # Cross-attention stays the XLA module path: the fused Pallas cross
        # branch (ops/pallas_block.py fused_cross_attention_block) measured
        # 2x SLOWER here (0.176 -> 0.367 ms/branch at b32, -1.15 ms/forward,
        # scripts/ab_cross_block.py) because the kv stream is tiny
        # (ny<=8 exemplar tokens) and XLA already fuses the small einsums.
        x = x + CrossAttention(self.num_heads, dtype=self.dtype, name="attn")(
            LayerNorm(self.ln_eps, self.dtype, name="norm1")(x), y
        )
        x = x + Mlp(
            int(c * self.mlp_ratio), c, dtype=self.dtype,
            approx_gelu=self.approx_gelu, name="mlp",
        )(LayerNorm(self.ln_eps, self.dtype, name="norm2")(x))
        return x


class ExemplarEncoder(nn.Module):
    """4-stage CNN embedding a 64x64 exemplar crop to a 512-d token
    (reference: models_mae_cross.py:47-71). InstanceNorm is affine-free
    (torch default), so the only params are the conv kernels."""

    out_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        prec = matmul_precision(self.dtype)
        widths = (64, 128, 256, self.out_dim)
        for i, w in enumerate(widths):
            x = nn.Conv(
                w, (3, 3), padding="SAME", dtype=self.dtype,
                param_dtype=jnp.float32, precision=prec,
                kernel_init=torch_conv_kernel,
                bias_init=conv_bias_init(9 * x.shape[-1]), name=f"conv{i + 1}",
            )(x)
            x = instance_norm(x)
            x = nn.relu(x)
            if i < 3:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
        return x  # [N, out_dim]


class _Conv3Params(nn.Module):
    """Parameter container matching ``nn.Conv(name="conv3")`` exactly
    (same param names, shapes, inits), so the fused subpixel path and
    the reference formulation share one checkpoint layout."""

    features: int = 256

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param(
            "kernel", torch_conv_kernel, (3, 3, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", conv_bias_init(9 * cin), (self.features,), jnp.float32
        )
        return kernel, bias


class _PredParams(nn.Module):
    """Parameter container matching ``nn.Conv(name="pred")`` (1x1,
    256 -> 1), for the fused path's block-diagonal lane matmul."""

    @nn.compact
    def __call__(self, cin: int = 256):
        kernel = self.param(
            "kernel", torch_conv_kernel, (1, 1, cin, 1), jnp.float32
        )
        bias = self.param("bias", conv_bias_init(cin), (1,), jnp.float32)
        return kernel, bias


class DensityHead(nn.Module):
    """Token grid -> density map: 4x {conv3x3 + GroupNorm(8,256) + ReLU
    + bilinear 2x}, final 1x1 conv to one channel
    (reference: models_mae_cross.py:80-100, :184-198). Note the 1x1 conv
    output is upsampled 192->384 *after* projection, exactly like the
    reference's last F.interpolate.

    ``precision_high`` (the mixed_fast mode): fp32 conv/upsample
    contractions run at Precision.HIGH (3-pass bf16 operand splitting)
    instead of HIGHEST (6-pass) — near-fp32 counts at ~half the
    fp32-head cost. A bf16-operand fp32-accumulate variant was measured
    and rejected: the head's bf16 error IS the operand rounding, so it
    bought no accuracy over plain bf16 (docs/PARITY.md).

    ``subpixel``: fuse the LAST 2x upsample into conv3 as a phase-space
    conv and keep GroupNorm/ReLU/pred/final-upsample in phase layout, so
    the 192^2 tensor never materializes in HBM (ops/subpixel.py; the
    composition is numerically equivalent incl. the border ring —
    tests/test_subpixel_head.py). Only the last pair fuses: earlier
    stages would need a depth-to-space transpose for the next conv,
    which measures more expensive than the fusion saves
    (scripts/probe_subpixel.py)."""

    dtype: jnp.dtype = jnp.float32
    precision_high: bool = False
    subpixel: bool = False
    # Conv width; the reference hard-codes 256 (see CounTRConfig
    # .head_width). Must be a multiple of the 8 GroupNorm groups.
    width: int = 256
    # Per-stage dtype overrides (stage0..3, pred); None entries follow
    # ``dtype``. See CounTRConfig.head_stage_dtypes.
    stage_dtypes: tuple = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert not (self.subpixel and self.stage_dtypes), (
            "per-stage head dtypes require the reference head formulation"
        )

        def sdtype(idx):
            if self.stage_dtypes is not None and self.stage_dtypes[idx] is not None:
                return self.stage_dtypes[idx]
            return self.dtype

        def sprec(idx):
            d = sdtype(idx)
            return (
                jax.lax.Precision.HIGH
                if self.precision_high and d == jnp.float32
                else matmul_precision(d)
            )

        prec = sprec(0) if self.stage_dtypes is None else None

        def stage(x, idx):
            x = nn.Conv(
                self.width, (3, 3), padding="SAME", dtype=sdtype(idx),
                param_dtype=jnp.float32, precision=sprec(idx),
                kernel_init=torch_conv_kernel,
                bias_init=conv_bias_init(9 * x.shape[-1]), name=f"conv{idx}",
            )(x)
            gn_scale = self.param(f"gn{idx}_scale", nn.initializers.ones, (self.width,), jnp.float32)
            gn_bias = self.param(f"gn{idx}_bias", nn.initializers.zeros, (self.width,), jnp.float32)
            x = group_norm(x, gn_scale, gn_bias, num_groups=8)
            return nn.relu(x)

        for idx in range(3):
            x = stage(x, idx)
            if idx < 2 or not self.subpixel:
                x = upsample2x_bilinear(x, precision=sprec(idx))

        if not self.subpixel:
            x = stage(x, 3)
            x = nn.Conv(
                1, (1, 1), dtype=sdtype(4), param_dtype=jnp.float32,
                kernel_init=torch_conv_kernel,
                bias_init=conv_bias_init(self.width),
                precision=sprec(4), name="pred",
            )(x)
            x = upsample2x_bilinear(x, precision=sprec(4))
            return x[..., 0]  # [B, H, W]

        # Fused: x is stage2's output at 96^2; conv3 consumes it as a
        # phase conv and everything downstream stays in the FLAT phase
        # layout [N, h, w, 4*256] — any reshape of the big (~600 MB)
        # tensor's lane dim retiles it, and the ring correction rides
        # four thin strips through corrected-GN/ReLU/pred onto the
        # SMALL post-pred tensor (ops/subpixel.py for the full story).
        n, h, w, _ = x.shape
        kernel, bias = _Conv3Params(name="conv3", features=self.width)(x.shape[-1])
        pk, pb = _PredParams(name="pred")(self.width)
        pk = pk[0, 0]  # [width, 1]
        xd = x.astype(self.dtype)
        ph = phase_conv2x_core(xd, kernel, bias, precision=prec)
        strips = ring_strips(xd, kernel, bias, precision=prec)
        gn_scale = self.param("gn3_scale", nn.initializers.ones, (self.width,), jnp.float32)
        gn_bias = self.param("gn3_bias", nn.initializers.zeros, (self.width,), jnp.float32)
        mean, rstd = gn_phase_stats(ph, strips, num_groups=8,
                                    c_real=self.width, precision=prec)
        yb = nn.relu(gn_phase_apply(ph, mean, rstd, gn_scale, gn_bias,
                                    c_real=self.width))
        z4 = pred_phase_flat(yb, pk.astype(self.dtype), pb, precision=prec)
        zs = [
            (nn.relu(gn_phase_apply(s, mean, rstd, gn_scale, gn_bias,
                                    c_real=self.width))
             @ pk.astype(self.dtype) + pb.astype(self.dtype))[..., 0]
            for s in strips
        ]
        z = scatter_ring(z4.reshape(n, h, w, 2, 2), *zs)
        return upsample2x_phase(z, precision=prec)


class CounTR(nn.Module):
    """The counting model. ``shot_num`` must be a Python int (0..3)."""

    cfg: CounTRConfig

    def setup(self):
        cfg = self.cfg
        enc_dt = cfg.encoder_dtype or cfg.dtype
        dec_dt = cfg.decoder_dtype or cfg.dtype
        # The fast-mode kernels (Pallas attention, tanh GELU) follow the
        # stage dtype so a per-stage fp32 override stays bit-exact — the
        # precision bisection relies on this (scripts/eval_precision.py).
        enc_pallas = cfg.use_pallas_attention and enc_dt == jnp.bfloat16
        dec_pallas = cfg.use_pallas_attention and dec_dt == jnp.bfloat16
        enc_gelu = cfg.approx_gelu and enc_dt == jnp.bfloat16
        dec_gelu = cfg.approx_gelu and dec_dt == jnp.bfloat16
        self.patch_embed = PatchEmbed(cfg.patch_size, cfg.embed_dim, enc_dt)
        self.blocks = [
            Block(
                cfg.num_heads, cfg.mlp_ratio, cfg.ln_eps, enc_dt,
                use_pallas=enc_pallas, fused_block=cfg.fused_attn_block,
                approx_gelu=enc_gelu, name=f"blocks_{i}",
            )
            for i in range(cfg.depth)
        ]
        self.norm = LayerNorm(cfg.ln_eps, enc_dt, name="norm")
        self.decoder_embed = nn.Dense(
            cfg.decoder_embed_dim, dtype=dec_dt, param_dtype=jnp.float32,
            kernel_init=xavier_uniform,
            precision=matmul_precision(dec_dt), name="decoder_embed",
        )
        self.shot_token = self.param(
            "shot_token",
            nn.initializers.normal(stddev=0.02),
            (cfg.decoder_embed_dim,),
            jnp.float32,
        )
        self.exemplar_encoder = ExemplarEncoder(
            cfg.decoder_embed_dim, dec_dt, name="exemplar_encoder"
        )
        dec_fused = (
            cfg.fused_attn_block
            if cfg.fused_attn_block_decoder is None
            else cfg.fused_attn_block_decoder
        )
        self.decoder_blocks = [
            CrossAttentionBlock(
                cfg.decoder_num_heads, cfg.mlp_ratio, cfg.ln_eps, dec_dt,
                use_pallas=dec_pallas, fused_block=dec_fused,
                approx_gelu=dec_gelu, name=f"decoder_blocks_{i}",
            )
            for i in range(cfg.decoder_depth)
        ]
        self.decoder_norm = LayerNorm(cfg.ln_eps, dec_dt, name="decoder_norm")
        self.density_head = DensityHead(
            cfg.head_dtype or cfg.dtype,
            precision_high=cfg.head_precision_high,
            subpixel=cfg.subpixel_head, width=cfg.head_width,
            stage_dtypes=cfg.head_stage_dtypes,
            name="density_head",
        )
        # Fixed (non-learned) sin-cos position embeddings
        # (reference: models_mae_cross.py:30,42,111-115).
        self.pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(cfg.embed_dim, cfg.grid_size)
        )
        self.decoder_pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(cfg.decoder_embed_dim, cfg.grid_size)
        )

    def encode(self, imgs: jnp.ndarray) -> jnp.ndarray:
        """ViT encoder: [B,384,384,3] -> [B,576,768]
        (reference: models_mae_cross.py:136-148)."""
        x = self.patch_embed(imgs)
        x = x + self.pos_embed.astype(x.dtype)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)

    def encode_exemplars(self, boxes: jnp.ndarray, shot_num: int) -> jnp.ndarray:
        """[B,3,64,64,3] -> [B, max(shot_num,1), 512] exemplar tokens;
        shot_num==0 uses the learned shot token
        (reference: models_mae_cross.py:156-177)."""
        b = boxes.shape[0]
        cfg = self.cfg
        if shot_num == 0:
            return jnp.broadcast_to(
                self.shot_token.astype(cfg.decoder_dtype or cfg.dtype),
                (b, 1, cfg.decoder_embed_dim)
            )
        sel = boxes[:, :shot_num].astype(cfg.decoder_dtype or cfg.dtype)
        flat = sel.reshape(b * shot_num, *boxes.shape[2:])
        feats = self.exemplar_encoder(flat)
        return feats.reshape(b, shot_num, cfg.decoder_embed_dim)

    def decode_tokens(self, latent: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Interaction decoder + density head, given exemplar tokens
        ``y`` [B, n_shot, C] (reference: models_mae_cross.py:150-199).

        Separated from exemplar encoding so the inference engine can
        embed an image's exemplars once and reuse them for every
        sliding window of that image."""
        cfg = self.cfg
        x = self.decoder_embed(latent)
        x = x + self.decoder_pos_embed.astype(x.dtype)
        for blk in self.decoder_blocks:
            x = blk(x, y.astype(x.dtype))
        x = self.decoder_norm(x)
        b, hw, c = x.shape
        g = cfg.grid_size
        x = x.reshape(b, g, g, c)
        return self.density_head(x).astype(jnp.float32)

    def decode(
        self, latent: jnp.ndarray, boxes: jnp.ndarray, shot_num: int
    ) -> jnp.ndarray:
        return self.decode_tokens(latent, self.encode_exemplars(boxes, shot_num))

    def forward_tokens(self, imgs: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Forward with precomputed exemplar tokens (the batched-window
        inference path)."""
        latent = self.encode(imgs)
        if self.cfg.freeze_encoder:
            latent = jax.lax.stop_gradient(latent)
        return self.decode_tokens(latent, y)

    def __call__(
        self, imgs: jnp.ndarray, boxes: jnp.ndarray, shot_num: int = 3
    ) -> jnp.ndarray:
        latent = self.encode(imgs)
        if self.cfg.freeze_encoder:
            latent = jax.lax.stop_gradient(latent)
        return self.decode(latent, boxes, shot_num)

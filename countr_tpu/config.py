"""Typed model/engine configuration.

The reference scatters configuration across per-script argparse blocks
(reference: FSC_finetune_cross.py:30-107, FSC_pretrain.py:33-108,
FSC_test_cross(few-shot).py:26-78). Here a single set of frozen
dataclasses carries every knob; CLI entry points build presets from
these.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

# Density maps are scaled by this factor at synthesis time and divided
# back at count readout (reference: util/FSC147.py:278,
# FSC_test_cross(few-shot).py:351).
DENSITY_SCALE = 60.0

# All spatial processing happens on 384x384 windows; widths are snapped
# to multiples of 16 (reference: util/FSC147.py:17,
# FSC_test_cross(few-shot).py:148-149).
IMG_SIZE = 384
PATCH_SIZE = 16
EXEMPLAR_SIZE = 64
MAX_SHOTS = 3

# Sliding-window inference geometry (reference:
# FSC_test_cross(few-shot).py:294-349).
WINDOW = 384
STRIDE = 128

# Test-time normalization threshold (reference:
# FSC_test_cross(few-shot).py:353-359).
TTN_THRESHOLD = 1.8


@dataclasses.dataclass(frozen=True)
class CounTRConfig:
    """Counting model (SupervisedMAE equivalent).

    reference: models_mae_cross.py:18-106 (architecture),
    :210-253 (named size presets).
    """

    img_size: int = IMG_SIZE
    patch_size: int = PATCH_SIZE
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 2
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    # Compute dtype for matmuls/convs; params stay fp32. fp32 gives
    # bit-parity with the reference test path; bf16 rides the MXU.
    dtype: jnp.dtype = jnp.float32
    # Use the fused Pallas attention kernel on TPU for encoder and
    # decoder self-attention (falls back to XLA attention elsewhere).
    use_pallas_attention: bool = False
    # Consulted only when use_pallas_attention: run the whole attention
    # residual branch (LN1+qkv+MHA+proj+residual) as ONE Pallas kernel
    # (ops/pallas_block.py) instead of standalone Pallas LN + attention.
    # Separate gate so training modes can opt out independently of
    # inference if the fused custom VJP ever regresses a step
    # (scripts/ab_train_fused.py is the measurement).
    fused_attn_block: bool = True
    # Decoder-stage override for fused_attn_block (None = follow it).
    # The decoder's self-attention branch measured neutral at the
    # branch level (0.941 fused vs 0.928 ms, docs/PROFILE.md round-3
    # table); scripts/ab_decoder_fused.py prices it at the
    # full-forward level so the wiring decision is same-session data.
    fused_attn_block_decoder: Optional[bool] = None
    # tanh-approximate GELU instead of exact erf. The approximation
    # error (<3.2e-3 absolute) is below bf16 rounding (2^-8 relative),
    # and erf costs ~2 ms/layer more on v5e (scripts/profile_encoder.py)
    # — the bf16 fast mode turns this on; fp32 parity mode never does.
    approx_gelu: bool = False
    # Density-head compute dtype override (None = ``dtype``). The
    # mixed-precision mode runs a bf16 encoder/decoder under an fp32
    # head to cut bf16 count error (docs/PARITY.md).
    head_dtype: Optional[jnp.dtype] = None
    # Per-stage overrides for precision bisection (None = ``dtype``):
    # which bf16 stage contributes how much count error —
    # scripts/eval_precision.py --bisect.
    encoder_dtype: Optional[jnp.dtype] = None
    decoder_dtype: Optional[jnp.dtype] = None
    # Per-STAGE dtype overrides INSIDE the density head (None = the
    # head dtype): a 5-tuple for (stage0 24^2, stage1 48^2, stage2
    # 96^2, stage3 192^2, pred+final-upsample). Entries that are None
    # follow head_dtype/dtype. Lets the precision bisection locate the
    # bf16 count error within the head and compose a cheaper
    # parity-fidelity mode (scripts/eval_precision.py --head_bisect);
    # fp32 entries honor head_precision_high. Incompatible with
    # subpixel_head (the fused phase-space path assumes one dtype).
    head_stage_dtypes: Optional[Tuple[Optional[jnp.dtype], ...]] = None
    # mixed_fast: run the fp32 head's conv/upsample contractions at
    # lax.Precision.HIGH (3-pass bf16 operand splitting, ~2^-18
    # effective operand precision) instead of fp32's HIGHEST (6-pass).
    # The head is the bf16 error source and its error is operand
    # rounding, not accumulation (docs/PARITY.md bisection), so HIGH
    # recovers near-fp32 counts at ~half the fp32-head cost. Only
    # meaningful when the head dtype is fp32.
    head_precision_high: bool = False
    # Fuse the density head's last 2x upsample into conv3 as a
    # phase-space (subpixel) conv, keeping GN/ReLU/pred/final-upsample
    # in phase layout so the 192^2 tensor never touches HBM
    # (ops/subpixel.py). Numerically equivalent incl. the border ring
    # (tests/test_subpixel_head.py); measured 1.47x the up->conv pair
    # (scripts/probe_subpixel.py). The bf16 fast mode turns this on.
    subpixel_head: bool = False
    # The reference always runs the encoder under torch.no_grad()
    # (reference: models_mae_cross.py:204-205), freezing it during
    # fine-tuning; stop_gradient reproduces that.
    freeze_encoder: bool = True
    # Density-head conv width. The reference hard-codes 256 channels
    # (reference: models_mae_cross.py:80-100, GroupNorm(8, 256)) and
    # every full-size preset keeps that; configurable (multiple of the
    # 8 GN groups) so tiny TEST configs can shrink the head's 384^2
    # convs, which otherwise dominate CPU-suite wall time.
    head_width: int = 256

    def __post_init__(self):
        if self.head_width % 8 != 0:
            raise ValueError(
                f"head_width must be a multiple of the 8 GroupNorm groups "
                f"(reference: models_mae_cross.py:80-100); got {self.head_width}"
            )
        if self.head_stage_dtypes is not None:
            if len(self.head_stage_dtypes) != 5:
                raise ValueError(
                    "head_stage_dtypes must have 5 entries (stage0..3, "
                    f"pred); got {len(self.head_stage_dtypes)}"
                )
            if self.subpixel_head:
                raise ValueError(
                    "head_stage_dtypes is incompatible with subpixel_head "
                    "(the fused phase-space path assumes one head dtype)"
                )

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    """MAE pre-training model (MaskedAutoencoderViTNoCT equivalent).

    reference: models_mae_noct.py:11-51, :207-234 (presets).
    """

    img_size: int = IMG_SIZE
    patch_size: int = PATCH_SIZE
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    norm_pix_loss: bool = False
    mask_ratio: float = 0.5  # reference: FSC_pretrain.py:45
    dtype: jnp.dtype = jnp.float32
    use_pallas_attention: bool = False
    # See CounTRConfig.fused_attn_block.
    fused_attn_block: bool = True
    approx_gelu: bool = False

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Shared training-engine knobs.

    Defaults mirror the reference fine-tune script
    (reference: FSC_finetune_cross.py:30-107, run.sh:11-13).
    """

    batch_size: int = 8
    epochs: int = 1000
    warmup_epochs: int = 10
    blr: float = 2e-4
    lr: Optional[float] = None  # resolved as blr * eff_batch / 256
    min_lr: float = 0.0
    weight_decay: float = 0.05
    accum_iter: int = 1
    seed: int = 0
    # Loss pixel-mask keep probability (reference:
    # FSC_finetune_cross.py:290).
    loss_mask_p: float = 0.8
    # bf16 activations during training (params/opt state fp32).
    bf16: bool = True
    output_dir: str = "./out"
    ckpt_every_epochs: int = 50
    log_every_steps: int = 50

    def resolved_lr(self, world_batch: int) -> float:
        if self.lr is not None:
            return self.lr
        # reference: FSC_finetune_cross.py:220-221 (lr = blr * eff/256)
        return self.blr * world_batch / 256.0


@dataclasses.dataclass(frozen=True)
class TestConfig:
    """Inference-engine knobs (reference: FSC_test_cross(few-shot).py:26-78)."""

    split: str = "test"
    external: bool = False
    box_bound: int = -1
    # >= this many tiny (<10x10) exemplars triggers 3x3 grid mode
    # (reference: FSC_test_cross(few-shot).py:59-60, :264-273).
    max_s_cnt: int = 1
    normalization: bool = True
    # Device batch of 384x384 windows. 16 beats 24/32/48/64 at the
    # full-pipeline level on v5e (scripts/ab_pipeline_batch.py,
    # interleaved same-session: 691-693 w/s vs 656-690) and its finer
    # cut granularity lets the window-aware set packer keep sets
    # fuller. Must stay a multiple of the mesh size for sharded runs
    # (the pipeline warns and falls back to single-device otherwise).
    # Note: the packer's zero-tail occupancy guarantee (set totals cut
    # on multiples of batch_windows) holds on SINGLE-device runs, where
    # the chunk stream is unified; sharded runs keep separate
    # plain/resampled streams so a set may still pay one graduated tail
    # per stream (engine/device_pipeline.py run()).
    batch_windows: int = 16
    seed: int = 0


# ---------------------------------------------------------------------------
# Named presets, mirroring the reference factory registry
# (reference: models_mae_cross.py:210-253, models_mae_noct.py:207-234;
# looked up by the scripts as models_mae_cross.__dict__[args.model]).
# ---------------------------------------------------------------------------

COUNTR_PRESETS = {
    # decoder_depth=2 ("dec512d8b" name kept for CLI compat)
    "mae_vit_base_patch16": CounTRConfig(),
    "mae_vit_base_patch16_dec512d8b": CounTRConfig(),
    # 4 interaction blocks
    "mae_vit_base4_patch16": CounTRConfig(decoder_depth=4),
    "mae_vit_base_patch16_fim4": CounTRConfig(decoder_depth=4),
    # 6 interaction blocks — the released-weights config
    "mae_vit_base6_patch16": CounTRConfig(decoder_depth=6),
    "mae_vit_base_patch16_fim6": CounTRConfig(decoder_depth=6),
    "mae_vit_large_patch16": CounTRConfig(embed_dim=1024, depth=24, num_heads=16),
    "mae_vit_huge_patch14": CounTRConfig(
        patch_size=14, embed_dim=1280, depth=32, num_heads=16, img_size=378
    ),
}

MAE_PRESETS = {
    "mae_vit_base_patch16": MAEConfig(),
    "mae_vit_large_patch16": MAEConfig(embed_dim=1024, depth=24, num_heads=16),
    "mae_vit_huge_patch14": MAEConfig(
        patch_size=14, embed_dim=1280, depth=32, num_heads=16, img_size=378
    ),
}

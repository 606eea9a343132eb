"""Shared CLI plumbing: argument groups, model build, weight loading.

The reference duplicates its argparse block per script (reference:
FSC_finetune_cross.py:30-107, FSC_pretrain.py:33-108,
FSC_test_cross(few-shot).py:26-78); here every entry point composes
these groups. Dataset path flags mirror the reference's names.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from countr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def add_data_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data_path", default="./data/FSC147/", type=str)
    p.add_argument("--anno_file", default="annotation_FSC147_384.json", type=str)
    p.add_argument("--data_split_file", default="Train_Test_Val_FSC_147.json", type=str)
    p.add_argument("--im_dir", default="images_384_VarV2", type=str)
    p.add_argument("--class_file", default="ImageClasses_FSC147.txt", type=str)
    p.add_argument("--output_dir", default="./out", type=str)


def add_model_args(p: argparse.ArgumentParser, default_model: str = "mae_vit_base_patch16") -> None:
    p.add_argument("--model", default=default_model, type=str,
                   help="model preset name (see countr_tpu.config.COUNTR_PRESETS)")
    p.add_argument("--resume", default="", type=str,
                   help=".pth checkpoint (reference format) or orbax dir")
    p.add_argument("--dtype", default="bf16",
                   choices=["bf16", "fp32", "mixed", "mixed_fast",
                            "mixed_bal"],
                   help="compute dtype; fp32 gives bit-parity with the torch "
                        "reference; mixed = bf16 encoder/decoder + fp32 "
                        "density head (cuts bf16 count error ~5x at half "
                        "speed); mixed_fast runs the fp32 head at "
                        "Precision.HIGH (3-pass MXU) — mixed-level "
                        "accuracy, faster; mixed_bal additionally runs "
                        "head stages 0-2 in bf16 (the round-5 head "
                        "bisection: error concentrates in the last conv "
                        "stage + pred) — ~14%% faster than mixed_fast at "
                        "~2.4x its max count deviation (docs/PARITY.md)")
    p.add_argument("--exact_gelu", action="store_true",
                   help="force exact erf GELU even in bf16/mixed modes "
                        "(the bf16 fast path defaults to tanh GELU, whose "
                        "error is below bf16 rounding)")
    p.add_argument("--unfreeze_encoder", action="store_true",
                   help="train the ViT encoder too (the reference "
                        "freezes it via torch.no_grad, "
                        "models_mae_cross.py:204-205 — unfreezing is "
                        "for training without a pretrained encoder)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (the TPU-side equivalent "
                        "of the reference's CUDA_LAUNCH_BLOCKING debugging)")
    p.add_argument("--wandb_project", default="", type=str,
                   help="log to this W&B project when the client is available")
    p.add_argument("--wandb_title", default="", type=str,
                   help="W&B run name (reference --title)")
    p.add_argument("--wandb_team", default="", type=str,
                   help="W&B entity/team (reference --team)")
    p.add_argument("--wandb_id", default="", type=str,
                   help="W&B run id to resume (reference --wandb_id)")


def make_wandb(args, enabled: bool = True):
    """Rank-0 W&B writer honoring the reference's flag set."""
    from countr_tpu.utils.metrics import WandbWriter

    return WandbWriter(
        (getattr(args, "wandb_project", "") or None) if enabled else None,
        run_name=getattr(args, "wandb_title", "") or None,
        config=vars(args),
        team=getattr(args, "wandb_team", "") or None,
        run_id=getattr(args, "wandb_id", "") or None,
    )


def parse_dtype(name: str):
    return jnp.float32 if name == "fp32" else jnp.bfloat16


def parse_head_dtype(name: str):
    """Density-head dtype override: the mixed modes keep it fp32."""
    return jnp.float32 if name in ("mixed", "mixed_fast", "mixed_bal") else None


def parse_head_stage_dtypes(name: str):
    """mixed_bal: bf16 head stages 0-2 under the fp32-HIGH tail — the
    round-5 head bisection places the count error in the last conv
    stage + pred (docs/PARITY.md), so the cheap early stages ride bf16."""
    if name == "mixed_bal":
        return (jnp.bfloat16, jnp.bfloat16, jnp.bfloat16, None, None)
    return None


def load_meta(args):
    from countr_tpu.data.fsc147 import FSC147Meta

    return FSC147Meta.load(
        args.data_path, args.anno_file, args.data_split_file, args.im_dir,
        args.class_file,
    )


def apply_runtime_flags(args) -> None:
    if getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)


def build_counting_model(args, training: bool = False) -> Tuple[object, dict]:
    """Build the counting model and load weights per --resume:
    - path ending in .pth: reference torch checkpoint via the converter
      (covers released FSC147 weights; reference loader equivalent:
      util/misc.py:363-376)
    - directory: orbax checkpoint saved by our trainer
    - empty: random init (useful for smoke tests only)

    ``training=True`` (the finetune CLIs) keeps the standalone Pallas
    LN + attention kernels instead of the fused half-block: the fused
    kernel wins forward-only (+1.5 ms/fwd) but its custom VJP loses the
    round trip in training (finetune b8 64.7 vs 63.8 ms/step, pretrain
    b16 49.4 vs 44.0 — scripts/ab_train_fused.py, docs/PROFILE.md).
    """
    from countr_tpu.models import build_countr
    from countr_tpu.engine import checkpoint as ckpt

    apply_runtime_flags(args)
    dtype = parse_dtype(args.dtype)
    kw = {}
    if getattr(args, "unfreeze_encoder", False):
        kw["freeze_encoder"] = False
    model = build_countr(
        args.model, dtype=dtype,
        head_dtype=parse_head_dtype(args.dtype),
        head_stage_dtypes=parse_head_stage_dtypes(args.dtype),
        head_precision_high=args.dtype in ("mixed_fast", "mixed_bal"),
        # bf16 fast mode: fused Pallas attention/LayerNorm kernels and
        # tanh GELU (2.1x the fp32-op throughput at batch 32 on v5e,
        # scripts/profile_forward.py); fp32 keeps the exact parity ops.
        use_pallas_attention=dtype == jnp.bfloat16,
        fused_attn_block=not training,
        approx_gelu=dtype == jnp.bfloat16
        and not getattr(args, "exact_gelu", False),
        # Fused subpixel head (exact; ops/subpixel.py) in the bf16 fast
        # mode. The mixed modes keep the fp32 head on the reference
        # formulation measured for their PARITY.md numbers.
        subpixel_head=(parse_head_dtype(args.dtype) or dtype) == jnp.bfloat16,
        **kw,
    )
    cfg = model.cfg

    imgs = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    boxes = jnp.zeros((1, 3, 64, 64, 3), jnp.float32)
    if args.resume and args.resume.endswith(".pth"):
        sd = ckpt.load_torch_checkpoint(args.resume)
        params = ckpt.convert_countr_state_dict(
            sd, depth=cfg.depth, decoder_depth=cfg.decoder_depth
        )
        params = jax.tree.map(jnp.asarray, params)
    else:
        params = jax.jit(model.init, static_argnums=(3,))(
            jax.random.key(args.seed), imgs, boxes, 3
        )
        if args.resume:
            # works for both params-only and full-TrainState checkpoints
            params = ckpt.restore_params(args.resume, params)
            print(f"restored orbax checkpoint from {args.resume}")
    return model, params


def ensure_outdir(args) -> Optional[str]:
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
    return args.output_dir or None

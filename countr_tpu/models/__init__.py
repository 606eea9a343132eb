"""Model registry.

Mirrors the reference's name-indexed factory lookup
(reference: FSC_finetune_cross.py:213 — models_mae_cross.__dict__[name],
FSC_pretrain.py:202) with an explicit registry.
"""

from countr_tpu.config import COUNTR_PRESETS, MAE_PRESETS, CounTRConfig, MAEConfig
from countr_tpu.models.countr import CounTR  # noqa: F401
from countr_tpu.models.mae import MaskedAutoencoderViT  # noqa: F401


def build_countr(name: str = "mae_vit_base6_patch16", **overrides) -> CounTR:
    cfg = COUNTR_PRESETS[name]
    if overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **overrides)
    return CounTR(cfg)


def build_mae(name: str = "mae_vit_base_patch16", **overrides) -> MaskedAutoencoderViT:
    cfg = MAE_PRESETS[name]
    if overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **overrides)
    return MaskedAutoencoderViT(cfg)

"""countr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) generalised visual counting framework.

Re-designed from scratch with the capabilities of CounTR ("CounTR:
Transformer-based Generalised Visual Counting", BMVC 2022): MAE
pre-training of a ViT encoder, exemplar-conditioned cross-attention
density regression, and sliding-window counting inference — built
TPU-first: NHWC layouts, bf16 MXU compute, batched-window inference,
data-parallel pjit over a device mesh, Pallas kernels on the hot paths.

Reference behavior parity targets are cited per-module as
``reference: <file>:<lines>`` docstring notes (files under the upstream
CounTR repo).
"""

__version__ = "0.1.0"

from countr_tpu.config import CounTRConfig, MAEConfig  # noqa: F401

_LAZY = {
    # jax-heavy symbols resolved on first use so `import countr_tpu`
    # stays light for host-only tooling
    "CountingEngine": ("countr_tpu.engine.inference", "CountingEngine"),
    "count_image": ("countr_tpu.engine.inference", "count_image"),
    "build_countr": ("countr_tpu.models", "build_countr"),
    "build_mae": ("countr_tpu.models", "build_mae"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, sym = _LAZY[name]
        return getattr(importlib.import_module(mod), sym)
    raise AttributeError(f"module 'countr_tpu' has no attribute {name!r}")

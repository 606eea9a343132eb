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

"""Persistent XLA compilation cache.

Full-model compiles on the axon TPU backend take minutes (measured:
~3 min for a batch-1 ViT-B forward); the on-disk cache makes every
subsequent process start in seconds. Enabled by every CLI/bench entry
point; set COUNTR_TPU_CACHE_DIR to relocate, or =0 to disable.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    loc = os.environ.get("COUNTR_TPU_CACHE_DIR", "~/.cache/countr_tpu_xla")
    if loc == "0":
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", os.path.expanduser(loc))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

"""Probe: which XLA matmul precision matches the Mosaic lowering of the
fused kernels when handed fp32 inputs?

The on-chip parity gate (scripts/validate_fast_mode.py) runs an fp32
pass intended to catch LOGIC bugs with tight tolerances. That only
works if both sides use the same matmul precision: the XLA reference
defaults to Precision.HIGHEST for fp32 (ops/attention.py:18), while
Mosaic lowers an fp32 ``lax.dot_general`` at whatever the hardware
default is. This probe measures fused-vs-XLA normalized deviation at
DEFAULT / HIGH / HIGHEST reference precision so the gate can pin the
matching one.

  python scripts/probe_fp32_precision.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def nd(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)) / max(float(np.max(np.abs(b))), 1e-30))


def main():
    import jax
    import jax.numpy as jnp

    from countr_tpu.ops.attention import multi_head_attention
    from countr_tpu.ops.pallas_attn import fused_attention
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    b, n, c, h = 4, 576, 768, 12
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
        for _ in range(3)
    )
    got = jax.jit(fused_attention, static_argnums=3)(q, k, v, h)
    for prec in ("DEFAULT", "HIGH", "HIGHEST"):
        want = jax.jit(
            multi_head_attention, static_argnums=(3,), static_argnames=("precision",)
        )(q, k, v, h, precision=getattr(jax.lax.Precision, prec))
        print(f"  fused_attention fp32 vs XLA {prec:8s} norm-dev {nd(got, want):.3e}",
              flush=True)


if __name__ == "__main__":
    main()

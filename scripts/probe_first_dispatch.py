"""Probe: decompose the per-process first-call penalty on the axon TPU.

probe_cache.py showed a ~36-90 s first jitted call even when the
persistent compile cache HITS (second executable in the same process:
0.26 s). This probe times each candidate stage separately:

  1. backend init (jax.devices())
  2. first trivial dispatch (jnp.add of committed device scalars)
  3. first H2D transfer
  4. first cached-executable call (fused block, known cache entry)
  5. second distinct cached executable

  python scripts/probe_first_dispatch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    t = time.perf_counter

    t0 = t()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"import+cfg: {t() - t0:.2f}s", flush=True)

    t0 = t()
    dev = jax.devices()[0]
    print(f"backend init: {t() - t0:.2f}s ({dev})", flush=True)

    t0 = t()
    one = jax.device_put(np.float32(1.0), dev)
    print(f"first H2D (scalar): {t() - t0:.2f}s", flush=True)

    t0 = t()
    float(jnp.add(one, one))
    print(f"first trivial dispatch: {t() - t0:.2f}s", flush=True)

    t0 = t()
    x = jax.device_put(np.zeros((1 << 20,), np.float32), dev)
    x.block_until_ready()
    print(f"4 MB H2D: {t() - t0:.2f}s", flush=True)

    rng = np.random.default_rng(0)
    from countr_tpu.ops.pallas_block import fused_attention_block

    c, h = 768, 12
    xx = jnp.asarray(rng.standard_normal((8, 576, c)), jnp.bfloat16)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)  # noqa: E731
    args = (xx, 1.0 + r(c), r(c), r(c, 3 * c), r(3 * c), r(c, c), r(c))

    t0 = t()
    f1 = jax.jit(lambda *a: fused_attention_block(*a, h).sum())
    float(f1(*args))
    print(f"first cached executable: {t() - t0:.2f}s", flush=True)

    w = jnp.asarray(rng.standard_normal((768, 768)), jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((576, 768)), jnp.bfloat16)

    t0 = t()

    @jax.jit
    def plain(y, w):
        for _ in range(24):
            y = jnp.tanh(y @ w)
        return y.sum()

    float(plain(y, w))
    print(f"second cached executable (plain chain): {t() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()

"""Probe: does the persistent XLA compile cache actually HIT across
processes on the axon TPU backend, and which programs miss?

BENCH warmup regressed 9.9 s (r02) -> 42.8 s (r03) -> ~100 s (r04 runs)
even across back-to-back runs of identical code, which means the first
``count_batch`` recompiles every time. This probe jits one fused-block
forward (Pallas custom call inside) and one plain XLA matmul chain,
times first-call latency, and prints the cache dir's entry count
before/after plus JAX's own cache-miss explanations.

Run it twice in a row; the second run's timings tell the story:

  python scripts/probe_cache.py          # first (may compile)
  python scripts/probe_cache.py          # second (should be instant)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import glob

    cache_dir = os.path.expanduser(
        os.environ.get("COUNTR_TPU_CACHE_DIR", "~/.cache/countr_tpu_xla")
    )
    n0 = len(glob.glob(os.path.join(cache_dir, "*")))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    try:
        jax.config.update("jax_explain_cache_misses", True)
    except Exception:
        pass
    print(f"device={jax.devices()[0]}  cache entries before: {n0}", flush=True)

    rng = np.random.default_rng(0)

    # 1. plain XLA program (no Pallas)
    w = jnp.asarray(rng.standard_normal((768, 768)), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((576, 768)), jnp.bfloat16)

    @jax.jit
    def plain(x, w):
        for _ in range(24):
            x = jnp.tanh(x @ w)
        return x.sum()

    t0 = time.perf_counter()
    float(plain(x, w))
    print(f"plain XLA first call: {time.perf_counter() - t0:.2f}s", flush=True)

    # 2. program containing a Pallas (Mosaic) custom call
    from countr_tpu.ops.pallas_block import fused_attention_block

    c, h = 768, 12
    xx = jnp.asarray(rng.standard_normal((8, 576, c)), jnp.bfloat16)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)  # noqa: E731
    args = (xx, 1.0 + r(c), r(c), r(c, 3 * c), r(3 * c), r(c, c), r(c))

    @jax.jit
    def fused(*a):
        return fused_attention_block(*a, h).sum()

    t0 = time.perf_counter()
    float(fused(*args))
    print(f"pallas fused first call: {time.perf_counter() - t0:.2f}s", flush=True)

    n1 = len(glob.glob(os.path.join(cache_dir, "*")))
    print(f"cache entries after: {n1} (delta {n1 - n0})", flush=True)


if __name__ == "__main__":
    main()

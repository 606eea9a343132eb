"""Amortized attention-core timings (12 chained calls in one jit).

  python scripts/profile_attn.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.ops.attention import multi_head_attention
    from countr_tpu.ops.pallas_attn import fused_attention
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    iters, layers = 10, 12

    def timeit(name, f, *args):
        def looped(*a):
            def body(carry, _):
                x = a[0] + (carry * 1e-12).astype(a[0].dtype)
                for _ in range(layers):
                    x = f(x, *a[1:])
                return jnp.float32(x.ravel()[0]) * 1e-12, None

            return lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

        run = jax.jit(looped)
        _ = float(run(*args))
        t0 = time.perf_counter()
        _ = float(run(*args))
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name:<46s} {dt * 1e3:8.3f} ms /12 calls", flush=True)
        return dt

    rng = np.random.default_rng(0)
    for (b, n, c, heads) in [(32, 576, 768, 12), (32, 576, 512, 16)]:
        x = jnp.asarray(rng.uniform(-1, 1, (b, n, c)), jnp.bfloat16)
        print(f"shape b={b} n={n} c={c} heads={heads}", flush=True)
        timeit("XLA attention (q=k=v=x)",
               lambda x: multi_head_attention(x, x, x, heads), x)
        timeit("Pallas attention (q=k=v=x)",
               lambda x: fused_attention(x, x, x, heads), x)


if __name__ == "__main__":
    main()

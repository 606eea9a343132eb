"""Decoder-stack (6 CrossAttentionBlocks) timing under op variants.

  python scripts/profile_decoder.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.models.countr import CrossAttentionBlock
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    iters = 20
    b, n, c, heads, nk = 32, 576, 512, 16, 3

    def timeit(name, f, *args):
        def looped(*a):
            def body(carry, _):
                a0 = a[0] + (carry * 1e-12).astype(a[0].dtype)
                out = f(a0, *a[1:])
                return jnp.float32(out.ravel()[0]) * 1e-12, None

            return lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

        run = jax.jit(looped)
        _ = float(run(*args))
        t0 = time.perf_counter()
        _ = float(run(*args))
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name:<46s} {dt * 1e3:8.3f} ms", flush=True)
        return dt

    class Stack(nn.Module):
        use_pallas: bool
        approx_gelu: bool

        @nn.compact
        def __call__(self, x, y):
            for i in range(6):
                x = CrossAttentionBlock(
                    heads, dtype=jnp.bfloat16, use_pallas=self.use_pallas,
                    approx_gelu=self.approx_gelu, name=f"blk{i}",
                )(x, y)
            return x

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (b, n, c)), jnp.bfloat16)
    y = jnp.asarray(rng.uniform(-1, 1, (b, nk, c)), jnp.bfloat16)

    for pallas in (False, True):
        for approx in (False, True):
            m = Stack(pallas, approx)
            p = jax.jit(m.init)(jax.random.key(0), x, y)
            timeit(
                f"6 blocks pallas={int(pallas)} approx_gelu={int(approx)}",
                lambda xx, pp, yy, m=m: m.apply(pp, xx, yy), x, p, y,
            )


if __name__ == "__main__":
    main()

"""Encoder attribution without dispatch floors: each variant runs a
12-layer chain inside one jit, so per-op costs are amortized.

  python scripts/profile_encoder2.py
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

    from countr_tpu.ops.pallas_attn import fused_attention
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    iters, layers = 10, 12
    b, n, c, heads, hidden = 32, 576, 768, 12, 3072

    def timeit(name, f, *args):
        def looped(*a):
            def body(carry, _):
                a0 = a[0] + (carry * 1e-12).astype(a[0].dtype)
                x = a0
                for _ in range(layers):
                    x = f(x, *a[1:])
                return jnp.float32(x.ravel()[0]) * 1e-12, None

            return lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

        run = jax.jit(looped)
        _ = float(run(*args))
        t0 = time.perf_counter()
        _ = float(run(*args))
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name:<46s} {dt * 1e3:8.3f} ms /12-layer chain", flush=True)
        return dt

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (b, n, c)), jnp.bfloat16)
    w_qkv = jnp.asarray(rng.uniform(-0.02, 0.02, (c, 3 * c)), jnp.bfloat16)
    w_proj = jnp.asarray(rng.uniform(-0.02, 0.02, (c, c)), jnp.bfloat16)
    w_fc1 = jnp.asarray(rng.uniform(-0.02, 0.02, (c, hidden)), jnp.bfloat16)
    w_fc2 = jnp.asarray(rng.uniform(-0.02, 0.02, (hidden, c)), jnp.bfloat16)

    def ln(x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        return ((x32 - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)

    def matmuls_only(x, wq, wp, w1, w2):
        qkv = x @ wq
        q, k, v = jnp.split(qkv, 3, axis=-1)
        x = x + q @ wp[:768]  # stand-in for attn-out @ proj
        h = x @ w1
        return x + h @ w2

    def mlp_block(x, w1, w2):
        h = jax.nn.gelu(x @ w1, approximate=True)
        return x + h @ w2

    def attn_block(x, wq, wp):
        qkv = x @ wq
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return x + fused_attention(q, k, v, heads) @ wp

    def full_block(x, wq, wp, w1, w2):
        x = attn_block(ln(x), wq, wp) + x - x  # keep shapes; ln cost in
        return x + jax.nn.gelu(ln(x) @ w1, approximate=True) @ w2

    def real_block(x, wq, wp, w1, w2):
        x = x + _attn(ln(x), wq, wp)
        return x + jax.nn.gelu(ln(x) @ w1, approximate=True) @ w2

    def _attn(xn, wq, wp):
        qkv = xn @ wq
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return fused_attention(q, k, v, heads) @ wp

    timeit("LN only (x2 per layer)", lambda x: ln(ln(x)), x)
    timeit("matmuls only (qkv+proj+fc1+fc2)", matmuls_only, x, w_qkv, w_proj, w_fc1, w_fc2)
    timeit("mlp block (fc1+gelu+fc2)", mlp_block, x, w_fc1, w_fc2)
    timeit("attn block (qkv+pallas+proj)", attn_block, x, w_qkv, w_proj)
    timeit("real block (full)", real_block, x, w_qkv, w_proj, w_fc1, w_fc2)


if __name__ == "__main__":
    main()

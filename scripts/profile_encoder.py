"""Per-op attribution inside one ViT encoder block (batch 32, bf16).

  python scripts/profile_encoder.py
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

    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    iters = 20
    b, n, c, heads = 32, 576, 768, 12
    hidden = 3072

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

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (b, n, c)), jnp.bfloat16)
    w_qkv = jnp.asarray(rng.uniform(-0.02, 0.02, (c, 3 * c)), jnp.float32)
    w_fc1 = jnp.asarray(rng.uniform(-0.02, 0.02, (c, hidden)), jnp.float32)
    w_fc2 = jnp.asarray(rng.uniform(-0.02, 0.02, (hidden, c)), jnp.float32)
    h = jnp.asarray(rng.uniform(-1, 1, (b, n, hidden)), jnp.bfloat16)

    from countr_tpu.ops.attention import multi_head_attention
    from countr_tpu.ops.pallas_attn import fused_attention

    print(f"one encoder block's ops (b={b}, n={n}, c={c}):", flush=True)
    timeit("LayerNorm fp32 stats", lambda x: _ln(x), x)
    timeit("qkv matmul (768->2304)", lambda x, w: (x @ w.astype(x.dtype)), x, w_qkv)
    timeit("fc1 matmul (768->3072)", lambda x, w: (x @ w.astype(x.dtype)), x, w_fc1)
    timeit("fc2 matmul (3072->768)", lambda h, w: (h @ w.astype(h.dtype)), h, w_fc2)
    timeit("gelu exact fp32 (on 3072)", lambda h: jax.nn.gelu(
        h.astype(jnp.float32), approximate=False).astype(h.dtype), h)
    timeit("gelu exact bf16 (on 3072)", lambda h: jax.nn.gelu(
        h, approximate=False), h)
    timeit("gelu tanh bf16 (on 3072)", lambda h: jax.nn.gelu(
        h, approximate=True), h)
    q = jnp.asarray(rng.uniform(-1, 1, (b, n, c)), jnp.bfloat16)
    timeit("XLA attention core", lambda q: multi_head_attention(q, q, q, heads), q)
    timeit("Pallas attention core", lambda q: fused_attention(q, q, q, heads), q)


def _ln(x):
    import jax
    import jax.numpy as jnp

    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    return y.astype(x.dtype)


if __name__ == "__main__":
    main()

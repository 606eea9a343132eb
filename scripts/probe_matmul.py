"""DEPRECATED — measurements from this script are INVALID; use
scripts/probe_ab.py instead and see docs/PROFILE.md ("Isolated-op
rates").  The additive perturbation of a loop-invariant operand is
linear through dot/conv, so XLA hoists the matmul out of the scan and
the wall time collapses to the ~30-40 ms per-dispatch tunnel floor —
which is why every "variant" here measures the same time.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from countr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def note(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, *args, iters=30, reps=5):
    out = jax.jit(fn, static_argnums=(len(args),)).lower(*args, iters).compile()
    float(jnp.sum(out(*args)))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        s = float(jnp.sum(out(*args)))
        best = min(best, (time.perf_counter() - t0) / iters)
    assert np.isfinite(s)
    return best


def report(name, t, flops):
    note(f"{name:42s}: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TFLOP/s")


def main():
    rng = np.random.default_rng(0)
    m, k, n = 32 * 576, 768, 3072
    flops = 2 * m * k * n

    a = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)

    def mk_loop(op, cast=jnp.bfloat16):
        def loop(a, b, iters):
            def body(c, _):
                aa = a + c.astype(a.dtype) * a.dtype.type(1e-8) if a.dtype != jnp.int8 else a
                o = op(aa, b)
                return c + o.reshape(-1)[0].astype(jnp.float32), ()
            c, _ = lax.scan(body, jnp.float32(0), None, length=iters)
            return c
        return loop

    # 1. plain dot, bf16 out
    report("dot bf16->bf16", timed(mk_loop(jnp.dot), a, b), flops)

    # 2. dot with fp32 output
    report(
        "dot bf16->f32",
        timed(mk_loop(lambda x, y: lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )), a, b),
        flops,
    )

    # 3. as 1x1 conv NHWC (image [32, 24, 24, 768] -> 3072)
    a4 = a.reshape(32, 24, 24, k)
    b4 = b.reshape(1, 1, k, n)
    report(
        "conv1x1 NHWC",
        timed(mk_loop(lambda x, y: lax.conv_general_dilated(
            x, y, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )), a4, b4),
        flops,
    )

    # 4. as 3D batch: [32, 576, 768] x [768, 3072]
    a3 = a.reshape(32, 576, k)
    report(
        "dot3d [32,576,768]x[768,3072]",
        timed(mk_loop(lambda x, y: jnp.matmul(x, y)), a3, b),
        flops,
    )

    # 5. transposed weight layout: w [n, k], contract on k
    bt = jnp.asarray(np.ascontiguousarray(np.array(b).T), jnp.bfloat16)
    report(
        "dot w-transposed [m,k]x[n,k]^T",
        timed(mk_loop(lambda x, y: lax.dot_general(
            x, y, (((1,), (1,)), ((), ()))
        )), a, bt),
        flops,
    )

    # 6. fc2 shape: [18432, 3072] x [3072, 768]
    a2 = jnp.asarray(rng.normal(size=(m, n)), jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(n, k)), jnp.bfloat16)
    report("fc2 dot [m,3072]x[3072,768]", timed(mk_loop(jnp.dot), a2, b2), flops)

    # 7. qkv shape: [18432, 768] x [768, 2304]
    bq = jnp.asarray(rng.normal(size=(k, 3 * k)), jnp.bfloat16)
    report(
        "qkv dot [m,768]x[768,2304]",
        timed(mk_loop(jnp.dot), a, bq),
        2 * m * k * 3 * k,
    )

    # 8. fused mlp: fc1 + bias + gelu + fc2 (the real block cost)
    bias1 = jnp.asarray(rng.normal(size=(n,)), jnp.bfloat16)
    bias2 = jnp.asarray(rng.normal(size=(k,)), jnp.bfloat16)

    def mlp(x, w1, iters):
        def body(c, _):
            xx = x + c.astype(x.dtype) * jnp.bfloat16(1e-8)
            h = jnp.dot(xx, w1) + bias1
            h = jax.nn.gelu(h, approximate=True)
            o = jnp.dot(h, b2) + bias2
            return c + o[0, 0].astype(jnp.float32), ()
        c, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    report("mlp fc1+gelu+fc2", timed(mlp, a, b), 2 * flops)

    # 9. bigger M: all 48 batch
    m2 = 48 * 576
    a_big = jnp.asarray(rng.normal(size=(m2, k)), jnp.bfloat16)
    report(
        "dot M=48*576", timed(mk_loop(jnp.dot), a_big, b), 2 * m2 * k * n
    )


if __name__ == "__main__":
    main()

"""DEPRECATED — measurements from this script are INVALID; use
scripts/probe_ab.py instead and see docs/PROFILE.md ("Isolated-op
rates").  Two flaws, kept here as a methodology record:

1. The scan "perturbation" is additive on a loop-invariant operand,
   and dot/conv are linear — XLA's algebraic simplifier hoists the
   real matmul out of the loop.
2. iters x compute is smaller than the ~30-40 ms per-dispatch tunnel
   floor, so wall time measures the RTT, not the op.
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


def timed(fn, *args, iters=50, reps=5):
    out = jax.jit(fn, static_argnums=(len(args),)).lower(*args, iters).compile()
    float(jnp.sum(out(*args)))  # warmup
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = out(*args)
        s = float(jnp.sum(r))
        dt = (time.perf_counter() - t0) / iters
        best = min(best, dt)
    assert np.isfinite(s)
    return best


def main():
    rng = np.random.default_rng(0)
    # MLP fc1 shape at bench batch: [32*576, 768] x [768, 3072]
    m, k, n = 32 * 576, 768, 3072
    a_f = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    b_f = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
    a_i = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    b_i = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)

    def loop_bf16(a, b, iters):
        def body(c, _):
            o = jnp.dot(a + c.astype(a.dtype) * jnp.bfloat16(1e-8), b)
            return c + o[0, 0].astype(jnp.float32), ()
        c, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    def loop_int8(a, b, iters):
        def body(c, _):
            aa = a + (c % 2).astype(jnp.int8)  # data dep, keeps int8
            o = lax.dot_general(
                aa, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return c + o[0, 0], ()
        c, _ = lax.scan(body, jnp.int32(0), None, length=iters)
        return c

    def loop_int8_deq(a, b, iters):
        # realistic: int8 dot + fp32 dequant scale epilogue
        sa = jnp.float32(0.01)
        sb = jnp.ones((n,), jnp.float32) * 0.02
        def body(c, _):
            aa = a + (c.astype(jnp.int32) % 2).astype(jnp.int8)
            o = lax.dot_general(
                aa, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            o = o.astype(jnp.float32) * (sa * sb)
            return c + o[0, 0], ()
        c, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    gflop = 2 * m * k * n / 1e9
    note("timing bf16 matmul...")
    t = timed(loop_bf16, a_f, b_f)
    note(f"bf16   [{m}x{k}x{n}]: {t*1e3:.3f} ms  {gflop/t/1e3:.1f} TFLOP/s")
    note("timing int8 matmul...")
    t8 = timed(loop_int8, a_i, b_i)
    note(f"int8   [{m}x{k}x{n}]: {t8*1e3:.3f} ms  {gflop/t8/1e3:.1f} TOP/s")
    note("timing int8+deq matmul...")
    t8d = timed(loop_int8_deq, a_i, b_i)
    note(f"int8+deq          : {t8d*1e3:.3f} ms  {gflop/t8d/1e3:.1f} TOP/s")

    # conv3x3 256ch at 96x96 (head stage 2 shape)
    hc = 96
    x_f = jnp.asarray(rng.normal(size=(32, hc, hc, 256)), jnp.bfloat16)
    w_f = jnp.asarray(rng.normal(size=(3, 3, 256, 256)), jnp.bfloat16)
    x_i = jnp.asarray(rng.integers(-127, 128, (32, hc, hc, 256)), jnp.int8)
    w_i = jnp.asarray(rng.integers(-127, 128, (3, 3, 256, 256)), jnp.int8)

    def conv_bf16(x, w, iters):
        def body(c, _):
            o = lax.conv_general_dilated(
                x + c.astype(x.dtype) * jnp.bfloat16(1e-8), w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return c + o[0, 0, 0, 0].astype(jnp.float32), ()
        c, _ = lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    def conv_int8(x, w, iters):
        def body(c, _):
            o = lax.conv_general_dilated(
                x + (c % 2).astype(jnp.int8), w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            return c + o[0, 0, 0, 0], ()
        c, _ = lax.scan(body, jnp.int32(0), None, length=iters)
        return c

    cgflop = 2 * 32 * hc * hc * 256 * 256 * 9 / 1e9
    note("timing bf16 conv...")
    t = timed(conv_bf16, x_f, w_f, iters=20)
    note(f"conv bf16 [32,{hc}²,256]: {t*1e3:.3f} ms  {cgflop/t/1e3:.1f} TFLOP/s")
    try:
        note("timing int8 conv...")
        t8 = timed(conv_int8, x_i, w_i, iters=20)
        note(f"conv int8 [32,{hc}²,256]: {t8*1e3:.3f} ms  {cgflop/t8/1e3:.1f} TOP/s")
    except Exception as e:
        note(f"conv int8 failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

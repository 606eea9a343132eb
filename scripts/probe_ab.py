"""Drift-robust A/B matmul/conv probe.

Methodology (two hazards, both hit by earlier drafts):
1. Additive/scalar perturbations of a loop-invariant operand are
   USELESS for linear ops: dot(a + eps*c, b) = dot(a,b) + eps*c*dot(1,b),
   so XLA hoists the real matmul out of the scan and the "timing"
   collapses to the per-dispatch floor.  Here every iteration's INPUT
   is a nonlinear function (tanh) of the previous OUTPUT — a true
   serial chain that cannot be decomposed.
2. Each host dispatch+fetch costs ~30-40 ms over the tunnel, so
   per-call wall time is max(compute, RTT).  Here each timed call runs
   ITERS=200 chained iterations, and an empty-chain "floor" variant is
   measured and subtracted.

Variants are compiled up front and interleaved round-robin, so the
shared chip's session drift cancels out of within-run ratios.
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


ITERS = 200
CYCLES = 8


def chained(op, feed, x0, *weights):
    """scan: x -> op(x, *weights) -> feed(out) -> next x."""

    def loop(x0, *ws):
        def body(x, _):
            o = op(x, *ws)
            return feed(o), o.reshape(-1)[0].astype(jnp.float32)

        _, ys = lax.scan(body, x0, None, length=ITERS)
        return ys[-1]

    fn = jax.jit(loop).lower(x0, *weights).compile()
    return fn, (x0, *weights)


def main():
    rng = np.random.default_rng(0)
    B, N, C, H = 32, 576, 768, 3072
    m = B * N

    x2 = jnp.asarray(rng.normal(size=(m, C)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(C, H)) * 0.02, jnp.bfloat16)
    wq = jnp.asarray(rng.normal(size=(C, 3 * C)) * 0.02, jnp.bfloat16)
    xh = jnp.asarray(rng.normal(size=(B, 96, 96, 256)), jnp.bfloat16)
    wh = jnp.asarray(rng.normal(size=(3, 3, 256, 256)) * 0.01, jnp.bfloat16)
    x48 = jnp.asarray(rng.normal(size=(48 * N, C)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 128, (m, C)), jnp.int8)
    wi = jnp.asarray(rng.integers(-127, 128, (C, H)), jnp.int8)

    gf_fc1 = 2 * m * C * H

    variants = {
        "floor (empty chain)": (
            chained(lambda x: x * jnp.bfloat16(1.0000001),
                    lambda o: o, jnp.asarray([[1.0]], jnp.bfloat16)), 0),
        "fc1 dot bf16 [18432,768]x[768,3072]": (
            chained(lambda x, w: jnp.dot(x, w),
                    lambda o: jnp.tanh(o[:, :C]), x2, w1), gf_fc1),
        "fc1 dot bf16 -> f32 out": (
            chained(lambda x, w: lax.dot_general(
                        x, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32),
                    lambda o: jnp.tanh(o[:, :C]).astype(jnp.bfloat16),
                    x2, w1), gf_fc1),
        "qkv dot bf16 [18432,768]x[768,2304]": (
            chained(lambda x, w: jnp.dot(x, w),
                    lambda o: jnp.tanh(o[:, :C]), x2, wq), 2 * m * C * 3 * C),
        "fc1 dot bf16 M=48*576": (
            chained(lambda x, w: jnp.dot(x, w),
                    lambda o: jnp.tanh(o[:, :C]), x48, w1),
            2 * 48 * N * C * H),
        "conv3x3 bf16 [32,96,96,256]": (
            chained(lambda x, w: lax.conv_general_dilated(
                        x, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC")),
                    lambda o: jnp.tanh(o), xh, wh),
            2 * B * 96 * 96 * 256 * 256 * 9),
        "fc1 int8 dot -> int32": (
            chained(lambda x, w: lax.dot_general(
                        x, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32),
                    lambda o: (o[:, :C] & 127).astype(jnp.int8), xi, wi),
            gf_fc1),
        "fc1 int8 dot + f32 dequant": (
            chained(lambda x, w: lax.dot_general(
                        x, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * jnp.float32(0.01),
                    lambda o: jnp.clip(o[:, :C], -127, 127).astype(jnp.int8),
                    xi, wi),
            gf_fc1),
    }

    for name, ((fn, args), _) in variants.items():
        float(fn(*args))
        note(f"warm: {name}")

    times = {k: [] for k in variants}
    for cyc in range(CYCLES):
        for name, ((fn, args), _) in variants.items():
            t0 = time.perf_counter()
            float(fn(*args))
            times[name].append((time.perf_counter() - t0) / ITERS)
        note(f"cycle {cyc + 1}/{CYCLES} done")

    floor = float(np.min(times["floor (empty chain)"]))
    note(f"\nper-iter dispatch floor: {floor*1e6:.1f} us")
    for name, ((fn, args), gf) in variants.items():
        if not gf:
            continue
        ts = np.array(times[name]) - floor
        note(
            f"{name:38s}: best {ts.min()*1e3:7.3f} ms ({gf/ts.min()/1e12:6.1f}"
            f" TF/s)  med {np.median(ts)*1e3:7.3f} ms"
            f" ({gf/np.median(ts)/1e12:6.1f} TF/s)"
        )


if __name__ == "__main__":
    main()

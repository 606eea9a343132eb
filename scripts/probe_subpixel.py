"""Probe: fuse the density head's 2x upsample into the next conv3x3.

The head interleaves ``upsample2x_bilinear`` with 3x3 convs (reference:
models_mae_cross.py:80-100); algebraically each up->conv pair equals a
single conv at the LOW resolution producing 4 phase outputs (the
bilinear taps compose with the conv taps into a 3x3 composite kernel
per output phase), followed by a depth-to-space interleave:

  z[2i+p, 2j+q] = (x * K'[p,q])[i, j],   K'[p,q] = T[p] K T[q]^T

with the per-axis tap-composition tensor T[p, t, a] built from the
0.25/0.75 half-pixel weights. Same MXU FLOPs (the output count is
unchanged) — the candidate win is skipping the upsample einsums and
one HBM round trip of the 4x tensor, against the cost of the
depth-to-space transpose.

Variants (chained-tanh + floor subtraction, interleaved round-robin;
see probe_ab.py for the methodology hazards):

  A96     up(96->192) + conv3x3 256->256 @192^2   (current head)
  B96     phase conv3x3 256->1024 @96^2 + depth-to-space
  B96n    phase conv only (GN/ReLU can consume phase layout: group
          stats are layout-invariant, so d2s can defer)
  UP96    the upsample einsums alone (attribution)
  A48/B48 the same pair one stage down (48->96)

A one-time numerical check asserts B == A on the interior (the
composite kernel differs on a 2-px high-res border ring where the
upsample clamps its taps — a production fusion would patch that ring).

  python scripts/probe_subpixel.py [--iters 50] [--cycles 6]
"""

import argparse
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))

import numpy as np


def tap_tensor() -> np.ndarray:
    """T[p, t, a]: weight of low-res x[i+a-1] in conv tap t of output
    phase p (interior rows; out[2i]=.25x[i-1]+.75x[i],
    out[2i+1]=.75x[i]+.25x[i+1])."""
    T = np.zeros((2, 3, 3), np.float32)
    # phase 0: conv taps hit up rows 2i-1, 2i, 2i+1
    T[0, 0] = [0.75, 0.25, 0.0]   # y[2i-1] = .75x[i-1] + .25x[i]
    T[0, 1] = [0.25, 0.75, 0.0]   # y[2i]
    T[0, 2] = [0.0, 0.75, 0.25]   # y[2i+1]
    # phase 1: up rows 2i, 2i+1, 2i+2
    T[1, 0] = [0.25, 0.75, 0.0]
    T[1, 1] = [0.0, 0.75, 0.25]
    T[1, 2] = [0.0, 0.25, 0.75]
    return T


def compose_kernel(K: np.ndarray) -> np.ndarray:
    """[3,3,Cin,Cout] conv kernel -> [3,3,Cin,4*Cout] phase kernel with
    channel order (p, q, cout) matching the d2s reshape below."""
    T = tap_tensor()
    # K'[p,q,a,b,i,o] = sum_{t,s} T[p,t,a] T[q,s,b] K[t,s,i,o]
    Kp = np.einsum("pta,qsb,tsio->pqabio", T, T, K)
    p2, q2, a, b, ci, co = Kp.shape
    return Kp.transpose(2, 3, 4, 0, 1, 5).reshape(a, b, ci, 4 * co)


def depth_to_space(z):
    import jax.numpy as jnp  # noqa: F401

    n, h, w, c4 = z.shape
    c = c4 // 4
    return (
        z.reshape(n, h, w, 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, 2 * h, 2 * w, c)
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", default=50, type=int)
    p.add_argument("--cycles", default=6, type=int)
    p.add_argument("--batch", default=32, type=int)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.ops.upsample import upsample2x_bilinear
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ITERS, CYCLES, B = args.iters, args.cycles, args.batch
    print(f"device={jax.devices()[0]} batch={B} iters={ITERS}", flush=True)

    rng = np.random.default_rng(0)
    C = 256

    def conv(x, w, precision=None):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(x.dtype)

    # ---- one-time interior-correctness check (small, fp32) -------------
    Kf = rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05
    Kpf = compose_kernel(Kf)
    hi = jax.lax.Precision.HIGHEST  # fp32 check must not lower to bf16
    xs = jnp.asarray(rng.normal(size=(1, 16, 16, C)), jnp.float32)
    a_ref = conv(upsample2x_bilinear(xs), jnp.asarray(Kf), hi)
    b_fus = depth_to_space(conv(xs, jnp.asarray(Kpf), hi))
    diff = float(
        jnp.max(jnp.abs(a_ref[:, 2:-2, 2:-2] - b_fus[:, 2:-2, 2:-2]))
    )
    ring = float(jnp.max(jnp.abs(a_ref - b_fus)))
    print(f"interior max|diff| = {diff:.2e} (full incl. border ring "
          f"{ring:.2e})", flush=True)
    assert diff < 1e-4, "phase-conv composition is wrong"

    # ---- timed variants -------------------------------------------------
    K = jnp.asarray(Kf, jnp.bfloat16)
    Kp = jnp.asarray(Kpf, jnp.bfloat16)
    x96 = jnp.asarray(rng.normal(size=(B, 96, 96, C)), jnp.bfloat16)
    x48 = jnp.asarray(rng.normal(size=(B, 48, 48, C)), jnp.bfloat16)

    def chained(op, feed, x0, *ws):
        def loop(x0, *ws):
            def body(x, _):
                o = op(x, *ws)
                return feed(o), o.reshape(-1)[0].astype(jnp.float32)

            _, ys = lax.scan(body, x0, None, length=ITERS)
            return ys[-1]

        return jax.jit(loop).lower(x0, *ws).compile(), (x0, *ws)

    def feed_crop(r):
        return lambda o: jnp.tanh(o[:, :r, :r, :])

    def feed_chan(o):
        return jnp.tanh(o[..., :C])

    gconv96 = 2 * B * 192 * 192 * 9 * C * C
    gup96 = 2 * B * C * 96 * 96 * 192 + 2 * B * C * 192 * 96 * 192
    gconv48 = 2 * B * 96 * 96 * 9 * C * C

    variants = {
        "floor": (chained(
            lambda x: x * jnp.bfloat16(1.0000001), lambda o: o,
            jnp.asarray([[1.0]], jnp.bfloat16)), 0),
        "A96 up+conv @192": (chained(
            lambda x, w: conv(upsample2x_bilinear(x), w),
            feed_crop(96), x96, K), gconv96 + gup96),
        "B96 phase conv + d2s": (chained(
            lambda x, w: depth_to_space(conv(x, w)),
            feed_crop(96), x96, Kp), gconv96),
        "B96n phase conv only": (chained(
            lambda x, w: conv(x, w), feed_chan, x96, Kp), gconv96),
        "UP96 upsample alone": (chained(
            lambda x: upsample2x_bilinear(x), feed_crop(96), x96), gup96),
        "A48 up+conv @96": (chained(
            lambda x, w: conv(upsample2x_bilinear(x), w),
            feed_crop(48), x48, K), gconv48),
        "B48 phase conv + d2s": (chained(
            lambda x, w: depth_to_space(conv(x, w)),
            feed_crop(48), x48, Kp), gconv48),
    }

    for name, ((fn, a), _) in variants.items():
        float(fn(*a))
        print(f"warm: {name}", file=sys.stderr, flush=True)

    times = {k: [] for k in variants}
    for cyc in range(CYCLES):
        for name, ((fn, a), _) in variants.items():
            t0 = time.perf_counter()
            float(fn(*a))
            times[name].append((time.perf_counter() - t0) / ITERS)
        print(f"cycle {cyc + 1}/{CYCLES}", file=sys.stderr, flush=True)

    floor = float(np.min(times["floor"]))
    print(f"per-iter floor {floor * 1e6:.1f} us", flush=True)
    for name, (_, gf) in variants.items():
        if name == "floor":
            continue
        ts = np.asarray(times[name]) - floor
        tf = f" ({gf / ts.min() / 1e12:6.1f} TF/s)" if gf else ""
        print(f"{name:24s} best {ts.min() * 1e3:7.3f} ms{tf}  "
              f"med {np.median(ts) * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()

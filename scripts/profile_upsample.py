"""Microbenchmark of 2x bilinear upsample formulations on TPU.

The density head's upsamples dominate its runtime (profile_forward.py:
the 96->192 upsample alone ~19 ms at batch 32 vs ~10 ms for the 43
GFLOP conv that follows). This compares exact align_corners=False
formulations at the hot shapes to pick the fastest.

  python scripts/profile_upsample.py
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

    from countr_tpu.ops.upsample import upsample2x_bilinear
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    iters = 10

    def timeit(name, f, x):
        def looped(x):
            def body(c, _):
                out = f(x + (c * 1e-12).astype(x.dtype))
                return jnp.float32(out.ravel()[0]) * 1e-12, None

            return lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

        run = jax.jit(looped)
        _ = float(run(x))
        t0 = time.perf_counter()
        _ = float(run(x))
        dt = (time.perf_counter() - t0) / iters
        print(f"  {name:<40s} {dt * 1e3:8.3f} ms", flush=True)
        return dt

    def up_resize(x):
        n, h, w, c = x.shape
        return jax.image.resize(
            x, (n, 2 * h, 2 * w, c), method="bilinear", antialias=False
        ).astype(x.dtype)

    def up_phases_transpose(x):
        """Compute 4 phase maps then one 6-d transpose+reshape."""
        x32 = x.astype(jnp.float32)

        def taps(x32, axis):
            prev = jnp.concatenate(
                [lax.slice_in_dim(x32, 0, 1, axis=axis),
                 lax.slice_in_dim(x32, 0, x32.shape[axis] - 1, axis=axis)],
                axis=axis)
            nxt = jnp.concatenate(
                [lax.slice_in_dim(x32, 1, x32.shape[axis], axis=axis),
                 lax.slice_in_dim(x32, x32.shape[axis] - 1, x32.shape[axis], axis=axis)],
                axis=axis)
            return 0.25 * prev + 0.75 * x32, 0.75 * x32 + 0.25 * nxt

        e_h, o_h = taps(x32, 1)
        rows = []
        for r in (e_h, o_h):
            e_w, o_w = taps(r, 2)
            rows.append(jnp.stack([e_w, o_w], axis=3))  # [B,H,W,2,C]
        ph = jnp.stack(rows, axis=2)  # [B,H,2,W,2,C]
        n, h, _, w, _, c = ph.shape
        return ph.reshape(n, 2 * h, 2 * w, c).astype(x.dtype)

    def up_gather(x):
        """Gather-based: index rows/cols with precomputed src + weights."""
        n, h, w, c = x.shape
        x32 = x.astype(jnp.float32)
        for axis, size in ((1, h), (2, w)):
            idx = jnp.arange(2 * size)
            src = (idx + 1) // 2  # left tap index + clamp
            left = jnp.clip(src - 1 + (idx % 2), 0, size - 1)
            right = jnp.clip(src + (idx % 2), 0, size - 1)
            wgt = jnp.where(idx % 2 == 0, 0.25, 0.75).astype(jnp.float32)
            # out[i] = wgt*x[a] + (1-wgt)*x[b] with a<b picked per parity
            a = jnp.take(x32, left, axis=axis)
            bb = jnp.take(x32, right, axis=axis)
            wshape = [1, 1, 1, 1]
            wshape[axis] = 2 * size
            wv = wgt.reshape(wshape)
            x32 = jnp.where(
                (idx % 2 == 0).reshape(wshape), 0.25 * a + 0.75 * bb,
                0.75 * a + 0.25 * bb)
        return x32.astype(x.dtype)

    shapes = [
        (32, 24, 24, 256),
        (32, 48, 48, 256),
        (32, 96, 96, 256),
        (32, 192, 192, 1),
    ]
    rng = np.random.default_rng(0)
    for shape in shapes:
        x = jnp.asarray(rng.uniform(-1, 1, shape), jnp.bfloat16)
        print(f"shape {shape}:", flush=True)
        timeit("current (stack-interleave x2)", upsample2x_bilinear, x)
        timeit("jax.image.resize", up_resize, x)
        timeit("phases + one 6d transpose", up_phases_transpose, x)
        timeit("gather (take) per axis", up_gather, x)

    # Reference check: all variants must match the current exact op.
    x = jnp.asarray(rng.uniform(-1, 1, (2, 9, 11, 7)), jnp.float32)
    ref = np.asarray(upsample2x_bilinear(x))
    for name, f in [("resize", up_resize), ("phases", up_phases_transpose),
                    ("gather", up_gather)]:
        got = np.asarray(f(x))
        print(f"max|{name} - current| = {np.abs(got - ref).max():.2e}")


if __name__ == "__main__":
    main()

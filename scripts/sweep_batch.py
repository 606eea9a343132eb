"""Forward-throughput sweep over the window batch size, interleaved in
one session (shared-chip drift cancels within a run; cross-session
absolute numbers move ±3%).

Round-2 measured 16/32/48/64 -> 528/581/574/577 w/s BEFORE the fused
half-block; round-3 noted 709@32 / 719@48 / 703@64 AFTER it but across
sessions. This locks the post-fusion choice for engine.batch_windows /
bench.py with a same-session A/B (VERDICT r3 item 3).

  python scripts/sweep_batch.py [--iters 10] [--rounds 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", default=10, type=int)
    p.add_argument("--rounds", default=4, type=int)
    p.add_argument("--batches", default="24,32,48,64", type=str)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.models import build_countr
    from countr_tpu.models.countr import CounTR
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    batches = [int(x) for x in args.batches.split(",")]
    iters = args.iters
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]} iters={iters} batches={batches}",
          flush=True)

    model = build_countr(
        "mae_vit_base6_patch16", dtype=jnp.bfloat16,
        use_pallas_attention=True, approx_gelu=True, subpixel_head=True,
    )
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.key(0), jnp.zeros((1, 384, 384, 3)),
        jnp.zeros((1, 3, 64, 64, 3)), 3,
    )

    def empty(x):
        def body(c, _):
            return c * jnp.float32(1.0000001), None

        return lax.scan(body, x, None, length=iters)[0]

    erun = jax.jit(empty)
    x0 = jnp.float32(1.0)
    float(erun(x0))

    def floor_once():
        t0 = time.perf_counter()
        float(erun(x0))
        return time.perf_counter() - t0

    runs = {}
    for b in batches:
        imgs = jnp.asarray(rng.uniform(0, 1, (b, 384, 384, 3)), jnp.float32)
        y = model.apply(
            params,
            jnp.asarray(rng.uniform(0, 1, (b, 3, 64, 64, 3)), jnp.float32),
            3, method=CounTR.encode_exemplars,
        )

        def looped(imgs, params, y):
            def body(c, _):
                d = model.apply(
                    params, imgs + c * 1e-12, y, method=CounTR.forward_tokens
                )
                return jnp.sum(d[0, :2, :2]) * 1e-9, None

            return lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

        runs[b] = (jax.jit(looped), (imgs, params, y))

    for b, (fn, a) in runs.items():
        t0 = time.perf_counter()
        float(fn(*a))
        print(f"  warm b{b}: {time.perf_counter() - t0:.1f}s", flush=True)

    best = {b: 1e9 for b in batches}
    for r in range(args.rounds):
        for b, (fn, a) in runs.items():
            fl = floor_once()
            t0 = time.perf_counter()
            float(fn(*a))
            best[b] = min(best[b], max(time.perf_counter() - t0 - fl, 1e-9))
        print("round " + str(r) + ": " + "  ".join(
            f"b{b}={b * iters / best[b]:.0f}w/s" for b in batches), flush=True)

    print("\nbest windows/s (floor-subtracted):", flush=True)
    for b in batches:
        print(f"  batch {b:3d}: {b * iters / best[b]:8.1f} w/s "
              f"({best[b] / iters * 1e3:.2f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()

"""A/B the FULL device pipeline rate across batch_windows candidates.

The round-4 forward sweep (scripts/sweep_batch.py) showed b16 at
757-778 w/s vs b32 at 711 w/s on the bare forward — smaller batches may
beat the long-standing b32 default on this chip (v5e lite, 1 core).
This script prices that at the PIPELINE level, where batch_windows also
changes the chunk ladder and the window-aware set packer's cut points:
for each candidate b it builds a CountingEngine(batch_windows=b), plans
the production set, builds fused_set_program, and times the full loop
(chained scan, floor-subtracted), interleaving candidates across rounds
so the shared-chip session variance hits all candidates equally.

  python scripts/ab_pipeline_batch.py [--iters 8] [--batches 16,24,32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_IMAGES = 64
GRID_EVERY = 10
TINY_RECTS = [(0, 0, 9, 9), (12, 0, 21, 9), (0, 12, 9, 21)]
PLAIN_RECTS = [(10, 10, 80, 80), (100, 40, 180, 120), (30, 200, 110, 280)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", default=8, type=int)
    p.add_argument("--rounds", default=3, type=int)
    p.add_argument("--batches", default="16,24,32")
    args = p.parse_args()
    batches = [int(x) for x in args.batches.split(",")]

    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.engine.device_pipeline import fused_set_program
    from countr_tpu.engine.inference import CountingEngine
    from countr_tpu.models import build_countr
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]} iters={args.iters} "
          f"batches={batches}", flush=True)

    model = build_countr(
        "mae_vit_base6_patch16", dtype=jnp.bfloat16, use_pallas_attention=True,
        approx_gelu=True, subpixel_head=True,
    )
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.key(0),
        jnp.zeros((1, 384, 384, 3), jnp.float32),
        jnp.zeros((1, 3, 64, 64, 3), jnp.float32),
        3,
    )

    widths = [384, 448, 512, 512, 576, 640, 512, 688, 512, 464, 576, 512]
    images = [
        rng.integers(0, 256, (384, widths[i % len(widths)], 3), dtype=np.uint8)
        for i in range(N_IMAGES)
    ]
    boxes = [rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32) for _ in images]
    rects = [
        list(TINY_RECTS) if (i % GRID_EVERY) == GRID_EVERY - 1 else list(PLAIN_RECTS)
        for i in range(N_IMAGES)
    ]

    def dispatch_floor(iters):
        def empty(x):
            def body(c, _):
                return c * jnp.float32(1.0000001), None

            return lax.scan(body, x, None, length=iters)[0]

        erun = jax.jit(empty)
        float(erun(jnp.float32(1.0)))
        fl = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(erun(jnp.float32(1.0)))
            fl = min(fl, time.perf_counter() - t0)
        return fl

    floor = dispatch_floor(args.iters)
    print(f"dispatch floor {floor * 1e3:.1f} ms", flush=True)

    cands = {}
    for b in batches:
        engine = CountingEngine(model, params, batch_windows=b)
        idxs = engine.plan_batch_sets(images, rects)[0]
        sp = engine._plan_set(idxs, images, boxes, rects, 3)
        n = sp["plan"]["img_owner"].shape[0]
        fargs, _, make_loop = fused_set_program(model, sp, b, 3)
        run = jax.jit(make_loop(args.iters))
        t0 = time.perf_counter()
        float(run(params, *fargs))
        print(f"  warm b{b}: {time.perf_counter() - t0:.1f}s "
              f"({n} windows / {len(idxs)} imgs per set)", flush=True)
        cands[b] = (run, fargs, n, len(idxs), 1e9)

    for r in range(args.rounds):
        line = []
        for b in batches:
            run, fargs, n, n_img, best = cands[b]
            t0 = time.perf_counter()
            float(run(params, *fargs))
            dt = time.perf_counter() - t0
            best = min(best, dt)
            cands[b] = (run, fargs, n, n_img, best)
            line.append(f"b{b}={n * args.iters / max(dt - floor, 1e-9):.0f}w/s")
        print(f"round {r}: " + "  ".join(line), flush=True)

    print("\nbest pipeline rate (floor-subtracted):", flush=True)
    for b in batches:
        _, _, n, n_img, best = cands[b]
        dt = max(best - floor, 1e-9)
        print(f"  b{b:3d}: {n * args.iters / dt:7.1f} w/s  "
              f"{n_img * args.iters / dt:6.1f} img/s  "
              f"({dt / args.iters * 1e3:.2f} ms/set, {n} windows)", flush=True)


if __name__ == "__main__":
    main()

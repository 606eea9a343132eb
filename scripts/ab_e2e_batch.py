"""Same-session A/B of the END-TO-END count_batch rate at different
batch_windows — separates tunnel weather (hits both equally) from the
per-chunk dispatch/upload overhead that smaller batches double.

  python scripts/ab_e2e_batch.py [--passes 4] [--batches 16,32]
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
    p.add_argument("--passes", default=4, type=int)
    p.add_argument("--batches", default="16,32")
    args = p.parse_args()
    batches = [int(x) for x in args.batches.split(",")]

    import jax
    import jax.numpy as jnp

    from countr_tpu.engine.inference import CountingEngine
    from countr_tpu.models import build_countr
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]} passes={args.passes} "
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

    engines = {}
    for b in batches:
        e = CountingEngine(model, params, batch_windows=b)
        t0 = time.perf_counter()
        r = e.count_batch(images, boxes, rects, shot_num=3, return_density=False)
        print(f"  warm b{b}: {time.perf_counter() - t0:.1f}s", flush=True)
        engines[b] = (e, [r[0].count], 1e9)

    for r in range(args.passes):
        line = []
        for b in batches:
            e, c0, best = engines[b]
            t0 = time.perf_counter()
            res = e.count_batch(
                images, boxes, rects, shot_num=3, return_density=False
            )
            dt = time.perf_counter() - t0
            engines[b] = (e, c0, min(best, dt))
            assert abs(res[0].count - c0[0]) < 1e-3 * max(1, abs(c0[0]))
            line.append(f"b{b}={N_IMAGES / dt:.1f}img/s")
        print(f"pass {r}: " + "  ".join(line), flush=True)

    print("\nbest e2e:", flush=True)
    counts = {}
    for b in batches:
        e, c0, best = engines[b]
        counts[b] = c0[0]
        print(f"  b{b:3d}: {N_IMAGES / best:6.1f} img/s ({best:.2f} s/pass)",
              flush=True)
    vals = list(counts.values())
    print(f"counts equal across batches: "
          f"{all(abs(v - vals[0]) < 1e-3 * max(1, abs(vals[0])) for v in vals)}",
          flush=True)


if __name__ == "__main__":
    main()

"""Attribute the device-pipeline overhead: where the ~8 ms/set between
the forward ceiling (705 w/s -> 130.5 ms for the set's 92 slots) and
the measured full pipeline (650 w/s -> 138.5 ms for its 90 windows)
goes.

Times each non-forward stage of `fused_set_program` standalone on the
SAME production set plan bench.py measures (same geometry, same
chunks), with the chained-scan + floor-subtraction methodology:

  embed     exemplar CNN on the set's box stack
  extract   plain-slice window extraction, every plain chunk
  extract_rs  2-tap resampled extraction, every grid chunk
  accumulate  the fori_loop stitch scatter, every chunk (fake dens)
  finalize  integral-image count/TTN readout + segment_sum/TTN

  python scripts/profile_pipeline.py [--iters 20]
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
BATCH_WINDOWS = 16


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", default=20, type=int)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.config import WINDOW
    from countr_tpu.engine.device_pipeline import (
        accumulate, chunk_plan, extract_windows, extract_windows_resampled,
        finalize, fused_set_program,
    )
    from countr_tpu.engine.inference import CountingEngine
    from countr_tpu.models import build_countr
    from countr_tpu.models.countr import CounTR
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]} iters={args.iters}", flush=True)

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
    engine = CountingEngine(model, params, batch_windows=BATCH_WINDOWS)

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
    idxs = engine.plan_batch_sets(images, rects)[0]
    sp = engine._plan_set(idxs, images, boxes, rects, 3)
    fargs, preds_fn, make_loop = fused_set_program(model, sp, BATCH_WINDOWS, 3)
    (images_u8, bstack, chunks, rarr, rvalid, row_owner, last_row) = fargs
    # unified stream: chunks with "abs" have a plain part, chunks with
    # "maps" a resampled part (a straddling chunk has both)
    pchunks = [ch for ch in chunks if "abs" in ch]
    rchunks = [ch for ch in chunks if "maps" in ch]
    plan = sp["plan"]
    n = plan["img_owner"].shape[0]
    n_img = len(idxs)
    r_bucket = sp["r_bucket"]
    wb = sp["den_width"]
    slots = sum(bk for _, bk in chunk_plan(n, BATCH_WINDOWS))
    print(f"set: {n} windows / {n_img} imgs, {slots} slots, "
          f"r_bucket={r_bucket}, wb={wb}, "
          f"{len(chunks)} chunks ({len(pchunks)} w/ plain part, "
          f"{len(rchunks)} w/ resample part)", flush=True)

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

    def timeit(name, loop_fn, *a):
        run = jax.jit(loop_fn)
        t0 = time.perf_counter()
        float(run(*a))
        warm = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(*a))
            best = min(best, time.perf_counter() - t0)
        ms = (best - floor) / args.iters * 1e3
        print(f"  {name:28s} {ms:8.2f} ms/set   (warm {warm:.1f}s)", flush=True)
        return ms

    # --- full pipeline (the bench metric)
    full = timeit("FULL pipeline", make_loop(args.iters), params, *fargs)

    # --- exemplar embed
    def loop_embed(p, bstack):
        def body(c, _):
            y = model.apply(
                p, bstack + (c * 1e-12).astype(bstack.dtype), 3,
                method=CounTR.encode_exemplars,
            )
            return jnp.float32(y.ravel()[0]) * 1e-12, None

        return lax.scan(body, jnp.float32(0.0), None, length=args.iters)[0]

    t_embed = timeit("exemplar embed", loop_embed, params, bstack)

    # --- plain extraction (all plain chunks)
    def loop_extract(imgs, pchunks):
        def body(c, _):
            delta = (jnp.abs(c * 1e6) % 2.0).astype(jnp.uint8)
            s = jnp.float32(0.0)
            for ch in pchunks:
                win = extract_windows(imgs + delta, ch["abs"])
                s = s + win.ravel()[0]
            return s * jnp.float32(1e-9), None

        return lax.scan(body, jnp.float32(0.0), None, length=args.iters)[0]

    t_ex = timeit("extract (plain slices)", loop_extract, images_u8, pchunks)

    # --- resampled extraction (grid chunks)
    if rchunks:
        def loop_extract_rs(imgs, rchunks):
            def body(c, _):
                delta = (jnp.abs(c * 1e6) % 2.0).astype(jnp.uint8)
                s = jnp.float32(0.0)
                for ch in rchunks:
                    win = extract_windows_resampled(imgs + delta, *ch["maps"])
                    s = s + win.ravel()[0]
                return s * jnp.float32(1e-9), None

            return lax.scan(body, jnp.float32(0.0), None, length=args.iters)[0]

        t_rs = timeit("extract (grid resample)", loop_extract_rs, images_u8,
                      rchunks)
    else:
        t_rs = 0.0

    # --- stitch accumulate (all chunks, fake dens derived from carry)
    dens0 = jnp.asarray(
        rng.uniform(0, 1, (BATCH_WINDOWS, WINDOW, WINDOW)), jnp.float32
    )

    def loop_acc(dens0, chunks):
        def body(c, _):
            density = jnp.zeros((r_bucket, WINDOW, wb), jnp.float32)
            for ch in chunks:
                d = dens0[: ch["owners"].shape[0]] + c * 1e-12
                density = accumulate(
                    density, d, ch["den_own"], ch["starts"], ch["wcols"]
                )
            return jnp.float32(density.ravel()[0]) * 1e-9, None

        return lax.scan(body, jnp.float32(0.0), None, length=args.iters)[0]

    t_acc = timeit("stitch accumulate", loop_acc, dens0, chunks)

    # --- finalize (+TTN readout)
    den0 = jnp.asarray(
        rng.uniform(0, 0.01, (r_bucket, WINDOW, wb)), jnp.float32
    )

    def loop_fin(den0, rarr, rvalid, row_owner, last_row):
        def body(c, _):
            counts, esum = finalize(den0 + c * 1e-12, rarr, rvalid)
            raw = jax.ops.segment_sum(
                counts, row_owner, num_segments=n_img + 1
            )[:n_img]
            e = jnp.take(esum, last_row) / 3.0
            preds = jnp.where(e > 1.8, raw / jnp.maximum(e, 1e-9), raw)
            return jnp.sum(preds) * jnp.float32(1e-9), None

        return lax.scan(body, jnp.float32(0.0), None, length=args.iters)[0]

    t_fin = timeit("finalize + TTN", loop_fin, den0, rarr, rvalid,
                   jnp.asarray(row_owner), jnp.asarray(last_row))

    # --- forward at the set's slot count (reference ceiling)
    imgs32 = jnp.asarray(rng.uniform(0, 1, (BATCH_WINDOWS, 384, 384, 3)),
                         jnp.float32)
    y32 = jnp.asarray(rng.uniform(-1, 1, (BATCH_WINDOWS, 3, 512)),
                      jnp.bfloat16)

    def loop_fwd(p, imgs32, y32):
        def body(c, _):
            im = imgs32 + (c * 1e-12).astype(imgs32.dtype)
            d = model.apply(p, im, y32, method=CounTR.forward_tokens)
            return jnp.float32(d.ravel()[0]) * 1e-12, None

        return lax.scan(body, jnp.float32(0.0), None, length=args.iters)[0]

    t_fwd32 = timeit(f"forward b{BATCH_WINDOWS} (x1)", loop_fwd, params, imgs32, y32)

    t_fwd = t_fwd32 * slots / BATCH_WINDOWS
    known = t_embed + t_ex + t_rs + t_acc + t_fin + t_fwd
    print(f"\nledger (ms/set):")
    print(f"  forward {slots} slots            {t_fwd:8.2f}")
    print(f"  embed + extract + acc + fin  {t_embed + t_ex + t_rs + t_acc + t_fin:8.2f}")
    print(f"  sum                          {known:8.2f}")
    print(f"  FULL measured                {full:8.2f}")
    print(f"  residual (scheduling)        {full - known:8.2f}")
    print(f"  pipeline rate from FULL      {n * 1e3 / full:7.1f} w/s", flush=True)


if __name__ == "__main__":
    main()

"""A/B probe: gather strategies for the resident affine sampler.

profile_train.py attributes ~2/3 of the resident fine-tune step to
_affine_sample's per-pixel 4-tap gathers from the flat [P, 3] uint8
pixel pool (4 x jnp.take of 3-byte rows per output pixel). This probe
times semantically-equivalent gather formulations at the real shape
(B=8 samples x 384^2 outputs) to pick the fastest:

  a) take4      — current: 4 x jnp.take(pool[P,3], flat_idx)
  b) slab2      — 2 x lax.gather slice_sizes=(2,3): the (x0, x0+1)
                  pair is contiguous in the row-major pool, so one
                  sliced gather fetches both column taps of a row
  c) packed4    — pool packed to [P] uint32 (RGB in one word):
                  4 x take of scalars + bit unpack
  d) packed2    — packed pool + 2 x lax.gather slice_sizes=(2,)
  e) slab_take4 — two-level: vmapped dynamic_slice rows materialize the
                  sample's whole padded image [Hmax, Wmax] (contiguous
                  DMA, the pattern the mosaic path proved fast), then
                  the 4 taps index the small dense slab instead of the
                  full pool
  f) small_pool — CONTROL: take4_packed against a pool holding one
                  image. If this matches c, gather cost is per-element
                  and independent of table size — and variant e cannot
                  win

Chained-scan methodology of probe_ab.py: each iteration's affine
offset is tanh of the previous output (serial chain, no hoisting),
variants interleaved round-robin so session drift cancels.

  python scripts/probe_gather.py [--iters 30] [--cycles 6]
"""

import argparse
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", default=30, type=int)
    p.add_argument("--cycles", default=6, type=int)
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--only", default="", type=str,
                   help="comma list of variant key prefixes to run")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ITERS = args.iters
    B = args.batch
    OUT = 384
    print(f"device={jax.devices()[0]} B={B} iters={ITERS}", flush=True)

    # synthetic pool: 64 images ~ (400..480) x (500..640)
    rng = np.random.default_rng(0)
    hs = rng.integers(390, 480, 64)
    ws = rng.integers(500, 660, 64)
    bases = np.concatenate([[0], np.cumsum(hs * ws)[:-1]]).astype(np.int32)
    P = int(np.sum(hs * ws)) + 512
    pool_np = rng.integers(0, 256, (P, 3), np.uint8)
    pool = jax.device_put(pool_np)
    pool_u32 = jax.jit(
        lambda p: (p[:, 0].astype(jnp.uint32) << 16)
        | (p[:, 1].astype(jnp.uint32) << 8)
        | p[:, 2].astype(jnp.uint32)
    )(pool)

    idx_img = rng.integers(0, 64, B)
    base = jnp.asarray(bases[idx_img])
    stride = jnp.asarray(ws[idx_img].astype(np.int32))
    hh = jnp.asarray(hs[idx_img].astype(np.int32))
    ww = jnp.asarray(ws[idx_img].astype(np.int32))
    # affine maps ~ the finetune aug distribution (rot 15, sc 0.8-1.2)
    theta = rng.uniform(-0.26, 0.26, B)
    sc = rng.uniform(0.8, 1.2, B)
    Cm = np.stack(
        [
            np.stack([np.cos(theta) / sc, -np.sin(theta) / sc], -1),
            np.stack([np.sin(theta) / sc, np.cos(theta) / sc], -1),
        ],
        1,
    ).astype(np.float32)
    dv = rng.uniform(0, 60, (B, 2)).astype(np.float32)
    Cm = jnp.asarray(Cm)
    dv = jnp.asarray(dv)

    xs = jnp.arange(OUT, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, xs, indexing="xy")

    def coords(C, d):
        sx = C[0, 0] * gx + C[0, 1] * gy + d[0]
        sy = C[1, 0] * gx + C[1, 1] * gy + d[1]
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        return (sx - x0)[..., None], (sy - y0)[..., None], x0.astype(jnp.int32), y0.astype(jnp.int32)

    def masks(y0, x0, h, w):
        def ok(yy, xx):
            return ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)).astype(jnp.float32)[..., None]

        return ok(y0, x0), ok(y0, x0 + 1), ok(y0 + 1, x0), ok(y0 + 1, x0 + 1)

    def blend(p00, p01, p10, p11, fx, fy):
        top = p00 * (1 - fx) + p01 * fx
        bot = p10 * (1 - fx) + p11 * fx
        return top * (1 - fy) + bot * fy

    # ---- variant a: current 4x take of [P,3] rows -----------------------
    def sample_a(pl, b, s, h, w, C, d):
        fx, fy, x0, y0 = coords(C, d)
        m00, m01, m10, m11 = masks(y0, x0, h, w)

        def tap(yy, xx, m):
            idx = b + jnp.clip(yy, 0, h - 1) * s + jnp.clip(xx, 0, w - 1)
            return jnp.take(pl, idx, axis=0).astype(jnp.float32) * m

        return blend(
            tap(y0, x0, m00), tap(y0, x0 + 1, m01),
            tap(y0 + 1, x0, m10), tap(y0 + 1, x0 + 1, m11), fx, fy,
        )

    # ---- variant b: 2x sliced gather [2,3] (x-pair contiguous) ----------
    def sample_b(pl, b, s, h, w, C, d):
        fx, fy, x0, y0 = coords(C, d)
        m00, m01, m10, m11 = masks(y0, x0, h, w)
        xc = jnp.clip(x0, 0, w - 2)  # slab [xc, xc+1] stays in-row
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,),
        )

        def pair(yy):
            idx = (b + jnp.clip(yy, 0, h - 1) * s + xc).reshape(-1, 1)
            sl = lax.gather(
                pl, idx, dnums, slice_sizes=(2, 3), mode="clip"
            ).reshape(OUT, OUT, 2, 3)
            return sl.astype(jnp.float32)

        top = pair(y0)
        bot = pair(y0 + 1)
        # x0 was clipped into [0, w-2] for the slab: when the true x0 is
        # >= w-1 the x0 tap is slab col 1; when x0 < 0 (left border,
        # x0+1 == 0 still valid) the x0+1 tap is slab col 0. Select the
        # matching slab column per pixel.
        hi = (x0 >= w - 1)[..., None]
        lo = (x0 < 0)[..., None]
        p00 = jnp.where(hi, top[:, :, 1], top[:, :, 0]) * m00
        p01 = jnp.where(lo, top[:, :, 0], top[:, :, 1]) * m01
        p10 = jnp.where(hi, bot[:, :, 1], bot[:, :, 0]) * m10
        p11 = jnp.where(lo, bot[:, :, 0], bot[:, :, 1]) * m11
        return blend(p00, p01, p10, p11, fx, fy)

    # ---- variant c: packed uint32 pool, 4x scalar take ------------------
    def unpack(v):
        return jnp.stack(
            [(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF], axis=-1
        ).astype(jnp.float32)

    def sample_c(pl32, b, s, h, w, C, d):
        fx, fy, x0, y0 = coords(C, d)
        m00, m01, m10, m11 = masks(y0, x0, h, w)

        def tap(yy, xx, m):
            idx = b + jnp.clip(yy, 0, h - 1) * s + jnp.clip(xx, 0, w - 1)
            return unpack(jnp.take(pl32, idx, axis=0)) * m

        return blend(
            tap(y0, x0, m00), tap(y0, x0 + 1, m01),
            tap(y0 + 1, x0, m10), tap(y0 + 1, x0 + 1, m11), fx, fy,
        )

    # ---- variant d: packed pool + 2x sliced gather (2,) -----------------
    def sample_d(pl32, b, s, h, w, C, d):
        fx, fy, x0, y0 = coords(C, d)
        m00, m01, m10, m11 = masks(y0, x0, h, w)
        xc = jnp.clip(x0, 0, w - 2)
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(),
            start_index_map=(0,),
        )

        def pair(yy):
            idx = (b + jnp.clip(yy, 0, h - 1) * s + xc).reshape(-1, 1)
            sl = lax.gather(
                pl32, idx, dnums, slice_sizes=(2,), mode="clip"
            ).reshape(OUT, OUT, 2)
            return sl

        top = pair(y0)
        bot = pair(y0 + 1)
        hi = x0 >= w - 1
        lo = x0 < 0
        p00 = unpack(jnp.where(hi, top[:, :, 1], top[:, :, 0])) * m00
        p01 = unpack(jnp.where(lo, top[:, :, 0], top[:, :, 1])) * m01
        p10 = unpack(jnp.where(hi, bot[:, :, 1], bot[:, :, 0])) * m10
        p11 = unpack(jnp.where(lo, bot[:, :, 0], bot[:, :, 1])) * m11
        return blend(p00, p01, p10, p11, fx, fy)

    # ---- variant e: two-level slab (whole padded image) + take4 ---------
    HMAX = int(hs.max()) if int(hs.max()) % 8 == 0 else int(hs.max()) + (8 - int(hs.max()) % 8)
    WMAX = int(ws.max()) if int(ws.max()) % 128 == 0 else int(ws.max()) + (128 - int(ws.max()) % 128)

    def sample_e(pl32, b, s, h, w, C, d):
        def row_slice(r):
            rr = jnp.minimum(r, h - 1)  # rows past h re-read the last row
            return lax.dynamic_slice_in_dim(pl32, b + rr * s, WMAX, axis=0)

        slab = jax.vmap(row_slice)(jnp.arange(HMAX)).reshape(-1)  # [HMAX*WMAX]
        fx, fy, x0, y0 = coords(C, d)
        m00, m01, m10, m11 = masks(y0, x0, h, w)

        def tap(yy, xx, m):
            idx = jnp.clip(yy, 0, h - 1) * WMAX + jnp.clip(xx, 0, w - 1)
            return unpack(jnp.take(slab, idx, axis=0)) * m

        return blend(
            tap(y0, x0, m00), tap(y0, x0 + 1, m01),
            tap(y0 + 1, x0, m10), tap(y0 + 1, x0 + 1, m11), fx, fy,
        )

    # ---- variant f: control — take4_packed from a one-image pool --------
    P1 = int(hs[0] * ws[0]) + 512
    pool_small = pool_u32[:P1]

    def sample_f(pl32_small, b, s, h, w, C, d):
        fx, fy, x0, y0 = coords(C, d)
        m00, m01, m10, m11 = masks(y0, x0, h, w)
        b0 = jnp.zeros_like(b)  # every sample reads image 0

        def tap(yy, xx, m):
            idx = b0 + jnp.clip(yy, 0, h - 1) * s + jnp.clip(xx, 0, w - 1)
            idx = jnp.minimum(idx, P1 - 1)
            return unpack(jnp.take(pl32_small, idx, axis=0)) * m

        return blend(
            tap(y0, x0, m00), tap(y0, x0 + 1, m01),
            tap(y0 + 1, x0, m10), tap(y0 + 1, x0 + 1, m11), fx, fy,
        )

    # ---- correctness cross-check (once, on small output) ----------------
    def batch_apply(fn, pl):
        def one(b, s, h, w, C, d):
            return fn(pl, b, s, h, w, C, d)

        return jax.vmap(one)(base, stride, hh, ww, Cm, dv)

    if not args.only:
        ra = jax.jit(lambda: batch_apply(sample_a, pool))()
        for name, fn, pl in (("b", sample_b, pool), ("c", sample_c, pool_u32),
                             ("d", sample_d, pool_u32), ("e", sample_e, pool_u32)):
            rv = jax.jit(lambda fn=fn, pl=pl: batch_apply(fn, pl))()
            md = float(jnp.max(jnp.abs(ra - rv)))
            print(f"variant {name}: max abs diff vs a = {md:.2e}", flush=True)
            assert md < 1e-3, f"variant {name} mismatch"

    # ---- chained timing -------------------------------------------------
    def make_chain(fn, pl):
        def loop(x0, pl, Cm, dv):
            def body(x, _):
                dd = dv + jnp.tanh(x) * 0.7  # serial, nonlinear
                def one(b, s, h, w, C, d):
                    return fn(pl, b, s, h, w, C, d)

                out = jax.vmap(one)(base, stride, hh, ww, Cm, dd)
                return jnp.sum(out) * 1e-9, None

            return lax.scan(body, x0, None, length=ITERS)[0]

        return jax.jit(loop).lower(jnp.float32(0.0), pl, Cm, dv).compile(), pl

    def empty_chain():
        def loop(x0):
            def body(x, _):
                return jnp.tanh(x) * 0.5, None

            return lax.scan(body, x0, None, length=ITERS)[0]

        return jax.jit(loop).lower(jnp.float32(0.0)).compile()

    all_specs = {
        "a_take4_rows": (sample_a, pool),
        "b_slab2_rows": (sample_b, pool),
        "c_take4_packed": (sample_c, pool_u32),
        "d_slab2_packed": (sample_d, pool_u32),
        "e_slab_take4": (sample_e, pool_u32),
        "f_small_pool": (sample_f, pool_small),
    }
    if args.only:
        keys = [k for k in all_specs
                if any(k.startswith(p) for p in args.only.split(","))]
    else:
        keys = list(all_specs)
    variants = {k: make_chain(*all_specs[k]) for k in keys}
    efn = empty_chain()
    float(efn(jnp.float32(0.0)))
    for fn, pl in variants.values():
        float(fn(jnp.float32(0.0), pl, Cm, dv))  # warmup

    best = {k: 1e9 for k in variants}
    floor_best = 1e9
    for cyc in range(args.cycles):
        t0 = time.perf_counter()
        float(efn(jnp.float32(0.0)))
        floor_best = min(floor_best, time.perf_counter() - t0)
        for k, (fn, pl) in variants.items():
            t0 = time.perf_counter()
            float(fn(jnp.float32(0.0), pl, Cm, dv))
            best[k] = min(best[k], time.perf_counter() - t0)
    print(f"floor {floor_best * 1e3:.1f} ms", flush=True)
    for k, v in best.items():
        ms = max(v - floor_best, 0.0) / ITERS * 1e3
        print(f"{k:<18s} {ms:8.2f} ms/iter (B={B})", flush=True)


if __name__ == "__main__":
    main()

"""Bisect the standalone-affine-segment anomaly.

profile_train.py's "affine gather-sample only" segment measures ~95 ms
/batch-8 while probe_gather.py's variant c (semantically the same
work) measures ~34 ms and the FULL resident step fits in ~65 ms total.
One of the two microbenches is lying. This probe times a ladder of
variants between them under ONE methodology (probe_gather's serial
tanh chain, interleaved round-robin, floor-subtracted):

  a_probe_c     probe_gather's sample_c: closed-over static per-sample
                base/stride/h/w scalars, d varies per iteration
  b_real_static the REAL _bilinear_flat/_affine_sample, same static
                scalars, d varies
  c_real_dynidx the real sampler with img_idx dynamic per iteration
                (base/width/height looked up by jnp.take each iter) —
                profile_train.py's f_affine_only shape
  d_mat_full    materialize_batch with img_idx+affine_d+cell_top all
                perturbed — profile_train.py's f_materialize shape

If a==b==c<<d or a==b<<c, the delta names the culprit construct; if
a<<b the real sampler's extra masking/select passes are the cost; if
all ~equal the profile_train seg() scan itself is the artifact.

  python scripts/probe_affine_seg.py [--iters 20] [--cycles 5]
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
    p.add_argument("--iters", default=20, type=int)
    p.add_argument("--cycles", default=5, type=int)
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--data_dir", default="/tmp/bench_fsc_e2e", type=str)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.data.fsc147 import FSC147Meta, TrainDataset
    from countr_tpu.engine.train_store import (
        _affine_sample, build_store, materialize_batch,
    )
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ITERS = args.iters
    B = args.batch
    print(f"device={jax.devices()[0]} B={B} iters={ITERS}", flush=True)

    meta = FSC147Meta.load(args.data_dir)
    store = build_store(meta, meta.splits["train"])
    sa = store.arrays
    ds = TrainDataset(meta, do_aug=True, seed=0, store_index=store.index)
    keys = ("img_idx", "affine_C", "affine_d", "is_mosaic", "cell_idx",
            "cell_top", "cell_left", "cell_len", "blend_l", "dots", "n_dots")
    samples = [ds[i] for i in range(B)]
    batch = {k: jax.device_put(np.stack([s[k] for s in samples]))
             for k in keys}

    # static per-sample scalars for variants a/b (numpy -> python ints,
    # baked into the jitted program exactly like probe_gather closes
    # over its synthetic base/stride arrays)
    idx_np = np.stack([s["img_idx"] for s in samples])
    base_st = jnp.asarray(store.arrays["base"])[jnp.asarray(idx_np)]
    w_np = store.w_np[idx_np].astype(np.int32)
    h_np = store.h_np[idx_np].astype(np.int32)
    w_st = jnp.asarray(w_np)
    h_st = jnp.asarray(h_np)
    Cm = batch["affine_C"]
    dv = batch["affine_d"]
    px = sa["pixels"]

    # ---- variant a: probe_gather's sample_c, verbatim formulation ------
    OUT = 384

    def coords(C, d):
        xs = jnp.arange(OUT, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(xs, xs, indexing="xy")
        sx = C[0, 0] * gx + C[0, 1] * gy + d[0]
        sy = C[1, 0] * gx + C[1, 1] * gy + d[1]
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]
        return fx, fy, x0.astype(jnp.int32), y0.astype(jnp.int32)

    def masks(y0, x0, h, w):
        def m(yy, xx):
            return ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)).astype(
                jnp.float32
            )[..., None]

        return m(y0, x0), m(y0, x0 + 1), m(y0 + 1, x0), m(y0 + 1, x0 + 1)

    def blend(p00, p01, p10, p11, fx, fy):
        top = p00 * (1 - fx) + p01 * fx
        bot = p10 * (1 - fx) + p11 * fx
        return top * (1 - fy) + bot * fy

    def unpack(v):
        return jnp.stack(
            [(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF], axis=-1
        ).astype(jnp.float32)

    def sample_probe_c(b, s, h, w, C, d):
        fx, fy, x0, y0 = coords(C, d)
        m00, m01, m10, m11 = masks(y0, x0, h, w)

        def tap(yy, xx, m):
            idx = b + jnp.clip(yy, 0, h - 1) * s + jnp.clip(xx, 0, w - 1)
            return unpack(jnp.take(px, idx, axis=0)) * m

        return blend(
            tap(y0, x0, m00), tap(y0, x0 + 1, m01),
            tap(y0 + 1, x0, m10), tap(y0 + 1, x0 + 1, m11), fx, fy,
        )

    def chain_a(x0_, dv_):
        def body(x, _):
            dd = dv_ + jnp.tanh(x) * 0.7

            def one(b, w, h, C, d):
                return sample_probe_c(b, w, h, w, C, d)

            out = jax.vmap(one)(base_st, w_st, h_st, Cm, dd)
            return jnp.sum(out) * 1e-9, None

        return lax.scan(body, x0_, None, length=ITERS)[0]

    # ---- variant b: real _affine_sample, static scalars -----------------
    def chain_b(x0_, dv_):
        def body(x, _):
            dd = dv_ + jnp.tanh(x) * 0.7

            def one(b, w, h, C, d):
                return _affine_sample(px, b, w, h, w, C, d)

            out = jax.vmap(one)(base_st, w_st, h_st, Cm, dd)
            return jnp.sum(out) * 1e-9, None

        return lax.scan(body, x0_, None, length=ITERS)[0]

    # ---- variant c: real sampler, dynamic img_idx lookup ----------------
    idx0 = batch["img_idx"]
    base_a, wid_a, hei_a = sa["base"], sa["width"], sa["height"]

    def chain_c(x0_, dv_):
        def body(x, _):
            dd = dv_ + jnp.tanh(x) * 0.7
            idx = idx0 + jnp.int32(x * 1e-20)

            def one(i, C, d):
                return _affine_sample(px, base_a[i], wid_a[i], hei_a[i],
                                      wid_a[i], C, d)

            out = jax.vmap(one)(idx, Cm, dd)
            return jnp.sum(out) * 1e-9, None

        return lax.scan(body, x0_, None, length=ITERS)[0]

    # ---- variant i: dynamic base take, STATIC stride/h/w ----------------
    def chain_i(x0_, dv_):
        def body(x, _):
            dd = dv_ + jnp.tanh(x) * 0.7
            idx = idx0 + jnp.int32(x * 1e-20)
            bases_dyn = base_a[idx]

            def one(b, w, h, C, d):
                return _affine_sample(px, b, w, h, w, C, d)

            out = jax.vmap(one)(bases_dyn, w_st, h_st, Cm, dd)
            return jnp.sum(out) * 1e-9, None

        return lax.scan(body, x0_, None, length=ITERS)[0]

    # ---- variant j: STATIC base, dynamic stride/h/w takes ---------------
    def chain_j(x0_, dv_):
        def body(x, _):
            dd = dv_ + jnp.tanh(x) * 0.7
            idx = idx0 + jnp.int32(x * 1e-20)
            w_dyn = wid_a[idx]
            h_dyn = hei_a[idx]

            def one(b, w, h, C, d):
                return _affine_sample(px, b, w, h, w, C, d)

            out = jax.vmap(one)(base_st, w_dyn, h_dyn, Cm, dd)
            return jnp.sum(out) * 1e-9, None

        return lax.scan(body, x0_, None, length=ITERS)[0]

    # ---- variant d: full materialize_batch, all perturbed ---------------
    def chain_d(x0_, dv_):
        def body(x, _):
            bb = dict(batch)
            bb["img_idx"] = batch["img_idx"] + jnp.int32(x * 1e-20)
            bb["affine_d"] = dv_ + jnp.tanh(x) * 0.7
            bb["cell_top"] = batch["cell_top"] + jnp.int32(x * 1e-20)
            imgs, boxes = materialize_batch(sa, bb)
            return jnp.sum(imgs) * 1e-9 + boxes.ravel()[0] * 1e-12, None

        return lax.scan(body, x0_, None, length=ITERS)[0]

    # ---- variant e: probe + where(ok, idx, 0) on the gather index -------
    def sample_probe_sel(b, s, h, w, C, d):
        fx, fy, x0, y0 = coords(C, d)
        m00, m01, m10, m11 = masks(y0, x0, h, w)

        def tap(yy, xx, m):
            ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            idx = b + jnp.clip(yy, 0, h - 1) * s + jnp.clip(xx, 0, w - 1)
            idx = jnp.where(ok, idx, 0)
            return unpack(jnp.take(px, idx, axis=0)) * m

        return blend(
            tap(y0, x0, m00), tap(y0, x0 + 1, m01),
            tap(y0 + 1, x0, m10), tap(y0 + 1, x0 + 1, m11), fx, fy,
        )

    def chain_e(x0_, dv_):
        def body(x, _):
            dd = dv_ + jnp.tanh(x) * 0.7

            def one(b, w, h, C, d):
                return sample_probe_sel(b, w, h, w, C, d)

            out = jax.vmap(one)(base_st, w_st, h_st, Cm, dd)
            return jnp.sum(out) * 1e-9, None

        return lax.scan(body, x0_, None, length=ITERS)[0]

    # ---- variant f: probe + /255 and float-mask mul like _gather_px -----
    def sample_probe_div(b, s, h, w, C, d):
        fx, fy, x0, y0 = coords(C, d)
        m00, m01, m10, m11 = masks(y0, x0, h, w)

        def tap(yy, xx, m):
            idx = b + jnp.clip(yy, 0, h - 1) * s + jnp.clip(xx, 0, w - 1)
            return unpack(jnp.take(px, idx, axis=0)) / 255.0 * m

        return blend(
            tap(y0, x0, m00), tap(y0, x0 + 1, m01),
            tap(y0 + 1, x0, m10), tap(y0 + 1, x0 + 1, m11), fx, fy,
        )

    def chain_f(x0_, dv_):
        def body(x, _):
            dd = dv_ + jnp.tanh(x) * 0.7

            def one(b, w, h, C, d):
                return sample_probe_div(b, w, h, w, C, d)

            out = jax.vmap(one)(base_st, w_st, h_st, Cm, dd)
            return jnp.sum(out) * 1e-9, None

        return lax.scan(body, x0_, None, length=ITERS)[0]

    # ---- variant g: per-tap multiply by reciprocal constant -------------
    def sample_probe_rcp(b, s, h, w, C, d):
        fx, fy, x0, y0 = coords(C, d)
        m00, m01, m10, m11 = masks(y0, x0, h, w)
        r = jnp.float32(1.0 / 255.0)

        def tap(yy, xx, m):
            idx = b + jnp.clip(yy, 0, h - 1) * s + jnp.clip(xx, 0, w - 1)
            return unpack(jnp.take(px, idx, axis=0)) * r * m

        return blend(
            tap(y0, x0, m00), tap(y0, x0 + 1, m01),
            tap(y0 + 1, x0, m10), tap(y0 + 1, x0 + 1, m11), fx, fy,
        )

    def chain_g(x0_, dv_):
        def body(x, _):
            dd = dv_ + jnp.tanh(x) * 0.7

            def one(b, w, h, C, d):
                return sample_probe_rcp(b, w, h, w, C, d)

            out = jax.vmap(one)(base_st, w_st, h_st, Cm, dd)
            return jnp.sum(out) * 1e-9, None

        return lax.scan(body, x0_, None, length=ITERS)[0]

    # ---- variant h: single true-division scale on the blended output ----
    def sample_probe_end(b, s, h, w, C, d):
        fx, fy, x0, y0 = coords(C, d)
        m00, m01, m10, m11 = masks(y0, x0, h, w)

        def tap(yy, xx, m):
            idx = b + jnp.clip(yy, 0, h - 1) * s + jnp.clip(xx, 0, w - 1)
            return unpack(jnp.take(px, idx, axis=0)) * m

        return blend(
            tap(y0, x0, m00), tap(y0, x0 + 1, m01),
            tap(y0 + 1, x0, m10), tap(y0 + 1, x0 + 1, m11), fx, fy,
        ) / 255.0

    def chain_h(x0_, dv_):
        def body(x, _):
            dd = dv_ + jnp.tanh(x) * 0.7

            def one(b, w, h, C, d):
                return sample_probe_end(b, w, h, w, C, d)

            out = jax.vmap(one)(base_st, w_st, h_st, Cm, dd)
            return jnp.sum(out) * 1e-9, None

        return lax.scan(body, x0_, None, length=ITERS)[0]

    def chain_empty(x0_, dv_):
        def body(x, _):
            return jnp.tanh(x) * 0.5, None

        return lax.scan(body, x0_, None, length=ITERS)[0]

    chains = {
        "a_probe_c": chain_a,
        "b_real_static": chain_b,
        "c_real_dynidx": chain_c,
        "d_mat_full": chain_d,
        "e_probe_sel": chain_e,
        "f_probe_div": chain_f,
        "g_probe_rcp": chain_g,
        "h_probe_end": chain_h,
        "i_dynbase": chain_i,
        "j_dynwh": chain_j,
    }
    if os.environ.get("PROBE_ONLY"):
        want = os.environ["PROBE_ONLY"].split(",")
        chains = {k: v for k, v in chains.items()
                  if any(k.startswith(w) for w in want)}
    x0 = jnp.float32(0.0)
    compiled = {}
    for k, fn in chains.items():
        compiled[k] = jax.jit(fn)
        float(compiled[k](x0, dv))  # warm
        print(f"{k} compiled", flush=True)
    efn = jax.jit(chain_empty)
    float(efn(x0, dv))

    best = {k: 1e9 for k in chains}
    floor = 1e9
    for cyc in range(args.cycles):
        t0 = time.perf_counter()
        float(efn(x0, dv))
        floor = min(floor, time.perf_counter() - t0)
        for k, fn in compiled.items():
            t0 = time.perf_counter()
            float(fn(x0, dv))
            best[k] = min(best[k], time.perf_counter() - t0)
    print(f"floor {floor * 1e3:.1f} ms", flush=True)
    for k, v in best.items():
        print(f"{k:<16s} {max(v - floor, 0.0) / ITERS * 1e3:8.2f} ms/iter",
              flush=True)


if __name__ == "__main__":
    main()

"""Probe: can the affine sampler's 4 scalar taps become 2 two-element
slice gathers?

The bilinear quad's x-taps (x0, x0+1) are CONSECUTIVE pool addresses
(one uint32 pixel per lane, train_store._pack_rgb), so a
slice_sizes=(2,) lax.gather fetches both with one index — halving the
tap count that probe_gather proved is the sampler's per-element-bound
cost (~34 ms/batch-8, 52% of the finetune step). Edge semantics match
cv2 BORDER_CONSTANT via post-gather masks (for x0 == -1 the clipped
pair is (0, 1) and the valid x=0 tap is element 0, handled by a
select).

CAUTION: multi-element slice_sizes on this backend kernel-faulted the
axon worker for (2, 3) row slabs (scripts/probe_gather.py variant b,
CLAUDE.md); (2,) on a flat pool is the minimal variant. Run this LAST
in a chip session.

  python scripts/probe_gather_pair.py [--batch 8] [--iters 20]
"""

import argparse
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--iters", default=20, type=int)
    p.add_argument("--rounds", default=4, type=int)
    p.add_argument("--data_dir", default="/tmp/bench_fsc_e2e", type=str)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.config import IMG_SIZE
    from countr_tpu.data.fsc147 import FSC147Meta, TrainDataset
    from countr_tpu.engine.train_store import (
        _affine_sample, _unpack_rgb, build_store,
    )
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    b = args.batch
    iters = args.iters
    print(f"device={jax.devices()[0]} batch={b} iters={iters}", flush=True)

    if not os.path.exists(os.path.join(args.data_dir, "annotation_FSC147_384.json")):
        from bench_finetune_e2e import make_dataset

        make_dataset(args.data_dir, 64, np.random.default_rng(0))
    meta = FSC147Meta.load(args.data_dir)
    store = build_store(meta, meta.splits["train"])
    sa = store.arrays
    P = int(store.pixels.shape[0])

    ds = TrainDataset(meta, do_aug=True, seed=0, store_index=store.index)
    keys = ("img_idx", "affine_C", "affine_d")
    samples = [ds[i] for i in range(b)]
    batch = {k: jax.device_put(np.stack([s[k] for s in samples])) for k in keys}

    # ---- pair-slice bilinear sampler ---------------------------------
    def _gather_pair(pixels, idx):
        """[...,] int32 start -> [..., 2] uint32 (2 consecutive lanes)."""
        idxc = jnp.clip(idx, 0, P - 2)
        return lax.gather(
            pixels, idxc[..., None],
            lax.GatherDimensionNumbers(
                offset_dims=(idx.ndim,), collapsed_slice_dims=(),
                start_index_map=(0,),
            ),
            slice_sizes=(2,), mode=lax.GatherScatterMode.CLIP,
        )

    def bilinear_pair(pixels, base, stride, h, w, sx, sy):
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        okx0 = ((x0 >= 0) & (x0 < w)).astype(jnp.float32)[..., None]
        okx1 = ((x0 + 1 >= 0) & (x0 + 1 < w)).astype(jnp.float32)[..., None]
        xs = jnp.clip(x0, 0, w - 1)  # pair start column

        def row(yy):
            oky = ((yy >= 0) & (yy < h)).astype(jnp.float32)[..., None]
            idx = base + jnp.clip(yy, 0, h - 1) * stride + xs
            pair = _unpack_rgb(_gather_pair(pixels, idx))  # [..., 2, 3]
            p0 = pair[..., 0, :]
            # x0 == -1: the clipped pair is (0, 1) and the valid x=0
            # tap is element 0
            p1 = jnp.where((x0 < 0)[..., None], pair[..., 0, :], pair[..., 1, :])
            return p0 * (okx0 * oky), p1 * (okx1 * oky)

        p00, p01 = row(y0)
        p10, p11 = row(y0 + 1)
        top = p00 * (1 - fx) + p01 * fx
        bot = p10 * (1 - fx) + p11 * fx
        return (top * (1 - fy) + bot * fy) / 255.0

    def affine_pair(pixels, base, stride, h, w, C, d):
        xs = jnp.arange(IMG_SIZE, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(xs, xs, indexing="xy")
        sx = C[0, 0] * gx + C[0, 1] * gy + d[0]
        sy = C[1, 0] * gx + C[1, 1] * gy + d[1]
        return bilinear_pair(pixels, base, stride, h, w, sx, sy)

    # ---- correctness vs the production sampler -----------------------
    def run_batch(sampler):
        def one(idx, C, d):
            return sampler(
                sa["pixels"], sa["base"][idx], sa["width"][idx],
                sa["height"][idx], sa["width"][idx], C, d,
            )

        return jax.jit(
            lambda bt: jax.vmap(one)(bt["img_idx"], bt["affine_C"], bt["affine_d"])
        )

    ref_fn = run_batch(_affine_sample)
    pair_fn = run_batch(affine_pair)
    ref = np.asarray(ref_fn(batch))
    got = np.asarray(pair_fn(batch))
    err = np.abs(ref - got).max()
    print(f"pair sampler max |diff| vs production: {err:.3e}", flush=True)
    assert err < 1e-5, "pair sampler mismatch"

    # ---- timing (interleaved, chained scan, floor-subtracted) --------
    def seg(f):
        def looped(bt):
            def body(c, _):
                # perturb ONLY affine_d: a carry-derived img_idx would
                # flip the backend onto the ~2.5x slow gather path
                # (scripts/probe_affine_seg.py variants i/j/c) and mask
                # the fast-path comparison this probe is after
                bb = dict(bt)
                bb["affine_d"] = bt["affine_d"] + c * 1e-12
                out = f(bb)
                return jnp.float32(out.ravel()[0]) * 1e-12, None

            return lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

        return jax.jit(looped)

    def empty(x):
        def body(c, _):
            return c * jnp.float32(1.0000001), None

        return lax.scan(body, x, None, length=iters)[0]

    erun = jax.jit(empty)
    x0 = jnp.float32(1.0)
    float(erun(x0))

    runs = {"scalar4 (production)": seg(ref_fn), "pair2 (slice gather)": seg(pair_fn)}
    for name, r in runs.items():
        float(r(batch))  # compile
    best = {k: 1e9 for k in runs}
    for rnd in range(args.rounds):
        for name, r in runs.items():
            t0 = time.perf_counter()
            float(erun(x0))
            fl = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(r(batch))
            best[name] = min(best[name], (time.perf_counter() - t0 - fl) / iters)
        print(f"round {rnd}: " + "  ".join(
            f"{k} {v * 1e3:.2f} ms" for k, v in best.items()), flush=True)
    print("---", flush=True)
    for k, v in best.items():
        print(f"{k:<24s} {v * 1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()

"""Per-segment device-time attribution of the resident MAE pretrain
step (113 ms/batch-16 measured in round 2, never attributed).

Segments, each with the chained-scan + floor-subtraction methodology of
scripts/profile_train.py:
  - materialize_pretrain_batch: one static-size slab slice per sample
    (the column-major [w, 384] pool layout) + two bicubic band einsums
    (the RandomResizedCrop(384, bicubic) + flip)
  - slab slice only (the single max_w*384 static dynamic_slice)
  - bicubic band matmuls only (on a pre-sliced slab)
  - forward only / forward+backward (MAE loss)
  - FULL resident pretrain step

  python scripts/profile_pretrain.py [--batch 16] [--iters 20]
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
    p.add_argument("--batch", default=16, type=int)
    p.add_argument("--iters", default=20, type=int)
    p.add_argument("--data_dir", default="/tmp/bench_fsc_e2e", type=str)
    p.add_argument("--deep", action="store_true",
                   help="also attribute encoder/decoder fwd+vag and the "
                        "optimizer update (new compiles; slower first run)")
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.config import MAE_PRESETS
    from countr_tpu.data.fsc147 import FSC147Meta, PretrainDataset
    from countr_tpu.engine.train import (
        init_train_state, make_optimizer, make_store_pretrain_step,
    )
    from countr_tpu.engine.train_store import (
        _bicubic_band, build_pretrain_store, materialize_pretrain_batch,
    )
    from countr_tpu.models.mae import MaskedAutoencoderViT
    from countr_tpu.utils.cache import enable_compilation_cache
    from countr_tpu.config import TrainConfig

    enable_compilation_cache()
    b = args.batch
    iters = args.iters
    print(f"device={jax.devices()[0]} batch={b} iters={iters}", flush=True)

    if not os.path.exists(os.path.join(args.data_dir, "annotation_FSC147_384.json")):
        from bench_finetune_e2e import make_dataset

        print("generating dataset...", flush=True)
        make_dataset(args.data_dir, 64, np.random.default_rng(0))
    meta = FSC147Meta.load(args.data_dir)
    store = build_pretrain_store(meta, meta.splits["train"], log=lambda *a: None)
    sa = store.arrays
    max_w = store.max_w
    print(f"store max_w={max_w}", flush=True)

    cfg = dataclasses.replace(
        MAE_PRESETS["mae_vit_base_patch16"], dtype=jnp.bfloat16,
        use_pallas_attention=True, approx_gelu=True,
    )
    model = MaskedAutoencoderViT(cfg)
    tcfg = TrainConfig(batch_size=b, epochs=100, warmup_epochs=1)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 384, 384, 3)), jax.random.key(1)
    )
    tx, _ = make_optimizer(tcfg, 100, b)
    state = init_train_state(params["params"], tx)

    ds = PretrainDataset(meta, seed=0, store=store)
    keys = ("img_idx", "crop_top", "crop_left", "crop_h", "crop_w",
            "transposed", "flip")
    samples = [ds[i % len(ds)] for i in range(b)]
    batch = {k: jax.device_put(np.stack([s[k] for s in samples])) for k in keys}

    # ---- timing scaffolding (see scripts/profile_train.py) ---------------
    def empty(x):
        def body(c, _):
            return c * jnp.float32(1.0000001), None

        return lax.scan(body, x, None, length=iters)[0]

    erun = jax.jit(empty)
    x0 = jnp.float32(1.0)
    float(erun(x0))

    def measure_floor(reps=3):
        fl = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(erun(x0))
            fl = min(fl, time.perf_counter() - t0)
        return fl

    def timed(run, *a, reps=4, n_iters=None):
        n_iters = iters if n_iters is None else n_iters
        for attempt in range(3):
            try:
                r = run(*a)
                _ = float(np.asarray(r).ravel()[0])
                break
            except Exception as e:
                if attempt == 2:
                    raise
                print(f"  (compile/warmup retry: {type(e).__name__})", flush=True)
                time.sleep(5)
        best = 1e9
        floor = 1e9
        for _ in range(reps):
            floor = min(floor, measure_floor(reps=1))
            t0 = time.perf_counter()
            r = run(*a)
            _ = float(np.asarray(r).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return max(best - floor, 0.0) / n_iters

    results = {}

    def seg(name, f, *a):
        def looped(*a):
            def body(c, _):
                out = f(c, *a)
                return jnp.float32(out.ravel()[0]) * 1e-12, None

            return lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

        dt = timed(jax.jit(looped), *a)
        results[name] = dt
        print(f"{name:<44s} {dt * 1e3:8.2f} ms/iter", flush=True)
        return dt

    def izero(c):
        return jnp.int32(c * 1e-20)

    # ---- segments --------------------------------------------------------
    def f_materialize(c, sa, batch):
        bb = dict(batch)
        bb["img_idx"] = batch["img_idx"] + izero(c)
        bb["crop_top"] = batch["crop_top"] + izero(c)
        return materialize_pretrain_batch(sa, bb, max_w)

    seg("materialize_pretrain (slab+bicubic+flip)", f_materialize, sa, batch)

    from countr_tpu.config import IMG_SIZE

    def f_slab(c, sa, batch):
        px, base = sa["pixels"], sa["base"]
        idxs = batch["img_idx"] + izero(c)

        def one(idx):
            flat = jax.lax.dynamic_slice_in_dim(
                px, base[idx], max_w * IMG_SIZE, axis=0
            )
            return flat.reshape(max_w, IMG_SIZE, 3)

        return jax.vmap(one)(idxs).astype(jnp.float32)

    seg("  slab single-slices only (all B)", f_slab, sa, batch)

    slab0 = jax.jit(lambda sa, batch: f_slab(jnp.float32(0.0), sa, batch))(sa, batch)

    def f_bicubic(c, slab, batch):
        def one(img, top, left, ch, cw):
            wy = _bicubic_band(IMG_SIZE, top, ch)
            wx = _bicubic_band(max_w, left, cw)
            prec = jax.lax.Precision.HIGHEST
            out = jnp.einsum("xy...,xo->oy...", img + c * 1e-12, wx,
                             precision=prec)
            return jnp.einsum("oy...,yj->oj...", out, wy, precision=prec)

        return jax.vmap(one)(
            slab, batch["crop_top"], batch["crop_left"],
            batch["crop_h"], batch["crop_w"],
        )

    seg("  bicubic band matmuls only (all B)", f_bicubic, slab0, batch)

    imgs0 = jax.jit(
        lambda sa, batch: materialize_pretrain_batch(sa, batch, max_w)
    )(sa, batch)

    def f_fwd(c, p, imgs):
        loss, _pred, _mask = model.apply(
            {"params": p}, imgs + c * 1e-12, jax.random.key(11)
        )
        return loss[None]

    seg("forward only (MAE loss)", f_fwd, state.params, imgs0)

    def f_vag(c, p, imgs):
        def loss_fn(params):
            loss, _pred, _mask = model.apply(
                {"params": params}, imgs + c * 1e-12, jax.random.key(11)
            )
            return loss

        l, g = jax.value_and_grad(loss_fn)(p)
        gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return l[None] + gsum * 1e-20

    seg("forward+backward (value_and_grad)", f_vag, state.params, imgs0)

    if args.deep:
        # ---- encoder / decoder / optimizer attribution -------------------
        # method-level applies of the SAME bound module, so the segments
        # sum (modulo glue) to the full forward/backward above.
        rng_mask = jax.random.key(11)

        def f_enc_fwd(c, p, imgs):
            latent, _mask, _ids = model.apply(
                {"params": p}, imgs + c * 1e-12, rng_mask, cfg.mask_ratio,
                method=MaskedAutoencoderViT.encode,
            )
            return jnp.sum(latent.astype(jnp.float32))[None]

        seg("  encoder fwd (patchify+mask+12 blocks)", f_enc_fwd,
            state.params, imgs0)

        def f_enc_vag(c, p, imgs):
            def lf(params):
                latent, _m, _i = model.apply(
                    {"params": params}, imgs + c * 1e-12, rng_mask,
                    cfg.mask_ratio, method=MaskedAutoencoderViT.encode,
                )
                return jnp.sum(latent.astype(jnp.float32))
            l, g = jax.value_and_grad(lf)(p)
            gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
            return l[None] + gsum * 1e-20

        seg("  encoder fwd+bwd", f_enc_vag, state.params, imgs0)

        latent0, _m0, ids0 = jax.jit(
            lambda p, imgs: model.apply(
                {"params": p}, imgs, rng_mask, cfg.mask_ratio,
                method=MaskedAutoencoderViT.encode,
            )
        )(state.params, imgs0)

        def f_dec_fwd(c, p, latent, ids):
            pred = model.apply(
                {"params": p}, latent + c * 1e-12, ids,
                method=MaskedAutoencoderViT.decode,
            )
            return jnp.sum(pred.astype(jnp.float32))[None]

        seg("  decoder fwd (8 blocks + pred)", f_dec_fwd, state.params,
            latent0, ids0)

        def f_dec_vag(c, p, latent, ids):
            def lf(params):
                pred = model.apply(
                    {"params": params}, latent + c * 1e-12, ids,
                    method=MaskedAutoencoderViT.decode,
                )
                return jnp.sum(pred.astype(jnp.float32))
            l, g = jax.value_and_grad(lf)(p)
            gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
            return l[None] + gsum * 1e-20

        seg("  decoder fwd+bwd", f_dec_vag, state.params, latent0, ids0)

        def seg_opt(name):
            def looped(st):
                def body(carry, _):
                    stc, acc = carry
                    g = jax.tree_util.tree_map(
                        lambda x: x * (1e-6 + acc * 1e-20), stc.params
                    )
                    stc = stc.apply_gradients(grads=g)
                    # EVERY param leaf feeds the scan output: a single-
                    # leaf readout lets XLA's while-loop DCE delete the
                    # other ~112M params' update chains (the hazard
                    # docs/PROFILE.md records for scan-based optimizer
                    # microbenches)
                    acc = sum(
                        jnp.sum(x.astype(jnp.float32))
                        for x in jax.tree_util.tree_leaves(stc.params)
                    ) * 1e-12
                    return (stc, acc), None

                (stc, acc), _ = lax.scan(
                    body, (st, jnp.float32(0.0)), None, length=iters
                )
                return acc[None]

            dt = timed(jax.jit(looped), state)
            results[name] = dt
            print(f"{name:<44s} {dt * 1e3:8.2f} ms/iter", flush=True)

        seg_opt("  AdamW update (112M params, all leaves fed)")

    # ---- full step -------------------------------------------------------
    step_fn = make_store_pretrain_step(model, max_w)
    iters_full = max(iters // 2, 5)

    def full_chain(state, sa, batch):
        def body(st, i):
            bb = dict(batch)
            bb["img_idx"] = batch["img_idx"] + jnp.int32(jnp.float32(st.step) * 0)
            st, m = step_fn(st, sa, bb, jax.random.fold_in(jax.random.key(3), i))
            return st, m["loss"]

        st, losses = lax.scan(body, state, jnp.arange(iters_full))
        return losses[-1][None]

    dt = timed(jax.jit(full_chain), state, sa, batch, n_iters=iters_full)
    results["FULL resident pretrain step"] = dt
    print(f"{'FULL resident pretrain step':<44s} {dt * 1e3:8.2f} ms/iter",
          flush=True)
    print("---", flush=True)
    full = results["FULL resident pretrain step"]
    print(f"step images/sec at batch {b}: {b / full:.1f}", flush=True)


if __name__ == "__main__":
    main()

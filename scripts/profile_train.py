"""Per-segment device-time attribution of the resident fine-tune step.

Round-2 measured the resident fine-tune at 88 ms/step (batch 8) =
94.9% of device-only — but never attributed WHERE the device time goes
(materialization vs photometric vs forward vs backward vs optimizer).
This script times each piece with the same chained-scan methodology as
scripts/profile_forward.py (iters inside one jitted lax.scan, carry
feeds back into the inputs so XLA cannot hoist the body, one terminal
scalar fetch, empty-chain dispatch floor subtracted).

  python scripts/profile_train.py [--batch 8] [--iters 20]
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
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--iters", default=20, type=int)
    p.add_argument("--data_dir", default="/tmp/bench_fsc_e2e", type=str)
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.config import COUNTR_PRESETS, TrainConfig
    from countr_tpu.data.fsc147 import FSC147Meta, TrainDataset
    from countr_tpu.engine.train import (
        _finetune_core, init_train_state, make_optimizer,
        make_store_finetune_step,
    )
    from countr_tpu.engine.train_store import build_store, materialize_batch
    from countr_tpu.models.countr import CounTR
    from countr_tpu.ops.augment import density_from_dots, photometric
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    b = args.batch
    iters = args.iters
    print(f"device={jax.devices()[0]} batch={b} iters={iters}", flush=True)

    if not os.path.exists(os.path.join(args.data_dir, "annotation_FSC147_384.json")):
        from bench_finetune_e2e import make_dataset

        print("generating dataset...", flush=True)
        make_dataset(args.data_dir, 64, np.random.default_rng(0))
    meta = FSC147Meta.load(args.data_dir)
    store = build_store(meta, meta.splits["train"])
    sa = store.arrays

    cfg = dataclasses.replace(
        COUNTR_PRESETS["mae_vit_base6_patch16"], dtype=jnp.bfloat16,
        use_pallas_attention=True, approx_gelu=True, subpixel_head=True,
    )
    model = CounTR(cfg)
    tcfg = TrainConfig(batch_size=b, epochs=100, warmup_epochs=1)
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.key(0), jnp.zeros((1, 384, 384, 3)),
        jnp.zeros((1, 3, 64, 64, 3)), 3,
    )
    tx, _ = make_optimizer(tcfg, 100, b, freeze_encoder=cfg.freeze_encoder)
    state = init_train_state(params["params"], tx)

    ds = TrainDataset(meta, do_aug=True, seed=0, store_index=store.index)
    keys = ("img_idx", "affine_C", "affine_d", "is_mosaic", "cell_idx",
            "cell_top", "cell_left", "cell_len", "blend_l", "dots", "n_dots")
    samples = [ds[i] for i in range(b)]
    batch = {k: jax.device_put(np.stack([s[k] for s in samples])) for k in keys}
    # force a mix: half mosaic, half affine, to match steady-state cost
    n_mos = int(np.sum([s["is_mosaic"] for s in samples]))
    print(f"batch mosaic samples: {n_mos}/{b}", flush=True)

    # ---- floor ----------------------------------------------------------
    # The tunnel's dispatch floor DRIFTS session-to-session (30-120 ms
    # observed); re-measure right before every segment and interleave
    # (floor, segment) pairs so drift cancels from the subtraction.
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

    def timed(run, *a, reps=4):
        for attempt in range(3):  # remote_compile can drop mid-response
            try:
                r = run(*a)
                _ = float(np.asarray(r).ravel()[0])
                break
            except Exception as e:
                if attempt == 2:
                    raise
                print(f"  (compile/warmup retry: {type(e).__name__})",
                      flush=True)
                time.sleep(5)
        best = 1e9
        floor = 1e9
        for _ in range(reps):
            floor = min(floor, measure_floor(reps=1))
            t0 = time.perf_counter()
            r = run(*a)
            _ = float(np.asarray(r).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return max(best - floor, 0.0) / iters

    results = {}

    def seg(name, f, *a):
        """f(carry_f32, *a) -> scalar-reducible array; carry perturbs
        the inputs inside f so the body cannot be hoisted."""

        def looped(*a):
            def body(c, _):
                out = f(c, *a)
                return jnp.float32(out.ravel()[0]) * 1e-12, None

            return lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

        dt = timed(jax.jit(looped), *a)
        results[name] = dt
        print(f"{name:<44s} {dt * 1e3:8.2f} ms/iter", flush=True)
        return dt

    # dynamically-zero int offset XLA cannot const-fold (carry is data)
    def izero(c):
        return jnp.int32(c * 1e-20)

    # ---- segments -------------------------------------------------------
    def f_materialize(c, sa, batch):
        # perturb EVERY geometry input: the real step gets fresh
        # geometry each iteration, so nothing may be hoisted
        bb = dict(batch)
        bb["img_idx"] = batch["img_idx"] + izero(c)
        bb["affine_d"] = batch["affine_d"] + c * 1e-12
        bb["cell_top"] = batch["cell_top"] + izero(c)
        imgs, boxes = materialize_batch(sa, bb)
        return imgs + boxes.ravel()[0]

    seg("materialize_batch (affine+mosaic+boxes)", f_materialize, sa, batch)

    def f_affine_only(c, sa, batch):
        from countr_tpu.engine.train_store import _affine_sample

        px, base, width, height = (
            sa["pixels"], sa["base"], sa["width"], sa["height"],
        )

        def one(idx, C, d):
            return _affine_sample(px, base[idx], width[idx], height[idx],
                                  width[idx], C, d)

        return jax.vmap(one)(
            batch["img_idx"] + izero(c),
            batch["affine_C"], batch["affine_d"] + c * 1e-12,
        )

    seg("  affine gather-sample only (all B)", f_affine_only, sa, batch)

    def f_mosaic_only(c, sa, batch):
        from countr_tpu.engine.train_store import _mosaic_sample

        px = sa["pixels"]

        def one(cidx, ctop, cleft, clen, bl):
            return _mosaic_sample(px, sa["base"][cidx], sa["width"][cidx],
                                  ctop, cleft, clen, bl)

        return jax.vmap(one)(
            batch["cell_idx"] + izero(c), batch["cell_top"],
            batch["cell_left"], batch["cell_len"], batch["blend_l"],
        )

    seg("  mosaic band-matmul only (all B)", f_mosaic_only, sa, batch)

    imgs0, boxes0 = jax.jit(materialize_batch)(sa, batch)

    def f_photo(c, imgs):
        keys = jax.random.split(jax.random.key(7), imgs.shape[0])
        return jax.vmap(photometric)(keys, imgs + c * 1e-12)

    seg("photometric chain (all B)", f_photo, imgs0)

    def f_density(c, batch):
        return jax.vmap(density_from_dots)(
            batch["dots"] + (c * 1e-12).astype(batch["dots"].dtype),
            batch["n_dots"],
        )

    seg("density_from_dots (all B)", f_density, batch)

    gt0 = jax.jit(lambda ba: jax.vmap(density_from_dots)(ba["dots"], ba["n_dots"]))(batch)

    def f_fwd(c, p, imgs, boxes):
        out = model.apply({"params": p}, imgs + c * 1e-12, boxes, 3)
        return out

    seg("forward only (loss fwd, shot 3)", f_fwd, state.params, imgs0, boxes0)

    def f_vag(c, p, imgs, boxes, gt):
        def loss_fn(params):
            out = model.apply({"params": params}, imgs + c * 1e-12, boxes, 3)
            return jnp.sum(jnp.square(out - gt)) / (384 * 384) / imgs.shape[0]

        l, g = jax.value_and_grad(loss_fn)(p)
        # touch EVERY grad leaf: the first leaf alphabetically is a
        # frozen-encoder param whose grad is a stop_gradient zero — XLA
        # would DCE the entire backward if only that leaf were read
        gsum = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return l[None] + gsum * 1e-20

    seg("forward+backward (value_and_grad)", f_vag, state.params, imgs0,
        boxes0, gt0)

    # vag + optimizer, scan with carry = state: every updated param
    # feeds the next iteration, so nothing in the AdamW update can be
    # DCE'd (the hazard that invalidates a standalone optimizer
    # microbench). Subtracting the vag segment isolates the optimizer +
    # donation cost; subtracting THIS from the full step isolates the
    # in-step data work (materialize+photo+density+metrics glue).
    iters_full = max(iters // 2, 5)

    def vag_opt_chain(state, imgs, boxes, gt):
        def body(st, i):
            def loss_fn(params):
                out = model.apply(
                    {"params": params},
                    imgs + jnp.float32(st.step) * 0.0, boxes, 3,
                )
                return jnp.sum(jnp.square(out - gt)) / (384 * 384) / b

            l, g = jax.value_and_grad(loss_fn)(st.params)
            return st.apply_gradients(g), l

        st, losses = lax.scan(body, state, jnp.arange(iters_full))
        return losses[-1][None]

    run_vo = jax.jit(vag_opt_chain)
    saved_iters0 = iters
    iters = iters_full
    dt_vo = timed(run_vo, state, imgs0, boxes0, gt0)
    iters = saved_iters0
    results["fwd+bwd+optimizer (state-carry scan)"] = dt_vo
    print(f"{'fwd+bwd+optimizer (state-carry scan)':<44s} "
          f"{dt_vo * 1e3:8.2f} ms/iter", flush=True)

    # amortization probe: does materializing 4 steps' worth of samples
    # in one call beat 4 calls? (probe_gather says the taps are
    # per-element-bound, so this measures the per-call fixed overhead.)
    b4 = 4 * b
    samples4 = [ds[i % len(ds)] for i in range(b4)]
    batch4 = {k: jax.device_put(np.stack([s[k] for s in samples4]))
              for k in keys}
    dt4 = seg("materialize 4x batch (amortization probe)",
              f_materialize, sa, batch4)
    print(f"  -> per-b{b}-equivalent: {dt4 / 4 * 1e3:8.2f} ms", flush=True)

    # full resident step: carry IS the state (params change every iter)
    step_fn = make_store_finetune_step(model, tcfg)

    def full_chain(state, sa, batch):
        def body(st, i):
            bb = dict(batch)
            bb["img_idx"] = batch["img_idx"] + jnp.int32(
                jnp.float32(st.step) * 0
            )
            st, m = step_fn(st, sa, bb, jax.random.fold_in(jax.random.key(3), i),
                            3)
            return st, m["loss"]

        st, losses = lax.scan(body, state, jnp.arange(iters_full))
        return losses[-1][None]

    run = jax.jit(full_chain)
    saved_iters = iters
    iters = iters_full  # timed() divides by the global; full chain is shorter
    dt = timed(run, state, sa, batch)
    iters = saved_iters
    results["FULL resident step (mat+aug+fwd+bwd+opt)"] = dt
    print(f"{'FULL resident step (mat+aug+fwd+bwd+opt)':<44s} "
          f"{dt * 1e3:8.2f} ms/iter", flush=True)

    # full step with the mosaic-prefix bucket (what cli.finetune runs)
    from countr_tpu.engine.train_store import mosaic_bucket, sort_mosaic_first

    host_batch = {k: np.stack([s[k] for s in samples]) for k in keys}
    sorted_batch, k_mos = sort_mosaic_first(host_batch)
    nb = mosaic_bucket(k_mos, b)
    batch_s = {k: jax.device_put(v) for k, v in sorted_batch.items()}

    def full_chain_bucket(state, sa, batch):
        def body(st, i):
            bb = dict(batch)
            bb["img_idx"] = batch["img_idx"] + jnp.int32(
                jnp.float32(st.step) * 0
            )
            st, m = step_fn(st, sa, bb, jax.random.fold_in(jax.random.key(3), i),
                            3, nb)
            return st, m["loss"]

        st, losses = lax.scan(body, state, jnp.arange(iters_full))
        return losses[-1][None]

    run_b = jax.jit(full_chain_bucket)
    iters = iters_full
    dt_b = timed(run_b, state, sa, batch_s)
    iters = saved_iters
    name_b = f"FULL step, mosaic-prefix bucket (K={nb})"
    results[name_b] = dt_b
    print(f"{name_b:<44s} {dt_b * 1e3:8.2f} ms/iter", flush=True)

    print("---", flush=True)
    full = results["FULL resident step (mat+aug+fwd+bwd+opt)"]
    vag = results["forward+backward (value_and_grad)"]
    vo = results["fwd+bwd+optimizer (state-carry scan)"]
    mat = results["materialize_batch (affine+mosaic+boxes)"]
    pho = results["photometric chain (all B)"]
    den = results["density_from_dots (all B)"]
    print("ledger (ms): "
          f"fwd+bwd {vag * 1e3:.1f} + optimizer {(vo - vag) * 1e3:.1f} + "
          f"materialize {mat * 1e3:.1f} + photometric {pho * 1e3:.1f} + "
          f"density {den * 1e3:.1f} + glue "
          f"{(full - vo - mat - pho - den) * 1e3:.1f} "
          f"= {full * 1e3:.1f} total "
          f"(sum covers {(vo + mat + pho + den) / full * 100:.0f}% "
          f"before glue)", flush=True)
    print(f"step images/sec at batch {b}: {b / full:.1f} "
          f"(bucketed: {b / dt_b:.1f})", flush=True)


if __name__ == "__main__":
    main()

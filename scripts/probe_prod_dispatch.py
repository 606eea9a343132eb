"""Does the PRODUCTION per-dispatch train loop pay the program-output
staging cost? (round 5)

probe_2disp_parts.py established that a standalone program returning
the 14 MB carry costs ~65 ms more per dispatch than the same work
reduced in-program (~4.6 ms/MB of program outputs), and donation
hints did not engage for the materialize program. The production
fine-tune CLI (cli/finetune.py) dispatches make_store_finetune_step
once per batch from Python — its outputs are the full TrainState
(donated: state argument 0). If staging bills per output byte
regardless of donation, the real CLI step would be far slower than
the 64.75 ms chained-scan ledger; if donation-aliased outputs skip
staging, per-dispatch stepping should cost ~64.7 + the ~11 ms fixed
program cost.

  serial-scan — 10 production steps inside ONE scanned program.
                CAVEAT: with a repeated batch and no carry
                perturbation XLA HOISTS the loop-invariant gather out
                of the scan (measured 40.6 ms/step, impossibly fast) —
                ab_overlap.py's perturbed serial (64.7) is the honest
                chained baseline; this variant is kept as evidence of
                the hoist;
  prod-loop   — 10 production step dispatches, state threaded with
                donation, loss fetched once at the end (the CLI's
                actual dispatch pattern);
  prod-scanK  — 10 DIFFERENT batches' geometry pre-stacked [K, ...]
                and consumed by ONE K-step scanned program (geometry
                stays argument-derived → fast gather; varies per step
                → no hoisting). If the ~11 ms fixed per-execution
                cost is real for the production step, this wins
                ~10 ms/step and a --steps_per_dispatch CLI mode is
                worth wiring.

RESULT (v5e, batch 8): prod-loop 55.9-62.8 ms/step across two
sessions ≈ the 64.75 chained ledger — the 704 MB donated TrainState
outputs carry NO per-dispatch staging cost, so the CLI's per-batch
dispatch loop is sound. prod-scanK 56.16 vs prod-loop 55.89
same-session: batching K steps into ONE scanned program buys nothing
(the production step has ~zero per-dispatch overhead); a
--steps_per_dispatch CLI mode is NOT worth wiring.

  python scripts/probe_prod_dispatch.py [--batch 8] [--iters 10]
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
    p.add_argument("--iters", default=10, type=int)
    p.add_argument("--rounds", default=4, type=int)
    p.add_argument("--data_dir", default="/tmp/bench_fsc_e2e", type=str)
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.config import COUNTR_PRESETS, TrainConfig
    from countr_tpu.data.fsc147 import FSC147Meta, TrainDataset
    from countr_tpu.engine.train import (
        init_train_state, make_optimizer, make_store_finetune_step,
    )
    from countr_tpu.engine.train_store import build_store
    from countr_tpu.models.countr import CounTR
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    b, iters = args.batch, args.iters
    print(f"device={jax.devices()[0]} batch={b} iters={iters}", flush=True)

    if not os.path.exists(os.path.join(args.data_dir,
                                       "annotation_FSC147_384.json")):
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
    state0 = init_train_state(params["params"], tx)
    n_state_mb = sum(l.nbytes for l in jax.tree.leaves(state0)) / 1e6
    print(f"TrainState size: {n_state_mb:.0f} MB", flush=True)

    ds = TrainDataset(meta, do_aug=True, seed=0, store_index=store.index)
    keys = ("img_idx", "affine_C", "affine_d", "is_mosaic", "cell_idx",
            "cell_top", "cell_left", "cell_len", "blend_l", "dots", "n_dots")
    samples = [ds[i] for i in range(b)]
    batch = {k: jax.device_put(np.stack([s[k] for s in samples]))
             for k in keys}
    # iters DISTINCT batches, stacked [iters, b, ...] for the scan form
    stacked = {}
    for k in keys:
        rows = []
        for j in range(args.iters):
            smp = [ds[(j * b + i) % len(ds)] for i in range(b)]
            rows.append(np.stack([s[k] for s in smp]))
        stacked[k] = jax.device_put(np.stack(rows))

    step_fn = make_store_finetune_step(model, tcfg)

    def serial_chain(state, sa, batch):
        def body(st, i):
            # jit-of-jit inlines; inner donation hints are ignored here
            st, m = step_fn(
                st, sa, batch, jax.random.fold_in(jax.random.key(3), i), 3)
            return st, m["loss"]

        st, losses = lax.scan(body, state, jnp.arange(iters))
        return losses[-1][None]

    run_serial = jax.jit(serial_chain)

    def prod_loop(state):
        m = None
        for i in range(iters):
            state, m = step_fn(
                state, sa, batch, jax.random.fold_in(jax.random.key(3), i), 3)
        return state, m

    def scank_chain(state, sa, stacked):
        def body(st, xs):
            geom, i = xs
            st, m = step_fn(st, sa, geom,
                            jax.random.fold_in(jax.random.key(3), i), 3)
            return st, m["loss"]

        st, losses = lax.scan(body, state, (stacked, jnp.arange(iters)))
        return st, losses[-1][None]

    run_scank = jax.jit(scank_chain, donate_argnums=(0,))

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

    print("compiling...", flush=True)
    float(np.asarray(run_serial(jax.tree.map(jnp.copy, state0), sa,
                                batch))[0])
    st, m = prod_loop(jax.tree.map(jnp.copy, state0))
    # honest fetch: last loss + a 1-element slice of the final state
    float(m["loss"])
    float(jax.tree.leaves(st)[0].ravel()[0])
    st, losses = run_scank(jax.tree.map(jnp.copy, state0), sa, stacked)
    float(losses[0]); float(jax.tree.leaves(st)[0].ravel()[0])

    best = {"serial-scan": 1e9, "prod-loop": 1e9, "prod-scanK": 1e9}
    for r in range(args.rounds):
        st_c = jax.tree.map(jnp.copy, state0)
        fl = floor_once()
        t0 = time.perf_counter()
        float(np.asarray(run_serial(st_c, sa, batch))[0])
        best["serial-scan"] = min(best["serial-scan"],
                                  (time.perf_counter() - t0 - fl) / iters)

        st_c = jax.tree.map(jnp.copy, state0)
        fl = floor_once()
        t0 = time.perf_counter()
        st, m = prod_loop(st_c)
        float(m["loss"])
        float(jax.tree.leaves(st)[0].ravel()[0])
        best["prod-loop"] = min(best["prod-loop"],
                                (time.perf_counter() - t0 - fl) / iters)

        st_c = jax.tree.map(jnp.copy, state0)
        fl = floor_once()
        t0 = time.perf_counter()
        st, losses = run_scank(st_c, sa, stacked)
        float(losses[0])
        float(jax.tree.leaves(st)[0].ravel()[0])
        best["prod-scanK"] = min(best["prod-scanK"],
                                 (time.perf_counter() - t0 - fl) / iters)
        print(f"round {r}: " + "  ".join(
            f"{k} {v * 1e3:.2f}" for k, v in best.items()), flush=True)

    print("---", flush=True)
    for k, v in best.items():
        print(f"{k:<12s} {v * 1e3:8.2f} ms/step", flush=True)
    print(f"prod-loop penalty: "
          f"{(best['prod-loop'] - best['serial-scan']) * 1e3:+.2f} ms/step",
          flush=True)


if __name__ == "__main__":
    main()

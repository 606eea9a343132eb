"""A/B: software-pipelined resident fine-tune step vs the serial step.

VERDICT r4 item 1: 52% of the 64.75 ms serial step is the affine
4-tap gather, which is independent of the fwd/bwd it runs next to
(docs/PROFILE.md). Two overlap mechanisms are priced, interleaved in
ONE session so shared-chip drift cancels:

  serial       — production make_store_finetune_step in a state-carry
                 scan (the round-3 ledger's configuration);
  pipelined    — ONE program that trains on the previously-materialized
                 batch while materializing the next (XLA may overlap
                 the gather's DMA traffic with MXU work);
  serial-2disp — the same work as two dispatches per step (materialize
                 program + train program) queued back-to-back in a
                 Python loop: measures whether the RUNTIME overlaps
                 independent dispatches (expected: no — one TensorCore
                 executes queued programs serially).

Methodology: chained scans (carry feeds the inputs so nothing hoists),
one terminal scalar fetch, empty-chain dispatch floor re-measured and
subtracted per round (block_until_ready is unreliable on axon).

  python scripts/ab_overlap.py [--batch 8] [--iters 10] [--rounds 4]
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
        _finetune_core, _materialize_train_batch, init_train_state,
        make_optimizer, make_store_finetune_step, make_store_materialize,
        make_store_train_phase,
    )
    from countr_tpu.engine.train_store import build_store
    from countr_tpu.models.countr import CounTR
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
    state0 = init_train_state(params["params"], tx)

    ds = TrainDataset(meta, do_aug=True, seed=0, store_index=store.index)
    keys = ("img_idx", "affine_C", "affine_d", "is_mosaic", "cell_idx",
            "cell_top", "cell_left", "cell_len", "blend_l", "dots", "n_dots")
    samples = [ds[i] for i in range(b)]
    batch = {k: jax.device_put(np.stack([s[k] for s in samples])) for k in keys}
    n_mos = int(np.sum([s["is_mosaic"] for s in samples]))
    print(f"batch mosaic samples: {n_mos}/{b}", flush=True)

    def perturb(bb, st):
        out = dict(bb)
        out["img_idx"] = bb["img_idx"] + jnp.int32(jnp.float32(st.step) * 0)
        return out

    # ---- serial: production step in a state-carry scan ---------------
    step_fn = make_store_finetune_step(model, tcfg)

    def serial_chain(state, sa, batch):
        def body(st, i):
            st, m = step_fn(st, sa, perturb(batch, st),
                            jax.random.fold_in(jax.random.key(3), i), 3)
            return st, m["loss"]

        st, losses = lax.scan(body, state, jnp.arange(iters))
        return losses[-1][None]

    # ---- pipelined: train on carry, materialize next, one program ----
    prime = make_store_materialize()

    def pipe_chain(state, sa, batch, carry0):
        def body(c, i):
            st, cr = c
            new_st, m = _finetune_core(
                model, tcfg, st, cr["imgs"], cr["gt"], cr["boxes"],
                cr["rng"], 3,
            )
            new_cr = _materialize_train_batch(
                sa, perturb(batch, new_st), jax.random.fold_in(jax.random.key(3), i)
            )
            return (new_st, new_cr), m["loss"]

        (st, cr), losses = lax.scan(body, (state, jax.tree.map(jnp.asarray, carry0)),
                                    jnp.arange(iters))
        # touch the final carry so its materialization is not DCE'd
        return losses[-1][None] + cr["imgs"].ravel()[0] * 1e-20

    # ---- two-dispatch serial: runtime-level queueing -----------------
    train_phase = make_store_train_phase(model, tcfg)
    mat_jit = make_store_materialize()

    def two_dispatch_run(state, carry):
        # iters steps, each = one materialize dispatch + one train
        # dispatch; returns (state, carry, last_metrics). The caller
        # must fetch BOTH the last metrics AND a scalar of the final
        # carry — the last materialize feeds nothing the metrics fetch
        # waits on, so timing only the loss would drop one mat from
        # the measurement.
        m = None
        for i in range(iters):
            nxt = mat_jit(sa, batch, jax.random.fold_in(jax.random.key(3), i))
            state, m = train_phase(state, carry, 3)
            carry = nxt
        return state, carry, m

    # ---- timing ------------------------------------------------------
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

    def fetch(r):
        return float(np.asarray(r).ravel()[0])

    run_serial = jax.jit(serial_chain)
    run_pipe = jax.jit(pipe_chain)
    carry0 = prime(sa, batch, jax.random.key(9))

    print("compiling serial...", flush=True)
    fetch(run_serial(state0, sa, batch))
    print("compiling pipelined...", flush=True)
    fetch(run_pipe(state0, sa, batch, carry0))
    print("compiling two-dispatch...", flush=True)
    # train_phase donates (state, carry): hand it copies every run
    st, cr, m = two_dispatch_run(
        jax.tree.map(jnp.copy, state0), jax.tree.map(jnp.copy, carry0)
    )
    float(m["loss"]); float(cr["imgs"][0, 0, 0, 0])

    best = {"serial": 1e9, "pipelined": 1e9, "serial-2disp": 1e9}
    for r in range(args.rounds):
        fl = floor_once()
        t0 = time.perf_counter()
        fetch(run_serial(state0, sa, batch))
        best["serial"] = min(best["serial"],
                             (time.perf_counter() - t0 - fl) / iters)
        fl = floor_once()
        t0 = time.perf_counter()
        fetch(run_pipe(state0, sa, batch, carry0))
        best["pipelined"] = min(best["pipelined"],
                                (time.perf_counter() - t0 - fl) / iters)
        st_c = jax.tree.map(jnp.copy, state0)
        cr_c = jax.tree.map(jnp.copy, carry0)
        fl = floor_once()
        t0 = time.perf_counter()
        st, cr, m = two_dispatch_run(st_c, cr_c)
        # await the final mat via a 1-element device slice — np.asarray
        # of the whole carry would drag 14 MB through the tunnel and
        # bill ~90 ms/step of D2H to the variant
        float(m["loss"]); float(cr["imgs"][0, 0, 0, 0])
        best["serial-2disp"] = min(best["serial-2disp"],
                                   (time.perf_counter() - t0 - fl) / iters)
        print(f"round {r}: " + "  ".join(
            f"{k} {v * 1e3:.2f} ms" for k, v in best.items()), flush=True)

    print("---", flush=True)
    for k, v in best.items():
        print(f"{k:<14s} {v * 1e3:8.2f} ms/step  ({b / v:6.1f} img/s)",
              flush=True)
    s, pl = best["serial"], best["pipelined"]
    print(f"pipelined vs serial: {s / pl:.2f}x "
          f"({(s - pl) * 1e3:+.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()

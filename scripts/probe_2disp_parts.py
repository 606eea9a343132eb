"""Decompose the two-dispatch pipeline's cost (round 5).

ab_overlap.py with the honest terminal fetch (loss AND a scalar of the
final carry) measures serial-2disp at 114-155 ms/step across two
sessions vs the 64.7 ms serial scan — yet the biased fetch (loss only)
measured 54.5 ms. This probe isolates where the two-dispatch form's
extra cost lives, all in ONE session so chip weather cancels:

  mat-scan    — 10 materializations as ONE scanned program (the serial
                step's in-scan gather formulation; ledger ~36 ms/iter);
  mat-loop    — the same 10 materializations as 10 separate program
                dispatches (the pipeline's mat half), all outputs
                forced via one terminal reduce program;
  train-scan  — 10 train phases as ONE scanned program on a fixed
                carry (ledger fwd+bwd+opt ~28.4 ms/iter);
  train-loop  — 10 separate train_phase dispatches (donated state
                threaded, pre-copied carries);
  2disp       — the interleaved mat+train loop, timed twice in the
                same run: at the loss fetch (the biased cut) and after
                the final-carry fetch (honest);
  mat-loop-scan1 — separate dispatches whose program wraps the
                materialization in a length-1 lax.scan (tests whether
                the fast gather lowering is scan-body-specific);
  mat-loop-ikey — separate dispatches whose rng key is derived
                IN-program from an int32 step argument (tests whether
                the key-as-argument form is the slow-path trigger);
  mat-loop-reduce — separate dispatches whose program reduces the
                materialized batch to ONE scalar in-program (no
                multi-MB program outputs: tests whether the excess is
                output staging, the last structural difference vs the
                fast in-scan form);
  mat-loop-donate — separate dispatches that donate a carry-shaped
                scratch pytree so XLA aliases the 14 MB outputs to
                donated input buffers (tests whether aliased outputs
                skip the staging cost — if so, the two-dispatch
                pipeline becomes viable: the train program already
                measures as fully hidden under the mat dispatches).

RESULTS (v5e, batch 8, four sessions): mat-scan 36.2-36.4 ms/iter;
mat-loop / scan1 / ikey / donate all 111-114 ms/dispatch (the donated
scratch was reported "not usable" — no alias pairing found);
mat-loop-reduce 47.4-48.9. The discriminator is OUTPUT BYTES: fresh
multi-MB program outputs cost ~4.6 ms/MB per dispatch (+~11 ms fixed
per execution, fitted from --iters 3 vs 10). The full gather runs at
fast-path cost standalone (the reduce variant), and 2disp@all tracks
mat-loop alone — the ~28 ms train program hides completely under the
queued mats, so the runtime overlaps independent programs; the
staging cost is what kills the pipeline. See also
probe_program_overhead.py (not input binding) and
probe_prod_dispatch.py (donation-ALIASED 704 MB TrainState outputs
are exempt: the production loop costs 62.8 ms/step).

  python scripts/probe_2disp_parts.py [--batch 8] [--iters 10]
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
        make_optimizer, make_store_materialize, make_store_train_phase,
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

    ds = TrainDataset(meta, do_aug=True, seed=0, store_index=store.index)
    keys = ("img_idx", "affine_C", "affine_d", "is_mosaic", "cell_idx",
            "cell_top", "cell_left", "cell_len", "blend_l", "dots", "n_dots")
    samples = [ds[i] for i in range(b)]
    batch = {k: jax.device_put(np.stack([s[k] for s in samples]))
             for k in keys}

    mat_jit = make_store_materialize()
    train_phase = make_store_train_phase(model, tcfg)
    carry0 = mat_jit(sa, batch, jax.random.key(9))

    # ---- mat-scan: one program, 10 materializations ------------------
    def mat_scan(sa, batch):
        def body(acc, i):
            c = _materialize_train_batch(
                sa, batch, jax.random.fold_in(jax.random.key(3), i))
            # full reduces so XLA cannot DCE the materialization down
            # to the probed output elements (sub-ms vs the ~34 ms gather)
            tot = (jnp.sum(c["imgs"].astype(jnp.float32))
                   + jnp.sum(c["gt"].astype(jnp.float32))
                   + jnp.sum(c["boxes"].astype(jnp.float32)))
            return acc + tot, None

        return lax.scan(body, jnp.float32(0.0), jnp.arange(iters))[0][None]

    run_mat_scan = jax.jit(mat_scan)

    # ---- train-scan: one program, 10 train phases on a fixed carry ---
    def train_scan(state, carry):
        def body(st, i):
            st, m = _finetune_core(
                model, tcfg, st, carry["imgs"], carry["gt"], carry["boxes"],
                jax.random.fold_in(carry["rng"], i), 3,
            )
            return st, m["loss"]

        return lax.scan(body, state, jnp.arange(iters))[1][-1][None]

    run_train_scan = jax.jit(train_scan)

    # terminal reducer that forces all loop-dispatched mats with ONE
    # extra program + scalar fetch (np.asarray of any full output would
    # bill ~MBs of D2H to the variant)
    def _force(slices):
        return sum(slices)

    force = jax.jit(_force)

    def mat_loop():
        outs = [mat_jit(sa, batch, jax.random.fold_in(jax.random.key(3), i))
                for i in range(iters)]
        return float(force([o["imgs"][0, 0, 0, 0] for o in outs]))

    # standalone program, materialization inside a length-1 scan (the
    # serial step's fast gather lowering sits inside a scan body — is
    # that the trigger?)
    @jax.jit
    def mat_scan1(sa, batch, rng):
        def body(_, __):
            return 0, _materialize_train_batch(sa, batch, rng)

        _, ys = lax.scan(body, 0, None, length=1)
        return jax.tree.map(lambda a: a[0], ys)

    def mat_loop_scan1():
        outs = [mat_scan1(sa, batch,
                          jax.random.fold_in(jax.random.key(3), i))
                for i in range(iters)]
        return float(force([o["imgs"][0, 0, 0, 0] for o in outs]))

    # standalone program, key derived in-program from an int32 arg
    @jax.jit
    def mat_ikey(sa, batch, i):
        return _materialize_train_batch(
            sa, batch, jax.random.fold_in(jax.random.key(3), i))

    def mat_loop_ikey():
        outs = [mat_ikey(sa, batch, jnp.int32(i)) for i in range(iters)]
        return float(force([o["imgs"][0, 0, 0, 0] for o in outs]))

    # standalone program with NO multi-MB outputs: the full
    # materialization reduced to one scalar in-program (the same
    # anti-DCE reduce the fast mat-scan uses)
    @jax.jit
    def mat_reduce(sa, batch, rng):
        c = _materialize_train_batch(sa, batch, rng)
        return (jnp.sum(c["imgs"].astype(jnp.float32))
                + jnp.sum(c["gt"].astype(jnp.float32))
                + jnp.sum(c["boxes"].astype(jnp.float32)))

    def mat_loop_reduce():
        outs = [mat_reduce(sa, batch,
                           jax.random.fold_in(jax.random.key(3), i))
                for i in range(iters)]
        return float(force(outs))

    # standalone program whose 14 MB outputs alias a DONATED
    # carry-shaped scratch pytree
    from functools import partial

    @partial(jax.jit, donate_argnums=(2,))
    def mat_donate(sa, batch, scratch, rng):
        del scratch  # donated: XLA aliases the outputs to its buffers
        return _materialize_train_batch(sa, batch, rng)

    def make_scratches():
        return [jax.tree.map(jnp.copy, carry0) for _ in range(iters)]

    def mat_loop_donate(scratches):
        outs = [mat_donate(sa, batch, scratches[i],
                           jax.random.fold_in(jax.random.key(3), i))
                for i in range(iters)]
        return float(force([o["imgs"][0, 0, 0, 0] for o in outs]))

    def train_loop(st, carries):
        m = None
        for c in carries:
            st, m = train_phase(st, c, 3)
        return float(m["loss"])

    def two_disp(st, carry):
        m = None
        for i in range(iters):
            nxt = mat_jit(sa, batch, jax.random.fold_in(jax.random.key(3), i))
            st, m = train_phase(st, carry, 3)
            carry = nxt
        return st, carry, m

    # ---- dispatch floor ---------------------------------------------
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
    float(np.asarray(run_mat_scan(sa, batch))[0])
    float(np.asarray(run_train_scan(jax.tree.map(jnp.copy, state0),
                                    carry0))[0])
    mat_loop()
    mat_loop_scan1()
    mat_loop_ikey()
    mat_loop_reduce()
    mat_loop_donate(make_scratches())
    train_loop(jax.tree.map(jnp.copy, state0),
               [jax.tree.map(jnp.copy, carry0) for _ in range(iters)])
    st, cr, m = two_disp(jax.tree.map(jnp.copy, state0),
                         jax.tree.map(jnp.copy, carry0))
    float(m["loss"]); float(cr["imgs"][0, 0, 0, 0])

    best = {k: 1e9 for k in ("mat-scan", "mat-loop", "mat-loop-scan1",
                             "mat-loop-ikey", "mat-loop-reduce",
                             "mat-loop-donate", "train-scan",
                             "train-loop", "2disp@loss", "2disp@all")}
    for r in range(args.rounds):
        fl = floor_once()
        t0 = time.perf_counter()
        float(np.asarray(run_mat_scan(sa, batch))[0])
        best["mat-scan"] = min(best["mat-scan"],
                               (time.perf_counter() - t0 - fl) / iters)

        fl = floor_once()
        t0 = time.perf_counter()
        mat_loop()
        best["mat-loop"] = min(best["mat-loop"],
                               (time.perf_counter() - t0 - fl) / iters)

        fl = floor_once()
        t0 = time.perf_counter()
        mat_loop_scan1()
        best["mat-loop-scan1"] = min(best["mat-loop-scan1"],
                                     (time.perf_counter() - t0 - fl) / iters)

        fl = floor_once()
        t0 = time.perf_counter()
        mat_loop_ikey()
        best["mat-loop-ikey"] = min(best["mat-loop-ikey"],
                                    (time.perf_counter() - t0 - fl) / iters)

        fl = floor_once()
        t0 = time.perf_counter()
        mat_loop_reduce()
        best["mat-loop-reduce"] = min(
            best["mat-loop-reduce"],
            (time.perf_counter() - t0 - fl) / iters)

        scr = make_scratches()
        fl = floor_once()
        t0 = time.perf_counter()
        mat_loop_donate(scr)
        best["mat-loop-donate"] = min(
            best["mat-loop-donate"],
            (time.perf_counter() - t0 - fl) / iters)

        st_c = jax.tree.map(jnp.copy, state0)
        fl = floor_once()
        t0 = time.perf_counter()
        float(np.asarray(run_train_scan(st_c, carry0))[0])
        best["train-scan"] = min(best["train-scan"],
                                 (time.perf_counter() - t0 - fl) / iters)

        st_c = jax.tree.map(jnp.copy, state0)
        carries = [jax.tree.map(jnp.copy, carry0) for _ in range(iters)]
        fl = floor_once()
        t0 = time.perf_counter()
        train_loop(st_c, carries)
        best["train-loop"] = min(best["train-loop"],
                                 (time.perf_counter() - t0 - fl) / iters)

        st_c = jax.tree.map(jnp.copy, state0)
        cr_c = jax.tree.map(jnp.copy, carry0)
        fl = floor_once()
        t0 = time.perf_counter()
        st, cr, m = two_disp(st_c, cr_c)
        float(m["loss"])
        t_loss = time.perf_counter() - t0 - fl
        float(cr["imgs"][0, 0, 0, 0])
        t_all = time.perf_counter() - t0 - fl
        best["2disp@loss"] = min(best["2disp@loss"], t_loss / iters)
        best["2disp@all"] = min(best["2disp@all"], t_all / iters)

        print(f"round {r}: " + "  ".join(
            f"{k} {v * 1e3:.2f}" for k, v in best.items()), flush=True)

    print("---", flush=True)
    for k, v in best.items():
        print(f"{k:<12s} {v * 1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()

"""A/B: the fused attention half-block (ops/pallas_block.py, custom
VJP) in the TRAINING hot loops — the round-3 fusion was measured on
inference only; this script prices it where the kernels also run
backward (VERDICT r3 item 2).

Three variants of each resident step, interleaved round-robin in ONE
session so shared-chip drift cancels (all bf16, tanh GELU):

  fused   use_pallas_attention=True,  fused_attn_block=True  (default)
  pallas  use_pallas_attention=True,  fused_attn_block=False (round-2
          config: standalone Pallas LN + Pallas attention kernels)
  xla     use_pallas_attention=False (module path, XLA attention)

Steps timed (chained state-carry scan, empty-chain floor subtracted,
one terminal scalar — block_until_ready is unreliable on axon,
CLAUDE.md):

  finetune  make_store_finetune_step, batch 8 (cli/finetune.py
            --resident_data hot loop; reference FSC_finetune_cross.py)
  pretrain  make_store_pretrain_step, batch 16 (cli/pretrain.py hot
            loop; reference FSC_pretrain.py:254-299)

  python scripts/ab_train_fused.py [--batch_ft 8] [--batch_pt 16]
                                   [--iters 10] [--rounds 4]
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
    p.add_argument("--batch_ft", default=8, type=int)
    p.add_argument("--batch_pt", default=16, type=int)
    p.add_argument("--iters", default=10, type=int)
    p.add_argument("--rounds", default=4, type=int)
    p.add_argument("--data_dir", default="/tmp/bench_fsc_e2e", type=str)
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.config import (
        COUNTR_PRESETS, MAE_PRESETS, TrainConfig,
    )
    from countr_tpu.data.fsc147 import FSC147Meta, PretrainDataset, TrainDataset
    from countr_tpu.engine.train import (
        init_train_state, make_optimizer, make_store_finetune_step,
        make_store_pretrain_step,
    )
    from countr_tpu.engine.train_store import build_pretrain_store, build_store
    from countr_tpu.models.countr import CounTR
    from countr_tpu.models.mae import MaskedAutoencoderViT
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    iters = args.iters
    print(f"device={jax.devices()[0]} iters={iters} rounds={args.rounds}",
          flush=True)

    if not os.path.exists(os.path.join(args.data_dir,
                                       "annotation_FSC147_384.json")):
        from bench_finetune_e2e import make_dataset

        print("generating dataset...", flush=True)
        make_dataset(args.data_dir, 64, np.random.default_rng(0))
    meta = FSC147Meta.load(args.data_dir)

    # ---- timing scaffolding (profile_train.py methodology) ---------------
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

    VARIANTS = (
        ("fused", dict(use_pallas_attention=True, fused_attn_block=True)),
        ("pallas", dict(use_pallas_attention=True, fused_attn_block=False)),
        ("xla", dict(use_pallas_attention=False)),
    )

    # ---- finetune resident step ------------------------------------------
    b = args.batch_ft
    tcfg = TrainConfig(batch_size=b, epochs=100, warmup_epochs=1)
    store = build_store(meta, meta.splits["train"], log=lambda *a: None)
    sa = store.arrays
    ds = TrainDataset(meta, do_aug=True, seed=0, store_index=store.index)
    # the resident step consumes only the geometry-parameter keys
    # (cli/finetune.py resident batch_keys) — samples also carry
    # non-numeric bookkeeping ("name") that must not be device_put
    keys_ft = (
        "img_idx", "affine_C", "affine_d", "is_mosaic", "cell_idx",
        "cell_top", "cell_left", "cell_len", "blend_l", "dots", "n_dots",
    )
    samples = [ds[i % len(ds)] for i in range(b)]
    batch_ft = {
        k: jax.device_put(np.stack([s[k] for s in samples])) for k in keys_ft
    }

    ft_runs = {}
    for name, over in VARIANTS:
        cfg = dataclasses.replace(
            COUNTR_PRESETS["mae_vit_base6_patch16"], dtype=jnp.bfloat16,
            approx_gelu=True, subpixel_head=True, **over,
        )
        model = CounTR(cfg)
        if not ft_runs:
            params = jax.jit(model.init, static_argnums=(3,))(
                jax.random.key(0), jnp.zeros((1, 384, 384, 3)),
                jnp.zeros((1, 3, 64, 64, 3)), 3,
            )
            tx, _ = make_optimizer(
                tcfg, 100, b, freeze_encoder=cfg.freeze_encoder
            )
            state_ft = init_train_state(params["params"], tx)
        step_fn = make_store_finetune_step(model, tcfg)

        def chain(state, sa, batch, _step=step_fn):
            def body(st, i):
                bb = dict(batch)
                bb["img_idx"] = batch["img_idx"] + jnp.int32(
                    jnp.float32(st.step) * 0
                )
                st, m = _step(
                    st, sa, bb, jax.random.fold_in(jax.random.key(3), i), 3
                )
                return st, m["loss"]

            _, losses = lax.scan(body, state, jnp.arange(iters))
            return losses[-1][None]

        ft_runs[name] = jax.jit(chain)

    # ---- pretrain resident step -------------------------------------------
    bp = args.batch_pt
    tcfg_pt = TrainConfig(batch_size=bp, epochs=100, warmup_epochs=1)
    pstore = build_pretrain_store(meta, meta.splits["train"],
                                  log=lambda *a: None)
    psa = pstore.arrays
    max_w = pstore.max_w
    pds = PretrainDataset(meta, seed=0, store=pstore)
    keys_pt = ("img_idx", "crop_top", "crop_left", "crop_h", "crop_w",
               "transposed", "flip")
    psamples = [pds[i % len(pds)] for i in range(bp)]
    batch_pt = {
        k: jax.device_put(np.stack([s[k] for s in psamples])) for k in keys_pt
    }

    pt_runs = {}
    for name, over in VARIANTS:
        cfg = dataclasses.replace(
            MAE_PRESETS["mae_vit_base_patch16"], dtype=jnp.bfloat16,
            approx_gelu=True, **over,
        )
        model = MaskedAutoencoderViT(cfg)
        if not pt_runs:
            params = jax.jit(model.init)(
                jax.random.key(0), jnp.zeros((1, 384, 384, 3)),
                jax.random.key(1),
            )
            tx, _ = make_optimizer(tcfg_pt, 100, bp)
            state_pt = init_train_state(params["params"], tx)
        step_fn = make_store_pretrain_step(model, max_w)

        def chain(state, sa, batch, _step=step_fn):
            def body(st, i):
                bb = dict(batch)
                bb["img_idx"] = batch["img_idx"] + jnp.int32(
                    jnp.float32(st.step) * 0
                )
                st, m = _step(
                    st, sa, bb, jax.random.fold_in(jax.random.key(5), i)
                )
                return st, m["loss"]

            _, losses = lax.scan(body, state, jnp.arange(iters))
            return losses[-1][None]

        pt_runs[name] = jax.jit(chain)

    # ---- compile/warmup every variant, then interleave timed rounds -------
    jobs = [(f"finetune b{b} {n}", fn, (state_ft, sa, batch_ft))
            for n, fn in ft_runs.items()]
    jobs += [(f"pretrain b{bp} {n}", fn, (state_pt, psa, batch_pt))
             for n, fn in pt_runs.items()]

    for name, fn, a in jobs:
        t0 = time.perf_counter()
        float(np.asarray(fn(*a)).ravel()[0])
        print(f"  warm {name:<24s} {time.perf_counter() - t0:6.1f}s",
              flush=True)

    best = {name: 1e9 for name, _, _ in jobs}
    for r in range(args.rounds):
        for name, fn, a in jobs:
            fl = floor_once()
            t0 = time.perf_counter()
            float(np.asarray(fn(*a)).ravel()[0])
            dt = max(time.perf_counter() - t0 - fl, 0.0) / iters
            best[name] = min(best[name], dt)
        print(f"round {r}: " + "  ".join(
            f"{n.split()[-1]}={best[n] * 1e3:.1f}" for n, _, _ in jobs),
            flush=True)

    print("\nbest ms/step (floor-subtracted):", flush=True)
    for name, _, _ in jobs:
        bsz = b if name.startswith("finetune") else bp
        print(f"  {name:<24s} {best[name] * 1e3:8.2f} ms  "
              f"({bsz / best[name]:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()

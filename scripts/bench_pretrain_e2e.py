"""End-to-end MAE pretrain throughput: host pipeline -> device step,
with/without the resident store (see bench_finetune_e2e.py).

  python scripts/bench_pretrain_e2e.py [--resident] [--batch 16]
"""

import argparse
import json
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))

import numpy as np

from bench_finetune_e2e import make_dataset  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--resident", action="store_true")
    p.add_argument("--batch", default=16, type=int)
    p.add_argument("--epochs", default=3, type=int)
    p.add_argument("--n_images", default=64, type=int)
    p.add_argument("--num_workers", default=8, type=int)
    p.add_argument("--data_dir", default="/tmp/bench_fsc_e2e", type=str)
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from countr_tpu.config import MAE_PRESETS, TrainConfig
    from countr_tpu.data.fsc147 import FSC147Meta, PretrainDataset
    from countr_tpu.data.loader import DataLoader, device_prefetch
    from countr_tpu.engine.train import (
        init_train_state, make_optimizer, make_pretrain_step,
        make_store_pretrain_step,
    )
    from countr_tpu.models.mae import MaskedAutoencoderViT
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    if not os.path.exists(os.path.join(args.data_dir, "annotation_FSC147_384.json")):
        make_dataset(args.data_dir, args.n_images, rng)
    meta = FSC147Meta.load(args.data_dir)

    cfg = dataclasses.replace(
        MAE_PRESETS["mae_vit_base_patch16"], dtype=jnp.bfloat16,
        use_pallas_attention=True, fused_attn_block=False,
    )
    model = MaskedAutoencoderViT(cfg)
    b = args.batch
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 384, 384, 3)), jax.random.key(1)
    )
    tcfg = TrainConfig(batch_size=b, epochs=100, warmup_epochs=1)
    tx, _ = make_optimizer(tcfg, 100, b)
    state = init_train_state(params["params"], tx)

    if args.resident:
        from countr_tpu.engine.train_store import build_pretrain_store

        store = build_pretrain_store(meta, meta.splits["train"])
        _step = make_store_pretrain_step(model, store.max_w)
        sa = store.arrays
        keys = ("img_idx", "crop_top", "crop_left", "crop_h", "crop_w",
                "transposed", "flip")

        def step(s, batch, rng):
            return _step(s, sa, batch, rng)

        ds = PretrainDataset(meta, seed=0, store=store)

        def put(batch):
            return {k: jax.device_put(batch[k]) for k in keys}
    else:
        step = make_pretrain_step(model)
        ds = PretrainDataset(meta, seed=0)

        def put(batch):
            return jax.device_put(batch["image"])

    dl = DataLoader(ds, b, shuffle=True, num_workers=args.num_workers,
                    drop_last=True, seed=0)
    mode = "resident" if args.resident else "host"
    print(f"[{mode}] compiling + epoch 0...", flush=True)
    times = []
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        n = 0
        m = None
        for batch in device_prefetch(dl.epoch(epoch), put=put):
            state, m = step(
                state, batch, jax.random.fold_in(jax.random.key(1), epoch * 1000 + n)
            )
            n += 1
        loss = float(m["loss"])
        dt = time.perf_counter() - t0
        times.append(dt / n)
        print(f"[{mode}] epoch {epoch}: {dt / n * 1e3:.1f} ms/step "
              f"({n} steps, loss {loss:.4f})", flush=True)

    warm = min(times[1:]) if len(times) > 1 else times[0]
    print(json.dumps({
        "mode": mode,
        "warm_ms_per_step_e2e": round(warm * 1e3, 1),
        "images_per_sec_e2e": round(b / warm, 1),
        "batch": b,
    }))


if __name__ == "__main__":
    main()

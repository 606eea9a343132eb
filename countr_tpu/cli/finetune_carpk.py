"""CARPK fine-tuning (1-shot car counting).

Mirrors the reference CARPK fine-tune entry point (reference:
FSC_finetune_CARPK.py): hub-streamed (or local) CARPK, one random
exemplar per sample, unmasked MSE, shot_num=1; the as-committed stale
import and timm pin (SURVEY.md C10) are not reproduced.

Usage:
  python -m countr_tpu.cli.finetune_carpk --carpk_root /data/CARPK \
      --resume fsc147_weights.pth --epochs 30
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from countr_tpu.cli import common
from countr_tpu.config import TrainConfig
from countr_tpu.utils.metrics import JsonlLogger


def get_args():
    p = argparse.ArgumentParser("CARPK fine-tuning")
    common.add_model_args(p, default_model="mae_vit_base6_patch16")
    p.add_argument("--carpk_root", default="", type=str,
                   help="local CARPK dir; empty = hub stream")
    p.add_argument("--output_dir", default="./out_carpk", type=str)
    p.add_argument("--batch_size", default=1, type=int)
    p.add_argument("--epochs", default=30, type=int)
    p.add_argument("--warmup_epochs", default=2, type=int)
    p.add_argument("--blr", default=2e-4, type=float)
    p.add_argument("--lr", default=None, type=float)
    p.add_argument("--weight_decay", default=0.05, type=float)
    p.add_argument("--accum_iter", default=1, type=int)
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--limit_steps", default=0, type=int)
    p.add_argument("--n_devices", default=1, type=int)
    p.add_argument("--resident_data", action="store_true",
                   help="keep the decoded train split in HBM and run the "
                        "resize/crop/density/exemplar prep on device "
                        "(engine.carpk_store); host ships ~1.5 KB/sample "
                        "of geometry instead of ~2.3 MB of pixels")
    return p.parse_args()


class _TrainAdapter:
    """CARPK source + reference train transform as a loader dataset."""

    def __init__(self, source, seed: int):
        self.source = source
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.source)

    def __getitem__(self, idx: int):
        from countr_tpu.data.carpk import carpk_train_sample

        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, self.epoch, idx])
        )
        return carpk_train_sample(rng, self.source[idx])


def main(args):
    from countr_tpu.data.carpk import load_carpk
    from countr_tpu.data.loader import DataLoader, device_prefetch
    from countr_tpu.engine import checkpoint as ckpt
    from countr_tpu.engine.train import (
        init_train_state, make_finetune_step, make_optimizer,
    )
    from countr_tpu.parallel.mesh import batch_sharding, get_mesh, replicated_sharding

    model, params = common.build_counting_model(args, training=True)
    outdir = common.ensure_outdir(args)
    jsonl = JsonlLogger(outdir)

    src = load_carpk("train", args.carpk_root)
    resident = getattr(args, "resident_data", False)
    mesh = get_mesh(args.n_devices or None)
    bsh, rsh = batch_sharding(mesh), replicated_sharding(mesh)
    store = None
    if resident:
        from countr_tpu.engine.carpk_store import build_carpk_store

        store = build_carpk_store(src, mesh=mesh)
        steps_per_epoch = len(src) // args.batch_size
        dl = None
    else:
        ds = _TrainAdapter(src, args.seed)
        dl = DataLoader(
            ds, args.batch_size, shuffle=True, num_workers=args.num_workers,
            drop_last=True, seed=args.seed,
        )
        steps_per_epoch = len(dl)
    steps_per_epoch = min(steps_per_epoch, args.limit_steps or steps_per_epoch)
    steps_per_epoch = max(steps_per_epoch, 1)

    # Unmasked MSE: the reference's pixel mask is commented out for
    # CARPK (reference: FSC_finetune_CARPK.py:250-252) — loss_mask_p=1.
    tcfg = TrainConfig(
        batch_size=args.batch_size, epochs=args.epochs,
        warmup_epochs=args.warmup_epochs, blr=args.blr, lr=args.lr,
        weight_decay=args.weight_decay, accum_iter=args.accum_iter,
        seed=args.seed, loss_mask_p=1.0,
    )
    tx, sched = make_optimizer(
        tcfg, steps_per_epoch,
        args.batch_size * args.accum_iter,  # eff batch for blr scaling
        freeze_encoder=model.cfg.freeze_encoder,
    )
    state = init_train_state(params["params"], tx)
    state = jax.tree.map(lambda x: jax.device_put(x, rsh), state)
    if resident:
        from countr_tpu.engine.carpk_store import exemplar_geometry
        from countr_tpu.engine.train import make_carpk_store_step

        _store_step = make_carpk_store_step(model, tcfg)
        store_arrays = store.arrays
        def resident_batches(epoch):
            # per-EPOCH seeded streams: a resumed run at epoch N draws
            # exactly what an uninterrupted run draws at epoch N
            host_rng = np.random.default_rng(
                np.random.SeedSequence([args.seed, epoch, 1])
            )
            order = np.random.default_rng(
                np.random.SeedSequence([args.seed, epoch])
            ).permutation(store.n_images)
            for base in range(0, store.n_images - args.batch_size + 1,
                              args.batch_size):
                idxs = order[base : base + args.batch_size]
                geo = exemplar_geometry(host_rng, store, idxs)
                geo["img_idx"] = idxs.astype(np.int32)
                yield {k: jax.device_put(v, bsh) for k, v in geo.items()}
    else:
        step = make_finetune_step(model, tcfg)

        def put(b):
            return {
                k: jax.device_put(b[k], bsh)
                for k in ("image", "gt_density", "boxes")
            }

    for epoch in range(args.epochs):
        t0 = time.time()
        step_metrics, n = [], 0
        it = (
            resident_batches(epoch)
            if resident
            else device_prefetch(dl.epoch(epoch), put=put)
        )
        for batch in it:
            if args.limit_steps and n >= args.limit_steps:
                break
            rng = jax.random.fold_in(jax.random.key(args.seed), epoch * 100000 + n)
            if resident:
                state, m = _store_step(state, store_arrays, batch, rng)
            else:
                state, m = step(state, batch, rng, 1)  # shot_num=1
            step_metrics.append(m)
            n += 1
            if n % 32 == 0:
                if not np.isfinite(float(m["loss"])):
                    raise SystemExit(f"Loss is not finite at epoch {epoch}")
        host_metrics = jax.device_get(step_metrics)
        loss_sum = sum(float(m["loss"]) for m in host_metrics)
        mae_sum = sum(float(m["mae"]) for m in host_metrics)
        stats = {
            "epoch": epoch,
            "train/loss": loss_sum / max(n, 1),
            "train/MAE": mae_sum / max(n, 1),
            "epoch_time_s": time.time() - t0,
        }
        print(f"[CARPK e{epoch}] loss {stats['train/loss']:.4f} "
              f"MAE {stats['train/MAE']:.2f}", flush=True)
        jsonl.write(stats)
        if outdir:
            ckpt.save_checkpoint(
                os.path.join(outdir, "ckpt_last"), epoch,
                jax.device_get(state), keep=1,
            )


def _entry():
    main(get_args())


if __name__ == "__main__":
    _entry()

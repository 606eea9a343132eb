"""MAE self-supervised pre-training on FSC147 images.

Mirrors the reference pretrain entry point (reference: FSC_pretrain.py):
mask ratio 0.5, AdamW(0.9, 0.95) with blr * batch/256 scaling,
warmup-cosine schedule, periodic checkpoints, reconstruction
visualization — as one jitted data-parallel step. Optionally
initializes from a torch MAE checkpoint (the reference resumes from
released ImageNet MAE weights, reference: FSC_pretrain.py:80-81).

Usage:
  python -m countr_tpu.cli.pretrain --data_path ./data/FSC147 \
      --epochs 500 --batch_size 16 --blr 1.5e-4
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from countr_tpu.cli import common
from countr_tpu.config import MAE_PRESETS, TrainConfig
from countr_tpu.utils.metrics import JsonlLogger, TBWriter


def get_args():
    p = argparse.ArgumentParser("MAE pre-training")
    common.add_data_args(p)
    common.add_model_args(p, default_model="mae_vit_base_patch16")
    p.add_argument("--mask_ratio", default=0.5, type=float)
    p.add_argument("--norm_pix_loss", action="store_true")
    p.add_argument("--masked_loss", action="store_true",
                   help="average loss over masked patches only (standard "
                        "MAE) instead of the reference's all-patch mean")
    p.add_argument("--batch_size", default=16, type=int)
    p.add_argument("--epochs", default=500, type=int)
    p.add_argument("--warmup_epochs", default=10, type=int)
    p.add_argument("--blr", default=1.5e-4, type=float)
    p.add_argument("--lr", default=None, type=float)
    p.add_argument("--min_lr", default=0.0, type=float)
    p.add_argument("--weight_decay", default=0.05, type=float)
    p.add_argument("--accum_iter", default=1, type=int)
    p.add_argument("--num_workers", default=8, type=int)
    p.add_argument("--resident_data", action="store_true",
                   help="upload the decoded train split to HBM once "
                        "(replicated over the device mesh); the "
                        "RandomResizedCrop+flip runs on device from "
                        "crop scalars (~30 B/sample H2D; see "
                        "countr_tpu.engine.train_store)")
    p.add_argument("--use_processes", action="store_true",
                   help="process-pool data workers (GIL-free aug "
                        "on many-core hosts)")
    p.add_argument("--ckpt_every", default=100, type=int)
    p.add_argument("--ckpt_last_every", default=1, type=int,
                   help="epochs between crash-resume 'last' checkpoints "
                        "(a full-size MAE TrainState fetch is ~1.5 GB; "
                        "raise on slow links)")
    p.add_argument("--do_resume", action="store_true")
    p.add_argument("--log_every", default=50, type=int,
                   help="steps between train loss/lr scalar logs "
                        "(0 = per-epoch only; reference cadence: "
                        "FSC_finetune_cross.py:320-326)")
    p.add_argument("--recon_every", default=2000, type=int,
                   help="reconstruction image logging cadence in steps "
                        "(reference: FSC_pretrain.py:267-291)")
    p.add_argument("--limit_steps", default=0, type=int)
    p.add_argument("--n_devices", default=0, type=int,
                   help="use only the first N devices (0 = all)")
    return p.parse_args()


def build_mae_model(args):
    import dataclasses

    import jax.numpy as jnp

    from countr_tpu.engine import checkpoint as ckpt
    from countr_tpu.models.mae import MaskedAutoencoderViT

    common.apply_runtime_flags(args)
    dtype = common.parse_dtype(args.dtype)
    cfg = dataclasses.replace(
        MAE_PRESETS[args.model],
        mask_ratio=args.mask_ratio,
        norm_pix_loss=args.norm_pix_loss,
        dtype=dtype,
        # The pretrain hot loop gets the bf16 fast mode (standalone
        # Pallas attention/LN kernels, tanh GELU). The fused half-block
        # is OFF here: it wins forward-only, but its custom VJP costs
        # +5.4 ms/step where the encoder trains (49.4 vs 44.0 ms at
        # batch 16 — scripts/ab_train_fused.py, docs/PROFILE.md).
        use_pallas_attention=dtype == jnp.bfloat16,
        fused_attn_block=False,
        approx_gelu=dtype == jnp.bfloat16
        and not getattr(args, "exact_gelu", False),
    )
    model = MaskedAutoencoderViT(cfg, masked_loss=args.masked_loss)
    params = jax.jit(model.init)(
        jax.random.key(args.seed),
        jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32),
        jax.random.key(1),
    )
    if args.resume and args.resume.endswith(".pth"):
        sd = ckpt.load_torch_checkpoint(args.resume)
        params = jax.tree.map(
            jnp.asarray,
            ckpt.convert_mae_state_dict(
                sd, depth=cfg.depth, decoder_depth=cfg.decoder_depth
            ),
        )
        print(f"initialized from torch MAE checkpoint {args.resume}")
    return model, params


def main(args):
    from countr_tpu.data.fsc147 import PretrainDataset
    from countr_tpu.data.loader import DataLoader, device_prefetch
    from countr_tpu.engine import checkpoint as ckpt
    from countr_tpu.engine.train import (
        init_train_state, make_optimizer, make_pretrain_step,
    )
    from countr_tpu.models.mae import unpatchify
    from countr_tpu.parallel.mesh import (
        batch_sharding, get_mesh, make_global_batch, replicated_sharding,
    )

    from countr_tpu.parallel.dist import init_distributed

    init_distributed()
    from countr_tpu.parallel.mesh import is_main_process

    # rank-0-only side effects (reference: util/misc.py:211-222)
    main_proc = is_main_process()
    meta = common.load_meta(args)
    model, params = build_mae_model(args)
    outdir = common.ensure_outdir(args) if main_proc else (args.output_dir or "")
    tb = TBWriter(os.path.join(outdir, "tb") if (outdir and main_proc) else None)
    jsonl = JsonlLogger(outdir if main_proc else None)
    wandb = common.make_wandb(args, enabled=main_proc)

    n_proc = jax.process_count()
    resident = getattr(args, "resident_data", False)

    mesh = get_mesh(args.n_devices or None)
    if args.batch_size % mesh.devices.size != 0:
        raise SystemExit(
            f"--batch_size must be divisible by {mesh.devices.size} devices"
        )
    bsh, rsh = batch_sharding(mesh), replicated_sharding(mesh)

    store = None
    if resident:
        from countr_tpu.engine.train_store import build_pretrain_store

        # pool replicated over the mesh (every process decodes its own
        # copy); per-step crop scalars shard on 'data'
        store = build_pretrain_store(meta, meta.splits["train"], mesh=mesh)
    ds = PretrainDataset(meta, seed=args.seed, store=store)
    # multi-host: global --batch_size, per-process slice loading (see
    # finetune.py / parallel.mesh.make_global_batch)
    dl = DataLoader(
        ds, args.batch_size, shuffle=True, num_workers=args.num_workers,
        drop_last=True, seed=args.seed,
        use_processes=getattr(args, "use_processes", False),
        process_index=jax.process_index(), process_count=n_proc,
    )
    steps_per_epoch = len(dl)
    if args.limit_steps:
        steps_per_epoch = min(steps_per_epoch, args.limit_steps)

    tcfg = TrainConfig(
        batch_size=args.batch_size, epochs=args.epochs,
        warmup_epochs=args.warmup_epochs, blr=args.blr, lr=args.lr,
        min_lr=args.min_lr, weight_decay=args.weight_decay,
        accum_iter=args.accum_iter, seed=args.seed,
    )
    tx, sched = make_optimizer(tcfg, steps_per_epoch,
        args.batch_size * args.accum_iter,  # eff batch for blr scaling
        )
    state = init_train_state(params["params"], tx)
    state = jax.tree.map(lambda x: jax.device_put(x, rsh), state)

    start_epoch = 0
    if args.do_resume and outdir:
        step = ckpt.latest_step(os.path.join(outdir, "ckpt_last"))
        if step is not None:
            state, step = ckpt.restore_checkpoint(os.path.join(outdir, "ckpt_last"), state)
            start_epoch = step + 1
            print(f"resumed epoch {start_epoch}")

    if resident:
        from countr_tpu.engine.train import make_store_pretrain_step

        _store_step = make_store_pretrain_step(model, store.max_w)
        store_arrays = store.arrays
        _STORE_KEYS = ("img_idx", "crop_top", "crop_left", "crop_h",
                       "crop_w", "transposed", "flip")

        def step_fn(state, batch, rng):
            return _store_step(state, store_arrays, batch, rng)
    else:
        step_fn = make_pretrain_step(model)
    global_step = start_epoch * steps_per_epoch

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        loss_total = None  # O(1)-memory device-side running sum
        n_steps = 0
        for batch in device_prefetch(
            dl.epoch(epoch),
            put=lambda b: (
                (
                    make_global_batch(mesh, {k: b[k] for k in _STORE_KEYS})
                    if n_proc > 1
                    else {k: jax.device_put(b[k], bsh) for k in _STORE_KEYS}
                )
                if resident
                else make_global_batch(mesh, b["image"]) if n_proc > 1
                else jax.device_put(b["image"], bsh)
            ),
        ):
            if args.limit_steps and n_steps >= args.limit_steps:
                break
            rng = jax.random.fold_in(jax.random.key(args.seed), global_step)
            state, m = step_fn(state, batch, rng)
            loss_total = m["loss"] if loss_total is None else loss_total + m["loss"]
            n_steps += 1
            global_step += 1
            if n_steps % 32 == 0:
                # the RUNNING sum catches a NaN from any step in the
                # window, not just the sampled one
                if not np.isfinite(float(loss_total)):
                    raise SystemExit(f"Loss is not finite at epoch {epoch}")
            log_every = getattr(args, "log_every", 50)
            if log_every and global_step % log_every == 0 and main_proc:
                # per-N-step loss/lr scalars (reference cadence:
                # FSC_finetune_cross.py:320-326)
                rec = {"train/loss_step": float(m["loss"]),
                       "train/lr_step": float(sched(global_step))}
                wandb.log(rec, step=global_step)
                for k, v in rec.items():
                    tb.scalar(k, v, global_step)
            if (args.recon_every and global_step % args.recon_every == 0
                    and n_proc == 1):
                # single-process only: the eager reconstruction forward
                # can't mix host-local slices with global arrays
                if resident:
                    from countr_tpu.engine.train_store import (
                        materialize_pretrain_batch,
                    )

                    recon_imgs = jax.jit(
                        materialize_pretrain_batch, static_argnums=(2,)
                    )(store_arrays, batch, store.max_w)
                else:
                    recon_imgs = batch
                _log_reconstruction(tb, model, state, recon_imgs, rng, global_step)
        loss_sum = float(jax.device_get(loss_total)) if loss_total is not None else 0.0
        if not np.isfinite(loss_sum):
            raise SystemExit(f"Loss is not finite at epoch {epoch}")

        stats = {
            "epoch": epoch,
            "train/loss": loss_sum / max(n_steps, 1),
            "lr": float(sched(epoch * steps_per_epoch)),
            "epoch_time_s": time.time() - t0,
        }
        if main_proc:
            print(
                f"[Epoch {epoch}] loss {stats['train/loss']:.4f} "
                f"lr {stats['lr']:.2e} ({stats['epoch_time_s']:.1f}s)",
                flush=True,
            )
        jsonl.write(stats)
        tb.scalar("train/loss", stats["train/loss"], epoch)
        # share the global-step axis with the per-N-step scalars
        wandb.log(stats, step=(epoch + 1) * steps_per_epoch)

        # orbax saves are COLLECTIVE: every process calls them (orbax
        # writes from the primary host; output_dir must be a shared FS
        # on multi-host pods)
        if outdir and (
            (args.ckpt_every and (epoch + 1) % args.ckpt_every == 0)
            or epoch + 1 == args.epochs
        ):
            ckpt.save_checkpoint(
                os.path.join(outdir, "ckpt_periodic"), epoch,
                jax.device_get(state), keep=5,
            )
            # reference uploads every saved checkpoint as a W&B
            # artifact (util/misc.py:331-335); host-only, rank 0
            if main_proc:
                wandb.log_artifact(
                    os.path.join(outdir, "ckpt_periodic"), "pretrain_periodic"
                )
        last_every = max(1, getattr(args, "ckpt_last_every", 1))
        if outdir and (epoch % last_every == 0 or epoch + 1 == args.epochs):
            ckpt.save_checkpoint(
                os.path.join(outdir, "ckpt_last"), epoch,
                jax.device_get(state), keep=1,
            )
            # params-only checkpoint for encoder transfer into the
            # counting model (finetune --init_from_mae)
            ckpt.save_checkpoint(
                os.path.join(outdir, "ckpt_params"), epoch,
                {"params": jax.device_get(state.params)}, keep=1,
            )
            if main_proc:
                wandb.log_artifact(
                    os.path.join(outdir, "ckpt_params"), "pretrain_params"
                )
    tb.flush()


def _log_reconstruction(tb, model, state, images, rng, step):
    """Masked-input / reconstruction / original triptych to TB
    (reference: FSC_pretrain.py:267-291)."""
    import jax.numpy as jnp

    from countr_tpu.models.mae import patchify, unpatchify

    imgs = images[:1]
    loss, pred, mask = model.apply({"params": state.params}, imgs, rng)
    p = model.cfg.patch_size
    recon = unpatchify(pred.astype(jnp.float32), p)
    masked = patchify(imgs, p) * (1 - mask)[..., None]
    masked = unpatchify(masked, p)
    panel = np.concatenate(
        [np.asarray(masked[0]), np.asarray(recon[0]), np.asarray(imgs[0])], axis=1
    )
    tb.image("pretrain/reconstruction", np.clip(panel, 0, 1), step)


def _entry():
    main(get_args())


if __name__ == "__main__":
    _entry()

"""FSC147 supervised fine-tuning of the counting decoder.

Mirrors the reference fine-tune entry point's capabilities
(reference: FSC_finetune_cross.py): encoder frozen (stop_gradient),
masked-MSE loss, per-batch shot-number sampling with the m_flag rule,
per-epoch validation with MAE/RMSE/NAE, periodic/last/min-MAE
checkpoints — re-engineered as one jitted data-parallel step over the
device mesh with a prefetching host pipeline.

Usage:
  python -m countr_tpu.cli.finetune --data_path ./data/FSC147 \
      --model mae_vit_base6_patch16 --epochs 1000 --batch_size 8 --blr 2e-4
"""

from __future__ import annotations

import argparse
import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from countr_tpu.cli import common
from countr_tpu.config import TrainConfig
from countr_tpu.utils.metrics import JsonlLogger, TBWriter


def get_args():
    p = argparse.ArgumentParser("FSC147 fine-tuning")
    common.add_data_args(p)
    common.add_model_args(p, default_model="mae_vit_base6_patch16")
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--epochs", default=1000, type=int)
    p.add_argument("--warmup_epochs", default=10, type=int)
    p.add_argument("--blr", default=2e-4, type=float,
                   help="base lr; lr = blr * batch / 256")
    p.add_argument("--lr", default=None, type=float)
    p.add_argument("--min_lr", default=0.0, type=float)
    p.add_argument("--weight_decay", default=0.05, type=float)
    p.add_argument("--accum_iter", default=1, type=int)
    p.add_argument("--no_aug", action="store_true",
                   help="disable train-time augmentation")
    p.add_argument("--device_aug", action="store_true",
                   help="run the photometric augmentation + density "
                        "synthesis on device inside the train step "
                        "(uint8 geometry on the host; 4x less H2D; "
                        "distribution-level parity — see "
                        "countr_tpu.ops.augment)")
    p.add_argument("--resident_data", action="store_true",
                   help="upload the decoded train split to HBM once "
                        "(replicated over the device mesh) and "
                        "materialize every augmented batch on device "
                        "from per-sample geometry scalars (~KBs/step "
                        "H2D; see countr_tpu.engine.train_store)")
    p.add_argument("--resident_pipeline", action="store_true",
                   help="EXPERIMENTAL: software-pipeline the resident "
                        "mode as two dispatches per step (materialize "
                        "k+1, train k). Trajectory-exact vs the serial "
                        "step, but measured 1.5-2.4x SLOWER on the "
                        "axon v5e: the materialize program's fresh "
                        "14 MB outputs pay ~4.6 ms/MB per-dispatch "
                        "staging, swamping the real overlap "
                        "(scripts/{ab_overlap,probe_2disp_parts}.py, "
                        "docs/PROFILE.md). Kept for backends without "
                        "the fresh-output staging cost")
    p.add_argument("--num_workers", default=8, type=int)
    p.add_argument("--use_processes", action="store_true",
                   help="process-pool data workers (GIL-free aug "
                        "on many-core hosts)")
    p.add_argument("--ckpt_every", default=50, type=int)
    p.add_argument("--ckpt_last_every", default=1, type=int,
                   help="epochs between crash-resume 'last' checkpoints "
                        "(reference saves every epoch; raise on slow "
                        "links — fetching a full-size TrainState is "
                        "~1 GB)")
    p.add_argument("--do_resume", action="store_true",
                   help="resume full training state from output_dir")
    p.add_argument("--init_from_mae", default="", type=str,
                   help="MAE pretrain checkpoint (.pth or an orbax "
                        "ckpt_params dir) to initialize the encoder from")
    p.add_argument("--init_from_mae_model", default="mae_vit_base_patch16",
                   type=str, help="MAE preset of the orbax checkpoint")
    p.add_argument("--limit_steps", default=0, type=int,
                   help="cap steps/epoch (smoke tests)")
    p.add_argument("--n_devices", default=0, type=int,
                   help="use only the first N devices (0 = all)")
    p.add_argument("--panel_every", default=10, type=int,
                   help="epochs between val density-panel images in "
                        "TB/W&B (0 = off; reference: "
                        "FSC_finetune_cross.py:352-405)")
    p.add_argument("--log_every", default=50, type=int,
                   help="steps between train loss/lr scalar logs "
                        "(0 = per-epoch only; reference logs to W&B "
                        "every 50 steps, FSC_finetune_cross.py:320-326)")
    return p.parse_args()


def sample_shot_num(rng: random.Random, m_flags: np.ndarray) -> int:
    """0-3 shots, but Type-2 mosaic in the batch bans 0-shot
    (reference: FSC_finetune_cross.py:277-284). The m_flag test spans
    the GLOBAL batch (allgathered on multi-host) so every process draws
    the same static shot_num from its identically-seeded rng."""
    from countr_tpu.parallel.mesh import global_any

    lo = 1 if global_any(m_flags) else 0
    return rng.randint(lo, 3)


def main(args):
    from countr_tpu.data.fsc147 import TrainDataset, ValDataset
    from countr_tpu.data.loader import DataLoader, device_prefetch
    from countr_tpu.engine import checkpoint as ckpt
    from countr_tpu.engine.train import (
        init_train_state, make_eval_step, make_finetune_step, make_optimizer,
        transfer_encoder,
    )
    from countr_tpu.parallel.mesh import (
        batch_sharding, get_mesh, make_global_batch, replicated_sharding,
    )

    from countr_tpu.parallel.dist import init_distributed

    init_distributed()
    from countr_tpu.parallel.mesh import is_main_process

    # rank-0-only side effects (checkpoints / TB / JSONL / W&B), like
    # the reference's is_main_process gating (util/misc.py:211-222,
    # :304-335)
    main_proc = is_main_process()
    meta = common.load_meta(args)
    model, params = common.build_counting_model(args, training=True)
    outdir = common.ensure_outdir(args) if main_proc else (args.output_dir or "")
    tb = TBWriter(os.path.join(outdir, "tb") if (outdir and main_proc) else None)
    jsonl = JsonlLogger(outdir if main_proc else None)
    wandb = common.make_wandb(args, enabled=main_proc)

    if args.init_from_mae:
        if args.init_from_mae.endswith(".pth"):
            sd = ckpt.load_torch_checkpoint(args.init_from_mae)
            mae_params = ckpt.convert_mae_state_dict(sd, depth=model.cfg.depth)
        else:
            # orbax params-only checkpoint written by cli.pretrain
            import dataclasses as _dc

            from countr_tpu.config import MAE_PRESETS
            from countr_tpu.models.mae import MaskedAutoencoderViT

            mae_cfg = _dc.replace(
                MAE_PRESETS[args.init_from_mae_model],
                dtype=common.parse_dtype(args.dtype),
            )
            mae_model = MaskedAutoencoderViT(mae_cfg)
            template = jax.eval_shape(
                lambda: mae_model.init(
                    jax.random.key(0),
                    jnp.zeros((1, mae_cfg.img_size, mae_cfg.img_size, 3)),
                    jax.random.key(1),
                )
            )
            host_template = jax.tree.map(
                lambda s: np.zeros(s.shape, s.dtype), template
            )
            mae_params, _ = ckpt.restore_checkpoint(
                args.init_from_mae, host_template
            )
        params = transfer_encoder(mae_params, params, depth=model.cfg.depth)
        print(f"initialized encoder from {args.init_from_mae}")

    n_proc, proc_id = jax.process_count(), jax.process_index()
    device_aug = getattr(args, "device_aug", False) and not args.no_aug
    resident = getattr(args, "resident_data", False) and not args.no_aug

    mesh = get_mesh(args.n_devices or None)
    n_dev = mesh.devices.size
    if args.batch_size % n_dev != 0:
        raise SystemExit(
            f"--batch_size {args.batch_size} must be divisible by the "
            f"{n_dev}-device mesh"
        )
    bsh, rsh = batch_sharding(mesh), replicated_sharding(mesh)

    store = None
    if resident:
        from countr_tpu.engine.train_store import build_store

        # pool replicated over the mesh (every process decodes its own
        # copy, like a DDP rank); per-step geometry shards on 'data'
        store = build_store(meta, meta.splits["train"], mesh=mesh)
    train_ds = TrainDataset(
        meta, do_aug=not args.no_aug, seed=args.seed, device_aug=device_aug,
        store_index=store.index if store else None,
    )
    val_ds = ValDataset(meta)
    # multi-host: --batch_size stays the GLOBAL batch; each process
    # loads only its slice and make_global_batch stitches the shards
    # (the reference's DistributedSampler+DDP split, without the
    # gradient backend)
    train_dl = DataLoader(
        train_ds, args.batch_size, shuffle=True, num_workers=args.num_workers,
        drop_last=True, seed=args.seed,
        use_processes=getattr(args, "use_processes", False),
        process_index=proc_id, process_count=n_proc,
    )
    val_dl = DataLoader(
        val_ds, args.batch_size, num_workers=args.num_workers,
        process_index=proc_id, process_count=n_proc,
    )

    steps_per_epoch = len(train_dl)
    if args.limit_steps:
        steps_per_epoch = min(steps_per_epoch, args.limit_steps)

    tcfg = TrainConfig(
        batch_size=args.batch_size, epochs=args.epochs,
        warmup_epochs=args.warmup_epochs, blr=args.blr, lr=args.lr,
        min_lr=args.min_lr, weight_decay=args.weight_decay,
        accum_iter=args.accum_iter, seed=args.seed, output_dir=args.output_dir,
    )
    tx, sched = make_optimizer(
        tcfg, steps_per_epoch,
        args.batch_size * args.accum_iter,  # eff batch for blr scaling
        freeze_encoder=model.cfg.freeze_encoder,
    )
    state = init_train_state(params["params"], tx)
    state = jax.tree.map(lambda x: jax.device_put(x, rsh), state)

    start_epoch = 0
    if args.do_resume and outdir:
        last_dir = os.path.join(outdir, "ckpt_last")
        step = ckpt.latest_step(last_dir)
        if step is not None:
            state, step = ckpt.restore_checkpoint(last_dir, state)
            start_epoch = step + 1
            print(f"resumed epoch {start_epoch} from {last_dir}")

    val_store = None
    pipelined = resident and getattr(args, "resident_pipeline", False)
    _prime = _train_phase = None
    if resident:
        from countr_tpu.engine.train import (
            make_store_eval_step, make_store_finetune_step,
            make_store_materialize,
            make_store_train_phase,
        )
        from countr_tpu.engine.train_store import build_val_store

        _store_step = make_store_finetune_step(model, tcfg)
        store_arrays = store.arrays
        if pipelined:
            # two-dispatch pipeline: materialize program + train
            # program per step. Measured SLOWER than serial on axon
            # (the mat program's fresh 14 MB outputs pay ~4.6 ms/MB
            # per-dispatch staging, 112 vs 36 ms/iter —
            # scripts/probe_2disp_parts.py); the fused single-program
            # variant measured neutral. Opt-in only.
            _prime = make_store_materialize()
            _train_phase = make_store_train_phase(model, tcfg)

        def train_step(state, batch, rng, shot_num):
            # n_mosaic stays None (every slot pays the mosaic path):
            # in-step mosaic marginal cost measured ~0.3 ms/slot
            # (scripts/profile_train.py, K=2 bucket saved 1.4 ms of a
            # 73.5 ms step) — not worth 4 compiled step variants at
            # 10-20 min first-compile each on this backend
            return _store_step(state, store_arrays, batch, rng, shot_num)

        # validation is resident too: the fixed 384^2 val samples would
        # otherwise re-upload every epoch
        val_store = build_val_store(val_ds, mesh=mesh)
        store_eval = make_store_eval_step(model)
    else:
        train_step = make_finetune_step(model, tcfg, device_aug=device_aug)
    eval_step = make_eval_step(model)
    min_mae = float("inf")

    if resident:
        batch_keys = (
            "img_idx", "affine_C", "affine_d", "is_mosaic", "cell_idx",
            "cell_top", "cell_left", "cell_len", "blend_l", "dots", "n_dots",
        )
    elif device_aug:
        batch_keys = ("image_u8", "dots", "n_dots", "apply_photo", "boxes")
    else:
        batch_keys = ("image", "gt_density", "boxes")

    def put(batch):
        arrays = {k: batch[k] for k in batch_keys}
        if n_proc > 1:
            dev = make_global_batch(mesh, arrays)
        else:
            dev = {k: jax.device_put(v, bsh) for k, v in arrays.items()}
        dev["m_flag"] = batch["m_flag"]
        return dev

    log_every = getattr(args, "log_every", 50)
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        # Per-EPOCH seeded shot-number stream (train + val draws): a
        # --do_resume run at epoch N then draws exactly what an
        # uninterrupted run draws at epoch N, making crash-resume
        # trajectory-exact (the reference's sequential np.random stream
        # is not; pinned by tests/test_multiprocess.py kill-and-resume).
        py_rng = random.Random(f"{args.seed}:{epoch}")
        # O(1)-memory device-side running sums (one tiny add per step;
        # a per-step list grows O(steps/epoch) and bloats on larger
        # datasets)
        totals = None
        n_steps = 0  # batches TRAINED (the pipelined path trains one
        # arrival behind, draining the carried batch after the loop)
        n_seen = 0  # batches received
        carry = None
        carry_mflag = None
        for batch in device_prefetch(train_dl.epoch(epoch), put=put):
            if args.limit_steps and n_seen >= args.limit_steps:
                break
            # rng is indexed by the batch's position in the epoch — the
            # pipelined path consumes it one arrival early (the carry
            # stores the post-split loss-mask key), reproducing the
            # serial draw sequence exactly
            rng = jax.random.fold_in(jax.random.key(args.seed), epoch * 100000 + n_seen)
            n_seen += 1
            if pipelined:
                geom = {k: batch[k] for k in batch_keys}
                # Dispatch batch j's materialization, THEN train the
                # carried batch j-1 — two queued programs whose
                # independence the runtime overlaps (measured 64.3 ->
                # ~55-58 ms/step at b8, scripts/ab_overlap.py; fusing
                # both into one program measured NEUTRAL — XLA
                # schedules the ops serially on the core).
                nxt_carry = _prime(store_arrays, geom, rng)
                if carry is None:
                    carry = nxt_carry
                    carry_mflag = batch["m_flag"]
                    continue
                shot_num = sample_shot_num(py_rng, carry_mflag)
                state, m = _train_phase(state, carry, shot_num)
                carry = nxt_carry
                carry_mflag = batch["m_flag"]
            else:
                shot_num = sample_shot_num(py_rng, batch["m_flag"])
                state, m = train_step(state, batch, rng, shot_num)
            totals = m if totals is None else jax.tree.map(jnp.add, totals, m)
            n_steps += 1
            if n_steps % 32 == 0:
                # bound the async dispatch chain (long unsynced chains
                # can wedge tunneled devices); the RUNNING sum catches a
                # NaN from any step in the window, not just the sampled
                # one
                if not np.isfinite(float(totals["loss"])):
                    raise SystemExit(f"Loss is not finite at epoch {epoch}")
            if log_every and n_steps % log_every == 0 and main_proc:
                # per-N-step train scalars (reference streams loss/lr to
                # W&B every 50 steps: FSC_finetune_cross.py:320-326)
                gstep = epoch * steps_per_epoch + n_steps
                rec = {
                    "train/loss_step": float(m["loss"]),
                    "train/lr_step": float(sched(gstep)),
                }
                wandb.log(rec, step=gstep)
                for k, v in rec.items():
                    tb.scalar(k, v, gstep)
        if pipelined and carry is not None:
            # drain: train the last carried batch of the epoch
            shot_num = sample_shot_num(py_rng, carry_mflag)
            state, m = _train_phase(state, carry, shot_num)
            totals = m if totals is None else jax.tree.map(jnp.add, totals, m)
            n_steps += 1
        host_metrics = jax.device_get(totals) if totals is not None else {}
        tr_loss = float(host_metrics.get("loss", 0.0))
        tr_mae = float(host_metrics.get("mae", 0.0))
        tr_mse = float(host_metrics.get("mse", 0.0))
        if not np.isfinite(tr_loss):
            raise SystemExit(f"Loss is not finite at epoch {epoch}")

        # validation (reference: FSC_finetune_cross.py:328-350); ragged
        # last batch is padded up to the device multiple and the padding
        # sliced back off.
        v_err, v_sq, v_nae, v_n = 0.0, 0.0, 0.0, 0
        if resident:
            # resident val: index-gather batches from the HBM ValStore.
            # The eval returns GLOBAL sums, so on multi-process meshes
            # each process contributes any 1/n_proc slice of the index
            # vector — the partition does not affect the metric.
            varrs = val_store.arrays
            vb = args.batch_size
            lb = vb // n_proc
            for i0 in range(0, val_store.n, vb):
                take_n = min(vb, val_store.n - i0)
                idxs = (np.arange(i0, i0 + vb) % val_store.n).astype(np.int32)
                valid = np.concatenate(
                    [np.ones(take_n, np.float32),
                     np.zeros(vb - take_n, np.float32)]
                )
                if n_proc > 1:
                    gb = make_global_batch(mesh, {
                        "idxs": idxs[proc_id * lb : (proc_id + 1) * lb],
                        "valid": valid[proc_id * lb : (proc_id + 1) * lb],
                    })
                    idxs_dev, valid_dev = gb["idxs"], gb["valid"]
                else:
                    idxs_dev = jax.device_put(idxs, bsh)
                    valid_dev = jax.device_put(valid, bsh)
                em = store_eval(
                    state.params, varrs, idxs_dev, valid_dev,
                    py_rng.randint(0, 3),
                )
                v_err += float(em["err_sum"])
                v_sq += float(em["sq_sum"])
                v_nae += float(em["nae_sum"])
                v_n += int(em["n"])
        for batch in (() if resident else val_dl.epoch(0)):
            true_n = batch["image"].shape[0]
            # pad the ragged tail up to the per-process device multiple
            # (n_dev/n_proc local devices each hold one shard of the
            # global batch); the valid mask zeroes the padding inside
            # the jitted sums. A tail not divisible by n_proc is
            # dropped by the loader (documented there), like the
            # reference's DistributedSampler rounding.
            pad = (-true_n) % max(1, n_dev // n_proc)
            vb = {}
            for k in ("image", "gt_density", "boxes"):
                arr = batch[k]
                if pad:
                    arr = np.concatenate([arr, arr[-1:].repeat(pad, axis=0)], 0)
                vb[k] = arr
            vb["valid"] = np.concatenate(
                [np.ones(true_n, np.float32), np.zeros(pad, np.float32)]
            )
            if n_proc > 1:
                vb = make_global_batch(mesh, vb)
            else:
                vb = {k: jax.device_put(v, bsh) for k, v in vb.items()}
            shot_num = py_rng.randint(0, 3)
            em = eval_step(state.params, vb, shot_num)
            v_err += float(em["err_sum"])
            v_sq += float(em["sq_sum"])
            v_nae += float(em["nae_sum"])
            v_n += int(em["n"])

        n = max(n_steps, 1)
        vn = max(v_n, 1)
        val_mae = v_err / vn
        stats = {
            "epoch": epoch,
            "train/loss": tr_loss / n,
            "train/MAE": tr_mae / n,
            "train/RMSE": (tr_mse / n) ** 0.5,
            "val/MAE": val_mae,
            "val/RMSE": (v_sq / vn) ** 0.5,
            "val/NAE": v_nae / vn,
            "lr": float(sched(epoch * steps_per_epoch)),
            "epoch_time_s": time.time() - t0,
        }
        if main_proc:
            print(
                f"[Epoch {epoch}] loss {stats['train/loss']:.4f} "
                f"train MAE {stats['train/MAE']:.2f} val MAE {val_mae:.2f} "
                f"val RMSE {stats['val/RMSE']:.2f} ({stats['epoch_time_s']:.1f}s)",
                flush=True,
            )
        jsonl.write(stats)
        # W&B steps must be monotonic: epoch records share the global-
        # step axis with the per-50-step scalars
        wandb.log(stats, step=(epoch + 1) * steps_per_epoch)
        for k, v in stats.items():
            if k != "epoch":
                tb.scalar(k, v, epoch)
        panel_every = getattr(args, "panel_every", 0)
        if panel_every and epoch % panel_every == 0 and n_proc == 1:
            # single-process only: the eager panel forward can't mix
            # host-local inputs with globally-replicated params on a
            # multi-process mesh
            _log_val_panels(
                tb, model, state, val_ds, epoch, wandb=wandb,
                wandb_step=(epoch + 1) * steps_per_epoch,
            )

        if outdir:
            # periodic / last / min-MAE checkpoints (reference:
            # FSC_finetune_cross.py:407-420). Orbax checkpointing is a
            # COLLECTIVE: every process must call save (orbax writes
            # from the primary host only); output_dir must be a shared
            # filesystem on multi-host pods. val_mae is a replicated
            # metric, so the minMAE branch agrees across processes.
            last_every = max(1, getattr(args, "ckpt_last_every", 1))
            want_periodic = (
                args.ckpt_every and epoch % args.ckpt_every == 0 and epoch != 0
            )
            want_last = (
                epoch % last_every == 0 or epoch + 1 == args.epochs
            )
            want_min = val_mae < min_mae
            host_state = (
                jax.device_get(state)
                if (want_periodic or want_last or want_min) else None
            )
            if want_periodic:
                ckpt.save_checkpoint(
                    os.path.join(outdir, "ckpt_periodic"), epoch, host_state,
                    keep=5,
                )
            if want_last:
                ckpt.save_checkpoint(
                    os.path.join(outdir, "ckpt_last"), epoch, host_state, keep=1
                )
            if want_min:
                min_mae = val_mae
                ckpt.save_checkpoint(
                    os.path.join(outdir, "ckpt_minMAE"), epoch, host_state,
                    keep=1,
                )
                # reference uploads the best checkpoint as a W&B
                # artifact (util/misc.py:331-335); host-only, rank 0
                if main_proc:
                    wandb.log_artifact(
                        os.path.join(outdir, "ckpt_minMAE"), "finetuning_minMAE"
                    )
    tb.flush()


def _log_val_panels(tb, model, state, val_ds, epoch, n_panels: int = 4,
                    wandb=None, wandb_step=None):
    """GT-overlay | prediction | pred-overlay triptychs to TB and W&B
    (reference W&B panels: FSC_finetune_cross.py:352-405)."""
    import jax.numpy as jnp

    n = min(n_panels, len(val_ds))
    if n == 0:
        return
    samples = [val_ds[i] for i in range(n)]
    imgs = jnp.asarray(np.stack([s["image"] for s in samples]))
    boxes = jnp.asarray(np.stack([s["boxes"] for s in samples]))
    out = np.asarray(model.apply({"params": state.params}, imgs, boxes, 3))
    for i, s in enumerate(samples):
        img = s["image"]
        gt = np.stack([s["gt_density"], np.zeros_like(s["gt_density"]),
                       np.zeros_like(s["gt_density"])], -1)
        pred = np.stack([out[i], np.zeros_like(out[i]), np.zeros_like(out[i])], -1)
        panel = np.concatenate(
            [np.clip(img / 2 + gt, 0, 1), np.clip(pred, 0, 1),
             np.clip(img / 2 + pred, 0, 1)], axis=1,
        )
        tb.image(f"val/density_{s['name']}", panel, epoch)
        if wandb is not None:
            wandb.image(f"val/density_{s['name']}", panel, wandb_step)


def _entry():
    main(get_args())


if __name__ == "__main__":
    _entry()

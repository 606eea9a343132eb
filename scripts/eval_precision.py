"""Precision-mode accuracy/throughput study on TRAINED weights.

VERDICT item 3: the bf16 fast mode showed ~5% count error on RANDOM
weights; measure the error of each precision mode on a model actually
trained to count (the synthetic-blob task of train_synthetic.py), plus
the device-only throughput cost of each mode, and emit the PARITY.md
table. Matches the reference's fp16 test path
(reference: FSC_test_cross(few-shot).py:273-275) which publishes its
headline MAE in half precision.

  python scripts/eval_precision.py [--ckpt /tmp/countr_synth_ckpt]
      [--steps 1000] [--n_test 32]

Modes:
  fp32  — exact ops, Precision.HIGHEST (torch-oracle bit parity)
  bf16  — Pallas attention + fused LN + tanh GELU (fast mode)
  mixed — bf16 trunk, fp32 density head (accuracy/speed middle ground)

--bisect instead lowers ONE stage at a time to bf16 (encoder /
decoder / density head, fast-mode kernels following the stage) to
attribute the bf16 count error to its source stage.
"""

import argparse
import json
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np

from train_synthetic import make_image  # noqa: E402


def synth_sample(rng, w=384):
    import cv2
    from scipy import ndimage

    img, centers = make_image(rng, w=w)
    density = np.zeros((384, w), np.float32)
    for cx, cy in centers:
        density[int(cy), int(cx)] = 1.0
    density = ndimage.gaussian_filter(density, 1.0) * 60.0
    boxes, rects = [], []
    for cx, cy in centers[:3]:
        y1, x1 = max(0, int(cy) - 10), max(0, int(cx) - 10)
        y2, x2 = min(383, int(cy) + 10), min(w - 1, int(cx) + 10)
        rects.append([y1, x1, y2, x2])
        boxes.append(
            cv2.resize(img[y1:y2 + 1, x1:x2 + 1], (64, 64),
                       interpolation=cv2.INTER_LINEAR)
        )
    return img, density, np.stack(boxes), rects, len(centers)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="/tmp/countr_synth_ckpt", type=str)
    p.add_argument("--steps", default=1000, type=int)
    p.add_argument("--n_train", default=256, type=int)
    p.add_argument("--n_test", default=32, type=int)
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--batch_windows", default=32, type=int)
    p.add_argument("--skip_throughput", action="store_true")
    p.add_argument("--bisect", action="store_true",
                   help="lower one stage at a time to bf16 instead of "
                        "the fp32/bf16/mixed ladder")
    p.add_argument("--head_bisect", action="store_true",
                   help="locate the bf16 error WITHIN the density head: "
                        "fp32 model with ONE bf16 head stage per mode "
                        "(hs0..hs3 = conv stages, hs4 = pred+final-up)")
    p.add_argument("--modes", default="", type=str,
                   help="explicit comma-separated mode list; supports "
                        "fp32,bf16,mixed,mixed_fast,enc16,dec16,head16,"
                        "hs0..hs4, and mix:<stages> (bf16 trunk + "
                        "fp32-HIGH head except listed bf16 stages, e.g. "
                        "mix:012)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from countr_tpu.config import TrainConfig
    from countr_tpu.engine import checkpoint as ckpt
    from countr_tpu.engine.inference import CountingEngine
    from countr_tpu.engine.train import (
        init_train_state, make_finetune_step, make_optimizer,
    )
    from countr_tpu.models import build_countr
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    def build(mode):
        kw = dict(freeze_encoder=False)
        if mode == "fp32":
            return build_countr("mae_vit_base6_patch16", dtype=jnp.float32, **kw)
        if mode == "bf16":
            return build_countr(
                "mae_vit_base6_patch16", dtype=jnp.bfloat16,
                use_pallas_attention=True, approx_gelu=True, **kw,
            )
        if mode == "mixed":
            return build_countr(
                "mae_vit_base6_patch16", dtype=jnp.bfloat16,
                head_dtype=jnp.float32, use_pallas_attention=True,
                approx_gelu=True, **kw,
            )
        if mode == "mixed_fast":
            return build_countr(
                "mae_vit_base6_patch16", dtype=jnp.bfloat16,
                head_dtype=jnp.float32, head_precision_high=True,
                use_pallas_attention=True, approx_gelu=True, **kw,
            )
        if mode.startswith("hs"):
            # head-stage bisect: fp32 everywhere except ONE bf16 stage
            # INSIDE the head (hs0..hs3 = conv stages, hs4 = pred +
            # final upsample)
            k = int(mode[2:])
            return build_countr(
                "mae_vit_base6_patch16", dtype=jnp.float32,
                head_stage_dtypes=tuple(
                    jnp.bfloat16 if i == k else None for i in range(5)
                ),
                **kw,
            )
        if mode.startswith("mix:"):
            # candidate production mode: bf16 fast trunk, fp32 head at
            # Precision.HIGH except the listed stages in bf16
            # (mix: with no digits = mixed_fast itself)
            ks = {int(c) for c in mode[4:]}
            return build_countr(
                "mae_vit_base6_patch16", dtype=jnp.bfloat16,
                head_dtype=jnp.float32, head_precision_high=True,
                head_stage_dtypes=tuple(
                    jnp.bfloat16 if i in ks else None for i in range(5)
                ),
                use_pallas_attention=True, approx_gelu=True, **kw,
            )
        # Bisect modes: fp32 everywhere except ONE bf16 stage, whose
        # fast-mode kernels (Pallas attn, tanh GELU) engage with it.
        stage = {"enc16": dict(encoder_dtype=jnp.bfloat16),
                 "dec16": dict(decoder_dtype=jnp.bfloat16),
                 "head16": dict(head_dtype=jnp.bfloat16)}[mode]
        return build_countr(
            "mae_vit_base6_patch16", dtype=jnp.float32,
            use_pallas_attention=True, approx_gelu=True, **stage, **kw,
        )

    if args.modes:
        modes = tuple(m for m in args.modes.split(",") if m)
    elif args.head_bisect:
        modes = ("fp32", "hs0", "hs1", "hs2", "hs3", "hs4")
    elif args.bisect:
        modes = ("fp32", "enc16", "dec16", "head16")
    else:
        modes = ("fp32", "bf16", "mixed", "mixed_fast")

    # ------------------------------------------------------------------
    # Trained weights: restore, or train once and save.
    # ------------------------------------------------------------------
    model_tr = build("bf16")
    params = jax.jit(model_tr.init, static_argnums=(3,))(
        jax.random.key(0), jnp.zeros((1, 384, 384, 3)),
        jnp.zeros((1, 3, 64, 64, 3)), 3,
    )["params"]

    if ckpt.latest_step(args.ckpt) is not None:
        host = jax.tree.map(lambda x: np.zeros(x.shape, x.dtype), params)
        params, step = ckpt.restore_checkpoint(args.ckpt, host)
        print(f"restored trained params (step {step}) from {args.ckpt}",
              flush=True)
        params = jax.tree.map(jnp.asarray, params)
    else:
        print("training on synthetic blobs...", flush=True)
        train = [synth_sample(rng) for _ in range(args.n_train)]
        tcfg = TrainConfig(batch_size=args.batch, epochs=args.steps,
                           warmup_epochs=max(args.steps // 20, 1), lr=3e-4)
        tx, _ = make_optimizer(tcfg, steps_per_epoch=1, world_batch=args.batch)
        state = init_train_state(params, tx)
        step_fn = make_finetune_step(model_tr, tcfg)
        # upload the dataset ONCE and gather batches on device — the
        # tunnel would otherwise spend ~0.7 s/step re-uploading pixels
        all_dev = {
            "image": jnp.asarray(np.stack([t[0] for t in train])),
            "gt_density": jnp.asarray(np.stack([t[1] for t in train])),
            "boxes": jnp.asarray(np.stack([t[2] for t in train])),
        }
        t0 = time.time()
        for i in range(args.steps):
            idxs = jnp.asarray(rng.integers(0, args.n_train, args.batch))
            batch = {k: jnp.take(v, idxs, axis=0) for k, v in all_dev.items()}
            state, m = step_fn(
                state, batch, jax.random.fold_in(jax.random.key(1), i), 3
            )
            if i % 25 == 0:
                loss = float(m["loss"])
                if i % 200 == 0:
                    print(f"  step {i}: loss {loss:.4f}", flush=True)
        print(f"trained {args.steps} steps in {time.time() - t0:.0f}s",
              flush=True)
        params = state.params
        ckpt.save_checkpoint(args.ckpt, args.steps,
                             jax.device_get(params), keep=1)
        print(f"saved trained params to {args.ckpt}", flush=True)

    # ------------------------------------------------------------------
    # Accuracy per mode on held-out synthetic images.
    # ------------------------------------------------------------------
    test_rng = np.random.default_rng(1234)
    test = [synth_sample(test_rng, w=512) for _ in range(args.n_test // 2)] + \
        [synth_sample(test_rng, w=384) for _ in range(args.n_test - args.n_test // 2)]
    # uint8 pixels like the real test pipeline (PIL output) — also 4x
    # less tunnel H2D per mode
    imgs = [np.clip(t[0] * 255.0, 0, 255).astype(np.uint8) for t in test]
    boxes = [t[2] for t in test]
    rects = [t[3] for t in test]
    gts = [t[4] for t in test]

    results = {}
    for mode in modes:
        model = build(mode)
        engine = CountingEngine(
            model, {"params": params}, batch_windows=args.batch_windows
        )
        t0 = time.perf_counter()
        res = engine.count_batch(imgs, boxes, rects, shot_num=3,
                                 return_density=False)
        wall = time.perf_counter() - t0
        counts = np.asarray([r.count for r in res])
        raw = np.asarray([r.raw_count for r in res])
        results[mode] = {"counts": counts, "raw": raw, "wall_s": wall,
                         "engine": engine, "model": model}
        mae = float(np.mean(np.abs(counts - np.asarray(gts, np.float64))))
        print(f"[{mode}] MAE vs GT {mae:.3f}  (wall {wall:.1f}s)", flush=True)

    ref = results["fp32"]["counts"]
    ref_raw = results["fp32"]["raw"]
    table = {}
    for mode in modes:
        counts = results[mode]["counts"]
        raw = results[mode]["raw"]
        rel = np.abs(counts - ref) / np.maximum(np.abs(ref), 1e-6)
        # raw (pre-TTN) relative error is the honest precision metric:
        # the TTN divide-if-e_cnt>1.8 rule is discontinuous, so a hair
        # of bf16 noise at the threshold flips the /e_cnt branch and
        # explodes the post-TTN ratio without any real density error
        rel_raw = np.abs(raw - ref_raw) / np.maximum(np.abs(ref_raw), 1e-6)
        table[mode] = {
            "mae_vs_gt": float(np.mean(np.abs(counts - np.asarray(gts, np.float64)))),
            "raw_count_rel_err_mean": float(np.mean(rel_raw)),
            "raw_count_rel_err_max": float(np.max(rel_raw)),
            "count_abs_err_vs_fp32_mean": float(np.mean(np.abs(raw - ref_raw))),
            "count_abs_err_vs_fp32_max": float(np.max(np.abs(raw - ref_raw))),
            "ttn_count_rel_err_mean": float(np.mean(rel)),
            "ttn_branch_flips": int(np.sum(
                (results[mode]["counts"] != results[mode]["raw"])
                != (ref != ref_raw)
            )),
        }

    print("per-image: gt | " + " | ".join(modes))
    for i in range(len(gts)):
        print(
            f"  {gts[i]:4d} | "
            + " | ".join(f"{results[m]['raw'][i]:8.3f}" for m in modes)
        )

    # ------------------------------------------------------------------
    # Device-only throughput per mode (chained jitted forwards, one
    # terminal scalar fetch — block_until_ready is unreliable on axon).
    # ------------------------------------------------------------------
    if not args.skip_throughput:
        from jax import lax

        from countr_tpu.models.countr import CounTR

        bw = args.batch_windows
        win = jnp.asarray(rng.uniform(0, 1, (bw, 384, 384, 3)), jnp.float32)
        for mode in modes:
            model = results[mode]["model"]
            ny = 3
            c = model.cfg.decoder_embed_dim
            dec_dt = model.cfg.decoder_dtype or model.cfg.dtype
            y = jnp.asarray(rng.uniform(-1, 1, (bw, ny, c)), dec_dt)

            def looped(imgs, p, y, model=model):
                def body(carry, _):
                    im = imgs + (carry * 1e-12).astype(imgs.dtype)
                    d = model.apply(p, im, y, method=CounTR.forward_tokens)
                    return jnp.float32(d.ravel()[0]) * 1e-12, None

                return lax.scan(body, jnp.float32(0.0), None, length=10)[0]

            run = jax.jit(looped)
            pp = {"params": params}
            _ = float(run(win, pp, y))
            t0 = time.perf_counter()
            _ = float(run(win, pp, y))
            wps = bw * 10 / (time.perf_counter() - t0)
            table[mode]["device_windows_per_sec"] = round(wps, 1)
            print(f"[{mode}] device-only {wps:.0f} windows/s", flush=True)

    print(json.dumps(table, indent=2))
    # markdown table for PARITY.md
    cols = list(table["fp32"].keys())
    print("\n| mode | " + " | ".join(cols) + " |")
    print("|---|" + "---|" * len(cols))
    for mode, row in table.items():
        print(
            f"| {mode} | "
            + " | ".join(
                f"{row[c]:.4g}" if isinstance(row[c], float) else str(row[c])
                for c in cols
            )
            + " |"
        )


if __name__ == "__main__":
    main()

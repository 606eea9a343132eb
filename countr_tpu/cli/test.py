"""FSC147 counting evaluation (few-shot and zero-shot).

Covers the reference's two test entry points in one CLI:
- few-shot: all annotated exemplars (reference:
  FSC_test_cross(few-shot).py)
- zero-shot: --box_bound 0, the maintained zero-shot route
  (reference: run_minimal.MD:92-95; the separate zero-shot script is a
  stale variant of the same loop)
plus --external / --box_bound exemplar modes.

Usage:
  python -m countr_tpu.cli.test --data_path ./data/FSC147 \
      --model mae_vit_base6_patch16 --resume weights.pth --split test
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from countr_tpu.cli import common
from countr_tpu.utils.metrics import CountingMetrics, JsonlLogger
from countr_tpu.utils import viz


def get_args():
    p = argparse.ArgumentParser("FSC147 counting evaluation")
    common.add_data_args(p)
    common.add_model_args(p, default_model="mae_vit_base6_patch16")
    p.add_argument("--split", default="test", type=str)
    p.add_argument("--external", action="store_true",
                   help="use exemplars pooled from other images")
    p.add_argument("--box_bound", default=-1, type=int,
                   help="max exemplars (0 = zero-shot)")
    p.add_argument("--max_s_cnt", default=1, type=int,
                   help="tiny-exemplar count that triggers 3x3 grid mode")
    p.add_argument("--no_normalization", action="store_true",
                   help="disable test-time normalization")
    p.add_argument("--batch_images", default=16, type=int,
                   help="images pooled per device flush")
    p.add_argument("--batch_windows", default=16, type=int)
    p.add_argument("--n_devices", default=0, type=int,
                   help="shard window batches over the first N devices "
                        "of the mesh (0 = all; the reference evaluates "
                        "under DDP too, FSC_test_cross(few-shot).py"
                        ":229-231)")
    p.add_argument("--narrow_policy", default="pad",
                   choices=["pad", "reference"])
    p.add_argument("--save_viz", action="store_true",
                   help="write per-image overlay panels")
    p.add_argument("--limit", default=0, type=int,
                   help="evaluate only the first N images (0 = all)")
    p.add_argument("--profile_dir", default="", type=str,
                   help="capture a jax.profiler trace of the inference "
                        "phase into this directory")
    p.add_argument("--expect_mae", default=None, type=float,
                   help="acceptance gate: exit nonzero unless the split "
                        "MAE is within --expect_tol_pct of this value "
                        "(reference released-weights bar: MAE 11.95, "
                        "README.md:117-119)")
    p.add_argument("--expect_rmse", default=None, type=float,
                   help="acceptance gate on RMSE (reference: 91.23)")
    p.add_argument("--expect_tol_pct", default=2.0, type=float,
                   help="tolerance as a percentage of the expected value")
    return p.parse_args()


def check_expectations(stats: dict, args) -> list:
    """Acceptance-gate comparison; returns failure strings (empty =
    pass). Fails when a metric exceeds expected * (1 + tol%) — beating
    the expected number is never a failure."""
    failures = []
    tol = getattr(args, "expect_tol_pct", 2.0) / 100.0
    for key, flag in (("MAE", "expect_mae"), ("RMSE", "expect_rmse")):
        want = getattr(args, flag, None)
        if want is None:
            continue
        got = stats[key]
        if not np.isfinite(got) or got > want * (1.0 + tol):
            failures.append(
                f"{key} {got:.3f} exceeds expected {want:.3f} "
                f"(+{getattr(args, 'expect_tol_pct', 2.0):.1f}% tolerance)"
            )
    return failures


def main(args):
    from countr_tpu.data.fsc147 import TestDataset
    from countr_tpu.engine.inference import CountingEngine
    from countr_tpu.parallel.mesh import get_mesh

    meta = common.load_meta(args)
    model, params = common.build_counting_model(args)
    outdir = common.ensure_outdir(args)

    ds = TestDataset(
        meta, split=args.split, external=args.external, box_bound=args.box_bound
    )
    # multi-chip inference: window batches shard over the mesh (a
    # 1-device mesh is the plain single-chip path)
    mesh = get_mesh(getattr(args, "n_devices", 0) or None)
    engine = CountingEngine(
        model, params,
        batch_windows=args.batch_windows,
        normalization=not args.no_normalization,
        max_s_cnt=args.max_s_cnt,
        narrow_policy=args.narrow_policy,
        mesh=mesh,
    )

    n = len(ds) if args.limit <= 0 else min(args.limit, len(ds))
    metrics = CountingMetrics()
    names, preds, gts = [], [], []
    tot_load, tot_infer = 0.0, 0.0
    empties = []

    from concurrent.futures import ThreadPoolExecutor

    from countr_tpu.utils.profiling import trace

    # Stream samples (background threads decode/resize while the device
    # counts), bucketing by shot count on the fly — shot_num is a
    # static trace arg so each bucket flushes through count_batch.
    samples = []
    results = []
    buckets = {}
    tot_infer = 0.0

    def flush(shot):
        nonlocal tot_infer
        idxs = buckets.pop(shot, [])
        if not idxs:
            return
        t0 = time.perf_counter()
        res = engine.count_batch(
            [samples[k]["image"] for k in idxs],
            [samples[k]["boxes"] if shot > 0 else None for k in idxs],
            [samples[k]["rects"] for k in idxs],
            shot_num=shot,
            return_density=args.save_viz,
        )
        tot_infer += time.perf_counter() - t0
        for k, r in zip(idxs, res):
            results[k] = r
            s = samples[k]
            gt_cnt = float(len(s["dots"]))
            print(
                f"{k}/{n}: pred_cnt: {r.count:5.3f},  gt_cnt: {gt_cnt:5.3f},  "
                f"error: {abs(r.count - gt_cnt):5.3f}, id: {s['name']}, "
                f"s_cnt: {r.grid_mode}",
                flush=True,
            )

    with trace(getattr(args, "profile_dir", "") or None):
        with ThreadPoolExecutor(max_workers=4) as pool:
            futures = [pool.submit(ds.__getitem__, i) for i in range(n)]
            for fut in futures:
                s = fut.result()
                tot_load += s["load_time"]
                samples.append(s)
                results.append(None)
                shot = int(s["boxes"].shape[0])
                buckets.setdefault(shot, []).append(len(samples) - 1)
                if len(buckets[shot]) >= args.batch_images:
                    flush(shot)
            for shot in list(buckets):
                flush(shot)

    for k, s in enumerate(samples):
        r = results[k]
        gt_cnt = float(len(s["dots"]))
        metrics.update(r.count, gt_cnt)
        names.append(s["name"])
        preds.append(r.count)
        gts.append(gt_cnt)
        if gt_cnt == 0:
            empties.append(s["name"])
        if args.save_viz and outdir:
            img_f = s["image"]
            if img_f.dtype == np.uint8:
                img_f = img_f.astype(np.float32) / 255.0
            viz.save_prediction_panel(
                f"{outdir}/full_{s['name'].rsplit('.', 1)[0]}__{round(r.count)}.png",
                img_f, r.density, s["gt_map"], s["rects"], r.count,
                gt_cnt, external=args.external,
            )
            if s["boxes"].shape[0] > 0:
                viz.save_exemplar_strip(
                    f"{outdir}/boxes_{s['name'].rsplit('.', 1)[0]}.png", s["boxes"]
                )

    log_stats = {
        **metrics.summary(),
        "Mean load time": tot_load / max(len(samples), 1),
        "Mean infer time": tot_infer / max(len(samples), 1),
        "Mean overall time": (tot_load + tot_infer) / max(len(samples), 1),
    }
    print("\nAverage stats:")
    print(", ".join(f"{k}: {v:5.3f}" for k, v in log_stats.items()))
    print("empty images:", len(empties), empties if empties else "")

    if outdir:
        JsonlLogger(outdir).write(log_stats)
        viz.save_results(outdir, names, preds, gts)

    failures = check_expectations(log_stats, args)
    if failures:
        for f in failures:
            print(f"ACCEPTANCE FAILURE: {f}", flush=True)
        raise SystemExit(1)
    if getattr(args, "expect_mae", None) is not None or getattr(
        args, "expect_rmse", None
    ) is not None:
        print("acceptance gate: PASS", flush=True)
    return log_stats


def _entry():
    main(get_args())


if __name__ == "__main__":
    _entry()

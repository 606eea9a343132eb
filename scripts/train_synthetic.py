"""End-to-end learn-to-count demonstration on synthetic data.

Generates images of dark blobs on textured backgrounds, trains the
full-size counting model from scratch (encoder unfrozen — there is no
pretrained encoder here), and evaluates with the sliding-window
engine + TTN. Passes when the learned model's test MAE beats the
predict-the-train-mean baseline.

  python scripts/train_synthetic.py [--steps 400] [--n_train 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_image(rng, w=512, k=None):
    """384 x w image with k gaussian blobs; returns (img, centers)."""
    k = k if k is not None else int(rng.integers(3, 56))
    img = rng.uniform(0.55, 0.75, (384, w, 3)).astype(np.float32)
    img += rng.normal(0, 0.03, (384, w, 3)).astype(np.float32)
    yy, xx = np.mgrid[0:384, 0:w].astype(np.float32)
    centers = np.stack(
        [rng.uniform(12, w - 12, k), rng.uniform(12, 384 - 12, k)], 1
    )  # (x, y)
    for cx, cy in centers:
        r2 = (xx - cx) ** 2 + (yy - cy) ** 2
        blob = np.exp(-r2 / (2 * 4.5 ** 2))
        img -= 0.55 * blob[..., None]
    return np.clip(img, 0, 1), centers


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", default=1000, type=int)
    p.add_argument("--n_train", default=256, type=int)
    p.add_argument("--n_test", default=8, type=int)
    p.add_argument("--batch", default=8, type=int)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from scipy import ndimage

    from countr_tpu.config import TrainConfig
    from countr_tpu.engine.inference import CountingEngine
    from countr_tpu.engine.train import (
        init_train_state, make_finetune_step, make_optimizer,
    )
    from countr_tpu.models import build_countr
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    def sample(w=384):
        img, centers = make_image(rng, w=w)
        density = np.zeros((384, w), np.float32)
        for cx, cy in centers:
            density[int(cy), int(cx)] = 1.0
        density = ndimage.gaussian_filter(density, 1.0) * 60.0
        # 3 exemplar crops around blob centers
        boxes, rects = [], []
        for cx, cy in centers[:3]:
            y1, x1 = max(0, int(cy) - 10), max(0, int(cx) - 10)
            y2, x2 = min(383, int(cy) + 10), min(w - 1, int(cx) + 10)
            rects.append([y1, x1, y2, x2])
            import cv2

            boxes.append(
                cv2.resize(img[y1:y2 + 1, x1:x2 + 1], (64, 64),
                           interpolation=cv2.INTER_LINEAR)
            )
        return img, density, np.stack(boxes), rects, len(centers)

    print("generating data...", flush=True)
    train = [sample() for _ in range(args.n_train)]
    test = [sample(w=512) for _ in range(args.n_test // 2)] + \
        [sample(w=384) for _ in range(args.n_test - args.n_test // 2)]

    model = build_countr(
        "mae_vit_base6_patch16", dtype=jnp.bfloat16, use_pallas_attention=True, subpixel_head=True,
        freeze_encoder=False,
    )
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.key(0), jnp.zeros((1, 384, 384, 3)),
        jnp.zeros((1, 3, 64, 64, 3)), 3,
    )["params"]
    tcfg = TrainConfig(batch_size=args.batch, epochs=args.steps,
                       warmup_epochs=max(args.steps // 20, 1), lr=3e-4)
    tx, _ = make_optimizer(tcfg, steps_per_epoch=1, world_batch=args.batch)
    state = init_train_state(params, tx)
    step = make_finetune_step(model, tcfg)

    print("training...", flush=True)
    t0 = time.time()
    for i in range(args.steps):
        idxs = rng.integers(0, args.n_train, args.batch)
        batch = {
            "image": jnp.asarray(np.stack([train[j][0] for j in idxs])),
            "gt_density": jnp.asarray(np.stack([train[j][1] for j in idxs])),
            "boxes": jnp.asarray(np.stack([train[j][2] for j in idxs])),
        }
        state, m = step(state, batch, jax.random.fold_in(jax.random.key(1), i), 3)
        # sync every 25 steps: unbounded async queues can wedge the
        # tunneled device
        if i % 25 == 0:
            loss = float(m["loss"])
            if i % 100 == 0:
                print(f"  step {i}: loss {loss:.4f}", flush=True)
    print(f"trained {args.steps} steps in {time.time() - t0:.0f}s", flush=True)

    engine = CountingEngine(model, {"params": state.params}, batch_windows=32)
    res = engine.count_batch(
        [t[0] for t in test], [t[2] for t in test], [t[3] for t in test],
        shot_num=3, return_density=False,
    )
    gts = [t[4] for t in test]
    errs = [abs(r.count - g) for r, g in zip(res, gts)]
    mae = sum(errs) / len(errs)
    train_mean = np.mean([t[4] for t in train])
    base_mae = np.mean([abs(train_mean - g) for g in gts])
    for r, g in zip(res, gts):
        print(f"  pred {r.count:7.2f}  gt {g}", flush=True)
    print(f"test MAE {mae:.2f} vs predict-train-mean baseline {base_mae:.2f}")
    if mae < base_mae:
        print("PASS: the model learned to count")
    else:
        print("FAIL: no better than baseline")


if __name__ == "__main__":
    main()

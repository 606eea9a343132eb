"""Training-step throughput measurement (fine-tune + MAE pretrain).

Measures steady-state steps/sec and images/sec of the jitted training
steps on the available device(s), flagship config, bf16 activations.

  python scripts/bench_train.py [--batch 8] [--pretrain]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--steps", default=10, type=int)
    p.add_argument("--pretrain", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from countr_tpu.config import COUNTR_PRESETS, MAE_PRESETS, TrainConfig
    from countr_tpu.engine.train import (
        init_train_state, make_finetune_step, make_optimizer,
        make_pretrain_step,
    )
    from countr_tpu.models.countr import CounTR
    from countr_tpu.models.mae import MaskedAutoencoderViT
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    b = args.batch
    tcfg = TrainConfig(batch_size=b, epochs=100, warmup_epochs=10)
    rng = np.random.default_rng(0)

    if args.pretrain:
        cfg = dataclasses.replace(
            MAE_PRESETS["mae_vit_base_patch16"], dtype=jnp.bfloat16,
            use_pallas_attention=True, fused_attn_block=False,
        )
        model = MaskedAutoencoderViT(cfg)
        imgs = jnp.asarray(rng.uniform(0, 1, (b, 384, 384, 3)), jnp.float32)
        params = jax.jit(model.init)(jax.random.key(0), imgs[:1], jax.random.key(1))
        tx, _ = make_optimizer(tcfg, 100, b)
        state = init_train_state(params["params"], tx)
        step = make_pretrain_step(model)
        run = lambda s, i: step(s, imgs, jax.random.fold_in(jax.random.key(0), i))
        name = "MAE pretrain"
    else:
        cfg = dataclasses.replace(
            COUNTR_PRESETS["mae_vit_base6_patch16"], dtype=jnp.bfloat16,
            use_pallas_attention=True, fused_attn_block=False, subpixel_head=True,
        )
        model = CounTR(cfg)
        batch = {
            "image": jnp.asarray(rng.uniform(0, 1, (b, 384, 384, 3)), jnp.float32),
            "gt_density": jnp.asarray(rng.uniform(0, 1, (b, 384, 384)), jnp.float32),
            "boxes": jnp.asarray(rng.uniform(0, 1, (b, 3, 64, 64, 3)), jnp.float32),
        }
        params = jax.jit(model.init, static_argnums=(3,))(
            jax.random.key(0), batch["image"][:1], batch["boxes"][:1], 3
        )
        tx, _ = make_optimizer(tcfg, 100, b, freeze_encoder=cfg.freeze_encoder)
        state = init_train_state(params["params"], tx)
        step = make_finetune_step(model, tcfg)
        run = lambda s, i: step(s, batch, jax.random.fold_in(jax.random.key(0), i), 3)
        name = "finetune"

    print(f"compiling {name} step (batch {b})...", flush=True)
    t0 = time.time()
    state, m = run(state, 0)
    _ = float(m["loss"])  # host fetch = true sync (block_until_ready is
    # unreliable over the tunneled axon backend)
    print(f"compile+first step: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    for i in range(1, args.steps + 1):
        state, m = run(state, i)  # steps chain through `state`
    loss = float(m["loss"])  # single fetch drains the whole chain
    dt = (time.time() - t0) / args.steps
    print(
        f"{name}: {dt * 1e3:.1f} ms/step, {b / dt:.1f} images/sec "
        f"(batch {b}, loss {loss:.4f})",
        flush=True,
    )


if __name__ == "__main__":
    main()

"""A/B: fused subpixel density head vs reference formulation, on-device.

Times the full fast-mode window forward (Pallas attention + approx
GELU) and the density head alone, with `subpixel_head` off/on,
interleaved within one session (chained-scan + floor subtraction via
profile_forward.make_timer).

  python scripts/ab_subpixel.py [--batch 32] [--iters 50]
"""

import argparse
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np

from profile_forward import make_timer  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=32, type=int)
    p.add_argument("--iters", default=50, type=int)
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from countr_tpu.config import COUNTR_PRESETS
    from countr_tpu.models.countr import CounTR, DensityHead
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    b = args.batch
    print(f"device={jax.devices()[0]} batch={b}", flush=True)

    cfg = dataclasses.replace(
        COUNTR_PRESETS["mae_vit_base6_patch16"], dtype=jnp.bfloat16,
        use_pallas_attention=True, approx_gelu=True,
    )
    model = CounTR(cfg)
    cfg_sp = dataclasses.replace(cfg, subpixel_head=True)
    model_sp = CounTR(cfg_sp)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (b, 384, 384, 3)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (1, 3, 64, 64, 3)), jnp.float32)
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.key(0), imgs[:1], boxes, 3
    )
    y = jax.jit(
        lambda p, bx: model.apply(p, bx, 3, method=CounTR.encode_exemplars)
    )(params, jnp.broadcast_to(boxes, (b, 3, 64, 64, 3)))
    g = cfg.grid_size
    tokens = jnp.asarray(
        rng.uniform(-1, 1, (b, g, g, cfg.decoder_embed_dim)), jnp.bfloat16
    )
    hp = {"params": params["params"]["density_head"]}
    head = DensityHead(jnp.bfloat16)
    head_sp = DensityHead(jnp.bfloat16, subpixel=True)

    timeit = make_timer(args.iters)
    # Interleave pairs so session drift cancels within each comparison.
    for rep in range(2):
        timeit(
            f"[{rep}] head reference",
            lambda x, p: head.apply(p, x), tokens, hp,
        )
        timeit(
            f"[{rep}] head subpixel",
            lambda x, p: head_sp.apply(p, x), tokens, hp,
        )
        timeit(
            f"[{rep}] full fwd reference head",
            lambda im, p, yy: model.apply(p, im, yy, method=CounTR.forward_tokens),
            imgs, params, y,
        )
        timeit(
            f"[{rep}] full fwd subpixel head",
            lambda im, p, yy: model_sp.apply(p, im, yy, method=CounTR.forward_tokens),
            imgs, params, y,
        )

    # One-shot numerical sanity on-device (bf16): counts must agree to
    # bf16 tolerance between the two formulations.
    d_ref = jax.jit(
        lambda im, p, yy: model.apply(p, im, yy, method=CounTR.forward_tokens)
    )(imgs[:4], params, y[:4])
    d_sp = jax.jit(
        lambda im, p, yy: model_sp.apply(p, im, yy, method=CounTR.forward_tokens)
    )(imgs[:4], params, y[:4])
    c_ref = np.asarray(jnp.sum(d_ref, axis=(1, 2)) / 60.0, np.float64)
    c_sp = np.asarray(jnp.sum(d_sp, axis=(1, 2)) / 60.0, np.float64)
    print(f"counts ref {c_ref} subpixel {c_sp}", flush=True)


if __name__ == "__main__":
    main()

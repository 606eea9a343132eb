"""A/B: the DECODER self-attention fused half-block at the
full-forward level, same-session interleaved.

The round-3 branch-level A/B (scripts/ab_fused_block.py,
docs/PROFILE.md) measured the decoder's fused branch neutral
(0.941 fused vs 0.928 ms unfused — within noise) yet the kernel is
wired on; VERDICT r3 asked for a full-forward decision in one session.
This times the full fast-mode `forward_tokens` (the bench geometry:
batch 32/48, bf16, subpixel head) with the decoder's fused block
on/off (`CounTRConfig.fused_attn_block_decoder`), interleaved
round-robin so shared-chip drift cancels. Encoder stays fused in both
variants (its +1.5 ms/fwd win is established).

  python scripts/ab_decoder_fused.py [--iters 25] [--rounds 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", default=25, type=int)
    p.add_argument("--rounds", default=4, type=int)
    p.add_argument("--batches", default="32,48", type=str)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.models import build_countr
    from countr_tpu.models.countr import CounTR
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]} iters={args.iters}", flush=True)

    def dispatch_floor(iters):
        def empty(x):
            def body(c, _):
                return c * jnp.float32(1.0000001), None

            return lax.scan(body, x, None, length=iters)[0]

        erun = jax.jit(empty)
        float(erun(jnp.float32(1.0)))
        floor = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(erun(jnp.float32(1.0)))
            floor = min(floor, time.perf_counter() - t0)
        return floor

    variants = {}
    for name, dec_fused in (("dec_fused", True), ("dec_xla", False)):
        model = build_countr(
            "mae_vit_base6_patch16", dtype=jnp.bfloat16,
            use_pallas_attention=True, approx_gelu=True, subpixel_head=True,
            fused_attn_block_decoder=dec_fused,
        )
        params = jax.jit(model.init, static_argnums=(3,))(
            jax.random.key(0),
            jnp.zeros((1, 384, 384, 3), jnp.float32),
            jnp.zeros((1, 3, 64, 64, 3), jnp.float32),
            3,
        )

        def looped(imgs, p_, y, _model=model):
            def body(c, _):
                im = imgs + (c * 1e-12).astype(imgs.dtype)
                d = _model.apply(p_, im, y, method=CounTR.forward_tokens)
                return jnp.float32(d.ravel()[0]) * 1e-12, None

            return lax.scan(body, jnp.float32(0.0), None, length=args.iters)[0]

        variants[name] = (jax.jit(looped), params)

    floor = dispatch_floor(args.iters)
    print(f"dispatch floor {floor * 1e3:.1f} ms", flush=True)

    for b in [int(x) for x in args.batches.split(",")]:
        imgs = jnp.asarray(rng.uniform(0, 1, (b, 384, 384, 3)), jnp.float32)
        y = jnp.asarray(rng.uniform(-1, 1, (b, 3, 512)), jnp.bfloat16)
        best = {k: 1e9 for k in variants}
        for name, (run, params) in variants.items():
            t0 = time.perf_counter()
            float(run(imgs, params, y))  # compile + warm
            print(f"  warm b{b} {name:10s} {time.perf_counter() - t0:.1f}s",
                  flush=True)
        for r in range(args.rounds):
            line = []
            for name, (run, params) in variants.items():
                t0 = time.perf_counter()
                float(run(imgs, params, y))
                dt = (time.perf_counter() - t0 - floor) / args.iters
                best[name] = min(best[name], dt)
                line.append(f"{name}={dt * 1e3:.2f}ms")
            print(f"  b{b} round {r}: " + "  ".join(line), flush=True)
        for name, dt in best.items():
            print(f"  best b{b} {name:10s} {dt * 1e3:.2f} ms/fwd "
                  f"({b / dt:.0f} windows/s)", flush=True)


if __name__ == "__main__":
    main()

"""A/B: the one-kernel fused attention half-block (ops/pallas_block.py)
vs the composition it replaced (Pallas LN -> qkv matmul -> Pallas
attention -> proj matmul -> residual), interleaved in one session.

Also times the full fast-mode forward_tokens so the device
windows/s delta is read in the same session (cross-session chip
speed varies on the shared axon backend).

  python scripts/ab_fused_block.py [--batch 32] [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=32, type=int)
    p.add_argument("--iters", default=50, type=int)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from countr_tpu.models import build_countr
    from countr_tpu.models.countr import CounTR
    from countr_tpu.ops.pallas_attn import fused_attention
    from countr_tpu.ops.pallas_block import (
        fused_attention_block, fused_mlp_block,
    )
    from countr_tpu.ops.pallas_ln import fused_layer_norm
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_forward import make_timer

    timeit = make_timer(args.iters)
    b = args.batch
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]} batch={b}", flush=True)

    for (n, c, h, tag) in ((576, 768, 12, "encoder"), (576, 512, 16, "decoder")):
        x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
        r = lambda *s: jnp.asarray(  # noqa: E731
            rng.standard_normal(s) * 0.05, jnp.float32
        )
        lns, lnb = 1.0 + r(c), r(c)
        wqkv, bqkv = r(c, 3 * c), r(3 * c)
        wproj, bproj = r(c, c), r(c)

        def old_branch(x, lns, lnb, wqkv, bqkv, wproj, bproj):
            cd = x.dtype
            xn = fused_layer_norm(x, lns, lnb)
            qkv = jnp.einsum("bnc,cd->bnd", xn, wqkv.astype(cd)) + bqkv.astype(cd)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            att = fused_attention(q, k, v, h)
            return x + jnp.einsum("bnc,cd->bnd", att, wproj.astype(cd)) + bproj.astype(cd)

        def new_branch(x, lns, lnb, wqkv, bqkv, wproj, bproj):
            return fused_attention_block(
                x, lns, lnb, wqkv, bqkv, wproj, bproj, h
            )

        t_old = timeit(
            f"{tag} attn branch OLD (LN+qkv+attn+proj)", old_branch,
            x, lns, lnb, wqkv, bqkv, wproj, bproj,
        )
        t_new = timeit(
            f"{tag} attn branch NEW (one kernel)", new_branch,
            x, lns, lnb, wqkv, bqkv, wproj, bproj,
        )
        nblk = 12 if tag == "encoder" else 6
        print(
            f"  -> {tag}: {t_old * 1e3:.3f} -> {t_new * 1e3:.3f} ms/branch, "
            f"x{nblk} blocks = {(t_old - t_new) * nblk * 1e3:+.2f} ms/fwd",
            flush=True,
        )

        hid = 4 * c
        w1, b1 = r(c, hid), r(hid)
        w2, b2 = r(hid, c), r(c)

        def old_mlp(x, lns, lnb, w1, b1, w2, b2):
            cd = x.dtype
            xn = fused_layer_norm(x, lns, lnb)
            hh = jnp.einsum("bnc,cd->bnd", xn, w1.astype(cd)) + b1.astype(cd)
            hh = jax.nn.gelu(hh, approximate=True)
            return x + jnp.einsum("bnc,cd->bnd", hh, w2.astype(cd)) + b2.astype(cd)

        def new_mlp(x, lns, lnb, w1, b1, w2, b2):
            return fused_mlp_block(x, lns, lnb, w1, b1, w2, b2)

        t_old_m = timeit(
            f"{tag} mlp branch OLD (LN+fc1+gelu+fc2)", old_mlp,
            x, lns, lnb, w1, b1, w2, b2,
        )
        t_new_m = timeit(
            f"{tag} mlp branch NEW (one kernel)", new_mlp,
            x, lns, lnb, w1, b1, w2, b2,
        )
        print(
            f"  -> {tag} mlp: {t_old_m * 1e3:.3f} -> {t_new_m * 1e3:.3f} "
            f"ms/branch, x{nblk} blocks = "
            f"{(t_old_m - t_new_m) * nblk * 1e3:+.2f} ms/fwd",
            flush=True,
        )

    model = build_countr(
        "mae_vit_base6_patch16", dtype=jnp.bfloat16,
        use_pallas_attention=True, approx_gelu=True, subpixel_head=True,
    )
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.key(0),
        jnp.zeros((1, 384, 384, 3), jnp.float32),
        jnp.zeros((1, 3, 64, 64, 3), jnp.float32),
        3,
    )
    for bsz in (b, 48, 64):
        imgs = jnp.asarray(rng.uniform(0, 1, (bsz, 384, 384, 3)), jnp.float32)
        y = jnp.asarray(rng.uniform(-1, 1, (bsz, 3, 512)), jnp.bfloat16)
        t_full = timeit(
            f"full fast forward_tokens (fused, b={bsz})",
            lambda im, p, yy: model.apply(
                p, im, yy, method=CounTR.forward_tokens
            ),
            imgs, params, y,
        )
        print(
            f"forward-only windows/s at batch {bsz}: {bsz / t_full:.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""A/B: the fused cross-attention branch kernel (ops/pallas_block.py
``fused_cross_attention_block``) vs the XLA composition it replaces
(Pallas LN -> q proj -> smallk attention -> proj -> residual),
interleaved in one session, plus the full fast forward_tokens so the
windows/s delta is read in the same session.

  python scripts/ab_cross_block.py [--batch 32] [--iters 50]
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
    from jax import lax

    from countr_tpu.models import build_countr
    from countr_tpu.models.countr import CounTR
    from countr_tpu.ops.pallas_block import (
        _unfused_cross_reference, fused_cross_attention_block,
    )
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_forward import make_timer

    timeit = make_timer(args.iters)
    b = args.batch
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]} batch={b}", flush=True)

    # decoder geometry: N=576 queries, C=512, 16 heads, ny=4 kv tokens
    n, c, h, ny = 576, 512, 16, 4
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
    kk = jnp.asarray(rng.standard_normal((b, ny, c)), jnp.bfloat16)
    vv = jnp.asarray(rng.standard_normal((b, ny, c)), jnp.bfloat16)
    r = lambda *s: jnp.asarray(  # noqa: E731
        rng.standard_normal(s) * 0.05, jnp.float32
    )
    lns, lnb = 1.0 + r(c), r(c)
    wq, bq, wp, bp = r(c, c), r(c), r(c, c), r(c)

    def fused(x, lns, lnb, wq, bq, kk, vv, wp, bp):
        return fused_cross_attention_block(
            x, lns, lnb, wq, bq, kk, vv, wp, bp, h
        )

    def unfused(x, lns, lnb, wq, bq, kk, vv, wp, bp):
        return _unfused_cross_reference(
            x, lns, lnb, wq, bq, kk, vv, wp, bp, h, 1e-6
        )

    ms_f = timeit("cross fused", fused, x, lns, lnb, wq, bq, kk, vv, wp, bp)
    ms_u = timeit("cross unfused", unfused, x, lns, lnb, wq, bq, kk, vv, wp,
                  bp)
    # interleave a second round for drift
    ms_f = min(ms_f, timeit("cross fused 2", fused, x, lns, lnb, wq, bq, kk,
                            vv, wp, bp))
    ms_u = min(ms_u, timeit("cross unfused 2", unfused, x, lns, lnb, wq, bq,
                            kk, vv, wp, bp))
    print(f"cross branch b{b}: unfused {ms_u * 1e3:.3f} ms -> "
          f"fused {ms_f * 1e3:.3f} ms  (x6 blocks = "
          f"{(ms_u - ms_f) * 6 * 1e3:+.2f} ms/forward)", flush=True)

    # numeric check on-chip while we're here
    gf = np.asarray(jax.jit(fused)(x, lns, lnb, wq, bq, kk, vv, wp, bp),
                    np.float64)
    gu = np.asarray(jax.jit(unfused)(x, lns, lnb, wq, bq, kk, vv, wp, bp),
                    np.float64)
    print(f"max|fused-unfused| = {np.max(np.abs(gf - gu)):.3e}", flush=True)

    # full fast forward (cross fusion wired in models/countr.py)
    model = build_countr(
        "mae_vit_base6_patch16", dtype=jnp.bfloat16,
        use_pallas_attention=True, approx_gelu=True, subpixel_head=True,
    )
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.key(0), jnp.zeros((1, 384, 384, 3)),
        jnp.zeros((1, 3, 64, 64, 3)), 3,
    )
    imgs = jnp.asarray(rng.uniform(0, 1, (b, 384, 384, 3)), jnp.float32)
    y = model.apply(
        params, jnp.asarray(rng.uniform(0, 1, (b, 3, 64, 64, 3)), jnp.float32),
        3, method=CounTR.encode_exemplars,
    )

    def fwd(imgs, params, y):
        return model.apply(params, imgs, y, method=CounTR.forward_tokens)

    ms = timeit("full fast fwd", fwd, imgs, params, y)
    print(f"full fast forward_tokens b{b}: {ms * 1e3:.2f} ms = "
          f"{b / ms:.0f} windows/s", flush=True)


if __name__ == "__main__":
    main()

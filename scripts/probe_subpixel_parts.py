"""Attribution of the fused subpixel head's pieces on-device.

Times each op of the fused tail in isolation at the bench shape
(batch 32, bf16) with the chained-scan + floor-subtraction timer, to
locate where the composition loses the phase conv's isolated 1.47x
(scripts/probe_subpixel.py) once GN/pred/upsample join the graph.

  python scripts/probe_subpixel_parts.py [--batch 32] [--iters 30]
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
    p.add_argument("--iters", default=30, type=int)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from countr_tpu.ops import subpixel as sp
    from countr_tpu.ops.norms import group_norm
    from countr_tpu.ops.upsample import upsample2x_bilinear
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    b = args.batch
    print(f"device={jax.devices()[0]} batch={b}", flush=True)
    rng = np.random.default_rng(0)
    C = 256
    h = w = 96
    x = jnp.asarray(rng.normal(size=(b, h, w, C)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, jnp.float32)
    kb = jnp.asarray(rng.normal(size=(C,)) * 0.05, jnp.float32)
    ph = jnp.asarray(rng.normal(size=(b, h, w, 2, 2, C)), jnp.bfloat16)
    strips = (
        jnp.asarray(rng.normal(size=(b, 2, 2 * w, C)), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(b, 2, 2 * w, C)), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(b, 2 * h, 2, C)), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(b, 2 * h, 2, C)), jnp.bfloat16),
    )
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    zsmall = jnp.asarray(rng.normal(size=(b, h, w, 2, 2)), jnp.bfloat16)
    xhi = jnp.asarray(rng.normal(size=(b, 2 * h, 2 * w, C)), jnp.bfloat16)
    pred_k = jnp.asarray(rng.normal(size=(C, 1)) * 0.05, jnp.bfloat16)

    timeit = make_timer(args.iters)

    timeit("core phase conv", lambda xx, kk, bb: sp.phase_conv2x_core(
        xx, kk, bb).reshape(b, -1), x, k, kb)
    timeit("ring strips", lambda xx, kk, bb: jnp.concatenate(
        [s.reshape(b, -1) for s in sp.ring_strips(xx, kk, bb)], 1), x, k, kb)
    timeit("gn stats (corrected)", lambda pp, *ss: jnp.concatenate(
        sp.gn_phase_stats(pp, ss, 8), 1), ph, *strips)
    timeit("gn apply (big)", lambda pp: sp.gn_phase_apply(
        pp, jnp.ones((b, 8), jnp.float32), jnp.ones((b, 8), jnp.float32),
        scale, bias).reshape(b, -1), ph)
    timeit("group_norm_phase (1-call)", lambda pp: sp.group_norm_phase(
        pp, scale, bias, 8).reshape(b, -1), ph)
    timeit("group_norm spatial (ref)", lambda xx: group_norm(
        xx, scale, bias, 8).reshape(b, -1), xhi)
    timeit("pred 1x1 on phase view", lambda pp, pk: (
        pp.reshape(b, h, 4 * w, C) @ pk).reshape(b, -1), ph, pred_k)
    timeit("pred 1x1 spatial (ref)", lambda xx, pk: (
        xx @ pk).reshape(b, -1), xhi, pred_k)
    timeit("upsample2x_phase", lambda zz: sp.upsample2x_phase(
        zz).reshape(b, -1), zsmall)
    timeit("upsample2x spatial (ref)", lambda xx: upsample2x_bilinear(
        xx[..., :1]).reshape(b, -1), xhi)
    timeit("scatter_ring (small)", lambda zz: sp.scatter_ring(
        zz, zz[:, 0].transpose(0, 2, 1, 3).reshape(b, 2, 2 * w),
        zz[:, -1].transpose(0, 2, 1, 3).reshape(b, 2, 2 * w),
        zz[:, :, 0].reshape(b, 2 * h, 2),
        zz[:, :, -1].reshape(b, 2 * h, 2)).reshape(b, -1), zsmall)


if __name__ == "__main__":
    main()

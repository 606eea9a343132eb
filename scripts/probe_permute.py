"""A/B probe: token permutation (MAE shuffle/unshuffle) as
take_along_axis (backward = scatter-add) vs one-hot permutation matmul
(backward = the transposed matmul, pure MXU).

Shapes: the MAE decode unshuffle [B, 576, 512] and encode keep-gather
[B, 576->288, 768] at batch 16. Chained-scan + floor subtraction
(see scripts/probe_gather.py).

  python scripts/probe_permute.py [--iters 30] [--batch 16]
"""

import argparse
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", default=30, type=int)
    p.add_argument("--cycles", default=5, type=int)
    p.add_argument("--batch", default=16, type=int)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B, L, C = args.batch, 576, 512
    K = 288
    ITERS = args.iters
    print(f"device={jax.devices()[0]} B={B} L={L} C={C} iters={ITERS}",
          flush=True)

    rng = np.random.default_rng(0)
    ids_full = jnp.asarray(
        np.stack([rng.permutation(L) for _ in range(B)]).astype(np.int32)
    )
    ids_keep = ids_full[:, :K]
    x_full = jnp.asarray(rng.normal(size=(B, L, C)).astype(np.float32))

    def g_full_take(x, ids):
        return jnp.take_along_axis(x, ids[:, :, None], axis=1)

    def g_full_onehot(x, ids):
        oh = (ids[:, :, None] == jnp.arange(L)[None, None, :]).astype(x.dtype)
        return jnp.einsum("bls,bsc->blc", oh, x)

    def g_keep_take(x, ids):
        return jnp.take_along_axis(x, ids[:, :, None], axis=1)

    def g_keep_onehot(x, ids):
        oh = (ids[:, :, None] == jnp.arange(L)[None, None, :]).astype(x.dtype)
        return jnp.einsum("bks,bsc->bkc", oh, x)

    # correctness (HIGHEST precision: the 0/1 matmul is then an exact
    # permutation; the timed variants use the default precision, which
    # is what bf16 activations see in the real model)
    with jax.default_matmul_precision("highest"):
        a = g_full_take(x_full, ids_full)
        b_ = jax.jit(g_full_onehot)(x_full, ids_full)
        assert float(jnp.max(jnp.abs(a - b_))) == 0.0
        a = g_keep_take(x_full, ids_keep)
        b_ = jax.jit(g_keep_onehot)(x_full, ids_keep)
        assert float(jnp.max(jnp.abs(a - b_))) == 0.0
    print("correctness ok", flush=True)

    def make_chain(fn, ids):
        def loop(x0, x, ids):
            def body(c, _):
                def f(xx):
                    return jnp.sum(jnp.square(fn(xx + c * 1e-12, ids)))

                l, g = jax.value_and_grad(f)(x)
                return l * 1e-12 + jnp.sum(g) * 1e-15, None

            return lax.scan(body, x0, None, length=ITERS)[0]

        return jax.jit(loop).lower(
            jnp.float32(0.0), x_full, ids
        ).compile()

    def empty_chain():
        def loop(x0):
            def body(c, _):
                return jnp.tanh(c) * 0.5, None

            return lax.scan(body, x0, None, length=ITERS)[0]

        return jax.jit(loop).lower(jnp.float32(0.0)).compile()

    variants = {
        "unshuffle_take_vjp": (make_chain(g_full_take, ids_full), ids_full),
        "unshuffle_onehot_vjp": (make_chain(g_full_onehot, ids_full), ids_full),
        "keep_take_vjp": (make_chain(g_keep_take, ids_keep), ids_keep),
        "keep_onehot_vjp": (make_chain(g_keep_onehot, ids_keep), ids_keep),
    }
    efn = empty_chain()
    float(efn(jnp.float32(0.0)))
    for fn, ids in variants.values():
        float(fn(jnp.float32(0.0), x_full, ids))

    best = {k: 1e9 for k in variants}
    floor_best = 1e9
    for _ in range(args.cycles):
        t0 = time.perf_counter()
        float(efn(jnp.float32(0.0)))
        floor_best = min(floor_best, time.perf_counter() - t0)
        for k, (fn, ids) in variants.items():
            t0 = time.perf_counter()
            float(fn(jnp.float32(0.0), x_full, ids))
            best[k] = min(best[k], time.perf_counter() - t0)
    print(f"floor {floor_best * 1e3:.1f} ms", flush=True)
    for k, v in best.items():
        ms = max(v - floor_best, 0.0) / ITERS * 1e3
        print(f"{k:<22s} {ms:8.3f} ms/iter (B={B})", flush=True)


if __name__ == "__main__":
    main()

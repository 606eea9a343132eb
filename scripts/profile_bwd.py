"""Backward-pass attribution for the counting-model fine-tune step.

profile_train.py showed fwd 12 ms vs fwd+bwd 36 ms at batch 8 — this
script decomposes the extra ~24 ms across stages by timing
value_and_grad of each submodule in isolation at the real shapes
(frozen-encoder fim6, bf16 fast mode):

  - density head [8, 24, 24, 512] -> map  (vag wrt params + input)
  - interaction decoder (decode_tokens minus head is not separable
    without model surgery, so we time decode_tokens whole and head
    alone; decoder = difference)
  - encoder fwd only (stop_gradient: its backward must be DCE'd; a
    vag of the FULL model should cost fwd_enc + vag_decoder+head)

Chained-scan + floor-subtraction methodology (scripts/profile_train.py).

  python scripts/profile_bwd.py [--batch 8] [--iters 20]
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
    p.add_argument("--batch", default=8, type=int)
    p.add_argument("--iters", default=20, type=int)
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax

    from countr_tpu.config import COUNTR_PRESETS
    from countr_tpu.models.countr import CounTR
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    b = args.batch
    iters = args.iters
    print(f"device={jax.devices()[0]} batch={b} iters={iters}", flush=True)

    cfg = dataclasses.replace(
        COUNTR_PRESETS["mae_vit_base6_patch16"], dtype=jnp.bfloat16,
        use_pallas_attention=True, approx_gelu=True, subpixel_head=True,
    )
    model = CounTR(cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (b, 384, 384, 3)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, 1, (b, 3, 64, 64, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (b, 384, 384)).astype(np.float32))
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.key(0), imgs[:1], boxes[:1], 3
    )["params"]
    latent0 = jax.jit(
        lambda p, im: model.apply({"params": p}, im, method=CounTR.encode)
    )(params, imgs)
    x24 = jnp.asarray(
        rng.normal(size=(b, 24, 24, 512)).astype(np.float32)
    ).astype(jnp.bfloat16)

    # ---- scaffolding ------------------------------------------------------
    def empty(x):
        def body(c, _):
            return c * jnp.float32(1.0000001), None

        return lax.scan(body, x, None, length=iters)[0]

    erun = jax.jit(empty)
    x0 = jnp.float32(1.0)
    float(erun(x0))

    def measure_floor():
        fl = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(erun(x0))
            fl = min(fl, time.perf_counter() - t0)
        return fl

    def timed(run, *a, reps=4):
        for attempt in range(3):
            try:
                r = run(*a)
                _ = float(np.asarray(r).ravel()[0])
                break
            except Exception as e:
                if attempt == 2:
                    raise
                print(f"  (retry: {type(e).__name__})", flush=True)
                time.sleep(5)
        best, floor = 1e9, 1e9
        for _ in range(reps):
            floor = min(floor, measure_floor())
            t0 = time.perf_counter()
            r = run(*a)
            _ = float(np.asarray(r).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        return max(best - floor, 0.0) / iters

    results = {}

    def seg(name, f, *a):
        def looped(*a):
            def body(c, _):
                out = f(c, *a)
                return jnp.float32(out.ravel()[0]) * 1e-12, None

            return lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

        dt = timed(jax.jit(looped), *a)
        results[name] = dt
        print(f"{name:<46s} {dt * 1e3:8.2f} ms/iter", flush=True)
        return dt

    def grads_sum(g):
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

    # ---- segments ---------------------------------------------------------
    def f_head_fwd(c, p, x):
        out = model.apply(
            {"params": p}, x + (c * 1e-12).astype(x.dtype),
            method=lambda m, xx: m.density_head(xx),
        )
        return out

    seg("head fwd", f_head_fwd, params, x24)

    def f_head_vag(c, p, x):
        def loss(pp, xx):
            out = model.apply(
                {"params": pp}, xx,
                method=lambda m, q: m.density_head(q),
            )
            return jnp.mean(jnp.square(out.astype(jnp.float32)))

        l, g = jax.value_and_grad(loss, argnums=(0, 1))(
            p, x + (c * 1e-12).astype(x.dtype)
        )
        return l[None] + grads_sum(g) * 1e-20

    seg("head fwd+bwd (params+input)", f_head_vag, params, x24)

    def f_dec_fwd(c, p, latent, boxes):
        out = model.apply(
            {"params": p}, latent + (c * 1e-12).astype(latent.dtype),
            boxes, 3, method=CounTR.decode,
        )
        return out

    seg("decoder+head fwd (decode)", f_dec_fwd, params, latent0, boxes)

    def f_dec_vag(c, p, latent, boxes):
        def loss(pp):
            out = model.apply(
                {"params": pp}, latent + (c * 1e-12).astype(latent.dtype),
                boxes, 3, method=CounTR.decode,
            )
            return jnp.mean(jnp.square(out - gt))

        l, g = jax.value_and_grad(loss)(p)
        return l[None] + grads_sum(g) * 1e-20

    seg("decoder+head fwd+bwd", f_dec_vag, params, latent0, boxes)

    def f_enc_fwd(c, p, imgs):
        return model.apply(
            {"params": p}, imgs + c * 1e-12, method=CounTR.encode
        )

    seg("encoder fwd", f_enc_fwd, params, imgs)

    def f_full_fwd(c, p, imgs, boxes):
        return model.apply({"params": p}, imgs + c * 1e-12, boxes, 3)

    seg("FULL fwd", f_full_fwd, params, imgs, boxes)

    def f_full_vag(c, p, imgs, boxes):
        def loss(pp):
            out = model.apply({"params": pp}, imgs + c * 1e-12, boxes, 3)
            return jnp.mean(jnp.square(out - gt))

        l, g = jax.value_and_grad(loss)(p)
        return l[None] + grads_sum(g) * 1e-20

    seg("FULL fwd+bwd (frozen encoder)", f_full_vag, params, imgs, boxes)

    print("---", flush=True)
    hf, hv = results["head fwd"], results["head fwd+bwd (params+input)"]
    df, dv = results["decoder+head fwd (decode)"], results["decoder+head fwd+bwd"]
    ef = results["encoder fwd"]
    ff, fv = results["FULL fwd"], results["FULL fwd+bwd (frozen encoder)"]
    print(f"head bwd ~ {1e3 * (hv - hf):.2f} ms; decoder-only bwd ~ "
          f"{1e3 * ((dv - df) - (hv - hf)):.2f} ms", flush=True)
    print(f"stop_gradient DCE check: full vag {1e3 * fv:.2f} vs "
          f"enc_fwd + dec vag = {1e3 * (ef + dv):.2f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Per-segment device-time attribution of the window forward.

Times each piece of the flagship counting forward (encoder, decoder
blocks, density head, head sub-stages, attention variants) on the
attached device. Methodology: each segment runs K iterations inside a
single jitted lax.scan whose carry feeds back into the input (so XLA
cannot hoist the body), with ONE scalar fetched at the end — robust to
the tunnel's ~42 ms RTT and axon's unreliable block_until_ready.

  python scripts/profile_forward.py [--batch 32] [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_timer(iters, reps=3):
    import jax
    import jax.numpy as jnp
    from jax import lax

    # Per-call dispatch+fetch floor over the tunnel (~10-40 ms,
    # session-dependent): measured once with an empty chain of the same
    # scan structure and subtracted from every wall time below.
    # Without this, floor/iters inflates each per-iter number by
    # ~0.5-2 ms — dominant for sub-ms segments (see docs/PROFILE.md
    # "Isolated-op rates" for the full methodology post-mortem).
    def empty(x):
        def body(c, _):
            return c * jnp.bfloat16(1.0000001), None

        return lax.scan(body, x, None, length=iters)[0]

    erun = jax.jit(empty)
    x0 = jnp.bfloat16(1.0)
    float(erun(x0))
    floor = 1e9
    for _ in range(reps + 2):
        t0 = time.perf_counter()
        float(erun(x0))
        floor = min(floor, time.perf_counter() - t0)
    print(f"per-call dispatch floor: {floor * 1e3:.1f} ms", flush=True)

    def timeit(name, f, *args):
        """f(*args) -> array. Returns seconds/iter of device time
        (floor-subtracted, best of ``reps`` calls).

        All operands (incl. params pytrees inside f's closure are NOT
        allowed — pass them via *args) are jit arguments, so nothing
        ships as compile-request constants (tunnel 413 limit).
        """

        def looped(*a):
            def body(c, _):
                # Perturb the first arg by the carry so every iteration
                # depends on the previous one (no hoisting / DCE; the
                # model segments are nonlinear, so the perturbed body
                # cannot be algebraically split into a hoistable part).
                a0 = a[0] + (c * 1e-12).astype(a[0].dtype) if hasattr(a[0], "dtype") else a[0]
                out = f(a0, *a[1:])
                return jnp.float32(out.ravel()[0]) * 1e-12, None

            return lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

        run = jax.jit(looped)
        r = run(*args)
        _ = float(r)  # compile + warmup, true sync
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            r = run(*args)
            _ = float(r)
            best = min(best, time.perf_counter() - t0)
        dt = max(best - floor, 0.0) / iters
        print(f"{name:<44s} {dt * 1e3:8.3f} ms/iter", flush=True)
        return dt

    return timeit


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=32, type=int)
    p.add_argument("--iters", default=50, type=int)
    p.add_argument("--fp32", action="store_true")
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from countr_tpu.config import COUNTR_PRESETS
    from countr_tpu.models.countr import CounTR, DensityHead
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    b = args.batch
    print(f"device={jax.devices()[0]} batch={b} dtype={dtype.__name__}", flush=True)

    cfg = dataclasses.replace(
        COUNTR_PRESETS["mae_vit_base6_patch16"], dtype=dtype,
        use_pallas_attention=False,
    )
    model = CounTR(cfg)
    cfg_pl = dataclasses.replace(cfg, use_pallas_attention=True, approx_gelu=True)
    model_pl = CounTR(cfg_pl)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (b, 384, 384, 3)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (1, 3, 64, 64, 3)), jnp.float32)
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.key(0), imgs[:1], boxes, 3
    )

    # Precompute intermediates for segment inputs.
    y = jax.jit(
        lambda p, bx: model.apply(p, bx, 3, method=CounTR.encode_exemplars),
        static_argnums=(),
    )(params, jnp.broadcast_to(boxes, (b, 3, 64, 64, 3)))
    latent = jax.jit(lambda p, im: model.apply(p, im, method=CounTR.encode))(
        params, imgs
    )
    g = cfg.grid_size
    tokens = jnp.asarray(
        rng.uniform(-1, 1, (b, g, g, cfg.decoder_embed_dim)), dtype
    )

    timeit = make_timer(args.iters)

    t_full = timeit(
        "full forward_tokens",
        lambda im, p, yy: model.apply(p, im, yy, method=CounTR.forward_tokens),
        imgs, params, y,
    )
    t_fast = timeit(
        "full forward_tokens (pallas+approx_gelu)",
        lambda im, p, yy: model_pl.apply(p, im, yy, method=CounTR.forward_tokens),
        imgs, params, y,
    )
    t_enc = timeit(
        "encoder (12 blocks, XLA attn)",
        lambda im, p: model.apply(p, im, method=CounTR.encode),
        imgs, params,
    )
    timeit(
        "encoder (12 blocks, Pallas+approx gelu)",
        lambda im, p: model_pl.apply(p, im, method=CounTR.encode),
        imgs, params,
    )
    t_dec = timeit(
        "decoder+head (decode_tokens)",
        lambda lt, p, yy: model.apply(p, lt, yy, method=CounTR.decode_tokens),
        latent, params, y,
    )
    timeit(
        "decoder+head (pallas+approx gelu)",
        lambda lt, p, yy: model_pl.apply(p, lt, yy, method=CounTR.decode_tokens),
        latent, params, y,
    )
    head = DensityHead(cfg.dtype)
    hp = {"params": params["params"]["density_head"]}
    t_head = timeit(
        "density head (4 stages + pred)", lambda x, p: head.apply(p, x), tokens, hp
    )

    # Head sub-stages: truncated variants attribute time per stage.
    import flax.linen as nn
    from countr_tpu.ops.norms import group_norm
    from countr_tpu.ops.upsample import upsample2x_bilinear

    class HeadPrefix(nn.Module):
        n_stages: int
        dtype: jnp.dtype
        with_gn: bool = True
        with_up: bool = True

        @nn.compact
        def __call__(self, x):
            from countr_tpu.models.init import conv_bias_init, torch_conv_kernel
            from countr_tpu.ops.attention import matmul_precision

            prec = matmul_precision(self.dtype)
            for idx in range(self.n_stages):
                x = nn.Conv(
                    256, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, precision=prec,
                    kernel_init=torch_conv_kernel,
                    bias_init=conv_bias_init(9 * x.shape[-1]), name=f"conv{idx}",
                )(x)
                if self.with_gn:
                    s = self.param(f"gn{idx}_scale", nn.initializers.ones, (256,), jnp.float32)
                    bb = self.param(f"gn{idx}_bias", nn.initializers.zeros, (256,), jnp.float32)
                    x = group_norm(x, s, bb, num_groups=8)
                x = nn.relu(x)
                if self.with_up and idx < 3:
                    x = upsample2x_bilinear(x)
            return x

    for n in (1, 2, 3, 4):
        m = HeadPrefix(n, cfg.dtype)
        pp = jax.jit(m.init)(jax.random.key(0), tokens)
        timeit(f"head stages 0..{n - 1}", lambda x, p, m=m: m.apply(p, x), tokens, pp)
    m = HeadPrefix(4, cfg.dtype, with_gn=False)
    pp = jax.jit(m.init)(jax.random.key(0), tokens)
    timeit("head 4 stages, NO groupnorm", lambda x, p: m.apply(p, x), tokens, pp)
    m2 = HeadPrefix(4, cfg.dtype, with_up=False)
    pp2 = jax.jit(m2.init)(jax.random.key(0), tokens)
    timeit(
        "head 4 stages, NO upsample (24^2 only)",
        lambda x, p: m2.apply(p, x), tokens, pp2,
    )

    print("---", flush=True)
    print(
        f"attribution: encoder {t_enc / t_full * 100:.0f}%  "
        f"decoder+head {t_dec / t_full * 100:.0f}%  "
        f"(head alone {t_head / t_full * 100:.0f}%)",
        flush=True,
    )
    print(
        f"forward-only windows/sec at batch {b}: "
        f"{b / t_full:.0f} (parity ops) / {b / t_fast:.0f} (fast mode)",
        flush=True,
    )


if __name__ == "__main__":
    main()

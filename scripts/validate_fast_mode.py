"""On-chip numeric parity gate for the bf16 fast mode's fused kernels.

tests/test_pallas_block.py, test_pallas_attn.py and test_subpixel_head.py
pin interpret-mode (CPU) numerics; this script asserts the REAL Mosaic
lowering on the TPU, in two passes per kernel:

  fp32 pass  — fp32 inputs through both lowerings. This CANNOT be an
               exact-logic gate on the chip: Mosaic lowers an fp32
               ``dot_general`` as a single bf16 MXU pass while the XLA
               reference runs Precision.HIGHEST multi-pass
               (ops/attention.py:18), so bf16 operand rounding is the
               structural floor — measured 1.5e-3 normalized even with
               the reference forced to matching DEFAULT precision
               (scripts/probe_fp32_precision.py). Gate: 1e-2 forward /
               2e-2 grads (~2-4x over measured); catches gross logic
               bugs. EXACT fp32 logic parity is pinned by the
               interpret-mode CPU tests (tests/test_pallas_block.py,
               test_pallas_attn.py), and the production fp32 parity
               mode never engages these kernels (config.use_pallas is
               the bf16 fast mode's switch).
  bf16 pass  — the production dtype. The two lowerings round at
               different points (e.g. XLA casts softmax probabilities
               to bf16 AFTER normalizing; the kernel divides AFTER the
               PV dot), so 1-4 bf16 ulp (7.8e-3 each at magnitude 1)
               of normalized deviation is expected and benign. Gate:
               2e-2 forward / 5e-2 grads.

Normalized max deviation = max|got-want| / max|want| — elementwise
atol/rtol is the wrong shape for weight grads, whose elements cross
zero while their magnitude spans decades.

Checks: fused LN, attention fwd/bwd (encoder 12h/64d + decoder 16h/32d
geometries), attention half-block fwd/bwd, cross-attention branch
fwd/bwd, subpixel head, and the full fast forward_tokens vs the
module-path bf16 forward (absolute count deltas reported).

Exit nonzero past tolerance. Measured deviations land in docs/PARITY.md
("fast-mode on-chip parity" table).

  python scripts/validate_fast_mode.py [--batch 8]

reference numerics: models_crossvit.py:69-156, models_mae_cross.py:80-100.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FAILURES = []


def check(name: str, got, want, tol: float) -> float:
    a = np.asarray(got, np.float64)
    b = np.asarray(want, np.float64)
    d = float(np.max(np.abs(a - b)))
    scale = max(float(np.max(np.abs(b))), 1e-30)
    nd = d / scale
    ok = nd <= tol
    print(
        f"  {name:46s} max|d| {d:.3e}  norm {nd:.2e} "
        f"(tol {tol:.0e})  {'OK' if ok else 'FAIL'}",
        flush=True,
    )
    if not ok:
        FAILURES.append(name)
    return nd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", default=8, type=int)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from countr_tpu.models import build_countr
    from countr_tpu.models.countr import CounTR, DensityHead
    from countr_tpu.ops.attention import multi_head_attention
    from countr_tpu.ops.norms import layer_norm as xla_layer_norm
    from countr_tpu.ops.pallas_attn import fused_attention
    from countr_tpu.ops.pallas_block import (
        _unfused_cross_reference, _unfused_reference, fused_attention_block,
        fused_cross_attention_block,
    )
    from countr_tpu.ops.pallas_ln import fused_layer_norm
    from countr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    print(f"device={dev} (platform={dev.platform})", flush=True)
    if dev.platform not in ("tpu", "axon"):
        print(
            "WARNING: not a TPU — the fused wrappers fall back to the XLA "
            "composition off-TPU, so this run does NOT exercise the Mosaic "
            "lowering (CPU coverage lives in tests/)."
        )
    b = args.batch
    rng = np.random.default_rng(0)

    # (dtype tag, jnp dtype, fwd tol, grad tol)
    PASSES = (
        ("fp32", jnp.float32, 1e-2, 2e-2),
        ("bf16", jnp.bfloat16, 2e-2, 5e-2),
    )

    def arr(*shape, scale=1.0, dt=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape) * scale, dt)

    for tag, dt, ftol, gtol in PASSES:
        print(f"\n==== {tag} pass ====", flush=True)

        # ---- LayerNorm ---------------------------------------------------
        print("[ln]")
        x = arr(b, 576, 768, dt=dt)
        s = 1.0 + arr(768, scale=0.05, dt=jnp.float32)
        bb = arr(768, scale=0.05, dt=jnp.float32)
        got = jax.jit(fused_layer_norm)(x, s, bb)
        want = jax.jit(xla_layer_norm)(x, s, bb)
        check(f"fused_layer_norm [{b},576,768] {tag}", got, want, ftol)

        # ---- attention fwd + bwd at both shipped geometries ---------------
        for (c, h, geom) in ((768, 12, "enc 12h/64d"), (512, 16, "dec 16h/32d")):
            print(f"[attn {geom}]")
            q, k, v = (arr(b, 576, c, dt=dt) for _ in range(3))
            got = jax.jit(fused_attention, static_argnums=3)(q, k, v, h)
            want = jax.jit(multi_head_attention, static_argnums=3)(q, k, v, h)
            check(f"fused_attention fwd C={c} {tag}", got, want, ftol)

            g = arr(b, 576, c, dt=dt)

            def loss_f(q, k, v):
                return jnp.sum(
                    fused_attention(q, k, v, h).astype(jnp.float32)
                    * g.astype(jnp.float32)
                )

            def loss_x(q, k, v):
                return jnp.sum(
                    multi_head_attention(q, k, v, h).astype(jnp.float32)
                    * g.astype(jnp.float32)
                )

            gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))(q, k, v)
            gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))(q, k, v)
            for name, a_, b_ in zip("qkv", gf, gx):
                check(f"fused_attention d{name} C={c} {tag}", a_, b_, gtol)

        # ---- fused attention half-block fwd + bwd --------------------------
        for (c, h, geom) in ((768, 12, "encoder"), (512, 16, "decoder")):
            print(f"[block {geom}]")
            x = arr(b, 576, c, dt=dt)
            r32 = lambda *sh: arr(*sh, scale=0.05, dt=jnp.float32)  # noqa: E731
            wts = (1.0 + r32(c), r32(c), r32(c, 3 * c), r32(3 * c),
                   r32(c, c), r32(c))
            got = jax.jit(fused_attention_block, static_argnums=7)(x, *wts, h)
            want = jax.jit(_unfused_reference, static_argnums=(7, 8))(
                x, *wts, h, 1e-6
            )
            check(f"fused_block fwd C={c} {tag}", got, want, ftol)

            g = arr(b, 576, c, dt=dt)

            def loss_f(x, *w):
                return jnp.sum(
                    fused_attention_block(x, *w, h).astype(jnp.float32)
                    * g.astype(jnp.float32)
                )

            def loss_x(x, *w):
                return jnp.sum(
                    _unfused_reference(x, *w, h, 1e-6).astype(jnp.float32)
                    * g.astype(jnp.float32)
                )

            nargs = tuple(range(7))
            gf = jax.jit(jax.grad(loss_f, argnums=nargs))(x, *wts)
            gx = jax.jit(jax.grad(loss_x, argnums=nargs))(x, *wts)
            names = ("dx", "dlns", "dlnb", "dwqkv", "dbqkv", "dwproj",
                     "dbproj")
            for name, a_, b_ in zip(names, gf, gx):
                check(f"fused_block {name} C={c} {tag}", a_, b_, gtol)

        # ---- fused cross-attention branch fwd + bwd (decoder geometry) ----
        print("[cross block decoder]")
        c, h, ny = 512, 16, 4
        x = arr(b, 576, c, dt=dt)
        kk, vv = arr(b, ny, c, dt=dt), arr(b, ny, c, dt=dt)
        r32 = lambda *sh: arr(*sh, scale=0.05, dt=jnp.float32)  # noqa: E731
        cwts = (1.0 + r32(c), r32(c), r32(c, c), r32(c), r32(c, c), r32(c))
        lns, lnb, wq, bq, wp, bp = cwts
        got = jax.jit(fused_cross_attention_block, static_argnums=9)(
            x, lns, lnb, wq, bq, kk, vv, wp, bp, h
        )
        want = jax.jit(_unfused_cross_reference, static_argnums=(9, 10))(
            x, lns, lnb, wq, bq, kk, vv, wp, bp, h, 1e-6
        )
        check(f"fused_cross fwd C={c} {tag}", got, want, ftol)

        g = arr(b, 576, c, dt=dt)

        def closs_f(*a):
            return jnp.sum(
                fused_cross_attention_block(*a, h).astype(jnp.float32)
                * g.astype(jnp.float32)
            )

        def closs_x(*a):
            return jnp.sum(
                _unfused_cross_reference(*a, h, 1e-6).astype(jnp.float32)
                * g.astype(jnp.float32)
            )

        cargs = (x, lns, lnb, wq, bq, kk, vv, wp, bp)
        gf = jax.jit(jax.grad(closs_f, argnums=tuple(range(9))))(*cargs)
        gx = jax.jit(jax.grad(closs_x, argnums=tuple(range(9))))(*cargs)
        cnames = ("dx", "dlns", "dlnb", "dwq", "dbq", "dk", "dv", "dwp",
                  "dbp")
        for name, a_, b_ in zip(cnames, gf, gx):
            check(f"fused_cross {name} C={c} {tag}", a_, b_, gtol)

    # ---- subpixel head vs reference formulation (bf16 production) --------
    print("\n[subpixel head]")
    tok = arr(b, 24, 24, 512, scale=0.5)
    head_ref = DensityHead(dtype=jnp.bfloat16, subpixel=False)
    head_fus = DensityHead(dtype=jnp.bfloat16, subpixel=True)
    hp = head_ref.init(jax.random.key(1), tok)
    got = jax.jit(head_fus.apply)(hp, tok)
    want = jax.jit(head_ref.apply)(hp, tok)
    check("DensityHead subpixel bf16", got, want, 5e-2)

    # ---- full fast-mode model vs module-path bf16 -------------------------
    print("[model]")
    fast = build_countr(
        "mae_vit_base6_patch16", dtype=jnp.bfloat16,
        use_pallas_attention=True, approx_gelu=True, subpixel_head=True,
    )
    slow = build_countr(
        "mae_vit_base6_patch16", dtype=jnp.bfloat16,
        use_pallas_attention=False, approx_gelu=True, subpixel_head=False,
    )
    imgs = jnp.asarray(rng.uniform(0, 1, (b, 384, 384, 3)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (b, 3, 64, 64, 3)), jnp.float32)
    params = jax.jit(fast.init, static_argnums=(3,))(
        jax.random.key(0), imgs[:1], boxes[:1], 3
    )

    def fwd(model):
        def f(p, imgs, boxes):
            y = model.apply(p, boxes, 3, method=CounTR.encode_exemplars)
            return model.apply(p, imgs, y, method=CounTR.forward_tokens)

        return jax.jit(f)

    dg = np.asarray(fwd(fast)(params, imgs, boxes), np.float64)
    dw = np.asarray(fwd(slow)(params, imgs, boxes), np.float64)
    check("forward_tokens density map bf16", dg, dw, 5e-2)
    cg, cw = dg.sum(axis=(1, 2)) / 60.0, dw.sum(axis=(1, 2)) / 60.0
    rel = np.max(np.abs(cg - cw) / np.maximum(np.abs(cw), 1.0))
    print(
        f"  per-image count deltas: max abs {np.max(np.abs(cg - cw)):.4f} "
        f"on counts ~{np.mean(np.abs(cw)):.1f} (max rel {rel:.2e})"
    )
    if rel > 2e-2:
        FAILURES.append("predicted counts rel > 2e-2")
        print("  predicted counts FAIL")

    print(
        f"\n{'FAIL: ' + ', '.join(FAILURES) if FAILURES else 'ALL OK'}",
        flush=True,
    )
    return 1 if FAILURES else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""On-chip numeric parity gate for the bf16 fast mode's fused kernels.

tests/test_pallas_block.py, test_pallas_attn.py and test_subpixel_head.py
pin interpret-mode (CPU) numerics; this script asserts the REAL Mosaic
lowering on the TPU: each fused kernel runs against its numerically-
equivalent XLA composition on fixed inputs, and the process exits
nonzero if any max delta exceeds its tolerance. Measured deltas are
recorded in docs/PARITY.md ("fast-mode on-chip parity" table).

  python scripts/validate_fast_mode.py [--batch 8]

Checks (bf16 activations, fp32 params — the production fast mode):
  ln              fused_layer_norm              vs fp32-stats XLA LN
  attn fwd / bwd  fused_attention (+custom VJP) vs XLA multi_head_attention
  block fwd / bwd fused_attention_block (+VJP)  vs unfused XLA composition
  subpixel head   DensityHead(subpixel=True)    vs reference formulation
  model           full fast forward_tokens      vs module-path bf16 forward

Both geometries that ship are exercised: encoder (576 tokens, C=768,
12 heads) and decoder (C=512, 16 heads). The model-level check isolates
the fused-block + subpixel deltas (the module path's LayerNorm still
rides the Pallas LN kernel in bf16 — by design, models/vit.py:101).

Tolerances are the interpret-mode test tolerances (bf16 rounding scale)
— the Mosaic lowering must not be looser than interpret mode.
reference numerics: models_crossvit.py:69-156, models_mae_cross.py:80-100.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FAILURES = []


def check(name: str, got, want, atol: float, rtol: float) -> None:
    a = np.asarray(got, np.float64)
    b = np.asarray(want, np.float64)
    d = np.abs(a - b)
    bound = atol + rtol * np.abs(b)
    worst = float(np.max(d - bound))
    ok = worst <= 0.0
    print(
        f"  {name:44s} max|d| {float(np.max(d)):.3e}  "
        f"atol {atol:.0e} rtol {rtol:.0e}  {'OK' if ok else 'FAIL'}",
        flush=True,
    )
    if not ok:
        FAILURES.append(name)


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
        _unfused_reference, fused_attention_block,
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

    def arr(*shape, scale=1.0, dt=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape) * scale, dt)

    # ---- LayerNorm ------------------------------------------------------
    print("[ln]")
    x = arr(b, 576, 768)
    s = 1.0 + arr(768, scale=0.05, dt=jnp.float32)
    bb = arr(768, scale=0.05, dt=jnp.float32)
    got = jax.jit(fused_layer_norm)(x, s, bb)
    want = jax.jit(xla_layer_norm)(x, s, bb)
    check("fused_layer_norm [8,576,768]", got, want, 2e-2, 1e-2)

    # ---- attention fwd + bwd at both shipped geometries ------------------
    for (c, h, tag) in ((768, 12, "encoder 12h/64d"), (512, 16, "decoder 16h/32d")):
        print(f"[attn {tag}]")
        q, k, v = arr(b, 576, c), arr(b, 576, c), arr(b, 576, c)
        got = jax.jit(fused_attention, static_argnums=3)(q, k, v, h)
        want = jax.jit(multi_head_attention, static_argnums=3)(q, k, v, h)
        check(f"fused_attention fwd C={c}", got, want, 2e-5, 1e-2)

        g = arr(b, 576, c)

        def loss_f(q, k, v):
            return jnp.sum(fused_attention(q, k, v, h) * g.astype(jnp.float32))

        def loss_x(q, k, v):
            return jnp.sum(
                multi_head_attention(q, k, v, h) * g.astype(jnp.float32)
            )

        gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))(q, k, v)
        gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))(q, k, v)
        for name, a_, b_ in zip("qkv", gf, gx):
            check(f"fused_attention d{name} C={c}", a_, b_, 5e-4, 2e-2)

    # ---- fused attention half-block fwd + bwd ----------------------------
    for (c, h, tag) in ((768, 12, "encoder"), (512, 16, "decoder")):
        print(f"[block {tag}]")
        x = arr(b, 576, c)
        r32 = lambda *sh: arr(*sh, scale=0.05, dt=jnp.float32)  # noqa: E731
        lns, lnb = 1.0 + r32(c), r32(c)
        wqkv, bqkv = r32(c, 3 * c), r32(3 * c)
        wproj, bproj = r32(c, c), r32(c)
        wts = (lns, lnb, wqkv, bqkv, wproj, bproj)
        got = jax.jit(fused_attention_block, static_argnums=7)(x, *wts, h)
        want = jax.jit(_unfused_reference, static_argnums=(7, 8))(
            x, *wts, h, 1e-6
        )
        check(f"fused_block fwd C={c}", got, want, 5e-2, 2e-2)

        g = arr(b, 576, c)

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
        names = ("dx", "dlns", "dlnb", "dwqkv", "dbqkv", "dwproj", "dbproj")
        for name, a_, b_ in zip(names, gf, gx):
            check(f"fused_block {name} C={c}", a_, b_, 2e-2, 5e-2)

    # ---- subpixel head vs reference formulation --------------------------
    print("[subpixel head]")
    tok = arr(b, 24, 24, 512, scale=0.5)
    head_ref = DensityHead(dtype=jnp.bfloat16, subpixel=False)
    head_fus = DensityHead(dtype=jnp.bfloat16, subpixel=True)
    hp = head_ref.init(jax.random.key(1), tok)
    got = jax.jit(head_fus.apply)(hp, tok)
    want = jax.jit(head_ref.apply)(hp, tok)
    check("DensityHead subpixel [8,24,24,512]", got, want, 5e-2, 5e-2)

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
    check("forward_tokens density map", dg, dw, 8e-2, 5e-2)
    cg, cw = dg.sum(axis=(1, 2)) / 60.0, dw.sum(axis=(1, 2)) / 60.0
    print(
        f"  per-image count deltas: max {np.max(np.abs(cg - cw)):.4f} "
        f"(counts ~{np.mean(np.abs(cw)):.1f})"
    )
    check("predicted counts", cg, cw, 5e-2, 2e-2)

    print(
        f"\n{'FAIL: ' + ', '.join(FAILURES) if FAILURES else 'ALL OK'}",
        flush=True,
    )
    return 1 if FAILURES else 0


if __name__ == "__main__":
    raise SystemExit(main())

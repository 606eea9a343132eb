"""Fused attention half-block kernel (ops/pallas_block.py) vs the
module composition it replaces — forward, grads, param-tree identity,
and the in-model Block/CrossAttentionBlock wiring (interpret mode on
the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from countr_tpu.ops.pallas_block import (
    _unfused_mlp_reference, _unfused_reference, fused_attention_block,
    fused_mlp_block,
)


def _params(rng, c):
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    return dict(
        lns=1.0 + r(c), lnb=r(c), wqkv=r(c, 3 * c), bqkv=r(3 * c),
        wproj=r(c, c), bproj=r(c),
    )


@pytest.mark.parametrize("b,n,c,h", [(2, 128, 64, 4), (1, 192, 512, 16)])
def test_fused_block_matches_composition(rng, b, n, c, h):
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    p = _params(rng, c)
    want = np.asarray(
        _unfused_reference(
            x, p["lns"], p["lnb"], p["wqkv"], p["bqkv"], p["wproj"],
            p["bproj"], h, 1e-6,
        )
    )
    got = np.asarray(
        fused_attention_block(
            x, p["lns"], p["lnb"], p["wqkv"], p["bqkv"], p["wproj"],
            p["bproj"], h, eps=1e-6, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_fused_block_grads_match(rng):
    b, n, c, h = 2, 64, 64, 4
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    p = _params(rng, c)
    w = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    names = ("x", "lns", "lnb", "wqkv", "bqkv", "wproj", "bproj")

    def loss(fn, *args):
        return jnp.sum(fn(*args) * w)

    args = (x, p["lns"], p["lnb"], p["wqkv"], p["bqkv"], p["wproj"],
            p["bproj"])
    want = jax.grad(
        lambda *a: loss(lambda *aa: _unfused_reference(*aa, h, 1e-6), *a),
        argnums=tuple(range(7)),
    )(*args)
    got = jax.grad(
        lambda *a: loss(
            lambda *aa: fused_attention_block(
                *aa, h, eps=1e-6, interpret=True
            ),
            *a,
        ),
        argnums=tuple(range(7)),
    )(*args)
    for g, wnt, name in zip(got, want, names):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), atol=1e-3, rtol=2e-3,
            err_msg=f"d{name} mismatch",
        )


@pytest.mark.parametrize("approx", [True, False])
def test_fused_mlp_matches_composition(rng, approx):
    b, n, c, hid = 2, 128, 64, 256
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    args = (x, 1.0 + r(c), r(c), r(c, hid), r(hid), r(hid, c), r(c))
    want = np.asarray(_unfused_mlp_reference(*args, 1e-6, approx))
    got = np.asarray(
        fused_mlp_block(*args, eps=1e-6, approx_gelu=approx, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_fused_mlp_grads_match(rng):
    b, n, c, hid = 2, 64, 64, 128
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    args = (x, 1.0 + r(c), r(c), r(c, hid), r(hid), r(hid, c), r(c))
    w = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    want = jax.grad(
        lambda *a: jnp.sum(_unfused_mlp_reference(*a, 1e-6, True) * w),
        argnums=tuple(range(7)),
    )(*args)
    got = jax.grad(
        lambda *a: jnp.sum(
            fused_mlp_block(*a, eps=1e-6, approx_gelu=True, interpret=True)
            * w
        ),
        argnums=tuple(range(7)),
    )(*args)
    for g, wnt, name in zip(
        got, want, ("x", "lns", "lnb", "w1", "b1", "w2", "b2")
    ):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), atol=1e-3, rtol=2e-3,
            err_msg=f"d{name} mismatch",
        )


def test_block_param_tree_identical_and_forward_close(rng):
    """Block(use_pallas=True, bf16) — the fused branch — must create the
    SAME param tree as the module path and compute the same function
    (CPU falls back to the XLA composition, so this checks the wiring
    end-to-end at bf16 tolerance)."""
    from countr_tpu.models.vit import Block

    x = jnp.asarray(rng.standard_normal((2, 64, 64)), jnp.bfloat16)
    mod = Block(4, dtype=jnp.bfloat16, use_pallas=False)
    fus = Block(4, dtype=jnp.bfloat16, use_pallas=True, approx_gelu=True)
    pm = mod.init(jax.random.key(0), x)
    pf = fus.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(pm) == jax.tree_util.tree_structure(
        pf
    )
    for (ka, a), (kb, bb) in zip(
        jax.tree_util.tree_leaves_with_path(pm),
        jax.tree_util.tree_leaves_with_path(pf),
    ):
        assert ka == kb and a.shape == bb.shape and a.dtype == bb.dtype
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb))
    want = np.asarray(mod.apply(pm, x), np.float32)
    got = np.asarray(fus.apply(pf, x), np.float32)
    # bf16 path + approx GELU: tolerance at bf16 rounding scale.
    np.testing.assert_allclose(got, want, atol=0.08, rtol=0.05)


def test_cross_block_param_tree_identical(rng):
    from countr_tpu.models.countr import CrossAttentionBlock

    x = jnp.asarray(rng.standard_normal((2, 64, 64)), jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((2, 3, 64)), jnp.bfloat16)
    mod = CrossAttentionBlock(4, dtype=jnp.bfloat16, use_pallas=False)
    fus = CrossAttentionBlock(4, dtype=jnp.bfloat16, use_pallas=True)
    pm = mod.init(jax.random.key(0), x, y)
    pf = fus.init(jax.random.key(0), x, y)
    assert jax.tree_util.tree_structure(pm) == jax.tree_util.tree_structure(
        pf
    )
    for (ka, a), (kb, bb) in zip(
        jax.tree_util.tree_leaves_with_path(pm),
        jax.tree_util.tree_leaves_with_path(pf),
    ):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb))
    want = np.asarray(mod.apply(pm, x, y), np.float32)
    got = np.asarray(fus.apply(pf, x, y), np.float32)
    np.testing.assert_allclose(got, want, atol=0.08, rtol=0.05)


def test_fused_block_bf16_interpret_matches_composition(rng):
    """bf16 operands through the kernel itself (interpret) against the
    bf16 XLA composition — the dtype the TPU fast path actually runs."""
    b, n, c, h = 2, 128, 64, 4
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
    p = _params(rng, c)
    want = np.asarray(
        _unfused_reference(
            x, p["lns"], p["lnb"], p["wqkv"], p["bqkv"], p["wproj"],
            p["bproj"], h, 1e-6,
        ),
        np.float32,
    )
    got = np.asarray(
        fused_attention_block(
            x, p["lns"], p["lnb"], p["wqkv"], p["bqkv"], p["wproj"],
            p["bproj"], h, eps=1e-6, interpret=True,
        ),
        np.float32,
    )
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def _cross_params(rng, c):
    r = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    return (1.0 + r(c), r(c), r(c, c), r(c), r(c, c), r(c))


@pytest.mark.parametrize("b,n,c,h,ny", [(2, 128, 64, 4, 3), (1, 192, 512, 16, 4)])
def test_fused_cross_matches_composition(rng, b, n, c, h, ny):
    from countr_tpu.ops.pallas_block import (
        _unfused_cross_reference, fused_cross_attention_block,
    )

    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, ny, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, ny, c)), jnp.float32)
    lns, lnb, wq, bq, wp, bp = _cross_params(rng, c)
    want = np.asarray(
        _unfused_cross_reference(x, lns, lnb, wq, bq, k, v, wp, bp, h, 1e-6)
    )
    got = np.asarray(
        fused_cross_attention_block(
            x, lns, lnb, wq, bq, k, v, wp, bp, h, eps=1e-6, interpret=True
        )
    )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_fused_cross_grads_match(rng):
    from countr_tpu.ops.pallas_block import (
        _unfused_cross_reference, fused_cross_attention_block,
    )

    b, n, c, h, ny = 2, 64, 64, 4, 3
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, ny, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, ny, c)), jnp.float32)
    lns, lnb, wq, bq, wp, bp = _cross_params(rng, c)
    w = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    args = (x, lns, lnb, wq, bq, k, v, wp, bp)
    names = ("x", "lns", "lnb", "wq", "bq", "k", "v", "wproj", "bproj")
    want = jax.grad(
        lambda *a: jnp.sum(_unfused_cross_reference(*a, h, 1e-6) * w),
        argnums=tuple(range(9)),
    )(*args)
    got = jax.grad(
        lambda *a: jnp.sum(
            fused_cross_attention_block(*a, h, eps=1e-6, interpret=True) * w
        ),
        argnums=tuple(range(9)),
    )(*args)
    for g, wnt, name in zip(got, want, names):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), atol=1e-3, rtol=2e-3,
            err_msg=f"d{name} mismatch",
        )


def test_fused_cross_bf16_interpret_matches_composition(rng):
    from countr_tpu.ops.pallas_block import (
        _unfused_cross_reference, fused_cross_attention_block,
    )

    b, n, c, h, ny = 2, 128, 64, 4, 3
    x = jnp.asarray(rng.standard_normal((b, n, c)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, ny, c)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, ny, c)), jnp.bfloat16)
    lns, lnb, wq, bq, wp, bp = _cross_params(rng, c)
    want = np.asarray(
        _unfused_cross_reference(x, lns, lnb, wq, bq, k, v, wp, bp, h, 1e-6),
        np.float32,
    )
    got = np.asarray(
        fused_cross_attention_block(
            x, lns, lnb, wq, bq, k, v, wp, bp, h, eps=1e-6, interpret=True
        ),
        np.float32,
    )
    np.testing.assert_allclose(got, want, atol=0.05, rtol=0.05)


def test_decoder_fused_override_tree_and_outputs(rng):
    """CounTRConfig.fused_attn_block_decoder overrides ONLY the decoder
    stage: param trees stay identical and the bf16 outputs match the
    all-fused config (the override is a perf knob, never a numerics or
    checkpoint-format change — scripts/ab_decoder_fused.py is the
    measurement it serves)."""
    from countr_tpu.config import CounTRConfig
    from countr_tpu.models.countr import CounTR

    kw = dict(
        img_size=64, patch_size=16, embed_dim=32, depth=1, num_heads=2,
        decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4,
        head_width=32, dtype=jnp.bfloat16, use_pallas_attention=True,
        fused_attn_block=True,
    )
    m_all = CounTR(CounTRConfig(**kw))
    m_dec_off = CounTR(CounTRConfig(**kw, fused_attn_block_decoder=False))
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (2, 3, 64, 64, 3)), jnp.float32)
    pa = m_all.init(jax.random.key(0), imgs, boxes, 2)
    pb = m_dec_off.init(jax.random.key(0), imgs, boxes, 2)
    assert jax.tree_util.tree_structure(pa) == jax.tree_util.tree_structure(pb)
    da = np.asarray(m_all.apply(pa, imgs, boxes, 2), np.float32)
    db = np.asarray(m_dec_off.apply(pa, imgs, boxes, 2), np.float32)
    np.testing.assert_allclose(db, da, atol=0.08, rtol=0.05)

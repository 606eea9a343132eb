"""Fast-mode op equivalence: the bf16 fast path's specialized ops must
match their XLA/parity formulations.

- fused Pallas LayerNorm (interpret mode) == ops.norms.layer_norm
- small-k cross-attention == the transposed multi-head attention
- approx-GELU model stays within bf16-noise of the exact-GELU model
- mixed-precision head (head_dtype=fp32) produces finite, close output
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from countr_tpu.config import CounTRConfig
from countr_tpu.models.countr import CounTR
from countr_tpu.ops.attention import cross_attention_smallk, multi_head_attention
from countr_tpu.ops.norms import layer_norm
from countr_tpu.ops.pallas_ln import fused_layer_norm


def test_fused_layer_norm_matches_xla(rng):
    x = rng.standard_normal((4, 96, 768)).astype(np.float32)
    scale = rng.standard_normal(768).astype(np.float32)
    bias = rng.standard_normal(768).astype(np.float32)
    want = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)))
    got = np.asarray(
        fused_layer_norm(
            jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), interpret=True
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_fused_layer_norm_odd_rows(rng):
    # Row count not divisible by the preferred tile (512) — the tile
    # fallback must still cover every row exactly once.
    x = rng.standard_normal((3, 7, 64)).astype(np.float32)
    s = np.ones(64, np.float32)
    b = np.zeros(64, np.float32)
    want = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b)))
    got = np.asarray(
        fused_layer_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b), interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_fused_layer_norm_grad_matches(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 64)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    g_ref = jax.grad(lambda x, s, b: jnp.sum(layer_norm(x, s, b) ** 2), (0, 1, 2))(
        x, s, b
    )
    g_fused = jax.grad(
        lambda x, s, b: jnp.sum(fused_layer_norm(x, s, b, interpret=True) ** 2),
        (0, 1, 2),
    )(x, s, b)
    for a, w in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("nk", [1, 3])
def test_cross_attention_smallk_matches_mha(rng, nk):
    heads, c = 16, 512
    q = jnp.asarray(rng.standard_normal((2, 576, c)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, nk, c)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, nk, c)).astype(np.float32))
    want = np.asarray(multi_head_attention(q, k, v, heads))
    got = np.asarray(cross_attention_smallk(q, k, v, heads))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def _tiny_cfg(**kw):
    return CounTRConfig(
        img_size=64, patch_size=16, embed_dim=48, depth=1, num_heads=4,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=4,
        head_width=32, **kw
    )


def test_approx_gelu_close_to_exact(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, 1, (1, 3, 64, 64, 3)).astype(np.float32))
    exact = CounTR(_tiny_cfg())
    params = exact.init(jax.random.key(0), imgs, boxes, 3)
    approx = CounTR(_tiny_cfg(approx_gelu=True))
    d_exact = np.asarray(exact.apply(params, imgs, boxes, 3))
    d_approx = np.asarray(approx.apply(params, imgs, boxes, 3))
    # tanh-GELU absolute error is <3.2e-3 per activation; the density
    # output of a 1-block random model stays well within a few percent.
    assert np.all(np.isfinite(d_approx))
    np.testing.assert_allclose(d_approx, d_exact, atol=5e-2)
    assert abs(d_approx.sum() - d_exact.sum()) <= 0.05 * max(abs(d_exact.sum()), 1.0)


def test_mixed_precision_head(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, 1, (1, 3, 64, 64, 3)).astype(np.float32))
    cfg = _tiny_cfg(dtype=jnp.bfloat16, head_dtype=jnp.float32, approx_gelu=True)
    model = CounTR(cfg)
    params = model.init(jax.random.key(0), imgs, boxes, 3)
    # param tree is identical to the plain model's (dtype only affects
    # compute), so checkpoints transfer between modes
    ref = CounTR(_tiny_cfg()).init(jax.random.key(0), imgs, boxes, 3)
    assert jax.tree.structure(params) == jax.tree.structure(ref)
    out = np.asarray(model.apply(params, imgs, boxes, 3))
    assert out.shape == (1, 64, 64) and np.all(np.isfinite(out))


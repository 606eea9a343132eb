"""Pallas fused attention vs the XLA attention core (interpret mode on
the CPU mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from countr_tpu.ops.attention import multi_head_attention
from countr_tpu.ops.pallas_attn import fused_attention


@pytest.mark.parametrize("b,n,c,h", [(2, 576, 768, 12), (1, 128, 64, 4)])
def test_fused_matches_xla(rng, b, n, c, h):
    q = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    want = np.asarray(multi_head_attention(q, k, v, h))
    got = np.asarray(fused_attention(q, k, v, h, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "b,n,c,h",
    [
        (2, 128, 64, 4),     # generic small
        (1, 192, 512, 16),   # decoder geometry: 32-d heads
        (1, 128, 768, 12),   # encoder geometry: 64-d heads
    ],
)
def test_fused_grads_match_xla(rng, b, n, c, h):
    """The Pallas backward kernel (interpret mode) against jax.grad of
    the XLA attention; weighted sum makes the cotangent non-uniform."""
    import jax

    q = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((b, n, c)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(multi_head_attention(q, k, v, h) * w)

    def loss_pallas(q, k, v):
        return jnp.sum(fused_attention(q, k, v, h, interpret=True) * w)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for g, wnt, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), atol=5e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


def test_fused_cpu_fallback(rng):
    """Without forced interpret, CPU platform silently uses XLA."""
    q = jnp.asarray(rng.standard_normal((1, 64, 32)), jnp.float32)
    out = fused_attention(q, q, q, 4)
    want = np.asarray(multi_head_attention(q, q, q, 4))
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-5, rtol=1e-4)

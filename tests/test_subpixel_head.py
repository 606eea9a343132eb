"""The fused subpixel density head is numerically equivalent to the
reference formulation (conv3 on the 2x-upsampled grid) — including the
border ring and gradients — and shares its checkpoint layout.

reference: models_mae_cross.py:80-100, :184-198 (decode_head3 +
F.interpolate 2x); fusion math in ops/subpixel.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from countr_tpu.models.countr import DensityHead
from countr_tpu.ops.subpixel import (
    compose_phase_kernel, group_norm_phase, phase_conv2x, upsample2x_phase,
)
from countr_tpu.ops.norms import group_norm
from countr_tpu.ops.upsample import upsample2x_bilinear


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _conv3x3(x, k, b):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    ) + b


def test_phase_conv2x_matches_up_conv(rng):
    """conv3x3(up2x(x)) == depth-to-space(phase_conv2x(x)) everywhere,
    including the border ring."""
    n, h, w, ci, co = 2, 7, 9, 8, 16
    x = jnp.asarray(rng.standard_normal((n, h, w, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)

    want = _conv3x3(upsample2x_bilinear(x), k, b)
    ph = phase_conv2x(x, k, b, precision=jax.lax.Precision.HIGHEST)
    got = ph.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_group_norm_phase_is_layout_invariant(rng):
    n, h, w, c = 2, 5, 6, 32
    ph = jnp.asarray(rng.standard_normal((n, h, w, 2, 2, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    spatial = ph.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c)
    want = group_norm(spatial, scale, bias, num_groups=8)
    got6 = group_norm_phase(ph, scale, bias, num_groups=8)
    got = got6.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_upsample2x_phase_matches_spatial(rng):
    n, h, w = 2, 6, 5
    z = jnp.asarray(rng.standard_normal((n, h, w, 2, 2)), jnp.float32)
    spatial = z.transpose(0, 1, 3, 2, 4).reshape(n, 2 * h, 2 * w, 1)
    want = upsample2x_bilinear(spatial)[..., 0]
    got = upsample2x_phase(z, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def _heads(rng, subpixel_dtype=jnp.float32):
    ref = DensityHead(dtype=jnp.float32, subpixel=False)
    fused = DensityHead(dtype=subpixel_dtype, subpixel=True)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 24)), jnp.float32)
    params = ref.init(jax.random.key(0), x)
    return ref, fused, x, params


def test_density_head_fused_matches_reference(rng):
    """Whole head, same params: fused output == reference output (the
    param trees are identical, so checkpoints are interchangeable)."""
    ref, fused, x, params = _heads(rng)
    p2 = fused.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    want = ref.apply(params, x)
    got = fused.apply(params, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_density_head_fused_grads_match(rng):
    ref, fused, x, params = _heads(rng)
    w = jnp.asarray(rng.standard_normal(ref.apply(params, x).shape),
                    jnp.float32)

    def loss(mod):
        return lambda p: jnp.sum(mod.apply(p, x) * w)

    g_ref = jax.grad(loss(ref))(params)
    g_fused = jax.grad(loss(fused))(params)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    for (path, gr), (_, gf) in zip(flat_r, flat_f):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4, rtol=1e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_density_head_fused_bf16_close(rng):
    """bf16 fused head stays within the bf16 error budget of the fp32
    reference head (smoke: no layout/indexing blowup in low precision)."""
    ref, fused, x, params = _heads(rng, subpixel_dtype=jnp.bfloat16)
    want = ref.apply(params, x)
    got = fused.apply(params, x)
    assert bool(jnp.all(jnp.isfinite(got)))
    scale = float(jnp.max(jnp.abs(want))) + 1e-6
    assert float(jnp.max(jnp.abs(got.astype(jnp.float32) - want))) / scale < 0.1

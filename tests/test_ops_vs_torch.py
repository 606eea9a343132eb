"""Numerical parity of core ops against torch (CPU) oracles.

torch here is purely a test oracle — the framework itself is
torch-free on the compute path.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from countr_tpu.ops.norms import group_norm, instance_norm, layer_norm
from countr_tpu.ops.upsample import resize_bilinear, upsample2x_bilinear
from countr_tpu.ops.attention import multi_head_attention


def test_layer_norm(rng):
    x = rng.standard_normal((4, 576, 768)).astype(np.float32)
    scale = rng.standard_normal(768).astype(np.float32)
    bias = rng.standard_normal(768).astype(np.float32)
    want = F.layer_norm(
        torch.from_numpy(x), (768,), torch.from_numpy(scale),
        torch.from_numpy(bias), eps=1e-6,
    ).numpy()
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_group_norm(rng):
    # NHWC here, NCHW for torch.
    x = rng.standard_normal((2, 24, 24, 256)).astype(np.float32)
    scale = rng.standard_normal(256).astype(np.float32)
    bias = rng.standard_normal(256).astype(np.float32)
    want = F.group_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 8,
        torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5,
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias), num_groups=8)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_instance_norm(rng):
    x = rng.standard_normal((3, 32, 32, 64)).astype(np.float32)
    want = F.instance_norm(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), eps=1e-5
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(instance_norm(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("hw", [(24, 24), (48, 48), (192, 192), (5, 7)])
def test_upsample2x_matches_torch_align_corners_false(rng, hw):
    h, w = hw
    x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2,
        mode="bilinear", align_corners=False,
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(upsample2x_bilinear(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("src,dst", [((128, 96), (384, 512)), ((64, 64), (384, 384))])
def test_resize_bilinear_matches_torch(rng, src, dst):
    x = rng.standard_normal((1, *src, 3)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=dst,
        mode="bilinear", align_corners=False,
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(resize_bilinear(jnp.asarray(x), *dst))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("nq,nk,heads", [(576, 576, 12), (576, 3, 16), (576, 1, 16)])
def test_attention_vs_torch(rng, nq, nk, heads):
    c = 512 if heads == 16 else 768
    q = rng.standard_normal((2, nq, c)).astype(np.float32)
    k = rng.standard_normal((2, nk, c)).astype(np.float32)
    v = rng.standard_normal((2, nk, c)).astype(np.float32)
    hd = c // heads
    qt = torch.from_numpy(q).reshape(2, nq, heads, hd).permute(0, 2, 1, 3)
    kt = torch.from_numpy(k).reshape(2, nk, heads, hd).permute(0, 2, 1, 3)
    vt = torch.from_numpy(v).reshape(2, nk, heads, hd).permute(0, 2, 1, 3)
    attn = torch.softmax((qt @ kt.transpose(-2, -1)) * hd ** -0.5, dim=-1)
    want = (attn @ vt).permute(0, 2, 1, 3).reshape(2, nq, c).numpy()
    got = np.asarray(
        multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)

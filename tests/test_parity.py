"""End-to-end numerical parity: torch state_dict -> converter -> flax
model, vs the functional torch oracle. This validates both the
converter key/layout mapping and the model numerics, i.e. that released
reference .pth weights will produce matching density maps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from countr_tpu.config import CounTRConfig, MAEConfig
from countr_tpu.engine.checkpoint import (
    convert_countr_state_dict, convert_mae_state_dict,
)
from countr_tpu.models.countr import CounTR
from countr_tpu.models.mae import MaskedAutoencoderViT, patchify
from countr_tpu.ops.posembed import get_2d_sincos_pos_embed

from tests import torch_oracle as oracle

TINY = CounTRConfig(
    img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=4,
    decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4,
)
TINY_MAE = MAEConfig(
    img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=4,
    decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4,
)


@pytest.mark.parametrize("shot_num", [0, 1, 3])
def test_countr_parity_tiny(rng, shot_num):
    sd = oracle.make_countr_state_dict(rng, embed_dim=64, depth=2, dec_dim=32, dec_depth=2)
    imgs = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    boxes = rng.uniform(0, 1, (2, 3, 3, 64, 64)).astype(np.float32)

    want = oracle.countr_forward(sd, imgs, boxes, shot_num, depth=2, dec_depth=2)

    params = convert_countr_state_dict(sd, depth=2, decoder_depth=2)
    model = CounTR(TINY)
    got = np.asarray(
        model.apply(
            params,
            jnp.asarray(imgs.transpose(0, 2, 3, 1)),
            jnp.asarray(boxes.transpose(0, 1, 3, 4, 2)),
            shot_num,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_mae_parity_mask_ratio_zero(rng):
    """With mask_ratio=0 the shuffle/unshuffle is a no-op up to
    permutation equivariance, so the full forward is RNG-independent
    and comparable to an unmasked oracle."""
    sd = oracle.make_mae_state_dict(rng, embed_dim=64, depth=2, dec_dim=32, dec_depth=2)
    imgs = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)

    # Oracle: encoder on all tokens, decoder with identity restore.
    import torch

    x = oracle.F.conv2d(
        torch.from_numpy(imgs), sd["patch_embed.proj.weight"],
        sd["patch_embed.proj.bias"], stride=16,
    ).flatten(2).transpose(1, 2)
    x = x + torch.from_numpy(get_2d_sincos_pos_embed(64, 4))
    for i in range(2):
        x = oracle._block(x, sd, f"blocks.{i}", 4)
    latent = oracle._ln(x, sd, "norm").detach().numpy()
    ids = np.tile(np.arange(16), (2, 1))
    want_pred = oracle.mae_decoder_forward(sd, latent, ids, dec_depth=2, dec_heads=4, grid=4)

    params = convert_mae_state_dict(sd, depth=2, decoder_depth=2)
    model = MaskedAutoencoderViT(TINY_MAE)
    loss, pred, mask = model.apply(
        params, jnp.asarray(imgs.transpose(0, 2, 3, 1)), jax.random.key(3),
        0.0,
    )
    assert float(mask.sum()) == 0.0
    np.testing.assert_allclose(np.asarray(pred), want_pred, atol=2e-5, rtol=1e-4)

    target = np.asarray(patchify(jnp.asarray(imgs.transpose(0, 2, 3, 1)), 16))
    want_loss = np.mean(np.mean((want_pred - target) ** 2, axis=-1))
    np.testing.assert_allclose(float(loss), want_loss, rtol=1e-5)

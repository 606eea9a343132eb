import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from countr_tpu.config import CounTRConfig, MAEConfig
from countr_tpu.models.countr import CounTR
from countr_tpu.models.mae import (
    MaskedAutoencoderViT, patchify, random_masking, unpatchify,
)

TINY = CounTRConfig(
    img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=4,
    decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4,
    head_width=32,
)
TINY_MAE = MAEConfig(
    img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=4,
    decoder_embed_dim=32, decoder_depth=2, decoder_num_heads=4,
)


def _init(model, *args, **kwargs):
    return model.init(jax.random.key(0), *args, **kwargs)


@pytest.mark.parametrize("shot_num", [0, 1, 2, 3])
def test_countr_forward_shapes(shot_num):
    model = CounTR(TINY)
    imgs = jnp.zeros((2, 64, 64, 3))
    boxes = jnp.zeros((2, 3, 64, 64, 3))
    params = _init(model, imgs, boxes, shot_num)
    out = model.apply(params, imgs, boxes, shot_num)
    assert out.shape == (2, 64, 64)
    assert out.dtype == jnp.float32


def test_encoder_frozen():
    """stop_gradient must zero all encoder grads, mirroring the
    reference's torch.no_grad() encoder (models_mae_cross.py:204-205)."""
    model = CounTR(TINY)
    imgs = jnp.ones((1, 64, 64, 3)) * 0.5
    boxes = jnp.ones((1, 3, 64, 64, 3)) * 0.5
    params = _init(model, imgs, boxes, 2)

    def loss_fn(p):
        return jnp.sum(model.apply(p, imgs, boxes, 2) ** 2)

    grads = jax.grad(loss_fn)(params)["params"]
    enc_keys = [k for k in grads if k.startswith("blocks_") or k in ("patch_embed", "norm")]
    dec_keys = [k for k in grads if k.startswith("decoder_") or k in ("density_head", "exemplar_encoder")]
    assert enc_keys and dec_keys
    for k in enc_keys:
        leaves = jax.tree.leaves(grads[k])
        assert all(float(jnp.abs(g).max()) == 0.0 for g in leaves), k
    nonzero = any(
        float(jnp.abs(g).max()) > 0 for k in dec_keys for g in jax.tree.leaves(grads[k])
    )
    assert nonzero


def test_countr_unfrozen_encoder_gets_grads():
    cfg = dataclasses.replace(TINY, freeze_encoder=False)
    model = CounTR(cfg)
    imgs = jnp.ones((1, 64, 64, 3)) * 0.5
    boxes = jnp.ones((1, 3, 64, 64, 3)) * 0.5
    params = _init(model, imgs, boxes, 1)
    grads = jax.grad(lambda p: jnp.sum(model.apply(p, imgs, boxes, 1) ** 2))(params)
    g = grads["params"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert float(jnp.abs(g).max()) > 0


def test_patchify_roundtrip(rng):
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    x = patchify(imgs, 16)
    assert x.shape == (2, 16, 768)
    np.testing.assert_allclose(np.asarray(unpatchify(x, 16)), np.asarray(imgs))


def test_patchify_pixel_order(rng):
    """Pixel order inside a patch must be (ph, pw, c) — the reference's
    'nchpwq->nhwpqc' einsum ordering (models_mae_noct.py:91-93)."""
    imgs = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    x = patchify(imgs, 16)
    # token 1 is the top-right patch; element (ph=2, pw=5, c=1):
    want = imgs[0, 2, 16 + 5, 1]
    got = x[0, 1, (2 * 16 + 5) * 3 + 1]
    assert float(want) == float(got)


def test_random_masking_properties():
    x = jnp.arange(2 * 8 * 4, dtype=jnp.float32).reshape(2, 8, 4)
    xm, mask, ids_restore = random_masking(jax.random.key(1), x, 0.5)
    assert xm.shape == (2, 4, 4)
    np.testing.assert_allclose(np.asarray(mask.sum(axis=1)), [4.0, 4.0])
    # Every kept token must be an actual row of x, and the mask must be
    # 0 exactly at kept positions.
    for b in range(2):
        rows = {tuple(np.asarray(r)) for r in x[b]}
        kept_positions = np.where(np.asarray(mask[b]) == 0)[0]
        for r in np.asarray(xm[b]):
            assert tuple(r) in rows
        kept_rows = {tuple(np.asarray(x[b, p])) for p in kept_positions}
        assert kept_rows == {tuple(r) for r in np.asarray(xm[b])}


def test_mae_forward_and_loss():
    model = MaskedAutoencoderViT(TINY_MAE)
    imgs = jnp.ones((2, 64, 64, 3)) * 0.3
    params = model.init(jax.random.key(0), imgs, jax.random.key(1))
    loss, pred, mask = model.apply(params, imgs, jax.random.key(2))
    assert pred.shape == (2, 16, 768)
    assert mask.shape == (2, 16)
    assert float(loss) > 0
    # all-patch averaging (reference quirk): loss == mean over every patch
    target = patchify(imgs, 16)
    per_patch = np.mean((np.asarray(pred) - np.asarray(target)) ** 2, axis=-1)
    np.testing.assert_allclose(float(loss), per_patch.mean(), rtol=1e-5)


def test_per_stage_dtype_overrides_param_tree_and_accuracy(rng):
    """encoder_dtype/decoder_dtype bisect overrides and the mixed_fast
    head (head fp32, bf16 conv operands) must keep the param tree
    byte-compatible with the fp32 model and stay close to the fp32
    forward (the override changes compute precision, never params)."""
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (1, 3, 64, 64, 3)), jnp.float32)

    base = CounTR(TINY)
    params = _init(base, imgs, boxes, 3)
    ref = np.asarray(base.apply(params, imgs, boxes, 3))

    variants = {
        "enc16": dataclasses.replace(TINY, encoder_dtype=jnp.bfloat16),
        "dec16": dataclasses.replace(TINY, decoder_dtype=jnp.bfloat16),
    }
    for name, cfg in variants.items():
        out = CounTR(cfg).apply(params, imgs, boxes, 3)
        assert out.dtype == jnp.float32
        rel = np.abs(np.asarray(out) - ref).max() / max(np.abs(ref).max(), 1e-6)
        assert rel < 0.1, f"{name} diverged: {rel}"

    # mixed_fast head (fp32 at Precision.HIGH): same param tree, output
    # near-identical to fp32 (CPU executes HIGH as plain fp32; on TPU
    # it is the 3-pass bf16 split, ~2^-18 operand rounding).
    mf = CounTR(dataclasses.replace(TINY, head_precision_high=True))
    shapes = jax.eval_shape(lambda: _init(mf, imgs, boxes, 3))
    want = jax.tree.map(lambda x: (x.shape, str(x.dtype)), params)
    got = jax.tree.map(lambda x: (x.shape, str(x.dtype)), shapes)
    assert want == got
    out = mf.apply(params, imgs, boxes, 3)
    assert out.dtype == jnp.float32
    rel = np.abs(np.asarray(out) - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 1e-3


def test_precision_mode_ladder_on_cpu(rng):
    """Every --dtype mode (bf16 / mixed / mixed_fast, plus the head16
    bisect override) must execute on the CPU backend with shared fp32
    params and stay within a mode-appropriate distance of fp32 — this
    pins the backend-gated upsample accumulate (CPU rejects
    BF16 x BF16 = F32 dots) and the whole mode-building matrix."""
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (1, 3, 64, 64, 3)), jnp.float32)
    base = CounTR(TINY)
    params = _init(base, imgs, boxes, 3)
    ref = float(base.apply(params, imgs, boxes, 3).sum())

    modes = {
        "bf16": dict(dtype=jnp.bfloat16, approx_gelu=True),
        "mixed": dict(dtype=jnp.bfloat16, head_dtype=jnp.float32,
                      approx_gelu=True),
        "mixed_fast": dict(dtype=jnp.bfloat16, head_dtype=jnp.float32,
                           head_precision_high=True, approx_gelu=True),
        "head16": dict(dtype=jnp.float32, head_dtype=jnp.bfloat16),
    }
    for name, ov in modes.items():
        m = CounTR(dataclasses.replace(TINY, **ov))
        s = float(m.apply(params, imgs, boxes, 3).sum())
        rel = abs(s - ref) / max(abs(ref), 1e-6)
        assert np.isfinite(s) and rel < 0.05, f"{name}: rel {rel}"


def test_head_stage_dtype_overrides(rng):
    """head_stage_dtypes: all-None matches the base model bit-for-bit,
    per-stage bf16 keeps the param tree byte-compatible and the output
    bounded, and invalid configs are rejected (config validation)."""
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (1, 3, 64, 64, 3)), jnp.float32)
    base = CounTR(TINY)
    params = _init(base, imgs, boxes, 3)
    ref = np.asarray(base.apply(params, imgs, boxes, 3))

    # all-None stage tuple == base model exactly
    m0 = CounTR(dataclasses.replace(TINY, head_stage_dtypes=(None,) * 5))
    np.testing.assert_array_equal(
        np.asarray(m0.apply(params, imgs, boxes, 3)), ref
    )

    # one bf16 stage at a time: same param tree, bounded deviation
    for k in range(5):
        stages = tuple(jnp.bfloat16 if i == k else None for i in range(5))
        mk = CounTR(dataclasses.replace(TINY, head_stage_dtypes=stages))
        shapes = jax.eval_shape(lambda mk=mk: _init(mk, imgs, boxes, 3))
        want = jax.tree.map(lambda x: (x.shape, str(x.dtype)), params)
        got = jax.tree.map(lambda x: (x.shape, str(x.dtype)), shapes)
        assert want == got, f"stage {k} changed the param tree"
        out = mk.apply(params, imgs, boxes, 3)
        assert out.dtype == jnp.float32
        rel = np.abs(np.asarray(out) - ref).max() / max(np.abs(ref).max(), 1e-6)
        assert np.isfinite(rel) and rel < 0.1, f"stage {k}: rel {rel}"

    # candidate mix mode: bf16 trunk, fp32-HIGH head except stage 0
    mix = CounTR(dataclasses.replace(
        TINY, dtype=jnp.bfloat16, head_dtype=jnp.float32,
        head_precision_high=True, approx_gelu=True,
        head_stage_dtypes=(jnp.bfloat16, None, None, None, None),
    ))
    s = float(mix.apply(params, imgs, boxes, 3).sum())
    assert np.isfinite(s)

    with pytest.raises(ValueError, match="5 entries"):
        dataclasses.replace(TINY, head_stage_dtypes=(None,) * 3)
    with pytest.raises(ValueError, match="subpixel"):
        dataclasses.replace(
            TINY, subpixel_head=True, head_stage_dtypes=(None,) * 5
        )

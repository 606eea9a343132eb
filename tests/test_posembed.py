import numpy as np

from countr_tpu.ops.posembed import get_2d_sincos_pos_embed


def _expected(embed_dim, grid_size):
    """Independent direct-loop construction of the reference embedding:
    token (i, j) -> concat[sincos_w(j), sincos_h(i)] where each half is
    [sin(p*omega), cos(p*omega)], omega_k = 1/10000^(k/(d/4))."""
    half = embed_dim // 2
    quarter = half // 2
    omega = np.array(
        [1.0 / 10000 ** (k / quarter) for k in range(quarter)], dtype=np.float64
    )
    out = np.zeros((grid_size * grid_size, embed_dim), dtype=np.float64)
    for i in range(grid_size):
        for j in range(grid_size):
            p = i * grid_size + j
            out[p, :quarter] = np.sin(j * omega)
            out[p, quarter:half] = np.cos(j * omega)
            out[p, half:half + quarter] = np.sin(i * omega)
            out[p, half + quarter:] = np.cos(i * omega)
    return out.astype(np.float32)


def test_matches_reference_construction():
    for dim, gs in [(768, 24), (512, 24), (64, 4)]:
        got = get_2d_sincos_pos_embed(dim, gs)
        np.testing.assert_allclose(got, _expected(dim, gs), atol=1e-6)


def test_cls_token_row():
    got = get_2d_sincos_pos_embed(64, 4, cls_token=True)
    assert got.shape == (17, 64)
    np.testing.assert_array_equal(got[0], np.zeros(64, np.float32))


def test_shape_and_dtype():
    got = get_2d_sincos_pos_embed(768, 24)
    assert got.shape == (576, 768)
    assert got.dtype == np.float32


def test_interpolate_pos_embed_matches_torch_bicubic():
    """interpolate_pos_embed must reproduce torch's
    F.interpolate(mode='bicubic', align_corners=False) resampling of
    the grid tokens (reference: util/pos_embed.py:75-96)."""
    import torch
    import torch.nn.functional as F

    from countr_tpu.ops.posembed import interpolate_pos_embed

    rng = np.random.default_rng(0)
    d, orig, new, extra = 32, 14, 24, 1
    pos = rng.normal(size=(1, extra + orig * orig, d)).astype(np.float32)

    got = interpolate_pos_embed(pos, new, num_extra_tokens=extra)

    tokens = torch.from_numpy(pos[:, extra:]).reshape(1, orig, orig, d)
    tokens = tokens.permute(0, 3, 1, 2)
    ref_tokens = F.interpolate(
        tokens, size=(new, new), mode="bicubic", align_corners=False
    )
    ref_tokens = ref_tokens.permute(0, 2, 3, 1).reshape(1, new * new, d)
    ref = np.concatenate([pos[:, :extra], ref_tokens.numpy()], axis=1)

    assert got.shape == (1, extra + new * new, d)
    np.testing.assert_allclose(got, ref, atol=2e-5)
    # identity when sizes already match
    same = interpolate_pos_embed(pos, orig, num_extra_tokens=extra)
    np.testing.assert_allclose(same, pos, atol=1e-7)
    # 2-D input stays 2-D
    got2 = interpolate_pos_embed(pos[0], new, num_extra_tokens=extra)
    np.testing.assert_allclose(got2, got[0], atol=1e-7)

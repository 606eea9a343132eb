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

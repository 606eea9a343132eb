"""Fixed 2D sine-cosine position embeddings.

Built once on the host in float64 and cast to fp32, exactly matching
the reference construction (reference: util/pos_embed.py:20-67): the
first half of the channel dim encodes the grid *row* (h) coordinate,
the second half the *column* (w) coordinate; each half is split again
into sin then cos of pos*omega with omega = 1/10000^(2i/d).

These are non-learned constants (reference: models_mae_cross.py:30,42
registers them with requires_grad=False), so here they are plain
arrays baked into the model, not parameters.
"""

from __future__ import annotations

import numpy as np


def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """[M] positions -> [M, embed_dim] with sin in the first half."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with torch's a=-0.75."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(ax < 2.0, a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a, 0.0),
    )
    return w


def _bicubic_resize_1d_matrix(n_src: int, n_dst: int) -> np.ndarray:
    """[n_src, n_dst] weights of torch's F.interpolate(mode='bicubic',
    align_corners=False, antialias=False) along one axis: half-pixel
    source centers, 4 taps, edge-clamped."""
    scale = n_src / n_dst
    i = np.arange(n_dst, dtype=np.float64)
    src = (i + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    mat = np.zeros((n_src, n_dst), dtype=np.float64)
    for t in range(-1, 3):
        idx = np.clip(base + t, 0, n_src - 1)
        w = _cubic_kernel(t - frac)
        np.add.at(mat, (idx, np.arange(n_dst)), w)
    return mat


def interpolate_pos_embed(
    pos_embed: np.ndarray,
    new_grid_size: int,
    num_extra_tokens: int = 0,
) -> np.ndarray:
    """Bicubically resample a [T, D] (or [1, T, D]) 2D sin-cos/learned
    position embedding from its square source grid to
    ``new_grid_size``x``new_grid_size``, keeping any leading extra
    (cls/dist) tokens unchanged.

    Functional equivalent of the reference's checkpoint-resolution
    adapter (reference: util/pos_embed.py:75-96 interpolate_pos_embed —
    torch F.interpolate bicubic, align_corners=False), re-expressed as
    two separable host-side matmuls; matches torch to ~1e-6.
    """
    pos = np.asarray(pos_embed, dtype=np.float64)
    squeeze = pos.ndim == 2
    if squeeze:
        pos = pos[None]
    extra = pos[:, :num_extra_tokens]
    tokens = pos[:, num_extra_tokens:]
    orig = int(round(tokens.shape[1] ** 0.5))
    if orig * orig != tokens.shape[1]:
        raise ValueError(f"pos embed token count {tokens.shape[1]} is not square")
    if orig != new_grid_size:
        d = tokens.shape[-1]
        grid = tokens.reshape(-1, orig, orig, d)
        m = _bicubic_resize_1d_matrix(orig, new_grid_size)  # [orig, new]
        grid = np.einsum("bhwd,hH->bHwd", grid, m)
        grid = np.einsum("bHwd,wW->bHWd", grid, m)
        tokens = grid.reshape(pos.shape[0], new_grid_size * new_grid_size, d)
    out = np.concatenate([extra, tokens], axis=1).astype(np.float32)
    return out[0] if squeeze else out


def get_2d_sincos_pos_embed(
    embed_dim: int, grid_size: int, cls_token: bool = False
) -> np.ndarray:
    """Return [grid_size**2(+1), embed_dim] float32 position embedding."""
    assert embed_dim % 2 == 0
    coords = np.arange(grid_size, dtype=np.float64)
    # w varies fastest (matches np.meshgrid(grid_w, grid_h) in the
    # reference): grid[0] is the w-coordinate map, grid[1] the h map —
    # but the reference then feeds grid[0] (w) as the "h" half. We
    # reproduce that exact ordering for checkpoint compatibility.
    grid_w, grid_h = np.meshgrid(coords, coords)  # each [gs, gs], row-major
    emb_first = _sincos_1d(embed_dim // 2, grid_w)  # reference emb_h <- grid[0]
    emb_second = _sincos_1d(embed_dim // 2, grid_h)  # reference emb_w <- grid[1]
    pos = np.concatenate([emb_first, emb_second], axis=1)
    if cls_token:
        pos = np.concatenate([np.zeros([1, embed_dim]), pos], axis=0)
    return pos.astype(np.float32)

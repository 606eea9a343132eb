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

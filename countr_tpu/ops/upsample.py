"""Bilinear resizing with torch ``align_corners=False`` semantics.

The density head does four 2x bilinear upsamples (reference:
models_mae_cross.py:189-196, F.interpolate(..., mode='bilinear',
align_corners=False)); grid-mode inference resizes (h/3, w/3) crops
back to (h, w) the same way (reference: FSC_test_cross(few-shot).py:288
via transforms.Resize on tensors).

``jax.image.resize(method='bilinear')`` uses half-pixel sampling and no
antialiasing on upsampling — identical to torch's
``align_corners=False`` non-antialiased path, so we delegate to it and
let XLA fuse. For the hot fixed-ratio 2x case we provide an explicit
VPU-friendly formulation: a 2x align_corners=False upsample is a
constant 2-tap filter per axis (weights 3/4, 1/4) with edge clamping,
expressed as pure shifts+FMAs that XLA fuses into neighboring convs —
no gather, no resize kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _up2x_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Double `axis` with half-pixel bilinear weights.

    Output sample 2i   = 0.25*x[i-1] + 0.75*x[i]   (clamped at edges)
    Output sample 2i+1 = 0.75*x[i]   + 0.25*x[i+1]
    """
    x32 = x.astype(jnp.float32)
    prev = jnp.concatenate(
        [jax.lax.slice_in_dim(x32, 0, 1, axis=axis),
         jax.lax.slice_in_dim(x32, 0, x.shape[axis] - 1, axis=axis)],
        axis=axis,
    )
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(x32, 1, x.shape[axis], axis=axis),
         jax.lax.slice_in_dim(x32, x.shape[axis] - 1, x.shape[axis], axis=axis)],
        axis=axis,
    )
    even = 0.25 * prev + 0.75 * x32
    odd = 0.75 * x32 + 0.25 * nxt
    # Interleave even/odd along `axis`.
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] *= 2
    return stacked.reshape(new_shape).astype(x.dtype)


def upsample2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample of NHWC input, align_corners=False exact."""
    return _up2x_axis(_up2x_axis(x, axis=1), axis=2)


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """General bilinear resize (half-pixel, no antialias) of NHWC input."""
    n, _, _, c = x.shape
    return jax.image.resize(
        x, (n, out_h, out_w, c), method="bilinear", antialias=False
    ).astype(x.dtype)

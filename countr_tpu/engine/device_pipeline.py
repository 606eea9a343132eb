"""Device-side counting pipeline: on-device window extraction,
stitching, and count/TTN readout.

Why: the first engine uploaded every (overlapping) window as fp32 and
downloaded every density map — ~5.5 MB H2D + 1.2 MB D2H per window,
which swamps any link (and utterly dominates on a tunneled TPU). This
pipeline uploads each image ONCE (uint8 when the source is 8-bit — an
exact representation of the test pipeline's PIL-resized pixels),
extracts windows with dynamic slices on device, accumulates the
stitched density on device with the precomputed per-window column
weights, and reads back two scalars per image (count + TTN statistic).
Density maps move to host only on request (visualization).

Shapes are bucketed so the whole dataset runs in a handful of compiled
programs: images [n_rows<=R, 384, Wb] with Wb from WIDTH_BUCKETS, and
windows in fixed chunks of B. The ViT forward itself compiles exactly
once (window shape is always [B, 384, 384, 3]).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from countr_tpu.config import DENSITY_SCALE, WINDOW

WIDTH_BUCKETS = (384, 448, 512, 576, 640, 768, 1024, 1536, 2304, 4608)


def width_bucket(w: int) -> int:
    for b in WIDTH_BUCKETS:
        if w <= b:
            return b
    return ((w + 511) // 512) * 512


def extract_windows(images: jnp.ndarray, owners: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """[R, 384, Wb, C] (+ int8/float) -> [B, 384, 384, C] float windows.

    uint8 inputs are converted to float/255 AFTER the gather so the big
    array stays 1 byte/pixel in HBM."""

    def get(o, s):
        img = jax.lax.dynamic_index_in_dim(images, o, axis=0, keepdims=False)
        return jax.lax.dynamic_slice_in_dim(img, s, WINDOW, axis=1)

    win = jax.vmap(get)(owners, starts)
    if win.dtype == jnp.uint8:
        win = win.astype(jnp.float32) / 255.0
    return win.astype(jnp.float32)


def accumulate(
    density: jnp.ndarray,  # [R, 384, Wb] f32
    dens: jnp.ndarray,  # [B, 384, 384] window densities
    owners: jnp.ndarray,  # [B] int32
    starts: jnp.ndarray,  # [B] int32
    wcols: jnp.ndarray,  # [B, 384] f32 stitch weights (0 for padding)
) -> jnp.ndarray:
    """Weighted scatter-add of window densities into per-image maps."""

    def body(i, den):
        upd = dens[i] * wcols[i][None, :]
        cur = jax.lax.dynamic_slice(
            den, (owners[i], 0, starts[i]), (1, WINDOW, WINDOW)
        )
        return jax.lax.dynamic_update_slice(
            den, cur + upd[None], (owners[i], 0, starts[i])
        )

    return jax.lax.fori_loop(0, dens.shape[0], body, density)


def finalize(
    density: jnp.ndarray,  # [R, 384, Wb]
    rects: jnp.ndarray,  # [R, K, 4] int32 (y1, x1, y2, x2), zero-pad
    rect_valid: jnp.ndarray,  # [R, K] f32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image (count, sum of exemplar-rect densities) — the TTN
    statistic before the /3 and threshold (reference:
    FSC_test_cross(few-shot).py:353-359). Rect sums via an integral
    image + 4-corner gather; bounds are inclusive like the reference's
    [y1:y2+1, x1:x2+1] slicing."""
    r, h, wb = density.shape
    counts = jnp.sum(density, axis=(1, 2)) / DENSITY_SCALE
    ii = jnp.pad(density, ((0, 0), (1, 0), (1, 0))).cumsum(1).cumsum(2)

    def one(ii_n, rect_n, valid_n):
        y1 = jnp.clip(rect_n[:, 0], 0, h)
        x1 = jnp.clip(rect_n[:, 1], 0, wb)
        y2 = jnp.clip(rect_n[:, 2] + 1, 0, h)
        x2 = jnp.clip(rect_n[:, 3] + 1, 0, wb)
        s = ii_n[y2, x2] - ii_n[y1, x2] - ii_n[y2, x1] + ii_n[y1, x1]
        return jnp.sum(s * valid_n) / DENSITY_SCALE

    esum = jax.vmap(one)(ii, rects, rect_valid)
    return counts, esum


class DevicePipeline:
    """Jitted stages with shape-bucketed caching.

    With a multi-device ``mesh``, each window chunk is sharded across
    the data axis (images/params replicated) — the expensive per-window
    forward partitions across chips and XLA gathers the small density
    updates; requires batch_windows % n_devices == 0."""

    def __init__(self, model, params, mesh=None):
        self.model = model
        self.params = params
        self.mesh = mesh if (mesh is not None and mesh.devices.size > 1) else None
        if self.mesh is not None:
            from countr_tpu.parallel.mesh import batch_sharding, replicated_sharding

            self._bsh = batch_sharding(self.mesh)
            self._rsh = replicated_sharding(self.mesh)

        def fwd(params, windows, y_all, owners):
            from countr_tpu.models.countr import CounTR

            y = jnp.take(y_all, owners, axis=0)
            return self.model.apply(
                params, windows, y, method=CounTR.forward_tokens
            )

        self._fwd = jax.jit(fwd)
        self._extract = jax.jit(extract_windows)
        self._accumulate = jax.jit(accumulate, donate_argnums=(0,))
        self._finalize = jax.jit(finalize)

    def run(
        self,
        images_np: np.ndarray,  # [R, 384, Wb, 3] uint8 or float32
        y_all: jnp.ndarray,  # [R, ny, C]
        owners_np: np.ndarray,  # [N_win]
        starts_np: np.ndarray,  # [N_win]
        wcols_np: np.ndarray,  # [N_win, 384]
        rects_np: np.ndarray,  # [R, K, 4]
        rect_valid_np: np.ndarray,  # [R, K]
        batch_windows: int,
        want_density: bool,
    ):
        """Returns (counts [R], esum [R], density [R,384,Wb] or None) as
        host numpy."""
        r, h, wb, _ = images_np.shape
        sharded = self.mesh is not None and batch_windows % self.mesh.devices.size == 0
        if sharded:
            images = jax.device_put(images_np, self._rsh)
            y_all = jax.device_put(y_all, self._rsh)
        else:
            images = jax.device_put(images_np)
        density = jnp.zeros((r, h, wb), jnp.float32)

        n = owners_np.shape[0]
        b = batch_windows
        pad = (-n) % b
        if pad:
            owners_np = np.concatenate([owners_np, np.zeros(pad, np.int32)])
            starts_np = np.concatenate([starts_np, np.zeros(pad, np.int32)])
            wcols_np = np.concatenate(
                [wcols_np, np.zeros((pad, WINDOW), np.float32)]
            )
        for i in range(0, n + pad, b):
            owners = jnp.asarray(owners_np[i : i + b])
            starts = jnp.asarray(starts_np[i : i + b])
            wcols = jnp.asarray(wcols_np[i : i + b])
            if sharded:
                owners = jax.device_put(owners, self._bsh)
                starts = jax.device_put(starts, self._bsh)
                wcols = jax.device_put(wcols, self._bsh)
            windows = self._extract(images, owners, starts)
            dens = self._fwd(self.params, windows, y_all, owners)
            density = self._accumulate(density, dens, owners, starts, wcols)

        counts, esum = self._finalize(
            density, jnp.asarray(rects_np), jnp.asarray(rect_valid_np)
        )
        # Device arrays out — callers fetch after dispatching further
        # sets, so uploads of set k+1 overlap compute of set k.
        return counts, esum, (density if want_density else None)

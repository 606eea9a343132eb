"""Device-side training augmentation (jitted photometric chain +
density synthesis).

VERDICT round-1 item 2: on 1-core hosts the numpy/cv2 augmentation
chain (26-29 ms/sample warm) starves the TPU (~75% idle during
finetune). This module moves the per-pixel work into the jitted train
step; the host keeps only the cheap index-level geometry (affine warp,
flip, crop, mosaic assembly on uint8) and ships a uint8 crop + dot
coordinates (see data/fsc147.py TrainDataset(device_aug=True)).

Reference pipeline being modeled (reference: util/FSC147.py:117-308):
  gaussian noise N(0,0.1) clip -> ColorJitter(0.25,0.15,0.15,0.15) ->
  GaussianBlur(kernel (7,9), sigma U(0.1,2)) -> affine -> flip ->
  crop/mosaic -> density = gaussian_filter(dot map, sigma=1) * 60.

Documented distribution-level deviations of the device path (it is an
opt-in fast mode; the host path stays the parity default):
  - photometric ops run AFTER the geometric crop and on the 384 crop
    rather than the full flex-resized image (noise is iid so identical;
    contrast's gray-mean is the crop's mean, not the full image's; blur
    sees reflect-padding at crop edges instead of image context);
  - the random draws come from jax.random streams, not the numpy
    Generator (same distributions, different bits).
Mosaic samples get NO photometric aug, exactly like the reference
(mosaic cells are cut from clean images, util/FSC147.py:177-255) —
the per-sample ``apply_photo`` flag encodes this.

Density synthesis IS exact (not just distributional): the separable
gaussian below reproduces scipy.ndimage.gaussian_filter(sigma=1,
truncate=4, reflect) to float tolerance, and the blur kernel matches
cv2.getGaussianKernel — both are pinned by tests/test_device_aug.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from countr_tpu.config import DENSITY_SCALE, IMG_SIZE

_GRAY = (0.299, 0.587, 0.114)  # ITU-R 601, matches the host path


# ---------------------------------------------------------------------------
# Color jitter (torchvision semantics, random order)
# ---------------------------------------------------------------------------


def _blend(img, other, factor):
    return jnp.clip(factor * img + (1.0 - factor) * other, 0.0, 1.0)


def _brightness(img, f):
    return _blend(img, 0.0, f)


def _contrast(img, f):
    gray = img @ jnp.asarray(_GRAY, img.dtype)
    return _blend(img, gray.mean(), f)


def _saturation(img, f):
    gray = (img @ jnp.asarray(_GRAY, img.dtype))[..., None]
    return _blend(img, gray, f)


def _hue(img, shift):
    """Rotate hue by ``shift`` (fraction of a full turn in [-0.5, 0.5])
    via an RGB->HSV->RGB round trip (the host path uses cv2's HSV)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    d = maxc - minc
    safe_d = jnp.where(d > 0, d, 1.0)
    s = jnp.where(maxc > 0, d / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    rc = (maxc - r) / safe_d
    gc = (maxc - g) / safe_d
    bc = (maxc - b) / safe_d
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = jnp.where(d > 0, h, 0.0)

    h = (h + shift) % 1.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [v, q, p, p, t, v])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [t, v, v, q, p, p])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [p, p, t, v, v, q])
    return jnp.clip(jnp.stack([r2, g2, b2], axis=-1), 0.0, 1.0)


def color_jitter(key, img,
                 brightness: float = 0.25, contrast: float = 0.15,
                 saturation: float = 0.15, hue: float = 0.15):
    """torchvision ColorJitter: each factor uniform around 1 (hue shift
    uniform in +-hue), ops applied in a random order (reference:
    util/FSC147.py:371-374). hue=0.15 is a fraction of a full turn in
    cv2's convention (the host path scales by 360 deg).

    The random order is a permutation applied as 4 sequential 4-way
    switches (one traced body each) — a flat 24-permutation switch
    compiles 24 copies of the whole chain and dominated the train-step
    compile time."""
    kf, kp = jax.random.split(key)
    fb, fc, fs, fh = jax.random.uniform(kf, (4,))
    fb = max(0.0, 1.0 - brightness) + fb * ((1 + brightness) - max(0.0, 1 - brightness))
    fc = max(0.0, 1.0 - contrast) + fc * ((1 + contrast) - max(0.0, 1 - contrast))
    fs = max(0.0, 1.0 - saturation) + fs * ((1 + saturation) - max(0.0, 1 - saturation))
    fh = (fh * 2.0 - 1.0) * hue

    branches = (
        lambda x: _brightness(x, fb),
        lambda x: _contrast(x, fc),
        lambda x: _saturation(x, fs),
        lambda x: _hue(x, fh),
    )
    perm = jax.random.permutation(kp, 4)

    def body(i, x):
        return jax.lax.switch(perm[i], branches, x)

    return jax.lax.fori_loop(0, 4, body, img)


# ---------------------------------------------------------------------------
# Gaussian blur (cv2.GaussianBlur kernel (7, 9), traced sigma)
# ---------------------------------------------------------------------------


def _gauss_kernel(sigma, ksize: int):
    """cv2.getGaussianKernel: exp(-(i-c)^2 / (2 sigma^2)), normalized."""
    c = (ksize - 1) / 2.0
    x = jnp.arange(ksize, dtype=jnp.float32) - c
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def gaussian_blur(img, sigma, kx: int = 7, ky: int = 9):
    """Separable gaussian blur of HWC image with BORDER_REFLECT_101
    padding — matches cv2.GaussianBlur(ksize=(7,9), sigmaX=sigmaY=s)
    (reference blur: util/FSC147.py:373; torchvision GaussianBlur
    delegates to the same separable conv)."""
    khx = _gauss_kernel(sigma, kx)
    khy = _gauss_kernel(sigma, ky)
    ry, rx = ky // 2, kx // 2
    pad = jnp.pad(img, ((ry, ry), (rx, rx), (0, 0)), mode="reflect")
    # horizontal pass then vertical, via depthwise 1-D convs expressed
    # as stacked shifts (k is tiny; XLA fuses this into a few FMAs)
    out = jnp.zeros_like(pad[:, rx:-rx or None, :])
    for i in range(kx):
        out = out + khx[i] * jax.lax.dynamic_slice_in_dim(pad, i, img.shape[1], axis=1)
    out2 = jnp.zeros_like(img)
    for j in range(ky):
        out2 = out2 + khy[j] * jax.lax.dynamic_slice_in_dim(out, j, img.shape[0], axis=0)
    return out2


# ---------------------------------------------------------------------------
# Density synthesis from dot coordinates (exact scipy parity)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _scipy_gauss_kernel_np(sigma: float, truncate: float = 4.0):
    """scipy.ndimage.gaussian_filter's 1-D kernel: radius =
    int(truncate*sigma + 0.5), gaussian normalized over the window."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / float(sigma)) ** 2)
    return (k / k.sum()).astype(np.float32), radius


def density_from_dots(dots, n_valid, h: int = IMG_SIZE, w: int = IMG_SIZE,
                      sigma: float = 1.0, scale: float = DENSITY_SCALE):
    """[K, 2] int (x, y) dot coords (first n_valid real) -> smoothed,
    scaled density [h, w]. Binary dot map (duplicate dots overwrite,
    like the reference's map[y, x] = 1, util/FSC147.py:266-268) then
    gaussian_filter(sigma, reflect) * scale — exact scipy parity."""
    k_np, radius = _scipy_gauss_kernel_np(sigma)
    k = jnp.asarray(k_np)
    dots = dots.astype(jnp.int32)  # coords ship as int16
    valid = jnp.arange(dots.shape[0]) < n_valid
    xs = jnp.clip(dots[:, 0], 0, w - 1)
    ys = jnp.clip(dots[:, 1], 0, h - 1)
    # scatter SET (max) of ones; invalid slots park at (0,0) with 0
    dmap = jnp.zeros((h, w), jnp.float32)
    dmap = dmap.at[ys, xs].max(valid.astype(jnp.float32))
    # scipy's default boundary 'reflect' duplicates the edge sample
    # (= numpy 'symmetric'); numpy 'reflect' is scipy's 'mirror'
    pad = jnp.pad(dmap, radius, mode="symmetric")
    out = jnp.zeros((h, pad.shape[1]), jnp.float32)
    for i in range(2 * radius + 1):
        out = out + k[i] * jax.lax.dynamic_slice_in_dim(pad, i, h, axis=0)
    out2 = jnp.zeros((h, w), jnp.float32)
    for j in range(2 * radius + 1):
        out2 = out2 + k[j] * jax.lax.dynamic_slice_in_dim(out, j, w, axis=1)
    return out2 * scale


# ---------------------------------------------------------------------------
# Full per-sample chain + batched entry
# ---------------------------------------------------------------------------


def photometric(key, img, noise_std: float = 0.1):
    """noise -> jitter -> blur, the reference's photometric chain
    (reference: util/FSC147.py:134-141)."""
    kn, kj, ks = jax.random.split(key, 3)
    img = jnp.clip(img + noise_std * jax.random.normal(kn, img.shape), 0.0, 1.0)
    img = color_jitter(kj, img)
    sigma = jax.random.uniform(ks, (), minval=0.1, maxval=2.0)
    return gaussian_blur(img, sigma)


def augment_batch(key, images_u8, dots, n_dots, apply_photo,
                  density_sigma: float = 1.0):
    """Batched device augmentation.

    images_u8 [B, 384, 384, 3] uint8 host-geometry crops;
    dots [B, K, 2] int32 (x, y) in crop coordinates; n_dots [B];
    apply_photo [B] (0 for mosaic samples — reference mosaic cells are
    clean). Returns (images f32, gt_density f32 [B, 384, 384])."""
    b = images_u8.shape[0]
    keys = jax.random.split(key, b)

    def one(k, img_u8, d, n, photo):
        img = img_u8.astype(jnp.float32) / 255.0
        img = jnp.where(photo > 0, photometric(k, img), img)
        den = density_from_dots(d, n, sigma=density_sigma)
        return img, den

    return jax.vmap(one)(keys, images_u8, dots, n_dots, apply_photo)

"""Host-side image transforms and augmentation (numpy/cv2/PIL/scipy).

Torch-free re-implementation of the reference's preprocessing
(reference: util/FSC147.py). Images are float32 numpy HWC in [0, 1]
throughout. Randomness comes from an explicit np.random.Generator per
sample — deterministic given (seed, epoch, index), unlike the
reference's global torch/np RNG.

Parity notes:
- Full-image resizes use PIL bilinear (antialiased) exactly like
  torchvision Resize on PIL images (reference: util/FSC147.py:125).
- Tensor-space resizes (exemplar crops -> 64x64, mosaic cell resizes)
  use cv2.INTER_LINEAR, matching torchvision Resize on *tensors*
  (non-antialiased, half-pixel) used by the reference after ToTensor
  (reference: util/FSC147.py:297, FSC_test_cross(few-shot).py:172).
- The affine augmentation reproduces the reference's parameter ranges
  (rotate +-15deg, scale 0.8-1.2, shear +-10deg, translate +-20%;
  reference: util/FSC147.py:150-158) with a centered matrix; imgaug's
  exact matrix composition is not replicated bit-for-bit (the
  augmentation is random either way — distribution-level parity).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np
from PIL import Image
from scipy import ndimage

from countr_tpu import native
from countr_tpu.config import DENSITY_SCALE, EXEMPLAR_SIZE, IMG_SIZE

# ---------------------------------------------------------------------------
# Resizing
# ---------------------------------------------------------------------------


def pil_resize(img: Image.Image, h: int, w: int) -> np.ndarray:
    """PIL bilinear (antialiased) resize -> float32 HWC in [0,1]."""
    out = img.resize((w, h), Image.BILINEAR)
    return np.asarray(out, dtype=np.float32) / 255.0


def pil_resize_u8(img: Image.Image, h: int, w: int) -> np.ndarray:
    """PIL bilinear resize kept as uint8 HWC — 1 byte/pixel for H2D;
    uint8/255 on device reproduces the float pipeline exactly."""
    return np.asarray(img.resize((w, h), Image.BILINEAR), dtype=np.uint8)


def tensor_resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Non-antialiased bilinear resize of a float HWC array
    (== torch F.interpolate align_corners=False)."""
    return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)


def flex_size(h: int, w: int, max_hw: int = IMG_SIZE) -> Tuple[int, int]:
    """Training flexible resize: bring the smaller side to 384, or snap
    both to multiples of 16 when both already exceed 384
    (reference: util/FSC147.py:102-115)."""
    if h < max_hw <= w or h <= w < max_hw:
        new_h = max_hw
        new_w = round(w * new_h / h)
    elif w < max_hw <= h or w < h < max_hw:
        new_w = max_hw
        new_h = round(h * new_w / w)
    else:
        new_w = 16 * int(w / 16)
        new_h = 16 * int(h / 16)
    return new_h, new_w


def test_size(h: int, w: int) -> Tuple[int, int]:
    """Test-time geometry: H=384, W = 16*int((W/H*384)/16)
    (reference: FSC_test_cross(few-shot).py:148-149)."""
    return IMG_SIZE, 16 * int((w / h * IMG_SIZE) / 16)


# ---------------------------------------------------------------------------
# Density-map synthesis
# ---------------------------------------------------------------------------


def dot_map(points: np.ndarray, h: int, w: int) -> np.ndarray:
    """Binary dot map from (x, y) points, clamped to the image
    (reference: util/FSC147.py:266-268)."""
    m = np.zeros((h, w), np.float32)
    for x, y in points:
        m[min(h - 1, int(y)), min(w - 1, int(x))] = 1.0
    return m


def density_from_dots(
    points: np.ndarray, h: int, w: int, sigma: float = 1.0,
    radius: Optional[int] = None, scale: float = DENSITY_SCALE,
) -> np.ndarray:
    """Gaussian-smoothed, x60-scaled density map (reference:
    util/FSC147.py:274-279 train sigma=1; :332-333 val sigma=4
    radius=7)."""
    if native.lib() is not None:
        # O(dots*r^2) sparse splat == gaussian_filter(dot_map) * scale
        # (linearity + reflect boundary; exactness-tested vs scipy)
        return native.density_splat(
            np.asarray(points, np.float32).reshape(-1, 2), h, w, sigma, radius, scale
        )
    m = dot_map(points, h, w)
    kw = {"sigma": sigma, "order": 0}
    if radius is not None:
        kw["radius"] = radius
    return ndimage.gaussian_filter(m, **kw) * scale


def smooth_density(dmap: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """gaussian_filter for (usually sparse) dot maps. Dot maps have
    O(count) nonzeros — possibly fractional after mosaic seam blending —
    so the native path splats them in O(nnz*r^2) instead of filtering
    the full image."""
    if native.lib() is not None:
        h, w = dmap.shape
        ys, xs = np.nonzero(dmap)
        if ys.size <= (h * w) // 16:  # dense maps: scipy wins
            return native.splat_weighted(
                ys, xs, dmap[ys, xs], h, w, sigma, None, 1.0
            )
    return ndimage.gaussian_filter(dmap, sigma=sigma, order=0)


# ---------------------------------------------------------------------------
# Exemplar crops
# ---------------------------------------------------------------------------


def crop_exemplars(
    image: np.ndarray,
    rects: Sequence[Sequence[int]],
    max_boxes: int = 3,
    size: int = EXEMPLAR_SIZE,
) -> np.ndarray:
    """Crop (y1, x1, y2, x2) boxes (inclusive bounds, like the
    reference's [y1:y2+1, x1:x2+1]) and resize each to 64x64
    (reference: util/FSC147.py:281-299). Returns [k, 64, 64, 3]."""
    out = []
    for rect in list(rects)[:max_boxes]:
        y1, x1, y2, x2 = (int(v) for v in rect)
        crop = image[y1 : y2 + 1, x1 : x2 + 1]
        if crop.size == 0:
            crop = np.zeros((1, 1, 3), np.float32)
        out.append(tensor_resize(crop, size, size))
    if not out:
        return np.zeros((0, size, size, 3), np.float32)
    return np.stack(out)


def crop_exemplars_u8(
    image_u8: np.ndarray,
    rects: Sequence[Sequence[int]],
    max_boxes: int = 3,
    size: int = EXEMPLAR_SIZE,
) -> np.ndarray:
    """crop_exemplars for a uint8 source: slices first, converts only
    the small crops to float (device-aug path keeps the full image
    uint8 end to end)."""
    out = []
    for rect in list(rects)[:max_boxes]:
        y1, x1, y2, x2 = (int(v) for v in rect)
        crop = image_u8[y1 : y2 + 1, x1 : x2 + 1].astype(np.float32) / 255.0
        if crop.size == 0:
            crop = np.zeros((1, 1, 3), np.float32)
        out.append(tensor_resize(crop, size, size))
    if not out:
        return np.zeros((0, size, size, 3), np.float32)
    return np.stack(out)


def scale_rects(
    boxes: Sequence[Sequence[Sequence[float]]], sy: float, sx: float
) -> List[List[int]]:
    """Annotation box_examples_coordinates (4 corners, (x, y)) ->
    (y1, x1, y2, x2) rects in resized coords (reference:
    FSC_test_cross(few-shot).py:161-166 uses corners 0 and 2)."""
    rects = []
    for bbox in boxes:
        x1 = int(bbox[0][0] * sx)
        y1 = int(bbox[0][1] * sy)
        x2 = int(bbox[2][0] * sx)
        y2 = int(bbox[2][1] * sy)
        rects.append([y1, x1, y2, x2])
    return rects


# ---------------------------------------------------------------------------
# Photometric augmentation
# ---------------------------------------------------------------------------


def gaussian_noise(rng: np.random.Generator, img: np.ndarray, std: float = 0.1) -> np.ndarray:
    """Additive N(0, 0.1) noise, clamped (reference: util/FSC147.py:134-138).

    Native path: fused generate+add+clip in one pass (xoshiro256++
    seeded from the per-sample Generator — still deterministic per
    (seed, epoch, index), distribution-level parity with numpy)."""
    if native.lib() is not None:
        out = np.ascontiguousarray(img, np.float32)
        if out is img:
            out = img.copy()
        native.noise_clip(out, std, int(rng.integers(0, 2**63)))
        return out
    return np.clip(img + rng.normal(0, std, img.shape), 0.0, 1.0).astype(np.float32)


def _blend(a: np.ndarray, b, factor: float) -> np.ndarray:
    return np.clip(factor * a + (1 - factor) * b, 0.0, 1.0).astype(np.float32)


def color_jitter(
    rng: np.random.Generator,
    img: np.ndarray,
    brightness: float = 0.25,
    contrast: float = 0.15,
    saturation: float = 0.15,
    hue: float = 0.15,
    copy: bool = True,
) -> np.ndarray:
    """torchvision ColorJitter semantics: each factor uniform around 1
    (hue in +-hue), applied in random order (reference:
    util/FSC147.py:371-374). copy=False lets the native path mutate a
    caller-owned scratch image in place."""
    ops = list(range(4))
    rng.shuffle(ops)
    if native.lib() is not None:
        # same rng draws, fused in-place native kernels (one pass per
        # op, no full-image temporaries / HSV round trips)
        out = np.ascontiguousarray(img, np.float32)
        if out is img and copy:
            out = img.copy()
        for op in ops:
            if op == 0:
                native.blend_scalar(out, 0.0, rng.uniform(max(0, 1 - brightness), 1 + brightness))
            elif op == 1:
                f = rng.uniform(max(0, 1 - contrast), 1 + contrast)
                native.blend_scalar(out, native.gray_mean(out), f)
            elif op == 2:
                native.blend_gray(out, rng.uniform(max(0, 1 - saturation), 1 + saturation))
            else:
                # hue stays on cv2 — its SIMD HSV round trip beats a
                # scalar native loop 3x (measured)
                f = rng.uniform(-hue, hue)
                hsv = cv2.cvtColor(out, cv2.COLOR_RGB2HSV)
                hsv[..., 0] = (hsv[..., 0] + f * 360.0) % 360.0
                out = np.clip(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB), 0, 1)
        return out
    for op in ops:
        if op == 0:  # brightness: blend with zero
            f = rng.uniform(max(0, 1 - brightness), 1 + brightness)
            img = _blend(img, 0.0, f)
        elif op == 1:  # contrast: blend with mean of grayscale
            f = rng.uniform(max(0, 1 - contrast), 1 + contrast)
            gray = img @ np.asarray([0.299, 0.587, 0.114], np.float32)
            img = _blend(img, gray.mean(), f)
        elif op == 2:  # saturation: blend with grayscale
            f = rng.uniform(max(0, 1 - saturation), 1 + saturation)
            gray = (img @ np.asarray([0.299, 0.587, 0.114], np.float32))[..., None]
            img = _blend(img, gray, f)
        else:  # hue: rotate hue channel in HSV
            f = rng.uniform(-hue, hue)
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
            hsv[..., 0] = (hsv[..., 0] + f * 360.0) % 360.0
            img = np.clip(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB), 0, 1)
    return img.astype(np.float32)


def gaussian_blur(
    rng: np.random.Generator,
    img: np.ndarray,
    kernel: Tuple[int, int] = (7, 9),
    sigma_range: Tuple[float, float] = (0.1, 2.0),
) -> np.ndarray:
    """torchvision GaussianBlur(kernel_size=(7,9)): kx=7, ky=9, one
    sigma ~ U(0.1, 2) for both axes (reference: util/FSC147.py:373)."""
    sigma = rng.uniform(*sigma_range)
    return cv2.GaussianBlur(
        img, ksize=kernel, sigmaX=sigma, sigmaY=sigma,
        borderType=cv2.BORDER_REFLECT101,
    ).astype(np.float32)


# ---------------------------------------------------------------------------
# Geometric augmentation
# ---------------------------------------------------------------------------


def draw_affine_matrix(
    rng: np.random.Generator,
    h: int,
    w: int,
    rotate: Tuple[float, float] = (-15, 15),
    scale: Tuple[float, float] = (0.8, 1.2),
    shear: Tuple[float, float] = (-10, 10),
    translate: Tuple[float, float] = (-0.2, 0.2),
) -> np.ndarray:
    """Sample the forward cv2 warp matrix [2, 3] of the reference's
    random affine (ranges: util/FSC147.py:150-158), centered."""
    ang = math.radians(rng.uniform(*rotate))
    sc = rng.uniform(*scale)
    shx = math.radians(rng.uniform(*shear))
    tx = rng.uniform(*translate) * w
    ty = rng.uniform(*translate) * h

    cx, cy = w / 2.0, h / 2.0
    cos, sin = math.cos(ang), math.sin(ang)
    # scale -> rotate -> shear about the image center, then translate
    rot = np.asarray([[cos, -sin], [sin, cos]])
    sh = np.asarray([[1.0, math.tan(shx)], [0.0, 1.0]])
    m2 = sh @ rot * sc
    offset = np.asarray([cx + tx, cy + ty]) - m2 @ np.asarray([cx, cy])
    return np.concatenate([m2, offset[:, None]], axis=1).astype(np.float32)


def warp_keypoints(
    M: np.ndarray, keypoints: np.ndarray, h: int, w: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Forward-warp (x, y) keypoints by a [2,3] matrix; returns
    (warped, in_bounds_mask)."""
    if keypoints.size:
        kps = keypoints @ M[:, :2].T + M[:, 2]
    else:
        kps = keypoints.reshape(0, 2)
    in_bounds = (
        (kps[:, 0] >= 0) & (kps[:, 0] <= w - 1) & (kps[:, 1] >= 0) & (kps[:, 1] <= h - 1)
        if kps.size
        else np.zeros((0,), bool)
    )
    return kps, in_bounds


def random_affine(
    rng: np.random.Generator,
    img: np.ndarray,
    keypoints: np.ndarray,
    rotate: Tuple[float, float] = (-15, 15),
    scale: Tuple[float, float] = (0.8, 1.2),
    shear: Tuple[float, float] = (-10, 10),
    translate: Tuple[float, float] = (-0.2, 0.2),
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Centered random affine on image + (x, y) keypoints (reference
    ranges: util/FSC147.py:150-158). Returns (image, warped_keypoints,
    in_bounds_mask). The output dtype follows the input (uint8 inputs
    stay uint8 — the device-aug geometry path)."""
    h, w = img.shape[:2]
    M = draw_affine_matrix(rng, h, w, rotate, scale, shear, translate)
    m2, offset = M[:, :2].astype(np.float64), M[:, 2].astype(np.float64)

    out = cv2.warpAffine(
        img, M, (w, h), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
    )
    if keypoints.size:
        kps = keypoints @ m2.T + offset
    else:
        kps = keypoints.reshape(0, 2)
    in_bounds = (
        (kps[:, 0] >= 0) & (kps[:, 0] <= w - 1) & (kps[:, 1] >= 0) & (kps[:, 1] <= h - 1)
        if kps.size
        else np.zeros((0,), bool)
    )
    return out.astype(img.dtype), kps, in_bounds


def hflip(img: np.ndarray, dmap: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    return img[:, ::-1].copy(), dmap[:, ::-1].copy()

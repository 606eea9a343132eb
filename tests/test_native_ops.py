"""Native host-core (native/src/host_ops.cpp) vs numpy/scipy spec.

The numpy implementations in countr_tpu/data/transforms.py are the
deterministic spec (themselves parity-mapped to reference
util/FSC147.py); these tests pin the native kernels to them —
exactly for the deterministic ops, statistically for the RNG one.
"""

import numpy as np
import pytest
from scipy import ndimage, stats

from countr_tpu import native
from countr_tpu.data import transforms as T

pytestmark = pytest.mark.skipif(
    native.lib() is None, reason="native host core unavailable"
)


def _rng(s=0):
    return np.random.default_rng(s)


# ---------------------------------------------------------------------------
# density splat == scipy gaussian_filter(dot_map) * 60, mode='reflect'
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "h,w,sigma,radius",
    [(384, 576, 1.0, None), (384, 576, 4.0, 7), (96, 64, 1.0, None), (48, 48, 2.0, None)],
)
def test_density_splat_matches_scipy(h, w, sigma, radius):
    rng = _rng(1)
    pts = np.stack([rng.uniform(-0.9, w - 0.5, 120), rng.uniform(-0.9, h - 0.5, 120)], 1)
    pts = np.concatenate([pts, pts[:7]])  # duplicates collapse (dot_map assigns)
    m = T.dot_map(pts, h, w)
    kw = {"sigma": sigma, "order": 0}
    if radius is not None:
        kw["radius"] = radius
    ref = ndimage.gaussian_filter(m, **kw) * 60.0
    got = native.density_splat(pts, h, w, sigma, radius, 60.0)
    np.testing.assert_allclose(got, ref, atol=5e-6)
    # total mass conserved: 60 * unique dot cells
    assert got.sum() == pytest.approx(ref.sum(), abs=1e-3)


@pytest.mark.parametrize("h,w,sigma", [(8, 8, 4.0), (6, 10, 3.0), (12, 5, 5.0)])
def test_density_splat_radius_exceeds_extent(h, w, sigma):
    # radius >= image extent exercises the multi-fold reflect boundary;
    # must still match scipy (and must not write out of bounds)
    rng = _rng(20)
    pts = np.stack([rng.uniform(0, w - 0.6, 9), rng.uniform(0, h - 0.6, 9)], 1)
    ref = ndimage.gaussian_filter(T.dot_map(pts, h, w), sigma=sigma, order=0) * 60.0
    got = native.density_splat(pts.astype(np.float32), h, w, sigma, None, 60.0)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_density_splat_border_and_empty():
    # corner dots exercise the reflect boundary on both axes
    pts = np.array([[0.2, 0.1], [63.9, 47.9], [0.0, 47.0], [63.0, 0.0]], np.float32)
    ref = ndimage.gaussian_filter(T.dot_map(pts, 48, 64), sigma=1.0, order=0) * 60.0
    got = native.density_splat(pts, 48, 64, 1.0, None, 60.0)
    np.testing.assert_allclose(got, ref, atol=5e-6)
    empty = native.density_splat(np.zeros((0, 2), np.float32), 48, 64, 1.0, None, 60.0)
    assert empty.shape == (48, 64) and empty.sum() == 0.0


def test_splat_weighted_matches_scipy_on_fractional_maps():
    # mosaic seam blending leaves fractional dot values; smoothing the
    # sparse map must equal the dense filter
    rng = _rng(8)
    dmap = np.zeros((96, 128), np.float32)
    ys = rng.integers(0, 96, 60)
    xs = rng.integers(0, 128, 60)
    dmap[ys, xs] = rng.uniform(0.2, 1.0, 60).astype(np.float32)
    ref = ndimage.gaussian_filter(dmap, sigma=1.0, order=0)
    got = T.smooth_density(dmap, sigma=1.0)
    np.testing.assert_allclose(got, ref, atol=5e-6)


def test_smooth_density_dense_falls_back():
    dmap = _rng(9).uniform(0, 1, (32, 32)).astype(np.float32)  # fully dense
    ref = ndimage.gaussian_filter(dmap, sigma=1.0, order=0)
    np.testing.assert_allclose(T.smooth_density(dmap, 1.0), ref, atol=5e-6)


def test_color_jitter_copy_false_mutates_scratch():
    img = _rng(10).uniform(0, 1, (16, 16, 3)).astype(np.float32)
    # find a seed whose shuffled op order does NOT start with hue (3):
    # until the hue op replaces the buffer, the blend ops must have
    # mutated the scratch array in place
    def first_op(s):
        ops = list(range(4))
        np.random.default_rng(s).shuffle(ops)
        return ops[0]

    seed = next(s for s in range(100) if first_op(s) != 3)
    scratch = img.copy()
    out = T.color_jitter(np.random.default_rng(seed), scratch, copy=False)
    ref = T.color_jitter(np.random.default_rng(seed), img)  # copies
    np.testing.assert_allclose(out, ref, atol=1e-6)
    assert np.abs(scratch - img).max() > 0  # scratch WAS written in place
    # and the copying default left the original untouched... by copying
    ref2 = T.color_jitter(np.random.default_rng(seed), img.copy())
    np.testing.assert_allclose(ref, ref2, atol=0)


def test_density_from_dots_dispatch():
    # the public entry returns native results == scipy fallback
    pts = _rng(2).uniform(2, 40, (30, 2))
    a = T.density_from_dots(pts, 48, 48, sigma=1.0)
    m = T.dot_map(pts, 48, 48)
    b = ndimage.gaussian_filter(m, sigma=1.0, order=0) * 60.0
    np.testing.assert_allclose(a, b, atol=5e-6)


# ---------------------------------------------------------------------------
# fused photometric ops
# ---------------------------------------------------------------------------


def test_blend_scalar_matches_numpy():
    img = _rng(3).uniform(0, 1, (32, 40, 3)).astype(np.float32)
    for f in (0.8, 1.0, 1.25):
        a = img.copy()
        native.blend_scalar(a, 0.0, f)
        np.testing.assert_allclose(a, T._blend(img, 0.0, f), atol=2e-6)


def test_blend_gray_matches_numpy():
    img = _rng(4).uniform(0, 1, (32, 40, 3)).astype(np.float32)
    gray = (img @ np.asarray([0.299, 0.587, 0.114], np.float32))[..., None]
    a = img.copy()
    native.blend_gray(a, 0.87)
    np.testing.assert_allclose(a, T._blend(img, gray, 0.87), atol=2e-6)


def test_gray_mean_matches_numpy():
    img = _rng(5).uniform(0, 1, (64, 48, 3)).astype(np.float32)
    gray = img @ np.asarray([0.299, 0.587, 0.114], np.float32)
    assert native.gray_mean(img) == pytest.approx(gray.mean(), abs=1e-5)


def test_color_jitter_native_matches_python_path(monkeypatch):
    img = _rng(6).uniform(0, 1, (48, 64, 3)).astype(np.float32)
    nat = T.color_jitter(np.random.default_rng(9), img.copy())
    # same rng stream through the numpy path
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    ref = T.color_jitter(np.random.default_rng(9), img.copy())
    np.testing.assert_allclose(nat, ref, atol=1e-5)


# ---------------------------------------------------------------------------
# ziggurat noise: deterministic per seed, N(0, std) distribution
# ---------------------------------------------------------------------------


def test_noise_deterministic_and_clipped():
    img = _rng(7).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    a = T.gaussian_noise(np.random.default_rng(11), img)
    b = T.gaussian_noise(np.random.default_rng(11), img)
    np.testing.assert_array_equal(a, b)
    c = T.gaussian_noise(np.random.default_rng(12), img)
    assert np.abs(a - c).max() > 0
    assert a.min() >= 0.0 and a.max() <= 1.0


def test_noise_distribution():
    flat = np.full((400, 400, 3), 0.5, np.float32)
    out = T.gaussian_noise(np.random.default_rng(13), flat, std=0.04)
    d = ((out - 0.5) / 0.04).ravel()  # 12.5 sigma of clip headroom
    assert abs(d.mean()) < 0.01
    assert d.std() == pytest.approx(1.0, abs=0.01)
    ks = stats.kstest(d[::40], "norm")
    assert ks.pvalue > 0.01

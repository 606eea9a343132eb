"""ctypes bindings for the native host core (native/src/host_ops.cpp).

The shared library is built on first import with g++ (one translation
unit, ~2 s) and cached next to the source; no pybind11/pip needed.
Everything degrades gracefully: if the toolchain or the .so is
unavailable, or COUNTR_TPU_NATIVE=0 is set, `lib()` returns None and
callers fall back to their numpy implementations (the deterministic
spec — see countr_tpu/data/transforms.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_ABI_VERSION = 2

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "src", "host_ops.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libcountr_host.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    """Compile host_ops.cpp -> libcountr_host.so atomically."""
    if not os.path.exists(_SRC):
        return False
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(_SO))
    os.close(fd)
    cmd = [
        "g++", "-O3", "-march=native", "-ffast-math", "-shared", "-fPIC",
        "-std=c++17", _SRC, "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _bind(so: ctypes.CDLL) -> ctypes.CDLL:
    f32p = ctypes.POINTER(ctypes.c_float)
    so.ct_abi_version.restype = ctypes.c_int
    so.ct_noise_clip.argtypes = [f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_uint64]
    so.ct_blend_scalar.argtypes = [f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float]
    so.ct_gray_mean.argtypes = [f32p, ctypes.c_int64]
    so.ct_gray_mean.restype = ctypes.c_float
    so.ct_blend_gray.argtypes = [f32p, ctypes.c_int64, ctypes.c_float]
    so.ct_density_splat.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.c_float, f32p,
    ]
    i32p = ctypes.POINTER(ctypes.c_int32)
    so.ct_splat_weighted.argtypes = [
        i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, ctypes.c_float, f32p,
    ]
    return so


def lib() -> Optional[ctypes.CDLL]:
    """The bound library, or None (disabled / unbuildable)."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("COUNTR_TPU_NATIVE", "1") == "0":
        return None
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        so = ctypes.CDLL(_SO)
        so.ct_abi_version.restype = ctypes.c_int
        if so.ct_abi_version() != _ABI_VERSION:
            if not _build():
                return None
            so = ctypes.CDLL(_SO)
        _lib = _bind(so)
    except Exception:
        _lib = None
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


# -- thin typed wrappers (all in-place on contiguous float32) ---------------


def noise_clip(img: np.ndarray, std: float, seed: int) -> None:
    lib().ct_noise_clip(_ptr(img), img.size, std, seed & (2**64 - 1))


def blend_scalar(img: np.ndarray, other: float, factor: float) -> None:
    lib().ct_blend_scalar(_ptr(img), img.size, other, factor)


def gray_mean(img: np.ndarray) -> float:
    return lib().ct_gray_mean(_ptr(img), img.size // 3)


def blend_gray(img: np.ndarray, factor: float) -> None:
    lib().ct_blend_gray(_ptr(img), img.size // 3, factor)


def splat_weighted(
    ys: np.ndarray, xs: np.ndarray, vals: np.ndarray, h: int, w: int,
    sigma: float, radius: Optional[int], scale: float,
) -> np.ndarray:
    out = np.empty((h, w), np.float32)
    ys = np.ascontiguousarray(ys, np.int32)
    xs = np.ascontiguousarray(xs, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    lib().ct_splat_weighted(
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _ptr(vals), ys.shape[0], h, w, sigma,
        -1 if radius is None else int(radius), scale, _ptr(out),
    )
    return out


def density_splat(
    points: np.ndarray, h: int, w: int, sigma: float,
    radius: Optional[int], scale: float,
) -> np.ndarray:
    out = np.empty((h, w), np.float32)
    pts = np.ascontiguousarray(points, np.float32).reshape(-1, 2)
    lib().ct_density_splat(
        _ptr(pts), pts.shape[0], h, w, sigma,
        -1 if radius is None else int(radius), scale, _ptr(out),
    )
    return out

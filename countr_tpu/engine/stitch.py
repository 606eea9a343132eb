"""Sliding-window geometry and overlap-stitch weights.

The reference counts an arbitrary-width image by running a 384-wide
window at stride 128 and blending each new window into the running
density map: the region overlapping the *previous* window is averaged
(old/2 + new/2) and the fresh region is added at full weight, with the
final window snapped left to end exactly at w-1 (reference:
FSC_test_cross(few-shot).py:294-349). That sequential scheme is a
linear function of the per-window outputs, so we precompute a
per-window, per-column weight matrix once per width (host, numpy) and
the device reduces all windows in one shot:

    density[:, c] = sum_i  W[i, c] * out_i[:, c - start_i]

This turns ceil((w-384)/128)+1 serial model calls + Python blending
into ONE batched forward + one weighted reduction — the reference's #1
throughput defect (SURVEY.md §3.3).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Tuple

import numpy as np

from countr_tpu.config import STRIDE, WINDOW


def window_starts(w: int, window: int = WINDOW, stride: int = STRIDE) -> List[int]:
    """Window start columns for image width ``w``, replicating the
    reference loop exactly, including the tail snap to ``w-window``
    (reference: FSC_test_cross(few-shot).py:343-349).

    Width < window yields no windows — the reference's behavior for
    narrow images (its while loop never runs)."""
    starts: List[int] = []
    start = 0
    while start + window - 1 < w:
        starts.append(start)
        start += stride
        if start + window - 1 >= w:
            if start == w - window + stride:
                break
            start = w - window
    return starts


@lru_cache(maxsize=256)
def stitch_weights(
    w: int, window: int = WINDOW, stride: int = STRIDE
) -> Tuple[Tuple[int, ...], np.ndarray]:
    """Per-window column weights reproducing the reference's sequential
    halve-the-overlap blending as a single weighted sum.

    Returns (starts, weights[n_win, w]) with weights[i, c] = 0 outside
    window i's span. Derived by simulating the sequential update
    symbolically: before window i is blended in, every accumulated
    weight on columns [start_i, prev_i] is halved, then window i
    contributes 1/2 on its overlap part and 1 on its fresh part."""
    starts = window_starts(w, window, stride)
    n = len(starts)
    wt = np.zeros((n, w), dtype=np.float64)
    prev = -1
    for i, s in enumerate(starts):
        # overlap region = columns [s, prev]; fresh = (prev, s+window)
        if prev >= s:
            wt[: i, s : prev + 1] *= 0.5
            wt[i, s : prev + 1] = 0.5
            wt[i, prev + 1 : s + window] = 1.0
        else:
            wt[i, s : s + window] = 1.0
        prev = s + window - 1
    return tuple(starts), wt.astype(np.float32)


def stitch(outputs: np.ndarray, starts, weights: np.ndarray, w: int) -> np.ndarray:
    """Blend per-window densities [n, H, window] into [H, w] using the
    precomputed weights (numpy reference path; the device engine does
    the same contraction on-TPU)."""
    n, h, win = outputs.shape
    acc = np.zeros((h, w), dtype=np.float64)
    for i, s in enumerate(starts):
        acc[:, s : s + win] += outputs[i] * weights[i, s : s + win]
    return acc.astype(np.float32)


def resample_maps(
    src: int, dst: int, offset: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cv2 INTER_LINEAR (half-pixel, edge-clamped) 2-tap maps for a 1-D
    resize src -> dst: returns (idx0, idx1, w1) with
    out[j] = (1-w1[j])*x[idx0[j]] + w1[j]*x[idx1[j]].

    ``offset`` shifts the tap indices into a containing array (grid-mode
    crops are resized in place inside the full source image; clamping
    happens at the CROP edges, exactly like cv2.resize on the cropped
    view — reference: FSC_test_cross(few-shot).py:288)."""
    j = np.arange(dst, dtype=np.float64)
    f = (j + 0.5) * (src / dst) - 0.5
    s = np.floor(f).astype(np.int64)
    f = (f - s).astype(np.float32)
    lo = s < 0
    s[lo] = 0
    f[lo] = 0.0
    hi = s >= src - 1
    s[hi] = src - 1
    f[hi] = 0.0
    i1 = np.minimum(s + 1, src - 1)
    return (
        (s + offset).astype(np.int32),
        (i1 + offset).astype(np.int32),
        f,
    )


def grid_crop_boxes(h: int, w: int) -> List[Tuple[int, int, int, int]]:
    """The 3x3 grid-mode crop rectangles (top, left, ch, cw), in the
    reference's crop order — the LAST one feeds test-time normalization
    (reference: FSC_test_cross(few-shot).py:276-284)."""
    h3, w3 = h // 3, w // 3
    tl = [
        (0, 0), (h3, 0), (0, w3), (h3, w3), (2 * h // 3, 0),
        (2 * h // 3, w3), (0, 2 * w // 3), (h3, 2 * w // 3),
        (2 * h // 3, 2 * w // 3),
    ]
    return [(t, l, h3, w3) for t, l in tl]

"""Stitch-weight parity vs a direct sequential transcription of the
reference's blending loop (FSC_test_cross(few-shot).py:294-349)."""

import numpy as np
import pytest

from countr_tpu.engine.stitch import (
    grid_crop_boxes, stitch, stitch_weights, window_starts,
)


def _sequential_blend(outputs_by_start, w, h=8, window=384, stride=128):
    """Direct numpy rendering of the reference's sequential update:
    walk the windows with the same control flow, averaging the overlap
    with the previous window and adding the fresh region."""
    density = np.zeros((h, w), np.float64)
    start, prev = 0, -1
    while start + window - 1 < w:
        out = outputs_by_start[start].astype(np.float64)
        n_overlap = prev - start + 1  # columns overlapping the previous window
        upd = density.copy()
        if n_overlap > 0:
            upd[:, start : prev + 1] = (
                density[:, start : prev + 1] / 2 + out[:, :n_overlap] / 2
            )
            upd[:, prev + 1 : start + window] = (
                density[:, prev + 1 : start + window] + out[:, n_overlap:]
            )
        else:
            upd[:, start : start + window] = (
                density[:, start : start + window] + out
            )
        density = upd
        prev = start + window - 1
        start += stride
        if start + window - 1 >= w:
            if start == w - window + stride:
                break
            start = w - window
    return density.astype(np.float32)


@pytest.mark.parametrize("w", [384, 416, 512, 600, 640, 768, 1024, 1392])
def test_stitch_matches_sequential(rng, w):
    starts, weights = stitch_weights(w)
    outs = {s: rng.standard_normal((8, 384)).astype(np.float32) for s in starts}
    want = _sequential_blend(outs, w)
    got = stitch(np.stack([outs[s] for s in starts]), starts, weights, w)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_window_starts_sequences():
    assert window_starts(384) == [0]
    assert window_starts(512) == [0, 128]
    assert window_starts(640) == [0, 128, 256]
    # non-aligned tail snaps to w-384
    assert window_starts(600) == [0, 128, 216]
    assert window_starts(416) == [0, 32]
    # narrower than a window: no windows (reference behavior)
    assert window_starts(368) == []


def test_stitch_matches_sequential_full_sweep(rng):
    """Exhaustive width sweep (every multiple of 16 the test pipeline
    can produce up to 2048) against the sequential oracle on a thin
    strip — catches any off-by-one in the tail-snap arithmetic."""
    for w in range(384, 2049, 16):
        starts, weights = stitch_weights(w)
        outs = {s: rng.standard_normal((1, 384)).astype(np.float32) for s in starts}
        want = _sequential_blend(outs, w, h=1)
        got = stitch(np.stack([outs[s] for s in starts]), starts, weights, w)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5, err_msg=str(w))


def test_weights_sum_to_one_in_covered_region():
    """Every covered column's weights must sum to 1 — the blend is an
    average, so total mass is conserved."""
    for w in (384, 512, 600, 1024):
        starts, weights = stitch_weights(w)
        np.testing.assert_allclose(weights.sum(0), np.ones(w), atol=1e-6)


def test_grid_crop_boxes_order_and_cover():
    crops = grid_crop_boxes(384, 600)
    assert len(crops) == 9
    # last crop is the bottom-right one — it feeds TTN in grid mode
    assert crops[-1] == (256, 400, 128, 200)
    assert crops[0] == (0, 0, 128, 200)

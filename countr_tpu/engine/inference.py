"""Vectorized counting inference engine.

Replaces the reference's per-window synchronous Python loop
(reference: FSC_test_cross(few-shot).py:294-349 — one blocking model
call per 384-wide window, x9 in grid mode) with a TPU-native design:

1. exemplar crops are embedded ONCE per image;
2. every sliding window (and all 9 grid crops' windows) is gathered
   into fixed-shape batches of ``batch_windows`` and run through a
   single jitted forward — one compiled program, full MXU occupancy;
3. the reference's sequential overlap-halving blend is applied as a
   precomputed weight contraction (countr_tpu.engine.stitch).

Behavioral parity knobs reproduced exactly:
- tiny-exemplar (<10x10) detection triggering 3x3 grid subdivision
  (reference: FSC_test_cross(few-shot).py:264-284);
- test-time normalization: divide by mean exemplar-box density of the
  *last* computed density map when it exceeds 1.8 (reference:
  :353-359 — in grid mode that is the 9th crop's map, a reference
  quirk we keep);
- count readout sum/60 (reference: :319,:351).

Deviation (opt-out via narrow_policy="reference"): images narrower
than 384 get zero windows in the reference (predicted count 0); by
default we pad them to one full window instead.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from countr_tpu.config import DENSITY_SCALE, TTN_THRESHOLD, WINDOW
from countr_tpu.engine.stitch import grid_crop_boxes, stitch, stitch_weights
from countr_tpu.models.countr import CounTR


@dataclasses.dataclass
class CountResult:
    count: float
    density: np.ndarray  # [384, W] stitched map (last grid crop's in grid mode)
    grid_mode: bool
    e_cnt: float  # exemplar-box density (TTN statistic), 0 if disabled
    raw_count: float  # before TTN division
    n_windows: int  # total model-forward windows spent


def small_exemplar_count(rects: Sequence[Sequence[int]]) -> int:
    """Number of tiny exemplars among the first 3 rects
    (reference: FSC_test_cross(few-shot).py:264-271). rects are
    (y1, x1, y2, x2) in resized-image coordinates."""
    s_cnt = 0
    for rect in list(rects)[:3]:
        if rect[2] - rect[0] < 10 and rect[3] - rect[1] < 10:
            s_cnt += 1
    return s_cnt


class CountingEngine:
    """Counts objects in H=384, variable-width images.

    Parameters
    ----------
    model, params: the CounTR flax model and its param pytree.
    batch_windows: device batch size for window forwards. All forwards
        run at exactly this shape -> one XLA program.
    normalization: apply test-time normalization (reference default).
    max_s_cnt: grid-mode trigger threshold (reference --max_s_cnt=1).
    """

    def __init__(
        self,
        model: CounTR,
        params,
        *,
        batch_windows: int = 32,
        normalization: bool = True,
        max_s_cnt: int = 1,
        narrow_policy: str = "pad",
    ):
        self.model = model
        self.params = params
        self.batch_windows = batch_windows
        self.normalization = normalization
        self.max_s_cnt = max_s_cnt
        assert narrow_policy in ("pad", "reference")
        self.narrow_policy = narrow_policy

        def _fwd(params, windows, y):
            return model.apply(params, windows, y, method=CounTR.forward_tokens)

        self._fwd = jax.jit(_fwd)

        def _exemplars(params, boxes, shot_num):
            return model.apply(
                params, boxes, shot_num, method=CounTR.encode_exemplars
            )

        self._exemplars = jax.jit(_exemplars, static_argnums=(2,))

        def _grid_resize(crops, out_w):
            # [9, h/3, w/3, 3] -> [9, 384, out_w, 3], bilinear matching
            # the reference's tensor Resize (align_corners=False).
            return jax.image.resize(
                crops, (crops.shape[0], WINDOW, out_w, 3), method="bilinear",
                antialias=False,
            )

        self._grid_resize = jax.jit(_grid_resize, static_argnums=(1,))

    # ------------------------------------------------------------------
    # Core batched forward
    # ------------------------------------------------------------------

    def _forward_windows(self, windows: np.ndarray, y: jnp.ndarray) -> np.ndarray:
        """Run [n, 384, 384, 3] windows through the model in fixed-size
        chunks of batch_windows; returns [n, 384, 384] densities."""
        n = windows.shape[0]
        b = self.batch_windows
        ny, c = y.shape[1], y.shape[2]
        outs = []
        for i in range(0, n, b):
            chunk = windows[i : i + b]
            pad = b - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)], 0
                )
            yb = jnp.broadcast_to(y[:1], (b, ny, c))
            den = self._fwd(self.params, jnp.asarray(chunk), yb)
            outs.append(np.asarray(den[: b - pad if pad else b]))
        return np.concatenate(outs, 0) if outs else np.zeros((0, WINDOW, WINDOW), np.float32)

    def _sliding_density(
        self, image: np.ndarray, y: jnp.ndarray
    ) -> tuple[np.ndarray, int]:
        """Stitched density map [384, w] for one 384-row image."""
        h, w = image.shape[:2]
        if w < WINDOW:
            if self.narrow_policy == "reference":
                return np.zeros((h, w), np.float32), 0
            padded = np.zeros((h, WINDOW, 3), image.dtype)
            padded[:, :w] = image
            den = self._forward_windows(padded[None], y)[0]
            return den[:, :w].astype(np.float32), 1
        starts, weights = stitch_weights(w)
        windows = np.stack([image[:, s : s + WINDOW] for s in starts])
        dens = self._forward_windows(windows, y)
        return stitch(dens, starts, weights, w), len(starts)

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------

    def exemplar_tokens(
        self, boxes: Optional[np.ndarray], shot_num: int
    ) -> jnp.ndarray:
        """[k, 64, 64, 3] exemplar crops -> [1, max(shot,1), C] tokens."""
        if shot_num > 0:
            assert boxes is not None and boxes.shape[0] >= shot_num
            b = jnp.asarray(boxes[None, :shot_num], jnp.float32)
        else:
            b = jnp.zeros((1, 1, 64, 64, 3), jnp.float32)
        return self._exemplars(self.params, b, shot_num)

    def count(
        self,
        image: np.ndarray,
        boxes: Optional[np.ndarray] = None,
        rects: Sequence[Sequence[int]] = (),
        shot_num: Optional[int] = None,
    ) -> CountResult:
        """Count objects in ``image`` [384, W, 3] float32 in [0,1].

        boxes: [k, 64, 64, 3] exemplar crops (or None for zero-shot);
        rects: exemplar rectangles (y1, x1, y2, x2) in image coords,
        used for grid-mode detection and TTN."""
        if shot_num is None:
            shot_num = 0 if boxes is None else int(boxes.shape[0])
        y = self.exemplar_tokens(boxes, shot_num)
        h, w = image.shape[:2]

        grid_mode = small_exemplar_count(rects) >= self.max_s_cnt
        n_windows = 0
        if grid_mode:
            # 9 non-overlapping crops, each resized back to (h, w) and
            # sliding-window counted; total = sum of the 9 counts
            # (reference: FSC_test_cross(few-shot).py:274-320). All
            # 9 crops' windows ride a single batched forward.
            crops = grid_crop_boxes(h, w)
            ch, cw = crops[0][2], crops[0][3]
            stackc = np.stack(
                [image[t : t + ch, l : l + cw] for (t, l, ch, cw) in crops]
            )
            resized = np.asarray(self._grid_resize(jnp.asarray(stackc), w))
            pred_cnt = 0.0
            density = None
            if w >= WINDOW:
                starts, weights = stitch_weights(w)
                windows = np.stack(
                    [r[:, s : s + WINDOW] for r in resized for s in starts]
                )
                dens = self._forward_windows(windows, y)
                n_windows = windows.shape[0]
                per_crop = dens.reshape(9, len(starts), WINDOW, WINDOW)
                for crop_dens in per_crop:
                    density = stitch(crop_dens, starts, weights, w)
                    pred_cnt += float(density.sum() / DENSITY_SCALE)
            else:
                for r_img in resized:
                    density, nw = self._sliding_density(r_img, y)
                    n_windows += nw
                    pred_cnt += float(density.sum() / DENSITY_SCALE)
        else:
            density, n_windows = self._sliding_density(image, y)
            pred_cnt = float(density.sum() / DENSITY_SCALE)

        raw_cnt = pred_cnt
        e_cnt = 0.0
        if self.normalization:
            # TTN over ALL rects (not capped at 3), mean divisor of 3
            # (reference: FSC_test_cross(few-shot).py:353-359).
            for rect in rects:
                e_cnt += float(
                    density[rect[0] : rect[2] + 1, rect[1] : rect[3] + 1].sum()
                    / DENSITY_SCALE
                )
            e_cnt = e_cnt / 3
            if e_cnt > TTN_THRESHOLD:
                pred_cnt = pred_cnt / e_cnt

        return CountResult(
            count=pred_cnt,
            density=density,
            grid_mode=grid_mode,
            e_cnt=e_cnt,
            raw_count=raw_cnt,
            n_windows=n_windows,
        )

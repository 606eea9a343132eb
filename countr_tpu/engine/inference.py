"""Vectorized counting inference engine.

Replaces the reference's per-window synchronous Python loop
(reference: FSC_test_cross(few-shot).py:294-349 — one blocking model
call per 384-wide window, x9 in grid mode) with a TPU-native design:

1. exemplar crops are embedded ONCE per image;
2. every sliding window (and all 9 grid crops' windows) is gathered
   into fixed-shape batches and run through a single jitted forward;
3. the reference's sequential overlap-halving blend is applied as a
   precomputed weight contraction (countr_tpu.engine.stitch);
4. the batched path (count_batch) keeps images, windows, densities and
   count readout ON DEVICE (countr_tpu.engine.device_pipeline): one
   uint8 image upload, two scalars down per image.

Behavioral parity knobs reproduced exactly:
- tiny-exemplar (<10x10) detection triggering 3x3 grid subdivision
  (reference: FSC_test_cross(few-shot).py:264-284);
- test-time normalization: divide by mean exemplar-box density of the
  *last* computed density map when it exceeds 1.8 (reference:
  :353-359 — in grid mode that is the 9th crop's map, a reference
  quirk we keep);
- count readout sum/60 (reference: :319,:351).

count() is the straight-line single-image path (host stitching) and
doubles as the parity oracle for count_batch in the test suite.

Deviation (opt-out via narrow_policy="reference"): images narrower
than 384 get zero windows in the reference (predicted count 0); by
default we pad them to one full window instead.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from countr_tpu.config import DENSITY_SCALE, TTN_THRESHOLD, WINDOW
from countr_tpu.engine.device_pipeline import DevicePipeline, width_bucket
from countr_tpu.engine.stitch import grid_crop_boxes, stitch, stitch_weights
from countr_tpu.models.countr import CounTR


@dataclasses.dataclass
class CountResult:
    count: float
    density: Optional[np.ndarray]  # [384, W] stitched (grid: last crop's)
    grid_mode: bool
    e_cnt: float  # exemplar-box density (TTN statistic), 0 if disabled
    raw_count: float  # before TTN division
    n_windows: int  # model-forward windows spent


def small_exemplar_count(rects: Sequence[Sequence[int]]) -> int:
    """Number of tiny exemplars among the first 3 rects
    (reference: FSC_test_cross(few-shot).py:264-271). rects are
    (y1, x1, y2, x2) in resized-image coordinates."""
    s_cnt = 0
    for rect in list(rects)[:3]:
        if rect[2] - rect[0] < 10 and rect[3] - rect[1] < 10:
            s_cnt += 1
    return s_cnt


def _as_float(img: np.ndarray) -> np.ndarray:
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    return img.astype(np.float32)


class CountingEngine:
    """Counts objects in H=384, variable-width images.

    Parameters
    ----------
    model, params: the CounTR flax model and its param pytree.
    batch_windows: device batch for window forwards (one XLA program).
    images_bucket: max image rows per device set (shape bucket).
    normalization: apply test-time normalization (reference default).
    max_s_cnt: grid-mode trigger threshold (reference --max_s_cnt=1).
    """

    def __init__(
        self,
        model: CounTR,
        params,
        *,
        batch_windows: int = 16,
        # 48 density rows/set: padding-free middle chunks and ~98% forward
        # -slot occupancy on FSC147-like batches (vs 83% at 16, measured
        # in bench.py's geometry), at ~4% more upload bytes and 2-3 width
        # buckets per batch (fewer compiled programs). Density scratch at
        # the widest bucket is 48*384*768*4B = 54 MB — far from HBM.
        images_bucket: int = 48,
        normalization: bool = True,
        max_s_cnt: int = 1,
        narrow_policy: str = "pad",
        mesh=None,
    ):
        self.model = model
        if mesh is not None and mesh.devices.size > 1:
            # replicate params onto every mesh device ONCE; otherwise
            # each sharded forward re-lays them out from device 0
            from countr_tpu.parallel.mesh import replicated_sharding

            params = jax.device_put(params, replicated_sharding(mesh))
        self.params = params
        self.batch_windows = batch_windows
        self.images_bucket = images_bucket
        self.normalization = normalization
        self.max_s_cnt = max_s_cnt
        assert narrow_policy in ("pad", "reference")
        self.narrow_policy = narrow_policy
        self.h2d_bytes = 0  # pixel+plan upload bytes (bench evidence)

        def _fwd(params, windows, y):
            return model.apply(params, windows, y, method=CounTR.forward_tokens)

        self._fwd = jax.jit(_fwd)

        def _exemplars(params, boxes, shot_num):
            return model.apply(
                params, boxes, shot_num, method=CounTR.encode_exemplars
            )

        self._exemplars = jax.jit(_exemplars, static_argnums=(2,))
        self._pipeline = DevicePipeline(model, params, mesh=mesh)

    # ------------------------------------------------------------------
    # Single-image path (host stitch; parity oracle)
    # ------------------------------------------------------------------

    def _forward_windows(self, windows: np.ndarray, y: jnp.ndarray) -> np.ndarray:
        """[n, 384, 384, 3] windows -> [n, 384, 384] densities, in
        fixed-size chunks of batch_windows."""
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

    def _sliding_density(self, image: np.ndarray, y: jnp.ndarray):
        """Stitched density map [384, w] for one 384-row image."""
        image = _as_float(image)
        h, w = image.shape[:2]
        if w < WINDOW:
            if self.narrow_policy == "reference":
                return np.zeros((h, w), np.float32), 0
            padded = np.zeros((h, WINDOW, 3), np.float32)
            padded[:, :w] = image
            den = self._forward_windows(padded[None], y)[0]
            return den[:, :w].astype(np.float32), 1
        starts, weights = stitch_weights(w)
        windows = np.stack([image[:, s : s + WINDOW] for s in starts])
        dens = self._forward_windows(windows, y)
        return stitch(dens, starts, weights, w), len(starts)

    def exemplar_tokens(
        self, boxes: Optional[np.ndarray], shot_num: int
    ) -> jnp.ndarray:
        """[k, 64, 64, 3] exemplar crops -> [1, max(shot,1), C] tokens."""
        cfg = getattr(self.model, "cfg", None)
        dec_dt = (cfg.decoder_dtype or cfg.dtype) if cfg is not None else None
        bdt = (
            jnp.bfloat16
            if dec_dt is not None and jnp.dtype(dec_dt) == jnp.bfloat16
            else np.float32
        )  # device-side cast is to this dtype anyway — ship 2 B/value
        if shot_num > 0:
            assert boxes is not None and boxes.shape[0] >= shot_num
            b = jnp.asarray(_as_float(boxes)[None, :shot_num].astype(bdt))
        else:
            b = jnp.zeros((1, 1, 64, 64, 3), bdt)
        return self._exemplars(self.params, b, shot_num)

    def count(
        self,
        image: np.ndarray,
        boxes: Optional[np.ndarray] = None,
        rects: Sequence[Sequence[int]] = (),
        shot_num: Optional[int] = None,
    ) -> CountResult:
        """Count objects in ``image`` [384, W, 3] (float in [0,1] or
        uint8). boxes: [k, 64, 64, 3] exemplar crops (None = zero-shot);
        rects: exemplar rectangles (y1, x1, y2, x2) in image coords."""
        if shot_num is None:
            shot_num = 0 if boxes is None else int(boxes.shape[0])
        assert image.shape[0] == WINDOW, (
            f"engine expects H={WINDOW} rows (test-pipeline geometry, "
            f"reference: FSC_test_cross(few-shot).py:148); got {image.shape}"
        )
        y = self.exemplar_tokens(boxes, shot_num)
        image = _as_float(image)
        h, w = image.shape[:2]

        grid_mode = small_exemplar_count(rects) >= self.max_s_cnt
        n_windows = 0
        if grid_mode:
            # 9 crops resized back to (h, w), each sliding-window
            # counted; total = sum of the 9 counts (reference:
            # FSC_test_cross(few-shot).py:274-320). All crops' windows
            # ride one batched forward.
            resized = self._grid_rows(image)
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
            # TTN over ALL rects (not capped at 3), mean divisor 3
            # (reference: FSC_test_cross(few-shot).py:353-359).
            for rect in rects:
                e_cnt += float(
                    density[rect[0] : rect[2] + 1, rect[1] : rect[3] + 1].sum()
                    / DENSITY_SCALE
                )
            e_cnt = e_cnt / 3
            if e_cnt > TTN_THRESHOLD:
                pred_cnt = pred_cnt / e_cnt

        return CountResult(pred_cnt, density, grid_mode, e_cnt, raw_cnt, n_windows)

    def _grid_rows(self, image: np.ndarray) -> List[np.ndarray]:
        """9 grid crops resized back to full size with cv2 INTER_LINEAR
        (== torch tensor Resize, align_corners=False)."""
        import cv2

        h, w = image.shape[:2]
        out = []
        for (t, l, ch, cw) in grid_crop_boxes(h, w):
            crop = image[t : t + ch, l : l + cw]
            out.append(
                cv2.resize(crop, (w, h), interpolation=cv2.INTER_LINEAR).astype(
                    np.float32
                )
            )
        return out

    # ------------------------------------------------------------------
    # Batched device pipeline (throughput path)
    # ------------------------------------------------------------------

    def count_batch(
        self,
        images: Sequence[np.ndarray],
        boxes_list: Sequence[Optional[np.ndarray]],
        rects_list: Sequence[Sequence[Sequence[int]]],
        shot_num: int,
        return_density: bool = True,
    ) -> List[CountResult]:
        """Count a batch of images entirely on device. All images share
        one static shot_num (bucket by shot count in the caller)."""
        for img in images:
            assert img.shape[0] == WINDOW, (
                f"engine expects H={WINDOW} rows; got {img.shape}"
            )
        results: List[Optional[CountResult]] = [None] * len(images)
        # Device work for every set is dispatched before any host
        # readback, so uploads overlap compute.
        pending = [
            self._dispatch_set(
                set_idx, images, boxes_list, rects_list, shot_num,
                return_density,
            )
            for set_idx in self.plan_batch_sets(images, rects_list)
        ]
        for handle in pending:
            self._collect_set(handle, rects_list, return_density, results)
        return results  # type: ignore[return-value]

    def plan_batch_sets(self, images, rects_list) -> List[List[int]]:
        """Pack a batch into device sets: sort by width so each set pads
        to a nearby bucket (low H2D waste) while staying full, then
        greedy-pack into sets bounded by the row bucket (a grid-mode
        image consumes 9 density rows). Window-aware boundaries: when a
        set fills, it is cut at the LATEST prefix whose total forward-
        window count is a multiple of batch_windows (images after the
        cut carry into the next set) — with the unified chunk stream
        (device_pipeline.stream_chunks) such a set runs zero padded
        forward slots and no below-peak tail batch. Exposed so bench.py
        can time the exact production set composition."""
        b = self.batch_windows
        order = sorted(range(len(images)), key=lambda i: images[i].shape[1])

        def rows_wins(i):
            return self.windows_per_image(images[i].shape[1], rects_list[i])

        sets: List[List[int]] = []
        cur: List[int] = []
        rows_used = 0
        wins_after: List[int] = []  # cumulative windows after cur[k]
        rows_after: List[int] = []
        for i in order:
            need, wins = rows_wins(i)
            if cur and rows_used + need > self.images_bucket:
                # Cut at the latest zero-tail prefix, as long as it
                # keeps the set reasonably full (>= half the row
                # budget) — a too-early cut would trade tail slots for
                # extra per-set overhead (upload bucket, finalize).
                cut = len(cur)
                for k in range(len(cur), 0, -1):
                    if (
                        wins_after[k - 1] % b == 0
                        and wins_after[k - 1] > 0
                        and rows_after[k - 1] * 2 >= self.images_bucket
                        # carried-over images + the pending one still fit
                        and rows_used - rows_after[k - 1] + need
                        <= self.images_bucket
                    ):
                        cut = k
                        break
                sets.append(cur[:cut])
                cur = cur[cut:]
                wbase = wins_after[cut - 1] if cut else 0
                rbase = rows_after[cut - 1] if cut else 0
                wins_after = [wa - wbase for wa in wins_after[cut:]]
                rows_after = [ra - rbase for ra in rows_after[cut:]]
                rows_used -= rbase
            cur.append(i)
            rows_used += need
            wins_after.append((wins_after[-1] if wins_after else 0) + wins)
            rows_after.append(rows_used)
        if cur:
            sets.append(cur)
        return sets

    def _row_bucket(self, n_rows: int) -> int:
        """Graduated row buckets: a partial set uploads (and
        finalizes) at the smallest bucket that fits, instead of
        zero-padding all the way to images_bucket."""
        b = 4
        while b < n_rows:
            b *= 2
        return min(max(b, 4), max(self.images_bucket, n_rows))

    def windows_per_image(self, width: int, rects) -> Tuple[int, int]:
        """(density_rows, forward_windows) one image contributes to a
        set — THE single source of truth shared by the set packer
        (plan_batch_sets) and asserted against what _plan_set actually
        emits, so the packer's zero-tail cuts can never silently drift
        off batch boundaries if window generation changes."""
        from countr_tpu.engine.stitch import window_starts

        if width >= WINDOW:
            nw = len(window_starts(width))
        else:
            nw = 0 if self.narrow_policy == "reference" else 1
        if small_exemplar_count(rects) >= self.max_s_cnt:
            return 9, 9 * nw  # 3x3 grid: 9 density rows, 9x windows
        return 1, nw

    def _plan_set(self, idxs, images, boxes_list, rects_list, shot_num):
        """Host-side set assembly (no device work): upload rows,
        exemplar crop stack, window plan, rect arrays, and row
        bookkeeping. Shared by the dispatch path and the benchmark's
        fused device-pipeline timer (bench.py), so the timed pipeline
        is plan-for-plan the production one."""
        from countr_tpu.engine.stitch import resample_maps

        n_img = len(idxs)
        grid_flags = {
            i: small_exemplar_count(rects_list[i]) >= self.max_s_cnt for i in idxs
        }
        u_bucket = self._row_bucket(n_img)
        n_den = sum(9 if grid_flags[i] else 1 for i in idxs)
        r_bucket = self._row_bucket(n_den)
        # encode_exemplars casts boxes to the decoder dtype on device
        # (models/countr.py), so when that dtype is bf16 the cast is
        # done HOST-side and the upload ships 2 bytes/value — bit-
        # identical results, and the box stack is the largest per-image
        # payload after the pixels (3x64x64x3 floats/image).
        cfg = getattr(self.model, "cfg", None)
        dec_dt = (cfg.decoder_dtype or cfg.dtype) if cfg is not None else None
        bdt = (
            jnp.bfloat16
            if dec_dt is not None and jnp.dtype(dec_dt) == jnp.bfloat16
            else np.float32
        )
        if shot_num > 0:
            bstack = np.stack(
                [_as_float(boxes_list[i])[:shot_num] for i in idxs]
            ).astype(bdt)
            bstack = np.concatenate(
                [bstack, np.zeros((u_bucket - n_img, *bstack.shape[1:]), bdt)], 0
            )
        else:
            bstack = np.zeros((u_bucket, 1, 64, 64, 3), bdt)

        # ONE flat pixel pool per set: every image's pixels concatenated
        # along the width axis, [384, Wt, 3] — windows slice absolute
        # columns, so no per-image row- or width-bucket padding is ever
        # uploaded (the old [U, 384, Wb] layout re-sent ~16% padding per
        # image; the flat pool pads only the set total to a 2048-column
        # bucket, ~2%). Grid-mode crops are resized ON DEVICE from the
        # pool, so uint8 uploads survive mixed sets.
        use_u8 = all(images[i].dtype == np.uint8 for i in idxs)
        max_w = max(images[i].shape[1] for i in idxs)
        wb = width_bucket(max(max_w, WINDOW))
        dtype = np.uint8 if use_u8 else np.float32
        alloc = [max(images[i].shape[1], WINDOW) for i in idxs]
        base = np.zeros(n_img, np.int64)
        base[1:] = np.cumsum(alloc)[:-1]
        wt = -(-int(sum(alloc)) // 2048) * 2048
        stackr = np.zeros((WINDOW, wt, 3), dtype)
        for p, i in enumerate(idxs):
            img = images[i] if use_u8 else _as_float(images[i])
            stackr[:, base[p] : base[p] + img.shape[1]] = img

        # Window plan: plain sliding windows first, then grid-mode
        # resampled windows (the device pipeline switches extraction
        # kernels at the boundary). abs_start / ix taps are ABSOLUTE
        # pool columns (image base + in-image offset).
        plain = {
            "img_owner": [], "den_owner": [], "den_start": [], "wcol": [],
            "abs_start": [],
        }
        rs = {
            "img_owner": [], "den_owner": [], "den_start": [], "wcol": [],
            "ix0": [], "ix1": [], "wx1": [], "iy0": [], "iy1": [], "wy1": [],
        }
        img_rows: dict = {}  # image idx -> [(density_row, true_w)]
        den_owner_img: List[int] = []  # image idx per density row
        n_den_rows = 0

        def window_cols(true_w):
            """(start, wcol[384]) pairs for one row of width true_w."""
            if true_w < WINDOW:
                if self.narrow_policy == "reference":
                    return []
                wcol = np.zeros(WINDOW, np.float32)
                wcol[:true_w] = 1.0
                return [(0, wcol)]
            starts, weights = stitch_weights(true_w)
            return [(s, weights[k, s : s + WINDOW]) for k, s in enumerate(starts)]

        for p, i in enumerate(idxs):
            true_w = images[i].shape[1]
            if not grid_flags[i]:
                den_row = n_den_rows
                n_den_rows += 1
                img_rows.setdefault(i, []).append((den_row, true_w))
                den_owner_img.append(i)
                for s, wcol in window_cols(true_w):
                    plain["img_owner"].append(p)
                    plain["den_owner"].append(den_row)
                    plain["den_start"].append(s)
                    plain["abs_start"].append(int(base[p]) + s)
                    plain["wcol"].append(wcol)
                continue
            for (t, l, ch, cw) in grid_crop_boxes(WINDOW, true_w):
                den_row = n_den_rows
                n_den_rows += 1
                img_rows.setdefault(i, []).append((den_row, true_w))
                den_owner_img.append(i)
                iy0, iy1, wy1 = resample_maps(ch, WINDOW, t)
                xi0, xi1, xw1 = resample_maps(cw, true_w, l)
                xi0 = xi0 + int(base[p])
                xi1 = xi1 + int(base[p])
                if true_w < WINDOW:
                    # pad the maps to the window width pointing at the
                    # image's own zero-padded columns (alloc >= WINDOW,
                    # so base+true_w..base+383 exist and hold zeros),
                    # matching the zero-padded narrow window of the
                    # host path.
                    pad = WINDOW - true_w
                    zcol = np.full(pad, int(base[p]) + true_w, np.int32)
                    xi0 = np.concatenate([xi0, zcol])
                    xi1 = np.concatenate([xi1, zcol])
                    xw1 = np.concatenate([xw1, np.zeros(pad, np.float32)])
                for s, wcol in window_cols(true_w):
                    rs["img_owner"].append(p)
                    rs["den_owner"].append(den_row)
                    rs["den_start"].append(s)
                    rs["wcol"].append(wcol)
                    rs["ix0"].append(xi0[s : s + WINDOW])
                    rs["ix1"].append(xi1[s : s + WINDOW])
                    rs["wx1"].append(xw1[s : s + WINDOW])
                    rs["iy0"].append(iy0)
                    rs["iy1"].append(iy1)
                    rs["wy1"].append(wy1)

        n_plain = len(plain["img_owner"])
        # The packer (plan_batch_sets) sized this set with
        # windows_per_image; the emitted plan must agree or its
        # zero-tail cuts silently stop landing on batch boundaries.
        expect = sum(
            self.windows_per_image(images[i].shape[1], rects_list[i])[1]
            for i in idxs
        )
        assert n_plain + len(rs["img_owner"]) == expect, (
            f"window plan emitted {n_plain + len(rs['img_owner'])} windows "
            f"but windows_per_image predicts {expect} — update "
            f"windows_per_image to match the generation change"
        )
        plan = {
            "n_plain": n_plain,
            "img_owner": np.asarray(
                plain["img_owner"] + rs["img_owner"], np.int32
            ),
            "den_owner": np.asarray(
                plain["den_owner"] + rs["den_owner"], np.int32
            ),
            "den_start": np.asarray(
                plain["den_start"] + rs["den_start"], np.int32
            ),
            # absolute pool column per PLAIN window (rs windows carry
            # absolute taps in ix0/ix1 instead)
            "abs_start": np.asarray(plain["abs_start"], np.int32),
            "wcol": (
                np.stack(plain["wcol"] + rs["wcol"])
                if (plain["wcol"] or rs["wcol"])
                else np.zeros((0, WINDOW), np.float32)
            ),
        }
        for k in ("ix0", "ix1", "wx1", "iy0", "iy1", "wy1"):
            plan[k] = (
                np.stack(rs[k]).astype(
                    np.float32 if k in ("wx1", "wy1") else np.int32
                )
                if rs[k]
                else np.zeros(
                    (0, WINDOW),
                    np.float32 if k in ("wx1", "wy1") else np.int32,
                )
            )

        # rects per DENSITY row (the owning image's rects; all of them —
        # the reference TTN loop is uncapped).
        k_max = max(1, max(len(rects_list[i]) for i in idxs))
        rects_arr = np.zeros((r_bucket, k_max, 4), np.int32)
        rects_valid = np.zeros((r_bucket, k_max), np.float32)
        for ridx, im in enumerate(den_owner_img):
            for k, rect in enumerate(rects_list[im]):
                rects_arr[ridx, k] = rect
                rects_valid[ridx, k] = 1.0

        return {
            "stackr": stackr,
            "bstack": bstack,
            "plan": plan,
            "rects_arr": rects_arr,
            "rects_valid": rects_valid,
            "u_bucket": u_bucket,
            "r_bucket": r_bucket,
            "den_width": wb,
            "img_rows": img_rows,
            "grid_flags": grid_flags,
            "den_owner_img": den_owner_img,
        }

    def _dispatch_set(
        self, idxs, images, boxes_list, rects_list, shot_num, return_density
    ):
        sp = self._plan_set(idxs, images, boxes_list, rects_list, shot_num)
        plan = sp["plan"]
        # Exemplar tokens for the set in one batched CNN call (padded to
        # the upload-row bucket for a single compiled shape).
        y_img = self._exemplars(
            self.params, jnp.asarray(sp["bstack"]), shot_num
        )
        self.h2d_bytes += (
            sp["stackr"].nbytes + sp["bstack"].nbytes
            + sp["rects_arr"].nbytes + sp["rects_valid"].nbytes
        )
        self.h2d_bytes += sum(
            v.nbytes for k, v in plan.items() if k != "n_plain"
        )
        counts_dev, esum_dev, density_dev = self._pipeline.run(
            sp["stackr"],
            y_img,
            plan,
            sp["rects_arr"],
            sp["rects_valid"],
            sp["r_bucket"],
            self.batch_windows,
            want_density=return_density,
            den_width=sp["den_width"],
        )
        win_per_row: dict = {}
        for o in plan["den_owner"]:
            o = int(o)
            win_per_row[o] = win_per_row.get(o, 0) + 1
        return (
            idxs, sp["img_rows"], sp["grid_flags"], win_per_row, counts_dev,
            esum_dev, density_dev,
        )

    def _collect_set(self, handle, rects_list, return_density, results) -> None:
        (idxs, img_rows, grid_flags, win_per_row, counts_dev, esum_dev,
         density_dev) = handle
        counts = np.asarray(counts_dev)
        esum = np.asarray(esum_dev)
        density = np.asarray(density_dev) if density_dev is not None else None
        for i in idxs:
            rws = img_rows[i]
            raw = float(sum(counts[r] for (r, _) in rws))
            last_row, last_w = rws[-1]
            n_win = sum(win_per_row.get(r, 0) for (r, _) in rws)
            e_cnt = 0.0
            pred = raw
            if self.normalization:
                e_cnt = float(esum[last_row]) / 3
                if e_cnt > TTN_THRESHOLD:
                    pred = raw / e_cnt
            den = None
            if return_density and density is not None:
                den = density[last_row][:, :last_w]
            results[i] = CountResult(
                pred, den, grid_flags[i], e_cnt, raw, n_win
            )


def count_image(
    engine: CountingEngine,
    image,
    boxes_xyxy: Sequence[Sequence[float]] = (),
) -> CountResult:
    """One-call counting of a RAW image (the library equivalent of the
    reference demos' load_image + run_one_image, reference:
    demo.py:34-189, demo_zero.py:41-88).

    image: PIL.Image, path string, or HWC uint8/float array at any
    resolution. boxes_xyxy: exemplar boxes (x1, y1, x2, y2) in ORIGINAL
    image pixels; empty = zero-shot. Applies the test-pipeline geometry
    (H=384, W snapped to a multiple of 16), crops exemplars, and runs
    the batched sliding-window engine with TTN/grid-mode per the engine
    settings.
    """
    from PIL import Image as PILImage

    if isinstance(image, str):
        image = PILImage.open(image)
    if isinstance(image, np.ndarray):
        arr = image
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
        image = PILImage.fromarray(arr)
    if image.mode != "RGB":
        image = image.convert("RGB")

    from countr_tpu.data import transforms as T

    w0, h0 = image.size
    nh, nw = T.test_size(h0, w0)
    sy, sx = nh / h0, nw / w0
    resized = T.pil_resize(image, nh, nw)
    rects = [
        [int(y1 * sy), int(x1 * sx), int(y2 * sy), int(x2 * sx)]
        for (x1, y1, x2, y2) in boxes_xyxy
    ]
    boxes = T.crop_exemplars(resized, rects, max_boxes=len(rects)) if rects else None
    return engine.count(resized, boxes, rects, shot_num=len(rects))

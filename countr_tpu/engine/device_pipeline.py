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


def stream_chunks(n_plain: int, n: int, b: int, multiple: int = 1):
    """Unified chunking of the FULL window stream (plain windows
    [0, n_plain) then resampled [n_plain, n)): yields (i, j, bk) spans
    over the combined list, so at most ONE chunk straddles the
    plain/resampled boundary (extracting each part with its own kernel
    and concatenating) and a set pays ONE graduated tail instead of
    two. With the window-aware set packer (CountingEngine
    .plan_batch_sets) landing set totals on multiples of b, every chunk
    of a non-final set is a FULL b — zero padded forward slots."""
    for off, bk in chunk_plan(n, b, multiple):
        yield off, min(off + bk, n), bk


def chunk_plan(n: int, b: int, multiple: int = 1):
    """(offset, batch_bucket) chunks covering n windows: full chunks of
    b, then ONE graduated tail bucket from {4, 8, 16, 24, ...} — so a
    33-window phase runs 32+4 forward slots instead of 32+32. Padding
    waste was the pipeline's dominant cost on small sets (bench r4: a
    16-row set with 33 windows ran at 350 w/s against a 706 w/s forward
    ceiling purely from 31 padded slots). The tail bucket is rounded up
    to ``multiple`` (the mesh size on sharded runs) and capped at b;
    each distinct bucket is one extra compiled forward, amortized by the
    persistent compile cache."""
    out = []
    i = 0
    while i + b <= n:
        out.append((i, b))
        i += b
    tail = n - i
    if tail > 0:
        for s in (4, 8, 16, 24):
            if tail <= s and s <= b and s % max(multiple, 1) == 0:
                out.append((i, s))
                break
        else:
            out.append((i, b))
    return out


def extract_windows(images: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """Flat pixel pool [384, Wt, C] (uint8 or float) -> [B, 384, 384, C]
    float windows; ``starts`` are ABSOLUTE pool columns (image base +
    window offset, precomputed on host). The pool concatenates every
    image of a set along the width axis — no per-image row or width
    padding ever crosses the link, only the set-total column bucket
    (~2% vs the ~16% the old [U, 384, Wb] layout re-uploaded per image).

    uint8 inputs are converted to float/255 AFTER the slice so the big
    array stays 1 byte/pixel in HBM."""

    def get(s):
        return jax.lax.dynamic_slice_in_dim(images, s, WINDOW, axis=1)

    win = jax.vmap(get)(starts)
    if win.dtype == jnp.uint8:
        win = win.astype(jnp.float32) / 255.0
    return win.astype(jnp.float32)


def extract_windows_resampled(
    images: jnp.ndarray,  # [384, Wt, C] flat pool, uint8 or float
    ix0: jnp.ndarray,  # [B, 384] int32 left column tap (absolute pool col)
    ix1: jnp.ndarray,  # [B, 384] int32 right column tap
    wx1: jnp.ndarray,  # [B, 384] f32 weight of the right tap
    iy0: jnp.ndarray,  # [B, 384] int32 top row tap
    iy1: jnp.ndarray,  # [B, 384] int32 bottom row tap
    wy1: jnp.ndarray,  # [B, 384] f32 weight of the bottom tap
) -> jnp.ndarray:
    """Window extraction fused with a bilinear resample: each output
    pixel is a separable 2-tap lerp over source pixels, with the tap
    indices/weights precomputed on host (cv2 INTER_LINEAR half-pixel
    semantics; column taps are absolute pool columns). Grid-mode's 9
    crop-resizes (reference: FSC_test_cross(few-shot).py:274-288,
    transforms.Resize on tensors) run on device straight from the ONE
    uint8 upload of the source image — no host cv2 resize, no float32
    H2D. A plain sliding window is the identity map (ix0 == ix1 ==
    base+start+arange, weights 0)."""

    def get(cx0, cx1, cwx, ry0, ry1, rwy):
        c0 = jnp.take(images, cx0, axis=1)  # [384, 384, C]
        c1 = jnp.take(images, cx1, axis=1)
        if c0.dtype == jnp.uint8:
            c0 = c0.astype(jnp.float32) / 255.0
            c1 = c1.astype(jnp.float32) / 255.0
        row = c0 + (c1 - c0) * cwx[None, :, None]
        r0 = jnp.take(row, ry0, axis=0)
        r1 = jnp.take(row, ry1, axis=0)
        return r0 + (r1 - r0) * rwy[:, None, None]

    win = jax.vmap(get)(ix0, ix1, wx1, iy0, iy1, wy1)
    return win.astype(jnp.float32)


def accumulate(
    density: jnp.ndarray,  # [R, 384, Wb] f32
    dens: jnp.ndarray,  # [B, 384, 384] window densities
    owners: jnp.ndarray,  # [B] int32
    starts: jnp.ndarray,  # [B] int32
    wcols: jnp.ndarray,  # [B, 384] f32 stitch weights (0 for padding)
) -> jnp.ndarray:
    """Weighted scatter-add of window densities into per-image maps.

    Deliberately a fori_loop of contiguous-block read-modify-writes.
    Two parallel alternatives were measured on v5e and rejected: a
    jnp .at[].add scatter with per-element indices (~35% SLOWER
    end-to-end; TPU scatter is element-addressed, dynamic_update_slice
    is a block copy), and an MXU formulation placing windows via a
    [B,384,Wb] shifted-diagonal matmul plus an owner one-hot reduce
    (578 vs 582 windows/s — identical within noise; this stage is
    ~2% of chunk time either way)."""

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
    FSC_test_cross(few-shot).py:353-359). Bounds are inclusive like the
    reference's [y1:y2+1, x1:x2+1] slicing.

    ONE bandwidth-bound pass: rect sums as a batched masked matmul
    (density [R,h,wb] x column masks [R,wb,K+1] -> per-row column sums,
    then row-masked reduce), with an all-ones extra "rect" yielding the
    total count from the same read. The earlier integral-image
    formulation streamed the density three times (two cumsums + the
    count reduce) and measured 1.46 ms/set; this one sits below the
    probe's noise floor (scripts/profile_pipeline.py — full pipeline
    138.2 -> 136.8 ms/set, 650 -> 658 w/s); direct masked sums also
    match the reference's direct slicing more closely than cumsum
    rounding."""
    r, h, wb = density.shape
    k = rects.shape[1]
    y1, x1 = rects[..., 0], rects[..., 1]
    y2, x2 = rects[..., 2], rects[..., 3]
    cols = jnp.arange(wb, dtype=jnp.int32)
    rows = jnp.arange(h, dtype=jnp.int32)
    colmask = (
        (cols[None, None, :] >= x1[..., None])
        & (cols[None, None, :] <= x2[..., None])
    ).astype(density.dtype)  # [R, K, wb]
    rowmask = (
        (rows[None, None, :] >= y1[..., None])
        & (rows[None, None, :] <= y2[..., None])
    ).astype(density.dtype)  # [R, K, h]
    ones = jnp.ones((r, 1, wb), density.dtype)
    # HIGHEST: these contractions carry the f32 counts — the TPU default
    # would run them as bf16 matmuls; the op is bandwidth-bound so the
    # extra MXU passes are free.
    colsums = jnp.einsum(
        "rhw,rkw->rkh", density, jnp.concatenate([colmask, ones], axis=1),
        precision=jax.lax.Precision.HIGHEST,
    )  # [R, K+1, h]
    counts = jnp.sum(colsums[:, k, :], axis=-1) / DENSITY_SCALE
    esum = (
        jnp.einsum(
            "rkh,rkh->rk", colsums[:, :k, :], rowmask,
            precision=jax.lax.Precision.HIGHEST,
        )
        * rect_valid
    ).sum(-1) / DENSITY_SCALE
    return counts, esum


def fused_set_program(model, sp: dict, batch_windows: int, shot_num: int = 3):
    """The ENTIRE per-set device pipeline as one program: exemplar-CNN
    embed + window extraction (plain slices and grid-mode resampled) +
    batched forwards + weighted stitch accumulation + integral-image
    finalize + TTN — built from a production plan
    (``CountingEngine._plan_set``), so it is op-for-op the work
    ``count_batch`` dispatches per set, minus the per-chunk host round
    trips.

    Used by bench.py to measure the full pipeline at device speed with
    the chained-scan methodology (the tunnel RTT makes per-dispatch
    timing meaningless, CLAUDE.md), and by the tests to pin its counts
    equal to ``count_batch``'s.

    Returns ``(args, preds_fn, make_loop)``:
      args: tuple of device arrays (params NOT included — never close
        over params, they would ship as constants in the compile RPC)
      preds_fn(params, *args) -> [n_img] predicted counts (jittable)
      make_loop(iters) -> loop_fn(params, *args) chaining ``iters``
        full-pipeline evaluations with a carry that perturbs the
        resident pixels (data-dependent uint8 delta) and the exemplar
        stack, so XLA cannot hoist any stage out of the scan.
    """
    import numpy as np

    plan = sp["plan"]
    n = plan["img_owner"].shape[0]
    n_plain = plan["n_plain"]
    b = batch_windows
    idx_imgs = list(sp["img_rows"].keys())
    n_img = len(sp["grid_flags"])
    r_bucket = sp["r_bucket"]
    wb = sp["den_width"]

    def pad_to(arr, m):
        pad = m - arr.shape[0]
        if pad <= 0:
            return arr
        return np.concatenate([arr, np.zeros((pad, *arr.shape[1:]), arr.dtype)], 0)

    # ONE unified chunk stream over the combined window list: pure-plain
    # chunks slice, pure-resampled chunks gather-lerp, and the (at most
    # one) straddling chunk concatenates both extractions — so the set
    # pays a single graduated tail. Per-chunk part sizes are STATIC
    # (chunk_shapes, closed over by preds_fn), only arrays ride the
    # pytree.
    chunks, chunk_shapes = [], []
    for i, j, bk in stream_chunks(n_plain, n, b):
        q = max(0, min(j, n_plain) - i)  # plain members of this chunk
        r = (j - i) - q  # resampled members
        ch = {
            "owners": pad_to(plan["img_owner"][i:j], bk),
            "starts": pad_to(plan["den_start"][i:j], bk),
            "den_own": pad_to(plan["den_owner"][i:j], bk),
            "wcols": pad_to(plan["wcol"][i:j], bk),
        }
        if q:
            ch["abs"] = plan["abs_start"][i : i + q]
        if r:
            lo = max(i, n_plain) - n_plain
            ch["maps"] = [
                plan[k][lo : lo + r]
                for k in ("ix0", "ix1", "wx1", "iy0", "iy1", "wy1")
            ]
        chunks.append(ch)
        chunk_shapes.append((q, r, bk))

    # density row -> position of its owner image in the set (padded
    # rows -> dummy segment n_img); per-image LAST row for the TTN
    # statistic (the reference normalizes by the last computed map,
    # FSC_test_cross(few-shot).py:353-359).
    pos_of = {im: p for p, im in enumerate(idx_imgs)}
    row_owner = np.full(r_bucket, n_img, np.int32)
    for ridx, im in enumerate(sp["den_owner_img"]):
        row_owner[ridx] = pos_of[im]
    last_row = np.zeros(max(n_img, 1), np.int32)
    for im, rws in sp["img_rows"].items():
        last_row[pos_of[im]] = rws[-1][0]

    from countr_tpu.models.countr import CounTR

    def preds_fn(p, images_u8, bstack, chunks, rarr, rvalid,
                 row_owner, last_row):
        y_all = model.apply(p, bstack, shot_num, method=CounTR.encode_exemplars)
        density = jnp.zeros((r_bucket, WINDOW, wb), jnp.float32)
        for ch, (q, r, bk) in zip(chunks, chunk_shapes):
            parts = []
            if q:
                parts.append(extract_windows(images_u8, ch["abs"]))
            if r:
                parts.append(extract_windows_resampled(images_u8, *ch["maps"]))
            win = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
            if bk - (q + r):
                win = jnp.pad(
                    win, ((0, bk - (q + r)), (0, 0), (0, 0), (0, 0))
                )
            dens = model.apply(
                p, win, jnp.take(y_all, ch["owners"], axis=0),
                method=CounTR.forward_tokens,
            )
            density = accumulate(
                density, dens, ch["den_own"], ch["starts"], ch["wcols"]
            )
        counts, esum = finalize(density, rarr, rvalid)
        raw = jax.ops.segment_sum(counts, row_owner, num_segments=n_img + 1)[:n_img]
        e = jnp.take(esum, last_row) / 3.0
        return jnp.where(e > 1.8, raw / jnp.maximum(e, 1e-9), raw)

    def make_loop(iters: int):
        def loop(p, images_u8, bstack, chunks, rarr, rvalid,
                 row_owner, last_row):
            def body(c, _):
                delta = (jnp.abs(c * 1e6) % 2.0).astype(jnp.uint8)
                preds = preds_fn(
                    p, images_u8 + delta,
                    bstack + (c * 1e-12).astype(bstack.dtype),
                    chunks, rarr, rvalid, row_owner, last_row,
                )
                return jnp.sum(preds) * jnp.float32(1e-9), None

            return jax.lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

        return loop

    args = (
        jnp.asarray(sp["stackr"]), jnp.asarray(sp["bstack"]),
        jax.tree.map(jnp.asarray, chunks),
        jnp.asarray(sp["rects_arr"]), jnp.asarray(sp["rects_valid"]),
        jnp.asarray(row_owner), jnp.asarray(last_row),
    )
    return args, preds_fn, make_loop


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
        self._extract_rs = jax.jit(extract_windows_resampled)
        self._accumulate = jax.jit(accumulate, donate_argnums=(0,))
        self._finalize = jax.jit(finalize)

        def extract_mixed(images, abs_s, ix0, ix1, wx1, iy0, iy1, wy1, bk):
            """The straddling chunk: plain slices + resampled gathers
            concatenated, zero-padded to the forward bucket (padded
            slots carry wcol=0 so the accumulate ignores them)."""
            win = jnp.concatenate(
                [
                    extract_windows(images, abs_s),
                    extract_windows_resampled(
                        images, ix0, ix1, wx1, iy0, iy1, wy1
                    ),
                ],
                0,
            )
            pad = bk - win.shape[0]
            if pad:
                win = jnp.pad(win, ((0, pad), (0, 0), (0, 0), (0, 0)))
            return win

        self._extract_mixed = jax.jit(extract_mixed, static_argnums=(8,))

    def run(
        self,
        images_np: np.ndarray,  # [384, Wt, 3] flat pixel pool (uint8/f32)
        y_all: jnp.ndarray,  # [U, ny, C] exemplar tokens per image
        plan: dict,  # window plan (see below)
        rects_np: np.ndarray,  # [R, K, 4] per DENSITY row
        rect_valid_np: np.ndarray,  # [R, K]
        n_den_rows: int,  # R: density rows (9 per grid image, 1 otherwise)
        batch_windows: int,
        want_density: bool,
        den_width: int,  # Wb: density-map column bucket (max true width)
    ):
        """Returns (counts [R], esum [R], density [R,384,Wb] or None) as
        DEVICE arrays (callers fetch after dispatching further sets).

        ``plan`` arrays, one entry per window, PLAIN windows first:
          img_owner [N] int32 — image index (exemplar-token take)
          den_owner [N] int32 — density row the output blends into
          den_start [N] int32 — column offset in the density row
          abs_start [n_plain] int32 — absolute pool column of the window
          wcol [N, 384] f32   — stitch weights (0 on padding)
          n_plain: int        — windows [0, n_plain) are plain slices;
                                the rest carry resample maps
          ix0/ix1/wx1/iy0/iy1/wy1 [N - n_plain, 384] — 2-tap bilinear
                                maps (absolute pool columns) for
                                grid-mode crop windows
        """
        h, wb = WINDOW, den_width
        sharded = self.mesh is not None and batch_windows % self.mesh.devices.size == 0
        if self.mesh is not None and not sharded and not getattr(self, "_warned_unsharded", False):
            import warnings

            self._warned_unsharded = True
            warnings.warn(
                f"batch_windows={batch_windows} is not a multiple of the "
                f"{self.mesh.devices.size}-device mesh; the pipeline falls "
                f"back to SINGLE-device execution. Pick a batch_windows the "
                f"mesh size divides to shard window chunks across devices.",
                stacklevel=2,
            )
        if sharded:
            images = jax.device_put(images_np, self._rsh)
            y_all = jax.device_put(y_all, self._rsh)
        else:
            images = jax.device_put(images_np)
        density = jnp.zeros((n_den_rows, h, wb), jnp.float32)

        b = batch_windows
        n = plan["img_owner"].shape[0]
        n_plain = plan["n_plain"]

        def pad_to(arr, m):
            pad = m - arr.shape[0]
            if pad <= 0:
                return arr
            return np.concatenate(
                [arr, np.zeros((pad, *arr.shape[1:]), arr.dtype)], 0
            )

        mult = self.mesh.devices.size if sharded else 1

        def put(arr):
            dev = jnp.asarray(arr)
            return jax.device_put(dev, self._bsh) if sharded else dev

        # Chunk spans (i, j, bk) over the combined window list. Sharded
        # runs keep two pure streams (every part must stay
        # mesh-divisible); single-device runs chunk the COMBINED stream
        # so at most one straddling chunk replaces two graduated tails
        # (results are chunking-invariant — the stitch weights are
        # per-window).
        if sharded:
            descs = [
                (lo + off, min(lo + off + bk, hi), bk)
                for (lo, hi) in ((0, n_plain), (n_plain, n))
                for off, bk in chunk_plan(hi - lo, b, mult)
            ]
        else:
            descs = list(stream_chunks(n_plain, n, b))

        for i, j, bk in descs:
            q = max(0, min(j, n_plain) - i)  # plain members
            r = (j - i) - q  # resampled members
            owners = put(pad_to(plan["img_owner"][i:j], bk))
            starts = put(pad_to(plan["den_start"][i:j], bk))
            den_own = put(pad_to(plan["den_owner"][i:j], bk))
            wcols = put(pad_to(plan["wcol"][i:j], bk))
            if r == 0:
                abs_s = put(pad_to(plan["abs_start"][i:j], bk))
                windows = self._extract(images, abs_s)
            elif q == 0:
                lo = i - n_plain
                maps = [
                    put(pad_to(plan[k][lo : lo + (j - i)], bk))
                    for k in ("ix0", "ix1", "wx1", "iy0", "iy1", "wy1")
                ]
                windows = self._extract_rs(images, *maps)
            else:
                abs_s = jnp.asarray(plan["abs_start"][i : i + q])
                lo = max(i, n_plain) - n_plain
                maps = [
                    jnp.asarray(plan[k][lo : lo + r])
                    for k in ("ix0", "ix1", "wx1", "iy0", "iy1", "wy1")
                ]
                windows = self._extract_mixed(images, abs_s, *maps, bk)
            dens = self._fwd(self.params, windows, y_all, owners)
            density = self._accumulate(density, dens, den_own, starts, wcols)

        counts, esum = self._finalize(
            density, jnp.asarray(rects_np), jnp.asarray(rect_valid_np)
        )
        return counts, esum, (density if want_density else None)

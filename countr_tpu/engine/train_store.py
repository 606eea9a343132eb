"""Resident-dataset training: the whole train split lives in HBM and
every augmented batch is materialized ON DEVICE from a few scalars per
sample.

Why: the reference (and our host path) re-uploads every augmented
sample as pixels each step (reference dataloader: FSC_finetune_cross.py
:178-210 + util/FSC147.py:117-308). Even with uint8 crops that is
~450 KB/sample/step. FSC147's decoded train split is only ~2.7 GB as
packed uint32 — it fits next to the model in a v5e's 16 GB HBM. This
module uploads it ONCE (a flat [P] uint32 pixel pool, one RGB pixel
packed per 32-bit lane so a random tap is one scalar gather —
scripts/probe_gather.py — + a per-image catalog +
a [N, 3, 64, 64, 3] exemplar-crop pool) and re-creates the reference's
geometric augmentation inside the jitted train step:

  - random-crop path: the full-image affine + horizontal flip + 384
    crop compose into ONE 2x3 map (host computes 6 floats); the device
    bilinear-samples the source image with cv2 semantics
    (BORDER_CONSTANT 0) via 4-tap gathers from the pixel pool.
  - mosaic path: the reference's 2x2 mosaic with linear seam blending
    (util/FSC147.py:177-255, :236-255) is separable per axis, so each
    output pixel is a weighted sum of up to 2x2 cells, each cell a
    2-tap x 2-tap resize of a crop of a resident image. The blend and
    resize index/weight vectors are computed on device from the 5
    scalars per cell (image idx, top, left, length) + blend width.

The photometric chain and density synthesis reuse countr_tpu.ops.augment
(mosaic samples skip photometric, like the reference's clean cells).

Per-step H2D: ~100 floats + the dot coordinates per sample (a few KB) —
three orders of magnitude below pixel shipping.

Multi-chip: pass a mesh to the builders — the pool replicates onto
every device (and every host on a pod, each decoding its own copy like
a DDP rank) while the per-step geometry batch shards on the 'data'
axis; XLA partitions the materialization + model step and emits the
gradient all-reduce exactly as in the host-pipeline path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from countr_tpu.config import EXEMPLAR_SIZE, IMG_SIZE, MAX_SHOTS


# ---------------------------------------------------------------------------
# Store construction (host, once)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TrainStore:
    """Device-resident pixel pool + per-image catalog."""

    ids: List[str]
    pixels: jax.Array  # [P] uint32 flat pool, RGB packed 0x00RRGGBB
    exemplars: jax.Array  # [N, 3, 64, 64, 3] uint8
    base: jax.Array  # [N] int32 offset of image row 0 in the pool
    width: jax.Array  # [N] int32 (row stride)
    height: jax.Array  # [N] int32
    # host mirrors for the dataset's parameter sampling
    h_np: np.ndarray
    w_np: np.ndarray
    index: Dict[str, int]

    @property
    def arrays(self) -> Dict[str, jax.Array]:
        """The device arrays a jitted step takes as ARGUMENTS (never
        close over them — they would ship as constants in the compile
        request on tunneled backends)."""
        return {
            "pixels": self.pixels,
            "exemplars": self.exemplars,
            "base": self.base,
            "width": self.width,
            "height": self.height,
        }


def build_store(meta, ids: List[str], log=print, mesh=None) -> TrainStore:
    """Decode + flex-resize every image once, flatten into the pixel
    pool, crop the (clean-image) exemplars (reference:
    util/FSC147.py:281-299), and upload. With ``mesh``, the pool is
    REPLICATED onto every device (multi-host safe) so the jitted store
    step can shard its geometry batch on the 'data' axis — the mesh
    equivalent of the reference's per-rank dataset copy under DDP
    (reference: FSC_finetune_cross.py:178-210, :229-231)."""
    from countr_tpu.data import transforms as T

    n = len(ids)
    bases = np.zeros(n, np.int64)
    widths = np.zeros(n, np.int32)
    heights = np.zeros(n, np.int32)
    chunks = []
    exemplars = np.zeros((n, MAX_SHOTS, EXEMPLAR_SIZE, EXEMPLAR_SIZE, 3), np.uint8)
    off = 0
    for i, im_id in enumerate(ids):
        img = meta.open_image(im_id)
        w0, h0 = img.size
        nh, nw = T.flex_size(h0, w0)
        u8 = T.pil_resize_u8(img, nh, nw)
        bases[i] = off
        widths[i] = nw
        heights[i] = nh
        off += nh * nw
        chunks.append(u8.reshape(-1, 3))
        anno = meta.annotations[im_id]
        sy, sx = nh / h0, nw / w0
        rects = [
            [int(b[0][1] * sy), int(b[0][0] * sx),
             int(b[2][1] * sy), int(b[2][0] * sx)]
            for b in anno["box_examples_coordinates"][:MAX_SHOTS]
        ]
        crops = T.crop_exemplars_u8(u8, rects)
        exemplars[i, : crops.shape[0]] = np.clip(
            np.rint(crops * 255.0), 0, 255
        ).astype(np.uint8)
        if (i + 1) % 500 == 0:
            log(f"store: decoded {i + 1}/{n} images")
    assert off < 2**31, "pixel pool exceeds int32 indexing"
    # tail pad: mosaic row slices read up to 384 px past a row start;
    # padding keeps the last image's tail slice aligned (dynamic_slice
    # would otherwise clamp the start and shift the content)
    chunks.append(np.zeros((IMG_SIZE, 3), np.uint8))
    pool = _pack_rgb(np.concatenate(chunks, axis=0))
    log(f"store: {n} images, {off * 4 / 1e6:.0f} MB pixels "
        f"+ {exemplars.nbytes / 1e6:.0f} MB exemplars -> device")
    from countr_tpu.parallel.mesh import replicate_to_mesh

    dev = replicate_to_mesh(mesh, {
        "pixels": pool, "exemplars": exemplars,
        "base": bases.astype(np.int32), "width": widths, "height": heights,
    })
    return TrainStore(
        ids=list(ids),
        pixels=dev["pixels"],
        exemplars=dev["exemplars"],
        base=dev["base"],
        width=dev["width"],
        height=dev["height"],
        h_np=heights.copy(),
        w_np=widths.copy(),
        index={im_id: i for i, im_id in enumerate(ids)},
    )


# ---------------------------------------------------------------------------
# Device-side materialization
# ---------------------------------------------------------------------------


def _pack_rgb(u8: np.ndarray) -> np.ndarray:
    """[P, 3] uint8 -> [P] uint32 (0x00RRGGBB). One pixel per 32-bit
    lane: a random tap is ONE scalar gather instead of a padded 3-byte
    row fetch (measured 1.5x faster end-to-end, scripts/probe_gather.py
    — a [P,3] uint8 row take ran 50.7 ms/batch-8 vs 34.0 ms packed)."""
    p = u8.astype(np.uint32)
    return (p[:, 0] << 16) | (p[:, 1] << 8) | p[:, 2]


def _unpack_rgb(v):
    """[...] uint32 -> [..., 3] float32 in [0, 255]."""
    return jnp.stack(
        [(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF], axis=-1
    ).astype(jnp.float32)


def _gather_px(pixels, flat_idx, ok):
    """[...,] int32 pool indices -> float pixels in [0, 255]; ok=0 taps
    read index 0 but contribute 0 (cv2 BORDER_CONSTANT). The /255
    normalization is applied ONCE by the caller on the blended output:
    any extra elementwise op in the per-tap chain after the random
    gather — even a scalar multiply — breaks the backend's gather
    fusion and costs ~65 ms/batch-8 (scripts/probe_affine_seg.py:
    per-tap /255 or *(1/255) 99.9 ms vs mask-only 34.0 ms; end-scale
    34.0 ms)."""
    v = _unpack_rgb(jnp.take(pixels, jnp.where(ok, flat_idx, 0), axis=0))
    return v * ok[..., None].astype(jnp.float32)


def _bilinear_flat(pixels, base, stride, h, w, sx, sy):
    """cv2-style bilinear sample of one resident image at float coords
    (sx, sy) [384, 384], border constant 0. Returns [384, 384, 3]."""
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def tap(yy, xx):
        ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = base + jnp.clip(yy, 0, h - 1) * stride + jnp.clip(xx, 0, w - 1)
        return _gather_px(pixels, idx, ok)

    p00 = tap(y0, x0)
    p01 = tap(y0, x0 + 1)
    p10 = tap(y0 + 1, x0)
    p11 = tap(y0 + 1, x0 + 1)
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    # single end-scale (see _gather_px): bilinear blend is linear, so
    # scaling the output equals scaling the taps up to float ulps
    return (top * (1 - fy) + bot * fy) / 255.0


def _affine_sample(pixels, base, stride, h, w, C, d):
    """Composed affine+flip+crop sample: out(y, x) = src(C @ (x, y) + d)
    — the reference's cv2.warpAffine -> hflip -> 384 crop chain as one
    map (reference: util/FSC147.py:143-174, :257-262)."""
    xs = jnp.arange(IMG_SIZE, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, xs, indexing="xy")  # [384,384] out coords
    sx = C[0, 0] * gx + C[0, 1] * gy + d[0]
    sy = C[1, 0] * gx + C[1, 1] * gy + d[1]
    return _bilinear_flat(pixels, base, stride, h, w, sx, sy)


def _resize_map(out_pos, length, r_total, offset):
    """cv2 INTER_LINEAR half-pixel 2-tap map, computed in-jit from
    scalars: cell coordinate out_pos (float vector) -> source taps
    (offset+s0, offset+s1, weight of s1)."""
    f = (out_pos + 0.5) * (length.astype(jnp.float32) / r_total) - 0.5
    s = jnp.floor(f)
    f = f - s
    s = s.astype(jnp.int32)
    lo = s < 0
    s = jnp.where(lo, 0, s)
    f = jnp.where(lo, 0.0, f)
    hi = s >= length - 1
    s = jnp.where(hi, length - 1, s)
    f = jnp.where(hi, 0.0, f)
    s1 = jnp.minimum(s + 1, length - 1)
    return offset + s, offset + s1, f


def _mosaic_axis(r, bl, r_total, is_second):
    """Per-axis blend weight + cell-space coordinate for one output
    index vector r (0..383), transcribing _blend_mosaic's seam
    arithmetic (reference: util/FSC147.py:236-255). is_second selects
    the bottom/right cell of the pair."""
    blf = bl.astype(jnp.float32)
    rf = r.astype(jnp.float32)
    if not is_second:
        # first (top/left) cell: base rows bl+r for r<=191, seam
        # contribution rows R-1-bl+(r-192) for 192<=r<=191+bl
        w = jnp.where(
            r < 192 - bl, 1.0,
            jnp.where(
                r <= 191, (191.0 - rf + blf) / (2 * blf),
                jnp.where(r <= 191 + bl, (blf - rf + 192.0) / (2 * blf), 0.0),
            ),
        )
        cy = jnp.where(r <= 191, bl + r, r_total - 1 - bl + (r - 192))
    else:
        w = jnp.where(
            r < 192 - bl, 0.0,
            jnp.where(
                r <= 191, (blf - 191.0 + rf) / (2 * blf),
                jnp.where(r <= 191 + bl, (rf - 192.0 + blf) / (2 * blf), 1.0),
            ),
        )
        cy = jnp.where(r >= 192, bl + (r - 192), bl - (191 - r))
    return w, jnp.clip(cy, 0, r_total - 1)


def _band_matrix(taps0, taps1, frac, weight, n_src: int):
    """[out] 2-tap maps + per-out weight -> dense banded [out, n_src]
    matrix W with W[o, taps0[o]] += (1-f)*w, W[o, taps1[o]] += f*w.
    Built with one-hot comparisons (O(out*n_src) elementwise — far
    cheaper than the per-pixel gathers it replaces, and the contraction
    it feeds runs on the MXU)."""
    src = jnp.arange(n_src, dtype=jnp.int32)[None, :]
    w0 = ((taps0[:, None] == src).astype(jnp.float32)
          * ((1.0 - frac) * weight)[:, None])
    w1 = ((taps1[:, None] == src).astype(jnp.float32)
          * (frac * weight)[:, None])
    return w0 + w1


def _mosaic_sample(pixels, bases, strides, tops, lefts, lengths, bl):
    """2x2 mosaic materialization: cell layout [0 TL, 1 BL, 2 TR, 3 BR]
    (reference: util/FSC147.py:236-255). Per-cell args are [4]-vectors;
    bl is the blend width scalar. Returns [384, 384, 3].

    The crop-resize + seam-blend is separable and its per-axis 2-tap
    maps are constant per cell, so each cell is TWO banded matmuls over
    a contiguously-gathered row slab — MXU work instead of 16 random
    HBM gathers per output pixel (which measured 81 ms/batch-8)."""
    r_total = 192 + 2 * bl
    r = jnp.arange(IMG_SIZE, dtype=jnp.int32)
    out = jnp.zeros((IMG_SIZE, IMG_SIZE, 3), jnp.float32)
    for i, (second_y, second_x) in enumerate(
        [(False, False), (True, False), (False, True), (True, True)]
    ):
        wy, cy = _mosaic_axis(r, bl, r_total, second_y)
        wx, cx = _mosaic_axis(r, bl, r_total, second_x)
        # cell-space -> LOCAL crop coords via the resize maps
        y0, y1, fy = _resize_map(cy.astype(jnp.float32), lengths[i], r_total, 0)
        x0, x1, fx = _resize_map(cx.astype(jnp.float32), lengths[i], r_total, 0)
        # slab: crop rows t..t+L-1 (row j >= L duplicates L-1; taps
        # never exceed L-1), each a CONTIGUOUS 384-px strip from
        # (left..left+384) — the pool is padded so the tail slice of
        # the last image stays aligned
        row_ids = jnp.minimum(jnp.arange(IMG_SIZE), lengths[i] - 1)

        def row_slice(j):
            start = bases[i] + (tops[i] + j) * strides[i] + lefts[i]
            return jax.lax.dynamic_slice_in_dim(pixels, start, IMG_SIZE, axis=0)

        slab = _unpack_rgb(jax.vmap(row_slice)(row_ids))
        Wy = _band_matrix(y0, y1, fy, wy, IMG_SIZE)  # [out_r, slab_row]
        Wx = _band_matrix(x0, x1, fx, wx, IMG_SIZE)  # [out_c, slab_col]
        prec = jax.lax.Precision.HIGHEST  # exact 2-tap sums (tiny GEMMs)
        cell = jnp.einsum("ra,abk->rbk", Wy, slab, precision=prec)
        cell = jnp.einsum("rbk,cb->rck", cell, Wx, precision=prec)
        out = out + cell
    # single end-scale: the band contractions and the 4-cell sum are
    # linear, so /255 commutes to the output (see _gather_px)
    return jnp.clip(out / 255.0, 0.0, 1.0)


def mosaic_bucket(k: int, batch_size: int) -> int:
    """Smallest mosaic-slot bucket >= k. Buckets keep the number of
    distinct compiled step variants tiny (0 / 2 / 4 / B) while skipping
    most of the wasted mosaic compute: at the reference's 25% mosaic
    rate and batch 8, E[slots] ~ 2.7 vs always-B = 8.

    Measured (scripts/profile_train.py, tunneled v5e, batch 8): the
    in-step mosaic marginal cost is only ~0.3 ms/slot — the K=2 bucket
    saved 1.4 ms of a 73.5 ms step — so cli.finetune does NOT bucket
    (avoids 4 compiled step variants at 10-20 min first-compile each).
    Kept for callers whose datasets are mosaic-heavy enough to care."""
    for b in (0, 2, 4):
        if k <= b <= batch_size:
            return b
    return batch_size


def sort_mosaic_first(batch: Dict) -> tuple:
    """Stable host-side reorder of a collated resident batch so mosaic
    samples form a prefix (training is order-invariant within a batch);
    returns (batch, k) with k = number of mosaic samples. Pass
    n_mosaic=mosaic_bucket(k, B) to the step so only the prefix pays
    the mosaic band-matmul compute."""
    m = np.asarray(batch["is_mosaic"])
    order = np.argsort(-m, kind="stable")
    k = int((m > 0).sum())

    def reorder(v):
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == m.shape[0]:
            return v[order]
        if isinstance(v, list) and len(v) == m.shape[0]:
            return [v[i] for i in order]
        return v

    return {key: reorder(v) for key, v in batch.items()}, k


def materialize_batch(store_arrays: Dict, batch: Dict, n_mosaic=None):
    """Device-side batch assembly from per-sample geometry parameters.

    batch fields (leading dim B):
      img_idx [B] int32; affine C [B,2,2], d [B,2] f32; is_mosaic [B];
      cell_idx [B,4] int32; cell_top/cell_left/cell_len [B,4] int32;
      blend_l [B] int32.
    Returns (images f32 [B,384,384,3], boxes f32 [B,3,64,64,3]).

    n_mosaic (static): number of leading slots that may be mosaic
    samples (see sort_mosaic_first). None = any slot (compute the
    mosaic path for every sample, the safe default); 0..B = only the
    prefix pays the mosaic band-matmuls. Mosaic samples OUTSIDE the
    prefix would silently get their affine materialization (identity
    map for mosaic samples) — callers must sort and bucket.
    """
    px = store_arrays["pixels"]
    base = store_arrays["base"]
    width = store_arrays["width"]
    height = store_arrays["height"]

    def one_affine(idx, C, d):
        return _affine_sample(
            px, base[idx], width[idx], height[idx], width[idx], C, d
        )

    def one_mosaic(cidx, ctop, cleft, clen, bl):
        return _mosaic_sample(px, base[cidx], width[cidx], ctop, cleft,
                              clen, bl)

    imgs = jax.vmap(one_affine)(
        batch["img_idx"], batch["affine_C"], batch["affine_d"]
    )
    B = imgs.shape[0]
    K = B if n_mosaic is None else int(n_mosaic)
    if K > 0:
        mos = jax.vmap(one_mosaic)(
            batch["cell_idx"][:K], batch["cell_top"][:K],
            batch["cell_left"][:K], batch["cell_len"][:K],
            batch["blend_l"][:K],
        )
        sel = (batch["is_mosaic"][:K] > 0)[:, None, None, None]
        imgs = imgs.at[:K].set(jnp.where(sel, mos, imgs[:K]))
    boxes = jnp.take(
        store_arrays["exemplars"], batch["img_idx"], axis=0
    ).astype(jnp.float32) / 255.0
    return imgs, boxes


# ---------------------------------------------------------------------------
# Validation resident store (fixed 384^2 samples; per-epoch H2D = indices)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ValStore:
    """Device-resident validation split: the per-epoch val loop
    (reference: FSC_finetune_cross.py:328-350) re-uploads every image
    each epoch; these are FIXED 384^2 samples, so they live in HBM and
    eval batches are index gathers. Only the gt COUNT is needed (the
    eval metrics never look at the density map)."""

    images: jax.Array  # [N, 384, 384, 3] uint8 (u8-exact: PIL output)
    boxes: jax.Array  # [N, 3, 64, 64, 3] f32 (float-resized crops)
    gt_cnt: jax.Array  # [N] f32 (sum(gt_density)/60, sigma=4 val recipe)
    n: int

    @property
    def arrays(self) -> Dict[str, jax.Array]:
        return {"images": self.images, "boxes": self.boxes,
                "gt_cnt": self.gt_cnt}


def build_val_store(val_ds, log=print, mesh=None) -> ValStore:
    """Materialize a ValDataset (data.fsc147.ValDataset preprocessing:
    384^2 resize, sigma=4/radius=7 density, exemplar crops) once.
    With ``mesh``, replicated onto every device (see build_store)."""
    n = len(val_ds)
    images = np.zeros((n, IMG_SIZE, IMG_SIZE, 3), np.uint8)
    boxes = np.zeros((n, MAX_SHOTS, EXEMPLAR_SIZE, EXEMPLAR_SIZE, 3), np.float32)
    gt = np.zeros(n, np.float32)
    from countr_tpu.config import DENSITY_SCALE

    for i in range(n):
        s = val_ds[i]
        images[i] = np.clip(np.rint(s["image"] * 255.0), 0, 255)
        boxes[i] = s["boxes"]
        gt[i] = float(s["gt_density"].sum()) / DENSITY_SCALE
        if (i + 1) % 200 == 0:
            log(f"val store: {i + 1}/{n}")
    log(f"val store: {n} samples, "
        f"{(images.nbytes + boxes.nbytes) / 1e6:.0f} MB -> device")
    from countr_tpu.parallel.mesh import replicate_to_mesh

    dev = replicate_to_mesh(mesh, {"images": images, "boxes": boxes, "gt": gt})
    return ValStore(
        images=dev["images"], boxes=dev["boxes"], gt_cnt=dev["gt"], n=n,
    )


# ---------------------------------------------------------------------------
# Pretrain resident store: RandomResizedCrop(384, bicubic) + flip
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PretrainStore:
    """Resident store for MAE pretraining. Every image is normalized to
    EXACTLY 384 logical rows (smaller side 384; portraits transposed
    first), then stored COLUMN-MAJOR as [w, 384]: the fixed-384 axis is
    the stored stride, so one sample's whole slab is a SINGLE
    static-size ``dynamic_slice`` of max_w*384 pixels that reshapes to
    [max_w, 384] — not 384 per-row slices (which measured 6.9 of the
    step's 7.6 ms materialization cost, slice-count-bound:
    scripts/profile_pretrain.py). The reference crops the ~384-side
    images_384_VarV2 originals (reference: util/FSC147.py:360-365
    RandomResizedCrop(384, 0.2-1.0, bicubic)); normalizing the smaller
    side to 384 first is a distribution-level no-op for a
    scale-invariant crop."""

    ids: List[str]
    pixels: jax.Array  # [P, 3] uint8, [w, 384] column-major images
    base: jax.Array  # [N] int32
    width: jax.Array  # [N] int32 (logical width = stored ROW count)
    w_np: np.ndarray
    t_np: np.ndarray  # 1 if stored transposed (original portrait)
    max_w: int
    index: Dict[str, int]

    @property
    def arrays(self) -> Dict[str, jax.Array]:
        return {"pixels": self.pixels, "base": self.base, "width": self.width}


def build_pretrain_store(meta, ids: List[str], log=print,
                         mesh=None) -> PretrainStore:
    """With ``mesh``, the pool is replicated onto every device so the
    jitted pretrain store step shards its crop-scalar batch on 'data'
    (see build_store)."""
    from countr_tpu.data import transforms as T

    n = len(ids)
    bases = np.zeros(n, np.int64)
    widths = np.zeros(n, np.int32)
    tflags = np.zeros(n, np.int8)
    chunks = []
    off = 0
    for i, im_id in enumerate(ids):
        img = meta.open_image(im_id)
        w0, h0 = img.size
        if h0 <= w0:  # landscape: 384 logical rows
            u8 = T.pil_resize_u8(img, IMG_SIZE, max(IMG_SIZE, round(w0 * IMG_SIZE / h0)))
        else:  # portrait: resize W=384, logical layout is the transpose
            u8 = T.pil_resize_u8(img, max(IMG_SIZE, round(h0 * IMG_SIZE / w0)), IMG_SIZE)
            u8 = np.ascontiguousarray(u8.transpose(1, 0, 2))
            tflags[i] = 1
        assert u8.shape[0] == IMG_SIZE
        bases[i] = off
        widths[i] = u8.shape[1]
        off += IMG_SIZE * u8.shape[1]
        # store column-major [w, 384]: fixed stride -> one static slice
        chunks.append(np.ascontiguousarray(u8.transpose(1, 0, 2)).reshape(-1, 3))
        if (i + 1) % 500 == 0:
            log(f"pretrain store: decoded {i + 1}/{n}")
    assert off < 2**31
    max_w = int(widths.max())
    # pad so the last image's static-size slice stays aligned
    chunks.append(np.zeros((IMG_SIZE * max_w, 3), np.uint8))
    pool = np.concatenate(chunks, axis=0)
    log(f"pretrain store: {n} images, {pool.nbytes / 1e6:.0f} MB -> device")
    from countr_tpu.parallel.mesh import replicate_to_mesh

    dev = replicate_to_mesh(mesh, {
        "pixels": pool, "base": bases.astype(np.int32), "width": widths,
    })
    return PretrainStore(
        ids=list(ids), pixels=dev["pixels"], base=dev["base"],
        width=dev["width"], w_np=widths.copy(), t_np=tflags,
        max_w=max_w, index={im_id: i for i, im_id in enumerate(ids)},
    )


def _bicubic_kernel(x):
    """PIL/torchvision bicubic (a = -0.5)."""
    a = -0.5
    ax = jnp.abs(x)
    w1 = (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0
    w2 = a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a
    return jnp.where(ax <= 1.0, w1, jnp.where(ax < 2.0, w2, 0.0))


def _bicubic_band(n_src: int, start, length, out: int = IMG_SIZE):
    """PIL antialiased-bicubic resize weights as a dense [n_src, out]
    matrix, built in-jit from the crop scalars (start, length): PIL
    scales the filter support by the downscale factor and renormalizes
    over in-crop taps (reference resize: util/FSC147.py:362 bicubic)."""
    scale = length.astype(jnp.float32) / out
    fs = jnp.maximum(scale, 1.0)
    j = jnp.arange(out, dtype=jnp.float32)[None, :]
    i = jnp.arange(n_src, dtype=jnp.float32)[:, None]
    center = start.astype(jnp.float32) + (j + 0.5) * scale
    w = _bicubic_kernel((i + 0.5 - center) / fs)
    in_crop = (
        (i >= start.astype(jnp.float32))
        & (i < (start + length).astype(jnp.float32))
    )
    w = w * in_crop.astype(jnp.float32)
    return w / jnp.maximum(jnp.sum(w, axis=0, keepdims=True), 1e-8)


def materialize_pretrain_batch(store_arrays: Dict, batch: Dict, max_w: int):
    """RandomResizedCrop(384, bicubic) + hflip on device.

    batch: img_idx [B] int32; top/left/ch/cw [B] int32 (crop in STORED
    coords); transposed [B] int8; flip [B] int8. Returns [B,384,384,3]
    float images."""
    px = store_arrays["pixels"]
    base = store_arrays["base"]

    def one(idx, top, left, ch, cw, transposed, flip):
        # The [w, 384] column-major storage has a FIXED stride (384), so
        # the whole slab is one static-size contiguous slice; stored
        # rows >= the true width spill into the next image (the pool is
        # tail-padded), but the x band's in-crop mask never samples them
        # (left + cw <= w). This replaced 384 per-row dynamic slices
        # that cost 6.9 ms/batch-16 (slice-count-bound).
        flat = jax.lax.dynamic_slice_in_dim(
            px, base[idx], max_w * IMG_SIZE, axis=0
        )
        img = flat.reshape(max_w, IMG_SIZE, 3).astype(jnp.float32) / 255.0
        wy = _bicubic_band(IMG_SIZE, top, ch)  # [384_src, 384_out]
        wx = _bicubic_band(max_w, left, cw)  # [max_w, 384_out]
        prec = jax.lax.Precision.HIGHEST
        # img axes: [x_stored, y_stored]; contract each with its band
        out = jnp.einsum("xy...,xo->oy...", img, wx, precision=prec)
        out = jnp.einsum("oy...,yj->oj...", out, wy, precision=prec)
        # out is [x_out, y_out] = the transpose of the logical layout,
        # which is exactly the final orientation for transposed
        # (portrait-original) samples
        out = jnp.where(transposed > 0, out, out.transpose(1, 0, 2))
        out = jnp.where(flip > 0, out[:, ::-1], out)
        return jnp.clip(out, 0.0, 1.0)

    return jax.vmap(one)(
        batch["img_idx"], batch["crop_top"], batch["crop_left"],
        batch["crop_h"], batch["crop_w"], batch["transposed"], batch["flip"],
    )


# ---------------------------------------------------------------------------
# Host parameter sampling (cheap; mirrors TrainDataset's draws)
# ---------------------------------------------------------------------------


def compose_affine(M: np.ndarray, flip: bool, left: int, top: int,
                   nw: int) -> tuple:
    """Forward cv2 warp matrix M [2,3] + hflip + crop(top,left) -> the
    single map src = C @ (x_out, y_out) + d used by _affine_sample."""
    m2 = M[:, :2]
    off = M[:, 2]
    invA = np.linalg.inv(m2)
    invb = -invA @ off
    s = -1.0 if flip else 1.0
    u0 = (nw - 1 - left) if flip else left
    C = invA @ np.diag([s, 1.0])
    d = invA @ np.asarray([u0, top], np.float64) + invb
    return C.astype(np.float32), d.astype(np.float32)

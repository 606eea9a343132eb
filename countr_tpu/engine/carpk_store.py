"""Resident CARPK training store: the train split lives in HBM as
uint8 originals; each step ships only an image index and the random
exemplar's 2-tap crop maps (~1.5 KB/sample).

The CARPK recipe (reference: FSC_finetune_CARPK.py:204-240) is almost
deterministic — the 384x384 train image is always the left crop of the
fixed 384x683 resize, and the GT density depends only on the GT boxes —
so unlike the FSC147 store (engine/train_store.py) no affine/mosaic
machinery is needed:

- the image resize runs on device through STATIC cv2-exact 2-tap maps
  (engine/stitch.resample_maps), cropped to the first 384 columns;
- the density synthesizes in-step from resident dot coordinates
  (ops/augment.density_from_dots — the same exact-scipy gaussian as
  the host path);
- the one random choice — which GT box becomes the exemplar — ships as
  per-sample 2-tap maps built on host (the crop is at ORIGINAL
  resolution with numpy's inclusive [y:y+h+1, x:x+w+1] slicing, then a
  64x64 cv2 resize, reference: FSC_finetune_CARPK.py:209-223).

Deviation note: the device resample applies the two 1-D lerps
sequentially on float32 while cv2.resize uses its own separable fixed
arrangement — identical in exact arithmetic, ~1e-7 apart in fp32
(tests/test_carpk_store.py pins the tolerance).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from countr_tpu.engine.stitch import resample_maps

RES_H, RES_W = 384, 683  # reference resize target (FSC_test_CARPK.py:225)
CROP = 384
EX = 64  # exemplar side


@dataclasses.dataclass
class CarpkStore:
    arrays: Dict[str, jax.Array]  # resident device arrays
    boxes_xywh: List[np.ndarray]  # host: per-image [K, 4] for exemplar maps
    n_images: int
    src_h: int
    src_w: int


def build_carpk_store(src: Sequence, log=print, mesh=None) -> CarpkStore:
    """Decode + upload the whole split once. Requires uniform source
    image shapes (CARPK is 720x1280 throughout); raises otherwise —
    fall back to the host pipeline for heterogeneous data. With
    ``mesh``, the store replicates onto every device so the jitted step
    can shard its geometry batch on 'data' (see
    engine.train_store.build_store)."""
    n = len(src)
    first = src[0]
    h0, w0 = first["image"].shape[:2]
    pix = np.zeros((n, h0, w0, 3), np.uint8)
    boxes_host: List[np.ndarray] = []
    dot_list: List[List] = []
    for i in range(n):
        s = src[i] if i else first
        if s["image"].shape != (h0, w0, 3):
            raise ValueError(
                f"--resident_data needs uniform image shapes; image {i} is "
                f"{s['image'].shape} vs {(h0, w0, 3)} — use the host pipeline"
            )
        pix[i] = s["image"]
        boxes_host.append(np.asarray(s["boxes_xywh"], np.float32).reshape(-1, 4))
        dots = []
        # exact transcription of the host density prep
        # (data/carpk.py carpk_train_sample; reference:
        # FSC_finetune_CARPK.py:229-240)
        for (x, y, w, h) in boxes_host[-1]:
            cx, cy = int(x + w / 2), int(y + h / 2)
            if cx < 720:
                dots.append((int(cx * 384 / 720), int(cy * 384 / 720)))
        dot_list.append(dots)
    maxk = max(1, max(len(d) for d in dot_list))
    dots_np = np.zeros((n, maxk, 2), np.int16)
    n_dots = np.zeros((n,), np.int32)
    for i, d in enumerate(dot_list):
        if d:
            dots_np[i, : len(d)] = np.asarray(d, np.int16)  # (x, y)
        n_dots[i] = len(d)

    ry0, ry1, rwy = resample_maps(h0, RES_H)
    cx0, cx1, cwx = resample_maps(w0, RES_W)
    from countr_tpu.parallel.mesh import replicate_to_mesh

    arrays = replicate_to_mesh(mesh, {
        "pixels": pix,
        "dots": dots_np,
        "n_dots": n_dots,
        # static resize maps; columns cropped to the left CROP outputs
        "ry0": ry0, "ry1": ry1, "rwy": rwy,
        "cx0": cx0[:CROP], "cx1": cx1[:CROP], "cwx": cwx[:CROP],
    })
    log(
        f"[carpk-store] {n} images resident "
        f"({pix.nbytes / 1e9:.2f} GB uint8 + {dots_np.nbytes / 1e6:.2f} MB dots)"
    )
    return CarpkStore(arrays, boxes_host, n, h0, w0)


def exemplar_geometry(
    rng: np.random.Generator, store: CarpkStore, idxs: np.ndarray
) -> Dict[str, np.ndarray]:
    """Host-side per-step randomness: pick one GT box per sample and
    build the 2-tap maps of its original-resolution crop -> 64x64
    (numpy-clamped inclusive slice like _crop_resize64)."""
    b = len(idxs)
    out = {
        "bx0": np.zeros((b, EX), np.int32), "bx1": np.zeros((b, EX), np.int32),
        "bwx": np.zeros((b, EX), np.float32),
        "by0": np.zeros((b, EX), np.int32), "by1": np.zeros((b, EX), np.int32),
        "bwy": np.zeros((b, EX), np.float32),
        "ex_valid": np.ones((b,), np.float32),
    }
    for p, i in enumerate(idxs):
        bxs = store.boxes_xywh[int(i)]
        x, y, w, h = (int(v) for v in bxs[int(rng.integers(0, len(bxs)))])
        x, y = max(x, 0), max(y, 0)
        cw = min(x + w + 1, store.src_w) - x
        ch = min(y + h + 1, store.src_h) - y
        if cw <= 0 or ch <= 0:  # degenerate box -> zero exemplar
            out["ex_valid"][p] = 0.0
            cw = ch = 1
            x = y = 0
        out["bx0"][p], out["bx1"][p], out["bwx"][p] = resample_maps(cw, EX, x)
        out["by0"][p], out["by1"][p], out["bwy"][p] = resample_maps(ch, EX, y)
    return out


def materialize_carpk_batch(arrays: Dict, batch: Dict):
    """Device: [B] indices + exemplar maps -> train images
    [B,384,384,3] f32 and exemplar boxes [B,3,64,64,3] f32 (the single
    exemplar tiled to the 3 slots, shot_num is always 1)."""

    def lerp2d(f, x0, x1, wx, y0, y1, wy):
        c0 = jnp.take(f, x0, axis=1).astype(jnp.float32) / 255.0
        c1 = jnp.take(f, x1, axis=1).astype(jnp.float32) / 255.0
        col = c0 + (c1 - c0) * wx[None, :, None]
        r0 = jnp.take(col, y0, axis=0)
        r1 = jnp.take(col, y1, axis=0)
        return r0 + (r1 - r0) * wy[:, None, None]

    def one(idx, bx0, bx1, bwx, by0, by1, bwy, ex_valid):
        img = jax.lax.dynamic_index_in_dim(
            arrays["pixels"], idx, axis=0, keepdims=False
        )
        im = lerp2d(
            img, arrays["cx0"], arrays["cx1"], arrays["cwx"],
            arrays["ry0"], arrays["ry1"], arrays["rwy"],
        )
        ex = lerp2d(img, bx0, bx1, bwx, by0, by1, bwy) * ex_valid
        return im, jnp.broadcast_to(ex[None], (3, EX, EX, 3))

    return jax.vmap(one)(
        batch["img_idx"], batch["bx0"], batch["bx1"], batch["bwx"],
        batch["by0"], batch["by1"], batch["bwy"], batch["ex_valid"],
    )

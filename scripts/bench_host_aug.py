"""Host augmentation pipeline benchmark (no TPU needed).

Reproduces the numbers in docs/STATUS.md: per-sample train-augmentation
cost over a synthetic FSC147-format directory, cold (first epoch:
decode+resize+augment) and warm (epochs 2+: decoded-image cache hits),
with the native C++ host core on and off (COUNTR_TPU_NATIVE=0 for the
pure numpy/scipy spec).

Usage:  python scripts/bench_host_aug.py [n_samples]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_synthetic_fsc(root: str, n_images: int = 8, hw=(530, 800), n_dots: int = 56):
    """FSC147-format dir with random JPEGs + dot/box annotations."""
    imdir = os.path.join(root, "images_384_VarV2")
    os.makedirs(imdir, exist_ok=True)
    rng = np.random.default_rng(0)
    anno, classes, ids = {}, [], []
    h, w = hw
    for i in range(n_images):
        im_id = f"img_{i}.jpg"
        ids.append(im_id)
        Image.fromarray(rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)).save(
            os.path.join(imdir, im_id)
        )
        pts = np.stack(
            [rng.uniform(5, w - 5, n_dots), rng.uniform(5, h - 5, n_dots)], 1
        )
        boxes = []
        for _ in range(3):
            x1, y1 = rng.uniform(0, w - 60), rng.uniform(0, h - 60)
            boxes.append([[x1, y1], [x1, y1 + 40], [x1 + 40, y1 + 40], [x1 + 40, y1]])
        anno[im_id] = {"points": pts.tolist(), "box_examples_coordinates": boxes}
        classes.append(f"{im_id} widget")
    with open(os.path.join(root, "annotation_FSC147_384.json"), "w") as f:
        json.dump(anno, f)
    with open(os.path.join(root, "Train_Test_Val_FSC_147.json"), "w") as f:
        json.dump({"train": ids, "val": ids[:1], "test": ids[:1]}, f)
    with open(os.path.join(root, "ImageClasses_FSC147.txt"), "w") as f:
        f.write("\n".join(classes))
    return root


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40

    from countr_tpu import native
    from countr_tpu.data.fsc147 import FSC147Meta, TrainDataset

    root = make_synthetic_fsc(tempfile.mkdtemp(prefix="fsc_bench_"))
    meta = FSC147Meta.load(root)
    ds = TrainDataset(meta)
    n_imgs = len(ds)

    mode = "native" if native.lib() is not None else "numpy (COUNTR_TPU_NATIVE=0 or no g++)"
    print(f"host core: {mode}")

    t0 = time.perf_counter()
    for k in range(n):
        ds[k % n_imgs]
    cold_warm_mix = (time.perf_counter() - t0) / n
    # by now every image is cached; measure pure warm
    t0 = time.perf_counter()
    for k in range(n):
        ds[k % n_imgs]
    warm = (time.perf_counter() - t0) / n
    print(
        f"train sample: first-pass {cold_warm_mix * 1e3:.1f} ms, "
        f"warm (cached decode) {warm * 1e3:.1f} ms "
        f"-> {1 / warm:.1f} samples/s/core"
    )


if __name__ == "__main__":
    main()

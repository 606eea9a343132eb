"""Generate a synthetic FSC147-format dataset (blob counting).

Produces images_384_VarV2/, annotation_FSC147_384.json,
Train_Test_Val_FSC_147.json and ImageClasses_FSC147.txt with gaussian
dark blobs on textured backgrounds (the train_synthetic.py task) so the
REAL CLI chain — finetune --resident_data -> cli.test — can be driven
end to end at full model size without FSC147 (zero-egress environment).

  python scripts/make_synthetic_fsc.py --out /tmp/synth_fsc \
      --n_train 256 --n_val 32 --n_test 32
"""

import argparse
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np
from PIL import Image

from train_synthetic import make_image  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/synth_fsc", type=str)
    p.add_argument("--n_train", default=256, type=int)
    p.add_argument("--n_val", default=32, type=int)
    p.add_argument("--n_test", default=32, type=int)
    p.add_argument("--seed", default=0, type=int)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    imdir = os.path.join(args.out, "images_384_VarV2")
    os.makedirs(imdir, exist_ok=True)
    widths = [384, 448, 512, 576, 640]
    anno, ids = {}, []
    n_total = args.n_train + args.n_val + args.n_test
    for i in range(n_total):
        w = widths[int(rng.integers(0, len(widths)))]
        img, centers = make_image(rng, w=w)
        im_id = f"synth_{i:04d}.jpg"
        ids.append(im_id)
        Image.fromarray(
            np.clip(img * 255.0, 0, 255).astype(np.uint8)
        ).save(os.path.join(imdir, im_id), quality=95)
        boxes = []
        for cx, cy in centers[: min(3, len(centers))]:
            x1, y1 = max(0.0, cx - 10), max(0.0, cy - 10)
            x2, y2 = min(w - 1.0, cx + 10), min(383.0, cy + 10)
            boxes.append([[x1, y1], [x1, y2], [x2, y2], [x2, y1]])
        anno[im_id] = {
            "points": centers.tolist(),  # (x, y)
            "box_examples_coordinates": boxes,
        }
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{n_total}", flush=True)
    split = {
        "train": ids[: args.n_train],
        "val": ids[args.n_train : args.n_train + args.n_val],
        "test": ids[args.n_train + args.n_val :],
    }
    with open(os.path.join(args.out, "annotation_FSC147_384.json"), "w") as f:
        json.dump(anno, f)
    with open(os.path.join(args.out, "Train_Test_Val_FSC_147.json"), "w") as f:
        json.dump(split, f)
    with open(os.path.join(args.out, "ImageClasses_FSC147.txt"), "w") as f:
        f.write("\n".join(f"{i} blob" for i in ids))
    print(f"wrote {n_total} images to {args.out}")


if __name__ == "__main__":
    main()

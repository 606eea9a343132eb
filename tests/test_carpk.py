"""CARPK adapter + transform + post-processing tests over a synthetic
local CARPK directory."""

import os

import numpy as np
import pytest
from PIL import Image

from countr_tpu.data.carpk import (
    CarpkLocal, carpk_postprocess, carpk_test_sample, carpk_train_sample,
)


@pytest.fixture(scope="module")
def carpk_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("carpk")
    (root / "Images").mkdir()
    (root / "Annotations").mkdir()
    (root / "ImageSets").mkdir()
    rng = np.random.default_rng(0)
    ids = []
    for i in range(3):
        im_id = f"20161225_TPZ_{i:05d}"
        ids.append(im_id)
        arr = rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "Images" / f"{im_id}.png")
        lines = []
        for _ in range(10 + i):
            x1 = rng.uniform(0, 1200)
            y1 = rng.uniform(0, 650)
            lines.append(f"{x1:.0f} {y1:.0f} {x1 + 60:.0f} {y1 + 40:.0f} 1")
        (root / "Annotations" / f"{im_id}.txt").write_text("\n".join(lines))
    (root / "ImageSets" / "train.txt").write_text("\n".join(ids[:2]))
    (root / "ImageSets" / "test.txt").write_text("\n".join(ids[2:]))
    return str(root)


def test_local_loader(carpk_dir):
    ds = CarpkLocal(carpk_dir, "train")
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (720, 1280, 3)
    assert s["boxes_xywh"].shape[1] == 4
    assert s["count"] == 10


def test_train_sample(carpk_dir):
    ds = CarpkLocal(carpk_dir, "train")
    rng = np.random.default_rng(1)
    t = carpk_train_sample(rng, ds[0])
    assert t["image"].shape == (384, 384, 3)
    assert t["gt_density"].shape == (384, 384)
    assert t["boxes"].shape == (3, 64, 64, 3)
    # density mass = 60 per center with cx<720 (minus gaussian edge loss)
    centers_in = sum(
        1 for (x, y, w, h) in ds[0]["boxes_xywh"] if int(x + w / 2) < 720
    )
    assert t["gt_density"].sum() == pytest.approx(60.0 * centers_in, rel=0.1)


def test_test_sample_and_postprocess(carpk_dir):
    ds = CarpkLocal(carpk_dir, "test")
    t = carpk_test_sample(ds[0])
    assert t["image"].shape == (384, 683, 3)
    assert t["boxes"].shape == (2, 64, 64, 3)

    # post-processing oracle on a hand-built density: cells with mass
    # 1.0 and 0.5 (neither exceeds 1.224 -> no decrement);
    # e_cnt quirk region empty -> +2 correction
    density = np.zeros((384, 683), np.float32)
    density[0:16, 0:16] = 1.0 * 60 / 256
    density[96:112, 96:112] = 0.5 * 60 / 256
    pos = np.asarray([[300.0, 300.0, 10.0, 10.0], [310.0, 310.0, 10.0, 10.0]])
    pred = carpk_postprocess(density, pos)
    assert pred == pytest.approx(1.5 + 2.0, rel=1e-5)

    # a cell above 1.224 loses one
    density2 = np.zeros((384, 683), np.float32)
    density2[0:16, 0:16] = 2.0 * 60 / 256
    pred2 = carpk_postprocess(density2, pos)
    assert pred2 == pytest.approx(2.0 - 1.0 + 2.0, rel=1e-5)


def test_postprocess_drops_residual_columns():
    """Columns beyond 16*42=672 are outside every pooling cell
    (reference conv stride semantics)."""
    density = np.zeros((384, 683), np.float32)
    density[:, 675:] = 100.0
    pos = np.asarray([[0.0, 0.0, 383.0, 682.0]])
    # e_cnt huge -> no +2; pooled sum sees none of the residual mass
    assert carpk_postprocess(density, pos) == 0.0

"""Data pipeline tests over a synthetic mini-FSC147 directory."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from countr_tpu.data.fsc147 import (
    FSC147Meta, PretrainDataset, TestDataset, TrainDataset, ValDataset,
)
from countr_tpu.data.loader import DataLoader, default_collate
from countr_tpu.data import transforms as T


@pytest.fixture(scope="module")
def fsc_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("fsc147")
    imdir = root / "images_384_VarV2"
    imdir.mkdir()
    rng = np.random.default_rng(0)
    anno, classes = {}, []
    ids = []
    sizes = [(400, 500), (384, 600), (500, 420), (640, 480), (384, 384), (700, 900)]
    for i, (h, w) in enumerate(sizes):
        im_id = f"img_{i}.jpg"
        ids.append(im_id)
        arr = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        Image.fromarray(arr).save(imdir / im_id)
        n_dots = 20 + 10 * i
        pts = np.stack(
            [rng.uniform(5, w - 5, n_dots), rng.uniform(5, h - 5, n_dots)], 1
        )
        boxes = []
        for _ in range(3):
            x1, y1 = rng.uniform(0, w - 60), rng.uniform(0, h - 60)
            x2, y2 = x1 + rng.uniform(20, 50), y1 + rng.uniform(20, 50)
            boxes.append([[x1, y1], [x1, y2], [x2, y2], [x2, y1]])
        anno[im_id] = {
            "points": pts.tolist(),
            "box_examples_coordinates": boxes,
        }
        classes.append(f"{im_id} widget")
    split = {"train": ids[:4], "val": ids[4:5], "test": ids[5:]}
    (root / "annotation_FSC147_384.json").write_text(json.dumps(anno))
    (root / "Train_Test_Val_FSC_147.json").write_text(json.dumps(split))
    (root / "ImageClasses_FSC147.txt").write_text("\n".join(classes))
    return str(root)


@pytest.fixture(scope="module")
def meta(fsc_dir):
    return FSC147Meta.load(fsc_dir)


def test_test_dataset(meta):
    ds = TestDataset(meta, split="test")
    s = ds[0]
    h, w = s["image"].shape[:2]
    assert h == 384 and w % 16 == 0
    assert s["boxes"].shape == (3, 64, 64, 3)
    assert len(s["rects"]) == 3
    n = len(meta.annotations[s["name"]]["points"])
    assert s["gt_map"].sum() == pytest.approx(60.0 * n, rel=0.05)
    assert s["load_time"] > 0


def test_test_dataset_box_bound(meta):
    ds = TestDataset(meta, split="test", box_bound=1)
    s = ds[0]
    assert s["boxes"].shape[0] == 1


def test_test_dataset_external(meta):
    ds = TestDataset(meta, split="test", external=True)
    s = ds[0]
    assert ds.external_boxes.shape[0] == 3  # 1 test image x 3 boxes
    assert s["rects"] == []


def test_val_dataset(meta):
    ds = ValDataset(meta, split="val")
    s = ds[0]
    assert s["image"].shape == (384, 384, 3)
    assert s["gt_density"].shape == (384, 384)
    n = len(meta.annotations[s["name"]]["points"])
    # sigma=4 radius=7 truncation loses a little mass at edges
    assert s["gt_density"].sum() == pytest.approx(60.0 * n, rel=0.15)
    assert s["boxes"].shape == (3, 64, 64, 3)


def test_train_dataset_noaug(meta):
    ds = TrainDataset(meta, split="train", do_aug=False)
    s = ds[0]
    assert s["image"].shape == (384, 384, 3)
    assert s["gt_density"].shape == (384, 384)
    assert s["m_flag"] == 0
    assert len(s["rects"]) == 3
    assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0


def test_train_dataset_aug_runs_and_is_deterministic(meta):
    ds = TrainDataset(meta, split="train", do_aug=True, seed=7)
    for idx in range(4):
        s = ds[idx]
        assert s["image"].shape == (384, 384, 3)
        assert s["gt_density"].shape == (384, 384)
        assert s["gt_density"].min() >= 0.0
        assert s["m_flag"] in (0, 1)
    s1 = ds[1]
    s2 = ds[1]
    np.testing.assert_array_equal(s1["image"], s2["image"])
    ds.set_epoch(1)
    s3 = ds[1]
    assert not np.array_equal(s1["image"], s3["image"])


def test_train_mosaic_paths(meta):
    """Drive both mosaic types directly."""
    ds = TrainDataset(meta, split="train", do_aug=True, seed=0)
    rng = np.random.default_rng(3)
    im_id = ds.ids[0]
    image, dots, sy, sx, nh, nw = ds._load_resized(im_id)
    # Type 2 (few dots)
    img_out, den_out, m_flag = ds._mosaic(rng, im_id, image, dots, sy, sx, nh, nw)
    assert img_out.shape == (384, 384, 3) and den_out.shape == (384, 384)
    assert m_flag == 1
    # Type 1 (>=70 dots): synthesize a dense dot set
    many = np.random.default_rng(0).uniform(10, 300, (80, 2))
    img_out, den_out, m_flag = ds._mosaic(rng, im_id, image, many, sy, sx, nh, nw)
    assert m_flag == 0
    assert den_out.sum() > 0  # dots survive into cells


def test_mosaic_density_mass_is_integral(meta):
    """Mosaic cell densities are binary dot maps: the assembled map's
    mass must be a non-negative integer (each kept dot contributes
    exactly one unit; blending only touches pixels, not dots)."""
    ds = TrainDataset(meta, split="train", do_aug=True, seed=0)
    im_id = ds.ids[0]
    image, dots, sy, sx, nh, nw = ds._load_resized(im_id)
    many = np.random.default_rng(5).uniform(10, 300, (90, 2))
    for trial in range(5):
        rng = np.random.default_rng(trial)
        _, den, m_flag = ds._mosaic(rng, im_id, image, many, sy, sx, nh, nw)
        total = float(den.sum())
        assert total >= 0
        assert abs(total - round(total)) < 1e-4, total


def test_pretrain_dataset(meta):
    ds = PretrainDataset(meta, split="train")
    s = ds[2]
    assert s["image"].shape == (384, 384, 3)
    assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0


def test_sample_crop_fallback_matches_torchvision():
    """The 10-attempt fallback must be torchvision's ratio-clamped
    maximal center crop (reference: util/FSC147.py:361-363 via
    torchvision RandomResizedCrop.get_params), not a min-side square.

    Extreme-aspect images make every attempt fail regardless of RNG
    (min ch over the scale/ratio range exceeds the short side), so the
    return IS the deterministic fallback. torchvision is not installed
    in this image; the expected values are a literal transcription of
    torchvision.transforms.RandomResizedCrop.get_params' fallback
    branch (stable since torchvision 0.8)."""

    def tv_fallback(height, width, ratio=(3 / 4, 4 / 3)):
        in_ratio = float(width) / float(height)
        if in_ratio < min(ratio):
            w = width
            h = int(round(w / min(ratio)))
        elif in_ratio > max(ratio):
            h = height
            w = int(round(h * max(ratio)))
        else:  # whole image
            w = width
            h = height
        i = (height - h) // 2
        j = (width - w) // 2
        return i, j, h, w

    for h0, w0 in ((10, 1000), (1000, 10), (8, 500), (500, 8)):
        # every attempt must fail: min crop height over scale*ratio
        # exceeds the short side
        import math

        assert math.sqrt(0.2 * h0 * w0 / (4 / 3)) > min(h0, w0)
        rng = np.random.default_rng(0)
        top, left, ch, cw = PretrainDataset.sample_crop(rng, h0, w0)
        i, j, th, tw = tv_fallback(h0, w0)
        assert (top, left, ch, cw) == (i, j, th, tw), (h0, w0)


def test_sample_crop_attempts_within_bounds():
    rng = np.random.default_rng(3)
    for h0, w0 in ((400, 500), (384, 384), (385, 4000)):
        for _ in range(50):
            top, left, ch, cw = PretrainDataset.sample_crop(rng, h0, w0)
            assert 0 <= top and top + ch <= h0
            assert 0 <= left and left + cw <= w0
            assert ch > 0 and cw > 0


def test_dataloader_batching_and_determinism(meta):
    ds = TrainDataset(meta, split="train", do_aug=False)
    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=5)
    batches = list(dl.epoch(0))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 384, 384, 3)
    assert batches[0]["boxes"].shape == (2, 3, 64, 64, 3)
    assert batches[0]["m_flag"].shape == (2,)
    names_a = [n for b in batches for n in b["name"]]
    names_b = [n for b in DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=5).epoch(0) for n in b["name"]]
    assert names_a == names_b
    names_c = [n for b in dl.epoch(1) for n in b["name"]]
    assert set(names_a) == set(names_c) and names_a != names_c


def test_dataloader_process_workers(meta):
    """Process-pool workers must yield the same deterministic samples
    as thread workers."""
    ds = TrainDataset(meta, split="train", do_aug=True, seed=3)
    thread_dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=1)
    proc_dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=1,
                         use_processes=True)
    a = list(thread_dl.epoch(0))
    b = list(proc_dl.epoch(0))
    assert [x["name"] for batch in a for x in [batch]] is not None
    for ba, bb in zip(a, b):
        assert ba["name"] == bb["name"]
        np.testing.assert_array_equal(ba["image"], bb["image"])
        np.testing.assert_array_equal(ba["gt_density"], bb["gt_density"])


def test_affine_keypoint_consistency(rng):
    """Warped keypoints must land where the warped image content lands:
    warp a one-hot image and check the bright pixel follows the point."""
    img = np.zeros((100, 100, 3), np.float32)
    img[40, 60] = 1.0
    kps = np.asarray([[60.0, 40.0]])
    g = np.random.default_rng(11)
    out, warped, ok = T.random_affine(g, img, kps)
    if ok[0]:
        x, y = warped[0]
        window = out[
            max(0, int(y) - 2) : int(y) + 3, max(0, int(x) - 2) : int(x) + 3
        ]
        assert window.max() > 0.05

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


class _FakeTensor:
    def __init__(self, arr):
        self._arr = arr

    def numpy(self):
        return self._arr


class _FakeHubItem:
    """One sample exposing the Deep Lake tensor schema CarpkHub consumes
    (reference stream: FSC_finetune_CARPK.py:134-137, tensors 'images'
    [H,W,3] uint8 / 'boxes' [N,4] float (x,y,w,h) / 'labels' [N]; the
    reference's gt count is labels.shape, :261)."""

    def __init__(self, rng, n_boxes):
        self.images = _FakeTensor(
            rng.integers(0, 255, (720, 1280, 3), dtype=np.uint8)
        )
        xy = rng.uniform(0, (1200, 650), size=(n_boxes, 2))
        wh = np.full((n_boxes, 2), (60.0, 40.0))
        self.boxes = _FakeTensor(
            np.concatenate([xy, wh], axis=1).astype(np.float32)
        )
        self.labels = _FakeTensor(np.ones((n_boxes, 1), np.uint32))


class _FakeHubDataset:
    def __init__(self, items):
        self._items = items

    def __len__(self):
        return len(self._items)

    def __getitem__(self, idx):
        return self._items[idx]


def test_hub_adapter_contract(monkeypatch):
    """CarpkHub against a mocked Deep Lake client: pins the URL it
    loads, the tensor schema it reads, and the sample dict it emits —
    and that the downstream train/test transforms consume that sample
    unchanged (zero-egress stand-in for hub://activeloop/carpk-*)."""
    import sys
    import types

    from countr_tpu.data import carpk as carpk_mod

    rng = np.random.default_rng(3)
    items = [_FakeHubItem(rng, 10), _FakeHubItem(rng, 7)]
    loaded_urls = []

    fake_hub = types.ModuleType("hub")

    def load(url):
        loaded_urls.append(url)
        return _FakeHubDataset(items)

    fake_hub.load = load
    monkeypatch.setitem(sys.modules, "hub", fake_hub)

    ds = carpk_mod.CarpkHub("train")
    assert loaded_urls == ["hub://activeloop/carpk-train"]
    assert len(ds) == 2

    s = ds[0]
    assert s["image"].shape == (720, 1280, 3) and s["image"].dtype == np.uint8
    assert s["boxes_xywh"].shape == (10, 4)
    assert s["boxes_xywh"].dtype == np.float32
    assert s["count"] == 10  # one label row per box
    assert s["name"] == "0"

    # load_carpk with no root prefers the hub stream
    via_loader = carpk_mod.load_carpk("test")
    assert loaded_urls[-1] == "hub://activeloop/carpk-test"
    assert isinstance(via_loader, carpk_mod.CarpkHub)

    # the hub sample feeds the reference train/test recipes unchanged
    t = carpk_train_sample(np.random.default_rng(1), s)
    assert t["image"].shape == (384, 384, 3)
    assert t["boxes"].shape == (3, 64, 64, 3) and t["m_flag"] == 1
    e = carpk_test_sample(ds[1])
    assert e["image"].shape == (384, 683, 3)
    assert e["boxes"].shape == (2, 64, 64, 3)
    assert e["count"] == 7

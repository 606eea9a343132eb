import json
import os

import numpy as np

from countr_tpu.utils import viz


def test_box_map_outline():
    m = viz.box_map((100, 100), [(10, 10, 20, 30)])
    assert m[10, 10, 1] == 1.0 and m[20, 30, 1] == 1.0
    assert m[15, 15, 1] == 0.0  # interior not filled
    assert viz.box_map((100, 100), [(10, 10, 20, 30)], external=True).sum() == 0


def test_make_grid_layout(rng):
    dens = [np.full((384, 600), float(i), np.float32) for i in range(9)]
    g = viz.make_grid(dens, 384, 600)
    assert g.shape == (384, 600)
    assert g[0, 0] == 0.0  # crop 0 top-left
    assert g[383, 599] == 8.0  # crop 8 bottom-right


def test_panels_and_results(tmp_path, rng):
    img = rng.uniform(0, 1, (384, 400, 3)).astype(np.float32)
    den = rng.uniform(0, 0.1, (384, 400)).astype(np.float32)
    gt = rng.uniform(0, 0.1, (384, 400)).astype(np.float32)
    p = str(tmp_path / "full_x.png")
    viz.save_prediction_panel(p, img, den, gt, [(5, 5, 50, 60)], 12.3, 10.0)
    assert os.path.exists(p)
    viz.save_exemplar_strip(str(tmp_path / "boxes.png"), rng.uniform(0, 1, (3, 64, 64, 3)).astype(np.float32))
    assert os.path.exists(tmp_path / "boxes.png")
    viz.save_results(str(tmp_path), ["a", "b"], [1.2, 3.4], [1.0, 4.0])
    assert os.path.exists(tmp_path / "results.csv")


def test_frames_to_video(tmp_path, rng):
    from PIL import Image

    fdir = tmp_path / "frames"
    fdir.mkdir()
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        ).save(fdir / f"f{i}.png")
    out = str(tmp_path / "out.mp4")
    assert viz.frames_to_video(str(fdir), out)
    assert os.path.getsize(out) > 0


def test_predicted_points(tmp_path):
    density = np.zeros((100, 100), np.float32)
    density[20, 30] = 60.0
    density[70, 80] = 60.0
    path = str(tmp_path / "anno.json")
    viz.write_predicted_points(path, "img.jpg", density)
    rec = json.loads(open(path).read())
    assert rec["count"] == 2.0
    assert sorted(rec["points_xy"]) == [[30, 20], [80, 70]]


def test_zeroshot_annotation_bootstrap(tmp_path):
    """write_zeroshot_annotations must emit FSC147-format metadata that
    the real dataset loader + zero-shot test path can consume
    (reference: util/misc.py:470-489 — whose hand-built JSON is
    malformed; ours must round-trip through json.load)."""
    from PIL import Image

    from countr_tpu.data.fsc147 import FSC147Meta, TestDataset

    imdir = tmp_path / "images"
    imdir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        ).save(imdir / f"cust_{i}.jpg")
    viz.write_zeroshot_annotations(str(tmp_path))
    anno = json.loads((tmp_path / "annotations.json").read_text())
    split = json.loads((tmp_path / "split.json").read_text())
    assert sorted(anno) == ["cust_0.jpg", "cust_1.jpg"] == sorted(split["test"])
    assert anno["cust_0.jpg"]["points"] == []
    meta = FSC147Meta.load(
        str(tmp_path), anno_file="annotations.json",
        data_split_file="split.json", im_dir="images",
    )
    ds = TestDataset(meta, split="test", box_bound=0)
    s = ds[0]
    assert s["image"].shape[0] == 384 and len(s["dots"]) == 0


def test_write_annotations_gt(tmp_path):
    """VIA-CSV dot merge (reference: util/misc.py:492-506)."""
    old = tmp_path / "old.json"
    old.write_text(json.dumps({
        "a.jpg": {"H": 96, "W": 128, "box_examples_coordinates": [],
                   "points": []},
        "b.jpg": {"H": 96, "W": 128, "box_examples_coordinates": [],
                   "points": []},
    }))
    csv_path = tmp_path / "gt.csv"
    csv_path.write_text(
        "filename,region_shape_attributes\n"
        'a.jpg,"{""name"": ""point"", ""cx"": 10, ""cy"": 20}"\n'
        'a.jpg,"{""name"": ""point"", ""cx"": 30, ""cy"": 40}"\n'
    )
    new = tmp_path / "new.json"
    viz.write_annotations_gt(str(old), str(new), str(csv_path))
    merged = json.loads(new.read_text())
    assert merged["a.jpg"]["points"] == [[10, 20], [30, 40]]
    assert merged["b.jpg"]["points"] == []

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


def test_zeroshot_annotations(tmp_path):
    density = np.zeros((100, 100), np.float32)
    density[20, 30] = 60.0
    density[70, 80] = 60.0
    path = str(tmp_path / "anno.json")
    viz.write_zeroshot_annotations(path, "img.jpg", density)
    rec = json.loads(open(path).read())
    assert rec["count"] == 2.0
    assert sorted(rec["points_xy"]) == [[30, 20], [80, 70]]

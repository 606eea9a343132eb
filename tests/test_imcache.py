"""ImageCache bounds + dataset cache exactness (data/imcache.py)."""

import pickle

import numpy as np

from countr_tpu.data.imcache import ImageCache


def _entry(mb):
    return (np.zeros(int(mb * 2**20), np.uint8), 100, 200)


def test_fifo_eviction_respects_cap():
    c = ImageCache(cap_mb=3)
    for i in range(5):
        c.put(i, _entry(1))
    assert len(c) <= 3
    assert c.get(4) is not None  # newest survives
    assert c.get(0) is None  # oldest evicted


def test_oversized_entry_skipped_and_zero_cap_disables():
    c = ImageCache(cap_mb=1)
    c.put("big", _entry(2))
    assert c.get("big") is None
    d = ImageCache(cap_mb=0)
    d.put("x", _entry(0.001))
    assert d.get("x") is None


def test_put_is_idempotent_and_pickle_empties():
    c = ImageCache(cap_mb=8)
    c.put("a", _entry(1))
    c.put("a", _entry(1))
    assert len(c) == 1
    c2 = pickle.loads(pickle.dumps(c))
    assert len(c2) == 0 and c2.cap_bytes == c.cap_bytes
    c2.put("b", _entry(1))
    assert c2.get("b") is not None


def test_dataset_warm_equals_cold(tmp_path):
    # cold decode+resize and warm cached sample must be bit-identical
    import json
    from PIL import Image
    from countr_tpu.data.fsc147 import FSC147Meta, TrainDataset, ValDataset

    imdir = tmp_path / "images_384_VarV2"
    imdir.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (400, 500, 3), dtype=np.uint8)).save(
        imdir / "a.jpg"
    )
    pts = np.stack([rng.uniform(5, 495, 25), rng.uniform(5, 395, 25)], 1)
    anno = {
        "a.jpg": {
            "points": pts.tolist(),
            "box_examples_coordinates": [
                [[10, 10], [10, 50], [50, 50], [50, 10]]
            ] * 3,
        }
    }
    (tmp_path / "annotation_FSC147_384.json").write_text(json.dumps(anno))
    (tmp_path / "Train_Test_Val_FSC_147.json").write_text(
        json.dumps({"train": ["a.jpg"], "val": ["a.jpg"], "test": ["a.jpg"]})
    )
    meta = FSC147Meta.load(str(tmp_path))
    for ds in (TrainDataset(meta), ValDataset(meta)):
        cold = ds[0]
        assert len(ds._cache) == 1
        warm = ds[0]
        for k in ("image", "gt_density", "boxes"):
            np.testing.assert_array_equal(cold[k], warm[k])

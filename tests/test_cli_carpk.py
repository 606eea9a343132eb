"""CARPK CLI smoke tests (tiny model, synthetic local CARPK dir)."""

import argparse
import json
import os

import numpy as np
import pytest

from countr_tpu.config import COUNTR_PRESETS, CounTRConfig
from tests.test_carpk import carpk_dir  # fixture  # noqa: F401

TINY384 = CounTRConfig(
    img_size=384, patch_size=16, embed_dim=32, depth=1, num_heads=2,
    decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
    head_width=32,
)


@pytest.fixture(autouse=True)
def _tiny_preset():
    COUNTR_PRESETS["tiny384"] = TINY384
    yield
    COUNTR_PRESETS.pop("tiny384", None)


def test_cli_finetune_carpk(carpk_dir, tmp_path):  # noqa: F811
    from countr_tpu.cli import finetune_carpk

    out = str(tmp_path / "carpk_ft")
    args = argparse.Namespace(
        model="tiny384", resume="", dtype="fp32", seed=0,
        carpk_root=carpk_dir, output_dir=out, batch_size=2, epochs=1,
        warmup_epochs=1, blr=2e-4, lr=None, weight_decay=0.05,
        accum_iter=1, num_workers=2, limit_steps=1, n_devices=2,
    )
    finetune_carpk.main(args)
    rec = json.loads(open(os.path.join(out, "log.txt")).read().splitlines()[-1])
    assert rec["train/loss"] > 0
    assert os.path.isdir(os.path.join(out, "ckpt_last"))


def test_cli_test_carpk(carpk_dir, tmp_path):  # noqa: F811
    from countr_tpu.cli import test_carpk

    out = str(tmp_path / "carpk_test")
    args = argparse.Namespace(
        model="tiny384", resume="", dtype="fp32", seed=0,
        carpk_root=carpk_dir, output_dir=out, batch_images=2,
        batch_windows=4, limit=0,
    )
    stats = test_carpk.main(args)
    assert np.isfinite(stats["MAE"]) and np.isfinite(stats["RMSE"])
    assert os.path.exists(os.path.join(out, "log.txt"))


def test_cli_test_carpk_gate(carpk_dir, tmp_path):  # noqa: F811
    """--expect_mae gate: generous bound passes, impossible bound exits 3."""
    from countr_tpu.cli import test_carpk

    base = dict(
        model="tiny384", resume="", dtype="fp32", seed=0,
        carpk_root=carpk_dir, output_dir=str(tmp_path / "g"),
        batch_images=2, batch_windows=4, limit=0, expect_tol_pct=2.0,
        expect_rmse=None,
    )
    stats = test_carpk.main(argparse.Namespace(**base, expect_mae=1e9))
    assert np.isfinite(stats["MAE"])
    with pytest.raises(SystemExit) as exc:
        test_carpk.main(argparse.Namespace(**base, expect_mae=1e-9))
    assert exc.value.code == 3


def test_cli_finetune_carpk_resident(carpk_dir, tmp_path):  # noqa: F811
    from countr_tpu.cli import finetune_carpk

    out = str(tmp_path / "carpk_ft_res")
    args = argparse.Namespace(
        model="tiny384", resume="", dtype="fp32", seed=0,
        carpk_root=carpk_dir, output_dir=out, batch_size=2, epochs=1,
        warmup_epochs=1, blr=2e-4, lr=None, weight_decay=0.05,
        accum_iter=1, num_workers=2, limit_steps=1, n_devices=2,
        resident_data=True,
    )
    finetune_carpk.main(args)
    rec = json.loads(open(os.path.join(out, "log.txt")).read().splitlines()[-1])
    assert rec["train/loss"] > 0
    assert os.path.isdir(os.path.join(out, "ckpt_last"))

"""Fine-tune / pretrain CLI smoke tests: one tiny epoch over the
synthetic fixture on the 8-device CPU mesh (real DP sharding)."""

import argparse
import json
import os

import pytest

from countr_tpu.config import COUNTR_PRESETS, MAE_PRESETS, CounTRConfig, MAEConfig
from tests.test_data import fsc_dir, meta  # fixtures  # noqa: F401

TINY384 = CounTRConfig(
    img_size=384, patch_size=16, embed_dim=32, depth=1, num_heads=2,
    decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
    head_width=32,
)
TINY384_MAE = MAEConfig(
    img_size=384, patch_size=16, embed_dim=32, depth=1, num_heads=2,
    decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
)


@pytest.fixture(autouse=True)
def _tiny_presets():
    COUNTR_PRESETS["tiny384"] = TINY384
    MAE_PRESETS["tiny384mae"] = TINY384_MAE
    yield
    COUNTR_PRESETS.pop("tiny384", None)
    MAE_PRESETS.pop("tiny384mae", None)


def test_cli_finetune_one_epoch(fsc_dir, tmp_path):  # noqa: F811
    from countr_tpu.cli import finetune

    out = str(tmp_path / "ft")
    args = argparse.Namespace(
        data_path=fsc_dir, anno_file="annotation_FSC147_384.json",
        data_split_file="Train_Test_Val_FSC_147.json",
        im_dir="images_384_VarV2", class_file="ImageClasses_FSC147.txt",
        output_dir=out, model="tiny384", resume="", dtype="fp32", seed=0,
        batch_size=4, epochs=1, warmup_epochs=1, blr=2e-4, lr=None,
        min_lr=0.0, weight_decay=0.05, accum_iter=1, no_aug=True,
        num_workers=2, ckpt_every=0, do_resume=False, init_from_mae="",
        limit_steps=1, n_devices=2,
    )
    finetune.main(args)
    log = open(os.path.join(out, "log.txt")).read().splitlines()
    rec = json.loads(log[-1])
    assert rec["epoch"] == 0
    assert rec["train/loss"] > 0
    assert os.path.isdir(os.path.join(out, "ckpt_last"))
    assert os.path.isdir(os.path.join(out, "ckpt_minMAE"))

    # resume path: epoch 0 checkpoint found -> starts at epoch 1 (no
    # epochs left) without error
    args.do_resume = True
    finetune.main(args)


def test_cli_pretrain_one_epoch(fsc_dir, tmp_path):  # noqa: F811
    from countr_tpu.cli import pretrain

    out = str(tmp_path / "pt")
    args = argparse.Namespace(
        data_path=fsc_dir, anno_file="annotation_FSC147_384.json",
        data_split_file="Train_Test_Val_FSC_147.json",
        im_dir="images_384_VarV2", class_file="ImageClasses_FSC147.txt",
        output_dir=out, model="tiny384mae", resume="", dtype="fp32", seed=0,
        mask_ratio=0.5, norm_pix_loss=False, masked_loss=False,
        batch_size=4, epochs=1, warmup_epochs=1, blr=1.5e-4, lr=None,
        min_lr=0.0, weight_decay=0.05, accum_iter=1, num_workers=2,
        ckpt_every=0, do_resume=False, recon_every=0, limit_steps=1,
        n_devices=2,
    )
    # the reference uploads every saved checkpoint as a W&B artifact
    # (util/misc.py:331-335) — record the pretrain CLI's upload calls
    from countr_tpu.cli import common as cli_common

    uploads = []

    class _RecordingWandb:
        def log(self, *a, **k):
            pass

        def image(self, *a, **k):
            pass

        def log_artifact(self, path, name, kind="model"):
            uploads.append((path, name))

    orig = cli_common.make_wandb
    cli_common.make_wandb = lambda *a, **k: _RecordingWandb()
    try:
        pretrain.main(args)
    finally:
        cli_common.make_wandb = orig
    rec = json.loads(open(os.path.join(out, "log.txt")).read().splitlines()[-1])
    assert rec["train/loss"] > 0
    assert os.path.isdir(os.path.join(out, "ckpt_last"))
    assert os.path.isdir(os.path.join(out, "ckpt_params"))
    names = {n for _, n in uploads}
    assert "pretrain_params" in names
    assert "pretrain_periodic" in names  # final epoch also saves periodic

    # chain: finetune with the encoder initialized from the orbax MAE
    # params checkpoint (the reproduce.sh handoff)
    from countr_tpu.cli import finetune

    ft_out = str(tmp_path / "ft_from_mae")
    ft_args = argparse.Namespace(
        data_path=fsc_dir, anno_file="annotation_FSC147_384.json",
        data_split_file="Train_Test_Val_FSC_147.json",
        im_dir="images_384_VarV2", class_file="ImageClasses_FSC147.txt",
        output_dir=ft_out, model="tiny384", resume="", dtype="fp32", seed=0,
        batch_size=4, epochs=1, warmup_epochs=1, blr=2e-4, lr=None,
        min_lr=0.0, weight_decay=0.05, accum_iter=1, no_aug=True,
        num_workers=2, ckpt_every=0, do_resume=False,
        init_from_mae=os.path.join(out, "ckpt_params"),
        init_from_mae_model="tiny384mae",
        limit_steps=1, n_devices=2,
    )
    finetune.main(ft_args)
    rec2 = json.loads(open(os.path.join(ft_out, "log.txt")).read().splitlines()[-1])
    assert rec2["train/loss"] > 0


def test_cli_finetune_nonmain_process_writes_nothing(
    fsc_dir, tmp_path, monkeypatch  # noqa: F811
):
    """Non-rank-0 processes must not write host-only sinks (log.txt,
    TB dir) — faked is_main_process. Orbax checkpoints are NOT rank
    gated: they are collective calls every process must make (orbax
    writes from the primary host; proven by the real 2-process run in
    tests/test_multiprocess.py). Here the faked non-main rank still
    saves because the single process IS orbax's primary."""
    from countr_tpu.cli import finetune
    from countr_tpu.parallel import mesh

    monkeypatch.setattr(mesh, "is_main_process", lambda: False)
    out = str(tmp_path / "ft_rank1")
    args = argparse.Namespace(
        data_path=fsc_dir, anno_file="annotation_FSC147_384.json",
        data_split_file="Train_Test_Val_FSC_147.json",
        im_dir="images_384_VarV2", class_file="ImageClasses_FSC147.txt",
        output_dir=out, model="tiny384", resume="", dtype="fp32", seed=0,
        batch_size=4, epochs=1, warmup_epochs=1, blr=2e-4, lr=None,
        min_lr=0.0, weight_decay=0.05, accum_iter=1, no_aug=True,
        num_workers=2, ckpt_every=0, do_resume=False, init_from_mae="",
        limit_steps=1, n_devices=2,
    )
    finetune.main(args)
    assert not os.path.exists(os.path.join(out, "log.txt"))
    assert not os.path.exists(os.path.join(out, "tb"))
    # collective checkpointing still ran (single process == primary)
    assert os.path.exists(os.path.join(out, "ckpt_last"))


def test_cli_finetune_resident_pipeline_matches_serial(fsc_dir, tmp_path):  # noqa: F811
    """--resident_pipeline (train batch k while materializing k+1) must
    reproduce the serial resident CLI trajectory: same per-epoch loss
    and val metrics over 2 epochs (the pipelined step is one arrival
    behind but trains identical batches with identical keys)."""
    import numpy as np

    from countr_tpu.cli import finetune

    def run(out, pipeline):
        args = argparse.Namespace(
            data_path=fsc_dir, anno_file="annotation_FSC147_384.json",
            data_split_file="Train_Test_Val_FSC_147.json",
            im_dir="images_384_VarV2", class_file="ImageClasses_FSC147.txt",
            output_dir=out, model="tiny384", resume="", dtype="fp32", seed=0,
            batch_size=4, epochs=2, warmup_epochs=1, blr=2e-4, lr=None,
            min_lr=0.0, weight_decay=0.05, accum_iter=1, no_aug=False,
            num_workers=0, use_processes=False, resident_data=True,
            resident_pipeline=pipeline, device_aug=False,
            ckpt_every=0, ckpt_last_every=1, do_resume=False,
            init_from_mae="", limit_steps=0, n_devices=2, panel_every=0,
            log_every=0,
        )
        finetune.main(args)
        with open(os.path.join(out, "log.txt")) as f:
            return [json.loads(l) for l in f if l.strip()]

    serial = run(str(tmp_path / "ser"), False)
    piped = run(str(tmp_path / "pipe"), True)
    assert len(serial) == len(piped) == 2
    for s, p in zip(serial, piped):
        assert s["train/loss"] == pytest.approx(p["train/loss"], rel=1e-3)
        assert s["val/MAE"] == pytest.approx(p["val/MAE"], rel=1e-3)
        assert s["val/RMSE"] == pytest.approx(p["val/RMSE"], rel=1e-3)

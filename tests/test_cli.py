"""End-to-end CLI smoke tests over the synthetic FSC147 fixture with a
tiny model preset (full 384-window geometry, skinny dims)."""

import argparse
import json
import os

import numpy as np
import pytest

from countr_tpu.config import COUNTR_PRESETS, CounTRConfig
from tests.test_data import fsc_dir, meta  # fixtures  # noqa: F401

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


def _test_args(fsc_dir, outdir, **over):
    base = dict(
        data_path=fsc_dir, anno_file="annotation_FSC147_384.json",
        data_split_file="Train_Test_Val_FSC_147.json",
        im_dir="images_384_VarV2", class_file="ImageClasses_FSC147.txt",
        output_dir=outdir, model="tiny384", resume="", dtype="fp32", seed=0,
        split="test", external=False, box_bound=-1, max_s_cnt=1,
        no_normalization=False, batch_images=4, batch_windows=4,
        narrow_policy="pad", save_viz=True, limit=0, n_devices=0,
    )
    base.update(over)
    return argparse.Namespace(**base)


def test_cli_test_mesh_matches_single_device(fsc_dir, tmp_path):  # noqa: F811
    """cli.test over the 8-device mesh (window batches sharded across
    'data') must reproduce the single-device metrics — the CLI-level
    multi-chip inference path (reference evaluates under DDP:
    FSC_test_cross(few-shot).py:229-231)."""
    from countr_tpu.cli import test as cli_test

    stats_1 = cli_test.main(_test_args(
        fsc_dir, str(tmp_path / "d1"), n_devices=1, batch_windows=8,
        save_viz=False,
    ))
    stats_8 = cli_test.main(_test_args(
        fsc_dir, str(tmp_path / "d8"), n_devices=8, batch_windows=8,
        save_viz=False,
    ))
    assert stats_8["MAE"] == pytest.approx(stats_1["MAE"], rel=1e-4, abs=1e-6)
    assert stats_8["RMSE"] == pytest.approx(stats_1["RMSE"], rel=1e-4, abs=1e-6)


def test_cli_test_few_shot(fsc_dir, tmp_path):  # noqa: F811
    from countr_tpu.cli import test as cli_test

    out = str(tmp_path / "out")
    stats = cli_test.main(_test_args(fsc_dir, out))
    assert set(stats) >= {"MAE", "RMSE", "NAE"}
    assert os.path.exists(os.path.join(out, "log.txt"))
    assert os.path.exists(os.path.join(out, "results.csv"))
    # one test image in the fixture -> one panel png
    assert any(f.startswith("full_") for f in os.listdir(out))
    rec = json.loads(open(os.path.join(out, "log.txt")).read().splitlines()[-1])
    assert "Mean infer time" in rec


def test_cli_test_zero_shot(fsc_dir, tmp_path):  # noqa: F811
    from countr_tpu.cli import test as cli_test

    stats = cli_test.main(
        _test_args(fsc_dir, str(tmp_path / "out0"), box_bound=0, save_viz=False)
    )
    assert np.isfinite(stats["MAE"])


def test_cli_test_external_exemplars(fsc_dir, tmp_path):  # noqa: F811
    from countr_tpu.cli import test as cli_test

    stats = cli_test.main(
        _test_args(
            fsc_dir, str(tmp_path / "oute"), external=True, box_bound=3,
            save_viz=False,
        )
    )
    assert np.isfinite(stats["MAE"])


def test_cli_test_acceptance_gate(fsc_dir, tmp_path):  # noqa: F811
    """--expect_mae/--expect_rmse gate (VERDICT item: gated real-weights
    acceptance harness; reference bar: README.md:117-119). Generous
    bound passes, impossible bound exits nonzero."""
    from countr_tpu.cli import test as cli_test

    stats = cli_test.main(
        _test_args(
            fsc_dir, str(tmp_path / "ok"), save_viz=False,
            expect_mae=1e9, expect_rmse=1e9, expect_tol_pct=2.0,
        )
    )
    assert np.isfinite(stats["MAE"])
    with pytest.raises(SystemExit) as exc:
        cli_test.main(
            _test_args(
                fsc_dir, str(tmp_path / "fail"), save_viz=False,
                expect_mae=1e-9, expect_tol_pct=2.0,
            )
        )
    assert exc.value.code == 1


def test_cli_aggregate(tmp_path):
    """log_test_results/plot_test_results equivalent over two fake run
    dirs (reference: util/misc.py:565-620)."""
    import csv

    from countr_tpu.cli import aggregate

    for name, mae, rmse in (("run_a", 10.0, 20.0), ("run_b", 5.0, 8.0)):
        d = tmp_path / name
        d.mkdir()
        with open(d / "log.txt", "w") as f:
            # two lines -> the aggregator must average them
            f.write(json.dumps({"MAE": mae, "RMSE": rmse, "NAE": 0.5,
                                "note": "text ignored"}) + "\n")
            f.write(json.dumps({"MAE": mae + 2, "RMSE": rmse + 2,
                                "NAE": 0.7}) + "\n")
    (tmp_path / "not_a_run").mkdir()  # no log.txt -> skipped
    rows = aggregate.log_test_results(str(tmp_path))
    assert [r["name"] for r in rows] == ["run_a", "run_b"]
    assert rows[0]["MAE"] == pytest.approx(11.0)
    assert rows[1]["RMSE"] == pytest.approx(9.0)
    with open(tmp_path / "logs.csv", newline="") as f:
        recs = list(csv.DictReader(f))
    assert recs[0]["name"] == "run_a"
    assert float(recs[1]["NAE"]) == pytest.approx(0.6)
    out = aggregate.plot_test_results(str(tmp_path))
    if out is not None:  # matplotlib present
        assert os.path.exists(out)


def test_cli_demo_zero_shot(fsc_dir, tmp_path):  # noqa: F811
    from countr_tpu.cli import demo as cli_demo

    img_dir = os.path.join(fsc_dir, "images_384_VarV2")
    one_img = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
    args = argparse.Namespace(
        model="tiny384", resume="", dtype="fp32", seed=0,
        input_path=one_img, output_path=str(tmp_path / "demo"),
        boxes="", batch_windows=4, no_normalization=False,
    )
    cli_demo.main(args)
    assert len(os.listdir(tmp_path / "demo")) == 1


def test_cli_demo_few_shot_boxes(fsc_dir, tmp_path):  # noqa: F811
    from countr_tpu.cli import demo as cli_demo

    img_dir = os.path.join(fsc_dir, "images_384_VarV2")
    one_img = os.path.join(img_dir, sorted(os.listdir(img_dir))[0])
    args = argparse.Namespace(
        model="tiny384", resume="", dtype="fp32", seed=0,
        input_path=one_img, output_path=str(tmp_path / "demo2"),
        boxes="10,20,60,80;100,120,150,170", batch_windows=4,
        no_normalization=False,
    )
    cli_demo.main(args)
    assert len(os.listdir(tmp_path / "demo2")) == 1


def test_fused_block_gated_per_mode(monkeypatch):
    """Training builds must keep the standalone Pallas kernels
    (fused_attn_block=False): the fused half-block's custom VJP loses
    ~1-5 ms/step in training while winning forward-only
    (scripts/ab_train_fused.py, docs/PROFILE.md). Inference builds keep
    it on."""
    import countr_tpu.models as models
    from countr_tpu.cli import common

    captured = {}

    class _Stop(Exception):
        pass

    def fake_build(name, **kw):
        captured.update(kw)
        raise _Stop

    monkeypatch.setattr(models, "build_countr", fake_build)

    def build(training):
        captured.clear()
        args = argparse.Namespace(model="tiny384", resume="", dtype="bf16")
        with pytest.raises(_Stop):
            common.build_counting_model(args, training=training)
        return dict(captured)

    assert build(training=True)["fused_attn_block"] is False
    assert build(training=False)["fused_attn_block"] is True
    # both stay on the Pallas fast mode in bf16
    assert build(training=True)["use_pallas_attention"] is True


def test_mixed_bal_mode_build(monkeypatch):
    """--dtype mixed_bal: bf16 trunk + fp32-HIGH head with stages 0-2
    bf16 (round-5 head bisection: the count error concentrates in the
    last conv stage + pred; docs/PARITY.md), subpixel head OFF (the
    fused phase path requires one head dtype)."""
    import jax.numpy as jnp

    import countr_tpu.models as models
    from countr_tpu.cli import common

    captured = {}

    class _Stop(Exception):
        pass

    def fake_build(name, **kw):
        captured.update(kw)
        raise _Stop

    monkeypatch.setattr(models, "build_countr", fake_build)
    args = argparse.Namespace(model="tiny384", resume="", dtype="mixed_bal")
    with pytest.raises(_Stop):
        common.build_counting_model(args, training=False)
    assert captured["dtype"] == jnp.bfloat16
    assert captured["head_dtype"] == jnp.float32
    assert captured["head_precision_high"] is True
    assert captured["head_stage_dtypes"] == (
        jnp.bfloat16, jnp.bfloat16, jnp.bfloat16, None, None
    )
    assert captured["subpixel_head"] is False
    # the other modes keep head_stage_dtypes unset
    captured.clear()
    args = argparse.Namespace(model="tiny384", resume="", dtype="mixed_fast")
    with pytest.raises(_Stop):
        common.build_counting_model(args, training=False)
    assert captured["head_stage_dtypes"] is None

    # mixed_bal must actually BUILD and run (config validation accepts
    # the tuple; tiny CPU forward is finite)
    import dataclasses

    import jax
    import numpy as np

    from countr_tpu.config import CounTRConfig
    from countr_tpu.models.countr import CounTR

    cfg = CounTRConfig(
        img_size=64, patch_size=16, embed_dim=32, depth=1, num_heads=2,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
        head_width=32, dtype=jnp.bfloat16, head_dtype=jnp.float32,
        head_precision_high=True,
        head_stage_dtypes=(jnp.bfloat16, jnp.bfloat16, jnp.bfloat16,
                           None, None),
    )
    m = CounTR(cfg)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    boxes = jnp.zeros((1, 3, 64, 64, 3), jnp.float32)
    params = m.init(jax.random.key(0), imgs, boxes, 3)
    out = m.apply(params, imgs, boxes, 3)
    assert out.dtype == jnp.float32 and np.isfinite(float(out.sum()))

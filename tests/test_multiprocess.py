"""True 2-process multi-host rehearsal on CPU (VERDICT item 5).

Launches two real jax.distributed processes (localhost coordinator,
gloo CPU collectives, 1 virtual device each = 2 global — one core
can't service 8 gloo rank threads plus two compilers inside gloo's 30 s
rendezvous window) running the
actual finetune CLI over a shared synthetic fixture, and asserts:
  - the 2-process global-batch loss trajectory matches a single-process
    run of the same global batch (same seed, same 2-device math);
  - only rank 0 produces side effects (log.txt / checkpoints);
  - global_any sees a flag raised on the other rank (the m_flag rule).

The reference's distributed path is only exercised by launching under
torchrun (reference: util/misc.py:225-257); this is the pod-free
equivalent rehearsal.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mh_fixture(tmp_path_factory):
    """8 train / 2 val images so a global batch of 8 splits 4+4 and the
    val tail exercises the per-process padding path."""
    root = tmp_path_factory.mktemp("mh_fsc")
    imdir = root / "images_384_VarV2"
    imdir.mkdir()
    rng = np.random.default_rng(7)
    anno, ids = {}, []
    for i in range(10):
        im_id = f"img_{i}.jpg"
        ids.append(im_id)
        h, w = 400, 500
        Image.fromarray(
            rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        ).save(imdir / im_id)
        pts = np.stack([rng.uniform(5, w - 5, 12), rng.uniform(5, h - 5, 12)], 1)
        boxes = []
        for _ in range(3):
            x1, y1 = rng.uniform(0, w - 60), rng.uniform(0, h - 60)
            boxes.append([[x1, y1], [x1, y1 + 30], [x1 + 30, y1 + 30], [x1 + 30, y1]])
        anno[im_id] = {"points": pts.tolist(), "box_examples_coordinates": boxes}
    (root / "annotation_FSC147_384.json").write_text(json.dumps(anno))
    (root / "Train_Test_Val_FSC_147.json").write_text(
        json.dumps({"train": ids[:8], "val": ids[8:], "test": ids[8:]})
    )
    (root / "ImageClasses_FSC147.txt").write_text(
        "\n".join(f"{i} widget" for i in ids)
    )
    return str(root)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(n_devices, coord=None, nproc=None, pid=None):
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.pop("JAX_NUM_PROCESSES", None)
    env.pop("JAX_PROCESS_ID", None)
    if coord:
        env["JAX_COORDINATOR_ADDRESS"] = coord
        env["JAX_NUM_PROCESSES"] = str(nproc)
        env["JAX_PROCESS_ID"] = str(pid)
    return env


def _read_log(outdir):
    with open(os.path.join(outdir, "log.txt")) as f:
        return [json.loads(l) for l in f if l.strip()]


@pytest.mark.slow
def test_two_process_finetune_matches_single(mh_fixture, tmp_path):
    worker = os.path.join(REPO, "tests", "mh_worker.py")
    port = _free_port()

    # --- 2-process run: 1 virtual device each, 2 global; ONE shared
    # output dir (orbax checkpointing is collective and its sync keys
    # include the directory — exactly like a pod writing to shared FS)
    shared_out = str(tmp_path / "mp_shared")
    procs, resfiles = [], []
    for pid in range(2):
        result = str(tmp_path / f"result_{pid}.json")
        resfiles.append(result)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, "--fsc_dir", mh_fixture,
                 "--outdir", shared_out, "--result", result],
                env=_worker_env(1, f"localhost:{port}", 2, pid),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    try:
        outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    finally:
        # a TimeoutExpired (e.g. a rank stuck in a gloo collective) must
        # not leave the other rank running — orphans starve this 1-core
        # host for every later test
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    for pid, result in enumerate(resfiles):
        with open(result) as f:
            rec = json.load(f)
        assert rec["process_count"] == 2
        assert rec["local_devices"] == 1 and rec["global_devices"] == 2
        assert rec["sees_other_flag"] is True  # rank 1's flag visible
        assert rec["none_set"] is False
        assert rec["is_main"] == (pid == 0)

    # rank-0-only side effects: exactly one process wrote the JSONL
    # epoch records (2 epochs -> 2 lines, not 4) and the checkpoint
    # layout is a single orbax tree
    rank0_out = shared_out
    mp_lines = _read_log(rank0_out)
    assert len(mp_lines) == 2, mp_lines
    assert os.path.isdir(os.path.join(rank0_out, "ckpt_last"))

    # --- single-process run of the same global batch -----------------
    single_out = str(tmp_path / "single")
    single_res = str(tmp_path / "result_single.json")
    proc = subprocess.Popen(
        [sys.executable, worker, "--fsc_dir", mh_fixture,
         "--outdir", single_out, "--result", single_res, "--single"],
        env=_worker_env(2),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        out = proc.communicate(timeout=900)[0].decode()
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out[-3000:]

    mp_log = _read_log(rank0_out)
    sp_log = _read_log(single_out)
    assert len(mp_log) == len(sp_log) == 2  # two epochs
    for mp, sp in zip(mp_log, sp_log):
        # same global batch, same seed, same 2-device mesh -> identical
        # math up to reduction-order float noise
        assert mp["train/loss"] == pytest.approx(sp["train/loss"], rel=1e-4)
        assert mp["val/MAE"] == pytest.approx(sp["val/MAE"], rel=1e-4)
        assert mp["val/RMSE"] == pytest.approx(sp["val/RMSE"], rel=1e-4)


@pytest.mark.slow
def test_two_process_resident_store_matches_single(mh_fixture, tmp_path):
    """--resident_data on a 2-process mesh: the pixel pool replicates
    onto every process's devices (make_array_from_process_local_data)
    while per-step geometry shards on 'data'; the loss/metric
    trajectory must match a single-process resident run of the same
    global batch (the reference's DDP equivalence for its dataloader
    path, FSC_finetune_cross.py:229-231)."""
    worker = os.path.join(REPO, "tests", "mh_worker.py")
    port = _free_port()

    shared_out = str(tmp_path / "mp_res")
    procs = []
    for pid in range(2):
        result = str(tmp_path / f"res_result_{pid}.json")
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, "--fsc_dir", mh_fixture,
                 "--outdir", shared_out, "--result", result, "--resident"],
                env=_worker_env(1, f"localhost:{port}", 2, pid),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
        )
    try:
        outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    single_out = str(tmp_path / "res_single")
    proc = subprocess.Popen(
        [sys.executable, worker, "--fsc_dir", mh_fixture,
         "--outdir", single_out, "--result",
         str(tmp_path / "res_result_single.json"), "--single", "--resident"],
        env=_worker_env(2),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        out = proc.communicate(timeout=900)[0].decode()
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out[-3000:]

    mp_log = _read_log(shared_out)
    sp_log = _read_log(single_out)
    assert len(mp_log) == len(sp_log) == 2
    for mp, sp in zip(mp_log, sp_log):
        assert mp["train/loss"] == pytest.approx(sp["train/loss"], rel=1e-4)
        assert mp["val/MAE"] == pytest.approx(sp["val/MAE"], rel=1e-4)
        assert mp["val/RMSE"] == pytest.approx(sp["val/RMSE"], rel=1e-4)


@pytest.mark.slow
def test_two_process_kill_and_resume(mh_fixture, tmp_path):
    """The reference's crash-resume contract under multi-process
    (reference: util/misc.py:338-361 load_model_FSC_full + --do_resume,
    FSC_finetune_cross.py:77-78): train a 2-process run, SIGKILL both
    ranks mid-training once epoch 1's 'last' checkpoint has committed,
    relaunch with --do_resume, and assert the merged trajectory equals
    an uninterrupted 2-process run epoch for epoch (params, opt state,
    epoch counter AND the per-epoch rng streams must all restore)."""
    import signal
    import time

    worker = os.path.join(REPO, "tests", "mh_worker.py")
    epochs = 4

    def launch(outdir, do_resume, results_prefix):
        port = _free_port()
        procs = []
        for pid in range(2):
            cmd = [sys.executable, worker, "--fsc_dir", mh_fixture,
                   "--outdir", outdir, "--epochs", str(epochs),
                   "--result", str(tmp_path / f"{results_prefix}_{pid}.json")]
            if do_resume:
                cmd.append("--do_resume")
            procs.append(
                subprocess.Popen(
                    cmd, env=_worker_env(1, f"localhost:{port}", 2, pid),
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                )
            )
        return procs

    # --- phase A: run, then kill both ranks once ckpt_last step>=1 is
    # COMMITTED (orbax renames the step dir into place atomically, so a
    # committed step is always restorable; the kill may land mid-epoch,
    # mid-save, or after a later epoch's log line — resume recovers from
    # the latest committed step in every case).
    shared_out = str(tmp_path / "killed")
    procs = launch(shared_out, do_resume=False, results_prefix="ka")
    from countr_tpu.engine.checkpoint import latest_step

    last_dir = os.path.join(shared_out, "ckpt_last")
    deadline = time.time() + 600
    try:
        while True:
            step = None
            try:
                step = latest_step(last_dir)
            except Exception:
                pass  # mid-commit layout; retry
            if step is not None and step >= 1:
                break
            assert time.time() < deadline, "no committed ckpt within 600s"
            if all(p.poll() is not None for p in procs):
                break  # ran to completion before we could kill (race)
            time.sleep(0.02)
        for p in procs:
            if p.poll() is None:
                p.send_signal(signal.SIGKILL)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p in procs:
        p.communicate(timeout=60)
    lines_after_kill = _read_log(shared_out)
    interrupted = len(lines_after_kill) < epochs
    assert interrupted, (
        "kill landed after training completed — poll too slow to "
        "exercise resume"
    )

    # --- phase B: relaunch with --do_resume; ranks restore the latest
    # committed TrainState and continue to epoch 4
    procs = launch(shared_out, do_resume=True, results_prefix="kb")
    try:
        outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    assert any("resumed epoch" in out for out in outs), outs[0][-2000:]

    merged = _read_log(shared_out)
    assert len(merged) > len(lines_after_kill)  # resume really trained
    # keep the LAST line per epoch: a kill after epoch N's log line but
    # before its checkpoint commit makes resume legitimately re-run and
    # re-log epoch N
    by_epoch = {}
    for rec in merged:
        by_epoch[rec["epoch"]] = rec
    assert sorted(by_epoch) == list(range(epochs))

    # --- uninterrupted 2-process control run ------------------------
    control_out = str(tmp_path / "control")
    procs = launch(control_out, do_resume=False, results_prefix="kc")
    try:
        outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    control = {rec["epoch"]: rec for rec in _read_log(control_out)}
    assert sorted(control) == list(range(epochs))

    for ep in range(epochs):
        for key in ("train/loss", "val/MAE", "val/RMSE", "val/NAE", "lr"):
            assert by_epoch[ep][key] == pytest.approx(
                control[ep][key], rel=1e-4, abs=1e-7
            ), (ep, key, by_epoch[ep][key], control[ep][key])

"""Metrics accumulation and structured logging.

Covers the reference's observability surface (reference:
util/misc.py:33-176 SmoothedValue/MetricLogger, FSC_pretrain.py:334-338
JSON-lines log.txt, util/misc.py:565-620 result aggregation) without
the wandb dependency (absent in this image; the TensorBoard sink is
optional and lazy).
"""

from __future__ import annotations

import collections
import json
import os
import time
from typing import Dict, Iterable, List, Optional


class SmoothedValue:
    """Windowed + global average of a scalar stream
    (reference: util/misc.py:33-100)."""

    def __init__(self, window: int = 20):
        self.deque = collections.deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.total += value * n
        self.count += n

    @property
    def avg(self) -> float:
        return sum(self.deque) / max(len(self.deque), 1)

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class MetricLogger:
    """Stream metrics to stdout at a cadence, with iteration timing
    (reference: util/misc.py:103-176)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = collections.defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __str__(self) -> str:
        return self.delimiter.join(
            f"{k}: {m.avg:.4f} ({m.global_avg:.4f})" for k, m in self.meters.items()
        )

    def log_every(self, iterable: Iterable, print_freq: int, header: str = ""):
        start = time.time()
        iter_t = SmoothedValue()
        last = time.time()
        for i, obj in enumerate(iterable):
            yield obj
            iter_t.update(time.time() - last)
            last = time.time()
            if i % print_freq == 0:
                print(f"{header} [{i}]  {self}  iter_time: {iter_t.avg:.4f}s", flush=True)
        total = time.time() - start
        print(f"{header} done in {total:.1f}s", flush=True)


class JsonlLogger:
    """Append JSON lines to <output_dir>/log.txt
    (reference: FSC_pretrain.py:334-338)."""

    def __init__(self, output_dir: Optional[str], enabled: bool = True):
        self.path = os.path.join(output_dir, "log.txt") if output_dir else None
        self.enabled = enabled and self.path is not None
        if self.enabled:
            os.makedirs(output_dir, exist_ok=True)

    def write(self, record: Dict):
        if not self.enabled:
            return
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")


class TBWriter:
    """Optional TensorBoard sink (reference: FSC_pretrain.py:174-178);
    no-op when tensorboard is unavailable or dir is None."""

    def __init__(self, log_dir: Optional[str]):
        self._w = None
        if log_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._w = SummaryWriter(log_dir=log_dir)
            except Exception:
                try:
                    from tensorboardX import SummaryWriter  # type: ignore

                    self._w = SummaryWriter(log_dir=log_dir)
                except Exception:
                    self._w = None

    def scalar(self, tag: str, value: float, step: int):
        if self._w is not None:
            self._w.add_scalar(tag, value, step)

    def image(self, tag: str, img_hwc, step: int):
        if self._w is not None:
            self._w.add_image(tag, img_hwc, step, dataformats="HWC")

    def flush(self):
        if self._w is not None:
            self._w.flush()


class WandbWriter:
    """Optional Weights & Biases sink (reference wires W&B throughout:
    FSC_finetune_cross.py:185-195, :320-326, util/misc.py:331-335).
    Silently disabled when the wandb client is not installed or no
    project is configured."""

    def __init__(self, project: Optional[str] = None, run_name: Optional[str] = None,
                 config: Optional[Dict] = None, team: Optional[str] = None,
                 run_id: Optional[str] = None):
        """run_name/team/run_id mirror the reference's --title /
        --wandb (project) / --team / --wandb_id flags
        (reference: FSC_finetune_cross.py:92-101); a run_id resumes the
        named W&B run after a crash-restart."""
        self._run = None
        if not project:
            return
        try:
            import wandb  # type: ignore

            self._run = wandb.init(
                project=project, name=run_name, config=config,
                entity=team or None, id=run_id or None,
                resume="allow" if run_id else None,
            )
        except Exception:
            self._run = None

    def log(self, record: Dict, step: Optional[int] = None):
        if self._run is not None:
            self._run.log(record, step=step)

    def image(self, tag: str, img_hwc, step: Optional[int] = None):
        """Image panel sink (reference posts val density/box panels to
        W&B: FSC_finetune_cross.py:352-405)."""
        if self._run is None:
            return
        try:
            import wandb  # type: ignore

            self._run.log({tag: wandb.Image(img_hwc)}, step=step)
        except Exception:
            pass

    def log_artifact(self, path: str, name: str, kind: str = "model"):
        """Upload a checkpoint directory/file as a W&B artifact
        (reference: util/misc.py:331-335 save_model artifact upload)."""
        if self._run is None:
            return
        try:
            import os

            import wandb  # type: ignore

            art = wandb.Artifact(name, type=kind)
            if os.path.isdir(path):
                art.add_dir(path)
            else:
                art.add_file(path)
            self._run.log_artifact(art)
        except Exception:
            pass

    def finish(self):
        if self._run is not None:
            self._run.finish()


class CountingMetrics:
    """MAE/RMSE/NAE accumulator over per-image count errors
    (reference: FSC_test_cross(few-shot).py:361-365, :429-434)."""

    def __init__(self):
        self.abs_errs: List[float] = []
        self.naes: List[float] = []

    def update(self, pred: float, gt: float):
        err = abs(pred - gt)
        self.abs_errs.append(err)
        self.naes.append(err / gt if gt > 0 else 0.0)

    @property
    def mae(self) -> float:
        return sum(self.abs_errs) / max(len(self.abs_errs), 1)

    @property
    def rmse(self) -> float:
        n = max(len(self.abs_errs), 1)
        return (sum(e * e for e in self.abs_errs) / n) ** 0.5

    @property
    def nae(self) -> float:
        return sum(self.naes) / max(len(self.naes), 1)

    def summary(self) -> Dict[str, float]:
        return {"MAE": self.mae, "RMSE": self.rmse, "NAE": self.nae}


class measure_time:
    """Wall-clock context manager (reference: util/misc.py:545-562)."""

    def __enter__(self):
        self._t0 = time.perf_counter()
        self.duration = 0.0
        return self

    def __exit__(self, *exc):
        self.duration = time.perf_counter() - self._t0
        return False

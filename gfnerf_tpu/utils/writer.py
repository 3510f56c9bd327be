"""Event writer: tensorboard / local terminal / wandb backends.

Equivalent of ``nerfstudio/utils/writer.py``: a buffered event API
(put_scalar / put_dict / put_image / put_config) flushed to pluggable
backends selected by ``--vis`` (experiment_config.py:79-89).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

# canonical event names (writer.py:43-54)
ITER_TRAIN_TIME = "Train Iter (time)"
TRAIN_RAYS_PER_SEC = "Train Rays / Sec"
TEST_RAYS_PER_SEC = "Test Rays / Sec"
ETA = "ETA (time)"


class LocalWriter:
    """Terminal stats printer (writer.py:318-474, simplified)."""

    def __init__(self, steps_per_log: int = 10):
        self.steps_per_log = steps_per_log
        self._last: Dict[str, float] = {}

    def write_scalar(self, name: str, value: float, step: int):
        self._last[name] = value

    def write_image(self, name, image, step):
        pass

    def flush(self, step: int):
        if step % self.steps_per_log == 0 and self._last:
            parts = " | ".join(
                f"{k}: {v:.4g}" for k, v in sorted(self._last.items())
            )
            print(f"[step {step:>8d}] {parts}", flush=True)


class TensorboardWriter:
    def __init__(self, log_dir: Path):
        from tensorboardX import SummaryWriter

        self.tb = SummaryWriter(str(log_dir))

    def write_scalar(self, name, value, step):
        self.tb.add_scalar(name, value, step)

    def write_image(self, name, image, step):
        img = np.asarray(image)
        if img.ndim == 3 and img.shape[-1] in (1, 3):
            img = np.transpose(img, (2, 0, 1))
        self.tb.add_image(name, img, step)

    def flush(self, step):
        self.tb.flush()


class WandbWriter:
    def __init__(self, log_dir: Path, project: str = "gfnerf-tpu"):
        import wandb

        wandb.init(project=project, dir=str(log_dir))
        self.wandb = wandb
        self._buf = {}

    def write_scalar(self, name, value, step):
        self._buf[name] = value

    def write_image(self, name, image, step):
        self._buf[name] = self.wandb.Image(np.asarray(image))

    def flush(self, step):
        if self._buf:
            self.wandb.log(self._buf, step=step)
            self._buf = {}


class EventWriter:
    """Multiplexes events to the configured backends."""

    def __init__(self, vis: str = "tensorboard",
                 log_dir: Optional[Path] = None,
                 steps_per_log: int = 10):
        self.backends: List = []
        log_dir = Path(log_dir or ".")
        if "tensorboard" in vis:
            try:
                self.backends.append(TensorboardWriter(log_dir))
            except Exception as e:  # tensorboardX missing -> degrade
                print(f"[writer] tensorboard unavailable: {e}")
        if "wandb" in vis:
            try:
                self.backends.append(WandbWriter(log_dir))
            except Exception as e:
                print(f"[writer] wandb unavailable: {e}")
        self.backends.append(LocalWriter(steps_per_log))

    def put_scalar(self, name: str, value, step: int):
        v = float(value)
        for b in self.backends:
            b.write_scalar(name, v, step)

    def put_dict(self, scalars: Dict[str, float], step: int):
        for k, v in scalars.items():
            self.put_scalar(k, v, step)

    def put_image(self, name: str, image, step: int):
        for b in self.backends:
            b.write_image(name, image, step)

    def put_config(self, config_str: str, step: int = 0):
        for b in self.backends:
            if isinstance(b, TensorboardWriter):
                b.tb.add_text("config", f"```\n{config_str}\n```", step)

    def flush(self, step: int):
        for b in self.backends:
            b.flush(step)


class TimeWriter:
    """Context timer feeding writer events (writer.py:43-54)."""

    def __init__(self, writer: Optional[EventWriter], name: str, step: int,
                 avg_over_rays: Optional[int] = None):
        self.writer = writer
        self.name = name
        self.step = step
        self.avg_over_rays = avg_over_rays
        self.duration = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *args):
        self.duration = time.perf_counter() - self.start
        if self.writer is not None:
            self.writer.put_scalar(self.name, self.duration, self.step)
            if self.avg_over_rays:
                self.writer.put_scalar(
                    TRAIN_RAYS_PER_SEC, self.avg_over_rays / self.duration,
                    self.step)

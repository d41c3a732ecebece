"""Observability: text logging, training-image panels, profiler hooks.

Parity: utils/monitor.py (Logger appending loss dicts to logs.txt + jpg
dumps of training images) and the reference's wall-clock prints — extended
TPU-first with jax.profiler trace capture and a per-stage timing registry
(the north-star metric being depthmaps/s/chip, SURVEY §5).
"""
from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path

import numpy as np


class Logger:
    """Append stringified metric dicts to logs.txt; dump image panels.
    Parity: utils/monitor.py:23-45."""

    def __init__(self, logdir):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self.log_file = self.logdir / "logs.txt"

    def log(self, metrics: dict):
        line = json.dumps({k: (float(v) if hasattr(v, "__float__") else v)
                           for k, v in metrics.items()})
        with open(self.log_file, "a") as f:
            f.write(line + "\n")

    def plot_ims(self, ims: dict, prefix: str = ""):
        """Save [H, W, C] or [B, H, W, C] float arrays in [0,1] as jpgs."""
        from PIL import Image
        for name, im in ims.items():
            arr = np.asarray(im)
            if arr.ndim == 4:
                arr = arr[0]
            if arr.ndim == 2:
                arr = np.repeat(arr[..., None], 3, axis=-1)
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(arr).save(self.logdir / f"{prefix}{name}.jpg")

    def depth_panel(self, depth, depth_min: float, depth_max: float,
                    name: str = "depth_est"):
        """Normalized depth visualization (models/trainer.py:86-92 parity)."""
        d = np.asarray(depth)
        if d.ndim == 3:
            d = d[0]
        norm = np.clip((d - depth_min) / max(depth_max - depth_min, 1e-9), 0, 1)
        self.plot_ims({name: norm})


class MeterSet:
    """Running means of scalar metrics with epoch reduction.
    Parity: utils/trainer.py:18-48 (keep_losses / log_iter / log_epoch)."""

    def __init__(self):
        self._sums: dict[str, float] = {}
        self._counts: dict[str, int] = {}

    def update(self, metrics: dict):
        for k, v in metrics.items():
            self._sums[k] = self._sums.get(k, 0.0) + float(v)
            self._counts[k] = self._counts.get(k, 0) + 1

    def means(self) -> dict:
        return {k: self._sums[k] / max(self._counts[k], 1) for k in self._sums}

    def reset(self) -> dict:
        out = self.means()
        self._sums.clear()
        self._counts.clear()
        return out


class StageTimer:
    """Wall-clock per pipeline stage; emits a summary dict."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self._last = time.perf_counter()

    def mark(self, name: str):
        """Sequential timing: attribute the time since the previous mark
        (or construction) to `name`."""
        now = time.perf_counter()
        self.totals[name] = self.totals.get(name, 0.0) + (now - self._last)
        self.counts[name] = self.counts.get(name, 0) + 1
        self._last = now

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {k: {"total_s": round(self.totals[k], 4),
                    "count": self.counts[k],
                    "mean_s": round(self.totals[k] / self.counts[k], 4)}
                for k in self.totals}


@contextlib.contextmanager
def profiler_trace(logdir, enabled: bool = True):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    import jax
    path = str(Path(logdir) / "jax_trace")
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

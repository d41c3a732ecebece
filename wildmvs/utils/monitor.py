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


def training_panels(batch, depth_est=None, ref_idx: int = 0) -> dict:
    """The reference's per-print_every training image set: ref_img +
    src_img_{i} (models/trainer.py:78-85) and, when a predicted depth is
    available, the depth-warped source views `warped_ref{r}src_{s}`
    (models/trainer.py:258-276 — the main visual debugging aid for the
    unsupervised mode; computed on demand from the returned depth rather
    than captured inside the loss pass)."""
    import jax.numpy as jnp
    imgs = np.asarray(batch["imgs"])            # [B, N, H, W, C]
    n = imgs.shape[1]
    src = [i for i in range(n) if i != ref_idx]
    out = {"ref_img": imgs[0, ref_idx]}
    for k, i in enumerate(src):
        out[f"src_img_{k}"] = imgs[0, i]
    if depth_est is not None:
        from ..geometry.projective import build_proj_matrices
        from ..losses.photometric import warped_src_views
        from ..losses.supervised import resize_bilinear
        H, W = imgs.shape[2:4]
        d = resize_bilinear(jnp.asarray(depth_est, jnp.float32), (H, W))
        proj = build_proj_matrices(jnp.asarray(batch["K"], jnp.float32),
                                   jnp.asarray(batch["R"], jnp.float32),
                                   jnp.asarray(batch["t"], jnp.float32))
        warped, inside = warped_src_views(jnp.asarray(imgs, jnp.float32), d,
                                          proj, ref_idx)
        for k, i in enumerate(src):
            out[f"warped_ref{ref_idx}src_{i}"] = np.clip(
                np.asarray(warped[0, k] * inside[0, k][..., None]), 0.0, 1.0)
    return out


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

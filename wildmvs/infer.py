"""One-call inference API: load a trained model once, predict depthmaps.

The reference has no serving entry point — users re-assemble
`load_network` + dataset plumbing from the eval pipeline
(evaluation/pipeline_utils.py:114-163, evaluation/run_depthmaps.py:27-74)
for every use. `Predictor` packages that: architecture comes from the
checkpoint's metadata, eval-time per-architecture overrides are applied,
the forward is jitted once per input resolution (XLA's jit cache keys on
shapes, so mixed-resolution scenes each compile once then stream), and
inputs are auto-cropped from the top-left to the /32 multiple the
networks require (the eval datasets' test-mode crop, data/MVSDataset.py:
76-87; a top-left crop leaves K unchanged).

    from wildmvs.infer import Predictor
    pred = Predictor("trained_models/vis_md")       # or architecture="mvsnet"
    out = pred(imgs, K, R, t, depth_min, depth_max) # imgs [N, H, W, 3]
    out["depth"], out["confidence"]                 # numpy, f32

Serve one view per chip: the plane-sweep warp is index-issue-bound, so
batching does not amortize (BASELINE.md); shard reference views across
hosts/chips instead.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


class Predictor:
    """Loaded eval network with jit caching and input normalization."""

    def __init__(self, model_dir: str | Path | None = None,
                 architecture: str | None = None, bf16: bool = True,
                 cvp_nscale: int | None = None,
                 sweep_method: str = "auto"):
        from .models import build_model
        from .pipeline.depthmaps import eval_model_kwargs
        from .train.checkpoint import resolve_checkpoint

        self._ckpt = None
        if model_dir is not None:
            self._ckpt, architecture = resolve_checkpoint(model_dir)
        if architecture is None:
            raise ValueError("need model_dir or architecture")
        self.architecture = architecture
        cfg = eval_model_kwargs(architecture, bf16=bf16,
                                sweep_method=sweep_method)
        self._model = build_model(architecture, **cfg["kwargs"])
        #: output resolution = input resolution / downscale
        self.downscale = cfg["downscale"]
        self._extra = {}
        if architecture == "cvp_mvsnet":
            # reference eval default: nscale 5 (DTU full-res) / 4 (others),
            # pipeline_utils.py:133-139
            self._extra["nscale"] = 4 if cvp_nscale is None else cvp_nscale
        self._variables = None
        self._fwd = None

    def _ensure_loaded(self, args):
        if self._variables is not None:
            return
        import jax
        from .train.checkpoint import restore_params

        init_vars = self._model.init(jax.random.PRNGKey(0), *args,
                                     train=False, **self._extra)
        if self._ckpt is not None:
            params, batch_stats, _ = restore_params(
                self._ckpt, init_vars["params"],
                init_vars.get("batch_stats", {}))
            self._variables = {"params": params, "batch_stats": batch_stats}
        else:  # random weights (smoke/perf use)
            self._variables = init_vars

        def fwd(imgs, K, R, t, dmin, dmax, reference_frame):
            out = self._model.apply(self._variables, imgs, K, R, t, dmin,
                                    dmax, reference_frame=reference_frame,
                                    train=False, **self._extra)
            return out["depth"], out["photometric_confidence"]

        self._fwd = jax.jit(fwd, static_argnums=6)

    @staticmethod
    def _crop32(imgs: np.ndarray, K: np.ndarray):
        """Top-left crop to /32 multiples (MVSDataset.py:76-87 test-mode
        semantics; a top-left crop leaves K unchanged). No-op when
        already aligned."""
        h, w = imgs.shape[-3:-1]
        nh, nw = (h // 32) * 32, (w // 32) * 32
        if (nh, nw) == (h, w):
            return imgs, K
        if nh == 0 or nw == 0:
            raise ValueError(f"images too small: {h}x{w} (need >= 32x32)")
        return imgs[..., :nh, :nw, :], K

    def __call__(self, imgs, K, R, t, depth_min, depth_max,
                 reference_frame: int = 0) -> dict:
        """imgs [N,H,W,3] or [B,N,H,W,3] float in [0,1] — or a list of
        per-view [Hi,Wi,3] / [B,Hi,Wi,3] arrays with heterogeneous sizes
        (in-the-wild scenes; each view is /32-cropped independently);
        K/R [.,N,3,3], t [.,N,3,1], depth_min/max [.,N] or scalar. Returns
        numpy f32 {depth, confidence} without the batch axis when input was
        unbatched."""
        import jax.numpy as jnp

        ragged = (isinstance(imgs, (list, tuple))
                  and len({tuple(np.asarray(v).shape[-3:-1])
                           for v in imgs}) > 1)
        if ragged:
            views = [np.asarray(v, np.float32) for v in imgs]
            batched = views[0].ndim == 4
            if not batched:
                views = [v[None] for v in views]
            views = [self._crop32(v, None)[0] for v in views]
            n = len(views)
            nb = views[0].shape[0]
            imgs_j = tuple(jnp.asarray(v) for v in views)
        else:
            if isinstance(imgs, (list, tuple)):
                imgs = np.stack([np.asarray(v) for v in imgs],
                                axis=1 if np.asarray(imgs[0]).ndim == 4
                                else 0)
            imgs = np.asarray(imgs, np.float32)
            batched = imgs.ndim == 5
            n = imgs.shape[1] if batched else imgs.shape[0]
            if not batched:
                imgs = imgs[None]
            imgs, _ = self._crop32(imgs, None)
            nb = imgs.shape[0]
            imgs_j = jnp.asarray(imgs)

        def prep(x):
            x = np.asarray(x, np.float32)  # [., N, r, c] -> batched 4-D
            while x.ndim < 4:
                x = x[None]
            return x

        K, R, t = prep(K), prep(R), prep(t)

        def prep_range(x):
            x = np.asarray(x, np.float32)
            if x.ndim < 2:
                x = np.broadcast_to(x, (nb, n)).copy()
            return x

        dmin, dmax = prep_range(depth_min), prep_range(depth_max)

        args = (imgs_j,) + tuple(jnp.asarray(a)
                                 for a in (K, R, t, dmin, dmax))
        self._ensure_loaded(args)
        depth, conf = self._fwd(*args, reference_frame)
        depth = np.asarray(depth, np.float32)
        conf = np.asarray(conf, np.float32)
        if not batched:
            depth, conf = depth[0], conf[0]
        return {"depth": depth, "confidence": conf}

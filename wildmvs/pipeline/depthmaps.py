"""Stage 1 — depthmap inference over an eval dataset, with idempotent
file-based caching.

Parity: evaluation/run_depthmaps.py:27-74 (npz {depthmap, probability} per
reference view, finished.txt sentinel, per-file existence checks) and
evaluation/pipeline_utils.py:88-111 (`get_mask` probability/geometry gate).

TPU-first: the forward is jitted once per (architecture, resolution) and
reference views stream through it; across hosts the view list is sharded by
process index (embarrassingly parallel; each host owns view i where
i % num_hosts == host).
"""
from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def eval_model_kwargs(architecture: str, bf16: bool = True,
                      sweep_method: str = "auto") -> dict:
    """Eval-time model construction overrides + OUTPUT depthmap scale.
    Parity: evaluation/pipeline_utils.py:131-154 (load_network). The
    returned `downscale` is the depth/image resolution ratio the later
    stages consume (filtering.py:51-58 upsample, fusibile.py:122 cam
    scaling) — the network itself always gets the full-res /32-cropped
    images (run_depthmaps.py:55-58). Inference defaults to bf16 compute
    (f32 checkpoints restore unchanged; flax casts at apply time).

    sweep_method: cost-volume sweep backend for all three families —
    "auto" (direct Mosaic kernel when supported, exact), "rect" (the
    H_inf-factored sweep, ops/rect_sweep.py: ~2.5x faster at the full-res
    DTU protocol under realistic rig geometry, once-resampled-source
    approximation), or "gather" (exact XLA gather).

    Per-arch default (from the r4 full-res DTU-rig measurements,
    BASELINE.md round 4): cvp_mvsnet defaults to "rect" — 1101 -> 675 ms
    at 1184x1600 N5 with a 0.0005-interval mean delta vs the exact path
    (tools/rect_accuracy.py) — while mvsnet/vis keep "auto" (mvsnet's
    rect is 2.5x but approximate, so it stays opt-in; vis rect measured
    SLOWER, 657 vs 568 ms). Passing an explicit sweep_method always
    wins."""
    import jax.numpy as jnp
    dtype = {"dtype": jnp.bfloat16} if bf16 else {}
    sweep = ({} if sweep_method == "auto"
             else {"sweep_method": sweep_method})
    if architecture == "cvp_mvsnet":
        if sweep_method == "auto":
            # one-line runtime notice (advisor r4): callers of the default
            # get the approximate rect numerics, not the exact sweep
            print("[wildmvs] cvp_mvsnet eval sweep_method 'auto' -> 'rect' "
                  "(H_inf-factored sweep, ~1.6x at full res, mean delta "
                  "0.0005 intervals vs exact; pass sweep_method='mosaic' "
                  "or 'gather' for the exact path)", flush=True)
            sweep = {"sweep_method": "rect"}
        return {"kwargs": {**dtype, **sweep}, "downscale": 1}
    if architecture == "vis_mvsnet":
        if sweep_method == "rect":
            # legal but known-slower: the cascade's per-pixel slabs track
            # the scene surface, whose slope-driven row spans defeat the
            # rect KY=2 window on most pairs — every such pair then pays
            # the A-resample PLUS the exact-gather fallback (BASELINE.md
            # r4/r5 measurements; 'auto' is the measured optimum for vis)
            print("[wildmvs] vis_mvsnet with sweep_method='rect' measured "
                  "SLOWER than 'auto' at the full-res protocol "
                  "(BASELINE.md round 4/5) — 'auto' is the per-arch "
                  "optimum", flush=True)
        return {"kwargs": {"depth_nums": (64, 32, 16),
                           "interval_scales": (2.0, 1.0, 0.5), **dtype,
                           **sweep},
                "downscale": 2}
    return {"kwargs": {**dtype, **sweep}, "downscale": 4}


def eval_forward_fn(model, variables):
    """Jitted eval forward returning (depth, probability)."""

    @jax.jit
    def fwd(imgs, K, R, t, depth_min, depth_max):
        out = model.apply(variables, imgs, K, R, t, depth_min, depth_max,
                          train=False)
        return out["depth"], out["photometric_confidence"]

    return fwd


def run_depthmaps(dataset, model, variables, out_dir: Path,
                  override: bool = False, debug: bool = False,
                  process_index: int = 0, process_count: int = 1,
                  cvp_nscale: int | None = None):
    """Run inference for every reference view and cache npz outputs.

    `dataset[i]` must yield the eval sample dict (imgs [N,H,W,3], K, R, t,
    depth_min, depth_max, filename).
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if (out_dir / "finished.txt").exists() and not override:
        return

    extra = {} if cvp_nscale is None else {"nscale": cvp_nscale}

    @jax.jit
    def fwd(imgs, K, R, t, dmin, dmax):
        out = model.apply(variables, imgs, K, R, t, dmin, dmax, train=False,
                          **extra)
        return out["depth"], out["photometric_confidence"]

    for i in range(len(dataset)):
        if i % process_count != process_index:
            continue
        sample = dataset[i]
        filename = sample["filename"].replace("/", "_")
        out_file = out_dir / f"{filename}_out.npz"
        if out_file.exists() and not override:
            continue
        imgs = sample["imgs"]
        if isinstance(imgs, list):
            # heterogeneous view sizes (in-the-wild scenes): the model takes
            # a per-view tuple; jit re-traces per shape combination
            imgs = tuple(jnp.asarray(v)[None] for v in imgs)
        else:
            imgs = jnp.asarray(imgs)[None]
        args = (imgs,) + tuple(jnp.asarray(sample[k])[None] for k in
                               ("K", "R", "t", "depth_min", "depth_max"))
        depth, prob = fwd(*args)
        # cast: bf16 eval outputs would round-trip through npz as raw void
        np.savez_compressed(
            out_file,
            depthmap=np.asarray(depth[0], dtype=np.float32),
            probability=np.asarray(prob[0], dtype=np.float32))
        if debug:
            return
    if process_count == 1:
        # sharded runs must not mark the stage complete — a later unsharded
        # pass verifies every per-file cache then writes the sentinel
        (out_dir / "finished.txt").write_text(" ")


def get_mask_invalid(prob: np.ndarray, prob_threshold: float = 0.8,
                     geo_mask: np.ndarray | None = None) -> np.ndarray:
    """Invalid-pixel mask from probability (+ optional geometric mask).
    Parity: pipeline_utils.py:88-111 — multi-stage probabilities pass if ANY
    stage clears the threshold."""
    if prob.ndim > 2:
        mask_invalid = (prob < prob_threshold).all(axis=0)
    else:
        mask_invalid = prob < prob_threshold
    if geo_mask is not None:
        mask_invalid = mask_invalid | ~geo_mask
    return mask_invalid

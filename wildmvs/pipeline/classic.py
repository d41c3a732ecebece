"""Classical (non-learned) plane-sweep stereo baseline — TPU-native.

The reference evaluates COLMAP's CUDA patch-match stereo as its classical
baseline (`--colmap`, utils/colmap_utils.py:282-322 `depthmap_colmap`,
shelled out to the external `./colmap` binary). A sequential propagation
patch-match is a poor fit for a systolic-array machine, so the TPU-native
baseline is the equivalent-quality *dense sweep* formulation: ZNCC window
matching over the full depth-hypothesis slab, winner-take-all with parabolic
sub-pixel refinement — every step is a batched conv/gather that XLA maps
onto the MXU/VPU, and the whole depthmap is one jit call.

Output contract matches the learned models' stage-1 npz
(`{depthmap, probability}`, evaluation/run_depthmaps.py:53-68), so stages
2-4 (filtering, fusion, metrics) run unchanged on top.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.projective import build_proj_matrices, scale_K
from ..ops.plane_sweep import plane_sweep_warp


def _box_filter(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Mean over a window x window neighbourhood (SAME), channels-last 4D
    [B, H, W, C] -> same shape. Separable two-pass sum, normalized by the
    in-image window size so borders are unbiased."""
    one = jnp.ones_like(x[..., :1])
    k_h = jnp.ones((window, 1, 1, 1), x.dtype)
    k_w = jnp.ones((1, window, 1, 1), x.dtype)

    def conv(v, k):
        return jax.lax.conv_general_dilated(
            v, jnp.tile(k, (1, 1, 1, v.shape[-1])), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=v.shape[-1])

    num = conv(conv(x, k_h), k_w)
    den = conv(conv(one, k_h), k_w)
    return num / den


@functools.partial(jax.jit, static_argnames=("num_depth", "window",
                                             "downscale"))
def classic_depthmap(imgs: jnp.ndarray, K: jnp.ndarray, R: jnp.ndarray,
                     t: jnp.ndarray, depth_min: jnp.ndarray,
                     depth_max: jnp.ndarray, num_depth: int = 192,
                     window: int = 7, downscale: int = 2):
    """ZNCC plane-sweep depthmap for reference view 0.

    Args:
      imgs: [B, N, H, W, 3] in [0, 1] (view 0 = reference) — or a per-view
        list/tuple with heterogeneous sizes (in-the-wild scenes).
      K, R: [B, N, 3, 3]; t: [B, N, 3, 1]; depth_min/max: [B, N].
      num_depth: hypothesis count (192 — the reference's patch-match runs on
        the same scene depth range).
      window: ZNCC window size (COLMAP's default patch is 5-11 px).
      downscale: compute resolution divisor (1 = full res).
    Returns:
      depth [B, H/d, W/d], photometric confidence [B, H/d, W/d] in [0, 1].
    """
    from ..models.api import view_list
    views, _ = view_list(imgs)
    n = len(views)
    b = views[0].shape[0]
    grays = []
    for v in views:
        g = v.mean(axis=-1, keepdims=True)  # [B, Hi, Wi, 1]
        if downscale > 1:
            vh, vw = g.shape[1:3]
            g = jax.image.resize(
                g, (b, vh // downscale, vw // downscale, 1), "bilinear")
        grays.append(g)
    if downscale > 1:
        K = scale_K(K, 1.0 / downscale)
    h, w = grays[0].shape[1:3]
    proj = build_proj_matrices(K, R, t)  # [B, N, 4, 4]
    dvals = (depth_min[:, 0, None]
             + (depth_max[:, 0, None] - depth_min[:, 0, None])
             * jnp.arange(num_depth)[None, :] / (num_depth - 1))  # [B, D]

    ref = grays[0][..., 0]                         # [B, H, W]

    eps = 1e-6
    score_sum = jnp.zeros((b, num_depth, h, w))
    weight_sum = jnp.zeros((b, num_depth, h, w))
    for v in range(1, n):
        # warp gray + a validity plane in one pass (border-zero semantics)
        src = jnp.concatenate([grays[v], jnp.ones_like(grays[v])], -1)
        warped = plane_sweep_warp(src, proj[:, v], proj[:, 0], dvals,
                                  ref_hw=(h, w))          # [B, D, H, W, 2]
        s = warped[..., 0].reshape(b * num_depth, h, w, 1)
        m = warped[..., 1].reshape(b * num_depth, h, w, 1)
        rs = jnp.broadcast_to(ref[:, None], (b, num_depth, h, w)
                              ).reshape(b * num_depth, h, w, 1)
        # window stats restricted to valid (in-frustum) pixels
        mw = _box_filter(m, window)
        s_mean = _box_filter(s * m, window) / (mw + eps)
        s_pow = _box_filter(s * s * m, window) / (mw + eps)
        rs_mean = _box_filter(rs * m, window) / (mw + eps)
        rs_pow = _box_filter(rs * rs * m, window) / (mw + eps)
        cross = _box_filter(rs * s * m, window) / (mw + eps)
        s_var = jnp.maximum(s_pow - s_mean ** 2, 0.0)
        r_var = jnp.maximum(rs_pow - rs_mean ** 2, 0.0)
        zncc = ((cross - rs_mean * s_mean)
                / jnp.sqrt(r_var * s_var + eps))[..., 0]
        valid = (mw[..., 0] > 0.5).astype(zncc.dtype)
        score_sum = score_sum + (zncc * valid).reshape(b, num_depth, h, w)
        weight_sum = weight_sum + valid.reshape(b, num_depth, h, w)

    score = score_sum / jnp.maximum(weight_sum, 1.0)       # [B, D, H, W]
    score = jnp.where(weight_sum > 0, score, -1.0)
    best = jnp.argmax(score, axis=1)                       # [B, H, W]

    # parabolic sub-hypothesis refinement on the score peak
    d_idx = jnp.clip(best, 1, num_depth - 2)
    gather = jax.vmap(lambda vol, idx: jnp.take_along_axis(
        vol, idx[None], axis=0)[0], in_axes=(0, 0))
    y0 = gather(score, d_idx - 1)
    y1 = gather(score, d_idx)
    y2 = gather(score, d_idx + 1)
    denom = y0 - 2.0 * y1 + y2
    # the |denom| > eps guard already excludes the singular case; adding eps
    # to a NEGATIVE denom (score peaks have denom < 0) would shrink its
    # magnitude and inflate the offset
    safe_denom = jnp.where(jnp.abs(denom) > eps, denom, 1.0)
    offset = jnp.where(jnp.abs(denom) > eps,
                       0.5 * (y0 - y2) / safe_denom, 0.0)
    offset = jnp.clip(offset, -1.0, 1.0)
    step = (depth_max[:, 0] - depth_min[:, 0]) / (num_depth - 1)
    depth = (depth_min[:, 0, None, None]
             + (d_idx.astype(jnp.float32) + offset) * step[:, None, None])
    confidence = jnp.clip((gather(score, best) + 1.0) * 0.5, 0.0, 1.0)
    return depth, confidence


def run_classic_depthmaps(dataset, depth_dir, num_depth: int = 192,
                          window: int = 7, downscale: int = 2,
                          override: bool = False, debug: bool = False,
                          process_index: int = 0, process_count: int = 1):
    """Stage-1 driver for the classical baseline: same idempotent npz +
    finished.txt caching as run_depthmaps (evaluation/run_depthmaps.py:38-49,
    here for depthmap_colmap's role, colmap_utils.py:282-322)."""
    from pathlib import Path
    depth_dir = Path(depth_dir)
    depth_dir.mkdir(parents=True, exist_ok=True)
    done = depth_dir / "finished.txt"
    if done.exists() and not override:
        return
    for i in range(len(dataset)):
        if i % process_count != process_index:
            continue
        s = dataset[i]
        name = s["filename"].replace("/", "_")
        f = depth_dir / f"{name}_out.npz"
        if f.exists() and not override:
            continue
        imgs = s["imgs"]
        if isinstance(imgs, list):  # heterogeneous view sizes
            imgs = tuple(jnp.asarray(v)[None] for v in imgs)
        else:
            imgs = jnp.asarray(imgs)[None]
        depth, conf = classic_depthmap(
            imgs, jnp.asarray(s["K"][None]),
            jnp.asarray(s["R"][None]), jnp.asarray(s["t"][None]),
            jnp.asarray(s["depth_min"][None]),
            jnp.asarray(s["depth_max"][None]),
            num_depth=num_depth, window=window, downscale=downscale)
        np.savez_compressed(f, depthmap=np.asarray(depth[0]),
                            probability=np.asarray(conf[0]))
        if debug:
            return
    if process_count == 1:
        # sharded runs leave the sentinel to the final unsharded pass
        done.write_text("finished\n")

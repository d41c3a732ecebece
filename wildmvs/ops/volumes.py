"""Cost-volume aggregation + depth regression primitives.

All aggregations are associative-decomposable (running sums), so they stream
over source views without materializing per-view volumes simultaneously, and
the same running statistics shard cleanly over a mesh `view` axis via psum
(see wildmvs/dist).  Layout: volumes are [B, D, H, W, C], probability volumes
[B, D, H, W].
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def depth_chunked_volume(cv_fn: Callable[[jnp.ndarray], jnp.ndarray],
                         depths: jnp.ndarray, dc: int) -> jnp.ndarray:
    """Build a [.., D, H, W, C] volume in depth slabs via lax.map.

    Every aggregation here is independent across depth planes, so the
    gather-path cost volume can be computed dc planes at a time — bounding
    the peak [D, H, W, 4C] gather intermediates that blow up at the
    full-res DTU eval sizes (296x400 features x D192 ~= 5.8 GB per view
    unchunked).

    Args:
      cv_fn: depths_slice [.., dc] -> [.., dc, H, W, C] volume chunk.
      depths: [.., D] hypothesis depths, D % dc == 0 (falls back to one
        unchunked call otherwise).
      dc: planes per chunk.
    Returns:
      cv_fn's output for the full depth axis, concatenated along it.
    """
    d = depths.shape[-1]
    if dc >= d or d % dc != 0:
        return cv_fn(depths)
    nc = d // dc
    # chunk axis to the front for lax.map: [..., D] -> [NC, ..., dc]
    xs = jnp.moveaxis(depths.reshape(depths.shape[:-1] + (nc, dc)), -2, 0)
    out = jax.lax.map(cv_fn, xs)          # [NC, .., dc, H, W, C]
    nd = out.ndim
    # [NC, .., dc, ...] -> [.., NC*dc, ...]: move NC next to the dc axis
    out = jnp.moveaxis(out, 0, nd - 5)
    shp = out.shape
    return out.reshape(shp[:nd - 5] + (nc * dc,) + shp[nd - 3:])


def gather_chunk_planes(num_depth: int, hw: tuple[int, int], c: int,
                        limit: int = 768 * 2 ** 20) -> int:
    """Depth-chunk size that keeps one view's [dc, H, W, 4C] bf16 gather
    intermediate under `limit` bytes (the unchunked eval-res compile blew
    the backend, 2026-08-20 session log). Returns num_depth when the full
    volume already fits."""
    h, w = hw
    per_plane = h * w * 4 * c * 2
    cap = max(1, limit // per_plane)
    if cap >= num_depth:
        return num_depth
    dc = 1
    for cand in range(2, num_depth + 1):
        if num_depth % cand == 0 and cand <= cap:
            dc = cand
    return dc


def variance_cost_volume(ref_feature: jnp.ndarray,
                         warped_iter: Sequence[jnp.ndarray] | None = None,
                         *, warp_fns: Sequence[Callable[[], jnp.ndarray]] | None = None,
                         num_depth: int | None = None) -> jnp.ndarray:
    """Variance aggregation: E[f^2] - E[f]^2 over {ref} U sources.

    Parity: models/MVSNet/model.py:113-139 (divides the squared sum by
    num_views**2, i.e. population variance).

    Args:
      ref_feature: [B, H, W, C].
      warped_iter: iterable of [B, D, H, W, C] warped source volumes, or
      warp_fns: thunks producing them lazily (streaming, saves live memory).
      num_depth: D (required so the ref feature can be broadcast).
    Returns:
      [B, D, H, W, C] cost volume.
    """
    fns = warp_fns if warp_fns is not None else [lambda v=v: v for v in warped_iter]
    num_views = len(fns) + 1
    out_dtype = ref_feature.dtype
    # E[x^2] - E[x]^2 cancels catastrophically at bf16 precision, so the
    # running sums are f32 regardless of the feature dtype; XLA keeps the
    # upcast in-register (the materialized interfaces — warped volumes in,
    # cost volume out — stay in the feature dtype)
    ref_volume = ref_feature.astype(jnp.float32)[:, None]  # [B,1,H,W,C]
    if num_depth is None:
        raise ValueError("num_depth is required")
    # accumulate the warped volumes first and add the [B,1,H,W,C] ref term
    # by broadcasting inside the final fused elementwise: an explicit
    # broadcast_to seed feeds both the sum and square chains and gets
    # materialized by XLA as two full-volume f32 buffers
    vol_sum = None
    vol_sq_sum = None
    for fn in fns:
        warped = fn().astype(jnp.float32)
        sq = warped ** 2
        vol_sum = warped if vol_sum is None else vol_sum + warped
        vol_sq_sum = sq if vol_sq_sum is None else vol_sq_sum + sq
    if vol_sum is None:
        # zero source views: variance of the reference alone is zero
        b, h, w, c = ref_feature.shape
        return jnp.zeros((b, num_depth, h, w, c), out_dtype)
    vol_sum = vol_sum + ref_volume
    vol_sq_sum = vol_sq_sum + ref_volume ** 2
    cv = vol_sq_sum / num_views - (vol_sum / num_views) ** 2
    return cv.astype(out_dtype)


def softmin_cost_volume(ref_feature: jnp.ndarray,
                        warped_iter: Sequence[jnp.ndarray] | None = None,
                        *, warp_fns: Sequence[Callable[[], jnp.ndarray]] | None = None,
                        temperature: jnp.ndarray = 1.0,
                        eps: float = 1e-6) -> jnp.ndarray:
    """Softmin aggregation (MVSNet-s): per-view squared feature differences
    weighted by exp(-T * ||diff||^2), normalized by the weight sum.

    Parity: models/MVSNet/model.py:141-173.

    Returns [B, D, H, W, C].
    """
    fns = warp_fns if warp_fns is not None else [lambda v=v: v for v in warped_iter]
    out_dtype = ref_feature.dtype
    # f32 running sums for the same cancellation/overflow reasons as the
    # variance aggregation; interfaces stay in the feature dtype
    ref_volume = ref_feature.astype(jnp.float32)[:, None]  # [B, 1, H, W, C]
    sum_exp = None
    sum_val = None
    for fn in fns:
        warped = fn().astype(jnp.float32)
        diff = (ref_volume - warped) ** 2  # [B, D, H, W, C]
        e = jnp.exp(-temperature * jnp.sum(diff, axis=-1, keepdims=True))
        sum_exp = e if sum_exp is None else sum_exp + e
        contrib = e * diff
        sum_val = contrib if sum_val is None else sum_val + contrib
    return (sum_val / (sum_exp + eps)).astype(out_dtype)


def groupwise_correlation(v1: jnp.ndarray, v2: jnp.ndarray,
                          groups: int) -> jnp.ndarray:
    """Group-wise correlation over the trailing channel axis.

    Parity: models/VisMVSNet/nn_utils.py:473-490 (channel dim there is dim=1;
    here channels-last). v1/v2: [..., C] -> [..., C // group_size] where the
    output channel count equals `groups`... note the reference passes
    groups=8 *channels per group* via cpg=8 with C=32 -> 4 groups? No: the
    reference calls groupwise_correlation(ref, warped, 8, 1) and splits C=32
    into shape [groups=8, C//8=4]; output has 8 channels.

    Returns [..., groups]: mean-free dot of each group of C//groups channels.
    """
    c = v1.shape[-1]
    assert c % groups == 0
    gs = c // groups
    a = v1.reshape(v1.shape[:-1] + (groups, gs))
    b = v2.reshape(v2.shape[:-1] + (groups, gs))
    return jnp.sum(a * b, axis=-1)


def depth_regression(prob_volume: jnp.ndarray,
                     depth_values: jnp.ndarray) -> jnp.ndarray:
    """Soft-argmin expected depth.

    Parity: models/MVSNet/module.py:174-182.

    Args:
      prob_volume: [B, D, H, W] softmax weights.
      depth_values: [B, D] or [B, D, H, W] hypothesis depths.
    Returns:
      [B, H, W].
    """
    if depth_values.ndim == 2:
        depth_values = depth_values[..., None, None]
    return jnp.sum(prob_volume * depth_values, axis=1)


def soft_argmin(score_volume: jnp.ndarray, window: int | None = None):
    """Softmax over depth + expected class index (+ windowed prob map).

    Parity: models/VisMVSNet/nn_utils.py:453-466.

    Args:
      score_volume: [B, D, H, W] raw scores.
      window: if set, also return the probability mass within +-window of the
        expected index (Vis-MVSNet photometric confidence, window=2).
    Returns:
      (prob_volume [B,D,H,W], expected_index [B,H,W][, prob_map [B,H,W]]).
    """
    prob = jax.nn.softmax(score_volume, axis=1)
    d = score_volume.shape[1]
    index = jnp.arange(d, dtype=prob.dtype).reshape(1, d, 1, 1)
    out = jnp.sum(index * prob, axis=1, keepdims=True)  # [B,1,H,W]
    if window is None:
        return prob, out[:, 0]
    mask = (jnp.abs(index - out) <= window).astype(prob.dtype)
    prob_map = jnp.sum(prob * mask, axis=1)
    return prob, out[:, 0], prob_map


def entropy(prob_volume: jnp.ndarray, axis: int = 1,
            keepdims: bool = False) -> jnp.ndarray:
    """Shannon entropy over the depth axis.

    Parity: models/VisMVSNet/nn_utils.py:469-470 (clamp to [1e-9, 1]).
    """
    p = prob_volume
    return jnp.sum(-p * jnp.log(jnp.clip(p, 1e-9, 1.0)), axis=axis, keepdims=keepdims)


def photometric_confidence(prob_volume: jnp.ndarray) -> jnp.ndarray:
    """Sum of the 4 probability taps around the soft-argmax index.

    Parity: models/MVSNet/model.py:211-215: pad the depth axis by (1, 2),
    average-pool window 4 (x4), then gather at the regressed integer index.

    Args:
      prob_volume: [B, D, H, W].
    Returns:
      [B, H, W] confidence in [0, 1].
    """
    b, d, h, w = prob_volume.shape
    padded = jnp.pad(prob_volume, ((0, 0), (1, 2), (0, 0), (0, 0)))
    # window-4 sum along depth: sum4[i] = sum(padded[i:i+4])
    cums = jnp.cumsum(jnp.pad(padded, ((0, 0), (1, 0), (0, 0), (0, 0))), axis=1)
    sum4 = cums[:, 4:] - cums[:, :-4]  # [B, D, H, W]
    idx_f = jnp.sum(prob_volume * jnp.arange(d, dtype=prob_volume.dtype
                                             ).reshape(1, d, 1, 1), axis=1)
    idx = idx_f.astype(jnp.int32)  # trunc toward zero == torch .long()
    return jnp.take_along_axis(sum4, idx[:, None], axis=1)[:, 0]

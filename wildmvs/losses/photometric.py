"""Unsupervised photometric (DSSIM) losses, with optional occlusion masking.

Parity: models/trainer.py:209-278.  The occlusion-masked variant in the
reference gathers per-rank depthmaps with dist.all_gather; here the gather is
the caller's job (see wildmvs/dist): the loss takes the already-stacked
[B, N, H, W] depthmaps so it works identically under shard_map's all_gather,
a vmap over reference views, or single-process evaluation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.projective import flows_from_single_depthmap, normalize_flow
from ..ops.grid_sample import grid_sample
from .ssim import dssim
# canonical masked mean lives with the supervised losses; re-exported here
# because the photometric callers (and the trainer) import it from this module
from .supervised import masked_mean  # noqa: F401


def get_flow_from_depthmap(depth_est: jnp.ndarray, proj_mat: jnp.ndarray,
                           src_hw: tuple[int, int], ref_idx: int):
    """Normalized sampling flows from a reference depthmap into source views.

    Parity: models/trainer.py:209-219 — flows normalized with the
    align_corners convention (utils_3D.normalize), behind-camera -> -10,
    clamped to [-10, 10].

    Args:
      depth_est: [B, H, W].
      proj_mat: [B, N, 4, 4].
      src_hw: (h, w) of the source images being sampled.
    Returns:
      (flows [B, N-1, H, W, 2] in [-1, 1]-ish, src_depth [B, N-1, H, W]).
    """
    h, w = src_hw
    px_flow, depth = flows_from_single_depthmap(depth_est, proj_mat, ref_idx)
    flows = normalize_flow(px_flow, h, w, align_corners=True)
    flows = jnp.where((depth <= 0)[..., None], -10.0, flows)
    return jnp.clip(flows, -10.0, 10.0), depth


def photometric_loss(imgs: jnp.ndarray, depth_est: jnp.ndarray,
                     proj_mat: jnp.ndarray):
    """Per-source DSSIM maps + in-frustum masks (reference view = index 0).

    Parity: models/trainer.py:221-238 (grid_sample with align_corners=False
    over flows normalized align_corners=True — reproduced exactly).

    Args:
      imgs: [B, N, H, W, C] images at loss resolution (view 0 = reference).
      depth_est: [B, H, W] predicted reference depth at the same resolution.
      proj_mat: [B, N, 4, 4] projection matrices at the same resolution.
    Returns:
      (ssim [B, N-1, H, W], mask [B, N-1, H, W] float).
    """
    b, n, h, w, c = imgs.shape
    flows, _ = get_flow_from_depthmap(depth_est, proj_mat, (h, w), 0)
    mask = jnp.all((flows < 1.0) & (flows > -1.0), axis=-1).astype(imgs.dtype)

    def warp_one(src_img, flow):
        return jax.vmap(lambda im, g: grid_sample(im, g, align_corners=False))(
            src_img, flow)

    ssims = []
    for i in range(1, n):
        warped = warp_one(imgs[:, i], flows[:, i - 1])  # [B, H, W, C]
        ssims.append(jnp.mean(dssim(imgs[:, 0], warped), axis=-1))
    return jnp.stack(ssims, axis=1), mask


def warped_src_views(imgs: jnp.ndarray, depth_est: jnp.ndarray,
                     proj_mat: jnp.ndarray, ref_idx: int = 0):
    """Source views warped into the reference frame by the predicted depth.

    The reference's main visual debugging aid for the unsupervised mode
    (models/trainer.py:258-276 — the `warped_ref_{r}src_{s}` image panels).

    Args:
      imgs: [B, N, H, W, C]; depth_est: [B, H, W] reference depth;
      proj_mat: [B, N, 4, 4] at image resolution.
    Returns:
      (warped [B, N-1, H, W, C] in source order excluding ref_idx,
       inside [B, N-1, H, W] in-frustum mask).
    """
    b, n, h, w, c = imgs.shape
    flows, _ = get_flow_from_depthmap(depth_est, proj_mat, (h, w), ref_idx)
    inside = jnp.all((flows < 1.0) & (flows > -1.0), axis=-1)
    src_idx = [i for i in range(n) if i != ref_idx]
    warped = jnp.stack([
        jax.vmap(lambda im, g: grid_sample(im, g, align_corners=False))(
            imgs[:, i], flows[:, k]) for k, i in enumerate(src_idx)], axis=1)
    return warped, inside.astype(imgs.dtype)


def masked_photometric_loss(imgs: jnp.ndarray, all_depthmaps: jnp.ndarray,
                            proj_mat: jnp.ndarray, ref_idx: int,
                            geom_clamping: float = 0.05):
    """Occlusion-masked photometric loss (the repo's novel training mode).

    Parity: models/trainer.py:240-278. Each view's depthmap (predicted by its
    own shard/rank in the reference) cross-checks the reference view's
    reprojection: a pixel contributes only if the source's own depth agrees
    with the reprojected depth within `geom_clamping` (relative).

    Args:
      imgs: [B, N, H, W, C] images at loss resolution.
      all_depthmaps: [B, N, H, W] depth of EVERY view (view i estimated with
        reference i), already gathered across the view axis.
      proj_mat: [B, N, 4, 4].
      ref_idx: static reference view for THIS shard.
      geom_clamping: relative depth-consistency gate (train.py:278 default).
    Returns:
      (ssim [B, N-1, H, W], mask [B, N-1, H, W] float).
    """
    b, n, h, w, c = imgs.shape
    src_idx = [i for i in range(n) if i != ref_idx]
    ref_depthmap = all_depthmaps[:, ref_idx]

    flows, depth_src = get_flow_from_depthmap(ref_depthmap, proj_mat, (h, w),
                                              ref_idx)
    inside = jnp.all((flows < 1.0) & (flows > -1.0), axis=-1)

    ssims, masks = [], []
    for k, i in enumerate(src_idx):
        warped = jax.vmap(lambda im, g: grid_sample(im, g, align_corners=False))(
            imgs[:, i], flows[:, k])
        warped_src_depth = jax.vmap(
            lambda im, g: grid_sample(im, g, align_corners=False))(
            all_depthmaps[:, i][..., None], flows[:, k])[..., 0]
        denom = jax.lax.stop_gradient(jnp.maximum(warped_src_depth, 1e-8))
        reproj_diff = jnp.abs(depth_src[:, k] - warped_src_depth) / denom
        ssims.append(jnp.mean(dssim(imgs[:, ref_idx], warped), axis=-1))
        masks.append(inside[:, k].astype(imgs.dtype)
                     * (reproj_diff < geom_clamping).astype(imgs.dtype))
    return jnp.stack(ssims, axis=1), jnp.stack(masks, axis=1)



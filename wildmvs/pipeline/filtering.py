"""Geometric cross-view consistency filtering (pre-fusion), device-side.

Parity: evaluation/filtering.py:60-85 — unproject the reference depthmap,
project into each source view, sample the source depthmap there, reproject
that source depth back into the reference view, then gate on:
  * reprojection error < max_reproj_error px (default 1)
  * relative depth difference < depth_threshold (default 0.01)
  * triangulation angle > min_tri_angle deg (default 1)
A pixel passes a mask if >= num_consistent - 1 source views agree.

The reference runs this on CPU torch (filtering.py:47); here it is a jitted
channels-last jnp function that runs on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geometry.projective import (compute_triangulation_angles, pixel_grid,
                                   unproject)
from ..ops.grid_sample import grid_sample


@functools.partial(jax.jit, static_argnames=("max_reproj_error",
                                             "depth_threshold",
                                             "min_tri_angle",
                                             "num_consistent"))
def geometric_filter(ref_depth: jnp.ndarray, src_depths: jnp.ndarray,
                     K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                     max_reproj_error: float = 1.0,
                     depth_threshold: float = 0.01,
                     min_tri_angle: float = 1.0,
                     num_consistent: int = 3):
    """Compute consistency masks for one reference view.

    Args:
      ref_depth: [H, W] reference depthmap.
      src_depths: [N-1, h, w] source depthmaps — or a per-view list/tuple
        with heterogeneous sizes (in-the-wild scenes).
      K, R, t: [N, 3, 3]/[N, 3, 3]/[N, 3, 1], view 0 = reference.
    Returns:
      dict(mask_depth, mask_disp, geo_mask) of [H, W] bools.
    """
    h, w = ref_depth.shape
    srcs = (list(src_depths) if isinstance(src_depths, (list, tuple))
            else [src_depths[i] for i in range(src_depths.shape[0])])
    n_src = len(srcs)
    grid = pixel_grid(h, w, ref_depth.dtype)  # [H, W, 2]

    pc = unproject(grid, K[0], R[0], t[0], ref_depth)  # [H, W, 3] world

    def per_src(i):
        cam = pc @ R[i + 1].T + t[i + 1][:, 0]
        pix = cam @ K[i + 1].T
        depth_in_src = pix[..., 2]
        proj = pix[..., :2] / jnp.maximum(depth_in_src, 1e-6)[..., None]
        sh, sw = srcs[i].shape
        # normalize with the (w-1) convention, sample align_corners=False —
        # the reference's exact combination (filtering.py:66-69)
        gx = 2.0 * proj[..., 0] / (sw - 1.0) - 1.0
        gy = 2.0 * proj[..., 1] / (sh - 1.0) - 1.0
        sampled = grid_sample(srcs[i][..., None],
                              jnp.stack([gx, gy], -1),
                              align_corners=False)[..., 0]
        # reproject: unproject the sampled source depth at the projected
        # pixel, project back to the reference view
        src_pc = unproject(proj, K[i + 1], R[i + 1], t[i + 1], sampled)
        back_cam = src_pc @ R[0].T + t[0][:, 0]
        back_pix = back_cam @ K[0].T
        depth_reproj = back_pix[..., 2] + 1e-6
        reproj = back_pix[..., :2] / depth_reproj[..., None]
        reproj_err = jnp.linalg.norm(reproj - grid, axis=-1)
        valid_disp = reproj_err < max_reproj_error
        mask_depth = ((jnp.abs(depth_reproj - ref_depth)
                       < jnp.maximum(depth_reproj, ref_depth) * depth_threshold)
                      & (depth_reproj > 0) & (depth_in_src > 0))
        return mask_depth, valid_disp

    masks = [per_src(i) for i in range(n_src)]
    mask_depth = jnp.stack([m[0] for m in masks])
    valid_disp = jnp.stack([m[1] for m in masks])
    mask_tri = compute_triangulation_angles(pc, R, t) > min_tri_angle
    geo = mask_depth & valid_disp & mask_tri
    need = num_consistent - 1
    return {
        "mask_depth": jnp.sum(mask_depth, axis=0) >= need,
        "mask_disp": jnp.sum(valid_disp, axis=0) >= need,
        "geo_mask": jnp.sum(geo, axis=0) >= need,
    }

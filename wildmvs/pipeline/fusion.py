"""Native depthmap fusion — the TPU replacement for the external fusibile
(CUDA) and COLMAP stereo_fusion (C++) binaries (SURVEY §2.9/2.10).

Algorithm (the Gipuma/fusibile scheme re-designed as per-view device kernels
+ host-side point assembly):
  for each reference view r (sequential, so duplicate surface points can be
  suppressed):
    1. unproject every unused valid pixel to 3D
    2. project into every other view, sample that view's depthmap
    3. consistent(i) := |d_projected - d_sampled| < disp_threshold *
       max(d_projected, d_sampled)  AND the sample lands in-frame with
       positive depth AND that source pixel has not already been consumed
       by an earlier reference view
    4. keep pixels with >= num_consistent consistent views; the output point
       is the average of the reference unprojection and every consistent
       source unprojection (reduces noise like fusibile's averaging)
    5. mark the consistent source pixels AND the kept reference pixels as
       used (they described the same surface point)

The whole per-view step, including the used-mask scatter, is one jitted
function; only the candidate points and keep mask cross to the host.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.projective import pixel_grid, project, unproject


@functools.partial(jax.jit, static_argnames=("disp_threshold",
                                             "num_consistent",
                                             "max_reproj_error"))
def _fuse_one_view(ref_idx: jnp.ndarray, depths: jnp.ndarray,
                   used: jnp.ndarray, Ks: jnp.ndarray, Rs: jnp.ndarray,
                   ts: jnp.ndarray, disp_threshold: float = 0.01,
                   num_consistent: int = 3,
                   max_reproj_error: float | None = None):
    """One reference view's fusion step.

    Args:
      ref_idx: scalar int index of the reference view.
      depths: [N, H, W] all (masked) depthmaps; 0 = invalid.
      used: [N, H, W] bool, pixels already consumed by earlier views.
      Ks, Rs, ts: [N, 3, 3]/[N, 3, 3]/[N, 3, 1].
    Returns:
      (points [H*W, 3], keep [H*W] bool, new_used [N, H, W] bool).
    """
    n, h, w = depths.shape
    K0 = Ks[ref_idx]
    R0 = Rs[ref_idx]
    t0 = ts[ref_idx]
    ref_depth = depths[ref_idx]
    ref_used = used[ref_idx]

    grid = pixel_grid(h, w, depths.dtype)
    pc = unproject(grid, K0, R0, t0, ref_depth)        # [H, W, 3]
    valid = (ref_depth > 0) & (~ref_used)

    def per_view(i):
        proj, d_proj = project(pc, Ks[i], Rs[i], ts[i])
        ix = jnp.round(proj[..., 0]).astype(jnp.int32)
        iy = jnp.round(proj[..., 1]).astype(jnp.int32)
        inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h) & (d_proj > 0)
        ixc = jnp.clip(ix, 0, w - 1)
        iyc = jnp.clip(iy, 0, h - 1)
        d_smp = depths[i][iyc, ixc]
        consistent = (inb & (d_smp > 0) & (~used[i][iyc, ixc])
                      & (jnp.abs(d_proj - d_smp)
                         < disp_threshold * jnp.maximum(d_proj, d_smp))
                      & ~(i == ref_idx))
        src_pt = unproject(jnp.stack([ixc, iyc], -1).astype(depths.dtype),
                           Ks[i], Rs[i], ts[i], d_smp)
        if max_reproj_error is not None:
            # COLMAP stereo_fusion's extra gate (colmap_utils.py:396 /
            # --fusion_max_reproj_error): the source point must land back
            # within `max_reproj_error` px of the reference pixel
            bproj, _ = project(src_pt, K0, R0, t0)
            consistent = consistent & (
                jnp.linalg.norm(bproj - grid, axis=-1) < max_reproj_error)
        return consistent, src_pt, iyc * w + ixc

    cons, pts, flat = [], [], []
    for i in range(n):
        c, p, f = per_view(i)
        cons.append(c)
        pts.append(p)
        flat.append(f)
    consistent = jnp.stack(cons)                       # [N, H, W]
    src_pts = jnp.stack(pts)                           # [N, H, W, 3]

    count = jnp.sum(consistent, axis=0)
    # num_consistent counts the reference itself, like the in-repo filter
    # (evaluation/filtering.py:81-83): >= num_consistent - 1 agreeing sources
    keep = valid & (count >= num_consistent - 1)
    # averaged 3D point: ref + consistent sources
    csum = jnp.sum(src_pts * consistent[..., None], axis=0) + pc
    point = csum / (count[..., None] + 1.0)
    # consume the agreeing source pixels and the kept reference pixels so
    # later reference views neither re-fuse nor re-count this surface point
    consumed = consistent & keep[None]
    upd = [jnp.zeros((h * w,), bool).at[flat[i].reshape(-1)]
           .max(consumed[i].reshape(-1)) for i in range(n)]
    new_used = used | jnp.stack(upd).reshape(n, h, w)
    new_used = new_used.at[ref_idx].set(new_used[ref_idx] | keep)
    return point.reshape(-1, 3), keep.reshape(-1), new_used


@functools.partial(jax.jit, static_argnames=("ref_idx", "disp_threshold",
                                             "num_consistent",
                                             "max_reproj_error"))
def _fuse_one_view_ragged(ref_idx: int, depths, used, Ks, Rs, ts,
                          disp_threshold: float = 0.01,
                          num_consistent: int = 3,
                          max_reproj_error: float | None = None):
    """_fuse_one_view for heterogeneous per-view depthmap sizes: `depths`
    and `used` are per-view tuples, so ref_idx must be static (one trace
    per reference view instead of one shared program)."""
    n = len(depths)
    K0, R0, t0 = Ks[ref_idx], Rs[ref_idx], ts[ref_idx]
    ref_depth = depths[ref_idx]
    h, w = ref_depth.shape
    grid = pixel_grid(h, w, ref_depth.dtype)
    pc = unproject(grid, K0, R0, t0, ref_depth)
    valid = (ref_depth > 0) & (~used[ref_idx])

    cons, pts, flats = [], [], []
    for i in range(n):
        sh, sw = depths[i].shape
        proj, d_proj = project(pc, Ks[i], Rs[i], ts[i])
        ix = jnp.round(proj[..., 0]).astype(jnp.int32)
        iy = jnp.round(proj[..., 1]).astype(jnp.int32)
        inb = (ix >= 0) & (ix < sw) & (iy >= 0) & (iy < sh) & (d_proj > 0)
        ixc = jnp.clip(ix, 0, sw - 1)
        iyc = jnp.clip(iy, 0, sh - 1)
        d_smp = depths[i][iyc, ixc]
        consistent = (inb & (d_smp > 0) & (~used[i][iyc, ixc])
                      & (jnp.abs(d_proj - d_smp)
                         < disp_threshold * jnp.maximum(d_proj, d_smp))
                      & (i != ref_idx))
        src_pt = unproject(jnp.stack([ixc, iyc], -1).astype(ref_depth.dtype),
                           Ks[i], Rs[i], ts[i], d_smp)
        if max_reproj_error is not None:
            bproj, _ = project(src_pt, K0, R0, t0)
            consistent = consistent & (
                jnp.linalg.norm(bproj - grid, axis=-1) < max_reproj_error)
        cons.append(consistent)
        pts.append(src_pt)
        flats.append(iyc * sw + ixc)
    consistent = jnp.stack(cons)
    src_pts = jnp.stack(pts)
    count = jnp.sum(consistent, axis=0)
    keep = valid & (count >= num_consistent - 1)
    csum = jnp.sum(src_pts * consistent[..., None], axis=0) + pc
    point = csum / (count[..., None] + 1.0)
    new_used = []
    for i in range(n):
        sh, sw = depths[i].shape
        consumed = (consistent[i] & keep).reshape(-1)
        upd = jnp.zeros((sh * sw,), bool).at[flats[i].reshape(-1)] \
            .max(consumed).reshape(sh, sw)
        if i == ref_idx:
            upd = upd | keep
        new_used.append(used[i] | upd)
    return point.reshape(-1, 3), keep.reshape(-1), tuple(new_used)


def fuse_depthmaps(depths, Ks: np.ndarray, Rs: np.ndarray,
                   ts: np.ndarray, colors=None,
                   disp_threshold: float = 0.01, num_consistent: int = 3,
                   max_reproj_error: float | None = None):
    """Fuse all views' (pre-masked) depthmaps into one point cloud.

    Args:
      depths: [N, H, W] — or a per-view list of [Hi, Wi] maps with
        heterogeneous sizes (in-the-wild scenes); invalid pixels must be 0
        (prob/geo-masked upstream, parity evaluation/fusibile.py:152-158).
      Ks, Rs, ts: [N, 3, 3]/[N, 3, 3]/[N, 3, 1].
      colors: optional [N, H, W, 3] (or matching per-view list) float [0,1]
        or uint8.
    Returns:
      (points [M, 3] float64, colors [M, 3] uint8 or None).
    """
    ragged = (isinstance(depths, (list, tuple))
              and len({d.shape for d in depths}) > 1)
    n = len(depths)
    Ks_j, Rs_j, ts_j = jnp.asarray(Ks), jnp.asarray(Rs), jnp.asarray(ts)
    if ragged:
        depths_j = tuple(jnp.asarray(d) for d in depths)
        used = tuple(jnp.zeros(d.shape, bool) for d in depths)
    else:
        depths_j = jnp.asarray(np.stack(depths)
                               if isinstance(depths, (list, tuple))
                               else depths)
        used = jnp.zeros(depths_j.shape, bool)  # stays on device
    all_pts, all_cols = [], []
    for r in range(n):
        if ragged:
            point, keep, used = _fuse_one_view_ragged(
                r, depths_j, used, Ks_j, Rs_j, ts_j,
                disp_threshold=disp_threshold,
                num_consistent=num_consistent,
                max_reproj_error=max_reproj_error)
        else:
            point, keep, used = _fuse_one_view(
                jnp.asarray(r), depths_j, used, Ks_j, Rs_j, ts_j,
                disp_threshold=disp_threshold,
                num_consistent=num_consistent,
                max_reproj_error=max_reproj_error)
        keep_np = np.asarray(keep)
        all_pts.append(np.asarray(point)[keep_np])
        if colors is not None:
            col = np.asarray(colors[r]).reshape(-1, 3)[keep_np]
            if col.dtype != np.uint8:
                col = (np.clip(col, 0, 1) * 255).astype(np.uint8)
            all_cols.append(col)
    points = np.concatenate(all_pts, axis=0) if all_pts else np.zeros((0, 3))
    cols = (np.concatenate(all_cols, axis=0) if colors is not None and all_cols
            else None)
    return points, cols

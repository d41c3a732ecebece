"""Plane-sweep warping — the hot op of every MVS architecture here.

Given source-view features and relative projection, produce the source features
resampled onto the reference pixel grid for every depth hypothesis.  Two grid
conventions exist in the reference and both are reproduced exactly:

  * MVSNet/CVP convention (models/MVSNet/module.py:111-169,
    models/CVP_MVSNet/models/modules.py:74-128): integer pixel grid,
    behind-camera points sent to pixel -10, align_corners=True normalization
    x_n = x/((W-1)/2) - 1, grid clamped to [-10, 10].
  * Vis-MVSNet convention (models/VisMVSNet/homography.py:77-121): pixel-center
    grid (+0.5), plane-induced homographies, normalization x_n = 2 x / W - 1,
    clamp to [-1.1, 1.1], behind-camera -> pixel -10, align_corners=True sample.

Layout: features [B, H, W, C]; output volumes [B, D, H, W, C]; depth values
either [B, D] (fronto-parallel sweep) or [B, D, H, W] (per-pixel hypothesis
maps, used by CVP refinement and Vis-MVSNet stages 2-3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.projective import pixel_grid
from .grid_sample import grid_sample, grid_sample_xy


def sweep_grid_xy(src_proj: jnp.ndarray, ref_proj: jnp.ndarray,
                  depth_values: jnp.ndarray, ref_hw: tuple[int, int],
                  src_hw: tuple[int, int]):
    """Normalized sampling grid for the MVSNet-style plane sweep, as
    separate (x, y) planes.

    Parity: models/MVSNet/module.py:127-155.  The planes stay separate end
    to end: a stacked [..., 2]-minor grid tensor is padded 64x by TPU
    (8,128) tiling and dominated the warp cost (see grid_sample.py).

    Args:
      src_proj, ref_proj: [B, 4, 4] projection matrices.
      depth_values: [B, D] or [B, D, H, W].
      ref_hw: (H, W) of the reference feature grid.
      src_hw: (h, w) of the source feature map (for normalization).
    Returns:
      (xn, yn): two [B, D, H, W] normalized planes, clamped to [-10, 10].
    """
    rh, rw = ref_hw
    sh, sw = src_hw
    b = src_proj.shape[0]
    d = depth_values.shape[1]

    proj = src_proj @ jnp.linalg.inv(ref_proj)  # [B, 4, 4]
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3]

    grid = pixel_grid(rh, rw, depth_values.dtype)  # [H, W, 2]
    xyz = jnp.concatenate([grid, jnp.ones_like(grid[..., :1])], -1)  # [H, W, 3]
    rot_xyz = jnp.einsum("bij,hwj->bihw", rot, xyz)  # [B, 3, H, W]

    if depth_values.ndim == 2:
        depth = depth_values.reshape(b, 1, d, 1, 1)
    else:
        depth = depth_values[:, None]  # [B, 1, D, H, W]

    proj_xyz = rot_xyz[:, :, None] * depth + trans[:, :, None, None, None]
    z = proj_xyz[:, 2]
    x = proj_xyz[:, 0] / z
    y = proj_xyz[:, 1] / z
    # behind-camera points go far outside the image (pixel coordinate -10),
    # matching module.py:147-150
    behind = z <= 0
    x = jnp.where(behind, -10.0, x)
    y = jnp.where(behind, -10.0, y)
    xn = jnp.clip(x / ((sw - 1) / 2.0) - 1.0, -10.0, 10.0)
    yn = jnp.clip(y / ((sh - 1) / 2.0) - 1.0, -10.0, 10.0)
    # the reference computes the ENTIRE grid under torch.no_grad()
    # (module.py:127, CVP modules.py:88/242): no gradient flows through
    # the sampling coordinates — only through the sampled features.
    # Matching that is also a large train-step win: the coordinate chain's
    # VJP costs two extra 4-corner gathers per index (feature spatial
    # gradients) plus the quotient/einsum transposes.
    return jax.lax.stop_gradient(xn), jax.lax.stop_gradient(yn)


def sweep_grid(src_proj: jnp.ndarray, ref_proj: jnp.ndarray,
               depth_values: jnp.ndarray, ref_hw: tuple[int, int],
               src_hw: tuple[int, int]) -> jnp.ndarray:
    """Stacked [B, D, H, W, 2] form of `sweep_grid_xy` (API/test surface —
    use the xy form on hot paths)."""
    xn, yn = sweep_grid_xy(src_proj, ref_proj, depth_values, ref_hw, src_hw)
    return jnp.stack([xn, yn], axis=-1)


def warp_volume(src_fea: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample source features over a [B, D, H, W, 2] grid (align_corners=True).

    Returns [B, D, H, W, C]. Parity: models/MVSNet/module.py:164-167.
    """
    return jax.vmap(lambda im, g: grid_sample(im, g, align_corners=True))(src_fea, grid)


def plane_sweep_warp(src_fea: jnp.ndarray, src_proj: jnp.ndarray,
                     ref_proj: jnp.ndarray, depth_values: jnp.ndarray,
                     ref_hw: tuple[int, int] | None = None) -> jnp.ndarray:
    """MVSNet homography warp: source features -> reference sweep volume.

    Parity: models/MVSNet/module.py:111-169 (`homo_warping`).

    Args:
      src_fea: [B, h, w, C] source features.
      src_proj, ref_proj: [B, 4, 4].
      depth_values: [B, D] or [B, D, H, W].
      ref_hw: reference grid size; defaults to the source size.
    Returns:
      [B, D, H, W, C] warped feature volume (zeros out-of-frustum).
    """
    if ref_hw is None:
        ref_hw = src_fea.shape[1:3]
    xn, yn = sweep_grid_xy(src_proj, ref_proj, depth_values, ref_hw,
                           src_fea.shape[1:3])
    return jax.vmap(
        lambda im, gx, gy: grid_sample_xy(im, gx, gy, align_corners=True)
    )(src_fea, xn, yn)


# ---------------------------------------------------------------------------
# Vis-MVSNet convention: plane-induced homographies + pixel-center sampling.
# ---------------------------------------------------------------------------

def get_homographies(K_ref, R_ref, t_ref, K_src, R_src, t_src,
                     depth_num: int, depth_start, depth_interval,
                     inverse_depth: bool = False) -> jnp.ndarray:
    """Fronto-parallel plane-induced homographies per depth hypothesis.

    Parity: models/VisMVSNet/homography.py:23-74 (`get_homographies`); the
    reference packs cams as [B,2,4,4] arrays — here poses are passed directly.

    Args:
      K_ref, R_ref: [B, 3, 3]; t_ref: [B, 3, 1]; same for src.
      depth_start: [B, 1, 1, 1] or [B, 1, H, W] (per-pixel slab start).
      depth_interval: [B, 1, 1, 1].
    Returns:
      [B, D, H', W', 3, 3] homographies (H'/W' broadcast dims of depth_start).
    """
    d = depth_num
    dtype = K_ref.dtype
    steps = jnp.arange(d, dtype=dtype).reshape(1, d, 1, 1)
    if not inverse_depth:
        depth = depth_start + depth_interval * steps  # [B, D, H', W']
    else:
        depth_end = depth_start + (d - 1) * depth_interval
        inv_interv = (1.0 / (depth_start + 1e-9) - 1.0 / (depth_end + 1e-9)) / (d - 1 + 1e-9)
        depth = 1.0 / (1.0 / (depth_end + 1e-9) + inv_interv * steps)
    depth = depth[..., None, None]  # [B, D, H', W', 1, 1]

    K_ref_inv = jnp.linalg.inv(K_ref)
    R_ref_T = jnp.swapaxes(R_ref, -1, -2)
    R_src_T = jnp.swapaxes(R_src, -1, -2)
    fronto = R_ref[:, 2:3, :]  # [B, 1, 3]
    c_ref = -R_ref_T @ t_ref
    c_src = -R_src_T @ t_src
    c_rel = c_src - c_ref  # [B, 3, 1]

    temp = (c_rel @ fronto)[:, None, None, None]  # [B,1,1,1,3,3]
    eye = jnp.eye(3, dtype=dtype)
    mid0 = eye - temp / (depth + 1e-9)  # [B, D, H', W', 3, 3]
    mid1 = (R_ref_T @ K_ref_inv)[:, None, None, None]
    homog = (K_src @ R_src)[:, None, None, None] @ (mid0 @ mid1)
    return homog


def homography_warp(src: jnp.ndarray, H: jnp.ndarray,
                    ref_hw: tuple[int, int] | None = None) -> jnp.ndarray:
    """Warp source features by (possibly per-pixel) homographies.

    Parity: models/VisMVSNet/homography.py:107-121 incl. the repo's
    behind-camera modification, and `interpolate` (:85-104): coords divided by
    the source size, clamped to [-1.1, 1.1], sampled align_corners=True.

    Args:
      src: [B, h, w, C] source features.
      H: [B, 3, 3] or [B, H', W', 3, 3] homographies mapping ref pixels
        (center convention, +0.5) to source pixels.
      ref_hw: output grid size (defaults to source size).
    Returns:
      [B, H, W, C].
    """
    if ref_hw is None:
        ref_hw = src.shape[1:3]
    rh, rw = ref_hw
    sh, sw = src.shape[1:3]
    grid = pixel_grid(rh, rw, src.dtype, offset=0.5)
    hom = jnp.concatenate([grid, jnp.ones_like(grid[..., :1])], -1)  # [H, W, 3]
    if H.ndim == 3:
        warped = jnp.einsum("bij,hwj->bhwi", H, hom)
    else:
        warped = jnp.einsum("bhwij,hwj->bhwi", H, hom)
    z = warped[..., 2]
    zs = jnp.maximum(z, 1e-9)
    x = jnp.where(z > 0, warped[..., 0] / zs, -10.0)
    y = jnp.where(z > 0, warped[..., 1] / zs, -10.0)
    # interpolate(): normalize by the *size* (not size-1), then *2-1
    xn = jnp.clip(x / sw * 2.0 - 1.0, -1.1, 1.1)
    yn = jnp.clip(y / sh * 2.0 - 1.0, -1.1, 1.1)
    return jax.vmap(
        lambda im, gx, gy: grid_sample_xy(im, gx, gy, align_corners=True)
    )(src, xn, yn)


def homography_sweep_grid_xy(src_hw: tuple[int, int], K_ref, R_ref, t_ref,
                             K_src, R_src, t_src, depth_num: int,
                             depth_start, depth_interval,
                             ref_hw: tuple[int, int], dtype,
                             batch: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normalized (xn, yn) planes of the Vis-MVSNet homography sweep —
    the grid half of homography_sweep_warp, exposed so custom VJPs can
    build the feature-linear transpose without re-deriving it.

    TPU-first decomposition: the plane-induced homography is H(d) = A - B/d
    with A = K_src R_src R_ref^T K_ref^-1 and B = K_src R_src c_rel f^T
    R_ref^T K_ref^-1 (f = ref fronto direction), so the warped coordinate of
    pixel p at depth d is (A p) - (B p)/d — two [B,H,W,3] tensors instead of
    [B,D,H,W,3,3] homography stacks, with the per-depth work a cheap fused
    elementwise op.
    """
    rh, rw = ref_hw
    sh, sw = src_hw
    d = depth_num

    K_ref_inv = jnp.linalg.inv(K_ref)
    R_ref_T = jnp.swapaxes(R_ref, -1, -2)
    fronto = R_ref[:, 2:3, :]                       # [B, 1, 3]
    c_rel = (-jnp.swapaxes(R_src, -1, -2) @ t_src) - (-R_ref_T @ t_ref)
    M = K_src @ R_src                               # [B, 3, 3]
    A = M @ R_ref_T @ K_ref_inv                     # [B, 3, 3]
    Bm = M @ (c_rel @ fronto) @ R_ref_T @ K_ref_inv  # [B, 3, 3]

    grid = pixel_grid(rh, rw, dtype, offset=0.5)    # homography.py:77-82
    hom = jnp.concatenate([grid, jnp.ones_like(grid[..., :1])], -1)
    # coordinate planes stay separate ([..., 2]/[..., 3]-minor tensors pad
    # 64x/43x under TPU (8,128) tiling — see grid_sample.py)
    Ap = jnp.einsum("bij,hwj->bihw", A, hom)        # [B, 3, H, W]
    Bp = jnp.einsum("bij,hwj->bihw", Bm, hom)       # [B, 3, H, W]

    steps = jnp.arange(d, dtype=dtype).reshape(1, d, 1, 1)
    depth = depth_start + depth_interval * steps    # [B, D, H', W'] (H' in {1,H})
    depth = jnp.broadcast_to(depth, (batch, d, rh, rw))

    de = depth + 1e-9                               # [B, D, H, W]
    warped_x = Ap[:, 0, None] - Bp[:, 0, None] / de
    warped_y = Ap[:, 1, None] - Bp[:, 1, None] / de
    z = Ap[:, 2, None] - Bp[:, 2, None] / de
    zs = jnp.maximum(z, 1e-9)
    x = jnp.where(z > 0, warped_x / zs, -10.0)      # homography.py:113-118
    y = jnp.where(z > 0, warped_y / zs, -10.0)
    xn = jnp.clip(x / sw * 2.0 - 1.0, -1.1, 1.1)    # interpolate() convention
    yn = jnp.clip(y / sh * 2.0 - 1.0, -1.1, 1.1)
    # no_grad grid parity (homography.py:25/92/110): gradients flow only
    # through the sampled features, never the coordinates — see
    # sweep_grid_xy for the train-step cost rationale.
    return jax.lax.stop_gradient(xn), jax.lax.stop_gradient(yn)


def homography_sweep_warp(src: jnp.ndarray, K_ref, R_ref, t_ref, K_src, R_src,
                          t_src, depth_num: int, depth_start, depth_interval,
                          ref_hw: tuple[int, int] | None = None) -> jnp.ndarray:
    """Vis-MVSNet cost-volume warp: [B, D, H, W, C] via per-depth homographies.

    Parity: models/VisMVSNet/model_cas.py:176-187 (`build_cost_volume`) +
    homography.py:23-121. depth_start may be [B,1,1,1] or a per-pixel
    [B,1,H,W] map (cascade stages 2-3 re-center the slab per pixel).
    Grid math in homography_sweep_grid_xy (TPU-first H(d) = A - B/d
    factoring)."""
    if ref_hw is None:
        ref_hw = src.shape[1:3]
    xn, yn = homography_sweep_grid_xy(
        src.shape[1:3], K_ref, R_ref, t_ref, K_src, R_src, t_src,
        depth_num, depth_start, depth_interval, ref_hw, src.dtype,
        src.shape[0])
    return jax.vmap(
        lambda im, gx, gy: grid_sample_xy(im, gx, gy, align_corners=True)
    )(src, xn, yn)

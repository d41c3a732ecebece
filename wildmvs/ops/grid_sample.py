"""Bilinear sampling on TPU — channels-last, gather-based jnp reference.

Semantics match torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='zeros') for both align_corners conventions; verified against
torch CPU in tests/test_grid_sample.py.  The reference's entire warp stack is
built on this op (models/MVSNet/module.py:164-166,
models/VisMVSNet/homography.py:101-103, models/CVP_MVSNet/models/modules.py:124).

Layout: images are channels-last [..., H, W, C]; grids are [..., 2] with (x, y)
normalized coordinates in [-1, 1].
"""
from __future__ import annotations

import jax.numpy as jnp


def unnormalize_coords(grid: jnp.ndarray, h: int, w: int, align_corners: bool):
    """[-1,1] NDC -> continuous pixel coords, torch grid_sample convention."""
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (w - 1)
        y = (gy + 1.0) * 0.5 * (h - 1)
    else:
        x = ((gx + 1.0) * w - 1.0) * 0.5
        y = ((gy + 1.0) * h - 1.0) * 0.5
    return x, y


def _gather_hw(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather img[iy, ix] with flat indices. img: [H, W, C]; iy/ix: [...]."""
    h, w, c = img.shape
    flat = img.reshape(h * w, c)
    idx = iy * w + ix
    return jnp.take(flat, idx.reshape(-1), axis=0).reshape(idx.shape + (c,))


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                align_corners: bool = True) -> jnp.ndarray:
    """Bilinear zero-padded sampling of a single image.

    Args:
      img: [H, W, C].
      grid: [..., 2] normalized (x, y) in [-1, 1] (values outside -> zeros).
      align_corners: torch convention selector.
    Returns:
      [..., C] sampled values.
    """
    h, w, _ = img.shape
    x, y = unnormalize_coords(grid, h, w, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner(yc, xc, wy, wx):
        valid = (xc >= 0) & (xc <= w - 1) & (yc >= 0) & (yc <= h - 1)
        iy = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        ix = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        vals = _gather_hw(img, iy, ix)
        weight = jnp.where(valid, wy * wx, 0.0)
        return vals * weight[..., None]

    out = (corner(y0, x0, wy0, wx0) + corner(y0, x1, wy0, wx1)
           + corner(y1, x0, wy1, wx0) + corner(y1, x1, wy1, wx1))
    return out


def grid_sample_nhwc(imgs: jnp.ndarray, grid: jnp.ndarray,
                     align_corners: bool = True) -> jnp.ndarray:
    """Batched bilinear sampling.

    Args:
      imgs: [B, H, W, C].
      grid: [B, ..., 2] normalized (x, y).
    Returns:
      [B, ..., C].
    """
    import jax
    return jax.vmap(lambda im, g: grid_sample(im, g, align_corners))(imgs, grid)

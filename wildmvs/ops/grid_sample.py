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


def unnormalize_coords_xy(gx: jnp.ndarray, gy: jnp.ndarray, h: int, w: int,
                          align_corners: bool):
    """[-1,1] NDC -> continuous pixel coords, torch grid_sample convention."""
    if align_corners:
        x = (gx + 1.0) * 0.5 * (w - 1)
        y = (gy + 1.0) * 0.5 * (h - 1)
    else:
        x = ((gx + 1.0) * w - 1.0) * 0.5
        y = ((gy + 1.0) * h - 1.0) * 0.5
    return x, y


def unnormalize_coords(grid: jnp.ndarray, h: int, w: int, align_corners: bool):
    """Stacked-grid form of `unnormalize_coords_xy`."""
    return unnormalize_coords_xy(grid[..., 0], grid[..., 1], h, w,
                                 align_corners)


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                align_corners: bool = True) -> jnp.ndarray:
    """Bilinear zero-padded sampling of a single image.

    Args:
      img: [H, W, C].
      grid: [..., 2] normalized (x, y) in [-1, 1] (values outside -> zeros).
      align_corners: torch convention selector.
    Returns:
      [..., C] sampled values.

    TPU note: prefer `grid_sample_xy` on hot paths — a materialized
    [..., 2]-minor grid tensor is padded 64x by TPU (8,128) tiling (minor
    dim 2 -> 128 lanes), which dominates the warp cost at MVS sizes.  This
    wrapper unstacks immediately, so only the caller-materialized grid
    argument pays the padding.
    """
    gx, gy = grid[..., 0], grid[..., 1]
    return grid_sample_xy(img, gx, gy, align_corners)


def grid_sample_xy(img: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray,
                   align_corners: bool = True) -> jnp.ndarray:
    """`grid_sample` with the (x, y) coordinate planes as separate arrays.

    Identical math; keeping x and y separate avoids any [..., 2]-minor
    tensor (64x TPU lane padding — see `grid_sample`).

    TPU note: gather cost on TPU is per-INDEX (~independent of the row
    width), so the four bilinear corners are fetched with ONE gather of a
    pre-shifted channel-concatenated image ([H, W, 4C] built with two rolls)
    instead of four separate gathers — measured ~4x faster than the naive
    form at MVS cost-volume sizes.
    """
    h, w, c = img.shape
    x, y = unnormalize_coords_xy(gx, gy, h, w, align_corners)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = x - x0f
    wy1 = y - y0f
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    # 2-pixel zero ring: every out-of-bounds corner (top-left AND its +1
    # neighbours) reads an exact zero, so no per-corner validity masks are
    # needed — far-out coords clip onto the ring, and the roll wrap-arounds
    # also land on ring zeros.
    padded = jnp.pad(img, ((2, 2), (2, 2), (0, 0)))
    ph, pw = h + 4, w + 4
    # the float clip bounds finite coords; the integer clamp additionally
    # bounds NaN/Inf inputs (astype(int32) of a NaN is backend-defined), so
    # the promised-in-bounds gather below can never read out of bounds —
    # NaN coords still yield NaN output through the weights
    iy = jnp.clip((jnp.clip(y0f, -2, h + 1) + 2).astype(jnp.int32),
                  0, h + 3)
    ix = jnp.clip((jnp.clip(x0f, -2, w + 1) + 2).astype(jnp.int32),
                  0, w + 3)
    img_r = jnp.roll(padded, -1, axis=1)
    img_d = jnp.roll(padded, -1, axis=0)
    img_dr = jnp.roll(img_d, -1, axis=1)
    cat = jnp.concatenate([padded, img_r, img_d, img_dr], axis=-1)
    flat = cat.reshape(ph * pw, 4 * c)
    idx = iy * pw + ix
    # indices are in-bounds by construction (clipped onto the zero ring);
    # jnp.take's default "fill" mode would add a [N, 4C] mask broadcast +
    # select around the gather (~2.5x the gather's own traffic on TPU)
    g = flat.at[idx.reshape(-1)].get(
        mode="promise_in_bounds").reshape(idx.shape + (4 * c,))

    # weights are computed in grid precision (f32) but cast to the image
    # dtype for the combine: for bf16 features this keeps the whole combine
    # and its output in bf16 — an f32 combine doubles the bytes AND pads the
    # C-minor output 4x in HBM (T(8,128) tiling), measured ~2x slower at MVS
    # cost-volume sizes; weight rounding (~2^-8 px) is far below feature noise
    dtype = img.dtype
    w00 = (wy0 * wx0).astype(dtype)[..., None]
    w01 = (wy0 * wx1).astype(dtype)[..., None]
    w10 = (wy1 * wx0).astype(dtype)[..., None]
    w11 = (wy1 * wx1).astype(dtype)[..., None]
    return (g[..., 0:c] * w00 + g[..., c:2 * c] * w01
            + g[..., 2 * c:3 * c] * w10 + g[..., 3 * c:] * w11)


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

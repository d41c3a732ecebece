"""Pallas TPU kernel: fused plane-sweep bilinear warp.

Why: XLA lowers bilinear warping to an element gather whose cost is
per-index (~9-10 ns on v5e) — at cost-volume sizes (D x H x W indices per
source view) that is ~35 ms per source view. This kernel restructures the
sampling around the hardware:

  * per (depth, output-row-block) the needed source rows span a small
    K-row window; the window rows stream in as pipelined BlockSpec fetches
    whose index comes from a scalar-prefetched row table (row-contiguous
    traffic instead of per-pixel gathers)
  * bilinear sampling becomes one MXU matmul per window row:
    out[RB*W, C] += M_k^T @ row_k[W+2, C], where M_k holds the bilinear
    weights of the corners falling in window row k (built in-kernel from an
    iota compare against the flattened corner index; at most 4 nonzeros per
    output pixel across all k), with the output block resident across the
    K inner grid steps (standard Pallas reduction)

The matmuls run in bf16 with f32 accumulation (~1e-3 relative sampling
error — far below MVS feature noise); `plane_sweep_warp` remains the exact
gather fallback.

Measured (v5e, D=192 H=128 W=160 C=32): kernel 41 ms (K=12) vs gather 35 ms
— at C=32 the 128-lane channel padding wastes 4x of the MXU, so the gather
path stays the default; the kernel wins when C is a multiple of 128 (the
padding waste vanishes while the gather's per-index cost is
channel-independent).

Correctness domain: the y-span of each (depth, RB-row block) must fit the
K-row window, so K >= RB + (warp y-variation) + 2; out-of-window pixels
come out zero (out-of-frustum semantics). For MVS rigs (rectified DTU,
selected YFCC/MegaDepth pairs) K = 2*RB covers substantial in-plane tilt.
Verified against the gather path in tests/test_pallas_sweep.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sweep_kernel(ybase_ref,                  # scalar prefetch [D*HB] int32
                  base_ref,                   # [1, 1, RBW] int32
                  w00_ref, w01_ref,           # [1, 1, RBW] f32
                  w10_ref, w11_ref,
                  row_ref,                    # [1, Wp, Cp] window row k
                  out_ref,                    # [1, RBW, Cp] resident block
                  *, K: int, RBW: int, Wp: int):
    k = pl.program_id(2)
    base = base_ref[0]                        # [1, RBW]
    w00 = w00_ref[0]
    w01 = w01_ref[0]
    w10 = w10_ref[0]
    w11 = w11_ref[0]
    # transposed weight matrix: rows index source columns of window row k,
    # columns index output pixels — [1, RBW] operands broadcast directly
    rows = jax.lax.broadcasted_iota(jnp.int32, (Wp, RBW), 0)
    off = k * Wp
    # factor the y-weight: corners in window row k are (base - off) with
    # weight w00/w01 (iy == k) and (base + Wp - off) with w10/w11
    # (iy == k-1) — two compare planes instead of four
    m_t = (jnp.where(rows == base - off, w00, 0.0)
           + jnp.where(rows == base + 1 - off, w01, 0.0))
    m_t = m_t + (jnp.where(rows == base + Wp - off, w10, 0.0)
                 + jnp.where(rows == base + Wp + 1 - off, w11, 0.0))
    part = jax.lax.dot_general(
        m_t.astype(jnp.bfloat16), row_ref[0].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == 0)
    def _():
        out_ref[0] = part.astype(out_ref.dtype)

    @pl.when(k > 0)
    def _():
        out_ref[0] = out_ref[0] + part.astype(out_ref.dtype)


def pallas_sweep_warp(src: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                      K: int = 16, RB: int = 8) -> jnp.ndarray:
    """Warp `src` at continuous pixel coords (xs, ys) — fused Pallas kernel.

    Args:
      src: [H, W, C] source features.
      xs, ys: [D, HO, W] continuous source-pixel coords (original units;
        align_corners semantics — integer coord == pixel center). Values
        outside the image (or outside a block's K-row window) sample zero.
      K: source-row window height per (depth, row-block); must cover
        RB + the warp's y-variation + 2.
      RB: output rows per block (HO must be divisible by RB).
    Returns:
      [D, HO, W, C] warped features.
    """
    H, W, C = src.shape
    D, HO, WO = xs.shape
    assert WO == W, (WO, W)
    assert HO % RB == 0, (HO, RB)
    assert K >= RB + 2, (K, RB)
    HB = HO // RB
    RBW = RB * W
    Wp = W + 2
    # channel dim padded to the 128-lane tile (also fills the MXU N dim)
    Cp = ((C + 127) // 128) * 128

    # pad: 1 zero row/col in front, K zero rows + 1 zero col behind
    src_p = jnp.pad(src, ((1, K), (1, 1), (0, Cp - C)))
    Hp = H + 1 + K

    # shifted coords: valid top-left corners lie in [0, H] x [0, W]
    xs_s = xs + 1.0
    ys_s = ys + 1.0
    x0f = jnp.floor(xs_s)
    y0f = jnp.floor(ys_s)
    fx = xs_s - x0f
    fy = ys_s - y0f

    y_min = jnp.min(y0f.reshape(D, HB, RB, W), axis=(2, 3))
    ybase = jnp.clip(y_min, 0, Hp - K).astype(jnp.int32)     # [D, HB]

    iy = y0f.astype(jnp.int32) - jnp.repeat(ybase, RB, axis=1)[..., None]
    valid = ((x0f >= 0.0) & (x0f <= float(W))
             & (y0f >= 0.0) & (y0f <= float(H))
             & (iy >= 0) & (iy <= K - 2)).astype(xs.dtype)
    ix = jnp.clip(x0f, 0.0, float(W)).astype(jnp.int32)
    iyc = jnp.clip(iy, 0, K - 2)

    base = (iyc * Wp + ix).reshape(D * HB, 1, RBW)
    w00 = ((1 - fy) * (1 - fx) * valid).reshape(D * HB, 1, RBW)
    w01 = ((1 - fy) * fx * valid).reshape(D * HB, 1, RBW)
    w10 = (fy * (1 - fx) * valid).reshape(D * HB, 1, RBW)
    w11 = (fy * fx * valid).reshape(D * HB, 1, RBW)

    def block_map(d, hb, k, yb, HB=HB):
        return (d * HB + hb, 0, 0)

    def row_map(d, hb, k, yb, HB=HB):
        return (yb[d * HB + hb] + k, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(D, HB, K),
        in_specs=[
            pl.BlockSpec((1, 1, RBW), block_map),
            pl.BlockSpec((1, 1, RBW), block_map),
            pl.BlockSpec((1, 1, RBW), block_map),
            pl.BlockSpec((1, 1, RBW), block_map),
            pl.BlockSpec((1, 1, RBW), block_map),
            pl.BlockSpec((1, Wp, Cp), row_map),
        ],
        out_specs=pl.BlockSpec((1, RBW, Cp), block_map),
    )

    kernel = functools.partial(_sweep_kernel, K=K, RBW=RBW, Wp=Wp)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D * HB, RBW, Cp), src.dtype),
    )(ybase.reshape(-1), base, w00, w01, w10, w11, src_p)
    return out.reshape(D, HO, W, Cp)[..., :C]


def sweep_coords_from_projs(src_proj: jnp.ndarray, ref_proj: jnp.ndarray,
                            depth_values: jnp.ndarray,
                            ref_hw: tuple[int, int]):
    """MVSNet-convention continuous source coords for the Pallas kernel.

    Mirrors ops.plane_sweep.sweep_grid (models/MVSNet/module.py:127-155) but
    stays in pixel units and applies the behind-camera -> far-away rule.
    Single-batch: projs [4, 4]; depth_values [D] or [D, H, W].
    Returns (xs, ys) of [D, H, W].
    """
    from ..geometry.projective import pixel_grid
    rh, rw = ref_hw
    proj = src_proj @ jnp.linalg.inv(ref_proj)
    rot, trans = proj[:3, :3], proj[:3, 3]
    grid = pixel_grid(rh, rw, depth_values.dtype)
    xyz = jnp.concatenate([grid, jnp.ones_like(grid[..., :1])], -1)
    rot_xyz = jnp.einsum("ij,hwj->hwi", rot, xyz)
    if depth_values.ndim == 1:
        depth = depth_values[:, None, None]
    else:
        depth = depth_values
    p = rot_xyz[None] * depth[..., None] + trans
    z = p[..., 2]
    xy = p[..., :2] / z[..., None]
    xy = jnp.where((z <= 0)[..., None], -10.0, xy)
    return xy[..., 0], xy[..., 1]


def pallas_plane_sweep_warp(src_fea: jnp.ndarray, src_proj: jnp.ndarray,
                            ref_proj: jnp.ndarray, depth_values: jnp.ndarray,
                            ref_hw: tuple[int, int] | None = None,
                            K: int = 16, RB: int = 8) -> jnp.ndarray:
    """Drop-in (batched) counterpart of ops.plane_sweep.plane_sweep_warp
    using the fused kernel. src_fea [B, h, w, C] -> [B, D, H, W, C]."""
    if ref_hw is None:
        ref_hw = src_fea.shape[1:3]

    def one(src, sp, rp, dv):
        xs, ys = sweep_coords_from_projs(sp, rp, dv, ref_hw)
        return pallas_sweep_warp(src, xs, ys, K=K, RB=RB)

    return jax.vmap(one)(src_fea, src_proj, ref_proj, depth_values)

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

Measured (v5e, D=192 H=128 W=160 C=32, RTT-corrected): gather 34.3 ms,
`_sweep_kernel` 55.9 ms (K=16; 41 ms at K=12), `_sweep4_kernel` selection
variant 69.2 ms. The selection variant (preshifted 4C=128-channel corner
table, single compare per window row, bilinear combine outside) was built
on the hypothesis that the weight-matrix build (VPU) dominated — it does
not: per-grid-step overhead plus the MXU select-matmul itself bound both
kernels, and the outside combine adds a ~1.3 GB HBM pass (~15-25 ms). The
XLA gather's ~9 ns/index is therefore the fastest exact path at C=32 and
stays the default everywhere (`MVSNet.sweep_method="auto"`); the kernels
win only when C is a multiple of 128, where the gather's
channel-independent per-index cost loses to full-lane matmuls.

Correctness domain: the y-span of each (depth, RB-row block) must fit the
K-row window, so K >= RB + (warp y-variation) + 2; out-of-window pixels
come out zero (out-of-frustum semantics). For MVS rigs (rectified DTU,
selected YFCC/MegaDepth pairs) K = 2*RB covers substantial in-plane tilt.
Verified against the gather path in tests/test_pallas_sweep.py.

ROUND-2 NOTE: this module records the round-1 kernel study; its conclusion
("the gather is the fastest exact path") is superseded by
ops/mosaic_sweep.py — Mosaic's per-lane dynamic gather (take_along_axis on
the minor axis) implements exactly the in-register selection these MXU
formulations lacked, at 6.7 ms/view vs the 34 ms gather. These kernels are
kept as the measured baseline the study compares against.
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


def _sweep4_kernel(ybase_ref,                 # scalar prefetch [D*HB] int32
                   base_ref,                  # [1, 1, RBW] int32
                   row_ref,                   # [1, Wp, G] window row k (bf16)
                   out_ref,                   # [1, RBW, G] resident block
                   *, K: int, RBW: int, Wp: int):
    k = pl.program_id(2)
    base = base_ref[0]                        # [1, RBW]
    # pure selection: output p takes window position base[p] - k*Wp if that
    # falls inside row k (exactly one (k, q) hit per output). All four
    # bilinear corners live in the channel groups of the preshifted table,
    # so one compare plane replaces the four weight planes of _sweep_kernel
    # — the kernel is VPU-bound on this [Wp, RBW] build, ~4x less work.
    rows = jax.lax.broadcasted_iota(jnp.int32, (Wp, RBW), 0)
    m_t = (rows == base - k * Wp).astype(jnp.bfloat16)
    part = jax.lax.dot_general(
        m_t, row_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == 0)
    def _():
        out_ref[0] = part.astype(out_ref.dtype)

    @pl.when(k > 0)
    def _():
        out_ref[0] = out_ref[0] + part.astype(out_ref.dtype)


def pallas_sweep_warp4(src: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                       K: int = 16, RB: int = 8) -> jnp.ndarray:
    """Fast variant of `pallas_sweep_warp`: 4-corner preshifted table.

    The source is expanded to 4C channels (the 2x2 bilinear corner
    neighborhood concatenated channel-wise), so for C=32 the MXU N dim is
    exactly one 128-lane tile — no padding waste — and the in-kernel weight
    matrix degenerates to a single selection compare. Each output's corner
    group lands in exactly one window step, so bf16 accumulation is exact;
    the bilinear combine happens here in XLA (it fuses into the consumer).

    Same correctness domain as `pallas_sweep_warp` (K-row window); use
    `sweep_window_span` + a cond fallback for arbitrary geometry.
    """
    H, W, C = src.shape
    D, HO, WO = xs.shape
    assert WO == W, (WO, W)
    assert HO % RB == 0, (HO, RB)
    assert K >= RB + 2, (K, RB)
    xs = xs.astype(jnp.float32)               # sub-pixel coords need f32
    ys = ys.astype(jnp.float32)
    HB = HO // RB
    RBW = RB * W
    Wp = W + 1                                # top-left corners: x0 in [0, W]
    G = ((4 * C + 127) // 128) * 128

    # preshifted corner table: row r holds src_p rows (r, r+1) x cols (x, x+1)
    src_p = jnp.pad(src, ((1, K + 1), (1, 1), (0, 0)))
    src4 = jnp.concatenate(
        [src_p[:-1, :-1], src_p[:-1, 1:], src_p[1:, :-1], src_p[1:, 1:]], -1)
    src4 = jnp.pad(src4.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, G - 4 * C)))
    Ht = src4.shape[0]                        # H + K + 1

    xs_s = xs + 1.0
    ys_s = ys + 1.0
    x0f = jnp.floor(xs_s)
    y0f = jnp.floor(ys_s)
    fx = (xs_s - x0f).astype(jnp.float32)
    fy = (ys_s - y0f).astype(jnp.float32)

    # window placement ignores invalid (zero-weight) pixels: clamp their y
    # into the image so an out-of-frustum outlier can't evict valid
    # neighbors from the K-row window
    y0c = jnp.clip(y0f, 0.0, float(H))
    y_min = jnp.min(y0c.reshape(D, HB, RB, W), axis=(2, 3))
    ybase = jnp.clip(y_min, 0, Ht - K).astype(jnp.int32)     # [D, HB]

    iy = y0c.astype(jnp.int32) - jnp.repeat(ybase, RB, axis=1)[..., None]
    valid = ((x0f >= 0.0) & (x0f <= float(W))
             & (y0f >= 0.0) & (y0f <= float(H))
             & (iy >= 0) & (iy <= K - 1)).astype(jnp.float32)
    ix = jnp.clip(x0f, 0.0, float(W)).astype(jnp.int32)
    iyc = jnp.clip(iy, 0, K - 1)

    base = (iyc * Wp + ix).reshape(D * HB, 1, RBW)

    def block_map(d, hb, k, yb, HB=HB):
        return (d * HB + hb, 0, 0)

    def row_map(d, hb, k, yb, HB=HB):
        return (yb[d * HB + hb] + k, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(D, HB, K),
        in_specs=[
            pl.BlockSpec((1, 1, RBW), block_map),
            pl.BlockSpec((1, Wp, G), row_map),
        ],
        out_specs=pl.BlockSpec((1, RBW, G), block_map),
    )

    kernel = functools.partial(_sweep4_kernel, K=K, RBW=RBW, Wp=Wp)
    acc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D * HB, RBW, G), jnp.bfloat16),
    )(ybase.reshape(-1), base, src4)
    acc = acc.reshape(D, HO, W, G)[..., :4 * C].reshape(D, HO, W, 4, C)
    acc = acc.astype(jnp.float32)

    w00 = ((1 - fy) * (1 - fx) * valid)[..., None]
    w01 = ((1 - fy) * fx * valid)[..., None]
    w10 = (fy * (1 - fx) * valid)[..., None]
    w11 = (fy * fx * valid)[..., None]
    out = (w00 * acc[..., 0, :] + w01 * acc[..., 1, :]
           + w10 * acc[..., 2, :] + w11 * acc[..., 3, :])
    return out.astype(src.dtype)


def sweep_window_span(ys: jnp.ndarray, h: int, RB: int) -> jnp.ndarray:
    """Max (clamped) top-left-corner row span of any (depth, RB-row block):
    `pallas_sweep_warp4` is exact iff span <= K - 1 (`pallas_sweep_warp`:
    span <= K - 2). Returns a scalar int32."""
    D, HO, W = ys.shape
    y0 = jnp.floor(jnp.clip(ys + 1.0, 0.0, float(h)))
    y0 = y0.reshape(D, HO // RB, RB, W)
    return (jnp.max(y0, axis=(2, 3)) - jnp.min(y0, axis=(2, 3))).max() \
        .astype(jnp.int32)


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
                            K: int = 16, RB: int = 8,
                            variant: str = "select4") -> jnp.ndarray:
    """Drop-in (batched) counterpart of ops.plane_sweep.plane_sweep_warp
    using the fused kernel. src_fea [B, h, w, C] -> [B, D, H, W, C]."""
    if ref_hw is None:
        ref_hw = src_fea.shape[1:3]
    fn = pallas_sweep_warp4 if variant == "select4" else pallas_sweep_warp

    def one(src, sp, rp, dv):
        xs, ys = sweep_coords_from_projs(sp, rp, dv, ref_hw)
        return fn(src, xs, ys, K=K, RB=RB)

    return jax.vmap(one)(src_fea, src_proj, ref_proj, depth_values)


def plane_sweep_warp_fast(src_fea: jnp.ndarray, src_proj: jnp.ndarray,
                          ref_proj: jnp.ndarray, depth_values: jnp.ndarray,
                          ref_hw: tuple[int, int] | None = None,
                          K: int = 16, RB: int = 8) -> jnp.ndarray:
    """`plane_sweep_warp` with the fused Pallas path when it is exact.

    Per batch element, a runtime `lax.cond` dispatches to the Pallas
    selection kernel when every (depth, row-block)'s source-row span fits
    the K-row window, and to the exact XLA gather otherwise — identical
    results up to bf16 feature rounding, so model semantics never depend on
    scene geometry. Requires H % RB == 0 (falls back to gather otherwise).
    """
    from .plane_sweep import plane_sweep_warp
    if ref_hw is None:
        ref_hw = src_fea.shape[1:3]
    H, _ = ref_hw
    if H % RB != 0:
        return plane_sweep_warp(src_fea, src_proj, ref_proj, depth_values,
                                ref_hw)
    h = src_fea.shape[1]
    outs = []
    for b in range(src_fea.shape[0]):
        src, sp, rp, dv = (src_fea[b], src_proj[b], ref_proj[b],
                           depth_values[b])
        xs, ys = sweep_coords_from_projs(sp, rp, dv, ref_hw)
        span = sweep_window_span(ys, h, RB)
        outs.append(jax.lax.cond(
            span <= K - 1,
            lambda: pallas_sweep_warp4(src, xs, ys, K=K, RB=RB),
            lambda: plane_sweep_warp(src[None], sp[None], rp[None], dv[None],
                                     ref_hw)[0]))
    return jnp.stack(outs)

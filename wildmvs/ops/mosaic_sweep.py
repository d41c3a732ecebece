"""Mosaic (Pallas TPU) fused plane-sweep warp — the round-2 warp kernel.

Breaks the XLA gather floor (~9 ns/index, ~34 ms/view at the headline
cost-volume size) that bounded every model's forward in round 1: measured
6.7 ms/view at KY=2 (10.9 at KY=4) for D=192 H=128 W=160 C=32 on v5e, exact
to bf16 rounding vs the gather path (see tools/proto_sweep_kernel*.py and
BASELINE.md "warp-study round 4").

How it works (per source view):
  * XLA builds a 4C corner table: rows (y, y+1) x cols (x, x+1) of the
    1-zero-ring-padded source, channel-concatenated, so ONE table element
    holds all four bilinear corners of a sample. bf16 channel pairs are
    packed into int32 sublanes (Mosaic's dynamic gather handles f32/int32
    only): table [Ht=H+2, 2C, Wpad].
  * The whole table sits resident in VMEM. Per grid step (depth plane d,
    8-row block), the projection runs in-kernel on full [8, Wpad] vregs
    (coords are affine-in-depth per pixel: rot_xyz * d + trans — parity
    with models/MVSNet/module.py:127-155 math, pixel units).
  * Per (row, 128-px chunk): the x-selection is ONE per-lane dynamic
    gather per 128-lane table tile (jnp.take_along_axis along the minor
    axis -> Mosaic DynamicGatherOp) + a where-select across tiles — no
    x-span restriction at all. The y-selection indexes the KY candidate
    table rows (dynamic major index, scalar-prefetched per-row ybase) and
    where-selects per pixel.
  * Bilinear combine happens in-register; output layout is [D, H, C, W]
    (pixels in lanes — a [.., W, C]-minor volume would pad its 32-channel
    minor 4x under TPU (8,128)/(16,128) tiling).

Exactness domain: per (depth, output row, 128-px chunk), the VALID pixels'
source-row span must fit the KY-row window. `sweep_spans` checks it in XLA;
`cost_volume_mosaic` hoists ONE lax.cond around the whole aggregation
(KY=2 -> KY=4 -> exact gather), so model semantics never depend on scene
geometry (up to bf16 rounding on the kernel path).

Semantics parity: models/MVSNet/module.py:111-169 (`homo_warping`) —
border-zero bilinear, align_corners=True, behind-camera -> far away.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
RB = 8               # output rows per grid step
TABLE_VMEM_LIMIT = 11 * 2 ** 20   # resident-table budget (bytes)


# ---------------------------------------------------------------------------
# table + plan construction (XLA side)
# ---------------------------------------------------------------------------

def build_corner_table(src: jnp.ndarray) -> jnp.ndarray:
    """bf16 [H, W, C] -> packed int32 [H+2, 2C, Wpad] corner table.

    Table element (y, :, x) holds the four bilinear corners of padded
    coordinate (y, x) — source pixels (y-1..y, x-1..x) — as 4C bf16
    channels packed pairwise into 2C int32 sublanes. pltpu.bitcast maps
    int32 sublane s back to bf16 sublanes (2s, 2s+1) = (low, high) halves
    (probed on v5e, tools/probe_mosaic2.py).
    """
    h, w, c = src.shape
    p = jnp.pad(src.astype(jnp.bfloat16), ((1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], -1)
    quad = jnp.pad(quad, ((0, 1), (0, 1), (0, 0)))        # [h+2, w+2, 4C]
    ht, wt = h + 2, w + 2
    wpad = ((wt + LANES - 1) // LANES) * LANES
    quad = jnp.pad(quad, ((0, 0), (0, wpad - wt), (0, 0)))
    quad = jnp.transpose(quad, (0, 2, 1))                 # [Ht, 4C, Wpad]
    u16 = jax.lax.bitcast_convert_type(quad, jnp.uint16).astype(jnp.uint32)
    packed = u16[:, 0::2] | (u16[:, 1::2] << 16)
    return jax.lax.bitcast_convert_type(packed, jnp.int32)


def table_bytes(src_hw: tuple[int, int], c: int) -> int:
    """VMEM bytes of the resident corner table for an [h, w, c] source."""
    h, w = src_hw
    wpad = ((w + 2 + LANES - 1) // LANES) * LANES
    return (h + 2) * 2 * c * wpad * 4


def rot_planes(src_proj: jnp.ndarray, ref_proj: jnp.ndarray,
               ref_hw: tuple[int, int]):
    """Per-pixel projection planes: coords = (rot_xyz * d + trans) / z.

    Single view: projs [4, 4]. Returns (rot_xyz [3, H, W] f32, trans [3]).
    Same coordinate decomposition as the reference warp (module.py:127-155).
    """
    from ..geometry.projective import pixel_grid
    rh, rw = ref_hw
    proj = (src_proj @ jnp.linalg.inv(ref_proj)).astype(jnp.float32)
    rot, trans = proj[:3, :3], proj[:3, 3]
    grid = pixel_grid(rh, rw, jnp.float32)
    xyz = jnp.concatenate([grid, jnp.ones_like(grid[..., :1])], -1)
    return jnp.einsum("ij,hwj->ihw", rot, xyz), trans


def sweep_spans(rot_xyz: jnp.ndarray, trans: jnp.ndarray,
                depths: jnp.ndarray, src_hw: tuple[int, int]):
    """Per-(depth, row, chunk) window bases + the max row span.

    Returns (ybase [D, H, XC] int32 — UNclipped valid-masked min of the
    padded corner row, 0 where no pixel is valid — and span, the int32
    scalar max over chunks of (max - min) valid corner row; the KY-row
    kernel is exact iff span <= KY - 1).
    """
    h, w = src_hw
    d = depths.shape[0]
    _, rh, rw = rot_xyz.shape
    xc = (rw + LANES - 1) // LANES
    wp = xc * LANES

    rp = jnp.pad(rot_xyz, ((0, 0), (0, 0), (0, wp - rw)),
                 constant_values=-1e9)
    dv = depths.reshape(d, 1, 1).astype(jnp.float32)
    rz = rp[2] * dv + trans[2]
    zs = jnp.where(rz > 0, rz, 1.0)
    ys = jnp.where(rz > 0, (rp[1] * dv + trans[1]) / zs, -10.0)
    xs = jnp.where(rz > 0, (rp[0] * dv + trans[0]) / zs, -10.0)
    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    valid = ((x0f >= -1.0) & (x0f <= float(w) - 1.0)
             & (y0f >= -1.0) & (y0f <= float(h) - 1.0))
    iy = jnp.clip(y0f + 1.0, 0.0, float(h + 1))
    iyc = iy.reshape(d, rh, xc, LANES)
    vc = valid.reshape(d, rh, xc, LANES)
    big = jnp.float32(1e9)
    ymin = jnp.min(jnp.where(vc, iyc, big), -1)
    ymax = jnp.max(jnp.where(vc, iyc, -big), -1)
    span = jnp.maximum(ymax - ymin, 0.0).max().astype(jnp.int32)
    ybase = jnp.where(ymin > big / 2, 0.0, ymin)
    return ybase.astype(jnp.int32), span


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _kernel(ybase_ref, depth_ref, trans_ref, rotx_ref, roty_ref, rotz_ref,
            table_ref, out_ref, ix_s, iy_s, w00_s, w01_s, w10_s, w11_s,
            *, C, H, W, Wt, Ht, KY, XC, DP):
    d_i = pl.program_id(0)
    yy = pl.program_id(1)
    C2 = C * 2
    nyy = pl.num_programs(1)

    for dp in range(DP):
        d = depth_ref[d_i * DP + dp]

        rx = rotx_ref[:] * d + trans_ref[0]
        ry = roty_ref[:] * d + trans_ref[1]
        rz = rotz_ref[:] * d + trans_ref[2]
        xs = jnp.where(rz > 0, rx / rz, -10.0)
        ys = jnp.where(rz > 0, ry / rz, -10.0)
        x0f = jnp.floor(xs)
        y0f = jnp.floor(ys)
        fxb = xs - x0f
        fyb = ys - y0f
        validb = ((x0f >= -1.0) & (x0f <= float(W) - 1.0)
                  & (y0f >= -1.0) & (y0f <= float(H) - 1.0))
        ix_s[:] = jnp.clip(x0f + 1.0, 0.0, float(W + 1)).astype(jnp.int32)
        iy_s[:] = jnp.clip(y0f + 1.0, 0.0, float(H + 1)).astype(jnp.int32)
        vb = validb.astype(jnp.float32)
        w00_s[:] = ((1.0 - fyb) * (1.0 - fxb) * vb).astype(jnp.bfloat16)
        w01_s[:] = ((1.0 - fyb) * fxb * vb).astype(jnp.bfloat16)
        w10_s[:] = (fyb * (1.0 - fxb) * vb).astype(jnp.bfloat16)
        w11_s[:] = (fyb * fxb * vb).astype(jnp.bfloat16)

        for r in range(RB):
            for xc in range(XC):
                ls = pl.ds(xc * LANES, LANES)
                ix = ix_s[r, ls]
                iy = iy_s[r, ls]
                ybase = ybase_ref[((d_i * DP + dp) * nyy * RB
                                   + yy * RB + r) * XC + xc]
                iyl = jnp.clip(iy - ybase, 0, KY - 1)
                inwin = (iy - ybase) == iyl
                idx = jnp.broadcast_to(ix[None], (C2, LANES))
                sel = None
                for k in range(KY):
                    row = table_ref[ybase + k]
                    g = None
                    for t in range(Wt):
                        tile = row[:, t * LANES:(t + 1) * LANES]
                        loc = jnp.clip(idx - t * LANES, 0, LANES - 1)
                        gt = jnp.take_along_axis(tile, loc, axis=1)
                        if g is None:
                            g = gt
                        else:
                            use = ((idx >= t * LANES)
                                   & (idx < (t + 1) * LANES))
                            g = jnp.where(use, gt, g)
                    ok = jnp.broadcast_to((iyl == k)[None], (C2, LANES))
                    sel = g if sel is None else jnp.where(ok, g, sel)
                quad = pltpu.bitcast(sel, jnp.bfloat16)    # [4C, 128]
                mask = inwin.astype(jnp.bfloat16)[None]
                out = (quad[0 * C:1 * C] * w00_s[r, ls][None]
                       + quad[1 * C:2 * C] * w01_s[r, ls][None]
                       + quad[2 * C:3 * C] * w10_s[r, ls][None]
                       + quad[3 * C:4 * C] * w11_s[r, ls][None]) * mask
                out_ref[dp, r, :, ls] = out


def mosaic_sweep_warp(src: jnp.ndarray, rot_xyz: jnp.ndarray,
                      trans: jnp.ndarray, depths: jnp.ndarray,
                      ybase: jnp.ndarray, KY: int = 2,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused warp of one source view over a fronto-parallel sweep.

    Args:
      src: [h, w, C] bf16 source features.
      rot_xyz: [3, H, W] f32 projection planes (`rot_planes`).
      trans: [3] translation (static-ized via float()).
      depths: [D] f32 hypothesis depths.
      ybase: [D, H, XC] int32 window bases (`sweep_spans`, clipped here).
      KY: candidate-row window height; exact iff span <= KY - 1.
    Returns:
      [D, H, C, W] bf16 warped volume (pixels in lanes).
    """
    h, w, C = src.shape
    D = depths.shape[0]
    _, H, W = rot_xyz.shape
    XC = (W + LANES - 1) // LANES
    Wp = XC * LANES
    assert H % RB == 0, (H, RB)
    table = build_corner_table(src)
    Ht, C2, Wpad = table.shape
    Wt = Wpad // LANES
    rp = jnp.pad(rot_xyz, ((0, 0), (0, 0), (0, Wp - W)),
                 constant_values=-1e9)
    yb = jnp.clip(ybase, 0, Ht - KY).reshape(-1)

    # depth-pairing: several planes per grid step amortize the per-step
    # pipeline overhead and reuse the row-block fetches (~5% measured)
    DP = 4 if D % 4 == 0 else (2 if D % 2 == 0 else 1)
    kern = functools.partial(
        _kernel, C=C, H=h, W=w, Wt=Wt, Ht=Ht, KY=KY, XC=XC, DP=DP)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(D // DP, H // RB),
        in_specs=[
            pl.BlockSpec((RB, Wp), lambda di, yy, *pf: (yy, 0)),
            pl.BlockSpec((RB, Wp), lambda di, yy, *pf: (yy, 0)),
            pl.BlockSpec((RB, Wp), lambda di, yy, *pf: (yy, 0)),
            pl.BlockSpec((Ht, C2, Wpad), lambda di, yy, *pf: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((DP, RB, C, Wp),
                               lambda di, yy, *pf: (di, yy, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((RB, Wp), jnp.int32),
            pltpu.VMEM((RB, Wp), jnp.int32),
            pltpu.VMEM((RB, Wp), jnp.bfloat16),
            pltpu.VMEM((RB, Wp), jnp.bfloat16),
            pltpu.VMEM((RB, Wp), jnp.bfloat16),
            pltpu.VMEM((RB, Wp), jnp.bfloat16),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, H, C, Wp), jnp.bfloat16),
        interpret=interpret,
    )(yb, depths.astype(jnp.float32), trans.astype(jnp.float32),
      rp[0], rp[1], rp[2], table)
    return out[..., :W]


# ---------------------------------------------------------------------------
# v2: per-pixel hypothesis maps + tile-major table + streamed row window.
#
# CVP-MVSNet's refinement levels warp with [D, H, W] per-pixel depth maps at
# image sizes whose corner table exceeds VMEM (512x640 C16 -> 50 MB). Two
# changes make the kernel cover them:
#   * table laid out TILE-MAJOR [Wt, Ht, C2, 128]: the x-tile pair a chunk
#     needs becomes a dynamic major index (2 gathers per candidate row
#     regardless of image width, vs Wt gathers in the v1 layout)
#   * the table lives in HBM; per output row-block, the row slab all its
#     depth planes need is DMA'd into a VMEM window (grid (HB, D), d minor,
#     so the DMA amortizes over the D planes)
# Exactness domain (checked in XLA, lax.cond fallback): per-chunk x-span
# <= 128 (2-tile window), per-chunk y-span <= KY-1, per-row-block window
# rows <= KR.
# ---------------------------------------------------------------------------

def build_corner_table_tiled(src: jnp.ndarray) -> jnp.ndarray:
    """Tile-major packed corner table: [Wt, Ht, 2C, 128] int32."""
    t = build_corner_table(src)                    # [Ht, 2C, Wpad]
    ht, c2, wpad = t.shape
    wt = wpad // LANES
    return jnp.transpose(t.reshape(ht, c2, wt, LANES), (2, 0, 1, 3))


def _kernel_px(wb_ref,
               plan_ref,                        # SMEM [1, RB*XC] i32 packed
               px_ref, py_ref, pz_ref,          # VMEM [RB, Wp] f32
               qx_ref, qy_ref, qz_ref,          # VMEM [RB, Wp] f32
               dmap_ref,                        # VMEM [1, RB, Wp] f32
               table_ref,                       # ANY [Wt, Ht, C2, 128] i32
               out_ref,                         # VMEM [1, RB, C, Wp]
               win_ref, sem,                    # scratch: window + DMA sem
               ix_s, iy_s, w00_s, w01_s, w10_s, w11_s,
               *, C, H, W, PR, Ht, Wt, KY, KR, XC, NT, sx, sy):
    # H, W: SOURCE dims (validity bounds); PR: plan/ref-grid rows. The
    # (ybase, xtb) plan arrives as a BLOCKED SMEM input — one 16/16-packed
    # int32 per (row, x-chunk) of THIS grid step only. A whole-array
    # scalar-prefetch plan is [D, PR, XC] and overflows the 1 MB SMEM at
    # full-res DTU eval (192x296x4 ints = 888 KB per array).
    yy = pl.program_id(0)
    d_i = pl.program_id(1)
    C2 = C * 2
    nd = pl.num_programs(1)

    # ---- window DMA: once per row block (d_i == 0) ----
    wb = wb_ref[yy]

    @pl.when(d_i == 0)
    def _():
        dma = pltpu.make_async_copy(
            table_ref.at[:, pl.ds(wb, KR)], win_ref, sem)
        dma.start()
        dma.wait()

    # ---- vectorized per-pixel plan: coords = (P*s + Q) / (Pz*s + Qz)
    # covers BOTH grid conventions — MVSNet (module.py:127-155): P=rot_xyz,
    # Q=trans planes, s=depth; Vis-MVSNet (homography.py:23-121, the
    # A - B/d decomposition): P=-B planes, Q=A planes, s=1/depth, with the
    # (size-1)/size coordinate scale folding its normalization chain ----
    d = dmap_ref[0]                               # [RB, Wp]
    rx = px_ref[:] * d + qx_ref[:]
    ry = py_ref[:] * d + qy_ref[:]
    rz = pz_ref[:] * d + qz_ref[:]
    xs = jnp.where(rz > 0, rx / rz, -10.0) * sx
    ys = jnp.where(rz > 0, ry / rz, -10.0) * sy
    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    fxb = xs - x0f
    fyb = ys - y0f
    validb = ((x0f >= -1.0) & (x0f <= float(W) - 1.0)
              & (y0f >= -1.0) & (y0f <= float(H) - 1.0))
    ix_s[:] = jnp.clip(x0f + 1.0, 0.0, float(W + 1)).astype(jnp.int32)
    iy_s[:] = jnp.clip(y0f + 1.0, 0.0, float(H + 1)).astype(jnp.int32)
    vb = validb.astype(jnp.float32)
    w00_s[:] = ((1.0 - fyb) * (1.0 - fxb) * vb).astype(jnp.bfloat16)
    w01_s[:] = ((1.0 - fyb) * fxb * vb).astype(jnp.bfloat16)
    w10_s[:] = (fyb * (1.0 - fxb) * vb).astype(jnp.bfloat16)
    w11_s[:] = (fyb * fxb * vb).astype(jnp.bfloat16)

    for r in range(RB):
        for xc in range(XC):
            ls = pl.ds(xc * LANES, LANES)
            ix = ix_s[r, ls]
            iy = iy_s[r, ls]
            packed = plan_ref[0, 0, r * XC + xc]
            ybase = packed & 0xFFFF
            xtb = packed >> 16
            iyl = jnp.clip(iy - ybase, 0, KY - 1)
            inwin = (iy - ybase) == iyl
            idx = jnp.broadcast_to(ix[None], (C2, LANES))
            # window-relative row; clamped so even a fallback-bound trace
            # can never index the window OOB (the cond dispatch only runs
            # this kernel when wspan <= KR - KY, where the clamp is a no-op)
            ywin = jnp.clip(ybase - wb, 0, KR - KY)
            sel = None
            for k in range(KY):
                g = None
                for t in range(NT):
                    tile = win_ref[xtb + t, ywin + k]
                    base = (xtb + t) * LANES
                    loc = jnp.clip(idx - base, 0, LANES - 1)
                    gt = jnp.take_along_axis(tile, loc, axis=1)
                    if g is None:
                        g = gt
                    else:
                        use = (idx >= base) & (idx < base + LANES)
                        g = jnp.where(use, gt, g)
                ok = jnp.broadcast_to((iyl == k)[None], (C2, LANES))
                sel = g if sel is None else jnp.where(ok, g, sel)
            quad = pltpu.bitcast(sel, jnp.bfloat16)
            mask = inwin.astype(jnp.bfloat16)[None]
            out = (quad[0 * C:1 * C] * w00_s[r, ls][None]
                   + quad[1 * C:2 * C] * w01_s[r, ls][None]
                   + quad[2 * C:3 * C] * w10_s[r, ls][None]
                   + quad[3 * C:4 * C] * w11_s[r, ls][None]) * mask
            out_ref[0, r, :, ls] = out


def mvsnet_planes(src_proj: jnp.ndarray, ref_proj: jnp.ndarray,
                  ref_hw: tuple[int, int]):
    """(P, Q, sx, sy) for the MVSNet grid convention: coords =
    (rot_xyz*d + trans)/z in pixel units (s = depth)."""
    rxyz, trans = rot_planes(src_proj, ref_proj, ref_hw)
    q = jnp.broadcast_to(trans.reshape(3, 1, 1).astype(jnp.float32),
                         rxyz.shape)
    return rxyz, q, 1.0, 1.0


def vis_planes(K_ref, R_ref, t_ref, K_src, R_src, t_src,
               ref_hw: tuple[int, int], src_hw: tuple[int, int]):
    """(P, Q, sx, sy) for the Vis-MVSNet homography convention.

    Parity: ops/plane_sweep.homography_sweep_warp (homography.py:23-121):
    pixel-center ref grid (+0.5), warped = A p - (B p)/d, coordinates
    normalized by the SIZE then unnormalized align_corners — a net
    (size-1)/size scale; the reference's [-1.1, 1.1] clamp only parks
    already-invalid coords outside the valid corner range, which the
    kernel's validity mask reproduces (exact zeros). Use s = 1/(d + 1e-9).
    """
    from ..geometry.projective import pixel_grid
    rh, rw = ref_hw
    sh, sw = src_hw
    K_ref_inv = jnp.linalg.inv(K_ref)
    R_ref_T = jnp.swapaxes(R_ref, -1, -2)
    fronto = R_ref[2:3, :]
    c_rel = (-jnp.swapaxes(R_src, -1, -2) @ t_src) - (-R_ref_T @ t_ref)
    M = K_src @ R_src
    A = M @ R_ref_T @ K_ref_inv
    Bm = M @ (c_rel @ fronto) @ R_ref_T @ K_ref_inv
    grid = pixel_grid(rh, rw, jnp.float32, offset=0.5)
    hom = jnp.concatenate([grid, jnp.ones_like(grid[..., :1])], -1)
    Ap = jnp.einsum("ij,hwj->ihw", A.astype(jnp.float32), hom)
    Bp = jnp.einsum("ij,hwj->ihw", Bm.astype(jnp.float32), hom)
    return -Bp, Ap, (sw - 1.0) / sw, (sh - 1.0) / sh


def _pad_ref_rows(P, Q, svals):
    """Pad the reference-grid rows of (P, Q[, svals]) to a multiple of RB.

    Pad rows get Q = -1e9 on all three planes, which forces z < 0 ->
    invalid -> exact zeros from the kernels (the same convention as the
    lane padding); callers slice the kernel output back to the original
    row count. This lets the streamed kernels serve ref grids whose height
    is not a multiple of 8 — Vis-MVSNet stage 1 (1184/8 = 148 rows) and
    the odd CVP pyramid levels (74, 148) at full-res DTU eval."""
    rh = P.shape[1]
    hp = -(-rh // RB) * RB
    if hp == rh:
        return P, Q, svals, hp
    P = jnp.pad(P, ((0, 0), (0, hp - rh), (0, 0)))
    Q = jnp.pad(Q, ((0, 0), (0, hp - rh), (0, 0)), constant_values=-1e9)
    svals = _align_sval_rows(svals, hp)
    return P, Q, svals, hp


def _align_sval_rows(svals, rows):
    """Pad per-pixel svals rows up to `rows` (no-op for [D] svals or when
    already aligned — e.g. when the caller pre-padded P/Q but passes the
    original [D, H, W] hypothesis maps)."""
    if svals is not None and svals.ndim == 3 and svals.shape[1] != rows:
        svals = jnp.pad(svals, ((0, 0), (0, rows - svals.shape[1]), (0, 0)))
    return svals


def sweep_spans_px(P: jnp.ndarray, Q: jnp.ndarray,
                   svals: jnp.ndarray, src_hw: tuple[int, int],
                   sx: float = 1.0, sy: float = 1.0,
                   dc: int | None = None, nt: int = 2):
    """Window plan for the per-pixel kernel (coords = (P*s + Q)/(Pz*s+Qz)).

    svals: [D] or [D, H, W]. Returns dict with ybase/xtb [D, H, XC] i32,
    wb [HB] i32, and the exactness stats (yspan, xover, wspan int32
    scalars): exact iff yspan <= KY-1, xover <= 0 (per-chunk max corner col
    inside its nt-tile window), wspan <= KR - KY.

    nt: x-window width in 128-lane tiles the kernel will use (must match
    the kernel's NT). Realistic DTU eval geometry at 296x400 features
    overflows the default 2-tile window (xover up to ~6 px); nt=3 covers
    it at the cost of one more gather per (KY, chunk).

    dc: depth-chunk size for the fused kernel — the window is then computed
    per (depth chunk, row block) (wb [D//dc, HB], wspan the max over
    chunks), so consecutive planes share one DMA'd slab instead of one
    window having to cover all D planes.
    """
    h, w = src_hw
    d = svals.shape[0]
    # rows pad to the kernel grid's RB granularity (invalid rows, no span
    # impact); the px kernel wrappers apply the identical padding, so the
    # plan's row count always matches the kernel grid
    P, Q, svals, _ = _pad_ref_rows(P, Q, svals)
    _, rh, rw = P.shape
    svals = _align_sval_rows(svals, rh)
    xc = (rw + LANES - 1) // LANES
    wp = xc * LANES

    # pad lanes must come out invalid: z = P*s + Q with huge-negative pads
    # goes negative for either sign of s... s can be tiny (1/d); pad BOTH
    # P and Q so Qz alone forces z < 0
    rp = jnp.pad(P, ((0, 0), (0, 0), (0, wp - rw)), constant_values=0.0)
    qp = jnp.pad(Q, ((0, 0), (0, 0), (0, wp - rw)), constant_values=-1e9)
    if svals.ndim == 1:
        dv = svals.reshape(d, 1, 1).astype(jnp.float32)
    else:
        dv = jnp.pad(svals.astype(jnp.float32),
                     ((0, 0), (0, 0), (0, wp - rw)))
    rz = rp[2] * dv + qp[2]
    zs = jnp.where(rz > 0, rz, 1.0)
    ys = jnp.where(rz > 0, (rp[1] * dv + qp[1]) / zs, -10.0) * sy
    xs = jnp.where(rz > 0, (rp[0] * dv + qp[0]) / zs, -10.0) * sx
    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    valid = ((x0f >= -1.0) & (x0f <= float(w) - 1.0)
             & (y0f >= -1.0) & (y0f <= float(h) - 1.0))
    iy = jnp.clip(y0f + 1.0, 0.0, float(h + 1))
    ix = jnp.clip(x0f + 1.0, 0.0, float(w + 1))
    iyc = iy.reshape(d, rh, xc, LANES)
    ixc = ix.reshape(d, rh, xc, LANES)
    vc = valid.reshape(d, rh, xc, LANES)
    big = jnp.float32(1e9)
    ymin = jnp.min(jnp.where(vc, iyc, big), -1)
    ymax = jnp.max(jnp.where(vc, iyc, -big), -1)
    xmin = jnp.min(jnp.where(vc, ixc, big), -1)
    xmax = jnp.max(jnp.where(vc, ixc, -big), -1)
    yspan = jnp.maximum(ymax - ymin, 0.0).max().astype(jnp.int32)
    ybase = jnp.where(ymin > big / 2, 0.0, ymin).astype(jnp.int32)
    xtb = (jnp.where(xmin > big / 2, 0.0, xmin) // LANES).astype(jnp.int32)
    # exact x condition: every chunk's max corner col must fall inside its
    # nt-tile window [xtb*128, (xtb+nt)*128) — alignment-dependent, NOT a
    # plain span bound (xover <= 0 iff exact; all-invalid chunks pass)
    xhi = jnp.where(xmax < -big / 2, 0.0, xmax)
    xover = (xhi - ((xtb + nt) * LANES - 1).astype(jnp.float32)) \
        .max().astype(jnp.int32)
    # per row-block (and optionally per depth-chunk): window rows needed
    hb = rh // RB
    if dc is None:
        yb_blk = ymin.reshape(d, hb, RB, xc)
        ye_blk = ymax.reshape(d, hb, RB, xc)
        red = (0, 2, 3)
    else:
        assert d % dc == 0, (d, dc)
        yb_blk = ymin.reshape(d // dc, dc, hb, RB, xc)
        ye_blk = ymax.reshape(d // dc, dc, hb, RB, xc)
        red = (1, 3, 4)
    wlo = jnp.min(jnp.where(yb_blk > big / 2, big, yb_blk), red)
    whi = jnp.max(jnp.where(ye_blk < -big / 2, -big, ye_blk), red)
    wspan = jnp.maximum(whi - wlo, 0.0).max().astype(jnp.int32)
    wb = jnp.where(wlo > big / 2, 0.0, wlo).astype(jnp.int32)
    return dict(ybase=ybase, xtb=xtb, wb=wb,   # wb [HB] or [D//dc, HB]
                yspan=yspan, xover=xover, wspan=wspan)


def mosaic_sweep_warp_px(src: jnp.ndarray, P: jnp.ndarray, Q: jnp.ndarray,
                         svals: jnp.ndarray, plan: dict,
                         KY: int = 2, KR: int = 32, NT: int = 2,
                         sx: float = 1.0, sy: float = 1.0,
                         interpret: bool = False) -> jnp.ndarray:
    """Streamed-window warp, coords = (P*s + Q)/(Pz*s + Qz) * (sx, sy).

    svals: [D] or [D, H, W] (MVSNet: depths; Vis: 1/(depth+1e-9)). Exact
    iff plan's yspan <= KY-1, xover <= 0, wspan <= KR-KY (callers dispatch
    on these). Returns [D, H, C, W] bf16.
    """
    h, w, C = src.shape
    D = svals.shape[0]
    H0 = P.shape[1]
    P, Q, svals, H = _pad_ref_rows(P, Q, svals)   # rows to RB granularity
    svals = _align_sval_rows(svals, H)
    W = P.shape[2]
    XC = (W + LANES - 1) // LANES
    Wp = XC * LANES
    table = build_corner_table_tiled(src)
    Wt, Ht, C2, _ = table.shape
    NT = min(NT, Wt)
    KR = min(KR, Ht)
    rp = jnp.pad(P, ((0, 0), (0, 0), (0, Wp - W)), constant_values=0.0)
    qp = jnp.pad(Q, ((0, 0), (0, 0), (0, Wp - W)), constant_values=-1e9)
    if svals.ndim == 1:
        dmap = jnp.broadcast_to(
            svals.astype(jnp.float32)[:, None, None], (D, H, Wp))
    else:
        dmap = jnp.pad(svals.astype(jnp.float32),
                       ((0, 0), (0, 0), (0, Wp - W)))
    yb = jnp.clip(plan["ybase"], 0, Ht - KY)
    wb = jnp.clip(plan["wb"], 0, Ht - KR)
    xtb = jnp.clip(plan["xtb"], 0, Wt - NT)
    hb = H // RB
    # 16/16-packed (ybase, xtb), laid out [D*HB, 1, RB*XC] so each grid
    # step streams only its own 128-B block into SMEM (see _kernel_px; the
    # middle singleton keeps the block's last-two dims equal to the
    # array's — the TPU lowering's block-shape rule)
    packed = (yb | (xtb << 16)).reshape(D * hb, 1, RB * XC)

    kern = functools.partial(
        _kernel_px, C=C, H=h, W=w, PR=H, Ht=Ht, Wt=Wt, KY=KY, KR=KR, XC=XC,
        NT=NT, sx=sx, sy=sy)

    row_spec = pl.BlockSpec((RB, Wp), lambda yy, di, *pf: (yy, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H // RB, D),
        in_specs=[
            pl.BlockSpec((1, 1, RB * XC),
                         lambda yy, di, *pf: (di * hb + yy, 0, 0),
                         memory_space=pltpu.SMEM),
            row_spec, row_spec, row_spec,       # P planes
            row_spec, row_spec, row_spec,       # Q planes
            pl.BlockSpec((1, RB, Wp), lambda yy, di, *pf: (di, yy, 0)),
            pl.BlockSpec(memory_space=pl.ANY),     # table stays in HBM
        ],
        out_specs=pl.BlockSpec((1, RB, C, Wp),
                               lambda yy, di, *pf: (di, yy, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Wt, KR, C2, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((RB, Wp), jnp.int32),
            pltpu.VMEM((RB, Wp), jnp.int32),
            pltpu.VMEM((RB, Wp), jnp.bfloat16),
            pltpu.VMEM((RB, Wp), jnp.bfloat16),
            pltpu.VMEM((RB, Wp), jnp.bfloat16),
            pltpu.VMEM((RB, Wp), jnp.bfloat16),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, H, C, Wp), jnp.bfloat16),
        interpret=interpret,
    )(wb, packed,
      rp[0], rp[1], rp[2], qp[0], qp[1], qp[2], dmap, table)
    return out[:, :H0, :, :W]


def _kernel_px_gwc(wb_ref,
                   plan_ref,                    # SMEM [1, RB*XC] i32 packed
                   px_ref, py_ref, pz_ref,
                   qx_ref, qy_ref, qz_ref,
                   dmap_ref, ref_ref, table_ref, out_ref,
                   win_ref, sem, ix_s, iy_s, w00_s, w01_s, w10_s, w11_s,
                   *, C, G, H, W, PR, Ht, Wt, KY, KR, XC, NT, sx, sy):
    """_kernel_px with the group-wise correlation fused in: instead of the
    [C, 128] warped chunk, writes the [G, 128] per-group ref*warped dots
    (ops/volumes.groupwise_correlation semantics, nn_utils.py:473-490) —
    the only HBM volume is the C/G-times-smaller correlation volume."""
    yy = pl.program_id(0)
    d_i = pl.program_id(1)
    C2 = C * 2
    gs = C // G

    wb = wb_ref[yy]

    @pl.when(d_i == 0)
    def _():
        dma = pltpu.make_async_copy(
            table_ref.at[:, pl.ds(wb, KR)], win_ref, sem)
        dma.start()
        dma.wait()

    d = dmap_ref[0]
    rx = px_ref[:] * d + qx_ref[:]
    ry = py_ref[:] * d + qy_ref[:]
    rz = pz_ref[:] * d + qz_ref[:]
    xs = jnp.where(rz > 0, rx / rz, -10.0) * sx
    ys = jnp.where(rz > 0, ry / rz, -10.0) * sy
    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    fxb = xs - x0f
    fyb = ys - y0f
    validb = ((x0f >= -1.0) & (x0f <= float(W) - 1.0)
              & (y0f >= -1.0) & (y0f <= float(H) - 1.0))
    ix_s[:] = jnp.clip(x0f + 1.0, 0.0, float(W + 1)).astype(jnp.int32)
    iy_s[:] = jnp.clip(y0f + 1.0, 0.0, float(H + 1)).astype(jnp.int32)
    vb = validb.astype(jnp.float32)
    w00_s[:] = ((1.0 - fyb) * (1.0 - fxb) * vb).astype(jnp.bfloat16)
    w01_s[:] = ((1.0 - fyb) * fxb * vb).astype(jnp.bfloat16)
    w10_s[:] = (fyb * (1.0 - fxb) * vb).astype(jnp.bfloat16)
    w11_s[:] = (fyb * fxb * vb).astype(jnp.bfloat16)

    for r in range(RB):
        for xc in range(XC):
            ls = pl.ds(xc * LANES, LANES)
            ix = ix_s[r, ls]
            iy = iy_s[r, ls]
            packed = plan_ref[0, 0, r * XC + xc]
            ybase = packed & 0xFFFF
            xtb = packed >> 16
            iyl = jnp.clip(iy - ybase, 0, KY - 1)
            inwin = (iy - ybase) == iyl
            idx = jnp.broadcast_to(ix[None], (C2, LANES))
            ywin = jnp.clip(ybase - wb, 0, KR - KY)
            sel = None
            for k in range(KY):
                g = None
                for t in range(NT):
                    tile = win_ref[xtb + t, ywin + k]
                    base = (xtb + t) * LANES
                    loc = jnp.clip(idx - base, 0, LANES - 1)
                    gt = jnp.take_along_axis(tile, loc, axis=1)
                    if g is None:
                        g = gt
                    else:
                        use = (idx >= base) & (idx < base + LANES)
                        g = jnp.where(use, gt, g)
                ok = jnp.broadcast_to((iyl == k)[None], (C2, LANES))
                sel = g if sel is None else jnp.where(ok, g, sel)
            quad = pltpu.bitcast(sel, jnp.bfloat16)
            mask = inwin.astype(jnp.bfloat16)[None]
            warped = (quad[0 * C:1 * C] * w00_s[r, ls][None]
                      + quad[1 * C:2 * C] * w01_s[r, ls][None]
                      + quad[2 * C:3 * C] * w10_s[r, ls][None]
                      + quad[3 * C:4 * C] * w11_s[r, ls][None]) * mask
            prod = (ref_ref[r, :, ls].astype(jnp.float32)
                    * warped.astype(jnp.float32))         # [C, 128]
            corr = prod.reshape(G, gs, LANES).sum(axis=1)  # [G, 128]
            out_ref[0, r, :, ls] = corr.astype(out_ref.dtype)


def mosaic_sweep_warp_px_gwc(src, ref_chw, P, Q, svals, plan,
                             groups: int = 8, KY: int = 2, KR: int = 32,
                             NT: int = 2,
                             sx: float = 1.0, sy: float = 1.0,
                             interpret: bool = False) -> jnp.ndarray:
    """Streamed warp with the group-wise correlation fused in.

    Args: as mosaic_sweep_warp_px, plus ref_chw [H, C, W] reference
    features. Returns [D, H, G, W] correlation volume (bf16).
    """
    h, w, C = src.shape
    D = svals.shape[0]
    H0 = P.shape[1]
    P, Q, svals, H = _pad_ref_rows(P, Q, svals)   # rows to RB granularity
    svals = _align_sval_rows(svals, H)
    W = P.shape[2]
    G = groups
    assert C % G == 0
    XC = (W + LANES - 1) // LANES
    Wp = XC * LANES
    if H != H0:
        ref_chw = jnp.pad(ref_chw, ((0, H - H0), (0, 0), (0, 0)))
    table = build_corner_table_tiled(src)
    Wt, Ht, C2, _ = table.shape
    NT = min(NT, Wt)
    KR = min(KR, Ht)
    rp = jnp.pad(P, ((0, 0), (0, 0), (0, Wp - W)), constant_values=0.0)
    qp = jnp.pad(Q, ((0, 0), (0, 0), (0, Wp - W)), constant_values=-1e9)
    if svals.ndim == 1:
        dmap = jnp.broadcast_to(
            svals.astype(jnp.float32)[:, None, None], (D, H, Wp))
    else:
        dmap = jnp.pad(svals.astype(jnp.float32),
                       ((0, 0), (0, 0), (0, Wp - W)))
    refp = jnp.pad(ref_chw, ((0, 0), (0, 0), (0, Wp - W))) \
        .astype(jnp.bfloat16)
    yb = jnp.clip(plan["ybase"], 0, Ht - KY)
    wb = jnp.clip(plan["wb"], 0, Ht - KR)
    xtb = jnp.clip(plan["xtb"], 0, Wt - NT)
    hb = H // RB
    packed = (yb | (xtb << 16)).reshape(D * hb, 1, RB * XC)  # see _kernel_px

    kern = functools.partial(
        _kernel_px_gwc, C=C, G=G, H=h, W=w, PR=H, Ht=Ht, Wt=Wt, KY=KY,
        KR=KR, XC=XC, NT=NT, sx=sx, sy=sy)

    row_spec = pl.BlockSpec((RB, Wp), lambda yy, di, *pf: (yy, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H // RB, D),
        in_specs=[
            pl.BlockSpec((1, 1, RB * XC),
                         lambda yy, di, *pf: (di * hb + yy, 0, 0),
                         memory_space=pltpu.SMEM),
            row_spec, row_spec, row_spec,       # P planes
            row_spec, row_spec, row_spec,       # Q planes
            pl.BlockSpec((1, RB, Wp), lambda yy, di, *pf: (di, yy, 0)),
            pl.BlockSpec((RB, C, Wp), lambda yy, di, *pf: (yy, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),     # table stays in HBM
        ],
        out_specs=pl.BlockSpec((1, RB, G, Wp),
                               lambda yy, di, *pf: (di, yy, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Wt, KR, C2, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((RB, Wp), jnp.int32),
            pltpu.VMEM((RB, Wp), jnp.int32),
            pltpu.VMEM((RB, Wp), jnp.bfloat16),
            pltpu.VMEM((RB, Wp), jnp.bfloat16),
            pltpu.VMEM((RB, Wp), jnp.bfloat16),
            pltpu.VMEM((RB, Wp), jnp.bfloat16),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, H, G, Wp), jnp.bfloat16),
        interpret=interpret,
    )(wb, packed,
      rp[0], rp[1], rp[2], qp[0], qp[1], qp[2], dmap, refp, table)
    return out[:, :H0, :, :W]


# ---------------------------------------------------------------------------
# v3: FUSED multi-view cost-volume kernel.
#
# The v1/v2 kernels write a [D, H, C, W] warped volume per source view that
# the XLA aggregation then re-reads (2 full-volume writes + reads per view
# against a ~2.5 ms write-only floor — BASELINE.md round-2 headline
# accounting). v3 loops the source views INSIDE the kernel and accumulates
# the aggregation statistics in registers per 128-px chunk — variance
# (Sum, Sum^2: models/MVSNet/model.py:113-139) or softmin (Sum e,
# Sum e*diff: model.py:141-173) — so the only volume that ever touches HBM
# is the final cost volume.
#
# Grid (D//DC, HB, DC), depth-minor: per (depth-chunk, row-block) the KR-row
# table slab each view needs is DMA'd once and reused by the DC planes.
# ---------------------------------------------------------------------------


def _kernel_fused(wb_ref, temp_ref,
                  plan_ref,            # SMEM [1, NV*RB*XC] i32 packed
                  px_ref, py_ref, pz_ref, qx_ref, qy_ref, qz_ref,
                  dmap_ref, ref_ref, table_ref, out_ref,
                  win_ref, sem, ix_s, iy_s, w00_s, w01_s, w10_s, w11_s,
                  *, C, H, W, Ht, Wt, KY, KR, XC, NT, NV, DC, ROWS,
                  sx, sy, agg):
    do = pl.program_id(0)
    yy = pl.program_id(1)
    dp = pl.program_id(2)
    DO = pl.num_programs(0)
    HB = pl.num_programs(1)
    C2 = C * 2
    D = DO * DC
    d_idx = do * DC + dp

    # ---- per-(depth-chunk, row-block) window DMA, all views ----
    @pl.when(dp == 0)
    def _():
        for v in range(NV):
            wb = wb_ref[(v * DO + do) * HB + yy]
            pltpu.make_async_copy(table_ref.at[v, :, pl.ds(wb, KR)],
                                  win_ref.at[v], sem.at[v]).start()
        for v in range(NV):
            wb = wb_ref[(v * DO + do) * HB + yy]
            pltpu.make_async_copy(table_ref.at[v, :, pl.ds(wb, KR)],
                                  win_ref.at[v], sem.at[v]).wait()

    # ---- per-view plans for this (plane, row block) ----
    dmv = dmap_ref[0]                                  # [RB, Wp]
    for v in range(NV):
        rx = px_ref[v] * dmv + qx_ref[v]
        ry = py_ref[v] * dmv + qy_ref[v]
        rz = pz_ref[v] * dmv + qz_ref[v]
        xs = jnp.where(rz > 0, rx / rz, -10.0) * sx
        ys = jnp.where(rz > 0, ry / rz, -10.0) * sy
        x0f = jnp.floor(xs)
        y0f = jnp.floor(ys)
        fxb = xs - x0f
        fyb = ys - y0f
        validb = ((x0f >= -1.0) & (x0f <= float(W) - 1.0)
                  & (y0f >= -1.0) & (y0f <= float(H) - 1.0))
        ix_s[v] = jnp.clip(x0f + 1.0, 0.0, float(W + 1)).astype(jnp.int32)
        iy_s[v] = jnp.clip(y0f + 1.0, 0.0, float(H + 1)).astype(jnp.int32)
        vb = validb.astype(jnp.float32)
        w00_s[v] = ((1.0 - fyb) * (1.0 - fxb) * vb).astype(jnp.bfloat16)
        w01_s[v] = ((1.0 - fyb) * fxb * vb).astype(jnp.bfloat16)
        w10_s[v] = (fyb * (1.0 - fxb) * vb).astype(jnp.bfloat16)
        w11_s[v] = (fyb * fxb * vb).astype(jnp.bfloat16)

    n_views = NV + 1
    inv_n = jnp.float32(1.0 / n_views)
    temp = temp_ref[0]

    for r in range(RB):
        for xc in range(XC):
            ls = pl.ds(xc * LANES, LANES)
            refq = ref_ref[r, :, ls].astype(jnp.float32)   # [C, 128]
            if agg == "variance":
                acc = refq
                acc2 = refq * refq
            else:
                sum_exp = jnp.zeros((1, LANES), jnp.float32)
                sum_val = jnp.zeros((C, LANES), jnp.float32)
            for v in range(NV):
                ix = ix_s[v, r, ls]
                iy = iy_s[v, r, ls]
                # (ybase, xtb) packed 16/16 into one int32, BLOCKED SMEM
                # input — only this grid step's (plane, row-block) slice
                # is resident (a whole-array prefetch plan is NV*D*ROWS*XC
                # ints = 3.5 MB at full-res DTU eval vs the 1 MB SMEM)
                packed = plan_ref[0, 0, (v * RB + r) * XC + xc]
                ybase = packed & 0xFFFF
                xtb = packed >> 16
                wb = wb_ref[(v * DO + do) * HB + yy]
                iyl = jnp.clip(iy - ybase, 0, KY - 1)
                inwin = (iy - ybase) == iyl
                idx = jnp.broadcast_to(ix[None], (C2, LANES))
                ywin = jnp.clip(ybase - wb, 0, KR - KY)
                sel = None
                for k in range(KY):
                    g = None
                    for t in range(NT):
                        tile = win_ref[v, xtb + t, ywin + k]
                        base = (xtb + t) * LANES
                        loc = jnp.clip(idx - base, 0, LANES - 1)
                        gt = jnp.take_along_axis(tile, loc, axis=1)
                        if g is None:
                            g = gt
                        else:
                            use = (idx >= base) & (idx < base + LANES)
                            g = jnp.where(use, gt, g)
                    ok = jnp.broadcast_to((iyl == k)[None], (C2, LANES))
                    sel = g if sel is None else jnp.where(ok, g, sel)
                quad = pltpu.bitcast(sel, jnp.bfloat16)
                mask = inwin.astype(jnp.bfloat16)[None]
                warped = (quad[0 * C:1 * C] * w00_s[v, r, ls][None]
                          + quad[1 * C:2 * C] * w01_s[v, r, ls][None]
                          + quad[2 * C:3 * C] * w10_s[v, r, ls][None]
                          + quad[3 * C:4 * C] * w11_s[v, r, ls][None]) * mask
                wf = warped.astype(jnp.float32)
                if agg == "variance":
                    acc = acc + wf
                    acc2 = acc2 + wf * wf
                else:
                    diff = (refq - wf) ** 2
                    e = jnp.exp(-temp * jnp.sum(diff, axis=0, keepdims=True))
                    sum_exp = sum_exp + e
                    sum_val = sum_val + e * diff
            if agg == "variance":
                cv = acc2 * inv_n - (acc * inv_n) ** 2
            else:
                cv = sum_val / (sum_exp + 1e-6)
            out_ref[0, r, :, ls] = cv.astype(out_ref.dtype)


def _pick_dc(d: int, target: int = 32) -> int:
    """Largest divisor of d that is <= target (depth planes per window)."""
    for cand in range(min(d, target), 0, -1):
        if d % cand == 0:
            return cand
    return 1


def fused_window_rows(src_hw: tuple[int, int], c: int, nv: int,
                      budget: int = 10 * 2 ** 20, KR: int = 48) -> int:
    """Largest KR (<= requested) whose NV view windows fit the VMEM budget."""
    h, w = src_hw
    ht = h + 2
    wt = ((w + 2 + LANES - 1) // LANES)
    per_row = wt * 2 * c * LANES * 4 * nv
    return max(0, min(KR, ht, budget // per_row))


def fused_cost_volume_px(feats_l, proj, ref_depths, ref_hw,
                         agg: str = "variance", temp=None,
                         KY: int = 2, KR: int = 48, DC: int | None = None,
                         fallback=None, interpret: bool = False):
    """Fused multi-view aggregated cost volume with exact fallback.

    Args:
      feats_l: list of [B, h, w, C] bf16 features, REFERENCE FIRST (views
        beyond index 0 are the sources, model order).
      proj: [B, N, 4, 4] projections at feature resolution (same order).
      ref_depths: [B, D] or [B, D, H, W] hypotheses.
      ref_hw: (H, W) of the reference grid (any H; rows are
        RB-padded internally with invalid rows).
      agg: "variance" | "softmin" (temp = softmin temperature scalar).
      fallback: fallback(bb) -> [D, H, W, C] exact cost volume for batch
        element bb, taken when this element's spans exceed the kernel's
        window (default: the XLA-gather aggregation).
    Returns:
      [B, D, H, W, C] cost volume (feature dtype).
    """
    from .plane_sweep import plane_sweep_warp
    from .volumes import softmin_cost_volume, variance_cost_volume

    n = len(feats_l)
    NV = n - 1
    b = feats_l[0].shape[0]
    H, W = ref_hw
    h, w = feats_l[1].shape[1:3]
    D = ref_depths.shape[1]
    DC = _pick_dc(D) if DC is None else DC
    Ht = h + 2
    KR = fused_window_rows((h, w), feats_l[0].shape[-1], NV, KR=KR)
    XC = (W + LANES - 1) // LANES
    Wp = XC * LANES
    ROWS = -(-H // RB) * RB          # ref rows, RB-padded (invalid pad rows)
    HBn = ROWS // RB
    dtype = feats_l[0].dtype

    if fallback is None:
        def fallback(bb):
            from .volumes import depth_chunked_volume, gather_chunk_planes
            db = ref_depths[bb]
            rp = proj[bb, 0]

            def cv_slab(db_s):
                fns = [(lambda i=i: plane_sweep_warp(
                    feats_l[i][bb:bb + 1], proj[bb:bb + 1, i], rp[None],
                    db_s[None], ref_hw))
                    for i in range(1, n)]
                if agg == "variance":
                    cv = variance_cost_volume(feats_l[0][bb:bb + 1],
                                              warp_fns=fns,
                                              num_depth=db_s.shape[-1])
                else:
                    cv = softmin_cost_volume(feats_l[0][bb:bb + 1],
                                             warp_fns=fns,
                                             temperature=temp)
                return cv[0]

            if db.ndim != 1:
                return cv_slab(db)
            dcg = gather_chunk_planes(D, (h, w), feats_l[0].shape[-1])
            return depth_chunked_volume(cv_slab, db, dcg)

    def one(bb):
        db = ref_depths[bb]
        rp = proj[bb, 0]
        planes, plans = [], []
        ok = None
        for i in range(1, n):
            P, Q, sx, sy = mvsnet_planes(proj[bb, i], rp, ref_hw)
            P, Q, _, _ = _pad_ref_rows(P, Q, None)  # rows -> ROWS
            plan = sweep_spans_px(P, Q, db, (h, w), dc=DC)
            planes.append((P, Q))
            plans.append(plan)
            fit = (plan["yspan"] <= KY - 1) & (plan["xover"] <= 0)
            if KR < Ht:
                # KR == Ht == resident regime: the window IS the table, so
                # the slab constraint vanishes
                fit = fit & (plan["wspan"] <= KR - KY)
            ok = fit if ok is None else ok & fit

        def kernel_branch():
            table = jnp.stack([build_corner_table_tiled(feats_l[i][bb])
                               for i in range(1, n)])  # [NV, Wt, Ht, C2, L]
            _, Wt, _, C2, _ = table.shape
            C = C2 // 2
            NT = min(2, Wt)
            yb = jnp.stack([jnp.clip(p["ybase"], 0, Ht - KY) for p in plans])
            xtb = jnp.stack([jnp.clip(p["xtb"], 0, Wt - NT) for p in plans])
            # 16/16-packed (ybase, xtb), [NV, D, ROWS, XC] -> blocked-SMEM
            # layout [(d, row-block), (view, row, x-chunk)] so each grid
            # step streams only its own NV*RB*XC ints (see _kernel_fused)
            packed = (yb | (xtb << 16)).reshape(
                NV, D, HBn, RB, XC).transpose(1, 2, 0, 3, 4).reshape(
                D * HBn, 1, NV * RB * XC)
            wb = jnp.stack([jnp.clip(p["wb"], 0, Ht - KR) for p in plans])

            def pad3(x, cval):
                return jnp.pad(x, ((0, 0), (0, 0), (0, Wp - W)),
                               constant_values=cval)

            px = pad3(jnp.stack([P[0] for P, _ in planes]), 0.0)
            py = pad3(jnp.stack([P[1] for P, _ in planes]), 0.0)
            pz = pad3(jnp.stack([P[2] for P, _ in planes]), 0.0)
            # Q pad must force z < 0 in pad lanes (see sweep_spans_px)
            qx = pad3(jnp.stack([Q[0] for _, Q in planes]), -1e9)
            qy = pad3(jnp.stack([Q[1] for _, Q in planes]), -1e9)
            qz = pad3(jnp.stack([Q[2] for _, Q in planes]), -1e9)

            if db.ndim == 1:
                dmap = jnp.broadcast_to(
                    db.astype(jnp.float32)[:, None, None], (D, ROWS, Wp))
            else:
                dmap = jnp.pad(db.astype(jnp.float32),
                               ((0, 0), (0, ROWS - H), (0, Wp - W)))
            ref_chw = jnp.pad(
                jnp.transpose(feats_l[0][bb], (0, 2, 1)),
                ((0, ROWS - H), (0, 0), (0, Wp - W))).astype(jnp.bfloat16)
            tempv = (jnp.zeros((1,), jnp.float32) if temp is None else
                     jnp.reshape(jnp.asarray(temp, jnp.float32), (-1,))[:1])

            kern = functools.partial(
                _kernel_fused, C=C, H=h, W=w, Ht=Ht, Wt=Wt, KY=KY, KR=KR,
                XC=XC, NT=NT, NV=NV, DC=DC, ROWS=ROWS, sx=1.0, sy=1.0,
                agg=agg)

            vrow = pl.BlockSpec((NV, RB, Wp),
                                lambda do, yy, dp, *pf: (0, yy, 0))
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(D // DC, HBn, DC),
                in_specs=[
                    pl.BlockSpec(
                        (1, 1, NV * RB * XC),
                        lambda do, yy, dp, *pf: (
                            (do * DC + dp) * HBn + yy, 0, 0),
                        memory_space=pltpu.SMEM),
                    vrow, vrow, vrow, vrow, vrow, vrow,
                    pl.BlockSpec(
                        (1, RB, Wp),
                        lambda do, yy, dp, *pf: (do * DC + dp, yy, 0)),
                    pl.BlockSpec((RB, C, Wp),
                                 lambda do, yy, dp, *pf: (yy, 0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (1, RB, C, Wp),
                    lambda do, yy, dp, *pf: (do * DC + dp, yy, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((NV, Wt, KR, C2, LANES), jnp.int32),
                    pltpu.SemaphoreType.DMA((NV,)),
                    pltpu.VMEM((NV, RB, Wp), jnp.int32),
                    pltpu.VMEM((NV, RB, Wp), jnp.int32),
                    pltpu.VMEM((NV, RB, Wp), jnp.bfloat16),
                    pltpu.VMEM((NV, RB, Wp), jnp.bfloat16),
                    pltpu.VMEM((NV, RB, Wp), jnp.bfloat16),
                    pltpu.VMEM((NV, RB, Wp), jnp.bfloat16),
                ],
            )
            cv = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((D, ROWS, C, Wp), dtype),
                interpret=interpret,
            )(wb.reshape(-1), tempv, packed,
              px, py, pz, qx, qy, qz, dmap, ref_chw, table)
            return jnp.transpose(cv[:, :H, :, :W],
                                 (0, 1, 3, 2))               # [D, H, W, C]

        return jax.lax.cond(ok, kernel_branch, lambda: fallback(bb))

    return jnp.stack([one(bb) for bb in range(b)])


def fused_supported(ref_hw: tuple[int, int], src_hw: tuple[int, int],
                    c: int, nv: int, dtype, KY: int = 2) -> bool:
    """Static eligibility of the fused multi-view kernel."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    # (ref rows need not be %RB — the wrapper pads them with invalid rows)
    return (dtype == jnp.bfloat16
            and fused_window_rows(src_hw, c, nv) > KY)


TIER_B = dict(KY=8, NT=3)   # wide streamed window: realistic DTU eval
# geometry at 296x400 features shows yspan up to 7 and xover up to ~6 px
# (tools/eval_span_study.py), which the default (KY=2, NT=2) window can't
# cover — tier B trades KY*NT/4 = 6x the per-chunk gather work for still
# beating the XLA gather's per-index floor


def _scoped_vmem_budget() -> int:
    """Per-kernel scratch budget (bytes) for the streamed windows.

    XLA enforces a SCOPED (per-kernel stack) VMEM limit — default 16 MiB
    (--xla_tpu_scoped_vmem_limit_kib) — far below the chip's 128 MiB
    VMEM; a window scratch above it is a compile-time OOM (the full-res
    DTU eval failure mode: 19.7-22 MB tier-B windows). Budget = limit
    minus ~2.5 MB for the pipeline's in/out blocks. Set
    WILDMVS_SCOPED_VMEM_KIB to match a raised XLA flag."""
    import os
    kib = int(os.environ.get("WILDMVS_SCOPED_VMEM_KIB", "16384"))
    return kib * 1024 - int(2.5 * 2 ** 20)


def tier_b_kr(src_hw: tuple[int, int], c: int,
              budget: int | None = None, cap: int = 96) -> int:
    """Tier-B row-window height: as tall as the scoped-VMEM budget allows
    (the realistic-geometry wspan reaches ~76 rows per view at eval
    res)."""
    if budget is None:
        budget = min(24 * 2 ** 20, _scoped_vmem_budget())
    h, w = src_hw
    wt = (w + 2 + LANES - 1) // LANES
    row = wt * 2 * c * LANES * 4
    return max(0, min(cap, h + 2, budget // row))


def _plan_fit(plan, KY, KR, NT, Ht):
    ok = (plan["yspan"] <= KY - 1) & (plan["xover"] <= 0)
    if KR < Ht:
        ok = ok & (plan["wspan"] <= KR - KY)
    return ok


def _variance_px_perview(feats_l, proj, ref_depths, ref_hw, bb,
                         KY: int = 2, KR: int = 48,
                         interpret: bool = False) -> jnp.ndarray:
    return _agg_px_perview(feats_l, proj, ref_depths, ref_hw, bb,
                           agg="variance", KY=KY, KR=KR,
                           interpret=interpret)


def _agg_px_perview(feats_l, proj, ref_depths, ref_hw, bb,
                    agg: str = "variance", temp=None,
                    KY: int = 2, KR: int = 48,
                    interpret: bool = False) -> jnp.ndarray:
    """Per-view streamed-kernel aggregation for batch element bb: each
    source view warps through mosaic_sweep_warp_px (whole per-view window
    budget) and XLA accumulates the statistics — variance Sum/Sum^2
    (model.py:113-139) or softmin Sum e / Sum e*diff (model.py:141-173) in
    the kernel's [D, H, C, W] layout. Two kernel tiers behind nested conds
    — (KY, NT=2) then the wide TIER_B window for realistic eval geometry —
    then the (depth-chunked) exact gather. At sizes where the fused
    kernel's NV-view window budget collapses (e.g. CVP full-res
    refinements) this per-view path still beats the gather ~3.5-5x."""
    from .plane_sweep import plane_sweep_warp
    from .volumes import softmin_cost_volume, variance_cost_volume

    n = len(feats_l)
    h, w = feats_l[1].shape[1:3]
    c = feats_l[0].shape[-1]
    Ht = h + 2
    KRa = min(KR, Ht)
    KYb, NTb = TIER_B["KY"], TIER_B["NT"]
    KRb = tier_b_kr((h, w), c)
    num_depth = ref_depths.shape[1]
    dtype = feats_l[0].dtype

    db = ref_depths[bb]
    rp = proj[bb, 0]
    planes, okA, okB = [], None, None
    for i in range(1, n):
        P, Q, sx, sy = mvsnet_planes(proj[bb, i], rp, ref_hw)
        planA = sweep_spans_px(P, Q, db, (h, w))
        planB = sweep_spans_px(P, Q, db, (h, w), nt=NTb)
        planes.append((i, P, Q, planA, planB))
        fitA = _plan_fit(planA, KY, KRa, 2, Ht)
        fitB = _plan_fit(planB, KYb, KRb, NTb, Ht)
        okA = fitA if okA is None else okA & fitA
        okB = fitB if okB is None else okB & fitB

    def kernel_branch(tier):
        def fn():
            ref_v = jnp.transpose(feats_l[0][bb],
                                  (0, 2, 1))[None].astype(jnp.float32)
            vol_sum = None
            vol_sq = None
            sum_exp = None
            sum_val = None
            for i, P, Q, planA, planB in planes:
                plan, ky, kr, nt = ((planA, KY, KRa, 2) if tier == 0
                                    else (planB, KYb, KRb, NTb))
                warped = mosaic_sweep_warp_px(
                    feats_l[i][bb], P, Q, db, plan, KY=ky, KR=kr, NT=nt,
                    interpret=interpret).astype(jnp.float32)  # [D,H,C,W]
                if agg == "variance":
                    sq = warped ** 2
                    vol_sum = (warped if vol_sum is None
                               else vol_sum + warped)
                    vol_sq = sq if vol_sq is None else vol_sq + sq
                else:                                  # softmin
                    diff = (ref_v - warped) ** 2
                    e = jnp.exp(-temp * jnp.sum(diff, axis=2,
                                                keepdims=True))
                    sum_exp = e if sum_exp is None else sum_exp + e
                    cont = e * diff
                    sum_val = cont if sum_val is None else sum_val + cont
            if agg == "variance":
                vol_sum = vol_sum + ref_v
                vol_sq = vol_sq + ref_v ** 2
                cv = (vol_sq / n - (vol_sum / n) ** 2).astype(dtype)
            else:
                cv = (sum_val / (sum_exp + 1e-6)).astype(dtype)
            return jnp.transpose(cv, (0, 1, 3, 2))        # [D, H, W, C]
        return fn

    def gather_branch():
        from .volumes import depth_chunked_volume, gather_chunk_planes

        def cv_slab(db_s):
            fns = [(lambda i=i: plane_sweep_warp(
                feats_l[i][bb:bb + 1], proj[bb:bb + 1, i], rp[None],
                db_s[None], ref_hw)) for i in range(1, n)]
            if agg == "variance":
                return variance_cost_volume(feats_l[0][bb:bb + 1],
                                            warp_fns=fns,
                                            num_depth=db_s.shape[-1])[0]
            return softmin_cost_volume(feats_l[0][bb:bb + 1],
                                       warp_fns=fns, temperature=temp)[0]

        if db.ndim != 1:
            return cv_slab(db)
        dcg = gather_chunk_planes(num_depth, (h, w), c)
        return depth_chunked_volume(cv_slab, db, dcg)

    if KRb < KYb:                     # degenerate budget: no tier B
        return jax.lax.cond(okA, kernel_branch(0), gather_branch)
    return jax.lax.cond(
        okA, kernel_branch(0),
        lambda: jax.lax.cond(okB, kernel_branch(1), gather_branch))


def variance_volume_mosaic_px(feats_l, proj, ref_depths, ref_hw,
                              KY: int = 2, KR: int = 48,
                              interpret: bool = False) -> jnp.ndarray:
    """Variance cost volume for per-pixel/full sweeps, fused kernel first.

    CVP-MVSNet's per-level aggregation (all levels: the coarse full sweep
    and the per-pixel-hypothesis refinements). Dispatch: the v3 FUSED
    multi-view kernel (fused_cost_volume_px — source views accumulate
    Sum/Sum^2 in-register, only the final cost volume touches HBM) when
    the NV-view window budget is useful, else the pre-v3 per-view
    streamed kernel, else the exact XLA gather — each tier behind one
    runtime cond per batch element.

    Args:
      feats_l: list of [B, h, w, C] bf16 features, reference FIRST.
      proj: [B, N, 4, 4] level-scaled projections (same order).
      ref_depths: [B, D] or [B, D, H, W] hypotheses.
      ref_hw: (H, W) of the reference grid (any H; rows are RB-padded
        internally).
    Returns:
      [B, D, H, W, C] variance cost volume (feature dtype).
    """
    def perview(bb):
        return _variance_px_perview(feats_l, proj, ref_depths, ref_hw, bb,
                                    KY=KY, KR=KR, interpret=interpret)

    nv = len(feats_l) - 1
    h, w = feats_l[1].shape[1:3]
    # the fused kernel is only worth dispatching when its shared VMEM
    # budget still gives each view a useful window
    if fused_window_rows((h, w), feats_l[0].shape[-1], nv, KR=KR) >=             min(KR, h + 2, 16):
        return fused_cost_volume_px(feats_l, proj, ref_depths, ref_hw,
                                    agg="variance", KY=KY, KR=KR,
                                    fallback=perview, interpret=interpret)
    b = feats_l[0].shape[0]
    return jnp.stack([perview(bb) for bb in range(b)])


def _warp_mosaic_impl(src_fea, src_proj, ref_proj, depth_values, ref_hw,
                      interpret=False):
    """Per-batch span-cond Mosaic warp -> [B, D, H, W, C].

    Uniform depths [B, D]: resident v1 kernel (KY=2 -> KY=4 -> gather) —
    unless the ref height isn't %8 or the corner table exceeds the
    resident budget, where the streamed px kernel serves uniform depths
    too. Per-pixel depths [B, D, H, W]: streamed px kernel -> gather.
    """
    from .plane_sweep import plane_sweep_warp
    per_pixel = (depth_values.ndim > 2
                 or ref_hw[0] % RB != 0
                 or table_bytes(src_fea.shape[1:3],
                                src_fea.shape[-1]) > TABLE_VMEM_LIMIT)
    outs = []
    for b in range(src_fea.shape[0]):
        def gather(b=b):
            return plane_sweep_warp(src_fea[b:b + 1], src_proj[b:b + 1],
                                    ref_proj[b:b + 1],
                                    depth_values[b:b + 1],
                                    ref_hw)[0].astype(src_fea.dtype)

        if per_pixel:
            P, Q, _, _ = mvsnet_planes(src_proj[b], ref_proj[b], ref_hw)
            hw = src_fea.shape[1:3]
            Ht = hw[0] + 2
            planA = sweep_spans_px(P, Q, depth_values[b], hw)
            planB = sweep_spans_px(P, Q, depth_values[b], hw,
                                   nt=TIER_B["NT"])
            KRa = min(48, Ht)
            KYb, NTb = TIER_B["KY"], TIER_B["NT"]
            KRw = tier_b_kr(hw, src_fea.shape[-1])
            okA = _plan_fit(planA, 2, KRa, 2, Ht)
            okB = _plan_fit(planB, KYb, KRw, NTb, Ht)

            def kern_px(plan, ky, kr, nt, b=b, P=P, Q=Q):
                def fn():
                    out = mosaic_sweep_warp_px(
                        src_fea[b], P, Q, depth_values[b], plan, KY=ky,
                        KR=kr, NT=nt, interpret=interpret)
                    return jnp.transpose(out, (0, 1, 3, 2))  # [D,H,W,C]
                return fn

            if KRw < KYb:
                outs.append(jax.lax.cond(okA, kern_px(planA, 2, KRa, 2),
                                         gather))
            else:
                outs.append(jax.lax.cond(
                    okA, kern_px(planA, 2, KRa, 2),
                    lambda okB=okB, pB=planB: jax.lax.cond(
                        okB, kern_px(pB, KYb, KRw, NTb), gather)))
            continue

        rxyz, trans = rot_planes(src_proj[b], ref_proj[b], ref_hw)
        yb, span = sweep_spans(rxyz, trans, depth_values[b],
                               src_fea.shape[1:3])

        def kern(KY, b=b, rxyz=rxyz, trans=trans, yb=yb):
            def fn():
                out = mosaic_sweep_warp(src_fea[b], rxyz, trans,
                                        depth_values[b], yb, KY=KY,
                                        interpret=interpret)
                return jnp.transpose(out, (0, 1, 3, 2))   # [D, H, W, C]
            return fn

        outs.append(jax.lax.cond(
            span <= 1, kern(2),
            lambda: jax.lax.cond(
                span <= 3, kern(4),
                lambda: jax.lax.cond(span <= 7, kern(8), gather))))
    return jnp.stack(outs, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def plane_sweep_warp_mosaic(src_fea, src_proj, ref_proj, depth_values,
                            ref_hw, interpret=False):
    """Differentiable drop-in for ops.plane_sweep.plane_sweep_warp.

    Forward: the Mosaic kernel (with the usual runtime exact-gather
    fallback); backward: the gather path's VJP evaluated at the same
    primals — the warp is linear in the features, so the cotangent is the
    exact scatter-add regardless of which forward produced the output (the
    two forwards differ only by bf16 rounding). This is what lets the bf16
    TRAINING recipe use the kernel; the model gates it exactly like the
    eval path (bf16 + TPU + uniform fronto-parallel sweeps)."""
    return _warp_mosaic_impl(src_fea, src_proj, ref_proj, depth_values,
                             ref_hw, interpret)


def _warp_mosaic_fwd(src_fea, src_proj, ref_proj, depth_values, ref_hw,
                     interpret):
    out = _warp_mosaic_impl(src_fea, src_proj, ref_proj, depth_values,
                            ref_hw, interpret)
    return out, (src_fea, src_proj, ref_proj, depth_values)


def _xla_warp_transpose(src_fea, xn, yn, g):
    """XLA scatter-add transpose of the gather warp (fallback path)."""
    from .grid_sample import grid_sample_xy

    def warp_lin(im):
        return jax.vmap(
            lambda i, gx, gy: grid_sample_xy(i, gx, gy, align_corners=True)
        )(im, xn, yn)

    tr = jax.linear_transpose(
        warp_lin, jax.ShapeDtypeStruct(src_fea.shape, src_fea.dtype))
    (df,) = tr(g.astype(src_fea.dtype))
    return df


def _warp_mosaic_bwd(ref_hw, interpret, res, g):
    from .plane_sweep import sweep_grid_xy
    src_fea, src_proj, ref_proj, depth_values = res
    # the grid is no-grad by reference semantics (module.py:127), so the
    # warp is LINEAR in the features and the only cotangent is the gather
    # transpose.  The Mosaic scatter kernel serves it in the windowed
    # regime (one MXU contraction per chunk into a VMEM-resident canvas,
    # f32 accumulation — measured 3x closer to the f32 truth than the
    # bf16 XLA scatter it replaces); XLA scatter-add remains the runtime
    # fallback behind the usual span cond.
    b, h, w, C = src_fea.shape

    def xla_path():
        xn, yn = sweep_grid_xy(src_proj, ref_proj, depth_values, ref_hw,
                               src_fea.shape[1:3])
        return _xla_warp_transpose(src_fea, xn, yn, g)

    if not (mosaic_px_supported(ref_hw, src_fea.dtype) or interpret):
        df = xla_path()
    else:
        dfs = []
        for bb in range(b):
            P, Q, sx, sy = mvsnet_planes(src_proj[bb], ref_proj[bb],
                                         ref_hw)
            sv = depth_values[bb]
            plan = sweep_spans_px(P, Q, sv, (h, w), sx=sx, sy=sy)
            ok = _plan_fit_scatter(plan, 2)

            def kern(bb=bb, P=P, Q=Q, sv=sv, plan=plan, sx=sx, sy=sy):
                return mosaic_scatter_px(
                    g[bb], P, Q, sv, plan, (h, w), KY=2, NTS=3,
                    sx=sx, sy=sy,
                    interpret=interpret).astype(src_fea.dtype)

            def fb(bb=bb):
                xn, yn = sweep_grid_xy(
                    src_proj[bb:bb + 1], ref_proj[bb:bb + 1],
                    depth_values[bb:bb + 1], ref_hw, (h, w))
                return _xla_warp_transpose(src_fea[bb:bb + 1], xn, yn,
                                           g[bb:bb + 1])[0]

            dfs.append(jax.lax.cond(ok, kern, fb))
        df = jnp.stack(dfs)
    return (df, jnp.zeros_like(src_proj), jnp.zeros_like(ref_proj),
            jnp.zeros_like(depth_values))


plane_sweep_warp_mosaic.defvjp(_warp_mosaic_fwd, _warp_mosaic_bwd)


def mosaic_px_supported(ref_hw: tuple[int, int], dtype) -> bool:
    """Static eligibility of the streamed px path (any ref height — rows
    that are not a multiple of 8 are padded with invalid rows inside the
    wrappers, e.g. Vis stage 1 and the odd CVP levels at full-res eval)."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    return dtype == jnp.bfloat16


def vis_mosaic_supported(ref_hw: tuple[int, int], src_hw: tuple[int, int],
                         dtype) -> bool:
    """Vis-convention eligibility: px-path conditions PLUS the clamp-parity
    size bound — the reference parks out-of-range coords at +-1.1
    normalized, which only lands outside the valid corner range (exact
    zeros, matching the kernel's validity mask) when 0.05*(size-1) >= 1."""
    return (mosaic_px_supported(ref_hw, dtype)
            and min(src_hw) >= 21)


def homography_volume_mosaic(src, K_ref, R_ref, t_ref, K_src, R_src, t_src,
                             depth_num: int, depth_start, depth_interval,
                             ref_hw, KY: int = 2, KR: int = 48,
                             interpret: bool = False) -> jnp.ndarray:
    """Vis-MVSNet homography sweep via the streamed kernel, exact fallback.

    Drop-in for ops.plane_sweep.homography_sweep_warp (same argument
    contract: batched [B, ...] cams, depth_start [B,1,1,1] or per-pixel
    [B,1,H,W]); one runtime span-cond per batch element. Returns
    [B, D, H, W, C].
    """
    from .plane_sweep import homography_sweep_warp
    b, h, w, C = src.shape
    rh, rw = ref_hw
    dtype = src.dtype
    steps = jnp.arange(depth_num, dtype=jnp.float32).reshape(depth_num, 1, 1)

    outs = []
    for bb in range(b):
        P, Q, sx, sy = vis_planes(K_ref[bb], R_ref[bb], t_ref[bb],
                                  K_src[bb], R_src[bb], t_src[bb],
                                  ref_hw, (h, w))
        start = depth_start[bb, 0].astype(jnp.float32)     # [1,1] or [H,W]
        interval = depth_interval[bb, 0, 0, 0].astype(jnp.float32)
        depth = start[None] + interval * steps             # [D, ?, ?]
        svals = 1.0 / (depth + 1e-9)
        if svals.shape[1] == 1:
            svals = svals[:, 0, 0]                          # [D]
        else:
            svals = jnp.broadcast_to(svals, (depth_num, rh, rw))
        Ht = h + 2
        planA = sweep_spans_px(P, Q, svals, (h, w), sx=sx, sy=sy)
        planB = sweep_spans_px(P, Q, svals, (h, w), sx=sx, sy=sy,
                               nt=TIER_B["NT"])
        KRa = min(KR, Ht)
        KYb, NTb = TIER_B["KY"], TIER_B["NT"]
        KRw = tier_b_kr((h, w), C)
        okA = _plan_fit(planA, KY, KRa, 2, Ht)
        okB = _plan_fit(planB, KYb, KRw, NTb, Ht)

        def kern(plan, ky, kr, nt, bb=bb, P=P, Q=Q, svals=svals,
                 sx=sx, sy=sy):
            def fn():
                out = mosaic_sweep_warp_px(src[bb], P, Q, svals, plan,
                                           KY=ky, KR=kr, NT=nt, sx=sx,
                                           sy=sy, interpret=interpret)
                return jnp.transpose(out, (0, 1, 3, 2)).astype(dtype)
            return fn

        def fallback(bb=bb):
            return homography_sweep_warp(
                src[bb:bb + 1], K_ref[bb:bb + 1], R_ref[bb:bb + 1],
                t_ref[bb:bb + 1], K_src[bb:bb + 1], R_src[bb:bb + 1],
                t_src[bb:bb + 1], depth_num, depth_start[bb:bb + 1],
                depth_interval[bb:bb + 1], ref_hw)[0]

        if KRw < KYb:
            outs.append(jax.lax.cond(okA, kern(planA, KY, KRa, 2),
                                     fallback))
        else:
            outs.append(jax.lax.cond(
                okA, kern(planA, KY, KRa, 2),
                lambda okB=okB, pB=planB: jax.lax.cond(
                    okB, kern(pB, KYb, KRw, NTb), fallback)))
    return jnp.stack(outs, axis=0)


def homography_gwc_volume_mosaic(src, ref_feat, K_ref, R_ref, t_ref,
                                 K_src, R_src, t_src, depth_num: int,
                                 depth_start, depth_interval, ref_hw,
                                 groups: int = 8, KY: int = 2, KR: int = 48,
                                 interpret: bool = False) -> jnp.ndarray:
    """Vis-MVSNet per-pair warp + group-wise correlation in ONE kernel.

    Replaces homography_sweep_warp -> groupwise_correlation
    (model_cas.py:176-187 + nn_utils.py:473-490): the [D, H, W, C] warped
    volume never touches HBM — the kernel writes the C/groups-times-smaller
    correlation volume directly. Same runtime span-cond fallback as
    homography_volume_mosaic (gather warp + XLA correlation).

    Args: src/ref_feat [B, h, w, C] / [B, H, W, C]; cams batched like
    homography_sweep_warp. Returns [B, D, H, W, groups].
    """
    from .plane_sweep import homography_sweep_warp
    from .volumes import groupwise_correlation
    b, h, w, C = src.shape
    rh, rw = ref_hw
    steps = jnp.arange(depth_num, dtype=jnp.float32).reshape(depth_num, 1, 1)

    outs = []
    for bb in range(b):
        P, Q, sx, sy = vis_planes(K_ref[bb], R_ref[bb], t_ref[bb],
                                  K_src[bb], R_src[bb], t_src[bb],
                                  ref_hw, (h, w))
        start = depth_start[bb, 0].astype(jnp.float32)
        interval = depth_interval[bb, 0, 0, 0].astype(jnp.float32)
        depth = start[None] + interval * steps
        svals = 1.0 / (depth + 1e-9)
        if svals.shape[1] == 1:
            svals = svals[:, 0, 0]
        else:
            svals = jnp.broadcast_to(svals, (depth_num, rh, rw))
        Ht = h + 2
        planA = sweep_spans_px(P, Q, svals, (h, w), sx=sx, sy=sy)
        planB = sweep_spans_px(P, Q, svals, (h, w), sx=sx, sy=sy,
                               nt=TIER_B["NT"])
        KRa = min(KR, Ht)
        KYb, NTb = TIER_B["KY"], TIER_B["NT"]
        KRw = tier_b_kr((h, w), C)
        okA = _plan_fit(planA, KY, KRa, 2, Ht)
        okB = _plan_fit(planB, KYb, KRw, NTb, Ht)
        ref_chw = jnp.transpose(ref_feat[bb], (0, 2, 1))   # [H, C, W]

        def kern(plan, ky, kr, nt, bb=bb, P=P, Q=Q, svals=svals,
                 sx=sx, sy=sy, ref_chw=ref_chw):
            def fn():
                out = mosaic_sweep_warp_px_gwc(
                    src[bb], ref_chw, P, Q, svals, plan, groups=groups,
                    KY=ky, KR=kr, NT=nt, sx=sx, sy=sy, interpret=interpret)
                return jnp.transpose(out, (0, 1, 3, 2)).astype(src.dtype)
            return fn

        def fallback(bb=bb):
            warped = homography_sweep_warp(
                src[bb:bb + 1], K_ref[bb:bb + 1], R_ref[bb:bb + 1],
                t_ref[bb:bb + 1], K_src[bb:bb + 1], R_src[bb:bb + 1],
                t_src[bb:bb + 1], depth_num, depth_start[bb:bb + 1],
                depth_interval[bb:bb + 1], ref_hw)[0]
            return groupwise_correlation(
                jnp.broadcast_to(ref_feat[bb][None], warped.shape), warped,
                groups).astype(src.dtype)

        if KRw < KYb:
            outs.append(jax.lax.cond(okA, kern(planA, KY, KRa, 2),
                                     fallback))
        else:
            outs.append(jax.lax.cond(
                okA, kern(planA, KY, KRa, 2),
                lambda okB=okB, pB=planB: jax.lax.cond(
                    okB, kern(pB, KYb, KRw, NTb), fallback)))
    return jnp.stack(outs, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 10, 11))
def homography_sweep_warp_mosaic(src, K_ref, R_ref, t_ref, K_src, R_src,
                                 t_src, depth_num, depth_start,
                                 depth_interval, ref_hw, interpret=False):
    """Differentiable drop-in for ops.plane_sweep.homography_sweep_warp.

    Forward: homography_volume_mosaic (streamed kernel, runtime exact
    fallback); backward: the gather path's VJP at the same primals — same
    rationale as plane_sweep_warp_mosaic (the two forwards differ only by
    bf16 rounding, and the cotangents wrt features, cams, and the
    re-centered depth_start slab all come from the exact gather graph).
    Lets the bf16 Vis-MVSNet TRAINING recipe use the kernel."""
    return homography_volume_mosaic(src, K_ref, R_ref, t_ref, K_src, R_src,
                                    t_src, depth_num, depth_start,
                                    depth_interval, ref_hw,
                                    interpret=interpret)


def _hom_mosaic_fwd(src, K_ref, R_ref, t_ref, K_src, R_src, t_src,
                    depth_num, depth_start, depth_interval, ref_hw,
                    interpret):
    out = homography_volume_mosaic(src, K_ref, R_ref, t_ref, K_src, R_src,
                                   t_src, depth_num, depth_start,
                                   depth_interval, ref_hw,
                                   interpret=interpret)
    return out, (src, K_ref, R_ref, t_ref, K_src, R_src, t_src,
                 depth_start, depth_interval)


def _hom_mosaic_bwd(depth_num, ref_hw, interpret, res, g):
    from .plane_sweep import homography_sweep_grid_xy
    (src, K_ref, R_ref, t_ref, K_src, R_src, t_src, depth_start,
     depth_interval) = res
    # no-grad grid (homography.py:25/92/110): feature cotangent only —
    # Mosaic scatter kernel in the windowed regime, XLA scatter fallback
    # (see _warp_mosaic_bwd)
    b, h, w, C = src.shape
    rh, rw = ref_hw

    def xla_path():
        xn, yn = homography_sweep_grid_xy(
            src.shape[1:3], K_ref, R_ref, t_ref, K_src, R_src, t_src,
            depth_num, depth_start, depth_interval, ref_hw, src.dtype,
            src.shape[0])
        return _xla_warp_transpose(src, xn, yn, g)

    if not (mosaic_px_supported(ref_hw, src.dtype) or interpret):
        df = xla_path()
    else:
        steps = jnp.arange(depth_num,
                           dtype=jnp.float32).reshape(depth_num, 1, 1)
        dfs = []
        for bb in range(b):
            P, Q, sx, sy = vis_planes(K_ref[bb], R_ref[bb], t_ref[bb],
                                      K_src[bb], R_src[bb], t_src[bb],
                                      ref_hw, (h, w))
            start = depth_start[bb, 0].astype(jnp.float32)
            interval = depth_interval[bb, 0, 0, 0].astype(jnp.float32)
            depth = start[None] + interval * steps
            svals = 1.0 / (depth + 1e-9)
            if svals.shape[1] == 1:
                svals = svals[:, 0, 0]
            else:
                svals = jnp.broadcast_to(svals, (depth_num, rh, rw))
            plan = sweep_spans_px(P, Q, svals, (h, w), sx=sx, sy=sy)
            ok = _plan_fit_scatter(plan, 2)

            def kern(bb=bb, P=P, Q=Q, svals=svals, plan=plan, sx=sx,
                     sy=sy):
                return mosaic_scatter_px(
                    g[bb], P, Q, svals, plan, (h, w), KY=2, NTS=3,
                    sx=sx, sy=sy, interpret=interpret).astype(src.dtype)

            def fb(bb=bb):
                xn, yn = homography_sweep_grid_xy(
                    (h, w), K_ref[bb:bb + 1], R_ref[bb:bb + 1],
                    t_ref[bb:bb + 1], K_src[bb:bb + 1], R_src[bb:bb + 1],
                    t_src[bb:bb + 1], depth_num, depth_start[bb:bb + 1],
                    depth_interval[bb:bb + 1], ref_hw, src.dtype, 1)
                return _xla_warp_transpose(src[bb:bb + 1], xn, yn,
                                           g[bb:bb + 1])[0]

            dfs.append(jax.lax.cond(ok, kern, fb))
        df = jnp.stack(dfs)
    zeros = [jnp.zeros_like(a) for a in
             (K_ref, R_ref, t_ref, K_src, R_src, t_src, depth_start,
              depth_interval)]
    return (df, *zeros)


homography_sweep_warp_mosaic.defvjp(_hom_mosaic_fwd, _hom_mosaic_bwd)


# ---------------------------------------------------------------------------
# model-level dispatch: ONE fallback cond around the whole aggregation
# ---------------------------------------------------------------------------

def mosaic_supported(ref_hw: tuple[int, int], src_hw: tuple[int, int],
                     c: int, dtype, nv: int | None = None) -> bool:
    """Static (trace-time) eligibility of the Mosaic sweep path.

    Small sources: the resident-table regime (table fits TABLE_VMEM_LIMIT).
    Big sources (full-res DTU eval): eligible iff `nv` is given and the
    fused streamed kernel accepts NV row windows in its VMEM budget —
    cost_volume_mosaic then never compiles the resident branch."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    if dtype != jnp.bfloat16 or ref_hw[0] % RB != 0:
        return False
    if table_bytes(src_hw, c) <= TABLE_VMEM_LIMIT:
        return True
    return nv is not None and fused_supported(ref_hw, src_hw, c, nv, dtype)


def cost_volume_mosaic(feats, proj, src_idx, reference_frame,
                       ref_depths, ref_hw, agg, num_depth,
                       temp=None) -> jnp.ndarray:
    """Aggregated cost volume with the Mosaic sweep kernels + exact fallback.

    Dispatch cascade, ONE runtime lax.cond tree around the WHOLE
    aggregation per batch element (the per-view cond materializes branch
    results as f32 per view, ~2 GB of pure overhead — measured in the
    round-2 octet study, BASELINE.md):
      * resident regime (corner table fits TABLE_VMEM_LIMIT): per-view v1
        resident kernel, span <= 1 -> KY=2, span <= 3 -> KY=4, else exact
        gather. Measured ON PAR with the v3 fused kernel at the headline
        size (12.36 vs 12.56 ms cost-volume-only, tools/probe_fused.py):
        the fused kernel's per-(depth-chunk, row-block) window DMAs spend
        what its saved volume writes buy, and the resident table never
        re-fetches — so the simpler v1 keeps tier 1 here.
      * big-table regime (full-res DTU eval): v3 FUSED multi-view kernel
        (in-register Sum/Sum^2 or softmin stats, the only HBM volume is
        the final cost volume) when every view's spans fit its window,
        else the per-view streamed kernel (variance) / exact gather.

    Args:
      feats: [B, N, h, w, C] bf16 view features.
      proj: [B, N, 4, 4] projection matrices at feature resolution.
      src_idx: source view indices; reference_frame: ref view index.
      ref_depths: [B, D] hypothesis depths.
      ref_hw: (H, W) reference grid (any H).
      agg: "variance" | "softmin"; temp: softmin temperature param.
    Returns:
      [B, D, H, W, C] cost volume (feature dtype).
    """
    b = feats.shape[0]
    NV = len(src_idx)
    src_hw = feats.shape[2:4]
    resident_ok = table_bytes(src_hw, feats.shape[-1]) <= TABLE_VMEM_LIMIT

    def v1_one(bb):
        return _cost_volume_mosaic_v1(feats, proj, src_idx, reference_frame,
                                      ref_depths, ref_hw, agg, num_depth,
                                      temp, bb)

    if resident_ok:
        return jnp.stack([v1_one(bb) for bb in range(b)])
    if fused_supported(ref_hw, src_hw, feats.shape[-1], NV, feats.dtype):
        order = [reference_frame] + list(src_idx)
        feats_l = [feats[:, i] for i in order]
        proj_ro = proj[:, jnp.array(order)]
        # big-table regime (e.g. full-res DTU eval, 296x400 features — the
        # resident corner table would be ~39 MB): never compile the
        # resident v1 branch; fall back to the per-view STREAMED kernel
        # cascade (tier A -> TIER_B -> chunked gather) for both agg modes
        def fallback(bb):
            return _agg_px_perview(feats_l, proj_ro, ref_depths, ref_hw,
                                   bb, agg=agg, temp=temp)
        return fused_cost_volume_px(feats_l, proj_ro, ref_depths, ref_hw,
                                    agg=agg, temp=temp, fallback=fallback)
    raise ValueError(
        f"cost_volume_mosaic: corner table {table_bytes(src_hw, feats.shape[-1])} B "
        f"exceeds the resident budget and the fused streamed kernel is "
        f"ineligible for src_hw={src_hw} — gate with mosaic_supported()")


def _cost_volume_mosaic_v1(feats, proj, src_idx, reference_frame,
                           ref_depths, ref_hw, agg, num_depth, temp,
                           bb) -> jnp.ndarray:
    """Per-view v1 resident-kernel cascade for batch element bb
    (KY=2 -> KY=4 -> exact gather). Returns [D, H, W, C]."""
    from .plane_sweep import plane_sweep_warp
    from .volumes import softmin_cost_volume, variance_cost_volume

    H, W = ref_hw
    fb = feats[bb]                       # [N, h, w, C]
    pb = proj[bb]
    db = ref_depths[bb]
    rp = pb[reference_frame]

    planes = []
    span_all = None
    for i in src_idx:
        rxyz, trans = rot_planes(pb[i], rp, ref_hw)
        yb, span = sweep_spans(rxyz, trans, db, fb.shape[1:3])
        planes.append((i, rxyz, trans, yb))
        span_all = span if span_all is None else jnp.maximum(span_all,
                                                             span)

    def kernel_branch(KY):
        def fn():
            # warp in kernel layout [D, H, C, W]; aggregate in-layout;
            # ONE final transpose to [D, H, W, C] (the volume gets
            # materialized at the model's layout fence anyway)
            ref_chw = jnp.transpose(fb[reference_frame],
                                    (0, 2, 1))[None]   # [1, H, C, W]
            ref_v = ref_chw.astype(jnp.float32)
            n_views = len(src_idx) + 1
            vol_sum = None
            vol_sq = None
            sum_exp = None
            sum_val = None
            for i, rxyz, trans, yb in planes:
                warped = mosaic_sweep_warp(
                    fb[i], rxyz, trans, db, yb,
                    KY=KY).astype(jnp.float32)          # [D, H, C, W]
                if agg == "variance":
                    sq = warped ** 2
                    vol_sum = warped if vol_sum is None else vol_sum + warped
                    vol_sq = sq if vol_sq is None else vol_sq + sq
                else:
                    diff = (ref_v - warped) ** 2        # [D, H, C, W]
                    e = jnp.exp(-temp * jnp.sum(diff, axis=2,
                                                keepdims=True))
                    sum_exp = e if sum_exp is None else sum_exp + e
                    cont = e * diff
                    sum_val = cont if sum_val is None else sum_val + cont
            if agg == "variance":
                vol_sum = vol_sum + ref_v
                vol_sq = vol_sq + ref_v ** 2
                cv = vol_sq / n_views - (vol_sum / n_views) ** 2
            else:
                cv = sum_val / (sum_exp + 1e-6)
            cv = cv.astype(feats.dtype)                 # [D, H, C, W]
            return jnp.transpose(cv, (0, 1, 3, 2))      # [D, H, W, C]
        return fn

    def gather_branch():
        fns = [(lambda i=i: plane_sweep_warp(
            fb[None, i], pb[None, i], rp[None], db[None], ref_hw))
            for i in src_idx]
        if agg == "variance":
            cv = variance_cost_volume(fb[None, reference_frame],
                                      warp_fns=fns, num_depth=num_depth)
        else:
            cv = softmin_cost_volume(fb[None, reference_frame],
                                     warp_fns=fns, temperature=temp)
        return cv[0]

    # KY=1 tier: when every chunk's span is 0 the per-pixel candidate row
    # IS the prefetched ybase — one gather per (chunk, x-tile) instead of
    # two, and no row select.  The headline rig measures span 0 (r5 floor
    # derivation), so this halves the resident kernel's gather issue.
    branch = jax.lax.cond(
        span_all <= 0,
        kernel_branch(1),
        lambda: jax.lax.cond(
            span_all <= 1, kernel_branch(2),
            lambda: jax.lax.cond(
                span_all <= 3, kernel_branch(4),
                lambda: jax.lax.cond(span_all <= 7, kernel_branch(8),
                                     gather_branch))))
    return branch


# ---------------------------------------------------------------------------
# Scatter (transpose) kernel — the warp backward's feature cotangent.
#
# The XLA scatter-add that autodiff emits for the gather transpose costs
# ~17.5 ns/index on v5e (tools/time_cvp_train_parts.py r5: the CVP train
# step's dominant term, 137 + 92 ms of 549).  The transpose of the
# windowed warp has the same structure the forward kernels exploit: per
# (plane, 8-row block, 128-px chunk) every contribution lands in a KY+1
# source-row x NTS-tile window.  Within a chunk the scatter is expressed
# as ONE MXU contraction: one-hot matrices E0/E1 [W2, 128] (built in the
# natural sublane-iota x lane-pixel layout — no in-kernel transposes)
# select each pixel's x0/x1 target columns, the per-corner bilinear
# weights fold into the cotangent rows, and the product accumulates into
# a VMEM-resident f32 source canvas indexed by dynamic (row, col-tile).
# ---------------------------------------------------------------------------

def _kernel_scatter_px(plan_ref,                 # SMEM [1, 1, RB*XC] i32
                       px_ref, py_ref, pz_ref,   # VMEM [RB, Wp] f32
                       qx_ref, qy_ref, qz_ref,
                       dmap_ref,                 # VMEM [1, RB, Wp] f32
                       g_ref,                    # VMEM [1, RB, C, Wp] bf16
                       canvas_ref,               # out [Ht2, C, Wcan] f32
                       *, C, H, W, KY, XC, NTS, sx, sy):
    yy = pl.program_id(0)
    d_i = pl.program_id(1)
    W2 = NTS * LANES

    @pl.when((yy == 0) & (d_i == 0))
    def _():
        canvas_ref[:] = jnp.zeros_like(canvas_ref)

    # per-pixel corner plan — identical math to _kernel_px
    d = dmap_ref[0]                               # [RB, Wp]
    rx = px_ref[:] * d + qx_ref[:]
    ry = py_ref[:] * d + qy_ref[:]
    rz = pz_ref[:] * d + qz_ref[:]
    xs = jnp.where(rz > 0, rx / rz, -10.0) * sx
    ys = jnp.where(rz > 0, ry / rz, -10.0) * sy
    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    fxb = xs - x0f
    fyb = ys - y0f
    validb = ((x0f >= -1.0) & (x0f <= float(W) - 1.0)
              & (y0f >= -1.0) & (y0f <= float(H) - 1.0))
    ix = jnp.clip(x0f + 1.0, 0.0, float(W + 1)).astype(jnp.int32)
    iy = jnp.clip(y0f + 1.0, 0.0, float(H + 1)).astype(jnp.int32)
    vb = validb.astype(jnp.float32)
    w00 = ((1.0 - fyb) * (1.0 - fxb) * vb).astype(jnp.bfloat16)
    w01 = ((1.0 - fyb) * fxb * vb).astype(jnp.bfloat16)
    w10 = (fyb * (1.0 - fxb) * vb).astype(jnp.bfloat16)
    w11 = (fyb * fxb * vb).astype(jnp.bfloat16)

    jota = jax.lax.broadcasted_iota(jnp.int32, (W2, LANES), 0)

    for r in range(RB):
        for xc in range(XC):
            ls = slice(xc * LANES, (xc + 1) * LANES)
            packed = plan_ref[0, 0, r * XC + xc]
            ybase = packed & 0xFFFF
            xtb = packed >> 16
            relcol = (ix[r, ls] - xtb * LANES).reshape(1, LANES)
            # one-hot target-column selectors, x0 and x1 corners
            e0 = (jota == relcol).astype(jnp.bfloat16)   # [W2, 128]
            e1 = (jota == relcol + 1).astype(jnp.bfloat16)
            iyr = iy[r, ls].reshape(1, LANES)
            g_chunk = g_ref[0, r, :, ls]                 # [C, 128] bf16
            lhsA, lhsB = [], []
            for m in range(KY + 1):
                mk0 = (iyr == ybase + m).astype(jnp.bfloat16)
                mk1 = (iyr == ybase + m - 1).astype(jnp.bfloat16)
                aA = w00[r, ls].reshape(1, LANES) * mk0 \
                    + w10[r, ls].reshape(1, LANES) * mk1
                aB = w01[r, ls].reshape(1, LANES) * mk0 \
                    + w11[r, ls].reshape(1, LANES) * mk1
                lhsA.append(g_chunk * aA)
                lhsB.append(g_chunk * aB)
            # one contraction: [(KY+1)C, 256] x [W2, 256] over lanes
            lhs = jnp.concatenate(
                [jnp.concatenate(lhsA, axis=0),
                 jnp.concatenate(lhsB, axis=0)], axis=1)
            rhs = jnp.concatenate([e0, e1], axis=1)
            out = jax.lax.dot_general(
                lhs, rhs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [(KY+1)C, W2]
            colb = pl.multiple_of(xtb * LANES, LANES)
            for m in range(KY + 1):
                cur = canvas_ref[ybase + m, :, pl.ds(colb, W2)]
                canvas_ref[ybase + m, :, pl.ds(colb, W2)] = (
                    cur + out[m * C:(m + 1) * C])


def scatter_canvas_bytes(src_hw: tuple[int, int], c: int) -> int:
    h, w = src_hw
    wcan = -(-(w + 2) // LANES) * LANES
    return (h + 2) * c * wcan * 4


def mosaic_scatter_px(g: jnp.ndarray, P: jnp.ndarray, Q: jnp.ndarray,
                      svals: jnp.ndarray, plan: dict,
                      src_hw: tuple[int, int], KY: int = 2, NTS: int = 3,
                      sx: float = 1.0, sy: float = 1.0,
                      vmem_budget: int = 12 << 20,
                      interpret: bool = False) -> jnp.ndarray:
    """Feature cotangent of the px warp: df[h, w, C] (f32) from the warp
    output cotangent g [D, H, W, C].

    Exact transpose of the warp's bilinear gather in the windowed regime:
    dispatch iff plan yspan <= KY-1 and xover <= -1 (the x1 corner needs
    one column beyond the forward's window bound).  Splits channels into
    multiple passes when the f32 source canvas exceeds the VMEM budget.
    """
    h, w = src_hw
    D, H0, W0, C = g.shape
    g2 = jnp.transpose(g, (0, 1, 3, 2))           # [D, H0, C, W0]
    P, Q, svals, H = _pad_ref_rows(P, Q, svals)
    svals = _align_sval_rows(svals, H)
    Wgrid = P.shape[2]
    XC = (Wgrid + LANES - 1) // LANES
    Wp = XC * LANES
    g2 = jnp.pad(g2.astype(jnp.bfloat16),
                 ((0, 0), (0, H - H0), (0, 0), (0, Wp - W0)))
    rp = jnp.pad(P, ((0, 0), (0, 0), (0, Wp - Wgrid)), constant_values=0.0)
    qp = jnp.pad(Q, ((0, 0), (0, 0), (0, Wp - Wgrid)), constant_values=-1e9)
    if svals.ndim == 1:
        dmap = jnp.broadcast_to(
            svals.astype(jnp.float32)[:, None, None], (D, H, Wp))
    else:
        dmap = jnp.pad(svals.astype(jnp.float32),
                       ((0, 0), (0, 0), (0, Wp - Wgrid)))

    Ht2 = h + 2
    Wcan = -(-(w + 2) // LANES) * LANES
    NTS = min(NTS, Wcan // LANES)
    yb = jnp.clip(plan["ybase"], 0, Ht2 - (KY + 1))
    xtb = jnp.clip(plan["xtb"], 0, Wcan // LANES - NTS)
    hb = H // RB
    packed = (yb | (xtb << 16)).reshape(D * hb, 1, RB * XC)

    # channel splitting: the f32 canvas must fit VMEM
    if scatter_canvas_bytes(src_hw, C) > vmem_budget and C % 2 == 0:
        halves = [
            mosaic_scatter_px(g[..., s], P, Q, svals, plan, src_hw,
                              KY=KY, NTS=NTS, sx=sx, sy=sy,
                              vmem_budget=vmem_budget, interpret=interpret)
            for s in (slice(0, C // 2), slice(C // 2, C))]
        return jnp.concatenate(halves, axis=-1)

    row_spec = pl.BlockSpec((RB, Wp), lambda yy, di, *pf: (yy, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(hb, D),
        in_specs=[
            pl.BlockSpec((1, 1, RB * XC),
                         lambda yy, di, *pf: (di * hb + yy, 0, 0),
                         memory_space=pltpu.SMEM),
            row_spec, row_spec, row_spec,
            row_spec, row_spec, row_spec,
            pl.BlockSpec((1, RB, Wp), lambda yy, di, *pf: (di, yy, 0)),
            pl.BlockSpec((1, RB, C, Wp), lambda yy, di, *pf: (di, yy, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Ht2, C, Wcan),
                               lambda yy, di, *pf: (0, 0, 0)),
    )
    kern = functools.partial(
        _kernel_scatter_px, C=C, H=h, W=w, KY=KY, XC=XC, NTS=NTS,
        sx=sx, sy=sy)
    canvas = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Ht2, C, Wcan), jnp.float32),
        interpret=interpret,
    )(packed, rp[0], rp[1], rp[2], qp[0], qp[1], qp[2], dmap, g2)
    # canvas col = x + 1, row = y + 1; border rows/cols are the
    # out-of-image corner contributions the gather samples zeros for
    return jnp.transpose(canvas[1:h + 1, :, 1:w + 1], (0, 2, 1))


def _plan_fit_scatter(plan, KY):
    """Scatter dispatch: x1 = x0 + 1 needs one extra window column."""
    return (plan["yspan"] <= KY - 1) & (plan["xover"] <= -1)

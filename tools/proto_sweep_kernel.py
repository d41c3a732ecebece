"""Prototype: fused plane-sweep warp via Mosaic per-lane dynamic gather.

Capability probes (tools/probe_mosaic*.py) established on this TPU:
  * jnp.take_along_axis(win, idx, axis=-1) lowers to DynamicGatherOp for
    f32/int32 with lane extent EXACTLY 128, any sublane extent; idx shape
    must equal win shape; bf16 unsupported (pack pairs into int32).
  * dynamic major-dim indexing of a 3D VMEM ref works.

Kernel design (per source view):
  * XLA builds the 4C corner table (rows r,r+1 x cols x,x+1 channel-concat,
    zero ring) as bf16, packs channel pairs -> int32 [Ht, 2C, Wpad].
  * table resident in VMEM (headline size: 130 x 64 x 256 i32 = 8.5 MB).
  * grid (D, H, XC): per step compute the projection in-kernel from
    3 rot-planes + trans + depth scalar (VPU, ~20 ops/px), derive
    x0/y0/fx/fy/valid, compute the chunk's ybase by a valid-masked lane-min,
    gather the KY candidate rows with one 128-lane gather per row-tile +
    where-select across tiles, select by per-pixel iy, bitcast back to bf16
    [4C, 128], bilinear-combine to [C, 128], write out [D, H, C, W]
    (pixels in lanes: no C-minor padding).

Exactness domain: per-(d, row, 128-px chunk) source-row span <= KY-1 over
VALID pixels; x unconstrained (whole row resident). Fronto-parallel depth.

Usage: timeout 1200 python tools/proto_sweep_kernel.py
"""
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import sys
sys.path.insert(0, "/root/repo")

from wildmvs.ops.pallas_sweep import sweep_coords_from_projs
from wildmvs.ops.plane_sweep import plane_sweep_warp

KY = 2          # candidate source rows per output chunk
LANES = 128


def _kernel(depth_ref,            # scalar prefetch [D] f32
            rotx_ref, roty_ref, rotz_ref,   # VMEM [1, 1, Wpad] f32 (row y)
            table_ref,            # VMEM [Ht, C2, Wt*128] int32 (resident)
            out_ref,              # VMEM [1, 1, C, 128]
            *, C: int, H: int, W: int, Wt: int, Ht: int,
            tx: float, ty: float, tz: float):
    di = pl.program_id(0)
    xc = pl.program_id(2)
    d = depth_ref[di]

    # ---- projection (VPU): continuous source coords for the 128 px ----
    rx = rotx_ref[0, 0, pl.ds(xc * LANES, LANES)] * d + tx
    ry = roty_ref[0, 0, pl.ds(xc * LANES, LANES)] * d + ty
    rz = rotz_ref[0, 0, pl.ds(xc * LANES, LANES)] * d + tz
    xs = jnp.where(rz > 0, rx / rz, -10.0)
    ys = jnp.where(rz > 0, ry / rz, -10.0)

    # ---- bilinear corners (grid_sample_xy semantics: 1-px zero ring in the
    # table; valid top-left corners x0 in [-1, W-1], y0 in [-1, H-1]) ----
    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    fx = xs - x0f
    fy = ys - y0f
    valid = ((x0f >= -1.0) & (x0f <= float(W) - 1.0)
             & (y0f >= -1.0) & (y0f <= float(H) - 1.0))
    ix = jnp.clip(x0f + 1.0, 0.0, float(W + 1)).astype(jnp.int32)
    iy = jnp.clip(y0f + 1.0, 0.0, float(H + 1)).astype(jnp.int32)

    # chunk-local window base: min over valid pixels (invalid ones would
    # otherwise evict valid rows from the KY window)
    ybase = jnp.min(jnp.where(valid, iy, Ht))
    ybase = jnp.clip(ybase, 0, Ht - KY)
    iyl = jnp.clip(iy - ybase, 0, KY - 1)
    inwin = (iy - ybase) == iyl

    # ---- gather: KY candidate rows x Wt lane-tiles ----
    C2 = C * 2                    # int32-packed channel sublanes (4C bf16)
    idx = jnp.broadcast_to(ix[None], (C2, LANES))
    sel = None
    for r in range(KY):
        row = table_ref[ybase + r]          # [C2, Wt*128] int32
        g = None
        for t in range(Wt):
            tile = row[:, t * LANES:(t + 1) * LANES]
            loc = jnp.clip(idx - t * LANES, 0, LANES - 1)
            gt = jnp.take_along_axis(tile, loc, axis=1)
            if g is None:
                g = gt
            else:
                use = (idx >= t * LANES) & (idx < (t + 1) * LANES)
                g = jnp.where(use, gt, g)
        ok = jnp.broadcast_to((iyl == r)[None], (C2, LANES))
        sel = g if sel is None else jnp.where(ok, g, sel)

    # ---- unpack + bilinear combine ----
    quad = pltpu.bitcast(sel, jnp.bfloat16)          # [4C, 128]
    v = (valid & inwin).astype(jnp.float32)[None]
    fx = fx[None]
    fy = fy[None]
    w00 = ((1.0 - fy) * (1.0 - fx) * v).astype(jnp.bfloat16)
    w01 = ((1.0 - fy) * fx * v).astype(jnp.bfloat16)
    w10 = (fy * (1.0 - fx) * v).astype(jnp.bfloat16)
    w11 = (fy * fx * v).astype(jnp.bfloat16)
    out = (quad[0 * C:1 * C] * w00 + quad[1 * C:2 * C] * w01
           + quad[2 * C:3 * C] * w10 + quad[3 * C:4 * C] * w11)
    out_ref[0, 0] = out


def build_table(src: jnp.ndarray) -> jnp.ndarray:
    """bf16 [H, W, C] -> packed int32 [H+2, 2C, Wpad] corner table.

    Table row y, col x holds the 4 corners (source pixels (y-1..y, x-1..x))
    as 4C bf16 channels packed pairwise into 2C int32 sublanes; the pairing
    is along the corner-concat channel axis, which the in-kernel bitcast
    restores exactly.
    """
    h, w, c = src.shape
    p = jnp.pad(src.astype(jnp.bfloat16), ((1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], -1)  # [h+1,w+1,4C]
    quad = jnp.pad(quad, ((0, 1), (0, 1), (0, 0)))             # [h+2,w+2,4C]
    ht, wt = h + 2, w + 2
    wpad = ((wt + LANES - 1) // LANES) * LANES
    quad = jnp.pad(quad, ((0, 0), (0, wpad - wt), (0, 0)))
    # -> [Ht, 4C, Wpad] -> pack sublane pairs into int32 [Ht, 2C, Wpad].
    # pltpu.bitcast(int32 -> bf16) maps int32 sublane s to bf16 sublanes
    # (2s, 2s+1) as (low, high) 16-bit halves (probed on this TPU).
    quad = jnp.transpose(quad, (0, 2, 1))
    u16 = jax.lax.bitcast_convert_type(quad, jnp.uint16).astype(jnp.uint32)
    packed = u16[:, 0::2] | (u16[:, 1::2] << 16)
    return jax.lax.bitcast_convert_type(packed, jnp.int32)


def pallas_sweep(src, rot_xyz, trans, depths):
    """src [H,W,C] bf16; rot_xyz [3,H,W] f32; trans [3] f32; depths [D] f32
    -> [D, H, C, W] bf16."""
    H, W, C = src.shape
    D = depths.shape[0]
    XC = (W + LANES - 1) // LANES
    table = build_table(src)
    Ht, C2, Wpad = table.shape
    Wt = Wpad // LANES
    # pad lanes must come out INVALID (z<0 -> behind camera), or they would
    # drag the in-kernel valid-masked ybase
    rp = jnp.pad(rot_xyz, ((0, 0), (0, 0), (0, XC * LANES - W)),
                 constant_values=-1e9)
    rp = rp[:, :, None, :]                     # [3, H, 1, XCp]

    kern = functools.partial(
        _kernel, C=C, H=H, W=W, Wt=Wt, Ht=Ht,
        tx=float(trans[0]), ty=float(trans[1]), tz=float(trans[2]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(D, H, XC),
        in_specs=[
            pl.BlockSpec((1, 1, XC * LANES), lambda d, y, x, dv: (y, 0, 0)),
            pl.BlockSpec((1, 1, XC * LANES), lambda d, y, x, dv: (y, 0, 0)),
            pl.BlockSpec((1, 1, XC * LANES), lambda d, y, x, dv: (y, 0, 0)),
            pl.BlockSpec((Ht, C2, Wpad), lambda d, y, x, dv: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, C, LANES),
                               lambda d, y, x, dv: (d, y, 0, x)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, H, C, XC * LANES), jnp.bfloat16),
    )(depths, rp[0], rp[1], rp[2], table)[..., :W]


def main():
    from wildmvs.geometry.projective import pixel_grid

    H, W, C, D = 128, 160, 32, 192
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((H, W, C)), jnp.bfloat16)

    # realistic rig: small rotation + baseline (NOT translation-only, so the
    # y-span logic actually gets exercised)
    ang = 0.05
    Rz = np.array([[np.cos(ang), -np.sin(ang), 0],
                   [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    ax = 0.03
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)],
                   [0, np.sin(ax), np.cos(ax)]], np.float32)
    R_src = Rz @ Rx
    K = np.array([[180.0, 0, W / 2], [0, 180.0, H / 2], [0, 0, 1]], np.float32)
    ref_proj = np.eye(4, dtype=np.float32)
    ref_proj[:3, :3] = K
    src_proj = np.eye(4, dtype=np.float32)
    src_proj[:3, :3] = K @ R_src
    src_proj[:3, 3] = (K @ np.array([2.0, 0.5, 0.0], np.float32))
    src_proj = jnp.asarray(src_proj)
    ref_proj = jnp.asarray(ref_proj)
    depths = jnp.linspace(425.0, 935.0, D).astype(jnp.float32)

    # reference result via the exact gather path
    ref = plane_sweep_warp(src[None].astype(jnp.float32), src_proj[None],
                           ref_proj[None], depths[None], (H, W))[0]

    # kernel inputs
    proj = src_proj @ jnp.linalg.inv(ref_proj)
    rot, trans = proj[:3, :3], np.asarray(proj[:3, 3])
    grid = pixel_grid(H, W, jnp.float32)
    xyz = jnp.concatenate([grid, jnp.ones_like(grid[..., :1])], -1)
    rot_xyz = jnp.einsum("ij,hwj->ihw", rot, xyz)     # [3, H, W]

    # diagnostics: per-chunk y-span
    xs, ys = sweep_coords_from_projs(src_proj, ref_proj, depths, (H, W))
    y0p = jnp.floor(ys) + 1.0
    validp = ((jnp.floor(xs) >= -1) & (jnp.floor(xs) <= W - 1)
              & (jnp.floor(ys) >= -1) & (jnp.floor(ys) <= H - 1))
    big = jnp.float32(1e9)
    wp = ((W + LANES - 1) // LANES) * LANES
    y0p = jnp.pad(y0p, ((0, 0), (0, 0), (0, wp - W)))
    validp = jnp.pad(validp, ((0, 0), (0, 0), (0, wp - W)))
    y0c = y0p.reshape(D, H, -1, LANES)
    vc = validp.reshape(D, H, -1, LANES)
    ymin = jnp.min(jnp.where(vc, y0c, big), -1)
    ymax = jnp.max(jnp.where(vc, y0c, -big), -1)
    span = jnp.maximum(ymax - ymin, 0.0).max()
    print(f"max chunk y-span: {float(span)} (exact iff <= {KY - 1})",
          flush=True)

    out = pallas_sweep(src, rot_xyz, jnp.asarray(trans), depths)
    out_hw = jnp.transpose(out, (0, 1, 3, 2)).astype(jnp.float32)

    err = jnp.abs(out_hw - ref)
    denom = jnp.maximum(jnp.abs(ref), 1.0)
    rel = (err / denom).max()
    print(f"max abs err {float(err.max()):.5f}  max rel {float(rel):.5f}",
          flush=True)
    nz_ref = float((jnp.abs(ref) > 0).mean())
    nz_out = float((jnp.abs(out_hw) > 0).mean())
    print(f"nonzero frac ref {nz_ref:.4f} kernel {nz_out:.4f}", flush=True)

    # ---- timing: chained scan, host fetch fence ----
    trans_j = jnp.asarray(trans)

    @jax.jit
    def chain(src, rot_xyz, depths):
        def body(carry, eps):
            o = pallas_sweep(src + eps, rot_xyz, trans, depths)
            return carry + o.sum().astype(jnp.float32), None
        tot, _ = jax.lax.scan(
            body, jnp.zeros(()),
            (jnp.arange(20, dtype=jnp.bfloat16) * jnp.bfloat16(1e-3)))
        return tot

    float(chain(src, rot_xyz, depths))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(src, rot_xyz, depths))
        best = min(best, time.perf_counter() - t0)
    print(f"kernel warp: {best / 20 * 1e3:.2f} ms/view "
          f"(round-1 exact-gather baseline ~34 ms)", flush=True)

    # gather-path timing at identical config for a same-session comparison
    srcf = src.astype(jnp.bfloat16)

    @jax.jit
    def chain_g(srcf, depths):
        def body(carry, eps):
            o = plane_sweep_warp(srcf[None] + eps, src_proj[None],
                                 ref_proj[None], depths[None], (H, W))[0]
            return carry + o.sum().astype(jnp.float32), None
        tot, _ = jax.lax.scan(
            body, jnp.zeros(()),
            (jnp.arange(10, dtype=jnp.bfloat16) * jnp.bfloat16(1e-3)))
        return tot

    float(chain_g(srcf, depths))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain_g(srcf, depths))
        best = min(best, time.perf_counter() - t0)
    print(f"gather warp (bf16, same session): {best / 10 * 1e3:.2f} ms/view",
          flush=True)


if __name__ == "__main__":
    main()

"""Prototype round 2: variants matrix for the lane-gather sweep kernel.

Isolates the cost of: the in-kernel vector->scalar ybase reduce vs an
XLA-precomputed SMEM ybase; KY (candidate-row count) scaling; the dynamic
gathers themselves; and depth-pairing to amortize per-step overhead.

Usage: timeout 1800 python tools/proto_sweep_kernel2.py
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

LANES = 128


def build_table(src):
    h, w, c = src.shape
    p = jnp.pad(src.astype(jnp.bfloat16), ((1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]], -1)
    quad = jnp.pad(quad, ((0, 1), (0, 1), (0, 0)))
    ht, wt = h + 2, w + 2
    wpad = ((wt + LANES - 1) // LANES) * LANES
    quad = jnp.pad(quad, ((0, 0), (0, wpad - wt), (0, 0)))
    quad = jnp.transpose(quad, (0, 2, 1))
    u16 = jax.lax.bitcast_convert_type(quad, jnp.uint16).astype(jnp.uint32)
    packed = u16[:, 0::2] | (u16[:, 1::2] << 16)
    return jax.lax.bitcast_convert_type(packed, jnp.int32)


def _coords(rotx, roty, rotz, d, tx, ty, tz):
    rx = rotx * d + tx
    ry = roty * d + ty
    rz = rotz * d + tz
    xs = jnp.where(rz > 0, rx / rz, -10.0)
    ys = jnp.where(rz > 0, ry / rz, -10.0)
    return xs, ys


def _plan(xs, ys, H, W):
    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    fx = xs - x0f
    fy = ys - y0f
    valid = ((x0f >= -1.0) & (x0f <= float(W) - 1.0)
             & (y0f >= -1.0) & (y0f <= float(H) - 1.0))
    ix = jnp.clip(x0f + 1.0, 0.0, float(W + 1)).astype(jnp.int32)
    iy = jnp.clip(y0f + 1.0, 0.0, float(H + 1)).astype(jnp.int32)
    return ix, iy, fx, fy, valid


def _gather_combine(table_ref, ybase, ix, iy, fx, fy, valid,
                    C, Wt, KY, no_gather=False):
    C2 = C * 2
    iyl = jnp.clip(iy - ybase, 0, KY - 1)
    inwin = (iy - ybase) == iyl
    idx = jnp.broadcast_to(ix[None], (C2, LANES))
    sel = None
    for r in range(KY):
        row = table_ref[ybase + r]
        g = None
        for t in range(Wt):
            tile = row[:, t * LANES:(t + 1) * LANES]
            if no_gather:
                gt = tile
            else:
                loc = jnp.clip(idx - t * LANES, 0, LANES - 1)
                gt = jnp.take_along_axis(tile, loc, axis=1)
            if g is None:
                g = gt
            else:
                use = (idx >= t * LANES) & (idx < (t + 1) * LANES)
                g = jnp.where(use, gt, g)
        ok = jnp.broadcast_to((iyl == r)[None], (C2, LANES))
        sel = g if sel is None else jnp.where(ok, g, sel)
    quad = pltpu.bitcast(sel, jnp.bfloat16)
    v = (valid & inwin).astype(jnp.float32)[None]
    fx = fx[None]
    fy = fy[None]
    w00 = ((1.0 - fy) * (1.0 - fx) * v).astype(jnp.bfloat16)
    w01 = ((1.0 - fy) * fx * v).astype(jnp.bfloat16)
    w10 = (fy * (1.0 - fx) * v).astype(jnp.bfloat16)
    w11 = (fy * fx * v).astype(jnp.bfloat16)
    return (quad[0 * C:1 * C] * w00 + quad[1 * C:2 * C] * w01
            + quad[2 * C:3 * C] * w10 + quad[3 * C:4 * C] * w11)


def _kernel_smem_ybase(ybase_ref, depth_ref, rotx_ref, roty_ref, rotz_ref,
                       table_ref, out_ref, *, C, H, W, Wt, Ht, KY, DP, XC,
                       tx, ty, tz, no_gather=False):
    """ybase via scalar prefetch (XLA-precomputed); DP planes per step."""
    dd = pl.program_id(0)
    y = pl.program_id(1)
    xc = pl.program_id(2)
    for p in range(DP):
        d = depth_ref[dd * DP + p]
        xsl = pl.ds(xc * LANES, LANES)
        xs, ys = _coords(rotx_ref[0, 0, xsl], roty_ref[0, 0, xsl],
                         rotz_ref[0, 0, xsl], d, tx, ty, tz)
        ix, iy, fx, fy, valid = _plan(xs, ys, H, W)
        ybase = ybase_ref[((dd * DP + p) * pl.num_programs(1) + y) * XC + xc]
        out = _gather_combine(table_ref, ybase, ix, iy, fx, fy, valid,
                              C, Wt, KY, no_gather)
        out_ref[0, p, 0] = out


def _kernel_inmin(depth_ref, rotx_ref, roty_ref, rotz_ref,
                  table_ref, out_ref, *, C, H, W, Wt, Ht, KY, DP,
                  tx, ty, tz):
    """in-kernel vector->scalar ybase (the round-1 prototype behavior)."""
    di = pl.program_id(0)
    xc = pl.program_id(2)
    for p in range(DP):
        d = depth_ref[di * DP + p]
        xsl = pl.ds(xc * LANES, LANES)
        xs, ys = _coords(rotx_ref[0, 0, xsl], roty_ref[0, 0, xsl],
                         rotz_ref[0, 0, xsl], d, tx, ty, tz)
        ix, iy, fx, fy, valid = _plan(xs, ys, H, W)
        ybase = jnp.clip(jnp.min(jnp.where(valid, iy, Ht)), 0, Ht - KY)
        out = _gather_combine(table_ref, ybase, ix, iy, fx, fy, valid,
                              C, Wt, KY)
        out_ref[0, p, 0] = out


def make_sweep(KY=2, DP=1, mode="smem", no_gather=False):
    def sweep(src, rot_xyz, trans, depths, ybase):
        H, W, C = src.shape
        D = depths.shape[0]
        XC = (W + LANES - 1) // LANES
        table = build_table(src)
        Ht, C2, Wpad = table.shape
        Wt = Wpad // LANES
        rp = jnp.pad(rot_xyz, ((0, 0), (0, 0), (0, XC * LANES - W)),
                     constant_values=-1e9)[:, :, None, :]
        kw = dict(C=C, H=H, W=W, Wt=Wt, Ht=Ht, KY=KY, DP=DP,
                  tx=float(trans[0]), ty=float(trans[1]),
                  tz=float(trans[2]))
        if mode == "smem":
            kern = functools.partial(_kernel_smem_ybase, no_gather=no_gather,
                                     XC=XC, **kw)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(D // DP, H, XC),
                in_specs=[
                    pl.BlockSpec((1, 1, XC * LANES),
                                 lambda dd, y, x, yb, dv: (y, 0, 0)),
                    pl.BlockSpec((1, 1, XC * LANES),
                                 lambda dd, y, x, yb, dv: (y, 0, 0)),
                    pl.BlockSpec((1, 1, XC * LANES),
                                 lambda dd, y, x, yb, dv: (y, 0, 0)),
                    pl.BlockSpec((Ht, C2, Wpad),
                                 lambda dd, y, x, yb, dv: (0, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, DP, 1, C, LANES),
                    lambda dd, y, x, yb, dv: (dd, 0, y, 0, x)),
            )
            out = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (D // DP, DP, H, C, XC * LANES), jnp.bfloat16),
            )(ybase.reshape(-1), depths, rp[0], rp[1], rp[2], table)
            return out.reshape(D, H, C, XC * LANES)[..., :W]
        else:
            kern = functools.partial(_kernel_inmin, **kw)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(D // DP, H, XC),
                in_specs=[
                    pl.BlockSpec((1, 1, XC * LANES),
                                 lambda dd, y, x, dv: (y, 0, 0)),
                    pl.BlockSpec((1, 1, XC * LANES),
                                 lambda dd, y, x, dv: (y, 0, 0)),
                    pl.BlockSpec((1, 1, XC * LANES),
                                 lambda dd, y, x, dv: (y, 0, 0)),
                    pl.BlockSpec((Ht, C2, Wpad),
                                 lambda dd, y, x, dv: (0, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (1, DP, 1, C, LANES),
                    lambda dd, y, x, dv: (dd, 0, y, 0, x)),
            )
            out = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (D // DP, DP, H, C, XC * LANES), jnp.bfloat16),
            )(depths, rp[0], rp[1], rp[2], table)
            return out.reshape(D, H, C, XC * LANES)[..., :W]
    return sweep


def main():
    from wildmvs.geometry.projective import pixel_grid

    H, W, C, D = 128, 160, 32, 192
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((H, W, C)), jnp.bfloat16)

    # mild yaw+baseline rig: per-chunk y-span ~2 (within KY=4)
    ay = 0.02
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0],
                   [-np.sin(ay), 0, np.cos(ay)]], np.float32)
    K = np.array([[180.0, 0, W / 2], [0, 180.0, H / 2], [0, 0, 1]],
                 np.float32)
    ref_proj = np.eye(4, dtype=np.float32)
    ref_proj[:3, :3] = K
    src_proj = np.eye(4, dtype=np.float32)
    src_proj[:3, :3] = K @ Ry
    src_proj[:3, 3] = K @ np.array([2.0, 0.5, 0.0], np.float32)
    src_proj = jnp.asarray(src_proj)
    ref_proj = jnp.asarray(ref_proj)
    depths = jnp.linspace(425.0, 935.0, D).astype(jnp.float32)

    ref = plane_sweep_warp(src[None].astype(jnp.float32), src_proj[None],
                           ref_proj[None], depths[None], (H, W))[0]

    proj = src_proj @ jnp.linalg.inv(ref_proj)
    rot, trans = proj[:3, :3], np.asarray(proj[:3, 3])
    grid = pixel_grid(H, W, jnp.float32)
    xyz = jnp.concatenate([grid, jnp.ones_like(grid[..., :1])], -1)
    rot_xyz = jnp.einsum("ij,hwj->ihw", rot, xyz)

    # XLA-side ybase + span (per chunk)
    xs, ys = sweep_coords_from_projs(src_proj, ref_proj, depths, (H, W))
    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    validp = ((x0f >= -1) & (x0f <= W - 1) & (y0f >= -1) & (y0f <= H - 1))
    iy = jnp.clip(y0f + 1.0, 0.0, float(H + 1))
    XC = (W + LANES - 1) // LANES
    wp = XC * LANES
    iyp = jnp.pad(iy, ((0, 0), (0, 0), (0, wp - W)))
    vp = jnp.pad(validp, ((0, 0), (0, 0), (0, wp - W)))
    iyc = iyp.reshape(D, H, XC, LANES)
    vc = vp.reshape(D, H, XC, LANES)
    big = jnp.float32(1e9)
    ymin = jnp.min(jnp.where(vc, iyc, big), -1)
    ymax = jnp.max(jnp.where(vc, iyc, -big), -1)
    span = jnp.maximum(ymax - ymin, 0.0).max()
    print(f"max chunk y-span: {float(span)}", flush=True)
    Ht = H + 2
    ybase = jnp.clip(jnp.where(ymin > big / 2, 0.0, ymin),
                     0, Ht - 8).astype(jnp.int32)  # clip vs largest KY

    trans_j = jnp.asarray(trans)

    def check_and_time(name, KY, DP, mode, no_gather=False, iters=20):
        sweep = make_sweep(KY=KY, DP=DP, mode=mode, no_gather=no_gather)
        yb = jnp.clip(ybase, 0, Ht - KY)
        out = sweep(src, rot_xyz, trans, depths, yb)
        if not no_gather:
            out_hw = jnp.transpose(out, (0, 1, 3, 2)).astype(jnp.float32)
            err = float(jnp.abs(out_hw - ref).max())
        else:
            err = float("nan")

        @jax.jit
        def chain(src, rot_xyz, depths, yb):
            def body(carry, eps):
                o = sweep(src + eps, rot_xyz, trans, depths, yb)
                return carry + o.sum().astype(jnp.float32), None
            tot, _ = jax.lax.scan(
                body, jnp.zeros(()),
                (jnp.arange(iters, dtype=jnp.bfloat16) * jnp.bfloat16(1e-3)))
            return tot

        float(chain(src, rot_xyz, depths, yb))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(src, rot_xyz, depths, yb))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:32s} KY={KY} DP={DP}: {best / iters * 1e3:6.2f} ms/view"
              f"  max|err| {err:.4f}", flush=True)

    check_and_time("smem-ybase", 2, 1, "smem")
    check_and_time("smem-ybase", 4, 1, "smem")
    check_and_time("smem-ybase", 8, 1, "smem")
    check_and_time("smem-ybase DP2", 4, 2, "smem")
    check_and_time("smem-ybase DP4", 4, 4, "smem")
    check_and_time("in-kernel min", 4, 1, "inmin")
    check_and_time("no-gather floor", 4, 1, "smem", no_gather=True)
    check_and_time("no-gather floor", 2, 1, "smem", no_gather=True)


if __name__ == "__main__":
    main()

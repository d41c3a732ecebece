"""Prototype round 3: row-vectorized lane-gather sweep kernel.

Round-2 findings (proto_sweep_kernel2.py):
  * prefetched ybase beats the in-kernel vector->scalar min by ~10 ms
  * the no-gather floor (11-12 ms) dominates: per-step overhead + [1,128]
    plan math wasting 7/8 sublanes of every vreg
  * depth-packing (DP=4) amortizes per-step overhead: 19.2 -> 13.2 ms

This round: process 8 output ROWS x full padded width per grid step, so all
per-pixel plan math (coords, floors, validity, weights) runs on full
[8, Wp] vregs; gathers/selects stay per (row, chunk). Grid shrinks to
(D/DP, H/8).

Usage: timeout 1800 python tools/proto_sweep_kernel3.py
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
RB = 8          # output rows per grid step


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


def _kernel(ybase_ref,            # prefetch [D*H*XC] int32 (per ROW)
            depth_ref,            # prefetch [D] f32
            rotx_ref, roty_ref, rotz_ref,   # VMEM [RB, Wp] f32 (row block)
            table_ref,            # VMEM [Ht, C2, Wt*128] int32 (resident)
            out_ref,              # VMEM [DP, RB, C, Wp]
            ix_s, iy_s, w00_s, w01_s, w10_s, w11_s,   # scratch [RB, Wp]
            *, C, H, W, Wt, Ht, KY, DP, XC, HB,
            tx, ty, tz, no_gather=False, write_only=False):
    dd = pl.program_id(0)
    yy = pl.program_id(1)
    C2 = C * 2

    rotx = rotx_ref[:]            # [RB, Wp]
    roty = roty_ref[:]
    rotz = rotz_ref[:]

    for p in range(DP):
        d = depth_ref[dd * DP + p]
        if write_only:
            for r in range(RB):
                for xc in range(XC):
                    out_ref[0, p, r, :, pl.ds(xc * LANES, LANES)] = (
                        jnp.zeros((C, LANES), jnp.bfloat16))
            continue
        # ---- vectorized plan over the whole [RB, Wp] block, staged
        # through VMEM scratch so the per-chunk slices come back at a
        # clean (offset-0) layout — direct vector slices at lane offsets
        # cannot be broadcast by Mosaic ----
        rx = rotx * d + tx
        ry = roty * d + ty
        rz = rotz * d + tz
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

        # ---- per (row, chunk): gathers + selects + combine ----
        for r in range(RB):
            for xc in range(XC):
                ls = pl.ds(xc * LANES, LANES)
                ix = ix_s[r, ls]
                iy = iy_s[r, ls]
                ybase = ybase_ref[
                    ((dd * DP + p) * H + yy * RB + r) * XC + xc]
                iyl = jnp.clip(iy - ybase, 0, KY - 1)
                inwin = (iy - ybase) == iyl
                idx = jnp.broadcast_to(ix[None], (C2, LANES))
                sel = None
                for k in range(KY):
                    row = table_ref[ybase + k]
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
                    ok = jnp.broadcast_to((iyl == k)[None], (C2, LANES))
                    sel = g if sel is None else jnp.where(ok, g, sel)
                quad = pltpu.bitcast(sel, jnp.bfloat16)
                mask = inwin.astype(jnp.bfloat16)[None]
                out = (quad[0 * C:1 * C] * w00_s[r, ls][None]
                       + quad[1 * C:2 * C] * w01_s[r, ls][None]
                       + quad[2 * C:3 * C] * w10_s[r, ls][None]
                       + quad[3 * C:4 * C] * w11_s[r, ls][None]) * mask
                out_ref[0, p, r, :, pl.ds(xc * LANES, LANES)] = out


def make_sweep(KY=2, DP=1, no_gather=False, write_only=False):
    def sweep(src, rot_xyz, trans, depths, ybase):
        H, W, C = src.shape
        D = depths.shape[0]
        XC = (W + LANES - 1) // LANES
        Wp = XC * LANES
        HB = H // RB
        table = build_table(src)
        Ht, C2, Wpad = table.shape
        Wt = Wpad // LANES
        rp = jnp.pad(rot_xyz, ((0, 0), (0, 0), (0, Wp - W)),
                     constant_values=-1e9)

        kern = functools.partial(
            _kernel, C=C, H=H, W=W, Wt=Wt, Ht=Ht, KY=KY, DP=DP, XC=XC,
            HB=HB, tx=float(trans[0]), ty=float(trans[1]),
            tz=float(trans[2]), no_gather=no_gather, write_only=write_only)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(D // DP, HB),
            in_specs=[
                pl.BlockSpec((RB, Wp), lambda dd, yy, yb, dv: (yy, 0)),
                pl.BlockSpec((RB, Wp), lambda dd, yy, yb, dv: (yy, 0)),
                pl.BlockSpec((RB, Wp), lambda dd, yy, yb, dv: (yy, 0)),
                pl.BlockSpec((Ht, C2, Wpad), lambda dd, yy, yb, dv: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, DP, RB, C, Wp), lambda dd, yy, yb, dv: (dd, 0, yy, 0, 0)),
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
            out_shape=jax.ShapeDtypeStruct((D // DP, DP, H // RB * RB, C, Wp),
                                           jnp.bfloat16),
        )(ybase.reshape(-1), depths, rp[0], rp[1], rp[2], table)
        return out.reshape(D, H, C, Wp)[..., :W]
    return sweep


def main():
    from wildmvs.geometry.projective import pixel_grid

    H, W, C, D = 128, 160, 32, 192
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((H, W, C)), jnp.bfloat16)

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

    # ybase per (d, y, chunk), UNclipped min (clip per KY at use site)
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
    ymin = jnp.where(ymin > big / 2, 0.0, ymin)

    def check_and_time(name, KY, DP, iters=20, **mkw):
        sweep = make_sweep(KY=KY, DP=DP, **mkw)
        yb = jnp.clip(ymin, 0, Ht - KY).astype(jnp.int32)
        out = sweep(src, rot_xyz, trans, depths, yb)
        if not mkw:
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
        print(f"{name:28s} KY={KY} DP={DP}: {best / iters * 1e3:6.2f} ms/view"
              f"  max|err| {err:.4f}", flush=True)

    check_and_time("rowvec", 2, 1)
    check_and_time("rowvec", 2, 2)
    check_and_time("rowvec", 2, 4)
    check_and_time("rowvec", 4, 1)
    check_and_time("rowvec", 4, 2)
    check_and_time("rowvec no-gather", 2, 1, no_gather=True)
    check_and_time("rowvec write-only", 2, 1, write_only=True)


if __name__ == "__main__":
    main()

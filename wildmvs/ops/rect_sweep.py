"""Rectified (H_inf-factored) plane-sweep — the cheap-window kernel regime
for ANY rig geometry.

Why: under realistic DTU eval geometry the per-chunk source-row spans of
the direct sweep reach yspan 7 / xover 6 (tools/eval_span_study.py), so
the streamed Mosaic kernels must run their KY=8 x NT=3 window — 24 lane-
gathers per (row, 128-px chunk, plane, view) — and the cost-volume stage
dominates the full-res eval forward (504 of 582 ms, BASELINE.md round 3).
Those spans are entirely ROTATION: factoring the depth-independent
infinite homography out of the warp leaves an epipole-directed residual
whose row coordinate is CONSTANT along every image row.

Math (MVSNet convention, models/MVSNet/module.py:127-155 semantics): with
T = src_proj @ inv(ref_proj) = [A | b], the source match of ref pixel x~
at depth d is x_s ~ A x~ d + b = A (x~ + e s),  e = A^-1 b,  s = 1/d.
Resampling the source features ONCE by A (src_rect(u) = src(A u),
bilinear) turns the per-depth warp into
    u = (x~ + e s) / (1 + e_z s)
— affine-in-s per pixel (the px kernel's native form) with CONSTANT
P planes (e) and Q = the pixel grid:
  * u_y is constant across every row  ->  per-chunk yspan == 0 for
    uniform hypotheses: the KY=2 corner-table window is always exact.
  * du/dx = 1/(1 + e_z s) ~ 1        ->  per-chunk x-extent ~127 px:
    a 2..3-tile window covers it regardless of baseline.
Gathers per chunk drop from 24 to 4-6 — measured ~4x on the full-res
cost-volume stage.

Approximation: src_rect is itself bilinear-resampled, so the sweep
samples a once-interpolated image (double interpolation ~ a mild low-pass
vs the reference's single gather); and matches whose rectified coordinate
u falls outside the margin-expanded canvas sample zeros even when the
original coordinate A u is inside the source (data loss confined to a
border band of width ~margin at near depths).  Quality impact is
measured in tests/test_rect_sweep.py (cost-volume argmin parity) and
tools/verify_drive.py-style EPE; the exact gather fallback still backs
every dispatch, and sweep_method="mosaic"/"gather" keep the exact paths.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .mosaic_sweep import (
    LANES,
    RB,
    TIER_B,
    _plan_fit,
    mosaic_sweep_warp_px,
    sweep_spans_px,
    tier_b_kr,
)


def rect_decompose(src_proj: jnp.ndarray, ref_proj: jnp.ndarray):
    """(A, e) of the H_inf factoring (single view, [4,4] projections).

    A is the ref->src infinite homography at the sweep grid's resolution;
    e = A^-1 b the epipole-directed residual direction (s = 1/depth)."""
    T = (src_proj @ jnp.linalg.inv(ref_proj)).astype(jnp.float32)
    A, b = T[:3, :3], T[:3, 3]
    e = jnp.linalg.solve(A, b)
    return A, e


def rect_margin(ref_hw: tuple[int, int]) -> int:
    """Default canvas margin: covers typical DTU near-depth disparities
    (~f*|t|/dmin = O(100 px) at 1/4 feature res) without letting the
    expanded table dwarf the windows at small grids."""
    h, w = ref_hw
    return int(min(128, max(32, (min(h, w) // 2) // 8 * 8)))


def rect_planes(e: jnp.ndarray, ref_hw: tuple[int, int], margin: int):
    """(P, Q) [3, H, W] planes of the residual sweep in CANVAS coords:
    u' = ((x~ + M) + (e_xy + M e_z) s) / (1 + e_z s)."""
    from ..geometry.projective import pixel_grid
    rh, rw = ref_hw
    grid = pixel_grid(rh, rw, jnp.float32)
    gx = grid[..., 0] + margin
    gy = grid[..., 1] + margin
    ones = jnp.ones_like(gx)
    P = jnp.stack([jnp.broadcast_to(e[0] + margin * e[2], gx.shape),
                   jnp.broadcast_to(e[1] + margin * e[2], gx.shape),
                   jnp.broadcast_to(e[2], gx.shape)])
    Q = jnp.stack([gx, gy, ones])
    return P, Q


def rect_resample(src: jnp.ndarray, A: jnp.ndarray, ref_hw: tuple[int, int],
                  margin: int) -> jnp.ndarray:
    """Source features resampled by the infinite homography onto the
    margin-expanded ref-aligned canvas: out[v+M, u+M] = src(A (u, v, 1))
    (bilinear, border-zero — grid_sample zeros match the sweep kernels'
    invalid-sample convention)."""
    from ..geometry.projective import pixel_grid
    from .grid_sample import grid_sample_xy
    h, w, _ = src.shape
    rh, rw = ref_hw
    hm, wm = rh + 2 * margin, rw + 2 * margin
    grid = pixel_grid(hm, wm, jnp.float32)
    ux = grid[..., 0] - margin
    uy = grid[..., 1] - margin
    A = A.astype(jnp.float32)
    z = A[2, 0] * ux + A[2, 1] * uy + A[2, 2]
    zs = jnp.where(z > 0, z, 1.0)
    gx = jnp.where(z > 0, (A[0, 0] * ux + A[0, 1] * uy + A[0, 2]) / zs,
                   -10.0)
    gy = jnp.where(z > 0, (A[1, 0] * ux + A[1, 1] * uy + A[1, 2]) / zs,
                   -10.0)
    # unnormalized pixel coords -> align_corners=True NDC (module.py:164)
    gxn = 2.0 * gx / (w - 1.0) - 1.0
    gyn = 2.0 * gy / (h - 1.0) - 1.0
    return grid_sample_xy(src, gxn, gyn, align_corners=True)


def rect_cost_volume(feats_l, proj, ref_depths, ref_hw,
                     agg: str = "variance", temp=None,
                     margin: int | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """Aggregated cost volume via the rectified sweep, exact fallback.

    Args mirror mosaic_sweep.cost_volume_mosaic's per-list form:
      feats_l: list of [B, h, w, C] bf16 features, REFERENCE FIRST.
      proj: [B, N, 4, 4] projections at the sweep grid's resolution,
        same order (MVSNet s=depth convention; rect converts to s=1/d).
      ref_depths: [B, D] or [B, D, H, W] hypothesis DEPTHS.
      ref_hw: (H, W) sweep grid (the reference view's feature grid).
    Returns [B, D, H, W, C].

    Dispatch per batch element, one cond tree around the whole
    aggregation: KY=2/NT=2 rect window -> KY=2/NT=3 -> exact gather
    (original projections — the fallback is bit-identical to the
    non-rect paths')."""
    b = feats_l[0].shape[0]
    return jnp.stack([
        _rect_agg_perview(feats_l, proj, ref_depths, ref_hw, bb,
                          agg=agg, temp=temp, margin=margin,
                          interpret=interpret)
        for bb in range(b)])


def _rect_agg_perview(feats_l, proj, ref_depths, ref_hw, bb,
                      agg="variance", temp=None, margin=None,
                      interpret=False) -> jnp.ndarray:
    from .plane_sweep import plane_sweep_warp
    from .volumes import (depth_chunked_volume, gather_chunk_planes,
                          softmin_cost_volume, variance_cost_volume)

    n = len(feats_l)
    H, W = ref_hw
    c = feats_l[0].shape[-1]
    M = rect_margin(ref_hw) if margin is None else margin
    Hm, Wm = H + 2 * M, W + 2 * M
    Ht = Hm + 2
    KR = tier_b_kr((Hm, Wm), c)
    num_depth = ref_depths.shape[1]
    dtype = feats_l[0].dtype

    db = ref_depths[bb]
    svals = 1.0 / db.astype(jnp.float32)
    rp = proj[bb, 0]
    views, okA, okB = [], None, None
    for i in range(1, n):
        A, e = rect_decompose(proj[bb, i], rp)
        P, Q = rect_planes(e, ref_hw, M)
        planA = sweep_spans_px(P, Q, svals, (Hm, Wm))
        planB = sweep_spans_px(P, Q, svals, (Hm, Wm), nt=TIER_B["NT"])
        views.append((i, A, P, Q, planA, planB))
        fitA = _plan_fit(planA, 2, KR, 2, Ht)
        fitB = _plan_fit(planB, 2, KR, TIER_B["NT"], Ht)
        okA = fitA if okA is None else okA & fitA
        okB = fitB if okB is None else okB & fitB

    def kernel_branch(tier):
        def fn():
            ref_v = jnp.transpose(feats_l[0][bb],
                                  (0, 2, 1))[None].astype(jnp.float32)
            vol_sum = vol_sq = sum_exp = sum_val = None
            for i, A, P, Q, planA, planB in views:
                plan, nt = ((planA, 2) if tier == 0
                            else (planB, TIER_B["NT"]))
                src_rect = rect_resample(feats_l[i][bb], A, ref_hw, M)
                warped = mosaic_sweep_warp_px(
                    src_rect, P, Q, svals, plan, KY=2, KR=KR, NT=nt,
                    interpret=interpret).astype(jnp.float32)  # [D,H,C,W]
                if agg == "variance":
                    sq = warped ** 2
                    vol_sum = (warped if vol_sum is None
                               else vol_sum + warped)
                    vol_sq = sq if vol_sq is None else vol_sq + sq
                else:                                  # softmin
                    diff = (ref_v - warped) ** 2
                    e2 = jnp.exp(-temp * jnp.sum(diff, axis=2,
                                                 keepdims=True))
                    sum_exp = e2 if sum_exp is None else sum_exp + e2
                    cont = e2 * diff
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
        h, w = feats_l[1].shape[1:3]

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

    if KR < 2:
        return gather_branch()
    return jax.lax.cond(
        okA, kernel_branch(0),
        lambda: jax.lax.cond(okB, kernel_branch(1), gather_branch))

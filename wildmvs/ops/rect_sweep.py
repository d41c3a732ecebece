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
    """Default canvas margin.  With the per-view mid-sweep recentering
    (rect_shift) the canvas only has to cover HALF the disparity SPREAD
    |e|*(s_max - s_min) (~65 px at 12-deg DTU eval pairs, /4 feature res)
    — not the full near-depth disparity — so 96 px is ample, and the
    narrower canvas raises the streamed window's scoped-VMEM KR budget
    (the full-parallax wspan ~73 rows must fit KR - KY)."""
    h, w = ref_hw
    return int(min(96, max(32, (min(h, w) // 2) // 8 * 8)))


def rect_shift(e: jnp.ndarray, svals: jnp.ndarray,
               ref_hw: tuple[int, int], offset: float = 0.0):
    """Integer per-view canvas recentering: the mid-sweep disparity of the
    grid-center pixel, round()ed so a pure-translation rig (A == I) still
    resamples on the integer grid (bit-exactness preserved).

    delta(s) = u(s) - x_c = (e_xy - x_c e_z) s / (1 + e_z s); the shift is
    the midpoint of delta at the sweep's s extremes.  `offset` is the
    caller's pixel-center offset (0.0 MVSNet grid, 0.5 Vis) so the center
    estimate matches the grid rect_planes actually sweeps."""
    rh, rw = ref_hw
    xc = jnp.array([(rw - 1) / 2.0 + offset,
                    (rh - 1) / 2.0 + offset], jnp.float32)
    s_lo = jnp.min(svals).astype(jnp.float32)
    s_hi = jnp.max(svals).astype(jnp.float32)

    def delta(s):
        den = 1.0 + e[2] * s
        den = jnp.where(jnp.abs(den) > 1e-6, den, 1.0)
        return (e[:2] - xc * e[2]) * s / den

    return jnp.round((delta(s_lo) + delta(s_hi)) / 2.0)


def rect_planes(e: jnp.ndarray, ref_hw: tuple[int, int], margin: int,
                shift=None, offset: float = 0.0):
    """(P, Q) [3, H, W] planes of the residual sweep in CANVAS coords:
    U = ((x~ - shift + M) + (e_xy - (shift - M) e_z) s) / (1 + e_z s).
    offset: ref pixel-center offset (0.0 MVSNet grid, 0.5 Vis)."""
    from ..geometry.projective import pixel_grid
    rh, rw = ref_hw
    sx, sy = ((jnp.zeros(()), jnp.zeros(())) if shift is None
              else (shift[0], shift[1]))
    grid = pixel_grid(rh, rw, jnp.float32, offset=offset)
    gx = grid[..., 0] - sx + margin
    gy = grid[..., 1] - sy + margin
    ones = jnp.ones_like(gx)
    P = jnp.stack([jnp.broadcast_to(e[0] - (sx - margin) * e[2], gx.shape),
                   jnp.broadcast_to(e[1] - (sy - margin) * e[2], gx.shape),
                   jnp.broadcast_to(e[2], gx.shape)])
    Q = jnp.stack([gx, gy, ones])
    return P, Q


def rect_coverage_ok(e: jnp.ndarray, A: jnp.ndarray, svals: jnp.ndarray,
                     ref_hw: tuple[int, int], margin: int,
                     src_hw: tuple[int, int], shift,
                     offset: float = 0.0) -> jnp.ndarray:
    """Scalar bool: every probed sweep sample that the exact gather would
    find INSIDE the source image also lands on the margin-expanded canvas.

    The canvas masks out-of-range samples to zero, so a rig whose residual
    disparity spread exceeds the margin would otherwise degrade silently
    where the gather is still valid (advisor r3).  Probed on a sparse
    pixel grid x the s extremes: the residual u(s) is affine in the pixel
    per axis (extremes at grid corners) and monotone in s between the
    extremes wherever the denominator keeps its sign, so corner/extreme
    probing bounds the interior to grid resolution.

    Degenerate denominators fail CLOSED (advisor r4): den = 1 + e_z s is
    linear in s and pixel-independent, so requiring den > 1e-6 at BOTH s
    extremes guarantees den > 1e-6 (and sign-constant) over the whole
    sweep — which is exactly the precondition for the extremes-bound-the-
    interior argument above.  A rig where den crosses zero inside the
    sweep range therefore dispatches to the exact gather instead of
    silently weakening the probe constraint."""
    rh, rw = ref_hw
    h, w = src_hw
    n_probe = 8
    px = jnp.linspace(offset, rw - 1 + offset, n_probe, dtype=jnp.float32)
    py = jnp.linspace(offset, rh - 1 + offset, n_probe, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(px, py)                      # [P, P]
    s_ext = jnp.stack([jnp.min(svals), jnp.max(svals)]
                      ).astype(jnp.float32)[:, None, None]
    den = 1.0 + e[2] * s_ext
    valid_den = den > 1e-6
    den_ok = jnp.all(valid_den)          # fail closed on degenerate/sign-
    dens = jnp.where(valid_den, den, 1.0)  # changing denominators
    ux = (gx[None] + e[0] * s_ext) / dens              # rectified coords
    uy = (gy[None] + e[1] * s_ext) / dens
    # the exact gather's source coordinate: A u (perspective).  z <= 1e-6
    # probes are genuinely not-in-source for the EXACT gather too (behind-
    # camera -> -10 sentinel -> border zero, module.py:147-155), so
    # excluding them from the constraint matches the baseline semantics.
    A = A.astype(jnp.float32)
    z = A[2, 0] * ux + A[2, 1] * uy + A[2, 2]
    zok = z > 1e-6
    zs = jnp.where(zok, z, 1.0)
    vx = (A[0, 0] * ux + A[0, 1] * uy + A[0, 2]) / zs
    vy = (A[1, 0] * ux + A[1, 1] * uy + A[1, 2]) / zs
    src_in = (zok & valid_den & (vx >= 0) & (vx <= w - 1)
              & (vy >= 0) & (vy <= h - 1))
    # the canvas coordinate of the same sample: u - shift + margin
    cx = ux - shift[0] + margin
    cy = uy - shift[1] + margin
    hm, wm = rh + 2 * margin, rw + 2 * margin
    canvas_in = ((cx >= 0) & (cx <= wm - 1) & (cy >= 0) & (cy <= hm - 1))
    return den_ok & jnp.all(jnp.logical_or(~src_in, canvas_in))


def _rect_resample_body(src, A, ref_hw, margin, shift, norm: str):
    """Shared projective canvas resample; `norm` picks the pixel->NDC
    convention (the ONLY difference between the MVSNet and Vis arms)."""
    from ..geometry.projective import pixel_grid
    from .grid_sample import grid_sample_xy
    h, w, _ = src.shape
    rh, rw = ref_hw
    hm, wm = rh + 2 * margin, rw + 2 * margin
    sx, sy = ((0.0, 0.0) if shift is None else (shift[0], shift[1]))
    grid = pixel_grid(hm, wm, jnp.float32)
    ux = grid[..., 0] - margin + sx
    uy = grid[..., 1] - margin + sy
    A = A.astype(jnp.float32)
    z = A[2, 0] * ux + A[2, 1] * uy + A[2, 2]
    zs = jnp.where(z > 0, z, 1.0)
    gx = jnp.where(z > 0, (A[0, 0] * ux + A[0, 1] * uy + A[0, 2]) / zs,
                   -10.0)
    gy = jnp.where(z > 0, (A[1, 0] * ux + A[1, 1] * uy + A[1, 2]) / zs,
                   -10.0)
    if norm == "mvsnet":
        # unnormalized pixel coords -> align_corners=True NDC (module.py:164)
        gxn = 2.0 * gx / (w - 1.0) - 1.0
        gyn = 2.0 * gy / (h - 1.0) - 1.0
    else:                                              # "vis"
        # homography_sweep_warp chain: x / size * 2 - 1 into align_corners
        # (the net (size-1)/size pixel scale), +-1.1 clip
        gxn = jnp.clip(gx / w * 2.0 - 1.0, -1.1, 1.1)
        gyn = jnp.clip(gy / h * 2.0 - 1.0, -1.1, 1.1)
    return grid_sample_xy(src, gxn, gyn, align_corners=True)


def rect_resample(src: jnp.ndarray, A: jnp.ndarray, ref_hw: tuple[int, int],
                  margin: int, shift=None) -> jnp.ndarray:
    """Source features resampled by the infinite homography onto the
    margin-expanded, shift-recentered ref-aligned canvas:
    out[v+M, u+M] = src(A (u + shift_x, v + shift_y, 1))
    (bilinear, border-zero — grid_sample zeros match the sweep kernels'
    invalid-sample convention)."""
    return _rect_resample_body(src, A, ref_hw, margin, shift, "mvsnet")


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
        shift = rect_shift(e, svals, ref_hw)
        P, Q = rect_planes(e, ref_hw, M, shift)
        planA = sweep_spans_px(P, Q, svals, (Hm, Wm))
        planB = sweep_spans_px(P, Q, svals, (Hm, Wm), nt=TIER_B["NT"])
        views.append((i, A, shift, P, Q, planA, planB))
        cover = rect_coverage_ok(e, A, svals, ref_hw, M,
                                 feats_l[i].shape[1:3], shift)
        fitA = _plan_fit(planA, 2, KR, 2, Ht) & cover
        fitB = _plan_fit(planB, 2, KR, TIER_B["NT"], Ht) & cover
        okA = fitA if okA is None else okA & fitA
        okB = fitB if okB is None else okB & fitB

    def kernel_branch(tier):
        def fn():
            ref_v = jnp.transpose(feats_l[0][bb],
                                  (0, 2, 1))[None].astype(jnp.float32)
            vol_sum = vol_sq = sum_exp = sum_val = None
            for i, A, shift, P, Q, planA, planB in views:
                plan, nt = ((planA, 2) if tier == 0
                            else (planB, TIER_B["NT"]))
                src_rect = rect_resample(feats_l[i][bb], A, ref_hw, M,
                                         shift)
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


# ---------------------------------------------------------------------------
# Vis-MVSNet arm: the homography convention factors identically.
#
# homography_sweep_warp (ops/plane_sweep.py:203, parity model_cas.py:176-187)
# computes coords_hom = A p - (B p) s with s = 1/(d + 1e-9) and
# B = K_s R_s (c_rel f^T) R_r^T K_r^-1.  Because f = ref fronto row and the
# third row of K_r^-1 is (0, 0, 1), the per-pixel scalar f^T R_r^T K_r^-1 p
# is 1 for every pixel, so B p == A e with the CONSTANT vector
# e = K_r R_r c_rel:  coords_hom = A (p - e s).  Resampling the source once
# by A leaves the same epipole-directed residual sweep as the MVSNet arm
# (sign-folded e), with the Vis (size-1)/size sampling scale folded into
# the canvas resample.
# ---------------------------------------------------------------------------


def vis_rect_decompose(K_ref, R_ref, t_ref, K_src, R_src, t_src):
    """(A, e) for the Vis homography convention (single view, unbatched):
    coords_hom = A (p + e s), s = 1/(d + 1e-9), with the sign already
    folded so rect_planes/rect_shift (u = (p + e s)/(1 + e_z s)) apply."""
    K_ref_inv = jnp.linalg.inv(K_ref)
    R_ref_T = jnp.swapaxes(R_ref, -1, -2)
    A = (K_src @ R_src @ R_ref_T @ K_ref_inv).astype(jnp.float32)
    c_rel = (-jnp.swapaxes(R_src, -1, -2) @ t_src) - (-R_ref_T @ t_ref)
    e = (K_ref @ R_ref @ c_rel)[:, 0].astype(jnp.float32)
    return A, -e


def vis_rect_resample(src: jnp.ndarray, A: jnp.ndarray,
                      ref_hw: tuple[int, int], margin: int,
                      shift=None) -> jnp.ndarray:
    """Canvas resample for the Vis convention: canvas pixel U samples the
    source at proj(A [U - M + shift, 1]) through the
    homography_sweep_warp normalization chain (x / size * 2 - 1 into an
    align_corners grid_sample — the net (size-1)/size pixel scale),
    border-zero."""
    return _rect_resample_body(src, A, ref_hw, margin, shift, "vis")


def rect_gwc_volume(src, ref_feat, K_ref, R_ref, t_ref, K_src, R_src,
                    t_src, depth_num: int, depth_start, depth_interval,
                    ref_hw, groups: int = 8, margin: int | None = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Vis-MVSNet per-pair warp + group-wise correlation via the rectified
    sweep (drop-in for mosaic_sweep.homography_gwc_volume_mosaic — same
    args, same [B, D, H, W, groups] result, same exact-gather fallback).

    The px kernel runs in the KY=2 cheap-window regime on the recentered
    canvas; per-pixel depth_start maps (cascade stages 2-3) keep per-pixel
    svals, so yspan is only zero for the uniform stage-1 slab — the span
    cond still dispatches exactly."""
    from .mosaic_sweep import mosaic_sweep_warp_px_gwc
    from .plane_sweep import homography_sweep_warp
    from .volumes import groupwise_correlation
    b, h, w, C = src.shape
    rh, rw = ref_hw
    M = rect_margin(ref_hw) if margin is None else margin
    Hm, Wm = rh + 2 * M, rw + 2 * M
    Ht = Hm + 2
    KRw = tier_b_kr((Hm, Wm), C)
    steps = jnp.arange(depth_num, dtype=jnp.float32).reshape(depth_num,
                                                             1, 1)
    outs = []
    for bb in range(b):
        A, e = vis_rect_decompose(K_ref[bb], R_ref[bb], t_ref[bb],
                                  K_src[bb], R_src[bb], t_src[bb])
        start = depth_start[bb, 0].astype(jnp.float32)
        interval = depth_interval[bb, 0, 0, 0].astype(jnp.float32)
        depth = start[None] + interval * steps
        svals = 1.0 / (depth + 1e-9)
        if svals.shape[1] == 1:
            svals = svals[:, 0, 0]
        else:
            svals = jnp.broadcast_to(svals, (depth_num, rh, rw))
        shift = rect_shift(e, svals, ref_hw, offset=0.5)
        P, Q = rect_planes(e, ref_hw, M, shift, offset=0.5)
        planA = sweep_spans_px(P, Q, svals, (Hm, Wm))
        planB = sweep_spans_px(P, Q, svals, (Hm, Wm), nt=TIER_B["NT"])
        cover = rect_coverage_ok(e, A, svals, ref_hw, M, (h, w), shift,
                                 offset=0.5)
        okA = _plan_fit(planA, 2, KRw, 2, Ht) & cover
        okB = _plan_fit(planB, 2, KRw, TIER_B["NT"], Ht) & cover
        ref_chw = jnp.transpose(ref_feat[bb], (0, 2, 1))   # [H, C, W]

        def kern(plan, nt, bb=bb, A=A, shift=shift, P=P, Q=Q, svals=svals,
                 ref_chw=ref_chw):
            def fn():
                src_rect = vis_rect_resample(src[bb], A, ref_hw, M, shift)
                out = mosaic_sweep_warp_px_gwc(
                    src_rect, ref_chw, P, Q, svals, plan, groups=groups,
                    KY=2, KR=KRw, NT=nt, interpret=interpret)
                return jnp.transpose(out, (0, 1, 3, 2)).astype(src.dtype)
            return fn

        def fallback(bb=bb):
            warped = homography_sweep_warp(
                src[bb:bb + 1], K_ref[bb:bb + 1], R_ref[bb:bb + 1],
                t_ref[bb:bb + 1], K_src[bb:bb + 1], R_src[bb:bb + 1],
                t_src[bb:bb + 1], depth_num, depth_start[bb:bb + 1],
                depth_interval[bb:bb + 1], ref_hw)[0]
            return groupwise_correlation(
                jnp.broadcast_to(ref_feat[bb][None], warped.shape),
                warped, groups).astype(src.dtype)

        if KRw < 2:
            outs.append(fallback())
        else:
            outs.append(jax.lax.cond(
                okA, kern(planA, 2),
                lambda okB=okB, pB=planB: jax.lax.cond(
                    okB, kern(pB, TIER_B["NT"]), fallback)))
    return jnp.stack(outs, axis=0)

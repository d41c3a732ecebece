"""Rectified (H_inf-factored) sweep vs the exact gather path.

Kernel dispatch runs through the Pallas interpreter on CPU (as in
test_mosaic_sweep.py); hardware timing lives in BASELINE.md. The rect
path is an approximation (the source is bilinearly pre-resampled), so the
tests pin down the three exactness regimes:
  * translation-only rigs: A == I, the resample is an integer canvas
    shift -> rect == gather to bf16 rounding for ARBITRARY features;
  * rotated rigs: exact on (piecewise-)linear feature fields away from
    borders, argmin-depth parity on textured scenes;
  * span/window overflow: falls back to the bit-exact gather branch.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wildmvs.ops import rect_sweep as rs
from wildmvs.ops.plane_sweep import plane_sweep_warp
from wildmvs.ops.volumes import variance_cost_volume


def _rig(H, W, yaw=0.02, roll=0.0, baseline=(2.0, 0.5, 0.0), f=60.0):
    # same synthetic rig as test_mosaic_sweep._rig
    Ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                   [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
    Rz = np.array([[np.cos(roll), -np.sin(roll), 0],
                   [np.sin(roll), np.cos(roll), 0], [0, 0, 1]], np.float32)
    Ry = Rz @ Ry
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    ref_proj = np.eye(4, dtype=np.float32)
    ref_proj[:3, :3] = K
    src_proj = np.eye(4, dtype=np.float32)
    src_proj[:3, :3] = K @ Ry
    src_proj[:3, 3] = K @ np.asarray(baseline, np.float32)
    return jnp.asarray(src_proj), jnp.asarray(ref_proj)


def _gather_variance(feats_l, proj, depths, hw):
    fns = [(lambda i=i: plane_sweep_warp(feats_l[i], proj[:, i],
                                         proj[:, 0], depths, hw))
           for i in range(1, len(feats_l))]
    return variance_cost_volume(feats_l[0], warp_fns=fns,
                                num_depth=depths.shape[-1])


def test_rect_decompose_roundtrip():
    # A (x + e s) must reproduce the direct map A x d + b up to scale
    src_proj, ref_proj = _rig(16, 40, yaw=0.05, baseline=(5.0, 1.0, 0.5))
    A, e = rs.rect_decompose(src_proj, ref_proj)
    T = np.asarray(src_proj @ jnp.linalg.inv(ref_proj))
    x = np.array([3.0, 7.0, 1.0], np.float32)
    d = 500.0
    direct = T[:3, :3] @ x * d + T[:3, 3]
    fact = np.asarray(A) @ (x + np.asarray(e) / d) * d
    np.testing.assert_allclose(fact, direct, rtol=1e-5)


def test_rect_matches_gather_translation_only():
    # A == I: the resample is an exact integer shift; rect == gather to
    # bf16 rounding on random features (away from the border band where
    # the margin clips near-depth samples)
    B, N, H, W, C, D = 1, 3, 16, 40, 8, 12
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
             for _ in range(N)]
    src_proj, ref_proj = _rig(H, W, yaw=0.0, baseline=(2.0, 0.5, 0.0))
    proj = jnp.stack([ref_proj, src_proj,
                      src_proj.at[:3, 3].mul(0.5)], 0)[None]
    depths = jnp.linspace(425.0, 935.0, D).astype(jnp.float32)[None]

    cv = rs.rect_cost_volume(feats, proj, depths, (H, W), margin=8,
                             interpret=True)
    want = _gather_variance(feats, proj, depths, (H, W))
    assert cv.shape == want.shape == (B, D, H, W, C)
    a = np.asarray(cv, np.float32)
    b = np.asarray(want, np.float32)
    assert np.abs(a - b).max() < 0.15


def test_rect_matches_gather_rotated_linear_features():
    # rotation in A: bilinear resampling is exact on linear feature
    # fields, so rect == gather wherever every sample lands in-bounds
    B, N, H, W, C, D = 1, 2, 24, 48, 4, 8
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    lin = np.stack([0.01 * xs, 0.01 * ys, 0.005 * (xs + ys),
                    np.full_like(xs, 0.3, np.float64)], -1)
    feats = [jnp.asarray(lin, jnp.float32).astype(jnp.bfloat16)[None]
             for _ in range(N)]
    src_proj, ref_proj = _rig(H, W, yaw=0.03, baseline=(3.0, 0.5, 0.0))
    proj = jnp.stack([ref_proj, src_proj], 0)[None]
    depths = jnp.linspace(425.0, 935.0, D).astype(jnp.float32)[None]

    cv = rs.rect_cost_volume(feats, proj, depths, (H, W), margin=16,
                             interpret=True)
    want = _gather_variance(feats, proj, depths, (H, W))
    a = np.asarray(cv, np.float32)
    b = np.asarray(want, np.float32)
    # compare the interior (borders mix with the zero pad differently
    # through the double interpolation)
    inner = np.s_[:, :, 4:-4, 8:-8, :]
    assert np.abs(a[inner] - b[inner]).max() < 0.02


def test_rect_falls_back_to_gather_on_wide_spans(monkeypatch):
    # per-pixel hypothesis maps with strong pixel-to-pixel variation blow
    # the KY=2 row window -> both rect tiers must refuse and the output
    # must equal the exact gather branch
    B, N, H, W, C, D = 1, 2, 16, 40, 8, 4
    rng = np.random.default_rng(3)
    feats = [jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
             for _ in range(N)]
    src_proj, ref_proj = _rig(H, W, yaw=0.0, baseline=(0.0, 40.0, 0.0))
    proj = jnp.stack([ref_proj, src_proj], 0)[None]
    base = 430.0 + 500.0 * (rng.random((H, W)) > 0.5)   # ±big row jumps
    hyp = jnp.asarray(np.stack([base + 10 * k for k in range(D)], 0),
                      jnp.float32)[None]

    cv = rs.rect_cost_volume(feats, proj, hyp, (H, W), margin=8,
                             interpret=True)
    # prove the KERNEL branch is dead: zeroing it must not change the
    # output (the cond took the gather branch)
    orig = rs.mosaic_sweep_warp_px
    monkeypatch.setattr(rs, "mosaic_sweep_warp_px",
                        lambda *a, **k: jnp.zeros_like(orig(*a, **k)))
    cv2 = rs.rect_cost_volume(feats, proj, hyp, (H, W), margin=8,
                              interpret=True)
    assert float(jnp.abs(cv - cv2).max()) == 0.0
    # and the gather branch matches the reference aggregation (cond-traced
    # fusion vs the eager path reorders the f32->bf16 rounding: one ulp)
    want = _gather_variance(feats, proj, hyp, (H, W))
    assert np.abs(np.asarray(cv, np.float32)
                  - np.asarray(want, np.float32)).max() < 0.02


def _plane_scene(H=32, W=64, C=8, z0=600.0, n_src=2, f=120.0):
    """Textured fronto plane at z0, DTU-style look-at rig (cameras offset
    sideways, re-aimed at the plane center — real rotations AND real
    multi-pixel disparities: view i's near-depth disparity ~ f*60i/z)."""
    rng = np.random.default_rng(7)
    tex = rng.standard_normal((H * 4, W * 4, C)).astype(np.float32)
    tex = 0.25 * (np.roll(tex, 1, 0) + np.roll(tex, -1, 0)
                  + np.roll(tex, 1, 1) + np.roll(tex, -1, 1))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)

    def render(R, t):
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        pix = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float32)
        rays = pix @ np.linalg.inv(K).T
        Rt = R.T
        cam_o = -Rt @ t
        dirw = rays @ Rt.T
        lam = (z0 - cam_o[2]) / dirw[..., 2]
        pw = cam_o + lam[..., None] * dirw
        u = pw[..., 0] * 2 * f / z0 + 2 * W   # 4x-oversampled texture
        v = pw[..., 1] * 2 * f / z0 + 2 * H
        u0 = np.clip(np.floor(u).astype(int), 0, 4 * W - 2)
        v0 = np.clip(np.floor(v).astype(int), 0, 4 * H - 2)
        fu = u - u0
        fv = v - v0
        img = (tex[v0, u0] * ((1 - fv) * (1 - fu))[..., None]
               + tex[v0, u0 + 1] * ((1 - fv) * fu)[..., None]
               + tex[v0 + 1, u0] * (fv * (1 - fu))[..., None]
               + tex[v0 + 1, u0 + 1] * (fv * fu)[..., None])
        return img.astype(np.float32)

    target = np.array([0.0, 0.0, z0])
    up = np.array([0.0, -1.0, 0.0])
    views, projs = [], []
    for i in range(n_src + 1):
        eye = np.array([60.0 * i * (-1) ** i, 8.0 * (i % 2), 0.0])
        zax = target - eye
        zax = zax / np.linalg.norm(zax)
        xax = np.cross(up, zax)
        xax = xax / np.linalg.norm(xax)
        yax = np.cross(zax, xax)
        R = np.stack([xax, yax, zax], 0).astype(np.float32)
        t = (-R @ eye).astype(np.float32)
        views.append(render(R, t))
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = K @ R
        P[:3, 3] = K @ t
        projs.append(P)
    return views, projs


def test_rect_argmin_depth_parity_on_textured_scene():
    # end-to-end quality: WTA depth from the rect volume must recover the
    # plane as well as the gather volume does
    H, W, D = 32, 64, 12
    views, projs = _plane_scene(H=H, W=W)
    feats = [jnp.asarray(v, jnp.bfloat16)[None] for v in views]
    proj = jnp.asarray(np.stack(projs))[None]
    depths_np = np.linspace(480.0, 760.0, D).astype(np.float32)
    depths = jnp.asarray(depths_np)[None]

    cv_r = rs.rect_cost_volume(feats, proj, depths, (H, W), margin=32,
                               interpret=True)
    cv_g = _gather_variance(feats, proj, depths, (H, W))
    cost_r = np.asarray(cv_r, np.float32).sum(-1)[0]   # [D, H, W]
    cost_g = np.asarray(cv_g, np.float32).sum(-1)[0]
    inner = np.s_[:, 6:-6, 10:-10]
    d_r = depths_np[np.argmin(cost_r[inner], axis=0)]
    d_g = depths_np[np.argmin(cost_g[inner], axis=0)]
    err_r = np.abs(d_r - 600.0)
    err_g = np.abs(d_g - 600.0)
    spacing = depths_np[1] - depths_np[0]
    # both paths must localize the plane to ~the hypothesis spacing, and
    # rect must not be meaningfully worse than gather
    assert np.median(err_g) <= spacing, np.median(err_g)
    assert np.median(err_r) <= spacing, np.median(err_r)
    assert err_r.mean() <= err_g.mean() + 0.5 * spacing


@pytest.mark.slow
def test_mvsnet_sweep_method_rect_forward(monkeypatch):
    # model wiring: sweep_method="rect" must produce a depth map close to
    # the gather path's on the same inputs (interpret-forced kernels)
    import wildmvs.ops.rect_sweep as rsm
    from wildmvs.models import build_model

    orig = rsm.mosaic_sweep_warp_px
    monkeypatch.setattr(rsm, "mosaic_sweep_warp_px",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    rng = np.random.default_rng(5)
    b, n, h, w = 1, 3, 64, 96
    imgs = jnp.asarray(rng.random((b, n, h, w, 3)), jnp.float32)
    f = 120.0
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    K = jnp.asarray(np.tile(K, (b, n, 1, 1)))
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1)))
    t = np.zeros((b, n, 3, 1), np.float32)
    for i in range(n):
        t[:, i, 0, 0] = 2.0 * i
    t = jnp.asarray(t)
    dmin = jnp.full((b, n), 425.0)
    dmax = jnp.full((b, n), 935.0)

    model_r = build_model("mvsnet", num_depth=16, dtype=jnp.bfloat16,
                          sweep_method="rect")
    model_g = build_model("mvsnet", num_depth=16, dtype=jnp.bfloat16,
                          sweep_method="gather")
    variables = model_g.init(jax.random.PRNGKey(0), imgs, K, R, t,
                             dmin, dmax, train=False)
    out_r = model_r.apply(variables, imgs, K, R, t, dmin, dmax,
                          train=False)
    out_g = model_g.apply(variables, imgs, K, R, t, dmin, dmax,
                          train=False)
    dr = np.asarray(out_r["depth"], np.float32)
    dg = np.asarray(out_g["depth"], np.float32)
    interval = (935.0 - 425.0) / 15
    assert np.isfinite(dr).all()
    # soft-argmin depths through a random net: the two sweeps agree to a
    # fraction of the hypothesis interval away from the borders
    assert np.abs(dr - dg)[:, 4:-4, 4:-4].mean() < 0.5 * interval


@pytest.mark.slow
def test_cvp_sweep_method_rect_forward(monkeypatch):
    # model wiring: CVPMVSNet(sweep_method="rect") routes every pyramid
    # level (uniform coarse sweep AND per-pixel refinement maps) through
    # the rect path; depths must track the gather path's
    import wildmvs.ops.mosaic_sweep as ms
    import wildmvs.ops.rect_sweep as rsm
    from wildmvs.models import build_model

    monkeypatch.setattr(ms, "mosaic_px_supported", lambda *a, **k: True)
    orig = rsm.mosaic_sweep_warp_px
    monkeypatch.setattr(rsm, "mosaic_sweep_warp_px",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    rng = np.random.default_rng(8)
    b, n, h, w = 1, 3, 64, 96
    imgs = jnp.asarray(rng.random((b, n, h, w, 3)), jnp.float32)
    f = 120.0
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    K = jnp.asarray(np.tile(K, (b, n, 1, 1)))
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1)))
    t = np.zeros((b, n, 3, 1), np.float32)
    for i in range(n):
        t[:, i, 0, 0] = 2.0 * i
    t = jnp.asarray(t)
    dmin = jnp.full((b, n), 425.0)
    dmax = jnp.full((b, n), 935.0)

    model_r = build_model("cvp_mvsnet", dtype=jnp.bfloat16,
                          sweep_method="rect")
    model_g = build_model("cvp_mvsnet", dtype=jnp.bfloat16,
                          sweep_method="gather")
    variables = model_g.init(jax.random.PRNGKey(0), imgs, K, R, t,
                             dmin, dmax, train=False, nscale=2)
    out_r = model_r.apply(variables, imgs, K, R, t, dmin, dmax,
                          train=False, nscale=2)
    out_g = model_g.apply(variables, imgs, K, R, t, dmin, dmax,
                          train=False, nscale=2)
    dr = np.asarray(out_r["depth"], np.float32)
    dg = np.asarray(out_g["depth"], np.float32)
    interval = (935.0 - 425.0) / 96.0
    assert np.isfinite(dr).all()
    assert np.abs(dr - dg)[:, 4:-4, 4:-4].mean() < 2.0 * interval


def test_coverage_guard_dispatches_to_gather():
    """Advisor r3: an undersized canvas margin must dispatch to the exact
    gather (rect_coverage_ok folded into the span conds) instead of
    silently sampling canvas-border zeros where the gather is valid.

    Probe: a huge-baseline translation rig whose residual disparity spread
    (~29 px) dwarfs margin=4; the kernel path is NaN-poisoned, so any NaN
    in the output proves the wrong branch ran."""
    import wildmvs.ops.rect_sweep as RS
    from wildmvs.geometry.projective import build_proj_matrices

    rng = np.random.default_rng(0)
    h, w, c = 16, 24, 8
    K = np.array([[w * 1.2, 0, w / 2], [0, w * 1.2, h / 2], [0, 0, 1]],
                 np.float32)
    Ks = np.stack([K, K])
    Rs = np.stack([np.eye(3, dtype=np.float32)] * 2)
    ts = np.stack([np.zeros((3, 1), np.float32),
                   np.array([[3.0], [0.0], [0.0]], np.float32)])
    proj = build_proj_matrices(jnp.asarray(Ks)[None], jnp.asarray(Rs)[None],
                               jnp.asarray(ts)[None])
    feats = [jnp.asarray(rng.standard_normal((1, h, w, c)), jnp.bfloat16)
             for _ in range(2)]
    depths = jnp.linspace(2.0, 6.0, 8)[None]

    orig = RS.mosaic_sweep_warp_px
    RS.mosaic_sweep_warp_px = lambda *a, **k: orig(*a, **k) * jnp.nan
    try:
        out = RS.rect_cost_volume(feats, proj, depths, (h, w), margin=4,
                                  interpret=True)
    finally:
        RS.mosaic_sweep_warp_px = orig
    out = np.asarray(out, np.float32)
    assert np.isfinite(out).all(), "kernel branch ran despite coverage miss"

    # and the guard must NOT disturb a well-covered rig: ample margin ->
    # kernel branch (poison detects it)
    ts2 = np.stack([np.zeros((3, 1), np.float32),
                    np.array([[0.05], [0.0], [0.0]], np.float32)])
    proj2 = build_proj_matrices(jnp.asarray(Ks)[None],
                                jnp.asarray(Rs)[None],
                                jnp.asarray(ts2)[None])
    RS.mosaic_sweep_warp_px = lambda *a, **k: orig(*a, **k) * jnp.nan
    try:
        out2 = RS.rect_cost_volume(feats, proj2, depths, (h, w), margin=8,
                                   interpret=True)
    finally:
        RS.mosaic_sweep_warp_px = orig
    assert np.isnan(np.asarray(out2, np.float32)).any(), \
        "coverage guard became over-conservative: kernel never dispatched"


def test_rect_epe_delta_dtu_geometry():
    """Pin the rect-vs-exact delta at (scaled) DTU eval geometry.

    Full-scale record (tools/rect_accuracy.py, 1184x1600 N5, v5e, r4):
    mvsnet argmin-level delta mean 0.129 / p95 0.83 intervals, end-metric
    EPE cost +0.0035 intervals.  This scaled replica (the same 650 mm
    sphere rig at 128x160, f scaled by 1/10) bounds the cost-volume
    argmin delta so a rect regression (resample convention, recentering,
    margin) is caught on CPU."""
    import sys
    sys.path.insert(0, "/root/repo")
    from bench import scene_dtu
    from wildmvs.geometry.projective import build_proj_matrices
    from wildmvs.ops.plane_sweep import plane_sweep_warp
    from wildmvs.ops.rect_sweep import rect_cost_volume
    from wildmvs.ops.volumes import variance_cost_volume

    from wildmvs.data.synthetic import render_rig_plane

    h, w, n, d = 128, 160, 3, 48
    _, K, R, t, dmin, dmax = scene_dtu(1, n, h, w, 289.2)
    proj = build_proj_matrices(K, R, t)
    # photoconsistent features: the rendered textured plane mixed through a
    # fixed random channel matrix (random FEATURES would make the argmin
    # noise-driven and the delta meaningless)
    imgs, _gt = render_rig_plane(*(np.asarray(a[0]) for a in (K, R, t)),
                                 h, w, plane=(-30.0, 0.12, -0.08),
                                 extent=320.0, seed=0)
    rng = np.random.default_rng(3)
    mix = rng.standard_normal((3, 8)).astype(np.float32)
    feats = [jnp.asarray(imgs[i] @ mix, jnp.bfloat16)[None]
             for i in range(n)]
    depths = jnp.linspace(425.0, 935.0, d)[None]

    exact = variance_cost_volume(
        feats[0], warp_fns=[
            (lambda i=i: plane_sweep_warp(feats[i], proj[:, i], proj[:, 0],
                                          depths, (h, w)))
            for i in range(1, n)], num_depth=d)
    rect = rect_cost_volume(feats, proj, depths, (h, w), interpret=True)

    cost_e = np.asarray(exact, np.float32).sum(-1)[0]   # [D, H, W]
    cost_r = np.asarray(rect, np.float32).sum(-1)[0]
    am_e = cost_e.argmin(0).astype(np.float32)
    am_r = cost_r.argmin(0).astype(np.float32)
    # interior pixels (the border band is where the canvas legitimately
    # differs); deltas in hypothesis steps.  A HARD argmin flips between
    # near-tied hypotheses on low-texture pixels, so the raw delta runs
    # higher than the model-level soft-argmin record (0.129 mean at full
    # scale) — measured 0.66 mean here; bound at 1.0.
    delta = np.abs(am_e - am_r)[8:-8, 8:-8]
    assert delta.mean() < 1.0, delta.mean()
    # the check that mirrors the full-scale conclusion: the approximation
    # must not COST accuracy — argmin-depth EPE vs the rendered plane's GT
    # within 0.2 hypothesis steps of the exact path's EPE
    hyp = np.linspace(425.0, 935.0, d, dtype=np.float32)
    step = hyp[1] - hyp[0]
    gt_in = _gt[0][8:-8, 8:-8]
    epe_e = np.abs(hyp[am_e.astype(int)][8:-8, 8:-8] - gt_in).mean() / step
    epe_r = np.abs(hyp[am_r.astype(int)][8:-8, 8:-8] - gt_in).mean() / step
    assert abs(epe_r - epe_e) < 0.2, (epe_e, epe_r)

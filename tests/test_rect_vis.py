"""Vis-MVSNet arm of the rectified (H_inf-factored) sweep.

Same exactness-regime strategy as test_rect_sweep.py: the decomposition is
proven algebraically against the homography coefficients, the full
warp+gwc chain is proven on linear feature fields (bilinear resampling is
exact on them under ANY resample scale, so the double interpolation drops
out away from borders), and the model wiring is checked for depth parity
against the exact gather path.  Kernels run through the Pallas
interpreter on CPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wildmvs.ops import rect_sweep as rs
from wildmvs.ops.plane_sweep import homography_sweep_warp
from wildmvs.ops.volumes import groupwise_correlation


def _vis_rig(yaw=0.03, baseline=(4.0, 1.0, 0.0), f=80.0, H=24, W=48):
    Ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                   [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    R_ref = np.eye(3, dtype=np.float32)
    t_ref = np.zeros((3, 1), np.float32)
    R_src = Ry
    t_src = (-Ry @ np.asarray(baseline, np.float32)).reshape(3, 1)
    return (jnp.asarray(K), jnp.asarray(R_ref), jnp.asarray(t_ref),
            jnp.asarray(R_src), jnp.asarray(t_src))


def test_vis_rect_decompose_roundtrip():
    # A (p + e s) must reproduce the direct homography map A p - (B p) s
    # for arbitrary pixels (B p == -A e for every p)
    K, R_ref, t_ref, R_src, t_src = _vis_rig()
    A, e = rs.vis_rect_decompose(K, R_ref, t_ref, K, R_src, t_src)
    # the reference coefficients, as in ops/plane_sweep.py:203
    K_ref_inv = np.linalg.inv(np.asarray(K))
    fronto = np.asarray(R_ref)[2:3, :]
    c_rel = ((-np.asarray(R_src).T @ np.asarray(t_src))
             - (-np.asarray(R_ref).T @ np.asarray(t_ref)))
    M = np.asarray(K) @ np.asarray(R_src)
    A_direct = M @ np.asarray(R_ref).T @ K_ref_inv
    B_direct = M @ (c_rel @ fronto) @ np.asarray(R_ref).T @ K_ref_inv
    for p in ([3.5, 7.5, 1.0], [40.5, 20.5, 1.0], [0.5, 0.5, 1.0]):
        p = np.asarray(p, np.float32)
        s = 1.0 / 600.0
        direct = A_direct @ p - (B_direct @ p) * s
        fact = np.asarray(A) @ (p + np.asarray(e) * s)
        np.testing.assert_allclose(fact, direct, rtol=2e-4, atol=1e-4)


def _gwc_gather(src, ref, K, R_ref, t_ref, R_src, t_src, D, d_start,
                d_itv, hw):
    warped = homography_sweep_warp(
        src, K[None], R_ref[None], t_ref[None], K[None], R_src[None],
        t_src[None], D, d_start, d_itv, hw)
    return groupwise_correlation(
        jnp.broadcast_to(ref[:, None], warped.shape), warped, 8)


def test_rect_gwc_matches_gather_linear_features():
    B, H, W, C, D = 1, 24, 48, 8, 8
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    lin = np.stack([0.01 * xs, 0.01 * ys, 0.005 * (xs + ys),
                    np.full_like(xs, 0.3, np.float64),
                    0.02 * xs - 0.01 * ys, 0.3 - 0.004 * xs,
                    0.002 * ys, 0.01 * (xs - ys)], -1)
    feat = jnp.asarray(lin, jnp.float32).astype(jnp.bfloat16)[None]
    rng = np.random.default_rng(2)
    ref = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    K, R_ref, t_ref, R_src, t_src = _vis_rig(H=H, W=W)
    d_start = jnp.full((B, 1, 1, 1), 480.0)
    d_itv = jnp.full((B, 1, 1, 1), (760.0 - 480.0) / (D - 1))

    got = rs.rect_gwc_volume(
        feat, ref, K[None], R_ref[None], t_ref[None], K[None],
        R_src[None], t_src[None], D, d_start, d_itv, (H, W),
        margin=16, interpret=True)
    want = _gwc_gather(feat, ref, K, R_ref, t_ref, R_src, t_src, D,
                       d_start, d_itv, (H, W))
    assert got.shape == want.shape == (B, D, H, W, 8)
    a = np.asarray(got, np.float32)
    b = np.asarray(want, np.float32)
    inner = np.s_[:, :, 4:-4, 8:-8, :]
    assert np.abs(a[inner] - b[inner]).max() < 0.04  # one bf16 ulp at |corr|~4


def test_rect_gwc_per_pixel_start_fallback_consistency(monkeypatch):
    # per-pixel depth_start with violent row jumps must take the exact
    # gather branch (prove the kernel branch is dead, then match gather)
    B, H, W, C, D = 1, 24, 48, 8, 4
    rng = np.random.default_rng(4)
    feat = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    ref = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    K, R_ref, t_ref, R_src, t_src = _vis_rig(
        yaw=0.0, baseline=(0.0, 60.0, 0.0), H=H, W=W)
    base = 430.0 + 500.0 * (rng.random((H, W)) > 0.5)
    d_start = jnp.asarray(base, jnp.float32)[None, None]
    d_itv = jnp.full((B, 1, 1, 1), 12.0)

    got = rs.rect_gwc_volume(
        feat, ref, K[None], R_ref[None], t_ref[None], K[None],
        R_src[None], t_src[None], D, d_start, d_itv, (H, W),
        margin=8, interpret=True)
    import wildmvs.ops.mosaic_sweep as ms
    orig = ms.mosaic_sweep_warp_px_gwc
    monkeypatch.setattr(ms, "mosaic_sweep_warp_px_gwc",
                        lambda *a, **k: jnp.zeros_like(orig(*a, **k)))
    got2 = rs.rect_gwc_volume(
        feat, ref, K[None], R_ref[None], t_ref[None], K[None],
        R_src[None], t_src[None], D, d_start, d_itv, (H, W),
        margin=8, interpret=True)
    assert float(jnp.abs(got - got2).max()) == 0.0
    want = _gwc_gather(feat, ref, K, R_ref, t_ref, R_src, t_src, D,
                       d_start, d_itv, (H, W))
    assert np.abs(np.asarray(got, np.float32)
                  - np.asarray(want, np.float32)).max() < 0.04


@pytest.mark.slow
def test_vis_model_sweep_method_rect_forward(monkeypatch):
    # model wiring: VisMVSNet(sweep_method="rect") must produce stage
    # depths close to the exact gather path's on the same inputs
    import wildmvs.ops.mosaic_sweep as ms
    from wildmvs.models import build_model

    monkeypatch.setattr(ms, "vis_mosaic_supported", lambda *a, **k: True)
    orig = ms.mosaic_sweep_warp_px_gwc
    monkeypatch.setattr(
        ms, "mosaic_sweep_warp_px_gwc",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    rng = np.random.default_rng(6)
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

    kw = dict(depth_nums=(16, 8, 4), interval_scales=(4.0, 2.0, 1.0),
              dtype=jnp.bfloat16)
    model_r = build_model("vis_mvsnet", sweep_method="rect", **kw)
    model_g = build_model("vis_mvsnet", sweep_method="gather", **kw)
    variables = model_g.init(jax.random.PRNGKey(0), imgs, K, R, t,
                             dmin, dmax, train=False)
    out_r = model_r.apply(variables, imgs, K, R, t, dmin, dmax,
                          train=False)
    out_g = model_g.apply(variables, imgs, K, R, t, dmin, dmax,
                          train=False)
    dr = np.asarray(out_r["depth"], np.float32)
    dg = np.asarray(out_g["depth"], np.float32)
    interval = (935.0 - 425.0) / 128.0
    assert np.isfinite(dr).all()
    assert np.abs(dr - dg)[:, 4:-4, 4:-4].mean() < 2.0 * interval

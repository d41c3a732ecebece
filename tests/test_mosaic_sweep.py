"""Mosaic lane-gather sweep kernel vs the exact gather warp.

The kernel itself needs a real TPU; these tests run it through the Pallas
interpreter on the CPU backend (same jaxpr, no Mosaic lowering), checking
the geometry plumbing, window logic, packing, and the model-level cond
dispatch. The compiled-kernel parity at full scale is measured on hardware
by tools/proto_sweep_kernel3.py and recorded in BASELINE.md.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wildmvs.ops.mosaic_sweep import (build_corner_table, cost_volume_mosaic,
                                      mosaic_sweep_warp, rot_planes,
                                      sweep_spans, table_bytes)
from wildmvs.ops.plane_sweep import plane_sweep_warp


def _rig(H, W, yaw=0.02, roll=0.0, baseline=(2.0, 0.5, 0.0), f=60.0):
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


def _warp_pair(H=16, W=40, C=8, D=12, yaw=0.02, roll=0.0, KY=2):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((H, W, C)), jnp.bfloat16)
    src_proj, ref_proj = _rig(H, W, yaw=yaw, roll=roll)
    depths = jnp.linspace(425.0, 935.0, D).astype(jnp.float32)

    ref = plane_sweep_warp(src[None].astype(jnp.float32), src_proj[None],
                           ref_proj[None], depths[None], (H, W))[0]

    rxyz, trans = rot_planes(src_proj, ref_proj, (H, W))
    ybase, span = sweep_spans(rxyz, trans, depths, (H, W))
    out = mosaic_sweep_warp(src, rxyz, trans, depths, ybase, KY=KY,
                            interpret=True)
    out_hw = jnp.transpose(out, (0, 1, 3, 2)).astype(jnp.float32)
    return np.asarray(out_hw), np.asarray(ref), int(span)


def test_kernel_matches_gather_interpret():
    out, ref, span = _warp_pair()
    assert span <= 1, span
    # bf16 table + bf16 combine vs the f32 gather: rounding only
    assert np.abs(out - ref).max() < 0.08
    # and it actually warped something
    assert (np.abs(ref) > 0).mean() > 0.5


def test_kernel_zero_outside_frustum():
    # huge baseline throws most pixels outside the source: kernel must
    # produce exact zeros where the gather path does
    out, ref, _ = _warp_pair(yaw=0.0, KY=2)
    zero_ref = np.abs(ref) == 0
    assert (np.abs(out[zero_ref]) == 0).all()


def test_kernel_wide_span_window_matches_with_big_ky():
    # in-plane-ish geometry with a larger row span still matches when KY
    # covers the span
    out, ref, span = _warp_pair(roll=0.12, KY=8)
    assert span > 1, "test geometry should exercise a multi-row window"
    assert span <= 7, span
    assert np.abs(out - ref).max() < 0.08


def test_corner_table_packing_roundtrip():
    rng = np.random.default_rng(1)
    H, W, C = 8, 12, 4
    src = jnp.asarray(rng.standard_normal((H, W, C)), jnp.bfloat16)
    table = build_corner_table(src)
    assert table.dtype == jnp.int32
    Ht, C2, Wpad = table.shape
    assert (Ht, C2) == (H + 2, 2 * C) and Wpad % 128 == 0
    assert table_bytes((H, W), C) == table.size * 4
    # unpack in XLA (same interleave convention as pltpu.bitcast: int32
    # sublane s -> bf16 sublanes (2s, 2s+1) = (low, high))
    u = jax.lax.bitcast_convert_type(table, jnp.uint32)
    lo = jax.lax.bitcast_convert_type((u & 0xFFFF).astype(jnp.uint16),
                                      jnp.bfloat16)
    hi = jax.lax.bitcast_convert_type((u >> 16).astype(jnp.uint16),
                                      jnp.bfloat16)
    quad = jnp.stack([lo, hi], axis=2).reshape(Ht, 4 * C, Wpad)
    got = np.asarray(quad, np.float32)
    # quad[y, :, x] == (p[y,x], p[y,x+1], p[y+1,x], p[y+1,x+1]) of the
    # 1-ring zero-padded source, for y in [0, H], x in [0, W]; zeros beyond
    p = np.zeros((H + 3, W + 3, C), np.float32)
    p[1:H + 1, 1:W + 1] = np.asarray(src, np.float32)
    for (y, x) in [(0, 0), (1, 1), (4, 7), (H, W), (H + 1, W + 1)]:
        want = np.concatenate([p[y, x], p[y, x + 1], p[y + 1, x],
                               p[y + 1, x + 1]])
        if y > H or x > W:
            want = np.zeros(4 * C, np.float32)
        np.testing.assert_allclose(got[y, :, x], want, rtol=0, atol=0)


def test_px_kernel_per_pixel_depths_interpret():
    # the streamed-window kernel with [D, H, W] hypothesis maps (the CVP
    # refinement configuration) vs the exact gather
    from wildmvs.ops.mosaic_sweep import (mosaic_sweep_warp_px,
                                          mvsnet_planes, sweep_spans_px)
    H, W, C, D = 32, 144, 8, 6
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.standard_normal((H, W, C)), jnp.bfloat16)
    src_proj, ref_proj = _rig(H, W)
    base = (600.0 + 100.0 * np.sin(np.linspace(0, 3, H))[:, None]
            + 50.0 * np.cos(np.linspace(0, 2, W))[None, :])
    offs = np.linspace(-20, 20, D)
    depths = jnp.asarray((base[None] + offs[:, None, None]).astype(np.float32))

    ref = plane_sweep_warp(src[None].astype(jnp.float32), src_proj[None],
                           ref_proj[None], depths[None], (H, W))[0]
    P, Q, sx, sy = mvsnet_planes(src_proj, ref_proj, (H, W))
    plan = sweep_spans_px(P, Q, depths, (H, W))
    assert int(plan["yspan"]) <= 1 and int(plan["xover"]) <= 0
    out = mosaic_sweep_warp_px(src, P, Q, depths, plan, KY=2, KR=16,
                               interpret=True)
    out_hw = np.asarray(jnp.transpose(out, (0, 1, 3, 2)), np.float32)
    assert np.abs(out_hw - np.asarray(ref)).max() < 0.08
    assert (np.abs(np.asarray(ref)) > 0).mean() > 0.5


def test_vis_homography_volume_mosaic_interpret():
    """homography_volume_mosaic == homography_sweep_warp (the Vis-MVSNet
    grid convention: pixel-center grid, size normalization, A - B/d), for
    both a scalar slab start and a per-pixel re-centered slab."""
    from wildmvs.ops.mosaic_sweep import homography_volume_mosaic
    from wildmvs.ops.plane_sweep import homography_sweep_warp

    H, W, C, D = 32, 48, 8, 6
    rng = np.random.default_rng(9)
    src = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.bfloat16)
    yaw = 0.02
    Ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                   [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
    K = jnp.asarray(np.array([[60.0, 0, W / 2], [0, 60.0, H / 2],
                              [0, 0, 1]], np.float32))[None]
    R0 = jnp.asarray(np.eye(3, dtype=np.float32))[None]
    Rs = jnp.asarray(Ry)[None]
    t0 = jnp.zeros((1, 3, 1))
    ts = jnp.asarray(np.array([[[2.0], [0.5], [0.0]]], np.float32))

    for start in (jnp.full((1, 1, 1, 1), 425.0),
                  jnp.asarray(500.0 + 30.0 * np.sin(
                      np.linspace(0, 3, H * W)).reshape(1, 1, H, W)
                      .astype(np.float32))):
        interval = jnp.full((1, 1, 1, 1), 40.0)
        want = homography_sweep_warp(src.astype(jnp.float32), K, R0, t0,
                                     K, Rs, ts, D, start, interval, (H, W))
        got = homography_volume_mosaic(src, K, R0, t0, K, Rs, ts, D,
                                       start, interval, (H, W),
                                       interpret=True)
        a = np.asarray(got, np.float32)
        b = np.asarray(want, np.float32)
        assert a.shape == b.shape == (1, D, H, W, C)
        assert np.abs(a - b).max() < 0.08
        assert (np.abs(b) > 0).mean() > 0.3


def test_variance_volume_mosaic_px_matches_gather():
    from wildmvs.ops.mosaic_sweep import variance_volume_mosaic_px
    from wildmvs.ops.volumes import variance_cost_volume
    B, N, H, W, C, D = 1, 3, 16, 40, 8, 5
    rng = np.random.default_rng(4)
    feats = [jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
             for _ in range(N)]
    src_proj, ref_proj = _rig(H, W)
    proj = jnp.stack([ref_proj, src_proj,
                      src_proj.at[:3, 3].mul(0.5)], 0)[None]
    base = 600.0 + 30.0 * np.sin(np.linspace(0, 3, H))[:, None] \
        + 10.0 * np.cos(np.linspace(0, 2, W))[None, :]
    offs = np.linspace(-15, 15, D)
    hyp = jnp.asarray((base[None] + offs[:, None, None]).astype(np.float32))[None]

    cv = variance_volume_mosaic_px(feats, proj, hyp, (H, W), KR=18,
                                   interpret=True)
    fns = [(lambda i=i: plane_sweep_warp(feats[i], proj[:, i], proj[:, 0],
                                         hyp, (H, W))) for i in (1, 2)]
    want = variance_cost_volume(feats[0], warp_fns=fns, num_depth=D)
    assert cv.shape == want.shape == (B, D, H, W, C)
    assert np.abs(np.asarray(cv, np.float32)
                  - np.asarray(want, np.float32)).max() < 0.15


@pytest.mark.slow
def test_cost_volume_mosaic_dispatch_interpret(monkeypatch):
    # the model-level dispatch: kernel branch output must match the gather
    # branch's variance volume (forced through interpret mode)
    import wildmvs.ops.mosaic_sweep as ms

    real_warp = ms.mosaic_sweep_warp
    monkeypatch.setattr(ms, "mosaic_sweep_warp",
                        lambda *a, **k: real_warp(*a, **{**k,
                                                         "interpret": True}))

    rng = np.random.default_rng(2)
    B, N, H, W, C, D = 1, 3, 16, 40, 8, 12
    feats = jnp.asarray(rng.standard_normal((B, N, H, W, C)), jnp.bfloat16)
    src_proj, ref_proj = _rig(H, W)
    proj = jnp.stack([ref_proj, src_proj,
                      src_proj.at[:3, 3].mul(0.5)], 0)[None]
    depths = jnp.linspace(425.0, 935.0, D).astype(jnp.float32)[None]

    cv = ms.cost_volume_mosaic(feats, proj, [1, 2], 0, depths, (H, W),
                               "variance", D)
    from wildmvs.ops.volumes import variance_cost_volume
    fns = [(lambda i=i: plane_sweep_warp(feats[:, i], proj[:, i],
                                         proj[:, 0], depths, (H, W)))
           for i in (1, 2)]
    want = variance_cost_volume(feats[:, 0], warp_fns=fns, num_depth=D)
    assert cv.shape == want.shape == (B, D, H, W, C)
    a = np.asarray(cv, np.float32)
    b = np.asarray(want, np.float32)
    assert np.abs(a - b).max() < 0.15  # bf16 accumulation differences


def test_warp_mosaic_custom_vjp_matches_gather_grad():
    """plane_sweep_warp_mosaic: forward == gather to bf16 rounding
    (interpret mode); the custom-VJP feature gradient (Mosaic scatter
    kernel, f32 accumulation) is at least as close to the f32-truth
    transpose as the bf16 gather path."""
    from wildmvs.ops.mosaic_sweep import plane_sweep_warp_mosaic

    H, W, C, D = 16, 40, 8, 6
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.bfloat16)
    src_proj, ref_proj = _rig(H, W)
    depths = jnp.linspace(425.0, 935.0, D).astype(jnp.float32)[None]
    cot = jnp.asarray(rng.standard_normal((1, D, H, W, C)), jnp.bfloat16)

    out_m, vjp_m = jax.vjp(
        lambda f: plane_sweep_warp_mosaic(f, src_proj[None], ref_proj[None],
                                          depths, (H, W), True), src)
    out_g, vjp_g = jax.vjp(
        lambda f: plane_sweep_warp(f, src_proj[None], ref_proj[None],
                                   depths, (H, W)), src)
    assert np.abs(np.asarray(out_m, np.float32)
                  - np.asarray(out_g, np.float32)).max() < 0.08
    # the custom VJP is the Mosaic scatter kernel (f32 accumulation): it
    # must be at least as close to the F32-truth transpose as the bf16
    # gather path it replaces, and within bf16-rounding tolerance of it
    gm = np.asarray(vjp_m(cot)[0], np.float32)
    gg = np.asarray(vjp_g(cot)[0], np.float32)
    tr32 = jax.vjp(
        lambda f: plane_sweep_warp(f, src_proj[None], ref_proj[None],
                                   depths, (H, W)),
        src.astype(jnp.float32))[1]
    g32 = np.asarray(tr32(cot.astype(jnp.float32))[0], np.float32)
    scale = max(1.0, np.abs(g32).max())
    assert np.abs(gm - g32).max() <= np.abs(gg - g32).max() + 0.02 * scale
    assert np.abs(gm - g32).max() < 0.02 * scale


@pytest.mark.slow
def test_cost_volume_mosaic_softmin_interpret(monkeypatch):
    """The mvsnet-s softmin aggregation through the mosaic branch (computed
    in the kernel's [D, H, C, W] layout) == the reference-layout softmin."""
    import wildmvs.ops.mosaic_sweep as ms
    from wildmvs.ops.volumes import softmin_cost_volume

    real_warp = ms.mosaic_sweep_warp
    monkeypatch.setattr(ms, "mosaic_sweep_warp",
                        lambda *a, **k: real_warp(*a, **{**k,
                                                         "interpret": True}))
    rng = np.random.default_rng(6)
    B, N, H, W, C, D = 1, 3, 16, 40, 8, 12
    feats = jnp.asarray(rng.standard_normal((B, N, H, W, C)), jnp.bfloat16)
    src_proj, ref_proj = _rig(H, W)
    proj = jnp.stack([ref_proj, src_proj,
                      src_proj.at[:3, 3].mul(0.5)], 0)[None]
    depths = jnp.linspace(425.0, 935.0, D).astype(jnp.float32)[None]
    temp = jnp.ones((1,), jnp.float32)

    cv = ms.cost_volume_mosaic(feats, proj, [1, 2], 0, depths, (H, W),
                               "softmin", D, temp=temp)
    from wildmvs.ops.plane_sweep import plane_sweep_warp
    fns = [(lambda i=i: plane_sweep_warp(feats[:, i], proj[:, i],
                                         proj[:, 0], depths, (H, W)))
           for i in (1, 2)]
    want = softmin_cost_volume(feats[:, 0], warp_fns=fns, temperature=temp)
    assert cv.shape == want.shape
    assert np.abs(np.asarray(cv, np.float32)
                  - np.asarray(want, np.float32)).max() < 0.15


def test_fused_cost_volume_variance_interpret():
    """v3 fused multi-view kernel (in-register Sum/Sum^2) == the gather
    variance volume, for uniform AND per-pixel hypotheses."""
    from wildmvs.ops.mosaic_sweep import fused_cost_volume_px
    from wildmvs.ops.volumes import variance_cost_volume

    B, N, H, W, C = 1, 3, 16, 40, 8
    rng = np.random.default_rng(11)
    feats = [jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
             for _ in range(N)]
    src_proj, ref_proj = _rig(H, W)
    proj = jnp.stack([ref_proj, src_proj,
                      src_proj.at[:3, 3].mul(0.5)], 0)[None]

    D = 12
    uniform = jnp.linspace(425.0, 935.0, D).astype(jnp.float32)[None]
    base = 600.0 + 30.0 * np.sin(np.linspace(0, 3, H))[:, None] \
        + 10.0 * np.cos(np.linspace(0, 2, W))[None, :]
    perpix = jnp.asarray((base[None] + np.linspace(-15, 15, 6)[:, None, None]
                          ).astype(np.float32))[None]

    for hyp in (uniform, perpix):
        Dh = hyp.shape[1]
        cv = fused_cost_volume_px(feats, proj, hyp, (H, W), agg="variance",
                                  KR=18, interpret=True)
        fns = [(lambda i=i: plane_sweep_warp(feats[i], proj[:, i],
                                             proj[:, 0], hyp, (H, W)))
               for i in (1, 2)]
        want = variance_cost_volume(feats[0], warp_fns=fns, num_depth=Dh)
        assert cv.shape == want.shape == (B, Dh, H, W, C)
        assert np.abs(np.asarray(cv, np.float32)
                      - np.asarray(want, np.float32)).max() < 0.15


def test_fused_cost_volume_softmin_interpret():
    from wildmvs.ops.mosaic_sweep import fused_cost_volume_px
    from wildmvs.ops.volumes import softmin_cost_volume

    B, N, H, W, C, D = 1, 3, 16, 40, 8, 12
    rng = np.random.default_rng(12)
    feats = [jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
             for _ in range(N)]
    src_proj, ref_proj = _rig(H, W)
    proj = jnp.stack([ref_proj, src_proj,
                      src_proj.at[:3, 3].mul(0.5)], 0)[None]
    depths = jnp.linspace(425.0, 935.0, D).astype(jnp.float32)[None]
    temp = jnp.ones((1,), jnp.float32)

    cv = fused_cost_volume_px(feats, proj, depths, (H, W), agg="softmin",
                              temp=temp, KR=18, interpret=True)
    fns = [(lambda i=i: plane_sweep_warp(feats[i], proj[:, i], proj[:, 0],
                                         depths, (H, W))) for i in (1, 2)]
    want = softmin_cost_volume(feats[0], warp_fns=fns, temperature=temp)
    assert cv.shape == want.shape
    assert np.abs(np.asarray(cv, np.float32)
                  - np.asarray(want, np.float32)).max() < 0.15


def test_fused_cost_volume_falls_back_when_window_exceeded():
    """A window too small for the geometry must dispatch to the exact
    fallback, bit-identical to the gather aggregation."""
    from wildmvs.ops.mosaic_sweep import fused_cost_volume_px
    from wildmvs.ops.volumes import variance_cost_volume

    B, N, H, W, C, D = 1, 3, 16, 40, 8, 12
    rng = np.random.default_rng(13)
    feats = [jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
             for _ in range(N)]
    src_proj, ref_proj = _rig(H, W, roll=0.3)   # big in-plane rotation
    proj = jnp.stack([ref_proj, src_proj,
                      src_proj.at[:3, 3].mul(0.5)], 0)[None]
    depths = jnp.linspace(425.0, 935.0, D).astype(jnp.float32)[None]

    # sentinel fallback proves the dispatch took the exact path
    sentinel = fused_cost_volume_px(
        feats, proj, depths, (H, W), agg="variance", KY=2, KR=4, DC=12,
        fallback=lambda bb: jnp.full((D, H, W, C), -7.0, jnp.bfloat16),
        interpret=True)
    np.testing.assert_array_equal(np.asarray(sentinel, np.float32), -7.0)

    # and the default fallback is the gather aggregation (same math; XLA
    # may fuse the branch differently -> bf16-ulp tolerance, not bitwise)
    cv = fused_cost_volume_px(feats, proj, depths, (H, W), agg="variance",
                              KY=2, KR=4, DC=12, interpret=True)
    fns = [(lambda i=i: plane_sweep_warp(feats[i], proj[:, i], proj[:, 0],
                                         depths, (H, W))) for i in (1, 2)]
    want = variance_cost_volume(feats[0], warp_fns=fns, num_depth=D)
    assert np.abs(np.asarray(cv, np.float32)
                  - np.asarray(want, np.float32)).max() < 0.05


def test_px_kernel_odd_rows_pads_interpret():
    """Ref grids whose height is NOT a multiple of 8 (Vis stage 1 = 148,
    CVP levels 74/148 at full-res eval) go through internal row padding:
    px kernel, gwc kernel, and the fused multi-view kernel must all match
    the exact gather on the original rows."""
    from wildmvs.ops.mosaic_sweep import (fused_cost_volume_px,
                                          mosaic_sweep_warp_px,
                                          mosaic_sweep_warp_px_gwc,
                                          mvsnet_planes, sweep_spans_px)
    from wildmvs.ops.volumes import (groupwise_correlation,
                                     variance_cost_volume)

    H, W, C, D = 14, 40, 8, 6          # 14 % 8 != 0
    rng = np.random.default_rng(31)
    src = jnp.asarray(rng.standard_normal((H, W, C)), jnp.bfloat16)
    ref = jnp.asarray(rng.standard_normal((H, W, C)), jnp.bfloat16)
    src_proj, ref_proj = _rig(H, W)
    depths = jnp.linspace(425.0, 935.0, D).astype(jnp.float32)

    want = plane_sweep_warp(src[None].astype(jnp.float32), src_proj[None],
                            ref_proj[None], depths[None], (H, W))[0]
    P, Q, sx, sy = mvsnet_planes(src_proj, ref_proj, (H, W))
    plan = sweep_spans_px(P, Q, depths, (H, W))
    assert int(plan["yspan"]) <= 1 and int(plan["xover"]) <= 0
    out = mosaic_sweep_warp_px(src, P, Q, depths, plan, KY=2, KR=16,
                               interpret=True)
    assert out.shape == (D, H, C, W)
    out_hw = np.asarray(jnp.transpose(out, (0, 1, 3, 2)), np.float32)
    assert np.abs(out_hw - np.asarray(want, np.float32)).max() < 0.08

    # gwc variant
    ref_chw = jnp.transpose(ref, (0, 2, 1))
    corr = mosaic_sweep_warp_px_gwc(src, ref_chw, P, Q, depths, plan,
                                    groups=4, KY=2, KR=16, interpret=True)
    assert corr.shape == (D, H, 4, W)
    want_corr = groupwise_correlation(
        jnp.broadcast_to(ref[None].astype(jnp.float32), want.shape),
        want, 4)
    corr_hw = np.asarray(jnp.transpose(corr, (0, 1, 3, 2)), np.float32)
    assert np.abs(corr_hw - np.asarray(want_corr, np.float32)).max() < 0.25

    # fused multi-view variance — uniform AND per-pixel hypotheses (the
    # per-pixel + odd-rows combination is the CVP full-res crash of
    # 2026-08-20: pre-padded P/Q with unpadded [D, H, W] svals)
    feats = [ref[None], src[None],
             jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.bfloat16)]
    proj = jnp.stack([ref_proj, src_proj,
                      src_proj.at[:3, 3].mul(0.5)], 0)[None]
    base = 600.0 + 20.0 * np.sin(np.linspace(0, 3, H))[:, None] \
        + 10.0 * np.cos(np.linspace(0, 2, W))[None, :]
    perpix = jnp.asarray((base[None] + np.linspace(-15, 15, D)[:, None, None]
                          ).astype(np.float32))[None]
    for hyp in (depths[None], perpix):
        cv = fused_cost_volume_px(feats, proj, hyp, (H, W),
                                  agg="variance", KR=18, interpret=True)
        fns = [(lambda i=i, hyp=hyp: plane_sweep_warp(
            feats[i], proj[:, i], proj[:, 0], hyp, (H, W)))
            for i in (1, 2)]
        want_cv = variance_cost_volume(feats[0], warp_fns=fns, num_depth=D)
        assert cv.shape == want_cv.shape == (1, D, H, W, C)
        assert np.abs(np.asarray(cv, np.float32)
                      - np.asarray(want_cv, np.float32)).max() < 0.15


def test_px_kernel_tier_b_wide_window_interpret():
    """TIER_B (KY=8, NT=3) px kernel == exact gather on geometry whose
    yspan exceeds the default KY=2 window (the realistic-DTU-eval regime,
    tools/eval_span_study.py)."""
    from wildmvs.ops.mosaic_sweep import (TIER_B, mosaic_sweep_warp_px,
                                          mvsnet_planes, sweep_spans_px,
                                          tier_b_kr)

    H, W, C, D = 24, 160, 8, 8
    rng = np.random.default_rng(41)
    src = jnp.asarray(rng.standard_normal((H, W, C)), jnp.bfloat16)
    src_proj, ref_proj = _rig(H, W, roll=0.04)
    depths = jnp.linspace(425.0, 935.0, D).astype(jnp.float32)

    P, Q, sx, sy = mvsnet_planes(src_proj, ref_proj, (H, W))
    planA = sweep_spans_px(P, Q, depths, (H, W))
    planB = sweep_spans_px(P, Q, depths, (H, W), nt=TIER_B["NT"])
    assert int(planA["yspan"]) > 1, "geometry must exceed tier A"
    assert int(planB["yspan"]) <= TIER_B["KY"] - 1
    assert int(planB["xover"]) <= 0

    KRb = tier_b_kr((H, W), C)
    assert int(planB["wspan"]) <= KRb - TIER_B["KY"]
    out = mosaic_sweep_warp_px(src, P, Q, depths, planB, KY=TIER_B["KY"],
                               KR=KRb, NT=TIER_B["NT"], interpret=True)
    want = plane_sweep_warp(src[None].astype(jnp.float32), src_proj[None],
                            ref_proj[None], depths[None], (H, W))[0]
    out_hw = np.asarray(jnp.transpose(out, (0, 1, 3, 2)), np.float32)
    assert np.abs(out_hw - np.asarray(want, np.float32)).max() < 0.08


def test_warp_mosaic_impl_dispatches_tier_b(monkeypatch):
    """The per-pixel dispatch takes tier B (not the gather) for
    moderate-roll geometry, and the gather for extreme geometry — observed
    with a sentinel kernel."""
    import wildmvs.ops.mosaic_sweep as ms

    monkeypatch.setattr(
        ms, "mosaic_sweep_warp_px",
        lambda src, P, Q, sv, plan, **k: jnp.full(
            (sv.shape[0], P.shape[1], src.shape[-1], P.shape[2]), -7.0,
            jnp.bfloat16))

    H, W, C, D = 24, 160, 8, 6
    rng = np.random.default_rng(42)
    src = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.bfloat16)
    base = 600.0 + 10.0 * np.sin(np.linspace(0, 3, H))[:, None] \
        + 5.0 * np.cos(np.linspace(0, 2, W))[None, :]
    perpix = jnp.asarray(
        (base[None] + np.linspace(-15, 15, D)[:, None, None]
         ).astype(np.float32))[None]

    src_proj, ref_proj = _rig(H, W, roll=0.04)   # yspan > 1, fits tier B
    out = ms._warp_mosaic_impl(src, src_proj[None], ref_proj[None],
                               perpix, (H, W))
    assert (np.asarray(out, np.float32) == -7.0).all(), \
        "moderate roll must dispatch a kernel tier, not the gather"

    src_proj2, ref_proj2 = _rig(H, W, roll=1.2)  # extreme: nothing fits
    out2 = ms._warp_mosaic_impl(src, src_proj2[None], ref_proj2[None],
                                perpix, (H, W))
    assert not (np.asarray(out2, np.float32) == -7.0).all(), \
        "extreme geometry must fall back to the gather"


def test_cost_volume_mosaic_big_table_streams(monkeypatch):
    """Big-table regime (resident corner table over budget — the full-res
    DTU eval case): cost_volume_mosaic must dispatch the fused streamed
    kernel with the per-view STREAMED fallback (never compiling the
    resident v1 branch) and still match the gather aggregation."""
    import wildmvs.ops.mosaic_sweep as ms
    from wildmvs.ops.volumes import variance_cost_volume

    # force the big-table regime + interpret-mode kernels on CPU
    monkeypatch.setattr(ms, "TABLE_VMEM_LIMIT", 1)
    real_fused = ms.fused_cost_volume_px
    monkeypatch.setattr(
        ms, "fused_cost_volume_px",
        lambda *a, **k: real_fused(*a, **{**k, "interpret": True}))
    real_px = ms.mosaic_sweep_warp_px
    monkeypatch.setattr(
        ms, "mosaic_sweep_warp_px",
        lambda *a, **k: real_px(*a, **{**k, "interpret": True}))
    monkeypatch.setattr(
        ms, "fused_supported",
        lambda ref_hw, src_hw, c, nv, dtype, KY=2:
            dtype == jnp.bfloat16
            and ms.fused_window_rows(src_hw, c, nv) > KY)

    rng = np.random.default_rng(21)
    B, N, H, W, C, D = 1, 3, 16, 40, 8, 12
    feats = jnp.asarray(rng.standard_normal((B, N, H, W, C)), jnp.bfloat16)
    src_proj, ref_proj = _rig(H, W)
    proj = jnp.stack([ref_proj, src_proj,
                      src_proj.at[:3, 3].mul(0.5)], 0)[None]
    depths = jnp.linspace(425.0, 935.0, D).astype(jnp.float32)[None]

    cv = ms.cost_volume_mosaic(feats, proj, [1, 2], 0, depths, (H, W),
                               "variance", D)
    fns = [(lambda i=i: plane_sweep_warp(feats[:, i], proj[:, i],
                                         proj[:, 0], depths, (H, W)))
           for i in (1, 2)]
    want = variance_cost_volume(feats[:, 0], warp_fns=fns, num_depth=D)
    assert cv.shape == want.shape == (B, D, H, W, C)
    assert np.abs(np.asarray(cv, np.float32)
                  - np.asarray(want, np.float32)).max() < 0.15

    # softmin big-table: fused + per-view streamed softmin fallback
    from wildmvs.ops.volumes import softmin_cost_volume
    temp = jnp.ones((1,), jnp.float32)
    cvs = ms.cost_volume_mosaic(feats, proj, [1, 2], 0, depths, (H, W),
                                "softmin", D, temp=temp)
    want_s = softmin_cost_volume(feats[:, 0], warp_fns=fns,
                                 temperature=temp)
    assert np.abs(np.asarray(cvs, np.float32)
                  - np.asarray(want_s, np.float32)).max() < 0.15

    # ineligible fused + big table must raise, not compile the resident v1
    monkeypatch.setattr(ms, "fused_supported", lambda *a, **k: False)
    with pytest.raises(ValueError, match="corner table"):
        ms.cost_volume_mosaic(feats, proj, [1, 2], 0, depths, (H, W),
                              "variance", D)


def test_warp_mosaic_per_pixel_custom_vjp():
    """plane_sweep_warp_mosaic with [B, D, H, W] hypothesis maps (the CVP
    train refinement configuration): forward == gather to bf16 rounding
    (interpret); feature gradient via the Mosaic scatter kernel (f32
    accumulate) no worse than the bf16 gather transpose; depth cotangent
    zero (no-grad grid)."""
    from wildmvs.ops.mosaic_sweep import plane_sweep_warp_mosaic

    H, W, C, D = 16, 40, 8, 4
    rng = np.random.default_rng(21)
    src = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.bfloat16)
    src_proj, ref_proj = _rig(H, W)
    base = 600.0 + 30.0 * np.sin(np.linspace(0, 3, H))[:, None] \
        + 10.0 * np.cos(np.linspace(0, 2, W))[None, :]
    hyp = jnp.asarray((base[None] + np.linspace(-15, 15, D)[:, None, None]
                       ).astype(np.float32))[None]
    cot = jnp.asarray(rng.standard_normal((1, D, H, W, C)), jnp.bfloat16)

    out_m, vjp_m = jax.vjp(
        lambda f, d: plane_sweep_warp_mosaic(f, src_proj[None],
                                             ref_proj[None], d, (H, W),
                                             True), src, hyp)
    out_g, vjp_g = jax.vjp(
        lambda f, d: plane_sweep_warp(f, src_proj[None], ref_proj[None],
                                      d, (H, W)), src, hyp)
    assert np.abs(np.asarray(out_m, np.float32)
                  - np.asarray(out_g, np.float32)).max() < 0.08
    gm = vjp_m(cot)
    gg = vjp_g(cot)
    # feature cotangent: Mosaic scatter (f32 accumulate) vs f32 truth —
    # no worse than the bf16 gather transpose, within rounding tolerance
    tr32 = jax.vjp(
        lambda f: plane_sweep_warp(f, src_proj[None], ref_proj[None],
                                   hyp, (H, W)), src.astype(jnp.float32))[1]
    g32 = np.asarray(tr32(cot.astype(jnp.float32))[0], np.float32)
    scale = max(1.0, np.abs(g32).max())
    a0 = np.asarray(gm[0], np.float32)
    b0 = np.asarray(gg[0], np.float32)
    assert np.abs(a0 - g32).max() <= np.abs(b0 - g32).max() + 0.02 * scale
    assert np.abs(a0 - g32).max() < 0.02 * scale
    # depth cotangent: zero on BOTH paths (no-grad grid, module.py:127)
    np.testing.assert_array_equal(np.asarray(gm[1], np.float32), 0.0)
    np.testing.assert_array_equal(np.asarray(gg[1], np.float32), 0.0)


def test_homography_warp_mosaic_custom_vjp():
    """homography_sweep_warp_mosaic (the Vis-MVSNet train-path kernel):
    forward == gather homography warp to bf16 rounding; feature gradient
    via the Mosaic scatter kernel no worse than the bf16 gather
    transpose; the re-centered per-pixel depth_start slab gets a ZERO
    cotangent (no-grad grid, homography.py:25/92/110)."""
    from wildmvs.ops.mosaic_sweep import homography_sweep_warp_mosaic
    from wildmvs.ops.plane_sweep import homography_sweep_warp

    H, W, C, D = 32, 48, 8, 6
    rng = np.random.default_rng(22)
    src = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.bfloat16)
    yaw = 0.02
    Ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                   [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
    K = jnp.asarray(np.array([[60.0, 0, W / 2], [0, 60.0, H / 2],
                              [0, 0, 1]], np.float32))[None]
    R0 = jnp.asarray(np.eye(3, dtype=np.float32))[None]
    Rs = jnp.asarray(Ry)[None]
    t0 = jnp.zeros((1, 3, 1))
    ts = jnp.asarray(np.array([[[2.0], [0.5], [0.0]]], np.float32))
    start = jnp.asarray(500.0 + 30.0 * np.sin(
        np.linspace(0, 3, H * W)).reshape(1, 1, H, W).astype(np.float32))
    interval = jnp.full((1, 1, 1, 1), 40.0)
    cot = jnp.asarray(rng.standard_normal((1, D, H, W, C)), jnp.bfloat16)

    out_m, vjp_m = jax.vjp(
        lambda f, ds: homography_sweep_warp_mosaic(
            f, K, R0, t0, K, Rs, ts, D, ds, interval, (H, W), True),
        src, start)
    out_g, vjp_g = jax.vjp(
        lambda f, ds: homography_sweep_warp(
            f, K, R0, t0, K, Rs, ts, D, ds, interval, (H, W)), src, start)
    assert np.abs(np.asarray(out_m, np.float32)
                  - np.asarray(out_g, np.float32)).max() < 0.08
    gm = vjp_m(cot)
    gg = vjp_g(cot.astype(out_g.dtype))
    # feature cotangent: Mosaic scatter (f32 accumulate) vs f32 truth
    tr32 = jax.vjp(
        lambda f: homography_sweep_warp(
            f, K, R0, t0, K, Rs, ts, D, start, interval, (H, W)),
        src.astype(jnp.float32))[1]
    g32 = np.asarray(tr32(cot.astype(jnp.float32))[0], np.float32)
    scale = max(1.0, np.abs(g32).max())
    a0 = np.asarray(gm[0], np.float32)
    b0 = np.asarray(gg[0], np.float32)
    assert np.abs(a0 - g32).max() <= np.abs(b0 - g32).max() + 0.02 * scale
    assert np.abs(a0 - g32).max() < 0.02 * scale
    # slab-start cotangent: zero on BOTH paths (no-grad grid,
    # homography.py:25/92/110)
    np.testing.assert_array_equal(np.asarray(gm[1], np.float32), 0.0)
    np.testing.assert_array_equal(np.asarray(gg[1], np.float32), 0.0)


def test_homography_gwc_volume_mosaic_interpret():
    """Fused warp + group-wise correlation == gather warp then
    groupwise_correlation (the Vis-MVSNet per-pair cost volume), scalar
    and per-pixel slab starts."""
    from wildmvs.ops.mosaic_sweep import homography_gwc_volume_mosaic
    from wildmvs.ops.plane_sweep import homography_sweep_warp
    from wildmvs.ops.volumes import groupwise_correlation

    H, W, C, D, G = 32, 48, 16, 6, 8
    rng = np.random.default_rng(31)
    src = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.bfloat16)
    ref = jnp.asarray(rng.standard_normal((1, H, W, C)), jnp.bfloat16)
    yaw = 0.02
    Ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                   [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
    K = jnp.asarray(np.array([[60.0, 0, W / 2], [0, 60.0, H / 2],
                              [0, 0, 1]], np.float32))[None]
    R0 = jnp.asarray(np.eye(3, dtype=np.float32))[None]
    Rs = jnp.asarray(Ry)[None]
    t0 = jnp.zeros((1, 3, 1))
    ts = jnp.asarray(np.array([[[2.0], [0.5], [0.0]]], np.float32))

    for start in (jnp.full((1, 1, 1, 1), 425.0),
                  jnp.asarray(500.0 + 30.0 * np.sin(
                      np.linspace(0, 3, H * W)).reshape(1, 1, H, W)
                      .astype(np.float32))):
        interval = jnp.full((1, 1, 1, 1), 40.0)
        warped = homography_sweep_warp(src.astype(jnp.float32), K, R0, t0,
                                       K, Rs, ts, D, start, interval,
                                       (H, W))
        want = groupwise_correlation(
            jnp.broadcast_to(ref.astype(jnp.float32)[:, None],
                             warped.shape), warped, G)
        got = homography_gwc_volume_mosaic(src, ref, K, R0, t0, K, Rs, ts,
                                           D, start, interval, (H, W),
                                           groups=G, interpret=True)
        a = np.asarray(got, np.float32)
        b = np.asarray(want, np.float32)
        assert a.shape == b.shape == (1, D, H, W, G)
        # bf16 table/features + f32 in-kernel accumulation vs f32 gather:
        # tolerance scales with the gs=C/G-term dot products
        assert np.abs(a - b).max() < 0.35, np.abs(a - b).max()
        assert (np.abs(b) > 0).mean() > 0.3


def test_mosaic_scatter_px_matches_f32_transpose():
    """mosaic_scatter_px (the warp backward's scatter kernel): per-pixel
    hypothesis maps, interpret mode, against the f32-truth XLA gather
    transpose — the kernel's f32 canvas accumulation should land within
    bf16-weight rounding of the truth.  Also covers the channel-split
    path (vmem_budget forced tiny)."""
    from wildmvs.ops.grid_sample import grid_sample_xy
    from wildmvs.ops.mosaic_sweep import (mosaic_scatter_px, mvsnet_planes,
                                          sweep_spans_px, _plan_fit_scatter)
    from wildmvs.ops.plane_sweep import sweep_grid_xy

    H, W, C, D = 16, 40, 8, 4
    rng = np.random.default_rng(33)
    src_proj, ref_proj = _rig(H, W)
    base = 600.0 + 30.0 * np.sin(np.linspace(0, 3, H))[:, None] \
        + 10.0 * np.cos(np.linspace(0, 2, W))[None, :]
    hyp = jnp.asarray((base[None] + np.linspace(-15, 15, D)[:, None, None]
                       ).astype(np.float32))[None]
    g = jnp.asarray(rng.standard_normal((D, H, W, C)), jnp.bfloat16)

    xn, yn = sweep_grid_xy(src_proj[None], ref_proj[None], hyp, (H, W),
                           (H, W))
    tr32 = jax.linear_transpose(
        lambda im: jax.vmap(lambda i, gx, gy: grid_sample_xy(
            i, gx, gy, align_corners=True))(im, xn, yn),
        jax.ShapeDtypeStruct((1, H, W, C), jnp.float32))
    (g32,) = tr32(g[None].astype(jnp.float32))
    g32 = np.asarray(g32[0], np.float32)

    P, Q, sx, sy = mvsnet_planes(src_proj, ref_proj, (H, W))
    plan = sweep_spans_px(P, Q, hyp[0], (H, W), sx=sx, sy=sy)
    assert bool(_plan_fit_scatter(plan, 2))
    df = np.asarray(mosaic_scatter_px(g, P, Q, hyp[0], plan, (H, W),
                                      interpret=True), np.float32)
    scale = max(1.0, np.abs(g32).max())
    assert np.abs(df - g32).max() < 0.02 * scale, np.abs(df - g32).max()

    # channel-split path (canvas forced over a tiny budget): identical
    df2 = np.asarray(mosaic_scatter_px(g, P, Q, hyp[0], plan, (H, W),
                                       vmem_budget=1024, interpret=True),
                     np.float32)
    np.testing.assert_array_equal(df, df2)


def test_kernel_ky1_matches_gather_when_span_zero():
    """KY=1 resident tier (r5): when every chunk's row span is 0 the
    prefetched ybase IS each pixel's candidate row — one gather per
    (chunk, x-tile), no row select — and must still equal the gather."""
    from wildmvs.ops.mosaic_sweep import (mosaic_sweep_warp, rot_planes,
                                          sweep_spans)

    H, W, C, D = 16, 40, 8, 6
    rng = np.random.default_rng(11)
    src = jnp.asarray(rng.standard_normal((H, W, C)), jnp.bfloat16)
    # pure-x translation, identity rotation: the source row coordinate is
    # depth-independent, so every chunk's span is exactly 0
    K = jnp.asarray(np.array([[50.0, 0, W / 2], [0, 50.0, H / 2],
                              [0, 0, 1.0]], np.float32))
    P0 = jnp.eye(4)
    P0 = P0.at[:3, :3].set(K)
    P1 = P0.at[0, 3].set(50.0 * 2.0)   # K @ t with t = (2, 0, 0)
    src_proj, ref_proj = P1, P0
    depths = jnp.linspace(425.0, 935.0, D).astype(jnp.float32)
    ref = plane_sweep_warp(src[None].astype(jnp.float32), src_proj[None],
                           ref_proj[None], depths[None], (H, W))[0]
    rxyz, trans = rot_planes(src_proj, ref_proj, (H, W))
    ybase, span = sweep_spans(rxyz, trans, depths, (H, W))
    assert int(span) == 0, int(span)
    out = mosaic_sweep_warp(src, rxyz, trans, depths, ybase, KY=1,
                            interpret=True)
    out_hw = np.asarray(jnp.transpose(out, (0, 1, 3, 2)), np.float32)
    assert np.abs(out_hw - np.asarray(ref)).max() < 0.08
    assert (np.abs(np.asarray(ref)) > 0).mean() > 0.5

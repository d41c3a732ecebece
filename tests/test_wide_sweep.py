"""Octet wide-gather sweep warp vs the exact gather path (CPU)."""
import numpy as np
import jax.numpy as jnp

from wildmvs.ops.plane_sweep import plane_sweep_warp
from wildmvs.ops.wide_sweep import (octet_spans, plane_sweep_warp_wide, Q)
from wildmvs.ops.pallas_sweep import sweep_coords_from_projs
from wildmvs.geometry.projective import build_proj_matrices


def _scene(n=2, fh=32, fw=40, angle=0.02):
    rng = np.random.default_rng(0)
    K = np.array([[50.0, 0, fw / 2], [0, 50.0, fh / 2], [0, 0, 1]], np.float32)
    ca, sa = np.cos(angle), np.sin(angle)
    R2 = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32)
    Rs = np.stack([np.eye(3, dtype=np.float32), R2])
    ts = np.stack([np.zeros((3, 1), np.float32),
                   np.array([[0.15], [0.02], [0.0]], np.float32)])
    proj = build_proj_matrices(jnp.array(np.tile(K, (n, 1, 1)))[None],
                               jnp.array(Rs)[None], jnp.array(ts)[None])
    feats = jnp.array(rng.random((n, fh, fw, 8)).astype(np.float32))
    return feats, proj


def test_matches_gather_path_f32():
    feats, proj = _scene()
    depths = jnp.linspace(2.0, 6.0, 12)[None]
    ref = plane_sweep_warp(feats[1][None], proj[:, 1], proj[:, 0], depths,
                           (32, 40))
    out = plane_sweep_warp_wide(feats[1][None], proj[:, 1], proj[:, 0],
                                depths, (32, 40))
    xs, ys = sweep_coords_from_projs(proj[0, 1], proj[0, 0], depths[0],
                                     (32, 40))
    sx, sy = octet_spans(xs, ys, 32, 40)
    assert int(sx) <= Q and int(sy) <= 1  # wide branch actually taken
    # f32 on CPU: identical arithmetic up to the NDC round-trip of the
    # gather path's coords
    assert float(jnp.abs(out - ref).max()) < 1e-4


def test_behind_camera_and_oob_zero():
    feats, proj = _scene()
    depths = jnp.array([[-1.0, 100.0]])  # behind camera + far out of frustum
    out = plane_sweep_warp_wide(feats[1][None], proj[:, 1], proj[:, 0],
                                depths, (32, 40))
    ref = plane_sweep_warp(feats[1][None], proj[:, 1], proj[:, 0], depths,
                           (32, 40))
    assert float(jnp.abs(out - ref).max()) < 1e-4


def test_span_fallback_on_strong_roll():
    # a strong in-plane roll breaks the octet span assumptions: the runtime
    # cond must fall back to the exact gather (f32-identical)
    feats, _ = _scene()
    a = 0.6
    ca, sa = np.cos(a), np.sin(a)
    Rbig = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]], np.float32)
    K = np.array([[50.0, 0, 20.0], [0, 50.0, 16.0], [0, 0, 1]], np.float32)
    t = np.stack([np.zeros((3, 1), np.float32),
                  np.array([[0.1], [0.02], [0]], np.float32)])
    proj = build_proj_matrices(
        jnp.array(np.tile(K, (1, 2, 1, 1))),
        jnp.array(np.stack([np.eye(3, dtype=np.float32), Rbig]))[None],
        jnp.array(t)[None])
    depths = jnp.linspace(2.0, 6.0, 12)[None]
    xs, ys = sweep_coords_from_projs(proj[0, 1], proj[0, 0], depths[0],
                                     (32, 40))
    sx, sy = octet_spans(xs, ys, 32, 40)
    assert int(sy) > 1 or int(sx) > Q  # spans exceeded -> gather branch
    ref = plane_sweep_warp(feats[1][None], proj[:, 1], proj[:, 0], depths,
                           (32, 40))
    out = plane_sweep_warp_wide(feats[1][None], proj[:, 1], proj[:, 0],
                                depths, (32, 40))
    # gather branch taken: gather-grade accuracy (only FMA-fusion noise
    # between the cond-branch and standalone compilations)
    assert float(jnp.abs(out - ref).max()) < 1e-5


def test_cost_volume_wide_matches_gather_aggregation():
    from wildmvs.ops.volumes import variance_cost_volume
    from wildmvs.ops.wide_sweep import cost_volume_wide
    feats, proj = _scene()
    depths = jnp.linspace(2.0, 6.0, 12)[None]

    def agg(ref_feat, fns):
        return variance_cost_volume(ref_feat, warp_fns=fns, num_depth=12)

    ref_cv = agg(feats[0][None],
                 [lambda: plane_sweep_warp(feats[1][None], proj[:, 1],
                                           proj[:, 0], depths, (32, 40))])
    cv = cost_volume_wide(feats[None], proj, [1], 0, depths, (32, 40), agg)
    assert cv.shape == ref_cv.shape
    assert float(jnp.abs(cv - ref_cv).max()) < 1e-4


def test_mvsnet_wide_matches_gather():
    import jax
    from wildmvs.models import build_model
    rng = np.random.default_rng(1)
    b, n, h, w = 1, 3, 64, 96
    imgs = jnp.array(rng.random((b, n, h, w, 3)).astype(np.float32))
    K = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]], np.float32)
    K = jnp.array(np.tile(K, (b, n, 1, 1)))
    R = jnp.array(np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1)))
    t = np.zeros((b, n, 3, 1), np.float32)
    for i in range(n):
        t[:, i, 0, 0] = 0.05 * i
    t = jnp.array(t)
    dmin = jnp.full((b, n), 2.0)
    dmax = jnp.full((b, n), 6.0)

    m_g = build_model("mvsnet", num_depth=16, sweep_method="gather")
    m_w = build_model("mvsnet", num_depth=16, sweep_method="wide")
    v = m_g.init(jax.random.PRNGKey(0), imgs, K, R, t, dmin, dmax,
                 train=False)
    d_g = m_g.apply(v, imgs, K, R, t, dmin, dmax, train=False)["depth"]
    d_w = m_w.apply(v, imgs, K, R, t, dmin, dmax, train=False)["depth"]
    assert float(jnp.abs(d_g - d_w).max()) < 1e-3


def test_non_multiple_of_8_width_falls_back():
    feats, proj = _scene(fw=42)
    depths = jnp.linspace(2.0, 6.0, 6)[None]
    ref = plane_sweep_warp(feats[1][None], proj[:, 1], proj[:, 0], depths,
                           (32, 42))
    out = plane_sweep_warp_wide(feats[1][None], proj[:, 1], proj[:, 0],
                                depths, (32, 42))
    assert float(jnp.abs(out - ref).max()) < 1e-5

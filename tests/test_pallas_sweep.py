"""Pallas sweep kernel vs the exact gather path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

import wildmvs.ops.pallas_sweep as psw
from wildmvs.ops.plane_sweep import plane_sweep_warp
from wildmvs.geometry.projective import build_proj_matrices


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(psw.pl, "pallas_call", patched)


def _scene(n=3, fh=32, fw=40):
    rng = np.random.default_rng(0)
    K = np.array([[50.0, 0, fw / 2], [0, 50.0, fh / 2], [0, 0, 1]], np.float32)
    Rs = []
    for i in range(n):
        a = 0.02 * (i - 1)
        ca, sa = np.cos(a), np.sin(a)
        Rs.append(np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32))
    ts = np.stack([np.array([[0.1 * i], [0.02 * i], [0]], np.float32)
                   for i in range(n)])
    proj = build_proj_matrices(jnp.array(np.tile(K, (n, 1, 1)))[None],
                               jnp.array(np.stack(Rs))[None],
                               jnp.array(ts)[None])
    feats = jnp.array(rng.random((n, fh, fw, 8)).astype(np.float32))
    return feats, proj


def test_matches_gather_path():
    feats, proj = _scene()
    depths = jnp.linspace(2.0, 6.0, 12)[None]
    ref = plane_sweep_warp(feats[1][None], proj[:, 1], proj[:, 0], depths,
                           (32, 40))
    out = psw.pallas_plane_sweep_warp(feats[1][None], proj[:, 1], proj[:, 0],
                                      depths, (32, 40), K=16, RB=8)
    rel = float(jnp.abs(out - ref).mean() / (jnp.abs(ref).mean() + 1e-9))
    assert rel < 5e-3, rel  # bf16 weight/feature rounding only


def test_select4_matches_gather_path():
    feats, proj = _scene()
    depths = jnp.linspace(2.0, 6.0, 12)[None]
    ref = plane_sweep_warp(feats[1][None], proj[:, 1], proj[:, 0], depths,
                           (32, 40))
    out = psw.pallas_plane_sweep_warp(feats[1][None], proj[:, 1], proj[:, 0],
                                      depths, (32, 40), K=16, RB=8,
                                      variant="select4")
    rel = float(jnp.abs(out - ref).mean() / (jnp.abs(ref).mean() + 1e-9))
    assert rel < 5e-3, rel  # bf16 feature rounding only


def test_fast_path_cond_dispatch():
    feats, proj = _scene()
    depths = jnp.linspace(2.0, 6.0, 12)[None]
    ref = plane_sweep_warp(feats[1][None], proj[:, 1], proj[:, 0], depths,
                           (32, 40))
    out = psw.plane_sweep_warp_fast(feats[1][None], proj[:, 1], proj[:, 0],
                                    depths, (32, 40), K=16, RB=8)
    rel = float(jnp.abs(out - ref).mean() / (jnp.abs(ref).mean() + 1e-9))
    assert rel < 5e-3, rel

    # a strong in-plane roll makes the row span exceed the K window: the
    # runtime cond must fall back to the exact gather (f32-identical)
    import numpy as np
    from wildmvs.geometry.projective import build_proj_matrices
    a = 0.5
    ca, sa = np.cos(a), np.sin(a)
    Rbig = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]], np.float32)
    K = np.array([[50.0, 0, 20.0], [0, 50.0, 16.0], [0, 0, 1]], np.float32)
    t = np.stack([np.zeros((3, 1), np.float32),
                  np.array([[0.1], [0.02], [0]], np.float32)])
    proj2 = build_proj_matrices(
        jnp.array(np.tile(K, (1, 2, 1, 1))),
        jnp.array(np.stack([np.eye(3, dtype=np.float32), Rbig]))[None],
        jnp.array(t)[None])
    xs, ys = psw.sweep_coords_from_projs(proj2[0, 1], proj2[0, 0], depths[0],
                                         (32, 40))
    assert int(psw.sweep_window_span(ys, 32, 8)) > 15
    ref2 = plane_sweep_warp(feats[1][None], proj2[:, 1], proj2[:, 0], depths,
                            (32, 40))
    out2 = psw.plane_sweep_warp_fast(feats[1][None], proj2[:, 1],
                                     proj2[:, 0], depths, (32, 40),
                                     K=16, RB=8)
    assert float(jnp.abs(out2 - ref2).max()) < 1e-4  # gather branch taken


def test_behind_camera_and_oob_zero():
    feats, proj = _scene()
    depths = jnp.array([[-1.0, 100.0]])  # behind camera + far out of frustum
    out = psw.pallas_plane_sweep_warp(feats[1][None], proj[:, 1], proj[:, 0],
                                      depths, (32, 40), K=16, RB=8)
    assert float(jnp.abs(out[:, 0]).max()) == 0.0  # behind-camera slab -> 0
    assert np.isfinite(np.asarray(out)).all()

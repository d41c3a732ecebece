"""Geometry core tests: closed-form identities + round trips."""
import numpy as np
import jax.numpy as jnp

from wildmvs.geometry import projective as geo
from .conftest import make_scene


def test_build_proj_matrices_structure(rng):
    K, R, t = make_scene(rng)
    P = np.asarray(geo.build_proj_matrices(jnp.array(K), jnp.array(R), jnp.array(t)))
    np.testing.assert_allclose(P[:, :3, :3], K @ R, rtol=1e-5)
    np.testing.assert_allclose(P[:, :3, 3:], K @ t, rtol=1e-5)
    np.testing.assert_allclose(P[:, 3], np.tile([0, 0, 0, 1], (3, 1)), atol=0)


def test_project_unproject_roundtrip(rng):
    K, R, t = make_scene(rng)
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    pts[:, 2] += 5.0  # in front of all cameras
    xy, depth = geo.project(jnp.array(pts), jnp.array(K[0]), jnp.array(R[0]),
                            jnp.array(t[0]))
    back = geo.unproject(xy, jnp.array(K[0]), jnp.array(R[0]), jnp.array(t[0]), depth)
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-4, atol=1e-4)


def test_identity_pose_projection_is_pinhole(rng):
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.zeros((3, 1), np.float32)
    pts = np.array([[0, 0, 2.0], [1, 1, 4.0]], np.float32)
    xy, depth = geo.project(jnp.array(pts), jnp.array(K), jnp.array(R), jnp.array(t))
    np.testing.assert_allclose(np.asarray(depth), [2, 4], rtol=1e-6)
    # (1,1,4) -> K @ p = (100+32*4, 100+24*4, 4) -> (228, 196)/4 = (57, 49)
    np.testing.assert_allclose(np.asarray(xy), [[32, 24], [57, 49]], rtol=1e-5)


def test_flows_identity_pair_is_identity_grid(rng):
    # two identical cameras: flow must equal the pixel grid, src depth == ref depth
    K, R, t = make_scene(rng, n_views=1, noise=0.0)
    K = np.concatenate([K, K]); R = np.concatenate([R, R]); t = np.concatenate([t, t])
    P = geo.build_proj_matrices(jnp.array(K)[None], jnp.array(R)[None], jnp.array(t)[None])
    h, w = 5, 6
    depth = np.full((1, h, w), 3.0, np.float32)
    flows, sdepth = geo.flows_from_single_depthmap(jnp.array(depth), P, 0)
    grid = np.asarray(geo.pixel_grid(h, w))
    np.testing.assert_allclose(np.asarray(flows[0, 0]), grid, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sdepth), 3.0, rtol=1e-5)


def test_quat_rot_roundtrip(rng):
    q = rng.standard_normal((20, 4)).astype(np.float64)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    R = geo.quat_to_rot(jnp.array(q))
    q2 = np.asarray(geo.rot_to_quat(R))
    # q and -q encode the same rotation
    sign = np.sign(np.sum(q2 * q, axis=1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


def test_rot_to_quat_all_branches():
    # rotations exercising each dominant-diagonal branch
    Rs = []
    for axis, angle in [(0, 0.1), (0, np.pi - 0.1), (1, np.pi - 0.1), (2, np.pi - 0.1)]:
        c, s = np.cos(angle), np.sin(angle)
        if axis == 0:
            Rs.append(np.array([[1, 0, 0], [0, c, -s], [0, s, c]]))
        elif axis == 1:
            Rs.append(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]))
        else:
            Rs.append(np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]))
    Rs = np.stack(Rs)
    q = geo.rot_to_quat(jnp.array(Rs))
    R2 = np.asarray(geo.quat_to_rot(q))
    np.testing.assert_allclose(R2, Rs, atol=1e-5)


def test_relative_pose_composition(rng):
    K, R, t = make_scene(rng, n_views=2)
    Rrel, trel = geo.relative_pose(jnp.array(R[0]), jnp.array(t[0]),
                                   jnp.array(R[1]), jnp.array(t[1]))
    # a world point seen in cam1 then moved by the relative pose == cam2 coords
    pts = rng.standard_normal((10, 3)).astype(np.float32) + [0, 0, 4]
    cam1 = pts @ R[0].T + t[0].T
    cam2 = pts @ R[1].T + t[1].T
    moved = cam1 @ np.asarray(Rrel).T + np.asarray(trel).T
    np.testing.assert_allclose(moved, cam2, rtol=1e-4, atol=1e-4)


def test_triangulation_angle_90deg():
    # point at origin-ish, cameras on x and z axes -> 90 degrees
    pc = np.array([[0.0, 0.0, 1.0]], np.float32)  # in cam1 frame
    R = np.eye(3, dtype=np.float32)
    t = np.array([[1.0], [0.0], [-1.0]], np.float32)  # center of cam2 at (−R^T t)
    ang = np.asarray(geo.compute_triangulation_angle(jnp.array(pc), jnp.array(R),
                                                     jnp.array(t)))
    # ray1 = (0,0,1); ray2 = (1,0,0) -> 90 deg
    np.testing.assert_allclose(ang, [90.0], atol=1e-3)


def test_normalize_unnormalize_roundtrip(rng):
    flow = (rng.random((2, 3, 4, 2)) * 20).astype(np.float32)
    n = geo.normalize_flow(jnp.array(flow), 9, 13, align_corners=True)
    back = geo.unnormalize_flow(n, 9, 13)
    np.testing.assert_allclose(np.asarray(back), flow, rtol=1e-4, atol=1e-4)

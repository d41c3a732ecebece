"""Native matching front-end (known-pose sparse bootstrap) on the
synthetic scene with exact GT geometry."""
import numpy as np
import pytest

from wildmvs.data.matching import (build_tracks, create_sparse_from_known_poses,
                                   fundamental_from_poses, harris_keypoints,
                                   match_pair, patch_descriptors)
from wildmvs.data.synthetic import SyntheticSceneDataset


@pytest.fixture(scope="module")
def scene():
    return SyntheticSceneDataset(num_views=4, height=96, width=128, seed=5)


def _gray(img):
    return img.mean(-1)


def test_harris_finds_texture_corners(scene):
    kp = harris_keypoints(_gray(scene.imgs[0]), max_kp=512)
    assert len(kp) > 50
    assert (kp[:, 0] < scene.imgs[0].shape[1]).all()
    assert (kp[:, 1] < scene.imgs[0].shape[0]).all()


def test_epipolar_gated_matches_are_correct(scene):
    """Matched keypoints, transferred through the GT plane-induced
    geometry, must land on their partners (the scene IS a plane, so GT
    correspondence is exact)."""
    g0, g1 = _gray(scene.imgs[0]), _gray(scene.imgs[1])
    kp0 = harris_keypoints(g0, max_kp=1024)
    kp1 = harris_keypoints(g1, max_kp=1024)
    d0 = patch_descriptors(g0, kp0)
    d1 = patch_descriptors(g1, kp1)
    F = fundamental_from_poses(scene.K[0], scene.R[0], scene.t[0],
                               scene.K[1], scene.R[1], scene.t[1])
    m = match_pair(kp0, d0, kp1, d1, F=F)
    assert len(m) > 50

    # GT transfer: unproject kp0 with the exact synthetic depth, project
    # into view 1
    depth = scene.depths[0]
    xy0 = kp0[m[:, 0]]
    z = depth[xy0[:, 1].astype(int), xy0[:, 0].astype(int)]
    rays = np.concatenate([xy0, np.ones_like(xy0[:, :1])], 1) \
        @ np.linalg.inv(scene.K[0]).T
    cam0 = rays * z[:, None]
    world = (cam0 - scene.t[0][:, 0]) @ scene.R[0]
    cam1 = world @ scene.R[1].T + scene.t[1][:, 0]
    proj = cam1 @ scene.K[1].T
    proj = proj[:, :2] / proj[:, 2:]
    err = np.linalg.norm(proj - kp1[m[:, 1]], axis=1)
    # matches snap to the nearest detected corner: a couple px of detector
    # quantization; the median must be tight and outliers rare
    assert np.median(err) < 2.0
    assert (err < 4.0).mean() > 0.9


def test_build_tracks_drops_inconsistent(scene):
    matches = {(0, 1): np.array([[0, 0], [1, 1]]),
               (1, 2): np.array([[0, 0], [1, 0]])}  # kp2/0 sees two of v1
    ids = build_tracks([3, 3, 3], matches)
    assert ids[0][0] == ids[1][0]  # consistent chain 0-0
    # track {v1:0, v1:1?...}: (0,1)+(1,2) link v1:0 and v1:1 through v2:0
    # -> one track holds two view-1 keypoints -> dropped
    assert ids[1][1] == -1 or ids[1][1] != ids[1][0]


def test_sparse_bootstrap_end_to_end(scene, tmp_path):
    """Detect -> match -> triangulate: the sparse cloud must lie on the GT
    plane (known-pose DLT), and the model must feed the existing COLMAP
    consumers (depth ranges, co-visibility source selection, model IO)."""
    from wildmvs.data.colmap_model import read_model
    from wildmvs.data.colmap_utils import (compute_min_max_depth,
                                           compute_src_images)

    grays = [_gray(scene.imgs[i]) for i in range(4)]
    cams, images, points = create_sparse_from_known_poses(
        grays, scene.K, scene.R, scene.t, out_dir=tmp_path / "sparse")
    assert len(points) > 50

    # triangulated depths match the GT synthetic depths at the keypoints
    errs = []
    for p in points.values():
        i0 = int(p.image_ids[0]) - 1
        kp = images[i0 + 1].xys[int(p.point2D_idxs[0])]
        cam = scene.R[i0] @ p.xyz + scene.t[i0][:, 0]
        gt = scene.depths[i0][int(kp[1]), int(kp[0])]
        errs.append(abs(cam[2] - gt) / gt)
    errs = np.array(errs)
    assert np.median(errs) < 0.02
    assert (errs < 0.1).mean() > 0.9

    # downstream consumers
    Ks, Rs, ts = scene.K, scene.R, scene.t.reshape(4, 3, 1)
    dmin, dmax = compute_min_max_depth(points, images, Ks, Rs, ts)
    zmin, zmax = scene.z_range
    assert (dmin > zmin - 1.5).all() and (dmax < zmax + 1.5).all()
    assert (dmin < dmax).all()
    src = compute_src_images(images, points, Rs, ts,
                             min_triangulation_angle=1.0, nsrc=3)
    assert all(len(s) >= 1 for s in (src.values() if hasattr(src, "values") else src))

    # model round-trips through the standard COLMAP binary format
    c2, i2, p2 = read_model(tmp_path / "sparse", ext=".bin")
    assert len(c2) == 4 and len(i2) == 4 and len(p2) == len(points)
    np.testing.assert_allclose(i2[1].R, scene.R[0], atol=1e-6)

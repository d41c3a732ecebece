"""Codec round-trip tests (PFM, cam.txt, pair.txt, DMB, COLMAP arrays, PLY,
COLMAP sparse model binary+text)."""
import numpy as np

from wildmvs.data import codecs, ply
from wildmvs.data import colmap_model as cm


def test_pfm_roundtrip(tmp_path, rng):
    img = rng.standard_normal((7, 9)).astype(np.float32)
    codecs.write_pfm(tmp_path / "d.pfm", img)
    back, scale = codecs.read_pfm(tmp_path / "d.pfm")
    np.testing.assert_array_equal(back, img)
    img3 = rng.standard_normal((5, 4, 3)).astype(np.float32)
    codecs.write_pfm(tmp_path / "c.pfm", img3)
    back3, _ = codecs.read_pfm(tmp_path / "c.pfm")
    np.testing.assert_array_equal(back3, img3)


def test_cam_txt_roundtrip(tmp_path, rng):
    ext = np.eye(4)
    ext[:3, 3] = [1, 2, 3]
    K = np.array([[100.0, 0, 32], [0, 100, 24], [0, 0, 1]])
    codecs.write_cam_txt(tmp_path / "cam.txt", ext, K, 425.0, 2.5, 192, 905.0)
    cam = codecs.read_cam_txt(tmp_path / "cam.txt")
    np.testing.assert_allclose(cam["extrinsic"], ext)
    np.testing.assert_allclose(cam["intrinsic"], K)
    assert cam["depth_min"] == 425.0 and cam["depth_interval"] == 2.5
    assert cam["depth_max"] == 905.0


def test_pair_txt(tmp_path):
    (tmp_path / "pair.txt").write_text(
        "2\n0\n3 1 54.3 2 33.2 3 10.0\n1\n2 0 99.0 2 1.0\n")
    pairs = codecs.read_pair_txt(tmp_path / "pair.txt")
    assert pairs == [(0, [1, 2, 3]), (1, [0, 2])]


def test_dmb_and_colmap_array_roundtrip(tmp_path, rng):
    d = rng.standard_normal((6, 8)).astype(np.float32)
    codecs.write_dmb(tmp_path / "d.dmb", d)
    np.testing.assert_array_equal(codecs.read_dmb(tmp_path / "d.dmb"), d)
    n = rng.standard_normal((6, 8, 3)).astype(np.float32)
    codecs.write_colmap_array(tmp_path / "d.bin", n)
    np.testing.assert_array_equal(codecs.read_colmap_array(tmp_path / "d.bin"), n)


def test_ply_roundtrip_binary_and_ascii(tmp_path, rng):
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    cols = (rng.random((100, 3)) * 255).astype(np.uint8)
    for binary in (True, False):
        p = tmp_path / f"pc_{binary}.ply"
        ply.write_ply(p, pts, colors=cols, binary=binary)
        v = ply.read_ply(p)
        np.testing.assert_allclose(
            np.stack([v["x"], v["y"], v["z"]], 1), pts, atol=1e-5)
        np.testing.assert_array_equal(
            np.stack([v["red"], v["green"], v["blue"]], 1), cols)
    np.testing.assert_allclose(ply.ply_xyz(tmp_path / "pc_True.ply"), pts,
                               atol=1e-5)


def _tiny_model(rng):
    cams = {1: cm.Camera(1, "PINHOLE", 640, 480,
                         np.array([500.0, 501.0, 320.0, 240.0]))}
    q = np.array([0.99, 0.1, 0.0, 0.0])
    q = q / np.linalg.norm(q)
    images = {
        1: cm.Image(1, q, np.array([0.1, 0.2, 0.3]), 1, "im1.jpg",
                    np.array([[1.0, 2.0], [3.0, 4.0]]),
                    np.array([7, -1], np.int64)),
        2: cm.Image(2, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, "im2.jpg",
                    np.zeros((0, 2)), np.zeros((0,), np.int64)),
    }
    pts = {7: cm.Point3D(7, np.array([0.5, 0.6, 2.0]),
                         np.array([10, 20, 30]), 0.75,
                         np.array([1], np.int32), np.array([0], np.int32))}
    return cams, images, pts


def test_colmap_model_roundtrip(tmp_path, rng):
    cams, images, pts = _tiny_model(rng)
    for ext in (".bin", ".txt"):
        d = tmp_path / ext[1:]
        cm.write_model(cams, images, pts, d, ext)
        c2, i2, p2 = cm.read_model(d, ext)
        assert c2[1].model == "PINHOLE" and c2[1].width == 640
        np.testing.assert_allclose(c2[1].params, cams[1].params)
        np.testing.assert_allclose(i2[1].qvec, images[1].qvec)
        np.testing.assert_allclose(i2[1].xys, images[1].xys)
        np.testing.assert_array_equal(i2[1].point3D_ids, images[1].point3D_ids)
        assert i2[2].name == "im2.jpg" and len(i2[2].xys) == 0
        np.testing.assert_allclose(p2[7].xyz, pts[7].xyz)
        np.testing.assert_array_equal(p2[7].image_ids, pts[7].image_ids)


def test_colmap_autodetect(tmp_path, rng):
    cams, images, pts = _tiny_model(rng)
    cm.write_model(cams, images, pts, tmp_path, ".bin")
    c2, _, _ = cm.read_model(tmp_path)
    assert 1 in c2


def test_qvec_rotmat_roundtrip(rng):
    for _ in range(10):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = cm.qvec2rotmat(q)
        q2 = cm.rotmat2qvec(R)
        np.testing.assert_allclose(q2, q, atol=1e-6)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)

"""Round-trip tests for the external-fuser workspace exporters
(pipeline/export.py) — gipuma/fusibile layout (evaluation/fusibile.py:95-160)
and COLMAP dense workspace (utils/colmap_utils.py:324-400) — verified
through our own codecs."""
import numpy as np
import pytest

from wildmvs.data.codecs import read_colmap_array, read_dmb
from wildmvs.data.colmap_model import read_model
from wildmvs.data.synthetic import SyntheticSceneDataset
from wildmvs.pipeline.export import (colmap_fusion_command,
                                     export_colmap_workspace,
                                     export_gipuma_workspace,
                                     fusibile_command, _proj_matrix)


@pytest.fixture(scope="module")
def stage1(tmp_path_factory):
    """A tiny scene + oracle stage-1 npz cache (GT depths as predictions,
    alternating low/high probability to exercise masking)."""
    ds = SyntheticSceneDataset(num_views=3, height=24, width=32, seed=0)
    depth_dir = tmp_path_factory.mktemp("depthmaps")
    rng = np.random.default_rng(0)
    for i in range(len(ds)):
        s = ds[i]
        prob = rng.uniform(0.0, 1.0, s["depth"].shape).astype(np.float32)
        np.savez_compressed(depth_dir / f"{s['filename']}_out.npz",
                            depthmap=s["depth"].astype(np.float32),
                            probability=prob)
    return ds, depth_dir


def test_gipuma_workspace_roundtrip(stage1, tmp_path):
    ds, depth_dir = stage1
    out = export_gipuma_workspace(ds, depth_dir, tmp_path / "gipuma",
                                  downscale=2)
    for i in range(len(ds)):
        s = ds[i]
        name = s["filename"]
        npz = np.load(depth_dir / f"{name}_out.npz")
        expect = npz["depthmap"].copy()
        expect[npz["probability"] < 0.8] = 0.0

        # depth dmb round-trips with invalid pixels zeroed
        depth = read_dmb(out / f"2333__{name}" / "disp.dmb")
        np.testing.assert_allclose(depth, expect, rtol=1e-6)

        # fake normals: 1/sqrt(3) where depth > 0, zero elsewhere
        normals = read_dmb(out / f"2333__{name}" / "normals.dmb")
        assert normals.shape == expect.shape + (3,)
        np.testing.assert_allclose(
            normals, np.repeat((expect > 0)[..., None], 3, -1) / np.sqrt(3.0),
            atol=1e-6)

        # cams: text 3x4 P with the first two rows / downscale
        lines = (out / "cams" / f"{name}.jpg.P").read_text().strip().split("\n")
        P = np.array([[float(v) for v in ln.split()] for ln in lines])
        expect_P = _proj_matrix(s["K"][0], s["R"][0], s["t"][0])
        expect_P[:2] /= 2
        np.testing.assert_allclose(P, expect_P[:3], rtol=1e-12)

        # image written at depthmap resolution
        from PIL import Image as PILImage
        im = PILImage.open(out / "images" / f"{name}.jpg")
        assert im.size == (expect.shape[1], expect.shape[0])

    cmd = fusibile_command(out, disp_thresh=0.25, num_consistent=3)
    assert "--disp_thresh=0.25" in cmd and "--num_consistent=3" in cmd


def test_colmap_workspace_roundtrip(stage1, tmp_path):
    ds, depth_dir = stage1
    out = export_colmap_workspace(ds, depth_dir, tmp_path / "colmap")

    cameras, images, points = read_model(out / "sparse", ext=".bin")
    assert len(cameras) == len(ds) and len(images) == len(ds)
    by_name = {im.name: im for im in images.values()}
    for i in range(len(ds)):
        s = ds[i]
        name = f"{s['filename']}.jpg"
        im = by_name[name]
        np.testing.assert_allclose(im.R, s["R"][0], atol=1e-8)
        np.testing.assert_allclose(im.t[:, 0], s["t"][0].reshape(3),
                                   atol=1e-8)
        np.testing.assert_allclose(cameras[im.camera_id].K, s["K"][0],
                                   atol=1e-5)

        npz = np.load(depth_dir / f"{s['filename']}_out.npz")
        expect = npz["depthmap"].copy()
        expect[npz["probability"] < 0.8] = 0.0
        depth = read_colmap_array(
            out / "stereo" / "depth_maps" / f"{name}.geometric.bin")
        np.testing.assert_allclose(depth, expect, rtol=1e-6)
        normals = read_colmap_array(
            out / "stereo" / "normal_maps" / f"{name}.geometric.bin")
        np.testing.assert_allclose(
            normals, np.repeat((expect > 0)[..., None], 3, -1) / np.sqrt(3.0),
            atol=1e-6)

    cfg = (out / "stereo" / "fusion.cfg").read_text().strip().split("\n")
    assert cfg == [f"view_{i:04d}.jpg" for i in range(len(ds))]

    cmd = colmap_fusion_command(out, tmp_path / "fused.ply")
    assert "--StereoFusion.max_normal_error" in cmd and "180" in cmd


def test_gipuma_respects_geometric_mask(stage1, tmp_path):
    """A stage-2 geo_mask further invalidates pixels (get_mask parity:
    prob-pass AND geo_mask)."""
    ds, depth_dir = stage1
    filter_dir = tmp_path / "filtering"
    filter_dir.mkdir()
    s = ds[0]
    geo = np.zeros(s["depth"].shape, bool)
    geo[: s["depth"].shape[0] // 2] = True  # top half survives
    for i in range(len(ds)):
        np.savez_compressed(filter_dir / f"{ds[i]['filename']}_out.npz",
                            geo_mask=geo)
    out = export_gipuma_workspace(ds, depth_dir, tmp_path / "gipuma",
                                  filter_dir=filter_dir)
    depth = read_dmb(out / "2333__view_0000" / "disp.dmb")
    assert (depth[s["depth"].shape[0] // 2:] == 0).all()
    npz = np.load(depth_dir / "view_0000_out.npz")
    top_valid = (npz["probability"] >= 0.8)[: s["depth"].shape[0] // 2]
    assert (depth[: s["depth"].shape[0] // 2][top_valid] > 0).any()

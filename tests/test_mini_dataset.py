"""Mini DTU-layout scene tool: loads through the real eval dataset class
and drives the full native pipeline end-to-end (the datasets-absent proxy
for the DTU protocol targets — see BASELINE.md)."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from make_mini_dataset import write_mini_scene  # noqa: E402


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    out = tmp_path_factory.mktemp("mini_dtu")
    scene = write_mini_scene(out, scan="scan1", num_views=4, height=64,
                             width=96, seed=3)
    return out, scene


def test_mini_scene_loads_through_dtu_eval_dataset(mini):
    out, scene = mini
    from wildmvs.data.loaders import DTUEvalDataset

    ds = DTUEvalDataset(out, "scan1", nviews=4)
    assert len(ds) == 4
    s = ds[0]
    assert s["imgs"].shape == (4, 64, 96, 3)
    # jpg round-trip tolerance on the images
    assert np.abs(s["imgs"][0] - scene.imgs[0]).mean() < 0.02
    # geometry must round-trip exactly up to float formatting
    np.testing.assert_allclose(s["R"][0], scene.R[0], atol=1e-6)
    np.testing.assert_allclose(s["t"][0], scene.t[0], atol=1e-6)
    np.testing.assert_allclose(s["K"][0], scene.K[0], atol=1e-4)
    # depth range reconstructs the synthetic z-range (192/128 rescale chain)
    zmin, zmax = scene.z_range
    assert float(s["depth_min"][0]) == pytest.approx(zmin, abs=1e-5)
    assert float(s["depth_max"][0]) == pytest.approx(zmax, rel=1e-5)
    # GT depths written as PFM round-trip
    from wildmvs.data.codecs import read_pfm
    gt, _ = read_pfm(out / "scan1" / "gt_depths" / "00000000.pfm")
    np.testing.assert_allclose(gt, scene.depths[0], rtol=1e-6)


def test_mini_scene_full_pipeline(mini, tmp_path):
    """The real network + full native pipeline (depthmaps -> filtering ->
    fusion) runs end-to-end on the mini scene loaded through the REAL
    DTUEvalDataset and produces a plane-shaped cloud."""
    out, scene = mini
    from wildmvs.data.loaders import DTUEvalDataset
    from wildmvs.pipeline.reconstruction import run_pipeline

    ds = DTUEvalDataset(out, "scan1", nviews=4)
    res = run_pipeline(ds, tmp_path, architecture="mvsnet", scene="scan1",
                       min_tri_angle=0.0, prob_threshold=0.0)
    assert (tmp_path / "Points" / "scan1.ply").exists()
    assert res["num_points"] > 0

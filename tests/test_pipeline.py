"""Reconstruction pipeline tests on the synthetic scene (exact GT depths)."""
import numpy as np
import jax.numpy as jnp
import pytest

from wildmvs.data.synthetic import SyntheticSceneDataset
from wildmvs.pipeline.filtering import geometric_filter
from wildmvs.pipeline.fusion import fuse_depthmaps
from wildmvs.pipeline.depthmaps import get_mask_invalid
from wildmvs.pipeline import metrics3d


@pytest.fixture(scope="module")
def scene():
    return SyntheticSceneDataset(num_views=4, height=48, width=64, seed=3)


def _cams(scene):
    s0 = scene[0]
    # dataset stores per-view K/R/t in original order inside the object
    return scene.K, scene.R, scene.t


def test_geometric_filter_accepts_gt(scene):
    s = scene[0]
    ref_depth = scene.depths[0]
    src_depths = np.stack([scene.depths[i] for i in range(1, 4)])
    masks = geometric_filter(jnp.asarray(ref_depth), jnp.asarray(src_depths),
                             jnp.asarray(s["K"]), jnp.asarray(s["R"]),
                             jnp.asarray(s["t"]), num_consistent=3,
                             min_tri_angle=0.0)
    geo = np.asarray(masks["geo_mask"])
    # GT depths are perfectly consistent: interior pixels must pass
    assert geo[8:-8, 8:-8].mean() > 0.95


def test_geometric_filter_rejects_corrupted(scene):
    s = scene[0]
    ref_depth = scene.depths[0] * 1.5  # inconsistent with the sources
    src_depths = np.stack([scene.depths[i] for i in range(1, 4)])
    masks = geometric_filter(jnp.asarray(ref_depth), jnp.asarray(src_depths),
                             jnp.asarray(s["K"]), jnp.asarray(s["R"]),
                             jnp.asarray(s["t"]), num_consistent=3,
                             min_tri_angle=0.0)
    assert np.asarray(masks["geo_mask"]).mean() < 0.05


def test_fusion_gt_depths_reconstruct_plane(scene):
    K, R, t = _cams(scene)
    depths = np.stack(scene.depths)
    colors = scene.imgs
    points, cols = fuse_depthmaps(depths, K, R, t, colors=colors,
                                  disp_threshold=0.01, num_consistent=3)
    assert points.shape[0] > 500
    assert cols.shape == points.shape
    # all points must lie on the scene plane z = z0 + a x + b y; fit a plane
    # and check residuals are tiny
    A = np.concatenate([points[:, :2], np.ones((len(points), 1))], axis=1)
    coef, res, *_ = np.linalg.lstsq(A, points[:, 2], rcond=None)
    pred_z = A @ coef
    rms = np.sqrt(np.mean((points[:, 2] - pred_z) ** 2))
    assert rms < 0.01, rms


def test_fusion_rejects_inconsistent_view(scene):
    K, R, t = _cams(scene)
    depths = np.stack(scene.depths)
    # corrupt every view differently: no two views agree anywhere, so
    # num_consistent=3 (>= 2 agreeing sources) is unreachable
    for i in range(len(depths)):
        depths[i] *= (1.5 + 0.3 * i)
    points, _ = fuse_depthmaps(depths, K, R, t, num_consistent=3)
    assert points.shape[0] == 0


def test_fusion_used_source_pixels_do_not_vote(scene):
    """A source pixel consumed by an earlier reference round must neither
    vote toward num_consistent nor be re-averaged (fusibile's used-pixel
    semantics). With every source pixel pre-consumed, nothing can pass."""
    from wildmvs.pipeline.fusion import _fuse_one_view
    K, R, t = _cams(scene)
    depths = jnp.asarray(np.stack(scene.depths))
    Kj, Rj, tj = jnp.asarray(K), jnp.asarray(R), jnp.asarray(t)
    fresh = jnp.zeros(depths.shape, bool)
    _, keep0, new_used = _fuse_one_view(jnp.asarray(0), depths, fresh,
                                        Kj, Rj, tj, num_consistent=3)
    assert np.asarray(keep0).sum() > 500
    # the kept reference pixels themselves are consumed for later rounds
    assert (np.asarray(new_used[0]).reshape(-1) >= np.asarray(keep0)).all()
    all_src_used = fresh.at[1:].set(True)
    _, keep1, _ = _fuse_one_view(jnp.asarray(0), depths, all_src_used,
                                 Kj, Rj, tj, num_consistent=3)
    assert np.asarray(keep1).sum() == 0


def test_get_mask_invalid_multistage():
    prob = np.zeros((3, 4, 4), np.float32)
    prob[1, 0, 0] = 0.9  # one stage confident at one pixel
    inv = get_mask_invalid(prob, 0.8)
    assert not inv[0, 0]
    assert inv[1:, :].all()
    geo = np.zeros((4, 4), bool)
    inv2 = get_mask_invalid(prob, 0.8, geo_mask=geo)
    assert inv2.all()  # geometry vetoes everything


def test_reduce_pts_dedup():
    pts = np.array([[0, 0, 0], [0.05, 0, 0], [1, 0, 0], [1.04, 0, 0],
                    [5, 5, 5]], np.float64)
    reduced, keep = metrics3d.reduce_pts(pts, 0.1)
    assert reduced.shape[0] == 3  # two clusters + isolated point
    reduced_c, _ = metrics3d.reduce_pts(pts, 0.1, chunked=True)
    assert reduced_c.shape[0] == 3


def test_chamfer_cells_matches_direct(rng):
    a = rng.random((300, 3)) * 50
    b = rng.random((200, 3)) * 50
    bb = np.array([[0.0, 0, 0], [50.0, 50, 50]])
    d1 = metrics3d.chamfer_cells(a, b, bb, maxdist=60.0)
    d2 = np.minimum(metrics3d.chamfer_nn(a, b), 60.0)
    np.testing.assert_allclose(d1, d2, atol=1e-9)


def test_eval_dtu_protocol_synthetic(rng):
    # pred == gt on a grid -> accuracy ~ 0 within the ObsMask
    g = np.stack(np.meshgrid(np.linspace(0, 9, 10), np.linspace(0, 9, 10),
                             [5.0]), -1).reshape(-1, 3)
    mask = np.ones((20, 20, 20), bool)
    bb = np.array([[-1.0, -1, -1], [10.0, 10, 10]])
    plane = np.array([0, 0, 1.0, -1.0])  # z > 1 is "above"
    raw = metrics3d.eval_dtu(g.copy(), g.copy(), mask, bb, 1.0, plane,
                             dedup_radius=0.01)
    s = metrics3d.summarize_dtu(raw)
    assert s["accuracy_mean"] < 1e-9
    assert s["completeness_mean"] < 1e-9
    assert raw["abovePlane"].all()


def test_native_kdtree_matches_scipy(rng):
    pytest.importorskip("scipy")
    try:
        from wildmvs.cpp import NativeKDTree, radius_dedup
    except Exception:
        pytest.skip("native toolchain unavailable")
    from scipy.spatial import cKDTree
    pts = rng.random((5000, 3)) * 10
    q = rng.random((3000, 3)) * 10
    tree = NativeKDTree(pts)
    d_nat = tree.nn_distance(q, maxdist=2.0)
    d_sci = np.minimum(cKDTree(pts).query(q, distance_upper_bound=2.0)[0], 2.0)
    np.testing.assert_allclose(d_nat, d_sci, atol=1e-12)

    order = np.random.default_rng(1).permutation(5000)
    keep = radius_dedup(pts, 0.2, order)
    kd = cKDTree(pts)
    ref = np.ones(5000, bool)
    idx = kd.query_ball_point(pts[order], 0.2)
    for j in range(5000):
        pid = order[j]
        if ref[pid]:
            ref[idx[j]] = False
            ref[pid] = True
    assert np.array_equal(keep, ref)


def test_fusion_max_reproj_error_gate(scene):
    """The COLMAP-fusion back-projection gate: permissive threshold keeps GT
    points; a tiny threshold kills all consistency votes."""
    K, R, t = _cams(scene)
    depths = np.stack(scene.depths)
    pts_loose, _ = fuse_depthmaps(depths, K, R, t, disp_threshold=0.01,
                                  num_consistent=3, max_reproj_error=3.0)
    assert pts_loose.shape[0] > 500
    pts_tight, _ = fuse_depthmaps(depths, K, R, t, disp_threshold=0.01,
                                  num_consistent=3, max_reproj_error=1e-6)
    assert pts_tight.shape[0] == 0


def test_run_pipeline_upsample_and_filter_num_views(scene, tmp_path):
    """End-to-end oracle pipeline with --upsample semantics: quarter-res
    depthmaps are nearest-upsampled before filtering/fusion, filtering uses
    filter_num_views sources, and the fused cloud lands on the GT plane."""
    from wildmvs.pipeline.reconstruction import run_pipeline

    # fake a model stage that wrote quarter-res depthmaps + probabilities
    depth_dir = tmp_path / "IntRes" / "depthmaps" / "scene"
    depth_dir.mkdir(parents=True)
    for i in range(len(scene)):
        s = scene[i]
        name = s["filename"].replace("/", "_")
        np.savez_compressed(depth_dir / f"{name}_out.npz",
                            depthmap=scene.depths[i][::4, ::4],
                            probability=np.ones_like(
                                scene.depths[i][::4, ::4]))
    # "oracle" skips the network; the pre-written npz files are kept as-is
    res = run_pipeline(scene, tmp_path, architecture="oracle",
                       scene="scene", upsample=True, filter_num_views=4,
                       min_tri_angle=0.0, override=False)
    assert res["num_points"] > 300


@pytest.mark.slow
def test_run_pipeline_sharded_stage1_then_complete(tmp_path):
    """Multi-host depthmap sharding: two sharded passes (process 0/2 and
    1/2) each produce only their views and do NOT write the stage sentinel;
    a final unsharded pass completes stages 2-4 from the caches."""
    from wildmvs.pipeline.reconstruction import run_pipeline

    # the real network needs /32 resolutions (unlike the oracle fixture)
    scene = SyntheticSceneDataset(num_views=4, height=64, width=96, seed=3)
    depth_dir = tmp_path / "IntRes" / "depthmaps" / "scene"
    for pidx in range(2):
        res = run_pipeline(scene, tmp_path, architecture="mvsnet",
                           scene="scene", min_tri_angle=0.0,
                           process_index=pidx, process_count=2)
        assert res["stage1_shard"] == f"{pidx}/2"
    names = [scene[i]["filename"].replace("/", "_")
             for i in range(len(scene))]
    assert all((depth_dir / f"{n}_out.npz").exists() for n in names)
    assert not (depth_dir / "finished.txt").exists()

    res = run_pipeline(scene, tmp_path, architecture="mvsnet",
                       scene="scene", min_tri_angle=0.0)
    assert (depth_dir / "finished.txt").exists()
    assert "num_points" in res


def test_depthmap_eval_sharded_merge(tmp_path):
    """Two sharded benchmark runs + --merge reproduce the unsharded
    metrics exactly (count-weighted means, the reference's dist.reduce)."""
    import json
    from wildmvs.pipeline import depthmap_eval as DE

    base = ["--dataset", "synthetic", "--architecture", "mvsnet",
            "--out_dir", str(tmp_path)]
    for pidx in range(2):
        DE.main(base + ["--process_index", str(pidx),
                        "--process_count", "2"])
    DE.main(base)  # unsharded ground truth
    out = tmp_path / "synthetic_depthmaps"
    full = json.loads((out / "mvsnet_5.json").read_text())
    merged = DE.merge_parts(out / "mvsnet_5")  # overwrites mvsnet_5.json
    assert merged["count"] == 4 and merged["merged_parts"] == 2
    for k in ("EPE", "1pxError", "3pxError"):
        assert merged[k] == pytest.approx(full[k], rel=1e-6)


def test_classic_depthmap_recovers_plane(scene):
    """The non-learned ZNCC plane-sweep baseline (the reference's --colmap
    patch-match role) recovers the synthetic scene's plane depth."""
    import jax.numpy as jnp
    from wildmvs.pipeline.classic import classic_depthmap

    s = scene[0]
    depth, conf = classic_depthmap(
        jnp.asarray(s["imgs"][None]), jnp.asarray(s["K"][None]),
        jnp.asarray(s["R"][None]), jnp.asarray(s["t"][None]),
        jnp.asarray(s["depth_min"][None]), jnp.asarray(s["depth_max"][None]),
        num_depth=64, window=5, downscale=1)
    depth = np.asarray(depth[0])
    gt = scene.depths[0]
    mask = np.asarray(s["mask"]) > 0.5
    rel = np.abs(depth - gt)[mask] / gt[mask]
    assert np.isfinite(depth).all()
    assert np.median(rel) < 0.03, np.median(rel)
    assert 0.0 <= float(np.asarray(conf).min()) \
        and float(np.asarray(conf).max()) <= 1.0


def test_classic_pipeline_end_to_end(scene, tmp_path):
    """--classic stage 1 feeds stages 2-4 unchanged."""
    from wildmvs.pipeline.reconstruction import run_pipeline

    res = run_pipeline(scene, tmp_path, architecture="classic",
                       scene="scene", min_tri_angle=0.0)
    assert res["num_points"] > 100


def test_restore_params_partial(tmp_path):
    """restore_params pulls only model variables out of a full train ckpt."""
    import jax
    from wildmvs.train.checkpoint import save_checkpoint, restore_params
    from wildmvs.train.trainer import TrainState, make_optimizer
    from wildmvs.train.config import TrainConfig

    cfg = TrainConfig(dataset="synthetic")
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    stats = {"bn": {"mean": np.ones(3, np.float32)}}
    tx = make_optimizer(cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=stats, opt_state=tx.init(params), tx=tx)
    path = save_checkpoint(tmp_path, 0, state, "mvsnet")
    p2, s2, meta = restore_params(path, params, stats)
    np.testing.assert_array_equal(p2["w"], params["w"])
    np.testing.assert_array_equal(s2["bn"]["mean"], stats["bn"]["mean"])
    assert meta["architecture"] == "mvsnet"


def test_geometric_filter_ragged_sources(scene):
    """Per-view source depthmaps with heterogeneous sizes (in-the-wild
    scenes): each source normalizes sampling by its OWN size. A top-left
    crop of a source keeps its K valid, so interior pixels still pass."""
    s = scene[0]
    ref_depth = scene.depths[0]
    srcs = [scene.depths[1], scene.depths[2], scene.depths[3][:32, :48]]
    masks = geometric_filter(jnp.asarray(ref_depth),
                             [jnp.asarray(d) for d in srcs],
                             jnp.asarray(s["K"]), jnp.asarray(s["R"]),
                             jnp.asarray(s["t"]), num_consistent=3,
                             min_tri_angle=0.0)
    geo = np.asarray(masks["geo_mask"])
    assert geo[8:-8, 8:-8].mean() > 0.9


def test_fusion_ragged_depth_sizes(scene):
    """fuse_depthmaps accepts per-view depth maps with different sizes and
    still reconstructs the GT plane from the consistent views."""
    K, R, t = _cams(scene)
    depths = [scene.depths[0], scene.depths[1], scene.depths[2],
              scene.depths[3][:32, :48]]
    colors = [scene.imgs[i][:d.shape[0], :d.shape[1]]
              for i, d in enumerate(depths)]
    points, cols = fuse_depthmaps(depths, K, R, t, colors=colors,
                                  disp_threshold=0.01, num_consistent=3)
    assert points.shape[0] > 500
    assert cols.shape == points.shape
    A = np.concatenate([points[:, :2], np.ones((len(points), 1))], axis=1)
    coef, *_ = np.linalg.lstsq(A, points[:, 2], rcond=None)
    rms = np.sqrt(np.mean((points[:, 2] - A @ coef) ** 2))
    assert rms < 0.01, rms


def test_eval_model_kwargs_per_arch_sweep_defaults():
    """Pipeline-level sweep defaults are per-architecture, set from the
    r4 full-res DTU-rig measurements (BASELINE.md round 4): cvp gets the
    rect sweep (1.63x, ~exact), mvsnet/vis keep auto; explicit overrides
    always win."""
    from wildmvs.pipeline.depthmaps import eval_model_kwargs

    assert eval_model_kwargs("cvp_mvsnet")["kwargs"][
        "sweep_method"] == "rect"
    assert "sweep_method" not in eval_model_kwargs("mvsnet")["kwargs"]
    assert "sweep_method" not in eval_model_kwargs("vis_mvsnet")["kwargs"]
    assert eval_model_kwargs("cvp_mvsnet", sweep_method="gather")[
        "kwargs"]["sweep_method"] == "gather"
    assert eval_model_kwargs("mvsnet", sweep_method="rect")["kwargs"][
        "sweep_method"] == "rect"

"""Reconstruction pipeline orchestrator:
depthmaps -> geometric filtering -> native fusion -> 3D metrics.

Parity: reconstruction_pipeline.py + evaluation/pipeline_utils.py:30-80
(stage selection, file-based caching between stages), with the external
fusibile/COLMAP fusion binaries replaced by the native TPU fusion kernel
(wildmvs/pipeline/fusion.py).

Usage:
  python -m wildmvs.pipeline.reconstruction --dataset synthetic --debug
  python -m wildmvs.pipeline.reconstruction --dataset dtu --scene scan1 \
      --model <logdir> --data_path datasets/dtu_eval
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np

from ..data.ply import write_ply
from ..models.api import build_model
from ..train.checkpoint import restore_params
from .depthmaps import eval_model_kwargs, get_mask_invalid, run_depthmaps
from .filtering import geometric_filter
from .fusion import fuse_depthmaps


def load_network(model_dir: str | None, architecture: str | None,
                 sample, dataset_name: str, sweep_method: str = "auto"):
    """Build + restore the eval network; architecture comes from checkpoint
    metadata when a model dir is given (parity pipeline_utils.py:114-163)."""
    import jax.numpy as jnp
    variables = None
    if model_dir is not None:
        from ..train.checkpoint import resolve_checkpoint
        ckpt, architecture = resolve_checkpoint(model_dir)
    assert architecture is not None
    cfg = eval_model_kwargs(architecture, sweep_method=sweep_method)
    kwargs = dict(cfg["kwargs"])
    model = build_model(architecture, **kwargs)
    imgs = sample["imgs"]
    if isinstance(imgs, list):  # heterogeneous view sizes
        imgs = tuple(jnp.asarray(v)[None] for v in imgs)
    else:
        imgs = jnp.asarray(imgs)[None]
    args = (imgs,) + tuple(jnp.asarray(sample[k])[None] for k in
                           ("K", "R", "t", "depth_min", "depth_max"))
    cvp_nscale = None
    if architecture == "cvp_mvsnet":
        # parity pipeline_utils.py:133-138 (5 on dtu / 4 elsewhere), but
        # clamped so the coarsest pyramid level keeps >= 32 px on its
        # short side: below that the per-pixel epipolar interval
        # (cal_depth_hypo) degenerates — a 1-px move at a ~14 px focal
        # length is a huge depth step and the refinement cascade diverges
        # (observed on 64x96 synthetic scenes: depth EPE ~1500 intervals
        # at nscale 4 vs ~5 at the clamped value)
        base = 5 if dataset_name == "dtu" else 4
        if isinstance(imgs, tuple):   # ragged: per-view [1, h, w, 3]
            ih = min(min(v.shape[1], v.shape[2]) for v in imgs)
        else:                         # stacked: [1, N, H, W, 3]
            ih = min(imgs.shape[2], imgs.shape[3])
        fit = max(1, int(np.floor(np.log2(max(ih // 32, 1)))) + 1)
        cvp_nscale = min(base, fit)
    extra = {} if cvp_nscale is None else {"nscale": cvp_nscale}
    init_vars = model.init(jax.random.PRNGKey(0), *args, train=False, **extra)
    if model_dir is not None:
        params, batch_stats, _ = restore_params(
            ckpt, init_vars["params"], init_vars.get("batch_stats", {}))
        variables = {"params": params, "batch_stats": batch_stats}
    else:
        variables = init_vars
    return model, variables, architecture, cvp_nscale


def _upsample_nearest(depth: np.ndarray, factor: int) -> np.ndarray:
    """Nearest-neighbour 2x/4x upsample (parity filtering.py:54-57
    F.interpolate default mode)."""
    return np.repeat(np.repeat(depth, factor, axis=0), factor, axis=1)


def run_pipeline(dataset, work_dir: Path, model_dir: str | None = None,
                 architecture: str = "mvsnet", dataset_name: str = "synthetic",
                 scene: str = "scene", do_filter: bool = True,
                 prob_threshold: float = 0.8, max_reproj_error: float = 1.0,
                 depth_threshold: float = 0.01, min_tri_angle: float = 1.0,
                 num_consistent: int = 3, fusion_disp_threshold: float = 0.01,
                 fusion_num_consistent: int = 3, override: bool = False,
                 debug: bool = False, compute_metrics: bool = False,
                 data_path: str | None = None, upsample: bool = False,
                 filter_num_views: int | None = None,
                 chunked_eval: bool = False,
                 fusion_max_reproj_error: float | None = None,
                 process_index: int = 0, process_count: int = 1,
                 sweep_method: str = "auto") -> dict:
    from ..utils.monitor import StageTimer
    work_dir = Path(work_dir)
    depth_dir = work_dir / "IntRes" / "depthmaps" / scene
    filter_dir = work_dir / "IntRes" / "geometric_filtering" / scene
    points_dir = work_dir / "Points"
    timer = StageTimer()  # per-stage wall clock, reported in the results

    sample0 = dataset[0]

    if override:
        # override invalidates EVERY downstream cache up front — without
        # this, a sharded --override rerun (which regenerates depthmaps but
        # returns before stages 2-4) would leave stale sentinels and a
        # stale PLY that the final unsharded pass then silently trusts
        for stale in (depth_dir / "finished.txt",
                      filter_dir / "finished.txt",
                      points_dir / f"{scene}.ply"):
            stale.unlink(missing_ok=True)

    # ---- stage 1: depthmaps ----
    if architecture == "oracle":
        # GT depths as "predictions": validates stages 2-4 independently of
        # model quality (datasets with per-sample `depth` only)
        depth_dir.mkdir(parents=True, exist_ok=True)
        for i in range(len(dataset)):
            if i % process_count != process_index:
                continue
            s = dataset[i]
            name = s["filename"].replace("/", "_")
            f = depth_dir / f"{name}_out.npz"
            if not f.exists() or override:
                np.savez_compressed(f, depthmap=s["depth"],
                                    probability=np.ones_like(s["depth"]))
    elif architecture == "classic":
        # non-learned ZNCC plane-sweep baseline (the reference's --colmap
        # patch-match role, reconstruction_pipeline.py:30-31)
        from .classic import run_classic_depthmaps
        run_classic_depthmaps(dataset, depth_dir, override=override,
                              debug=debug, process_index=process_index,
                              process_count=process_count)
    else:
        model, variables, architecture, cvp_nscale = load_network(
            model_dir, architecture, sample0, dataset_name,
            sweep_method=sweep_method)
        run_depthmaps(dataset, model, variables, depth_dir, override=override,
                      debug=debug, cvp_nscale=cvp_nscale,
                      process_index=process_index,
                      process_count=process_count)
    timer.mark("depthmaps")
    if process_count > 1:
        # multi-host mode: each host owns views i % process_count ==
        # process_index (embarrassingly parallel, SURVEY §7.9); stages 2-4
        # need every depthmap, so rerun without sharding once all hosts
        # finish — stage 1 is then a cached no-op
        return {"scene": scene, "architecture": architecture,
                "stage1_shard": f"{process_index}/{process_count}",
                "stage_timings": timer.summary()}

    # ---- stage 2: geometric filtering ----
    results = {"scene": scene, "architecture": architecture}
    n = len(dataset)
    names = [dataset[i]["filename"].replace("/", "_") for i in range(n)]
    if do_filter and (not (filter_dir / "finished.txt").exists() or override):
        filter_dir.mkdir(parents=True, exist_ok=True)
        import jax.numpy as jnp
        # filtering may consider more source views than prediction did
        # (parity reconstruction_pipeline.py:36 dataset.nviews =
        # args.filter_num_views) — but never more than depthmaps exist for
        old_nviews = getattr(dataset, "nviews", None)
        if filter_num_views is not None and old_nviews is not None:
            dataset.nviews = min(filter_num_views, len(dataset))
            if getattr(dataset, "src_imgs", None) is not None:
                # YFCC-style datasets precompute their source selection in
                # __init__ and ignore later nviews writes — the reference's
                # override is the same silent no-op there
                # (reconstruction_pipeline.py:36 + yfcc_scene.py:48,:73);
                # keep result parity but be loud about it
                print("note: --filter_num_views has no effect on datasets "
                      "with precomputed source selection (reference parity)")
        for i in range(n):
            sample = dataset[i]
            npz = np.load(depth_dir / f"{names[i]}_out.npz")
            ref_depth = npz["depthmap"]
            src_names = [s.replace("/", "_") for s in sample["src_filenames"]]
            sample_K, sample_R, sample_t = (sample["K"], sample["R"],
                                            sample["t"])
            if debug:
                # debug stage 1 only wrote the first depthmap(s) — filter
                # against whatever exists (one-iteration smoke semantics,
                # reconstruction_pipeline.py:35-39), subsetting the cams
                keep = [j for j, s in enumerate(src_names)
                        if (depth_dir / f"{s}_out.npz").exists()]
                if not keep:
                    break
                src_names = [src_names[j] for j in keep]
                rows = [0] + [j + 1 for j in keep]
                sample_K, sample_R, sample_t = (sample_K[rows],
                                                sample_R[rows],
                                                sample_t[rows])
            if not debug:
                rows = list(range(len(src_names) + 1))
            src_depths = [np.load(depth_dir / f"{s}_out.npz")["depthmap"]
                          for s in src_names]
            # per-view image heights: sample["imgs"] may be a ragged list
            # (heterogeneous in-the-wild view sizes) — [v] indexes both forms
            img_h = [sample["imgs"][v].shape[0] for v in rows]
            if upsample:
                # filter at full image resolution (parity filtering.py:51-57)
                # with each view upsampled by its OWN factor
                factor = img_h[0] // ref_depth.shape[0]
                if factor > 1:
                    ref_depth = _upsample_nearest(ref_depth, factor)
                src_depths = [
                    _upsample_nearest(d, img_h[k + 1] // d.shape[0])
                    if img_h[k + 1] // d.shape[0] > 1 else d
                    for k, d in enumerate(src_depths)]
            # each view's camera scaled to its own depthmap resolution
            K = sample_K.copy()
            K[0, :2] *= ref_depth.shape[0] / img_h[0]
            for k, d in enumerate(src_depths):
                K[k + 1, :2] *= d.shape[0] / img_h[k + 1]
            masks = geometric_filter(
                jnp.asarray(ref_depth),
                [jnp.asarray(d) for d in src_depths],
                jnp.asarray(K), jnp.asarray(sample_R),
                jnp.asarray(sample_t),
                max_reproj_error=max_reproj_error,
                depth_threshold=depth_threshold,
                min_tri_angle=min_tri_angle, num_consistent=num_consistent)
            np.savez_compressed(
                filter_dir / f"{names[i]}_out.npz",
                **{k: np.asarray(v) for k, v in masks.items()})
            if debug:
                break
        if old_nviews is not None:
            dataset.nviews = old_nviews
        if not debug:
            (filter_dir / "finished.txt").write_text(" ")
    timer.mark("filtering")
    if debug:
        results["stage_timings"] = timer.summary()
        return results

    # ---- stage 3: native fusion ----
    points_dir.mkdir(parents=True, exist_ok=True)
    ply_path = points_dir / f"{scene}.ply"
    if not ply_path.exists() or override:
        depths, colors, Ks, Rs, ts = [], [], [], [], []
        for i in range(n):
            sample = dataset[i]
            npz = np.load(depth_dir / f"{names[i]}_out.npz")
            depth = npz["depthmap"].copy()
            prob = npz["probability"]
            if upsample:
                # fuse at full resolution (parity colmap_utils.py:363)
                factor = sample["imgs"][0].shape[0] // depth.shape[0]
                if factor > 1:
                    depth = _upsample_nearest(depth, factor)
                    prob = (np.stack([_upsample_nearest(p, factor)
                                      for p in prob]) if prob.ndim > 2
                            else _upsample_nearest(prob, factor))
            geo = None
            if do_filter:
                geo = np.load(filter_dir / f"{names[i]}_out.npz")["geo_mask"]
                if geo.shape != depth.shape:
                    f = depth.shape[0] // geo.shape[0]
                    geo = _upsample_nearest(geo, f)
            invalid = get_mask_invalid(prob, prob_threshold, geo)
            depth[invalid] = 0.0  # parity fusibile.py:152-158
            depths.append(depth)
            scale = depth.shape[0] / sample["imgs"][0].shape[0]
            K = sample["K"][0].copy()
            K[:2] *= scale
            Ks.append(K)
            Rs.append(sample["R"][0])
            ts.append(sample["t"][0])
            img = sample["imgs"][0]
            ih = depth.shape[0]
            iw = depth.shape[1]
            step = max(img.shape[0] // ih, 1)
            colors.append(img[::step, ::step][:ih, :iw])
        # per-view depth sizes may differ (in-the-wild scenes):
        # fuse_depthmaps stacks uniform lists and runs the ragged path
        # otherwise
        points, cols = fuse_depthmaps(
            depths, np.stack(Ks), np.stack(Rs), np.stack(ts),
            colors=colors,
            disp_threshold=fusion_disp_threshold,
            num_consistent=fusion_num_consistent,
            max_reproj_error=fusion_max_reproj_error)
        write_ply(ply_path, points, colors=cols)
        results["num_points"] = int(points.shape[0])
    else:
        from ..data.ply import ply_xyz
        results["num_points"] = int(ply_xyz(ply_path).shape[0])
    results["ply"] = str(ply_path)
    timer.mark("fusion")

    # ---- stage 4: metrics ----
    if compute_metrics:
        from . import metrics3d
        from ..data.ply import ply_xyz
        pred = ply_xyz(ply_path)
        if dataset_name == "dtu":
            gt, mask, bb, res, plane = metrics3d.load_dtu_gt(data_path, scene)
            raw = metrics3d.eval_dtu(pred, gt, mask, bb, float(res), plane,
                                     chunked=chunked_eval)
            metrics3d.save_raw(work_dir / "IntRes" / "chamfer", scene, raw)
            results["metrics"] = metrics3d.summarize_dtu(raw)
        elif hasattr(dataset, "gt_points"):
            raw = metrics3d.eval_yfcc(pred, dataset.gt_points,
                                      getattr(dataset, "gt_resolution", 1.0))
            results["metrics"] = {
                "chamfer_pred_to_gt": float(np.mean(np.minimum(
                    raw["dist_predToGt"], 10 * getattr(dataset, "gt_resolution", 1.0)))),
                "chamfer_gt_to_pred": float(np.mean(np.minimum(
                    raw["dist_gtToPred"], 10 * getattr(dataset, "gt_resolution", 1.0)))),
            }
        timer.mark("metrics")
    results["stage_timings"] = timer.summary()
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description="wildmvs 3D reconstruction")
    p.add_argument("--dataset", default="synthetic",
                   choices=["dtu", "yfcc", "synthetic"])
    p.add_argument("--scene", default="scene")
    p.add_argument("--model", default=None, help="trained model dir")
    p.add_argument("--architecture", default="mvsnet",
                   help="model architecture, 'oracle' (GT depths), or "
                        "'classic' (non-learned ZNCC plane sweep — the "
                        "TPU-native stand-in for the reference's --colmap "
                        "patch-match baseline, colmap_utils.py:282-322)")
    p.add_argument("--sweep_method", default="auto",
                   choices=["auto", "rect", "gather"],
                   help="cost-volume sweep backend (rect: the "
                        "H_inf-factored fast path, ~2.5x at full-res "
                        "eval; see ops/rect_sweep.py)")
    p.add_argument("--classic", action="store_true",
                   help="shorthand for --architecture classic (parity with "
                        "the reference's --colmap flag, pipeline_utils.py:40)")
    p.add_argument("--data_path", default=None)
    p.add_argument("--work_dir", default="recon_out")
    p.add_argument("--nviews", type=int, default=5,
                   help="views per depthmap prediction")
    p.add_argument("--upsample", action="store_true",
                   help="upsample depthmaps to full resolution before "
                        "filtering and fusion")
    p.add_argument("--filter", action="store_true", default=True)
    p.add_argument("--no_filter", dest="filter", action="store_false")
    p.add_argument("--prob_threshold", type=float, default=0.8)
    p.add_argument("--max_reproj_error", type=float, default=1.0)
    p.add_argument("--depth_threshold", type=float, default=0.01)
    p.add_argument("--min_tri_angle", type=float, default=1.0)
    p.add_argument("--num_consistent", type=int, default=3)
    p.add_argument("--filter_num_views", type=int, default=10,
                   help="views considered while filtering")
    p.add_argument("--fusion", default="native",
                   choices=["native", "fusibile", "colmap", "simple"],
                   help="all run the native TPU fusion kernel; 'colmap' "
                        "additionally applies the reprojection-error gate")
    p.add_argument("--fusion_depth_threshold", type=float, default=0.01)
    p.add_argument("--fusion_num_consistent", type=int, default=3)
    p.add_argument("--fusion_max_reproj_error", type=float, default=None,
                   help="max back-projection error in px (colmap fusion "
                        "semantics; default off)")
    p.add_argument("--compute_metrics", action="store_true")
    p.add_argument("--chunked_eval", action="store_true",
                   help="slower, low-memory DTU metric evaluation")
    p.add_argument("--override", action="store_true")
    p.add_argument("--process_index", type=int, default=0,
                   help="this host's shard of the depthmap stage")
    p.add_argument("--process_count", type=int, default=1,
                   help="number of hosts sharding the depthmap stage; "
                        "when > 1 the run stops after stage 1 (rerun "
                        "unsharded to filter/fuse from the caches)")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    a = p.parse_args(argv)
    if a.classic:
        assert a.model is None, \
            "cannot use both a model and --classic (parity " \
            "pipeline_utils.py:70)"
        a.architecture = "classic"
    if a.fusion == "colmap" and a.fusion_max_reproj_error is None:
        a.fusion_max_reproj_error = 1.0  # reference colmap-fusion default
    if a.platform:
        jax.config.update("jax_platforms",
                          "axon" if a.platform == "tpu" else a.platform)

    if a.dataset == "synthetic":
        from ..data.synthetic import SyntheticSceneDataset
        dataset = SyntheticSceneDataset(num_views=a.nviews, height=64,
                                        width=96)
    else:
        from ..data import loaders
        dataset = loaders.build_eval_dataset(a.dataset, a.data_path, a.scene,
                                             nviews=a.nviews)

    results = run_pipeline(
        dataset, Path(a.work_dir), model_dir=a.model,
        architecture=a.architecture, dataset_name=a.dataset, scene=a.scene,
        do_filter=a.filter, prob_threshold=a.prob_threshold,
        max_reproj_error=a.max_reproj_error,
        depth_threshold=a.depth_threshold, min_tri_angle=a.min_tri_angle,
        num_consistent=a.num_consistent,
        fusion_disp_threshold=a.fusion_depth_threshold,
        fusion_num_consistent=a.fusion_num_consistent,
        override=a.override, debug=a.debug,
        compute_metrics=a.compute_metrics, data_path=a.data_path,
        upsample=a.upsample, filter_num_views=a.filter_num_views,
        chunked_eval=a.chunked_eval,
        fusion_max_reproj_error=a.fusion_max_reproj_error,
        process_index=a.process_index, process_count=a.process_count,
        sweep_method=a.sweep_method)
    print(json.dumps(results, default=str))


if __name__ == "__main__":
    main()

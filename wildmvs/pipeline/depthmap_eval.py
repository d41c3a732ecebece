"""Depthmap-quality benchmark CLI — EPE / 1px / 3px on YFCC or BlendedMVS.

Parity: depthmap_eval.py:70-171 — per-sample metrics with both estimate and
GT normalized by (depth_max - depth_min)/128, estimate bilinearly upsampled
to the GT resolution, averaged over the dataset, JSON-dumped to
results/{dataset}_depthmaps/{model}_{nviews}.json. The gloo DDP sharding is
replaced by per-host view sharding (i % process_count == process_index) with
a host-side sum; on a multi-host run each host writes partial sums that
rank 0 reduces.

Usage:
  python -m wildmvs.pipeline.depthmap_eval --dataset synthetic --model <dir>
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.supervised import resize_bilinear
from ..train.metrics import depth_metrics
from .reconstruction import load_network

YFCC_SCENES = [
    "trevi_fountain", "sacre_coeur", "taj_mahal", "buckingham_palace",
    "palace_of_westminster", "brandenburg_gate", "st_peters_square",
    "hagia_sophia_interior", "pantheon_exterior", "temple_nara_japan",
    "colosseum_exterior", "notre_dame_front_facade",
    "prague_old_town_square", "westminster_abbey", "grand_place_brussels",
]


def _debug_visu(sample, est_up, out_dir):
    """--debug visualization dump (parity depthmap_eval.py:55-67,:112-130):
    reference/src images, predicted + GT depth, mask and interval-normalized
    error map as jpgs under out_dir/visu."""
    from ..utils.monitor import Logger
    logger = Logger(Path(out_dir) / "visu")
    n = len(sample["imgs"])
    ims = {"im_ref": np.asarray(sample["imgs"][0])}
    for i in range(1, n):
        ims[f"im_src_{i - 1}"] = np.asarray(sample["imgs"][i])
    logger.plot_ims(ims)
    vmin = float(sample["depth_min"][0])
    vmax = float(sample["depth_max"][0])
    logger.depth_panel(est_up, vmin, vmax, name="pred")
    logger.depth_panel(np.asarray(sample["depth"]), vmin, vmax, name="gt")
    logger.plot_ims({"mask_gt": np.asarray(sample["mask"])})
    step = (vmax - vmin) / 128.0
    diff = np.abs(np.asarray(est_up) - np.asarray(sample["depth"])) / step
    logger.plot_ims({"diff": np.clip(diff / 3.0, 0, 1)})


def evaluate(dataset, model, variables, cvp_nscale=None,
             process_index: int = 0, process_count: int = 1,
             debug: bool = False, out_dir=None) -> dict:
    extra = {} if cvp_nscale is None else {"nscale": cvp_nscale}

    @jax.jit
    def fwd(imgs, K, R, t, dmin, dmax):
        return model.apply(variables, imgs, K, R, t, dmin, dmax, train=False,
                           **extra)["depth"]

    sums = {}
    count = 0
    t0 = time.time()
    for i in range(len(dataset)):
        if i % process_count != process_index:
            continue
        s = dataset[i]
        imgs = s["imgs"]
        if isinstance(imgs, list):  # heterogeneous view sizes (test mode)
            imgs = tuple(jnp.asarray(v)[None] for v in imgs)
        else:
            imgs = jnp.asarray(imgs)[None]
        args = (imgs,) + tuple(jnp.asarray(s[k])[None] for k in
                               ("K", "R", "t", "depth_min", "depth_max"))
        depth = fwd(*args)
        gt = jnp.asarray(s["depth"])[None]
        mask = jnp.asarray(s["mask"])[None]
        est = resize_bilinear(depth, gt.shape[1:3])
        m = depth_metrics(est, gt, mask, args[4][:, 0], args[5][:, 0])
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += 1
        if debug:
            if out_dir is not None:
                _debug_visu(s, np.asarray(est[0]), out_dir)
            break
    return {**{k: v / max(count, 1) for k, v in sums.items()},
            "count": count, "seconds": time.time() - t0}


def merge_parts(base: Path) -> dict:
    """Combine `{base}.part{i}.json` shard results into `{base}.json` —
    count-weighted means (the reference's dist.reduce(SUM) ÷ len(dataset),
    depthmap_eval.py:155-164, done host-side from the part files)."""
    parts = sorted(base.parent.glob(base.name + ".part*.json"))
    if not parts:
        raise FileNotFoundError(f"no {base.name}.part*.json in {base.parent}")
    # a crashed host must not silently bias the benchmark (the reference's
    # dist.reduce would have blocked on all ranks): shard indices have to
    # form a contiguous 0..N-1 set
    idxs = sorted(int(p.name[len(base.name) + 5:-5]) for p in parts)
    if idxs != list(range(len(idxs))) or idxs[-1] != len(parts) - 1:
        raise ValueError(f"incomplete shard set {idxs}: expected parts "
                         f"0..{idxs[-1]} — rerun the missing hosts")
    sums, count, seconds = {}, 0, 0.0
    for p in parts:
        r = json.loads(p.read_text())
        for k, v in r.items():
            if k == "count":
                count += r["count"]
            elif k == "seconds":
                seconds = max(seconds, r["seconds"])  # hosts ran in parallel
            else:
                sums[k] = sums.get(k, 0.0) + v * r["count"]
    res = {**{k: v / max(count, 1) for k, v in sums.items()},
           "count": count, "seconds": seconds, "merged_parts": len(parts)}
    # NOT with_suffix: a dotted model name ("vis.bf16_5") must not truncate
    with open(base.parent / (base.name + ".json"), "w") as f:
        json.dump(res, f)
    return res


def main(argv=None):
    p = argparse.ArgumentParser(description="wildmvs depthmap benchmark")
    p.add_argument("--merge", default=None, metavar="BASE",
                   help="merge BASE.part*.json shard results into BASE.json "
                        "and exit (e.g. results/yfcc_depthmaps/model_5)")
    p.add_argument("--dataset", default="yfcc",
                   choices=["yfcc", "blended", "synthetic"])
    p.add_argument("--model", default=None, help="trained model dir")
    p.add_argument("--architecture", default="mvsnet")
    p.add_argument("--data_path", default=None)
    p.add_argument("--nb_imgs", type=int, default=5)
    p.add_argument("--out_dir", default="results")
    p.add_argument("--process_index", type=int, default=0,
                   help="this host's shard index (replaces --world_size "
                        "mp.spawn sharding, depthmap_eval.py:95-96)")
    p.add_argument("--process_count", type=int, default=1,
                   help="total hosts sharding the view list")
    p.add_argument("--sweep_method", default="auto",
                   choices=["auto", "rect", "gather"],
                   help="cost-volume sweep backend (see ops/rect_sweep.py)")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"])
    a = p.parse_args(argv)
    if a.merge:
        print(json.dumps(merge_parts(Path(a.merge))))
        return
    if a.platform:
        jax.config.update("jax_platforms",
                          "axon" if a.platform == "tpu" else a.platform)

    if a.dataset == "blended":
        from ..data.loaders import BlendedMVSDataset, scene_list
        root = a.data_path or "datasets/blended"
        dataset = BlendedMVSDataset(root, scene_list("blended_val"), "test",
                                    a.nb_imgs)
    elif a.dataset == "yfcc":
        from ..data.loaders import MegaDepthDataset
        root = a.data_path or "datasets/yfcc_depthmaps"
        dataset = MegaDepthDataset(root, YFCC_SCENES, "test", a.nb_imgs)
    else:
        from ..data.synthetic import SyntheticMVSDataset

        class _Eval(SyntheticMVSDataset):
            pass
        dataset = _Eval(num_samples=4, num_views=a.nb_imgs, height=64,
                        width=96, seed=7)

    model, variables, architecture, cvp_nscale = load_network(
        a.model, a.architecture, dataset[0], a.dataset,
        sweep_method=a.sweep_method)
    res = evaluate(dataset, model, variables, cvp_nscale,
                   process_index=a.process_index,
                   process_count=a.process_count, debug=a.debug,
                   out_dir=Path(a.out_dir) / f"{a.dataset}_depthmaps")
    name = Path(a.model).name if a.model else architecture
    out = Path(a.out_dir) / f"{a.dataset}_depthmaps"
    out.mkdir(parents=True, exist_ok=True)
    suffix = (f"_{a.nb_imgs}" if a.process_count == 1
              else f"_{a.nb_imgs}.part{a.process_index}")
    with open(out / f"{name}{suffix}.json", "w") as f:
        json.dump(res, f)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

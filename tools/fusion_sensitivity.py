"""Native-fusion parameter sensitivity study (round-2 VERDICT weak item 4).

The DTU acc/comp target requires tuning disp_threshold / num_consistent
against GT; without the real dataset, this tool characterizes the native
fusion (pipeline/fusion.py) on rendered scenes with CONTROLLED depth error:
oracle depths + Gaussian noise (in units of the scene's (max-min)/128
interval) + a fraction of gross outliers, swept over the fusion parameter
grid, scoring chamfer accuracy (pred->GT, mean mm-equivalent) and
completeness (GT->pred) against densely sampled GT surface points — the
eval_dtu definitions (evaluation/metrics.py:99-139) minus the
ObsMask/plane machinery the synthetic scene doesn't need.

Run: JAX_PLATFORMS=cpu python tools/fusion_sensitivity.py
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def setup_cpu():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")


def noisy_scene_depths(scene, sigma_intervals: float, outlier_frac: float,
                       seed: int = 0):
    """Oracle depths + N(0, sigma*interval) + uniform-range outliers."""
    rng = np.random.default_rng(seed)
    zmin, zmax = scene.z_range
    interval = (zmax - zmin) / 128.0
    out = []
    for i in range(scene.num_views):
        d = scene.depths[i].copy()
        d += rng.normal(0.0, sigma_intervals * interval, d.shape)
        bad = rng.random(d.shape) < outlier_frac
        d[bad] = rng.uniform(zmin, zmax, bad.sum())
        out.append(d.astype(np.float32))
    return out


def gt_points(scene, stride: int = 1):
    """Dense GT surface points from every view's exact depth (world)."""
    pts = []
    h, w = scene.depths[0].shape
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float64)
    for i in range(scene.num_views):
        rays = pix[::stride, ::stride] @ np.linalg.inv(scene.K[i]).T
        cam = rays * scene.depths[i][::stride, ::stride][..., None]
        world = (cam - scene.t[i][:, 0]) @ scene.R[i]
        pts.append(world.reshape(-1, 3))
    return np.concatenate(pts)


def run_grid(sigma: float = 1.0, outlier_frac: float = 0.05,
             views: int = 5, hw=(64, 96), seed: int = 0):
    from wildmvs.data.synthetic import SyntheticSceneDataset
    from wildmvs.pipeline.fusion import fuse_depthmaps
    from wildmvs.pipeline.metrics3d import chamfer_nn

    scene = SyntheticSceneDataset(num_views=views, height=hw[0], width=hw[1],
                                  seed=seed)
    depths = noisy_scene_depths(scene, sigma, outlier_frac, seed=seed + 1)
    gt = gt_points(scene)
    n_px = views * hw[0] * hw[1]

    rows = []
    for disp in (0.0025, 0.005, 0.01, 0.02, 0.04):
        for ncons in (2, 3, 4):
            pts, _ = fuse_depthmaps(depths, scene.K, scene.R, scene.t,
                                    disp_threshold=disp,
                                    num_consistent=ncons)
            if len(pts) < 10:
                rows.append((disp, ncons, len(pts), np.inf, np.inf))
                continue
            acc = float(np.mean(chamfer_nn(pts, gt)))
            comp = float(np.mean(chamfer_nn(gt, pts)))
            rows.append((disp, ncons, len(pts), acc, comp))
    return rows, n_px


def main():
    setup_cpu()
    print(f"{'disp':>8} {'ncons':>5} {'points':>8} {'acc':>10} {'comp':>10}"
          f"  (acc/comp in scene units; interval = {4.0 / 128:.4f})")
    for sigma, outf in ((0.5, 0.0), (1.0, 0.05), (2.0, 0.1)):
        rows, n_px = run_grid(sigma=sigma, outlier_frac=outf)
        print(f"-- noise sigma={sigma} intervals, outliers={outf:.0%} "
              f"({n_px} source px)")
        for disp, ncons, n, acc, comp in rows:
            print(f"{disp:>8} {ncons:>5} {n:>8} {acc:>10.5f} {comp:>10.5f}")


if __name__ == "__main__":
    main()

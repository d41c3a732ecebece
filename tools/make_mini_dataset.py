"""Write a miniature DTU-eval-layout scene from the synthetic renderer.

The parity suite's fixture generator (wildmvs/data/synthetic.py) promoted
to a reusable on-disk tool: produces the exact per-scan layout the real
DTU evaluation data ships in (data/dtu_yao_eval.py:46-47,88-89 —
`<scan>/pair.txt`, `<scan>/images/%08d.jpg`, `<scan>/cams/%08d_cam.txt`),
plus ground-truth depth PFMs under `<scan>/gt_depths/`. The written scene
loads through the REAL `DTUEvalDataset` class, so every pipeline stage
(depthmaps -> filtering -> fusion -> metrics) can be driven end-to-end
without the actual datasets — the closest attainable proxy for the DTU
protocol targets until real data exists (BASELINE.md targets table).

Usage:
  python tools/make_mini_dataset.py --out /tmp/mini_dtu [--scan scan1]
      [--views 5] [--height 64] [--width 96] [--seed 3]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def write_mini_scene(out_dir, scan: str = "scan1", num_views: int = 5,
                     height: int = 64, width: int = 96, seed: int = 3,
                     jpg_quality: int = 98, colmap_sparse: bool = False):
    """Render and write one mini scene; returns the source
    SyntheticSceneDataset (exact GT geometry) for oracle comparisons."""
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from PIL import Image

    from wildmvs.data.codecs import write_cam_txt, write_pfm
    from wildmvs.data.synthetic import SyntheticSceneDataset

    scene = SyntheticSceneDataset(num_views=num_views, height=height,
                                  width=width, seed=seed)
    root = Path(out_dir) / scan
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "cams").mkdir(exist_ok=True)
    (root / "gt_depths").mkdir(exist_ok=True)

    zmin, zmax = scene.z_range
    # DTU cam.txt convention: "depth_min depth_interval"; the eval loader
    # rescales the interval by 192/128 and takes max = min + 128 * interval
    # (dtu_yao_eval.py:73-74,93) — write the interval whose rescale lands on
    # the true scene range
    interval = (zmax - zmin) / 192.0

    for i in range(num_views):
        img = (np.clip(scene.imgs[i], 0.0, 1.0) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "images" / f"{i:08d}.jpg",
                                  quality=jpg_quality, subsampling=0)
        ext = np.eye(4, dtype=np.float64)
        ext[:3, :3] = scene.R[i]
        ext[:3, 3:] = scene.t[i]
        write_cam_txt(root / "cams" / f"{i:08d}_cam.txt", ext, scene.K[i],
                      depth_min=zmin, depth_interval=interval)
        write_pfm(root / "gt_depths" / f"{i:08d}.pfm", scene.depths[i])

    # pair.txt (Yao format): every view referenced, sources = the other
    # views in index order with dummy scores
    lines = [str(num_views)]
    for i in range(num_views):
        srcs = [j for j in range(num_views) if j != i]
        lines.append(str(i))
        lines.append(" ".join([str(len(srcs))]
                              + [f"{j} {100.0 - k}" for k, j in
                                 enumerate(srcs)]))
    (root / "pair.txt").write_text("\n".join(lines) + "\n")

    if colmap_sparse:
        # the native known-pose bootstrap (wildmvs/data/matching.py): a
        # standard COLMAP model under <scan>/sparse, as the in-the-wild
        # (YFCC-style) ingest expects
        from wildmvs.data.matching import create_sparse_from_known_poses
        grays = [scene.imgs[i].mean(-1) for i in range(num_views)]
        create_sparse_from_known_poses(
            grays, scene.K, scene.R, scene.t,
            names=[f"{i:08d}.jpg" for i in range(num_views)],
            out_dir=root / "sparse")
    return scene


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--scan", default="scan1")
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--colmap", action="store_true",
                    help="also write a native sparse model (<scan>/sparse)")
    a = ap.parse_args()
    write_mini_scene(a.out, a.scan, a.views, a.height, a.width, a.seed,
                     colmap_sparse=a.colmap)
    print(f"wrote {a.scan} ({a.views} views, {a.height}x{a.width}) "
          f"under {a.out}")


if __name__ == "__main__":
    main()

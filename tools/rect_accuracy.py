"""Rect-vs-exact sweep accuracy at the REAL eval protocol (TPU).

VERDICT round 3 item 3: `--sweep_method rect` is the recommended fast
eval path (~2.5x for mvsnet at 1184x1600) but approximates the exact warp
(one extra bilinear resample + canvas clipping, ops/rect_sweep.py); its
bounds were only tested on tiny synthetic scenes.  This measures, on a
textured plane rendered into the DTU-like rig (bench.scene_dtu cameras,
650 mm sphere, 6-deg pairs) at FULL eval resolution:

  * delta = |depth_rect - depth_gather| in reference interval units
    ((dmax-dmin)/128, models/utils.py:155-159) — the approximation cost,
    weight-independent (same seeded params drive both sweeps);
  * EPE vs the analytic GT depth for both paths — whether the
    approximation moves the end metric at all.

Exact semantics being approximated: models/MVSNet/module.py:111-169.

Usage (TPU): timeout 1800 python tools/rect_accuracy.py [--small]
Prints one JSON line per (arch, method) + a summary line.
"""
import argparse
import json
import sys
import time

import numpy as np

REPO = "/root/repo"
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true",
                   help="512x640 control config")
    p.add_argument("--archs", default="mvsnet,vis_mvsnet,cvp_mvsnet")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", f"{REPO}/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from bench import scene_dtu
    from wildmvs.data.synthetic import render_rig_plane
    from wildmvs.models import build_model

    if args.small:
        h, w, f, n = 512, 640, 1156.8, 3
    else:
        h, w, f, n = 1184, 1600, 2892.0, 5
    _, K, R, t, dmin, dmax = scene_dtu(1, n, h, w, f)
    Kn, Rn, tn = (np.asarray(a[0]) for a in (K, R, t))
    imgs_np, depths = render_rig_plane(Kn, Rn, tn, h, w,
                                       plane=(-30.0, 0.12, -0.08),
                                       extent=320.0, seed=0)
    imgs = jnp.asarray(imgs_np)[None]
    gt = depths[0]
    interval = (935.0 - 425.0) / 128.0
    mask = (gt > 425.0) & (gt < 935.0)

    def gt_at(hw):
        """GT resized to the arch's OUTPUT depth scale (pipeline_utils.py
        downscale semantics) — bilinear, exact for a plane."""
        import jax.image
        g = jax.image.resize(jnp.asarray(gt), hw, method="linear")
        m = jax.image.resize(jnp.asarray(mask.astype(np.float32)), hw,
                             method="linear") > 0.999
        return np.asarray(g), np.asarray(m)

    report = {}
    for arch in args.archs.split(","):
        cfg = ({"num_depth": 192} if arch == "mvsnet" else
               {"depth_nums": (64, 32, 16),
                "interval_scales": (2.0, 1.0, 0.5)} if arch == "vis_mvsnet"
               else {})
        kw = {"nscale": 5} if arch == "cvp_mvsnet" else {}
        params = None
        outs = {}
        # mvsnet: the depth-chunked exact gather fits at full res and is
        # the bit-exact truth.  vis/cvp: forcing "gather" materializes the
        # unchunked [D,h,w,C] warped volumes (OOM at 592x800 D16 x4 pairs
        # on 16 GB); the production "auto" (Mosaic kernel, exact to bf16
        # rounding, runtime gather fallback) is the exact baseline there.
        exact = "gather" if arch == "mvsnet" else "auto"
        for method in (exact, "rect"):
            model = build_model(arch, dtype=jnp.bfloat16,
                                sweep_method=method, **cfg)
            margs = (imgs, K, R, t, dmin, dmax)
            if params is None:
                params = model.init(jax.random.PRNGKey(0), *margs,
                                    train=False, **kw)
            t0 = time.time()
            fwd = jax.jit(lambda v, a, model=model: model.apply(
                v, *a, train=False, **kw)["depth"])
            d = np.asarray(fwd(params, margs)[0].astype(jnp.float32))
            outs[method] = d
            g, m = gt_at(d.shape)
            epe = float(np.abs(d - g)[m].mean() / interval)
            line = {"arch": arch, "method": method,
                    "out_hw": list(d.shape),
                    "epe_vs_gt_itv": round(epe, 4),
                    "wall_s": round(time.time() - t0, 1)}
            print(json.dumps(line), flush=True)
        delta = np.abs(outs["rect"] - outs[exact]) / interval
        _, m = gt_at(outs["rect"].shape)
        report[arch] = {
            "exact_baseline": exact,
            "delta_mean_itv": round(float(delta[m].mean()), 4),
            "delta_p95_itv": round(float(np.percentile(delta[m], 95)), 4),
            "delta_max_itv": round(float(delta[m].max()), 4),
        }
        print(json.dumps({"arch": arch, **report[arch]}), flush=True)
    print(json.dumps({"config": f"{h}x{w}_N{n}_dtugeo_plane",
                      "interval": interval, **report}))


if __name__ == "__main__":
    main()

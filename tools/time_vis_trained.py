"""Vis-MVSNet full-res eval in the TRAINED (production) regime — TPU.

VERDICT r4 item 2: BASELINE's ~2.2 maps/s production estimate for the
1184x1600 N5 vis forward was stitched from per-stage timings + a CPU
dispatch census; this measures it end-to-end: a net trained via the real
train CLI (assets/vis_synth_trained.npz) on a rendered textured scene in
the DTU rig.  Stages 2-3 then recenter on the net's own (smooth) depth —
the regime every deployed network is in — instead of the random-weight
argmin-of-noise slabs that force the exact-gather fallback.

Also re-adjudicates rect-vs-direct for vis: the r3 "rect loses (657 ms)"
measurement ran with RANDOM weights, where the noisy per-pixel slabs blow
the rect KY=2 window and every pair pays the A-resample PLUS the gather
fallback.  Smooth trained slabs are the regime the rect canvas was built
for.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
    python tools/time_vis_trained.py [auto|rect|both]
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

ITERS = 3
H, W, N = 1184, 1600, 5


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from bench import scene_dtu, time_model
    from wildmvs.data.synthetic import render_rig_plane
    from wildmvs.models import build_model
    from wildmvs.train.checkpoint import load_params_npz

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    methods = ("auto", "rect") if which == "both" else (which,)

    params, stats, meta = load_params_npz(REPO / "assets"
                                          / "vis_synth_trained.npz")
    print(f"asset: arch={meta['architecture']} epoch={meta.get('epoch')} "
          f"recipe={meta.get('recipe')}", flush=True)
    variables = {"params": params, "batch_stats": stats}

    _, K, R, t, dmin, dmax = scene_dtu(1, N, H, W, 2892.0)
    Kn, Rn, tn = (np.asarray(a[0]) for a in (K, R, t))
    imgs_np, gt = render_rig_plane(Kn, Rn, tn, H, W,
                                   plane=(-30.0, 0.12, -0.08),
                                   extent=320.0, seed=0)
    args = (jnp.asarray(imgs_np)[None], K, R, t, dmin, dmax)

    # slab smoothness diagnostic: the net's own finest depth vs GT, plus
    # the per-(8-row, 128-col) chunk spread that decides kernel dispatch
    m0 = build_model("vis_mvsnet", depth_nums=(64, 32, 16),
                     interval_scales=(2.0, 1.0, 0.5), dtype=jnp.bfloat16)
    out = jax.jit(lambda v, a: m0.apply(v, *a, train=False)["depth"])(
        variables, args)
    d = np.asarray(jax.device_get(out))[0].astype(np.float32)
    g = gt[0][: d.shape[0] * 2: 2, : d.shape[1] * 2: 2]
    interval = (935.0 - 425.0) / 128.0
    mask = (g > 425.0) & (g < 935.0)
    epe = float(np.abs(d - g)[mask].mean() / interval)
    hh = d.shape[0] // 8 * 8
    ww = d.shape[1] // 128 * 128
    chunks = d[:hh, :ww].reshape(hh // 8, 8, ww // 128, 128)
    spread = (chunks.max(axis=(1, 3)) - chunks.min(axis=(1, 3)))
    print(f"trained depth: EPE {epe:.2f} intervals; per-chunk spread "
          f"p50/p95/max = {np.percentile(spread, 50):.1f}/"
          f"{np.percentile(spread, 95):.1f}/{spread.max():.1f} mm "
          f"(stage3 interval {interval * 0.5:.1f} mm)", flush=True)

    for method in methods:
        model = build_model("vis_mvsnet", depth_nums=(64, 32, 16),
                            interval_scales=(2.0, 1.0, 0.5),
                            dtype=jnp.bfloat16, sweep_method=method)
        info = {}
        dt = time_model(model, args, {}, iters=ITERS, info=info,
                        variables=variables)
        print(f"trained vis 1184x1600 N5 [{method}]: {dt * 1e3:.1f} ms "
              f"({1.0 / dt:.3f} maps/s)  spread {info.get('spread_pct')}% "
              f"roofline_frac {info.get('roofline_frac')}", flush=True)


if __name__ == "__main__":
    main()

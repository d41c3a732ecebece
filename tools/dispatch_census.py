"""Which sweep-kernel branch does each eval stage actually dispatch to?

Evaluates the runtime span conds (sweep_spans_px + _plan_fit) on CPU for
the full-res DTU-rig eval configs — no TPU needed, the plans are pure
arithmetic on cameras/hypotheses.  Explains e.g. the vis stage3 warp+gwc
cost (400.9 ms of the 568 ms forward, tools/time_vis_parts.py r4): if the
cond fails, the stage pays the exact-gather fallback.

Slab smoothness matters: vis stages 2-3 / CVP refinements sweep per-pixel
slabs recentered on the PREVIOUS stage's depth — smooth for a trained
net, noise for random weights.  Both regimes are reported.

Usage: JAX_PLATFORMS=cpu python tools/dispatch_census.py
"""
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from bench import scene_dtu
    from wildmvs.geometry.projective import scale_K
    from wildmvs.ops.mosaic_sweep import (TIER_B, _plan_fit, sweep_spans_px,
                                          tier_b_kr, vis_planes)

    H, W, N = 1184, 1600, 5
    _, K, R, t, dmin, dmax = scene_dtu(1, N, H, W, 2892.0)
    K, R, t = (np.asarray(a[0]) for a in (K, R, t))
    d_interval = (935.0 - 425.0) / 128.0
    rng = np.random.default_rng(0)

    print("== vis stages (homography convention, per-src plans) ==")
    for sname, scale, D, iscale, slab in (
            ("stage1", 8, 64, 2.0, "uniform"),
            ("stage2", 4, 32, 1.0, "both"),
            ("stage3", 2, 16, 0.5, "both")):
        h, w = H // scale, W // scale
        Ks = scale_K(jnp.asarray(K), 1.0 / scale)
        regimes = (("uniform", None),) if slab == "uniform" else (
            ("smooth", 12.0), ("noisy", None))
        for rname, corr in regimes:
            if slab == "uniform":
                start = np.full((1, 1), 425.0, np.float32)
            elif rname == "smooth":
                # trained-net regime: slab center = true-ish surface with
                # a little residual error (12 mm smooth field)
                yy, xx = np.meshgrid(np.linspace(0, 3, h),
                                     np.linspace(0, 3, w), indexing="ij")
                start = (650.0 + corr * np.sin(yy) * np.cos(xx)
                         ).astype(np.float32)
            else:
                # random-weights regime: stage-1 output is noise
                start = (680.0 + 30.0 * rng.standard_normal((h, w))
                         ).astype(np.float32)
            KRw = tier_b_kr((h, w), 32)
            Ht = h + 2
            rows = []
            for i in range(1, N):
                P, Q, sx, sy = vis_planes(Ks[0], jnp.asarray(R[0]),
                                          jnp.asarray(t[0]), Ks[i],
                                          jnp.asarray(R[i]),
                                          jnp.asarray(t[i]), (h, w), (h, w))
                steps = np.arange(D, dtype=np.float32).reshape(D, 1, 1)
                depth = start[None] + d_interval * iscale * steps
                svals = 1.0 / (depth + 1e-9)
                if svals.shape[1] == 1:
                    svals = jnp.asarray(svals[:, 0, 0])
                else:
                    svals = jnp.asarray(np.broadcast_to(svals, (D, h, w)))
                planA = sweep_spans_px(P, Q, svals, (h, w), sx=sx, sy=sy)
                planB = sweep_spans_px(P, Q, svals, (h, w), sx=sx, sy=sy,
                                       nt=TIER_B["NT"])
                okA = bool(_plan_fit(planA, 2, min(48, Ht), 2, Ht))
                okB = bool(_plan_fit(planB, TIER_B["KY"], KRw,
                                     TIER_B["NT"], Ht))
                rows.append("A" if okA else ("B" if okB else "gather"))
            print(f"vis {sname} {h}x{w} D{D} [{rname}]: "
                  f"{' '.join(rows)} (KR budget {KRw})", flush=True)


if __name__ == "__main__":
    main()

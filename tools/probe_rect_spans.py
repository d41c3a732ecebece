"""CPU diagnostic: rect-sweep window-plan stats at the full-res DTU eval
geometry (what tools/probe_rect.py measures on TPU).

Prints per-view yspan/xover/wspan and the KR budget — the fit conditions
that decide kernel vs gather-fallback dispatch in rect_cost_volume.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    sys.path.insert(0, "/root/repo")
    from bench import scene_dtu
    from wildmvs.geometry.projective import build_proj_matrices, scale_K
    from wildmvs.ops.mosaic_sweep import TIER_B, sweep_spans_px, tier_b_kr
    from wildmvs.ops.rect_sweep import (rect_decompose, rect_margin,
                                        rect_planes, rect_shift)

    n, h, w, d = 5, 1184, 1600, 192
    imgs, K, R, t, dmin, dmax = scene_dtu(1, n, h, w, 2892.0)
    fh, fw, c = h // 4, w // 4, 32
    proj = build_proj_matrices(scale_K(K, 0.25), R, t)
    steps = jnp.arange(d, dtype=jnp.float32)
    depth = dmin[0, 0] + (dmax[0, 0] - dmin[0, 0]) / (d - 1) * steps
    svals = 1.0 / depth

    M = rect_margin((fh, fw))
    Hm, Wm = fh + 2 * M, fw + 2 * M
    KR = tier_b_kr((Hm, Wm), c)
    print(f"feature grid {fh}x{fw}  margin {M}  canvas {Hm}x{Wm}  "
          f"tier_b_kr {KR}  (fitA needs wspan <= {KR-2}, "
          f"fitB wspan <= {KR-2})")
    for i in range(1, n):
        A, e = rect_decompose(proj[0, i], proj[0, 0])
        shift = rect_shift(e, svals, (fh, fw))
        P, Q = rect_planes(e, (fh, fw), M, shift)
        pA = sweep_spans_px(P, Q, svals, (Hm, Wm))
        pB = sweep_spans_px(P, Q, svals, (Hm, Wm), nt=TIER_B["NT"])
        print(f"view {i}: e={np_fmt(e)}  "
              f"A: yspan={int(pA['yspan'])} xover={int(pA['xover'])} "
              f"wspan={int(pA['wspan'])}  "
              f"B: xover={int(pB['xover'])} wspan={int(pB['wspan'])}")


def np_fmt(e):
    import numpy as np
    return np.array2string(np.asarray(e), precision=3)


if __name__ == "__main__":
    main()

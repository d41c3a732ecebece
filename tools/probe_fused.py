"""Diagnose the fused cost-volume kernel at the headline config.

Round-3 question: bench headline moved 41.2 -> 38.8 maps/s after wiring
the fused kernel — did the dispatch actually take the fused branch (and
the kernel is slower than v1+XLA-agg), or did the plan fall back?

Prints: per-view plan stats (yspan / xover / wspan at DC), the dispatch
verdict, and RTT-corrected timings of (a) the full cost_volume_mosaic
dispatch, (b) the v1 per-view cascade forced, (c) the fused kernel branch
forced.  Run on the live TPU, serially with nothing else on the tunnel.
"""
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def scene(b, n, h, w, f):
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    imgs = jnp.array(rng.random((b, n, h, w, 3)).astype(np.float32))
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    K = jnp.array(np.tile(K, (b, n, 1, 1)))
    R = jnp.array(np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1)))
    t = np.zeros((b, n, 3, 1), np.float32)
    for i in range(n):
        t[:, i, 0, 0] = 0.1 * i
    t = jnp.array(t)
    return imgs, K, R, t


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    from wildmvs.geometry.projective import build_proj_matrices, scale_K
    from wildmvs.ops import mosaic_sweep as ms

    H, W, D, C, N = 128, 160, 192, 32, 3
    imgs, K, R, t = scene(1, N, 512, 640, 720.0)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((1, N, H, W, C)), jnp.bfloat16)
    proj = build_proj_matrices(scale_K(K, 0.25), R, t)
    depths = jnp.linspace(425.0, 935.0, D)[None].astype(jnp.float32)

    # ---- plan stats ----
    DC = ms._pick_dc(D)
    KR = ms.fused_window_rows((H, W), C, N - 1)
    print(f"DC={DC} KR={KR}")
    for i in range(1, N):
        P, Q, sx, sy = ms.mvsnet_planes(proj[0, i], proj[0, 0], (H, W))
        plan = ms.sweep_spans_px(P, Q, depths[0], (H, W), dc=DC)
        print(f"view {i}: yspan={int(plan['yspan'])} "
              f"xover={int(plan['xover'])} wspan={int(plan['wspan'])} "
              f"(fused needs yspan<={1}, xover<=0, wspan<={KR - 2})")

    # ---- timings (chain-scan; host fetch fences) ----
    def time_fn(f, iters=20, reps=3):
        @jax.jit
        def chain():
            def body(c, _):
                return c + f().astype(jnp.float32).sum(), None
            tot, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
            return tot
        float(chain())
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain())
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1e3

    def full_dispatch():
        return ms.cost_volume_mosaic(feats, proj, [1, 2], 0, depths,
                                     (H, W), "variance", D)

    def v1_forced():
        return ms._cost_volume_mosaic_v1(feats, proj, [1, 2], 0, depths,
                                         (H, W), "variance", D, None, 0)

    def fused_forced():
        feats_l = [feats[:, i] for i in range(N)]
        return ms.fused_cost_volume_px(
            feats_l, proj, depths, (H, W), agg="variance",
            fallback=lambda bb: jnp.zeros((D, H, W, C), jnp.bfloat16))

    print(f"dispatch: {time_fn(full_dispatch):.2f} ms")
    print(f"v1 forced: {time_fn(v1_forced):.2f} ms")
    print(f"fused (zero-fallback): {time_fn(fused_forced):.2f} ms")
    # sanity: is the fused branch actually taken? (zero output = fallback)
    out = np.asarray(fused_forced(), np.float32)
    print(f"fused output nonzero frac: {(np.abs(out) > 0).mean():.3f} "
          f"(0.0 => fell back)")


if __name__ == "__main__":
    main()

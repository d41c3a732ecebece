"""Vis-MVSNet full-res eval stage split (TPU).

The 1184x1600 N5 eval forward runs at 1.76 maps/s (568 ms) and VERDICT r3
item 2 wants it ~2x faster.  This times each piece in isolation at the
eval-protocol sizes (DTU-like rig from bench.scene_dtu so the kernel
dispatch sees realistic spans):

  * FeatExt over the 5 full-res views (592/296/148 feature grids)
  * each SingleStage with synthetic stage inputs: stage1 148x200 D64,
    stage2 296x400 D32 (per-pixel slab), stage3 592x800 D16
  * within a stage: the fused warp+gwc kernel alone vs the reg tail

Chain-scan timing (host fetch fences; ~33 ms RTT amortized over iters).

Usage: PYTHONPATH=/root/repo timeout 3600 python tools/time_vis_parts.py
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

H, W, N = 1184, 1600, 5
ITERS = 6


def timeit(fn, *args):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(*a):
        def body(carry, eps):
            out = fn(*((a[0] + eps,) + a[1:]))
            return carry + jnp.sum(out[0] if isinstance(out, tuple)
                                   else out).astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.zeros(()),
                              jnp.arange(ITERS, dtype=a[0].dtype) * 1e-6)
        return tot

    float(chain(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from bench import scene_dtu
    from wildmvs.models.vis_mvsnet import FeatExt, SingleStage

    imgs, K, R, t, dmin, dmax = scene_dtu(1, N, H, W, 2892.0)
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    # ---- FeatExt over all views ----
    fext = FeatExt(dtype=dtype)
    x = imgs.reshape(N, H, W, 3).astype(dtype)
    fvars = fext.init(jax.random.PRNGKey(0), x, train=False)
    ms = timeit(lambda xx: fext.apply(fvars, xx, train=False)[0], x)
    print(f"featext 5x{H}x{W}: {ms:.1f} ms", flush=True)

    # ---- stages ----
    d_interval = (935.0 - 425.0) / 128.0
    cams = {"K": K[0][None], "R": R[0][None], "t": t[0][None]}
    for sname, scale, D, iscale, per_pixel in (
            ("stage1", 8, 64, 2.0, False),
            ("stage2", 4, 32, 1.0, True),
            ("stage3", 2, 16, 0.5, True)):
        h, w = H // scale, W // scale
        ref = jnp.asarray(rng.standard_normal((1, h, w, 32)), dtype)
        srcs = [jnp.asarray(rng.standard_normal((1, h, w, 32)), dtype)
                for _ in range(N - 1)]
        if per_pixel:
            # two slab regimes (tools/dispatch_census.py): "noisy" is the
            # random-weights worst case (stage3 falls to the exact-gather
            # fallback on every pair); "smooth" is the trained-net
            # production regime (every stage dispatches the TIER_B kernel)
            yy, xx = np.meshgrid(np.linspace(0, 3, h), np.linspace(0, 3, w),
                                 indexing="ij")
            bases = {
                "noisy": jnp.asarray(
                    680.0 + 30.0 * rng.standard_normal((1, 1, h, w)),
                    jnp.float32),
                "smooth": jnp.asarray(
                    650.0 + 12.0 * np.sin(yy) * np.cos(xx), jnp.float32
                )[None, None],
            }
        else:
            bases = {"uniform": jnp.full((1, 1, 1, 1), 425.0, jnp.float32)}
        dint = jnp.full((1, 1, 1, 1), d_interval * iscale, jnp.float32)
        stage = SingleStage(dtype=dtype)
        base0 = next(iter(bases.values()))
        svars = stage.init(jax.random.PRNGKey(1), ref, srcs, cams, D,
                           base0, dint, scale, train=False)

        for rname, base in bases.items():
            def run(r, srcs=srcs, svars=svars, stage=stage, D=D, base=base,
                    dint=dint, scale=scale):
                est, prob, _ = stage.apply(svars, r, srcs, cams, D, base,
                                           dint, scale, train=False)
                return est
            ms = timeit(run, ref)
            print(f"{sname} {h}x{w} D{D} x{N-1}pairs [{rname}]: "
                  f"{ms:.1f} ms", flush=True)

        # warp+gwc kernel alone (the stage minus the reg tail)
        from wildmvs.ops.mosaic_sweep import (homography_gwc_volume_mosaic,
                                              vis_mosaic_supported)
        if vis_mosaic_supported((h, w), (h, w), dtype):
            from wildmvs.geometry.projective import scale_K

            def warps(r, srcs=srcs, D=D, base=base, dint=dint, scale=scale):
                Ks = scale_K(cams["K"], 1.0 / scale)
                acc = None
                for i in range(N - 1):
                    c = homography_gwc_volume_mosaic(
                        srcs[i], r, Ks[:, 0], cams["R"][:, 0],
                        cams["t"][:, 0], Ks[:, i + 1], cams["R"][:, i + 1],
                        cams["t"][:, i + 1], D, base, dint, (h, w),
                        groups=8)
                    acc = c if acc is None else acc + c
                return acc
            ms = timeit(warps, ref)
            print(f"{sname} warp+gwc x{N-1}: {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

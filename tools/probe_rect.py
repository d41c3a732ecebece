"""A/B the rectified (H_inf-factored) sweep vs the direct Mosaic dispatch
at the full-res DTU eval protocol config (1184x1600 N5, DTU-like rig).

Usage: timeout 1800 python tools/probe_rect.py [methods...]
  default methods: rect auto
WILDMVS_PROBE_PLANE=1 replaces the random-noise images with a rendered
textured plane: real scenes have SMOOTH depth, so the per-pixel slabs of
vis stages 2-3 / CVP refinements get realistic spans and the kernel
dispatch behaves as in production (random textures are the worst case).
"""
import os
import sys
import time

import numpy as np


def probe_args(h=1184, w=1600, n=5):
    from bench import scene_dtu
    args = scene_dtu(1, n, h, w, 2892.0)
    if os.environ.get("WILDMVS_PROBE_PLANE") == "1":
        import jax.numpy as jnp
        from wildmvs.data.synthetic import render_rig_plane
        _, K, R, t, dmin, dmax = args
        imgs, _ = render_rig_plane(*(np.asarray(a[0]) for a in (K, R, t)),
                                   h, w, plane=(-30.0, 0.12, -0.08),
                                   extent=320.0, seed=0)
        args = (jnp.asarray(imgs)[None], K, R, t, dmin, dmax)
    return args


def main():
    methods = sys.argv[1:] or ["rect", "auto"]
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    sys.path.insert(0, "/root/repo")
    from bench import scene_dtu, time_model
    from wildmvs.models import build_model

    if methods and methods[0] == "vis":
        return vis(methods[1:] or ("rect",))
    if methods and methods[0] == "cvp":
        return cvp(methods[1:] or ("rect",))
    args = probe_args()
    for m in methods:
        model = build_model("mvsnet", num_depth=192, dtype=jnp.bfloat16,
                            sweep_method=m)
        t0 = time.perf_counter()
        dt = time_model(model, args, {}, iters=4)
        print(f"{m:8s}: {dt*1e3:7.1f} ms/map  ({1.0/dt:.3f} maps/s)  "
              f"[wall incl compile {time.perf_counter()-t0:.0f}s]",
              flush=True)




def vis(methods=("rect", "auto")):
    import jax.numpy as jnp
    import time as _t
    sys.path.insert(0, "/root/repo")
    from bench import scene_dtu, time_model
    from wildmvs.models import build_model
    args = probe_args()
    for m in methods:
        model = build_model("vis_mvsnet", depth_nums=(64, 32, 16),
                            interval_scales=(2.0, 1.0, 0.5),
                            dtype=jnp.bfloat16, sweep_method=m)
        t0 = _t.perf_counter()
        dt = time_model(model, args, {}, iters=3)
        print(f"vis {m:8s}: {dt*1e3:7.1f} ms/map  ({1.0/dt:.3f} maps/s)  "
              f"[wall incl compile {_t.perf_counter()-t0:.0f}s]",
              flush=True)


def cvp(methods=("rect",)):
    import jax.numpy as jnp
    import time as _t
    sys.path.insert(0, "/root/repo")
    from bench import scene_dtu, time_model
    from wildmvs.models import build_model
    args = probe_args()
    for m in methods:
        model = build_model("cvp_mvsnet", dtype=jnp.bfloat16,
                            sweep_method=m)
        t0 = _t.perf_counter()
        dt = time_model(model, args, {"nscale": 5}, iters=3)
        print(f"cvp {m:8s}: {dt*1e3:7.1f} ms/map  ({1.0/dt:.3f} maps/s)  "
              f"[wall incl compile {_t.perf_counter()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()

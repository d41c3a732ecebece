"""Staged CVP-MVSNet eval timing: where do the 148 ms go?

Variants (argv[1], default all):
  feats   — feature pyramid only (nscale levels x N views)
  coarse  — feats + coarsest 96-hypothesis sweep + reg + regression
  nohypo  — full forward with cal_depth_hypo replaced by fixed intervals
            (isolates the per-pixel epipolar hypothesis cost)
  full    — the full eval forward (matches tools/bench_more.py)

Each variant is its own jitted chain-scan program (compile cost per
variant); run on the live backend.
Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 \
    python tools/time_cvp_parts.py [variant] [--evalres]
--evalres switches to the TRUE eval protocol: 1184x1600 N5 nscale 5 on
the DTU-like rig (bench.scene_dtu), the config behind the
cvp_eval_1184x1600_N5 bench field (0.908 maps/s round 4).
"""
import json
import sys
import time

import numpy as np

ITERS = 6


def timed(name, fn, *args):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(imgs, rest):
        def body(carry, eps):
            out = fn(imgs + eps, rest)
            return carry + out.astype(jnp.float32), None
        total, _ = jax.lax.scan(body, jnp.zeros(()),
                                jnp.arange(ITERS, dtype=imgs.dtype) * 1e-6)
        return total

    imgs, rest = args
    float(chain(imgs, rest))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(imgs, rest))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"stage": name, "ms": round(best / ITERS * 1e3, 2)}))


def main():
    import jax
    import jax.numpy as jnp
    from wildmvs.models import build_model
    from wildmvs.models import cvp_mvsnet as C
    from tools.bench_more import scene

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    which = argv[0] if argv else "all"
    if "--evalres" in sys.argv:
        from bench import scene_dtu
        args = scene_dtu(1, 5, 1184, 1600, 2892.0)
        global ITERS
        ITERS = 3
    else:
        args = scene(1, 3, 512, 640)
    imgs, K, R, t, dmin, dmax = args
    model = build_model("cvp_mvsnet", dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), *args, train=False,
                           nscale=5)

    if which in ("feats", "all"):
        # the shared 9-conv extractor over the 5-level pyramid, all 3 views
        fp = C.FeaturePyramidNet(dtype=jnp.bfloat16)
        fpv = {"params": variables["params"]["feature_pyramid"]}

        def feats_fn(im, _):
            b, n, h, w, c = im.shape
            x = im.reshape(b * n, h, w, c)
            acc = jnp.zeros((), jnp.float32)
            for _lvl in range(5):
                acc = acc + fp.apply(fpv, x).sum().astype(jnp.float32)
                if _lvl < 4:
                    x = C._bilinear_half(x)
            return acc
        timed("feature_pyramid_x5", feats_fn, imgs, 0)

    if which in ("nohypo", "all"):
        real = C.cal_depth_hypo

        def fixed_hypo(ref_depth, K_ref, K_src, R_ref, t_ref, R_src, t_src,
                       depth_min, depth_max, d=4, pixel_interval=1.0):
            isz = (depth_max - depth_min) / 128.0
            offs = jnp.arange(-d, d, dtype=ref_depth.dtype).reshape(2 * d, 1, 1)
            return ref_depth[:, None] + offs * isz[:, None, None, None]
        C.cal_depth_hypo = fixed_hypo
        try:
            def nohypo_fn(im, _):
                return model.apply(variables, im, K, R, t, dmin, dmax,
                                   train=False, nscale=5)["depth"].sum()
            timed("full_fixed_intervals", nohypo_fn, imgs, 0)
        finally:
            C.cal_depth_hypo = real

    if which in ("full", "all"):
        def full_fn(im, _):
            return model.apply(variables, im, K, R, t, dmin, dmax,
                               train=False, nscale=5)["depth"].sum()
        timed("full_eval", full_fn, imgs, 0)


if __name__ == "__main__":
    main()

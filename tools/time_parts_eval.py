"""Stage timing of the MVSNet FULL-RES DTU eval forward (1184x1600 N5).

Same chain-scan method as tools/time_parts.py (dispatch RTT amortized),
at the true eval protocol config (bench.scene_dtu geometry, so the kernel
dispatch takes the branches the real protocol takes):
  feats    — FeatureNet over the 5 full-res views
  + volume — feats + Mosaic cost-volume aggregation (TIER_B streamed)
  full     — whole forward (packed regnet)
  full-up  — whole forward, packed_regnet=False (unpacked 3D UNet)

Usage: timeout 1800 python tools/time_parts_eval.py [iters]
"""
import sys
import time

import numpy as np

ITERS = 4


def main():
    global ITERS
    if len(sys.argv) > 1:
        ITERS = int(sys.argv[1])
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    sys.path.insert(0, "/root/repo")
    from bench import scene_dtu
    from wildmvs.models import build_model
    from wildmvs.models.mvsnet import FeatureNet
    from wildmvs.ops.mosaic_sweep import cost_volume_mosaic
    from wildmvs.geometry.projective import build_proj_matrices, scale_K

    b, n, h, w, d = 1, 5, 1184, 1600, 192
    imgs, K, R, t, dmin, dmax = scene_dtu(b, n, h, w, 2892.0)

    model = build_model("mvsnet", num_depth=d, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), imgs, K, R, t, dmin, dmax,
                           train=False)
    fparams = {
        "params": variables["params"]["feature"],
        "batch_stats": variables["batch_stats"]["feature"],
    }
    fnet = FeatureNet(dtype=jnp.bfloat16, name="feature")

    def timed(body):
        def run(x0):
            def step(carry, eps):
                return carry + body(imgs + eps), None
            tot, _ = jax.lax.scan(
                step, x0, jnp.arange(ITERS, dtype=imgs.dtype) * 1e-6)
            return tot
        fn = jax.jit(run)
        float(fn(jnp.zeros(())))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(jnp.zeros(())))
            best = min(best, time.perf_counter() - t0)
        return best / ITERS

    def feats_body(im):
        f = fnet.apply(fparams, im.reshape(b * n, h, w, 3), False)
        return f.sum().astype(jnp.float32)

    proj = build_proj_matrices(scale_K(K, 0.25), R, t)
    steps = jnp.arange(d, dtype=jnp.bfloat16)
    interval = (dmax - dmin) / (d - 1)
    depth_values = dmin[..., None] + interval[..., None] * steps
    ref_depths = depth_values[:, 0]

    def volume_body(im):
        f = fnet.apply(fparams, im.reshape(b * n, h, w, 3), False)
        fh, fw = f.shape[1:3]
        f = f.reshape(b, n, fh, fw, -1)
        cv = cost_volume_mosaic(f, proj, list(range(1, n)), 0, ref_depths,
                                (fh, fw), "variance", d)
        return cv.sum().astype(jnp.float32)

    t_f = timed(feats_body)
    print(f"feats:          {t_f*1e3:7.2f} ms", flush=True)
    t_v = timed(volume_body)
    print(f"feats+volume:   {t_v*1e3:7.2f} ms   (warp+agg "
          f"{(t_v-t_f)*1e3:.2f})", flush=True)

    def full_body(im):
        out = model.apply(variables, im, K, R, t, dmin, dmax, train=False)
        return out["depth"].sum().astype(jnp.float32)

    t_a = timed(full_body)
    print(f"full (packed):  {t_a*1e3:7.2f} ms   (reg+argmin "
          f"{(t_a-t_v)*1e3:.2f})", flush=True)

    model_u = build_model("mvsnet", num_depth=d, dtype=jnp.bfloat16,
                          packed_regnet=False)

    def full_unpacked(im):
        out = model_u.apply(variables, im, K, R, t, dmin, dmax, train=False)
        return out["depth"].sum().astype(jnp.float32)

    t_u = timed(full_unpacked)
    print(f"full (unpacked):{t_u*1e3:7.2f} ms   (reg+argmin "
          f"{(t_u-t_v)*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()

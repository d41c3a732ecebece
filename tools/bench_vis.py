"""Vis-MVSNet depthmap inference throughput, single chip.

The reference's best supervised config is vis_mvsnet (README.md:63-64);
its eval pipeline runs depth_nums [64,32,16] x interval_scales [2,1,0.5]
at input downscale 2 (evaluation/pipeline_utils.py:133-154).  This times
that configuration on a 512x640 input (so the cascade runs 256x320
internally at 1/8,1/4,1/2 feature scales), N=3 views, bf16 compute.

Usage: timeout 1800 python tools/bench_vis.py
Prints one JSON line like bench.py.
"""
import json
import time

import numpy as np

ITERS = 6


def main():
    import jax
    import jax.numpy as jnp
    from wildmvs.models import build_model

    b, n, h, w = 1, 3, 256, 320   # after the pipeline's downscale-2 of 512x640
    rng = np.random.default_rng(0)
    imgs = jnp.array(rng.random((b, n, h, w, 3)).astype(np.float32))
    K = np.array([[360.0, 0, w / 2], [0, 360.0, h / 2], [0, 0, 1]], np.float32)
    K = jnp.array(np.tile(K, (b, n, 1, 1)))
    R = jnp.array(np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1)))
    t = np.zeros((b, n, 3, 1), np.float32)
    for i in range(n):
        t[:, i, 0, 0] = 0.1 * i
    t = jnp.array(t)
    dmin = jnp.full((b, n), 425.0)
    dmax = jnp.full((b, n), 935.0)

    model = build_model("vis_mvsnet", depth_nums=(64, 32, 16),
                        interval_scales=(2.0, 1.0, 0.5), dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), imgs, K, R, t, dmin, dmax,
                           train=False)

    @jax.jit
    def forward_chain(v, imgs):
        def body(carry, eps):
            out = model.apply(v, imgs + eps, K, R, t, dmin, dmax,
                              train=False)["depth"]
            return carry + out.sum().astype(jnp.float32), None
        total, _ = jax.lax.scan(body, jnp.zeros(()),
                                jnp.arange(ITERS, dtype=imgs.dtype) * 1e-6)
        return total

    float(forward_chain(variables, imgs))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(forward_chain(variables, imgs))
        best = min(best, time.perf_counter() - t0)
    dt = best / ITERS
    print(json.dumps({
        "metric": "vis_mvsnet_depthmap_inference_512x640_eval_cfg_N3",
        "value": round(b / dt, 3),
        "unit": "depthmaps/s",
    }))


if __name__ == "__main__":
    main()

"""CVP-MVSNet eval throughput + batched MVSNet inference, single chip.

Two measurements rounding out the per-architecture numbers:
  * cvp_mvsnet at its eval configuration (nscale=5 pyramid levels,
    96 coarse hypotheses, epipolar per-pixel intervals), 512x640, N=3.
  * mvsnet at batch size 4 (serving configuration — amortizes fixed
    per-program cost over 4 reference views).

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 python tools/bench_more.py
"""
import json
import time

import numpy as np

ITERS = 6


def scene(b, n, h, w):
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    imgs = jnp.array(rng.random((b, n, h, w, 3)).astype(np.float32))
    K = np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]], np.float32)
    K = jnp.array(np.tile(K, (b, n, 1, 1)))
    R = jnp.array(np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1)))
    t = np.zeros((b, n, 3, 1), np.float32)
    for i in range(n):
        t[:, i, 0, 0] = 0.1 * i
    t = jnp.array(t)
    dmin = jnp.full((b, n), 425.0)
    dmax = jnp.full((b, n), 935.0)
    return imgs, K, R, t, dmin, dmax


def run(name, model, args, kwargs, b):
    import jax
    import jax.numpy as jnp
    imgs = args[0]
    variables = model.init(jax.random.PRNGKey(0), *args, train=False,
                           **kwargs)

    @jax.jit
    def chain(v, imgs):
        def body(carry, eps):
            out = model.apply(v, imgs + eps, *args[1:], train=False,
                              **kwargs)["depth"]
            return carry + out.sum().astype(jnp.float32), None
        total, _ = jax.lax.scan(body, jnp.zeros(()),
                                jnp.arange(ITERS, dtype=imgs.dtype) * 1e-6)
        return total

    float(chain(variables, imgs))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(variables, imgs))
        best = min(best, time.perf_counter() - t0)
    dt = best / ITERS
    print(json.dumps({"metric": name, "value": round(b / dt, 3),
                      "unit": "depthmaps/s"}))


def main():
    import jax.numpy as jnp
    from wildmvs.models import build_model

    args = scene(1, 3, 512, 640)
    cvp = build_model("cvp_mvsnet", dtype=jnp.bfloat16)
    run("cvp_mvsnet_depthmap_inference_512x640_eval_N3", cvp, args,
        {"nscale": 5}, 1)

    args4 = scene(4, 3, 512, 640)
    mvs = build_model("mvsnet", num_depth=192, dtype=jnp.bfloat16)
    run("mvsnet_depthmap_inference_512x640_D192_N3_B4", mvs, args4, {}, 4)


if __name__ == "__main__":
    main()

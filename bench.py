"""Headline benchmark: depthmap inference throughput, single chip.

Measures the flagship forward (MVSNet, N=3 views, 512x640, 192 depth
hypotheses — the reference's DTU training configuration,
data/dtu_yao.py:41-42 + models/MVSNet/model.py:98) and prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": "depthmaps/s", "vs_baseline": ...}

vs_baseline normalizes by an estimated reference throughput of 4.0
depthmaps/s for the torch implementation on one A100 (no published number
exists — BASELINE.md; this constant is revised if a measured torch number
becomes available).
"""
import json
import os
import time

import numpy as np

BASELINE_DEPTHMAPS_PER_S = 4.0

# experiment hook: sweep backend override (see wildmvs/models/mvsnet.py)
SWEEP_METHOD = os.environ.get("WILDMVS_BENCH_METHOD", "auto")


def main():
    import jax
    import jax.numpy as jnp
    from wildmvs.models import build_model

    b, n, h, w, d = 1, 3, 512, 640, 192
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

    # bf16 compute (f32 params/accumulation) is the deployment configuration
    model = build_model("mvsnet", num_depth=d, dtype=jnp.bfloat16,
                        sweep_method=SWEEP_METHOD)
    variables = model.init(jax.random.PRNGKey(0), imgs, K, R, t, dmin, dmax,
                           train=False)

    # NOTE: on the tunneled axon backend, block_until_ready does not actually
    # synchronize; the only reliable fence is a host fetch. We therefore chain
    # `iters` forwards in ONE device program (scan over input perturbations,
    # which also defeats CSE) and fetch a scalar at the end.
    iters = 10

    @jax.jit
    def forward_chain(v, imgs, K, R, t, dmin, dmax):
        def body(carry, eps):
            out = model.apply(v, imgs + eps, K, R, t, dmin, dmax,
                              train=False)["depth"]
            return carry + out.sum(), None
        total, _ = jax.lax.scan(body, jnp.zeros(()),
                                jnp.arange(iters, dtype=imgs.dtype) * 1e-6)
        return total

    float(forward_chain(variables, imgs, K, R, t, dmin, dmax))  # compile+warm
    t0 = time.perf_counter()
    float(forward_chain(variables, imgs, K, R, t, dmin, dmax))
    dt = (time.perf_counter() - t0) / iters
    value = b / dt
    print(json.dumps({
        "metric": "mvsnet_depthmap_inference_512x640_D192_N3",
        "value": round(value, 3),
        "unit": "depthmaps/s",
        "vs_baseline": round(value / BASELINE_DEPTHMAPS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()

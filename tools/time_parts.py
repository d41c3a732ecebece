"""Stage timing of the flagship forward on the live backend.

Times three nested programs with the chain-scan method (RTT excluded):
  feats  — FeatureNet over all views
  volume — feats + plane-sweep warp + variance aggregation (to a scalar)
  full   — the whole forward (depth out)
Differences localize the cost: warp+aggregate = volume-feats,
regularization+softargmin = full-volume.

Usage: timeout 1500 python tools/time_parts.py [gather|wide]
"""
import sys
import time

import numpy as np

ITERS = 8


def timed(fn, *args):
    import jax
    fn = jax.jit(fn)
    float(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    import jax
    import jax.numpy as jnp
    from wildmvs.models import build_model
    from wildmvs.models.mvsnet import FeatureNet
    from wildmvs.ops.plane_sweep import plane_sweep_warp
    from wildmvs.ops.volumes import variance_cost_volume
    from wildmvs.geometry.projective import build_proj_matrices, scale_K

    method = sys.argv[1] if len(sys.argv) > 1 else "gather"
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

    model = build_model("mvsnet", num_depth=d, dtype=jnp.bfloat16,
                        sweep_method=method)
    variables = model.init(jax.random.PRNGKey(0), imgs, K, R, t, dmin, dmax,
                           train=False)
    fparams = {
        "params": variables["params"]["feature"],
        "batch_stats": variables["batch_stats"]["feature"],
    }
    fnet = FeatureNet(dtype=jnp.bfloat16, name="feature")

    def chain(body):
        def run(x0):
            def step(carry, eps):
                return carry + body(imgs + eps), None
            tot, _ = jax.lax.scan(step, x0,
                                  jnp.arange(ITERS, dtype=imgs.dtype) * 1e-6)
            return tot
        return run

    def feats_body(im):
        f = fnet.apply(fparams, im.reshape(b * n, h, w, 3), False)
        return f.sum().astype(jnp.float32)

    proj = build_proj_matrices(scale_K(K, 0.25), R, t)
    steps = jnp.arange(d, dtype=imgs.dtype)
    interval = (dmax - dmin) / (d - 1)
    depth_values = dmin[..., None] + interval[..., None] * steps
    ref_depths = depth_values[:, 0]

    def volume_body(im):
        f = fnet.apply(fparams, im.reshape(b * n, h, w, 3), False)
        fh, fw = f.shape[1:3]
        f = f.reshape(b, n, fh, fw, -1)
        fns = [(lambda i=i: plane_sweep_warp(f[:, i], proj[:, i], proj[:, 0],
                                             ref_depths, (fh, fw)))
               for i in (1, 2)]
        cv = variance_cost_volume(f[:, 0], warp_fns=fns, num_depth=d)
        return cv.sum().astype(jnp.float32)

    def full_body(im):
        out = model.apply(variables, im, K, R, t, dmin, dmax, train=False)
        return out["depth"].sum().astype(jnp.float32)

    t_f = timed(chain(feats_body), jnp.zeros(()))
    print(f"feats:          {t_f*1e3:7.2f} ms")
    t_v = timed(chain(volume_body), jnp.zeros(()))
    print(f"feats+volume:   {t_v*1e3:7.2f} ms   (warp+agg {((t_v-t_f))*1e3:.2f})")
    t_a = timed(chain(full_body), jnp.zeros(()))
    print(f"full:           {t_a*1e3:7.2f} ms   (reg+argmin {((t_a-t_v))*1e3:.2f})")


if __name__ == "__main__":
    main()

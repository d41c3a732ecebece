"""Decompose the octet wide-sweep warp's cost on the live backend.

Times, for one source view at bench feature sizes (D=192, H=128, W=160,
C=32): the exact gather warp, the octet table+gather alone, the octet
plan+one-hot weights alone, and the full octet warp — to localize where
the wide path's time goes (gather vs combine).

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python tools/time_wide.py
"""
import time

import numpy as np

ITERS = 8


def timed(label, make_body, x0):
    import jax
    import jax.numpy as jnp

    def run(x0):
        def step(carry, eps):
            return carry + make_body(eps), None
        tot, _ = jax.lax.scan(
            step, x0, jnp.arange(ITERS, dtype=jnp.float32) * 1e-6)
        return tot

    fn = jax.jit(run)
    float(fn(x0))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(x0))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best / ITERS * 1e3:7.2f} ms")


def main():
    import jax
    import jax.numpy as jnp
    from wildmvs.ops import wide_sweep as ws
    from wildmvs.ops.plane_sweep import plane_sweep_warp
    from wildmvs.ops.pallas_sweep import sweep_coords_from_projs
    from wildmvs.geometry.projective import build_proj_matrices

    d, h, w, c = 192, 128, 160, 32
    rng = np.random.default_rng(0)
    src = jnp.array(rng.random((h, w, c)).astype(np.float32)).astype(jnp.bfloat16)
    K = np.array([[180.0, 0, w / 2], [0, 180.0, h / 2], [0, 0, 1]], np.float32)
    Rm = np.stack([np.eye(3, dtype=np.float32)] * 2)
    t = np.zeros((2, 3, 1), np.float32)
    t[1, 0, 0] = 0.1
    proj = build_proj_matrices(jnp.array(np.tile(K, (1, 2, 1, 1))),
                               jnp.array(Rm)[None], jnp.array(t)[None])
    depths = jnp.linspace(425.0, 935.0, d)

    xs0, ys0 = sweep_coords_from_projs(proj[0, 1], proj[0, 0], depths, (h, w))

    def exact(eps):
        out = plane_sweep_warp(src[None], proj[:, 1], proj[:, 0],
                               (depths + eps)[None], (h, w))
        return out.sum().astype(jnp.float32)

    def octet_full(eps):
        out = ws.octet_sweep_warp(src, xs0 + eps, ys0)
        return out.sum().astype(jnp.float32)

    def octet_gather_only(eps):
        plan, _, _ = ws._octet_plan(xs0 + eps, ys0, h, w)
        rows = ws._octet_table(src).at[plan["idx"].reshape(-1)].get(
            mode="promise_in_bounds")
        return rows.sum().astype(jnp.float32)

    def octet_plan_only(eps):
        plan, _, _ = ws._octet_plan(xs0 + eps, ys0, h, w)
        fx, fy, v, g00 = plan["fx"], plan["fy"], plan["v"], plan["g00"]
        w00 = (1.0 - fy) * (1.0 - fx) * v
        return (w00.sum() + g00.sum() + plan["idx"].sum()).astype(jnp.float32)

    timed("exact gather warp", exact, jnp.zeros(()))
    timed("octet full", octet_full, jnp.zeros(()))
    timed("octet table+gather only", octet_gather_only, jnp.zeros(()))
    timed("octet plan+weights only", octet_plan_only, jnp.zeros(()))


if __name__ == "__main__":
    main()

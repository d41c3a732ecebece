"""Per-level CVP-MVSNet full-res eval breakdown (TPU).

The cvp_eval_1184x1600_N5 forward costs 1101 ms, of which the extractor
pyramid is 122 ms and cal_depth_hypo ~0 (tools/time_cvp_parts.py r4).
This times the remaining pieces per pyramid level at the eval-protocol
sizes: the per-pixel-hypothesis variance cost volume (the Mosaic px
kernel dispatch vs its gather fallback under the DTU rig's spans) and
the depth-packed CVPCostRegNet.

Usage: PYTHONPATH=/root/repo timeout 3600 python tools/time_cvp_levels.py
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

ITERS = 4


def timeit(fn, *args):
    """fn(*args) timed via a chain-scan.  ALL arrays must be passed as
    args, never closed over — closure constants get EMBEDDED in the
    program and a full-res feature list blows the remote-compile payload
    limit (HTTP 413)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(*a):
        def body(carry, eps):
            out = fn(*((a[0] + eps,) + a[1:]))
            return carry + jnp.sum(out).astype(jnp.float32), None
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
    from wildmvs.geometry.projective import build_proj_matrices, scale_K
    from wildmvs.models.cvp_mvsnet import CVPCostRegNet
    from wildmvs.ops.mosaic_sweep import variance_volume_mosaic_px

    H, W, N = 1184, 1600, 5
    _, K, R, t, dmin, dmax = scene_dtu(1, N, H, W, 2892.0)
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    C = 16

    levels = [(H, W), (H // 2, W // 2), (H // 4, W // 4), (H // 8, W // 8),
              (H // 16, W // 16)]
    reg = CVPCostRegNet(dtype=dtype)

    for li, (h, w) in enumerate(levels):
        D = 96 if li == len(levels) - 1 else 8
        feats = [jnp.asarray(rng.standard_normal((1, h, w, C)), dtype)
                 for _ in range(N)]
        Ks = scale_K(K, h / H)
        proj = build_proj_matrices(Ks, R, t)
        if D == 8:
            base = jnp.asarray(
                680.0 + 20.0 * rng.standard_normal((1, h, w)), jnp.float32)
            offs = jnp.arange(-4, 4, dtype=jnp.float32).reshape(1, 8, 1, 1)
            hyp = base[:, None] + offs * 4.0
        else:
            hyp = jnp.linspace(425.0, 935.0, D)[None]

        ms = timeit(lambda *a, h=h, w=w:
                    variance_volume_mosaic_px(list(a[:N]), a[N], a[N + 1],
                                              (h, w)).astype(jnp.float32),
                    *feats, proj, hyp)
        print(f"level {h}x{w} D{D} cost-volume x{N-1}src: {ms:.1f} ms",
              flush=True)

        cost = jnp.asarray(rng.standard_normal((1, D, h, w, C)), dtype)
        rv = reg.init(jax.random.PRNGKey(0), cost, False, "auto")
        ms = timeit(lambda cc, rv=rv: reg.apply(rv, cc, False, "auto"),
                    cost)
        print(f"level {h}x{w} D{D} regnet: {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

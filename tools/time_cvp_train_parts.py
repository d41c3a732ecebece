"""CVP train-step component profile (TPU) — where do the 549 ms go?

VERDICT r4 item 3: the bf16+packed CVP train step (512x640 N3 B1,
tools/time_train.py) measures 549.1 ms against a <400 ms target.  The
warp has a kernel VJP and the regularizer is packed, so this tool times
each remaining train-mode component fwd+bwd in isolation (value_and_grad
of a sum, chain-scan timing):

  * FeaturePyramidNet fwd+bwd at both pyramid levels (3 views each)
  * coarse path: warp+variance (256x320 D48 C16) fwd+bwd, regnet D48
  * refine path: warp+variance (512x640 D8 per-pixel slabs) fwd+bwd,
    regnet D8 at 512x640
  * the supervised loss + Adam update epsilon (full step minus fwd+bwd)

Run at bf16 (default) and f32 to explain the 1467 ms f32 row.
Parity context: reference CVP train net.py:96-229, trainer.py:96-198.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
    python tools/time_cvp_train_parts.py [bfloat16|float32]
"""
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

ITERS = 4
H, W, N = 512, 640, 3


def timeit_grad(loss_fn, params, *args):
    """ms per (fwd+bwd) of loss_fn(params, *args), chain-scan fenced."""
    import jax
    import jax.numpy as jnp

    g = jax.grad(lambda p, a0, *rest: loss_fn(p, a0, *rest))

    @jax.jit
    def chain(p, a0, *rest):
        def body(carry, eps):
            grads = g(p, a0 + eps, *rest)
            leaf = jax.tree_util.tree_leaves(grads)[0]
            return carry + jnp.sum(leaf).astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.zeros(()),
                              jnp.arange(ITERS, dtype=a0.dtype) * 1e-6)
        return tot

    float(chain(params, *args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(params, *args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


def timeit_fwd(fn, *args):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(a0, *rest):
        def body(carry, eps):
            out = fn(a0 + eps, *rest)
            return carry + jnp.sum(out).astype(jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.zeros(()),
                              jnp.arange(ITERS, dtype=a0.dtype) * 1e-6)
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
    from wildmvs.models.cvp_mvsnet import CVPCostRegNet, FeaturePyramidNet
    from wildmvs.geometry.projective import build_proj_matrices
    from bench import scene

    dt_name = sys.argv[1] if len(sys.argv) > 1 else "bfloat16"
    dtype = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    _, K, R, t, dmin, dmax = scene(1, N, H, W, 720.0)

    # ---- extractor fwd+bwd per level ----
    fp = FeaturePyramidNet(dtype=dtype)
    for lh, lw, tag in ((H, W, "level0"), (H // 2, W // 2, "level1")):
        x = jnp.asarray(rng.standard_normal((N, lh, lw, 3)), dtype)
        v = fp.init(jax.random.PRNGKey(0), x[:1])
        ms_f = timeit_fwd(lambda xx, vv=v: fp.apply(vv, xx), x)
        ms = timeit_grad(
            lambda p, xx: jnp.sum(fp.apply({"params": p}, xx)
                                  .astype(jnp.float32) ** 2),
            v["params"], x)
        print(f"extractor {tag} {N}x{lh}x{lw}: fwd {ms_f:.1f} ms, "
              f"fwd+bwd {ms:.1f} ms", flush=True)

    # ---- warp + variance fwd+bwd (kernel fwd, gather VJP at bf16) ----
    from wildmvs.ops.mosaic_sweep import (mosaic_px_supported,
                                          plane_sweep_warp_mosaic)
    from wildmvs.ops.plane_sweep import plane_sweep_warp
    from wildmvs.ops.volumes import variance_cost_volume

    proj = build_proj_matrices(K, R, t)                 # [B, N, 4, 4]
    for fh, fw, D, per_px, tag in ((H // 2, W // 2, 48, False, "coarse"),
                                   (H, W, 8, True, "refine")):
        feats = [jnp.asarray(rng.standard_normal((1, fh, fw, 16)), dtype)
                 for _ in range(N)]
        if per_px:
            base = 650.0 + 5.0 * rng.standard_normal((1, fh, fw))
            offs = np.arange(-4, 4).reshape(1, 8, 1, 1)
            hyp = jnp.asarray(base[:, None] + offs * 2.0, dtype)
        else:
            steps = np.linspace(425.0, 935.0, D)
            hyp = jnp.asarray(np.tile(steps[None], (1, 1)), dtype)
        pj = jax.image.resize(proj, proj.shape, "nearest")  # copy
        kernel_ok = mosaic_px_supported((fh, fw), dtype)
        warp = plane_sweep_warp_mosaic if kernel_ok else plane_sweep_warp

        def cost_of(feats0, feats_rest, hyp):
            warp_fns = [
                (lambda i=i: warp(feats_rest[i], pj[:, i + 1], pj[:, 0],
                                  hyp, (fh, fw)))
                for i in range(N - 1)]
            return variance_cost_volume(feats0, warp_fns=warp_fns,
                                        num_depth=hyp.shape[1])

        ms_f = timeit_fwd(
            lambda f0: cost_of(f0, feats[1:], hyp), feats[0])
        ms = timeit_grad(
            lambda f0, x: jnp.sum(
                cost_of(x, [f0[i] for i in range(N - 1)], hyp)
                .astype(jnp.float32) ** 2),
            jnp.stack(feats[1:]), feats[0])
        print(f"warp+var {tag} {fh}x{fw} D{hyp.shape[1]} "
              f"(kernel={kernel_ok}): fwd {ms_f:.1f} ms, "
              f"fwd+bwd {ms:.1f} ms", flush=True)

    # ---- regnet fwd+bwd (train mode, packed_training) ----
    for fh, fw, D, tag in ((H // 2, W // 2, 48, "coarse"),
                           (H, W, 8, "refine")):
        vol = jnp.asarray(rng.standard_normal((1, D, fh, fw, 16)), dtype)
        for packing in (True, False):
            reg = CVPCostRegNet(dtype=dtype, train_packing=packing)
            v = reg.init(jax.random.PRNGKey(1), vol, train=True)

            def loss(p, x, v=v, reg=reg):
                out, _ = reg.apply(
                    {"params": p, "batch_stats": v["batch_stats"]}, x,
                    train=True, mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32) ** 2)

            ms = timeit_grad(loss, v["params"], vol)
            print(f"regnet {tag} D{D} {fh}x{fw} "
                  f"(packed={packing}): fwd+bwd {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

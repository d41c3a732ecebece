"""Time the MVSNet stages separately on the live backend (post-Mosaic).

After the Mosaic warp kernel the 24 ms headline forward is no longer
warp-dominated by construction (2 x 6.7 ms kernel); this probe times the
CostRegNet (+ the softargmin tail) and the FeatureNet alone to localize the
remainder, feeding the decision whether a block-depth-packed conv path
(nn/blocks.py depth packing generalized to D=192 via per-block halos) is
worth building.

Usage: timeout 1500 python tools/time_regnet.py
"""
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


def chain(body, shape, dtype):
    import jax
    import jax.numpy as jnp

    def run(x):
        def step(carry, eps):
            return carry + body(x + eps), None
        tot, _ = jax.lax.scan(
            step, jnp.zeros((), jnp.float32),
            jnp.arange(ITERS, dtype=dtype) * 1e-6)
        return tot
    return run


def main():
    import jax
    import jax.numpy as jnp
    from wildmvs.models.mvsnet import CostRegNet, FeatureNet
    from wildmvs.ops.volumes import depth_regression

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    b, d, h, w, c = 1, 192, 128, 160, 32
    rng = np.random.default_rng(0)
    vol = jnp.array(rng.standard_normal((b, d, h, w, c)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    depths = jnp.linspace(425.0, 935.0, d)[None].astype(jnp.bfloat16)

    reg = CostRegNet(dtype=jnp.bfloat16)
    rv = reg.init(jax.random.PRNGKey(0), vol, train=False)

    def reg_body(v):
        cost = reg.apply(rv, v, train=False)[..., 0]
        prob = jax.nn.softmax(-cost.astype(jnp.float32), axis=1)
        return depth_regression(prob, depths).sum().astype(jnp.float32)

    t = timed(chain(reg_body, vol.shape, vol.dtype), vol)
    print(f"regnet+argmin [1,192,128,160,32] bf16: {t*1e3:7.2f} ms")

    for p in (16, 8):
        db = d // p
        volp = jnp.transpose(vol.reshape(b, db, p, h, w, c),
                             (0, 1, 3, 4, 2, 5)).reshape(b, db, h, w, p * c)

        def reg_packed_body(v, p=p):
            out = reg.apply(rv, v, train=False, packed_block=p)
            cost = jnp.transpose(out, (0, 1, 4, 2, 3)).reshape(b, d, h, w)
            prob = jax.nn.softmax(-cost.astype(jnp.float32), axis=1)
            return depth_regression(prob, depths).sum().astype(jnp.float32)

        t = timed(chain(reg_packed_body, volp.shape, volp.dtype), volp)
        print(f"regnet+argmin packed_block={p} bf16:    {t*1e3:7.2f} ms")

    imgs = jnp.array(rng.random((3, 512, 640, 3)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    fnet = FeatureNet(dtype=jnp.bfloat16)
    fv = fnet.init(jax.random.PRNGKey(0), imgs, train=False)

    def feat_body(x):
        return fnet.apply(fv, x, train=False).sum().astype(jnp.float32)

    t = timed(chain(feat_body, imgs.shape, imgs.dtype), imgs)
    print(f"featurenet 3x512x640 bf16:             {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()

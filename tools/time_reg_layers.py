"""Per-layer timing of the MVSNet CostRegNet on the live backend.

The packed_block experiment tied with the unpacked stack at ~11 ms
(tools/time_regnet.py), so neither lane padding nor matmul dims alone
explain the cost — this probe times each layer family standalone to find
the binding constraint.
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


def chain(body, dtype):
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
    from wildmvs.nn.blocks import ConvBnReLU, ConvTransposeBnReLU

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    rng = np.random.default_rng(0)

    def t_layer(name, mod, shape, **kw):
        x = jnp.array(rng.standard_normal(shape).astype(np.float32)
                      ).astype(jnp.bfloat16)
        v = mod.init(jax.random.PRNGKey(0), x, train=False, **kw)

        def body(xx):
            return mod.apply(v, xx, train=False,
                             **kw).sum().astype(jnp.float32)

        t = timed(chain(body, x.dtype), x)
        print(f"{name:44s} {t*1e3:7.2f} ms")

    bf = jnp.bfloat16
    # full-res layers, unpacked 3D (conv3d-via-2d decomposition)
    t_layer("conv0 32->8 D192 unpacked",
            ConvBnReLU(8, dtype=bf), (1, 192, 128, 160, 32))
    t_layer("conv11T 16->8 D96->192 unpacked",
            ConvTransposeBnReLU(8, dtype=bf), (1, 96, 64, 80, 16))
    # the same two packed_block=16
    t_layer("conv0 packed p16 (512->128ch)",
            ConvBnReLU(8, dtype=bf), (1, 12, 128, 160, 512),
            packed_block=16)
    t_layer("conv11T packed p8->16",
            ConvTransposeBnReLU(8, dtype=bf), (1, 12, 64, 80, 128),
            packed_block=8)
    # mid layers
    t_layer("conv1 8->16 s2 D192 unpacked",
            ConvBnReLU(16, strides=2, dtype=bf), (1, 192, 128, 160, 8))
    t_layer("conv1 packed p16 (128->128ch s2)",
            ConvBnReLU(16, strides=2, dtype=bf), (1, 12, 128, 160, 128),
            packed_block=16)


if __name__ == "__main__":
    main()

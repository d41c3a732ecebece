"""Calibrate v5e conv2d vs matmul throughput on the live backend.

The regnet layer probe (tools/time_reg_layers.py) shows every conv family
at a few percent of bf16 peak; this measures (a) a large dense matmul,
(b) a well-shaped 128->128ch 3x3 conv2d at three batch/spatial sizes, and
(c) the same conv expressed as an explicit im2col matmul — separating
"the chip/tunnel is slow" from "XLA's TPU conv lowering is slow at small
batch" from "our shapes are bad".
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

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    rng = np.random.default_rng(0)
    a = jnp.array(rng.standard_normal((4096, 4096)).astype(np.float32)
                  ).astype(jnp.bfloat16)
    bm = jnp.array(rng.standard_normal((4096, 4096)).astype(np.float32)
                   ).astype(jnp.bfloat16)

    def mm(x):
        return (x @ bm).sum().astype(jnp.float32)

    t = timed(chain(mm, a.dtype), a)
    fl = 2 * 4096 ** 3
    print(f"matmul 4096^3 bf16: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TF/s")

    for (n, h, w, c) in [(12, 128, 160, 128), (1, 128, 160, 128),
                         (192, 32, 40, 128)]:
        x = jnp.array(rng.standard_normal((n, h, w, c)).astype(np.float32)
                      ).astype(jnp.bfloat16)
        k = jnp.array(rng.standard_normal((3, 3, c, 128)).astype(np.float32)
                      ).astype(jnp.bfloat16)
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))

        def cv(xx, k=k, dn=dn):
            y = jax.lax.conv_general_dilated(
                xx, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
            return y.sum().astype(jnp.float32)

        t = timed(chain(cv, x.dtype), x)
        fl = 2 * n * h * w * 9 * c * 128
        print(f"conv3x3 {str((n,h,w,c)):22s}: {t*1e3:7.2f} ms "
              f"{fl/t/1e12:6.1f} TF/s")

    # im2col matmul form of the (12,128,160,128) conv
    x = jnp.array(rng.standard_normal((12, 128, 160, 128)).astype(np.float32)
                  ).astype(jnp.bfloat16)
    k2 = jnp.array(rng.standard_normal((9 * 128, 128)).astype(np.float32)
                   ).astype(jnp.bfloat16)

    def im2col(xx):
        xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, dy:dy + 128, dx:dx + 160]
                for dy in range(3) for dx in range(3)]
        patches = jnp.concatenate(cols, -1).reshape(-1, 9 * 128)
        return (patches @ k2).sum().astype(jnp.float32)

    t = timed(chain(im2col, x.dtype), x)
    fl = 2 * 12 * 128 * 160 * 9 * 128 * 128
    print(f"im2col matmul (12,128,160,128): {t*1e3:7.2f} ms "
          f"{fl/t/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()

"""Micro-bench: masked median via jnp.sort vs int-bitspace binary search.

cal_depth_hypo (wildmvs/models/cvp_mvsnet.py) needs the k-th smallest
|delta_d| over valid pixels (k = (nvalid-1)//2, the reference's
torch.median semantics, modules.py:216). On TPU, XLA lowers jnp.sort to a
bitonic network — O(n log^2 n) passes over HBM. A 31-step binary search
over the int32 bit pattern of the (non-negative) floats finds the exact
same element with 31 cheap compare+count reductions.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 900 python tools/time_median.py
"""
import time

import numpy as np

ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def median_sort(flat, valid):
        order = jnp.sort(jnp.where(valid, flat, jnp.inf))
        nvalid = jnp.sum(valid)
        k = jnp.clip((nvalid - 1) // 2, 0, flat.size - 1)
        return order[k]

    def median_bisect(flat, valid):
        bits = jnp.where(valid, flat.view(jnp.int32), jnp.int32(2**31 - 1))
        nvalid = jnp.sum(valid)
        k = (nvalid - 1) // 2  # 0-indexed rank of the lower middle

        def body(_, state):
            lo, hi = state  # invariant: answer in (lo, hi]
            # (hi - lo) can be 2^31 — compute the midpoint offset in uint32
            half = ((hi.astype(jnp.uint32) - lo.astype(jnp.uint32)) // 2)
            mid = lo + half.astype(jnp.int32)
            cnt = jnp.sum((bits <= mid).astype(jnp.int32))
            go_low = cnt >= k + 1  # answer <= mid
            return (jnp.where(go_low, lo, mid), jnp.where(go_low, mid, hi))

        lo = jnp.int32(-1)
        hi = jnp.int32(2**31 - 1)
        lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
        return hi.view(jnp.float32)

    for hw in [(64, 80), (128, 160), (256, 320), (512, 640)]:
        n = hw[0] * hw[1]
        flat = jnp.array(np.abs(rng.standard_normal(n)).astype(np.float32))
        valid = jnp.array(rng.random(n) > 0.1)

        # correctness first (CPU-visible check)
        a = float(jax.jit(median_sort)(flat, valid))
        b = float(jax.jit(median_bisect)(flat, valid))
        assert a == b, (hw, a, b)

        for name, fn in [("sort", median_sort), ("bisect", median_bisect)]:
            @jax.jit
            def chain(flat, valid, fn=fn):
                def body(carry, eps):
                    return carry + fn(flat + eps, valid), None
                tot, _ = jax.lax.scan(
                    body, jnp.zeros(()),
                    jnp.arange(ITERS, dtype=jnp.float32) * 1e-9)
                return tot

            float(chain(flat, valid))
            t0 = time.perf_counter()
            float(chain(flat, valid))
            dt = (time.perf_counter() - t0) / ITERS
            print(f"{hw[0]}x{hw[1]} {name:6s}: {dt*1e3:8.3f} ms")


if __name__ == "__main__":
    main()

"""Masked order statistics without sorting.

XLA lowers jnp.sort on TPU to a bitonic network — O(n log^2 n) full passes
over the array. For a single order statistic (CVP-MVSNet's eval-time median
of per-pixel epipolar intervals, reference modules.py:216) a binary search
over the int32 bit pattern of the (non-negative) floats finds the exact
same element in 32 cheap compare+count reductions: 141.7 ms -> 11.0 ms for
a 512x640 masked median on CPU, and far more on TPU where sort is
scalar-unit bound (see tools/time_median.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_SENTINEL = jnp.int32(2**31 - 1)


def masked_kth_smallest(values: jnp.ndarray, valid: jnp.ndarray,
                        k: jnp.ndarray) -> jnp.ndarray:
    """Exact k-th smallest (0-indexed) of ``values[valid]``.

    ``values`` must be non-negative float32 (bit pattern then orders like
    the value, which is what makes the integer bisection exact). ``k`` is a
    traced scalar; the caller is responsible for the ``nvalid == 0`` case
    (the return value is unspecified there — guard it with jnp.where).
    """
    flat = values.reshape(-1).astype(jnp.float32)
    # NaNs are mapped to the invalid sentinel explicitly: the sentinel
    # 0x7FFFFFFF is itself a NaN bit pattern, so without this a NaN payload
    # could collide with it (and any NaN would otherwise land at an
    # arbitrary rank among the large values)
    ok = valid.reshape(-1) & ~jnp.isnan(flat)
    bits = jnp.where(ok, flat.view(jnp.int32), _SENTINEL)
    k = k.astype(jnp.int32)

    def body(_, state):
        lo, hi = state  # invariant: answer in (lo, hi]
        # (hi - lo) can be 2^31 — compute the midpoint offset in uint32
        half = (hi.astype(jnp.uint32) - lo.astype(jnp.uint32)) // 2
        mid = lo + half.astype(jnp.int32)
        cnt = jnp.sum((bits <= mid).astype(jnp.int32))
        go_low = cnt >= k + 1  # answer <= mid
        return (jnp.where(go_low, lo, mid), jnp.where(go_low, mid, hi))

    lo = jnp.int32(-1)
    hi = _SENTINEL
    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return hi.view(jnp.float32)


def masked_median(values: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Lower-middle median of ``values[valid]`` (torch.median semantics:
    element at rank (nvalid-1)//2 — reference modules.py:216). Non-negative
    float32 inputs; unspecified when nothing is valid (guard at call site).
    """
    ok = valid.reshape(-1) & ~jnp.isnan(values.reshape(-1))
    nvalid = jnp.sum(ok.astype(jnp.int32))
    return masked_kth_smallest(values, valid, (nvalid - 1) // 2)

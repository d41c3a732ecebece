"""Probe: which dynamic-select primitives does Mosaic actually lower?

Round-1 conclusion (BASELINE.md warp-study round 3) was that the octet
combine dies for lack of a "per-sublane dynamic lane-select". Its transpose
— a per-LANE dynamic SUBLANE-select — is exactly what Mosaic's
DynamicGatherOp implements, reachable from Pallas via jnp.take_along_axis
along a non-minor axis. This probe checks, on the real TPU:

  1. take_along_axis over sublanes, [S, 128] window, idx [Q, 128], for a
     range of S (8..1024) and dtypes (f32, bf16, i32)
  2. the same over a flattened (row, x) window (the full plane-sweep case)
  3. pltpu.roll with a traced (dynamic) shift
  4. rough timing of the winning form at warp-like sizes

Usage: timeout 900 python tools/probe_mosaic.py
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def try_case(name, fn):
    try:
        out = fn()
        out = np.asarray(out)
        print(f"OK   {name}: out shape {out.shape}, sum {out.sum():.3f}",
              flush=True)
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return False


def gather_kernel(win_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(win_ref[:], idx_ref[:], axis=0)


def probe_take_along_sublanes(S, Q, L, dtype):
    win = jnp.arange(S * L, dtype=dtype).reshape(S, L)
    idx = jnp.tile(jnp.arange(Q, dtype=jnp.int32)[:, None] % S, (1, L))

    def run():
        return pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((Q, L), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(win, idx)

    got = try_case(f"take_along_axis sublane S={S} Q={Q} L={L} {dtype.__name__}", run)
    if got:
        # numeric check vs XLA
        ref = jnp.take_along_axis(win, idx, axis=0)
        out = pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((Q, L), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(win, idx)
        if not np.allclose(np.asarray(ref), np.asarray(out)):
            print(f"  !! MISMATCH at S={S}", flush=True)
    return got


def probe_lane_gather(L, dtype):
    """take_along_axis along the LANE (minor) dim — probably unsupported."""
    win = jnp.arange(8 * L, dtype=dtype).reshape(8, L)
    idx = jnp.tile((jnp.arange(L, dtype=jnp.int32) * 7) % L, (8, 1))

    def kern(w_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(w_ref[:], i_ref[:], axis=1)

    return try_case(f"take_along_axis lane L={L} {dtype.__name__}", lambda: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, L), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(win, idx))


def probe_dynamic_roll():
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)

    def kern(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis=1)

    return try_case("pltpu.roll dynamic shift", lambda: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, jnp.array([3], jnp.int32)))


def probe_3d_gather(S, Q, L, dtype):
    """take_along_axis on a 3D block over axis=1 (sublane of each major)."""
    win = jnp.arange(2 * S * L, dtype=dtype).reshape(2, S, L)
    idx = jnp.tile((jnp.arange(Q, dtype=jnp.int32) % S)[None, :, None],
                   (2, 1, L))

    def kern(w_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(w_ref[:], i_ref[:], axis=1)

    return try_case(f"take_along_axis 3D axis=1 S={S} {dtype.__name__}", lambda: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2, Q, L), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(win, idx))


def main():
    print(f"jax {jax.__version__}, backend {jax.default_backend()}",
          flush=True)
    for dtype in (jnp.float32, jnp.bfloat16):
        for S in (8, 16, 32, 64, 168, 512, 1024):
            probe_take_along_sublanes(S, 32, 128, dtype)
    probe_take_along_sublanes(1024, 128, 128, jnp.float32)
    probe_take_along_sublanes(704, 128, 128, jnp.bfloat16)
    probe_lane_gather(128, jnp.float32)
    probe_dynamic_roll()
    probe_3d_gather(32, 32, 128, jnp.float32)


if __name__ == "__main__":
    main()

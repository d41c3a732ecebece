"""Probe round 2: constraints of Mosaic's per-lane dynamic gather.

probe_mosaic.py established: take_along_axis along LANES (axis=-1) lowers
(DynamicGatherOp); dynamic-shift pltpu.roll lowers; sublane-axis gather does
not. This round maps the boundaries that the warp kernel design needs:

  1. bf16 (and int32) lane gather
  2. window wider than 128 lanes (cross-tile indices)
  3. idx lane extent != window lane extent (out follows idx?)
  4. larger sublane extents (128 sublanes = the 4C corner table)
  5. dynamic major-dim indexing of a 3D VMEM ref (row window select)
  6. dynamic-shift roll on multi-tile lane extents
  7. timing: gather throughput at warp-like shapes

Usage: timeout 900 python tools/probe_mosaic2.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def try_case(name, fn, check=None):
    try:
        out = np.asarray(fn())
        ok = True
        if check is not None:
            ok = np.allclose(out, np.asarray(check))
        print(f"{'OK  ' if ok else 'MISMATCH'} {name}: shape {out.shape}",
              flush=True)
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return False


def lane_gather(S, Lw, Li, dtype, idx_max=None):
    """win [S, Lw], idx [S, Li] -> out [S, Li]; idx values in [0, idx_max)."""
    if idx_max is None:
        idx_max = Lw
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.standard_normal((S, Lw)), dtype)
    idx = jnp.asarray(rng.integers(0, idx_max, (S, Li)), jnp.int32)

    def kern(w_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(w_ref[:], i_ref[:], axis=1)

    ref = jnp.take_along_axis(win, idx, axis=1)
    name = f"lane gather S={S} Lw={Lw} Li={Li} max={idx_max} {np.dtype(dtype).name}"
    return try_case(name, lambda: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, Li), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(win, idx), check=ref)


def dyn_major_index():
    """3D VMEM ref indexed by a traced major-dim scalar."""
    x = jnp.arange(6 * 8 * 128, dtype=jnp.float32).reshape(6, 8, 128)

    def kern(x_ref, s_ref, o_ref):
        r = s_ref[0]
        o_ref[:] = x_ref[r] + x_ref[r + 1]

    ref = x[3] + x[4]
    return try_case("dynamic major index 3D ref", lambda: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, jnp.array([3], jnp.int32)), check=ref)


def dyn_roll(S, L, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((S, L)), dtype)

    def kern(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis=1)

    ref = jnp.roll(x, -37, axis=1)  # pltpu.roll(shift) == jnp.roll(-shift)?
    def run():
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, L), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, jnp.array([37], jnp.int32))
    try:
        out = np.asarray(run())
        fwd = np.allclose(out, np.asarray(jnp.roll(x, 37, axis=1)))
        bwd = np.allclose(out, np.asarray(ref))
        print(f"OK   dyn roll S={S} L={L} {np.dtype(dtype).name}: "
              f"matches jnp.roll(+37)={fwd} jnp.roll(-37)={bwd}", flush=True)
    except Exception as e:
        print(f"FAIL dyn roll S={S} L={L}: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}", flush=True)


def time_gather_kernel():
    """Throughput: full warp-scale gather loop inside one kernel.

    Simulates the inner work of the sweep kernel at headline scale for one
    source view: D*H = 24576 grid steps; per step one [128, 160]-out lane
    gather from a [128, 256] window + bilinear-ish FMA.
    """
    D, H, W, C4 = 192, 128, 160, 128
    Ww = 256
    rng = np.random.default_rng(0)
    win = jnp.asarray(rng.standard_normal((C4, Ww)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, Ww, (D * H, C4, W)), jnp.int32)  # big
    # NOTE: idx is ~1.5 GB int32 — stream it per grid step.

    def kern(w_ref, i_ref, o_ref):
        g = jnp.take_along_axis(w_ref[:], i_ref[0], axis=1)
        o_ref[0] = g * jnp.bfloat16(0.5)

    grid_spec = pl.GridSpec(
        grid=(D * H,),
        in_specs=[
            pl.BlockSpec((C4, Ww), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C4, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C4, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(win, idx):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((D * H, C4, W), jnp.bfloat16),
        )(win, idx)

    try:
        out = run(win, idx)
        float(out[0, 0, 0].astype(jnp.float32))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(win, idx)[0, 0, 0].astype(jnp.float32))
            best = min(best, time.perf_counter() - t0)
        n_idx = D * H * C4 * W
        print(f"TIME full-scale gather kernel: {best*1e3:.2f} ms "
              f"({n_idx/1e6:.0f}M gathered elements, "
              f"{best/n_idx*1e9:.3f} ns/elem)", flush=True)
    except Exception as e:
        print(f"FAIL timing kernel: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:180]}", flush=True)


def main():
    print(f"jax {jax.__version__}, backend {jax.default_backend()}",
          flush=True)
    # dtypes at basic shape
    for dt in (jnp.float32, jnp.bfloat16, jnp.int32):
        lane_gather(8, 128, 128, dt)
    # idx extent != window extent
    lane_gather(8, 256, 128, jnp.float32)           # wide window, narrow out
    lane_gather(8, 128, 256, jnp.float32, idx_max=128)  # narrow win, wide out
    # cross-tile index values
    lane_gather(8, 256, 256, jnp.float32)           # idx in [0, 256)
    lane_gather(8, 384, 384, jnp.bfloat16)
    lane_gather(8, 1024, 1024, jnp.float32)
    # non-multiple-of-128 lanes
    lane_gather(8, 168, 168, jnp.float32)
    # taller sublane extents (the 4C corner table is 128 sublanes)
    lane_gather(32, 128, 128, jnp.bfloat16)
    lane_gather(128, 128, 128, jnp.bfloat16)
    lane_gather(128, 256, 256, jnp.bfloat16)
    dyn_major_index()
    dyn_roll(8, 128, jnp.float32)
    dyn_roll(128, 256, jnp.bfloat16)
    dyn_roll(128, 168, jnp.bfloat16)
    time_gather_kernel()


if __name__ == "__main__":
    main()

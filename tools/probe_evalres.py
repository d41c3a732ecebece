"""Standalone repro/timing for the full-res DTU eval configs.

Usage: python tools/probe_evalres.py [mvsnet|vis|cvp] [iters]

Runs ONE config (bench.py's eval-protocol geometry: 1184x1600 N5
scene_dtu) so the tpu_compile_helper failure that bench.py truncates to
200 chars can be read in full.
"""
import sys
import time

import numpy as np


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "mvsnet"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    sys.path.insert(0, "/root/repo")
    from wildmvs.models import build_model
    from bench import scene_dtu, time_model

    import os
    method = os.environ.get("WILDMVS_BENCH_METHOD", "auto")
    args = scene_dtu(1, 5, 1184, 1600, 2892.0)
    kwargs = {}
    if arch == "mvsnet":
        model = build_model("mvsnet", num_depth=192, dtype=jnp.bfloat16,
                            sweep_method=method)
    elif arch == "vis":
        model = build_model("vis_mvsnet", depth_nums=(64, 32, 16),
                            interval_scales=(2.0, 1.0, 0.5),
                            dtype=jnp.bfloat16)
    else:
        model = build_model("cvp_mvsnet", dtype=jnp.bfloat16)
        kwargs = {"nscale": 5}
    dt = time_model(model, args, kwargs, iters=iters)
    print(f"{arch}_eval_1184x1600_N5: {dt*1e3:.1f} ms  {1.0/dt:.3f} maps/s",
          flush=True)


if __name__ == "__main__":
    main()

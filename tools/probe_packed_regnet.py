"""A/B the eval-time BLOCK-depth-packed CostRegNet against the unpacked
3D UNet at the headline config (512x640 D192 N3 bf16).

Context: the packed path landed in the round-2 end-of-round snapshot
(35ed510) AFTER the 41.16 maps/s headline record, without TPU
re-validation; the round-3 re-measurement read ~39.0. This isolates
whether the packed regnet (and its cost-volume transpose in/out) is the
regression, or something else moved.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import sys
    sys.path.insert(0, "/root/repo")
    from wildmvs.models import build_model
    from bench import scene, time_model

    args = scene(1, 3, 512, 640, 720.0)
    for packed in (True, False):
        model = build_model("mvsnet", num_depth=192, dtype=jnp.bfloat16,
                            packed_regnet=packed)
        dt = time_model(model, args, {}, iters=10)
        print(f"packed_regnet={packed}: {dt*1e3:.2f} ms  "
              f"{1.0/dt:.2f} maps/s", flush=True)


if __name__ == "__main__":
    main()

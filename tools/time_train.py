"""Training-step throughput on the live backend.

Times one jitted supervised train step (forward + backward + Adam) for
MVSNet at the DTU training configuration (512x640, D=192, N=3, B=1,
train.py defaults) with the chain-scan method.  The backward of the
plane-sweep warp is a scatter-add over the gathered indices — this tool
exists to see whether that VJP is a cliff on TPU.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
    python tools/time_train.py [arch] [dtype] \
        [flags: batched_bn remat remat_levels packed_training]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ITERS = 4


def main():
    import jax
    import jax.numpy as jnp
    from wildmvs.data.synthetic import SyntheticMVSDataset, collate
    from wildmvs.train.config import TrainConfig
    from wildmvs.train.trainer import create_train_state, train_step

    arch = sys.argv[1] if len(sys.argv) > 1 else "mvsnet"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    flags = set(sys.argv[3:])
    config = TrainConfig(architecture=arch, dataset="synthetic",
                         supervised=True, batch_size=1, num_im_train=3,
                         train_dtype=dtype,
                         batched_bn="batched_bn" in flags,
                         remat="remat" in flags,
                         remat_levels="remat_levels" in flags,
                         packed_training="packed_training" in flags)
    ds = SyntheticMVSDataset(num_samples=2, num_views=3, height=512,
                             width=640, seed=0)
    batch = collate([ds[0]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if isinstance(v, np.ndarray)}

    state = create_train_state(config, jax.random.PRNGKey(0), batch)

    # warm/compile
    state, metrics = train_step(state, batch, config)
    float(metrics["train_loss"])

    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        s = state
        for _ in range(ITERS):
            s, metrics = train_step(s, batch, config)
        float(metrics["train_loss"])
        best = min(best, time.perf_counter() - t0)
    # per-dispatch RTT (~33 ms x ITERS) is included; report both
    tag = " ".join(sorted(flags)) or "defaults"
    print(f"{arch} [{dtype}] [{tag}] train step (512x640 D192 N3 B1): "
          f"{best / ITERS * 1e3:.1f} ms/step incl. ~33 ms dispatch RTT")


if __name__ == "__main__":
    main()

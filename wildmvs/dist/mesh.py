"""Device mesh + sharding layer — the TPU-native replacement for the
reference's gloo/DDP distributed story (SURVEY §2 parallelism inventory).

Axes:
  data — batch data parallelism (replaces DistributedSampler + DDP grad
         all-reduce, train.py:112-136). Gradients psum over ICI automatically
         via SPMD partitioning of the jitted train step.
  view — view parallelism for the occ_masking mode (replaces the
         one-rank-per-reference-view scheme, train.py:311-312 +
         models/trainer.py:240-278). The batch is replicated over `view`;
         each shard computes a subset of reference views; depthmaps exchange
         via all_gather over ICI instead of gloo.
  hyp  — depth-hypothesis sharding for large cost volumes (the analogue of
         sequence parallelism; aggregations are associative so slabs are
         independent until the softmax over depth).

Multi-host: call `initialize()` once per process; the same code then runs on
a pod slice (jax.distributed handles the DCN rendezvous, replacing the
hardcoded localhost MASTER_ADDR of train.py:53-54).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: Optional[str] = None, num_processes: int = 1,
               process_id: int = 0):
    """Multi-host init (no-op single-host). Replaces gloo init
    (train.py:52-62)."""
    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(data: int = 0, view: int = 1, hyp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, view, hyp) mesh. data=0 -> use all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == 0:
        assert n % (view * hyp) == 0, (n, view, hyp)
        data = n // (view * hyp)
    assert data * view * hyp == n, (data, view, hyp, n)
    arr = np.asarray(devices).reshape(data, view, hyp)
    return Mesh(arr, axis_names=("data", "view", "hyp"))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch with its leading (batch) dim split over `data`."""
    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters / optimizer state) on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)

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
               process_id: int = 0, timeout_s: Optional[int] = None):
    """Multi-host init (no-op single-host). Replaces gloo init
    (train.py:52-62). timeout_s raises the rendezvous registration
    deadline for hosts where worker startup is slow (oversubscribed CPU
    test rigs)."""
    if num_processes > 1:
        kw = ({} if timeout_s is None
              else {"initialization_timeout": timeout_s})
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id, **kw)


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


def process_local_order(order, global_batch_size: int,
                        num_processes: Optional[int] = None,
                        process_id: Optional[int] = None):
    """Per-host slice of the epoch's shared permutation.

    Every host derives the same permutation (same seed), so each global
    batch is a row of order.reshape(-1, B); host p loads columns
    [p*B/P, (p+1)*B/P) of every row — its local shard of each global batch.
    Tail samples are wrap-padded so all hosts hold equal counts (parity:
    DistributedSampler's pad-to-even behavior behind train.py:112-116).

    Returns (local_order, local_batch_size). Identity when P == 1.
    """
    procs = jax.process_count() if num_processes is None else num_processes
    pid = jax.process_index() if process_id is None else process_id
    order = np.asarray(order)
    if procs == 1:
        return order, global_batch_size
    B = global_batch_size
    assert B % procs == 0, (B, procs)
    if len(order) % B:
        pad = B - len(order) % B
        order = np.concatenate([order, order[:pad]])
    per = B // procs
    rows = order.reshape(-1, B)[:, pid * per:(pid + 1) * per]
    return rows.reshape(-1), per


def shard_batch(batch: dict, mesh: Mesh, from_local: Optional[bool] = None
                ) -> dict:
    """Place a host batch with its leading (batch) dim split over `data`.

    Multi-host (or from_local=True): the input leaves are each process's
    LOCAL shard of the global batch (rows process_local_order assigned to
    it) and are assembled into global arrays across hosts.
    """
    sharding = NamedSharding(mesh, P("data"))
    if from_local is None:
        from_local = jax.process_count() > 1
    if from_local:
        return {k: jax.make_array_from_process_local_data(
                    sharding, np.asarray(v)) for k, v in batch.items()}
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters / optimizer state) on the mesh.

    Multi-process: every process holds the identical host value (same-seed
    init), so assembly goes through make_array_from_process_local_data with
    a fully-replicated spec — device_put cannot target non-addressable
    devices."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda v: jax.make_array_from_process_local_data(
                sharding, np.asarray(v)), tree)
    return jax.device_put(tree, sharding)

"""View-parallel occ_masking training — shard_map over the `view` mesh axis.

Parity: the reference's novel distributed mode (SURVEY parallelism table):
with --occ_masking, world_size == num_im_train, every rank receives the
IDENTICAL batch (SharedRandomSampler broadcast), rank r computes the
depthmap with reference view r (models/trainer.py:101), ranks exchange
depthmaps via dist.all_gather (:246-247) to occlusion-mask their photometric
losses, and DDP averages gradients.

TPU-native redesign: one shard_map over mesh axes (data, view):
  * the batch is replicated across `view` (same-seed sampling replaces the
    gloo broadcast) and sharded across `data`
  * each view shard runs the forward for its reference view(s) — selected
    with lax.switch over static reference indices, since view selection is
    structural
  * depthmaps all_gather over `view` rides ICI instead of gloo
  * the loss is psum-averaged over `view`, and gradients are averaged over
    (data, view) by the surrounding jit's SPMD partitioning — exactly DDP's
    gradient all-reduce semantics.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8 moved shard_map out of experimental...
    from jax import shard_map
    _CHECK_KW = {"check_vma": False}
except ImportError:  # pragma: no cover
    # ...and renamed the replication-check kwarg (check_rep before)
    from jax.experimental.shard_map import shard_map
    _CHECK_KW = {"check_rep": False}

from ..losses.supervised import resize_bilinear
from ..train.config import TrainConfig
from ..train.trainer import TrainState, create_model, forward_args, loss_from_outputs


def make_view_parallel_train_step(mesh: Mesh, config: TrainConfig):
    """Build a jitted train step with the view axis sharded over the mesh.

    Requires config.occ_masking and num_im_train % mesh.shape['view'] == 0.
    The returned step takes (state, batch) with batch leaves sharded
    P('data') on axis 0 and state replicated.
    """
    assert config.occ_masking and not config.supervised
    n = config.num_im_train
    vshards = mesh.shape["view"]
    assert n % vshards == 0, (n, vshards)
    per_shard = n // vshards
    model = create_model(config)

    def shard_loss(params, batch_stats, batch):
        """Runs inside shard_map: one `view` shard's loss contribution."""
        vidx = jax.lax.axis_index("view")
        variables = {"params": params, "batch_stats": batch_stats}
        args = forward_args(batch, config)
        h, w = batch["imgs"].shape[2:4]
        lh, lw = h // config.output_down, w // config.output_down

        # one forward per owned reference view; the reference index is
        # structural (it selects views), so each possibility is a static
        # branch and the dynamic shard index picks via lax.switch.
        # Shard v owns reference views {v * per_shard + k : k}.
        def make_fwd(r):
            def fwd(variables, *args):
                out, mut = model.apply(variables, *args, reference_frame=r,
                                       train=True, mutable=["batch_stats"])
                return out, mut["batch_stats"]
            if config.remat:
                # honor --remat here too: this multi-forward mode is exactly
                # where cost-volume activations are heaviest
                fwd = jax.checkpoint(fwd)

            def branch(_):
                return fwd(variables, *args)
            return branch

        outs, stats0 = [], None
        for k in range(per_shard):
            out_k, stats_k = jax.lax.switch(
                vidx, [make_fwd(v * per_shard + k) for v in range(vshards)],
                None)
            outs.append(out_k)
            if k == 0:
                stats0 = stats_k
        # keep reference view 0's BN batch stats — the reference's DDP keeps
        # every rank's buffers updating and the checkpoint saves rank 0's
        # (train.py:136,202-210); the single-program step keeps r=0's the
        # same way. r=0 lives on view shard 0 (k=0), so psum-select it
        # across `view`; across `data` the stats are per-local-batch means,
        # pmean'd into the full-batch average (each shard normalized over
        # its own sub-batch, like per-replica BN).
        is_shard0 = (vidx == 0).astype(jnp.float32)
        new_stats = jax.tree.map(
            lambda s: jax.lax.pmean(
                jax.lax.psum(s * is_shard0.astype(s.dtype), "view"), "data"),
            jax.lax.stop_gradient(stats0))
        # exchange depthmaps across the view axis (ICI all_gather), one
        # gather PER SCALE — the reference all-gathers the current scale's
        # depth inside the per-scale loss loop (models/trainer.py:246-247);
        # tiled=True concatenates shard blocks along axis 1 -> [B, N, lh, lw]
        n_scales = len(outs[0]["depth_est_list"])
        all_depths = []
        for i in range(n_scales):
            my = jnp.stack([resize_bilinear(o["depth_est_list"][i], (lh, lw))
                            for o in outs], axis=1)
            g = jax.lax.all_gather(my, "view", axis=1, tiled=True)
            # others' depthmaps are detached — like gloo all_gather's
            # grad-less tensors; our own grad path is re-inserted by
            # loss_from_outputs
            all_depths.append(jax.lax.stop_gradient(g))

        total = jnp.zeros(())
        for k, out in enumerate(outs):
            def make_loss(r, out=out):
                def branch(_):
                    return loss_from_outputs(out, batch, config, r,
                                             all_depthmaps=all_depths)
                return branch
            total = total + jax.lax.switch(
                vidx, [make_loss(v * per_shard + k) for v in range(vshards)],
                None)
        # average over all N reference views AND over data shards — DDP
        # averages gradients across every rank, and the mean also makes the
        # returned loss genuinely replicated (each data shard's local-batch
        # mean alone is not)
        return jax.lax.pmean(total / per_shard, ("data", "view")), new_stats

    @functools.partial(jax.jit,
                       in_shardings=(NamedSharding(mesh, P()),
                                     NamedSharding(mesh, P("data"))),
                       out_shardings=(NamedSharding(mesh, P()),
                                      NamedSharding(mesh, P())))
    def step(state: TrainState, batch):
        def loss_fn(params):
            f = shard_map(
                functools.partial(shard_loss, params, state.batch_stats),
                mesh=mesh,
                in_specs=(P("data"),),
                out_specs=(P(), P()),
                **_CHECK_KW)
            return f(batch)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return new_state, {"train_loss": loss}

    return step

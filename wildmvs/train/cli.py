"""Training CLI — the epoch loop.

Parity: train.py:64-252 re-designed single-program: no mp.spawn / gloo; data
parallelism and the view-parallel occ_masking mode come from the mesh
(wildmvs/dist) instead of one process per GPU.

Usage:
  python -m wildmvs.train.cli --dataset synthetic --architecture mvsnet \
      --supervised --epochs 2 --debug
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..data.synthetic import SyntheticMVSDataset, collate
from ..utils.monitor import Logger, MeterSet, profiler_trace
from .checkpoint import (latest_checkpoint, load_metadata, restore_checkpoint,
                         save_checkpoint)
from .config import TrainConfig
from . import trainer as T


def build_datasets(config: TrainConfig):
    """Dataset construction. Parity: train.py:67-104."""
    if config.dataset == "synthetic":
        n = config.num_im_train
        train = SyntheticMVSDataset(num_samples=8, num_views=n, seed=1)
        val = SyntheticMVSDataset(num_samples=2, num_views=n, seed=2)
        test = SyntheticMVSDataset(num_samples=2, num_views=n, seed=3)
        return train, val, test
    from ..data import loaders
    return loaders.build_datasets(config)


def batches(dataset, batch_size, order, num_workers: int = 0):
    """Batch iterator; num_workers > 0 overlaps sample loading with the
    device step through the native prefetch pipeline (data/prefetch.py —
    the reference's DataLoader worker pool, train.py:118-122)."""
    from ..data.prefetch import iterate_batches
    for b in iterate_batches(dataset, order, batch_size, collate,
                             num_workers=num_workers):
        yield {k: jnp.array(v) for k, v in b.items() if k != "filename"}


def make_mesh_step(config: TrainConfig, world_size: int):
    """Multi-device train step. With occ_masking the `view` mesh axis carries
    reference views (parity: 1 rank = 1 ref view, train.py:311-312); otherwise
    the batch shards over `data` (parity: DistributedSampler + DDP).

    Multi-host: the mesh must span every process's devices, so world_size
    must equal jax.device_count(); each process feeds its local shard of the
    global batch (dist.mesh.process_local_order) and shard_batch assembles
    the global arrays across hosts."""
    from ..dist.mesh import make_mesh, replicate, shard_batch
    if jax.process_count() > 1:
        assert world_size == jax.device_count(), (
            "multi-host training requires --world_size == total device count "
            f"({jax.device_count()}), got {world_size}")
    devices = jax.devices()[:world_size]
    if config.occ_masking and not config.supervised:
        assert config.num_im_train % world_size == 0, (
            "occ_masking needs num_im_train % world_size == 0 "
            f"(got {config.num_im_train} vs {world_size}); parity train.py:311")
        mesh = make_mesh(data=1, view=world_size, devices=devices)
        from ..dist.view_parallel import make_view_parallel_train_step
        vstep = make_view_parallel_train_step(mesh, config)

        def step(state, batch):
            # the batch is REPLICATED over `view` (every host loads the
            # identical global batch — same-seed order replaces the
            # SharedRandomSampler broadcast); shard_batch still routes
            # through the multi-host assembly when process_count > 1
            return vstep(state, shard_batch(batch, mesh))
    else:
        assert config.batch_size % world_size == 0, (config.batch_size,
                                                     world_size)
        mesh = make_mesh(data=world_size, devices=devices)

        def step(state, batch):
            return T.train_step(state, shard_batch(batch, mesh), config)

    def place(state):
        return state.replace(step=replicate(state.step, mesh),
                             params=replicate(state.params, mesh),
                             batch_stats=replicate(state.batch_stats, mesh),
                             opt_state=replicate(state.opt_state, mesh))

    return step, place


def run(config: TrainConfig, max_epochs: int | None = None,
        world_size: int = 1, resume: bool = False,
        loadckpt: str | None = None) -> dict:
    assert not (resume and loadckpt), \
        "--resume and --loadckpt are exclusive (parity train.py:298-299)"
    train_ds, val_ds, test_ds = build_datasets(config)
    rng = np.random.default_rng(config.seed)

    if len(train_ds) == 0:
        raise ValueError("training dataset is empty — check --data_path")
    first = next(batches(train_ds, config.batch_size,
                         np.arange(len(train_ds))))
    state = T.create_train_state(config, jax.random.PRNGKey(config.seed), first)

    logdir = Path(config.logdir)
    start_epoch = 0
    if loadckpt:
        # warm start: model variables only (parity train.py:160-164)
        from .checkpoint import restore_params
        params, batch_stats, _ = restore_params(
            Path(loadckpt), state.params, state.batch_stats)
        state = state.replace(params=params, batch_stats=batch_stats)
        print(f"warm-started from {loadckpt}")
    if resume and (ckpt := latest_checkpoint(logdir)) is not None:
        state = restore_checkpoint(ckpt, state)
        start_epoch = load_metadata(ckpt)["epoch"] + 1
        print(f"resumed from {ckpt} at epoch {start_epoch}")

    mesh_step = None
    if world_size > 1:
        mesh_step, place = make_mesh_step(config, world_size)
        state = place(state)

    # multi-host: each process loads only its shard of every global batch
    # (data-sharded modes); occ_masking replicates the batch over `view`
    # so every host loads it whole. Parity: DistributedSampler's rank
    # sharding (train.py:112-116) / SharedRandomSampler's identical batch.
    procs, pid = jax.process_count(), jax.process_index()
    data_sharded = not (config.occ_masking and not config.supervised)
    from ..dist.mesh import process_local_order

    logger = Logger(logdir) if pid == 0 else None
    meters = MeterSet()
    history = {"train_loss": [], "val_loss": [], "test": []}
    end_epoch = max_epochs if max_epochs is not None else config.epochs
    for epoch in range(start_epoch, end_epoch):
        state = T.set_epoch_lr(state, config, epoch)
        # epoch-seeded shared permutation (replaces SharedRandomSampler's
        # broadcast, utils/SharedRandomSampler.py:45-56: same seed -> same
        # permutation on every host)
        order = np.random.default_rng(config.seed * 1000 + epoch).permutation(
            len(train_ds))
        if procs > 1 and data_sharded:
            order, local_bs = process_local_order(order, config.batch_size)
        else:
            local_bs = config.batch_size
        t0 = time.time()
        ep_losses = []
        for i, batch in enumerate(batches(train_ds, local_bs, order,
                                          num_workers=config.num_workers)):
            if mesh_step is not None:
                state, m = mesh_step(state, batch)
            else:
                state, m = T.train_step(state, batch, config)
            depth_est = m.pop("depth_est", None)
            ep_losses.append(float(m["train_loss"]))
            meters.update(m)
            if (i + 1) % config.print_every == 0 and logger is not None:
                print(f"  iter {i + 1}: {meters.means()}")
                # training-image panels: ref + srcs + depth-warped srcs
                # (models/trainer.py:78-92, :258-276 parity)
                from ..utils.monitor import training_panels
                logger.plot_ims(training_panels(batch, depth_est),
                                prefix=f"e{epoch}_")
                if depth_est is not None:
                    logger.depth_panel(
                        np.asarray(depth_est[0]),
                        float(batch["depth_min"][0, 0]),
                        float(batch["depth_max"][0, 0]),
                        name=f"e{epoch}_depth_est")
            if config.debug:
                break
        history["train_loss"].append(float(np.mean(ep_losses)))
        if logger is not None:
            logger.log({"epoch": epoch, **meters.reset(),
                        "lr": config.lr_at_epoch(epoch),
                        "seconds": round(time.time() - t0, 2)})
        print(f"epoch {epoch}: train_loss={history['train_loss'][-1]:.4f} "
              f"({time.time() - t0:.1f}s)")

        if epoch % config.save_freq == 0:
            if pid == 0:
                # rank-0 checkpointing (train.py:202-210); fully-replicated
                # state is fully addressable on every process
                save_checkpoint(logdir, epoch, state, config.architecture)
            # val/test shard across processes (i::procs) and the epoch means
            # cross-reduce — the eval analogue of utils/trainer.py:25-35's
            # all_reduce / world_size
            v_losses = []
            for i, batch in enumerate(batches(
                    val_ds, config.batch_size,
                    np.arange(len(val_ds))[pid::procs],
                    num_workers=config.num_workers)):
                v_losses.append(float(T.eval_step(state, batch, config)["val_loss"]))
                if config.debug:
                    break
            t_metrics = []
            for i, batch in enumerate(batches(
                    test_ds, 1, np.arange(len(test_ds))[pid::procs],
                    num_workers=config.num_workers)):
                t_metrics.append({k: float(v) for k, v in
                                  T.test_step(state, batch, config).items()})
                if config.debug:
                    break
            if procs > 1:
                # fixed-shape sum+count exchange (local lengths may differ
                # when len(dataset) % procs != 0)
                from jax.experimental import multihost_utils
                keys = sorted(t_metrics[0]) if t_metrics else []
                local = np.array(
                    [np.sum(v_losses), len(v_losses), len(t_metrics)]
                    + [np.sum([m[k] for m in t_metrics]) for k in keys],
                    np.float64)
                g = np.asarray(multihost_utils.process_allgather(local))
                val_mean = g[:, 0].sum() / max(g[:, 1].sum(), 1.0)
                n_t = max(g[:, 2].sum(), 1.0)
                history["val_loss"].append(float(val_mean))
                avg = {k: float(g[:, 3 + j].sum() / n_t)
                       for j, k in enumerate(keys)}
            else:
                history["val_loss"].append(float(np.mean(v_losses)))
                avg = {k: float(np.mean([m[k] for m in t_metrics]))
                       for k in t_metrics[0]}
            history["test"].append(avg)
            if logger is not None:
                logger.log({"epoch": epoch,
                            "val_loss": history["val_loss"][-1], **avg})
            print(f"  val_loss={history['val_loss'][-1]:.4f} test={avg}")
        if config.debug:
            break
    return history


def main(argv=None):
    p = argparse.ArgumentParser(description="wildmvs training")
    p.add_argument("--dataset", default="synthetic",
                   choices=["dtu", "md", "blended", "synthetic"])
    p.add_argument("--architecture", default="mvsnet",
                   choices=["mvsnet", "mvsnet-s", "vis_mvsnet", "cvp_mvsnet"])
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lrepochs", default="13:10")
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--num_im_train", type=int, default=3)
    p.add_argument("--num_depth", type=int, default=192)
    p.add_argument("--upsample_training", action="store_true",
                   dest="upsample_training")
    p.add_argument("--no_upsample_training", action="store_false",
                   dest="upsample_training")
    p.set_defaults(upsample_training=False)
    p.add_argument("--occ_masking", action="store_true")
    p.add_argument("--geom_clamping", type=float, default=0.05)
    sup = p.add_mutually_exclusive_group()
    sup.add_argument("--supervised", dest="supervised", action="store_true")
    sup.add_argument("--unsupervised", dest="supervised", action="store_false")
    p.set_defaults(supervised=True)
    p.add_argument("--logdir", default="trained_models/debug")
    p.add_argument("--data_path", default=None,
                   help="dataset root override (default: the reference's "
                        "datasets/ layouts)")
    p.add_argument("--loadckpt", default=None,
                   help="warm-start model variables from a checkpoint dir")
    p.add_argument("--resume", action="store_true",
                   help="continue from the latest checkpoint in logdir")
    p.add_argument("--save_freq", type=int, default=1)
    p.add_argument("--print_every", type=int, default=20)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--world_size", type=int, default=1,
                   help="number of devices: occ_masking shards reference "
                        "views over a `view` mesh axis, otherwise the batch "
                        "shards over `data`")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port "
                        "(replaces the hardcoded localhost MASTER_ADDR, "
                        "train.py:53-54)")
    p.add_argument("--num_processes", type=int, default=1,
                   help="multi-host: total number of host processes")
    p.add_argument("--process_id", type=int, default=0,
                   help="multi-host: this process's index")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the forward in the backward pass "
                        "(jax.checkpoint) to cut activation memory")
    p.add_argument("--remat_levels", action="store_true",
                   help="cvp_mvsnet: rematerialize per pyramid LEVEL "
                        "(peak memory = largest level, the f32 recipe)")
    p.add_argument("--packed_training", action="store_true",
                   help="cvp_mvsnet: packed 3D regularizer at train "
                        "(same math/params; MXU-sized matmuls)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 network compute (f32 params/optimizer) — "
                        "MXU-native mixed-precision training")
    p.add_argument("--num_workers", type=int, default=4,
                   help="prefetch threads for sample loading (0 = inline; "
                        "parity train.py:120's 8 DataLoader workers)")
    p.add_argument("--trace", action="store_true",
                   help="capture a jax.profiler trace of the run into "
                        "logdir/jax_trace (view with xprof/TensorBoard)")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                   help="override the jax platform (the image pins axon/TPU)")
    a = p.parse_args(argv)
    if a.platform:
        # both are required: the image's sitecustomize re-exports
        # JAX_PLATFORMS=axon inside Python, and config.update alone loses
        # to the env var at backend init (see CLAUDE.md environment rules)
        import os
        plat = "axon" if a.platform == "tpu" else a.platform
        os.environ["JAX_PLATFORMS"] = plat
        jax.config.update("jax_platforms", plat)
    if a.num_processes > 1:
        # DCN rendezvous before any device use (replaces gloo
        # init_process_group, train.py:52-62)
        from ..dist.mesh import initialize
        initialize(coordinator=a.coordinator, num_processes=a.num_processes,
                   process_id=a.process_id)
    if a.supervised and a.dataset == "dtu" and not a.upsample_training:
        # parity train.py:305-309: DTU GT depth is x4 downsampled
        raise SystemExit("dtu supervised training requires "
                         "--upsample_training (GT is x4 downsampled)")
    config = TrainConfig(
        architecture=a.architecture, dataset=a.dataset, supervised=a.supervised,
        occ_masking=a.occ_masking, upsample_training=a.upsample_training,
        num_im_train=a.num_im_train, batch_size=a.batch_size, epochs=a.epochs,
        lr=a.lr, lrepochs=a.lrepochs, weight_decay=a.wd,
        geom_clamping=a.geom_clamping, seed=a.seed, save_freq=a.save_freq,
        print_every=a.print_every, logdir=a.logdir, debug=a.debug,
        data_path=a.data_path,
        num_depth=a.num_depth, num_workers=a.num_workers,
        train_dtype="bfloat16" if a.bf16 else "float32", remat=a.remat,
        remat_levels=a.remat_levels, packed_training=a.packed_training)
    with profiler_trace(a.logdir, enabled=a.trace):
        run(config, world_size=a.world_size, resume=a.resume,
            loadckpt=a.loadckpt)


if __name__ == "__main__":
    main()

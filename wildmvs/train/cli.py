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


def batches(dataset, batch_size, order):
    for start in range(0, len(order) - batch_size + 1, batch_size):
        idxs = order[start:start + batch_size]
        b = collate([dataset[int(i)] for i in idxs])
        yield {k: jnp.array(v) for k, v in b.items() if k != "filename"}


def run(config: TrainConfig, max_epochs: int | None = None) -> dict:
    train_ds, val_ds, test_ds = build_datasets(config)
    rng = np.random.default_rng(config.seed)

    first = next(batches(train_ds, config.batch_size,
                         np.arange(len(train_ds))))
    state = T.create_train_state(config, jax.random.PRNGKey(config.seed), first)

    logdir = Path(config.logdir)
    start_epoch = 0
    ckpt = latest_checkpoint(logdir)
    if ckpt is not None:
        state = restore_checkpoint(ckpt, state)
        start_epoch = load_metadata(ckpt)["epoch"] + 1
        print(f"resumed from {ckpt} at epoch {start_epoch}")

    logger = Logger(logdir)
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
        t0 = time.time()
        ep_losses = []
        for i, batch in enumerate(batches(train_ds, config.batch_size, order)):
            state, m = T.train_step(state, batch, config)
            ep_losses.append(float(m["train_loss"]))
            meters.update(m)
            if config.debug:
                break
        history["train_loss"].append(float(np.mean(ep_losses)))
        logger.log({"epoch": epoch, **meters.reset(),
                    "lr": config.lr_at_epoch(epoch),
                    "seconds": round(time.time() - t0, 2)})
        print(f"epoch {epoch}: train_loss={history['train_loss'][-1]:.4f} "
              f"({time.time() - t0:.1f}s)")

        if epoch % config.save_freq == 0:
            save_checkpoint(logdir, epoch, state, config.architecture)
            v_losses = []
            for i, batch in enumerate(batches(val_ds, config.batch_size,
                                              np.arange(len(val_ds)))):
                v_losses.append(float(T.eval_step(state, batch, config)["val_loss"]))
                if config.debug:
                    break
            history["val_loss"].append(float(np.mean(v_losses)))
            t_metrics = []
            for i, batch in enumerate(batches(test_ds, 1,
                                              np.arange(len(test_ds)))):
                t_metrics.append({k: float(v) for k, v in
                                  T.test_step(state, batch, config).items()})
                if config.debug:
                    break
            avg = {k: float(np.mean([m[k] for m in t_metrics]))
                   for k in t_metrics[0]}
            history["test"].append(avg)
            logger.log({"epoch": epoch, "val_loss": history["val_loss"][-1],
                        **avg})
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
    p.add_argument("--upsample_training", action="store_true")
    p.add_argument("--occ_masking", action="store_true")
    p.add_argument("--geom_clamping", type=float, default=0.05)
    sup = p.add_mutually_exclusive_group()
    sup.add_argument("--supervised", dest="supervised", action="store_true")
    sup.add_argument("--unsupervised", dest="supervised", action="store_false")
    p.set_defaults(supervised=True)
    p.add_argument("--logdir", default="trained_models/debug")
    p.add_argument("--save_freq", type=int, default=1)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                   help="override the jax platform (the image pins axon/TPU)")
    a = p.parse_args(argv)
    if a.platform:
        jax.config.update("jax_platforms",
                          "axon" if a.platform == "tpu" else a.platform)
    config = TrainConfig(
        architecture=a.architecture, dataset=a.dataset, supervised=a.supervised,
        occ_masking=a.occ_masking, upsample_training=a.upsample_training,
        num_im_train=a.num_im_train, batch_size=a.batch_size, epochs=a.epochs,
        lr=a.lr, lrepochs=a.lrepochs, weight_decay=a.wd,
        geom_clamping=a.geom_clamping, seed=a.seed, save_freq=a.save_freq,
        logdir=a.logdir, debug=a.debug, num_depth=a.num_depth)
    run(config)


if __name__ == "__main__":
    main()

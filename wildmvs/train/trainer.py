"""Functional training core: loss assembly, train/eval/test steps.

Parity: models/trainer.py (loss structure, resolution adapters, metrics) and
train.py:176-250 (the loop), re-designed as pure jitted step functions over an
explicit TrainState.  The occ_masking mode computes ALL reference views in one
program (a static loop, shardable over a mesh `view` axis) instead of
one-process-per-view + gloo all_gather: each view's loss sees the other views'
depthmaps through stop_gradient, exactly like dist.all_gather's detached
tensors (models/trainer.py:246-247).

Model-output contract (models/api.py): depth_est_list entries are [B, h, w]
(finest first); depth_pair_list entries are lists of
(depth [B, h, w], (uncertainty [B, h, w],)) per source pair.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..geometry.projective import build_proj_matrices, scale_K
from ..losses.photometric import (masked_mean, masked_photometric_loss,
                                  photometric_loss)
from ..losses.supervised import (bayesian_loss, downsample_gt,
                                 masked_l1_interval, resize_bilinear)
from ..models.api import build_model
from .config import TrainConfig
from .metrics import depth_metrics


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            batch_stats=batch_stats, opt_state=new_opt)


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """Adam (betas 0.9/0.999, optional weight decay) with the MultiStepLR
    epoch schedule injected as a mutable hyperparameter.
    Parity: train.py:139,170-173 — torch.optim.Adam's weight_decay is
    COUPLED L2 (wd*param added to the gradient before the moment updates),
    not AdamW's decoupled decay, so it is expressed as add_decayed_weights
    ahead of the Adam transform."""
    def adam_l2(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(config.weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999),
            optax.scale(-learning_rate))
    return optax.inject_hyperparams(adam_l2)(learning_rate=config.lr)


def set_epoch_lr(state: TrainState, config: TrainConfig, epoch: int) -> TrainState:
    """Apply the MultiStepLR value for `epoch` to the optimizer state."""
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(
        config.lr_at_epoch(epoch), dtype=jnp.float32)
    return state.replace(opt_state=opt_state)


def create_model(config: TrainConfig):
    kwargs = {}
    if config.architecture.startswith("mvsnet"):
        kwargs["num_depth"] = config.num_depth
        if config.hyp_axis is not None:
            kwargs["hyp_axis"] = config.hyp_axis
    if config.train_dtype == "bfloat16":
        kwargs["dtype"] = jnp.bfloat16
    if config.batched_bn:
        kwargs["batched_bn"] = True  # all architectures expose the field
    if config.architecture == "cvp_mvsnet":
        if config.remat_levels:
            kwargs["remat_levels"] = True
        if config.packed_training:
            kwargs["packed_training"] = True
    return build_model(config.architecture, **kwargs)


def create_train_state(config: TrainConfig, rng, sample: Dict[str, jnp.ndarray]
                       ) -> TrainState:
    model = create_model(config)
    variables = model.init(rng, *forward_args(sample, config), train=True)
    tx = make_optimizer(config)
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(variables["params"]), tx=tx)


def forward_args(batch, config: TrainConfig):
    """Downsample inputs by input_down and scale K accordingly.
    Parity: models/trainer.py:61-76 (forward_network)."""
    imgs = batch["imgs"]
    b, n, h, w, c = imgs.shape
    down = config.input_down
    if down != 1:
        flat = imgs.reshape(b * n, h, w, c)
        flat = resize_bilinear(flat, (h // down, w // down))
        imgs = flat.reshape(b, n, h // down, w // down, c)
        K = scale_K(batch["K"], 1.0 / down)
    else:
        K = batch["K"]
    return (imgs, K, batch["R"], batch["t"], batch["depth_min"],
            batch["depth_max"])


def loss_from_outputs(outputs, batch, config: TrainConfig, ref_idx: int,
                      all_depthmaps=None):
    """Assemble the full training loss from one reference view's outputs.

    Parity: models/trainer.py:106-206.  `all_depthmaps` (one [B, N, H', W']
    PER SCALE at loss resolution, others detached) enables the
    occlusion-masked variant — the reference all-gathers the CURRENT
    scale's depth inside the per-scale loop (models/trainer.py:246-247),
    so each scale masks against same-scale cross-view depths.
    """
    imgs = batch["imgs"]
    b, n, h, w, c = imgs.shape
    lh, lw = h // config.output_down, w // config.output_down
    src_idx = [i for i in range(n) if i != ref_idx]
    loss = jnp.zeros((), imgs.dtype)

    def factor_at(i):
        return (config.factors_loss[i]
                if config.architecture == "vis_mvsnet" else 1.0)

    if config.supervised:
        depth_interval = (batch["depth_max"] - batch["depth_min"])[:, 0] / 128.0
        for i, d in enumerate(outputs["depth_est_list"]):
            if d is None:
                continue
            gt_d, mask_d = downsample_gt(batch["depth"], batch["mask"],
                                         d.shape[1:3])
            loss = loss + factor_at(i) * masked_l1_interval(
                d, gt_d, mask_d, depth_interval)
        for i, pairs in enumerate(outputs["depth_pair_list"]):
            factor = factor_at(i) / (n - 1)
            for dp, (unc,) in pairs:
                if dp is None:
                    continue
                gt_d, mask_d = downsample_gt(batch["depth"], batch["mask"],
                                             dp.shape[1:3])
                l1 = jnp.abs(dp - gt_d) / depth_interval[:, None, None]
                loss = loss + factor * bayesian_loss(l1, unc, mask_d)
        return loss

    # ---- unsupervised: photometric DSSIM at loss resolution ----
    flat = imgs.reshape(b * n, h, w, c)
    loss_imgs = (resize_bilinear(flat, (lh, lw)).reshape(b, n, lh, lw, c)
                 if (lh, lw) != (h, w) else imgs)
    proj = build_proj_matrices(scale_K(batch["K"], 1.0 / config.output_down),
                               batch["R"], batch["t"])
    for i, d in enumerate(outputs["depth_est_list"]):
        if d is None:
            continue
        d_up = resize_bilinear(d, (lh, lw))
        if config.occ_masking and all_depthmaps is not None:
            all_d = all_depthmaps[i].at[:, ref_idx].set(d_up)  # our grad path
            ssim, mask = masked_photometric_loss(
                loss_imgs, all_d, proj, ref_idx, config.geom_clamping)
        else:
            perm = [ref_idx] + src_idx
            ssim, mask = photometric_loss(loss_imgs[:, perm], d_up, proj[:, perm])
        loss = loss + factor_at(i) * masked_mean(ssim, mask.astype(ssim.dtype))
    for i, pairs in enumerate(outputs["depth_pair_list"]):
        factor = factor_at(i) / (n - 1)
        for pair_id, (dp, (unc,)) in enumerate(pairs):
            if dp is None:
                continue
            dp_up = resize_bilinear(dp, (lh, lw))
            pair_idx = [ref_idx, src_idx[pair_id]]
            # pairwise terms never use occlusion masking (trainer.py:195-197)
            ssim, mask = photometric_loss(loss_imgs[:, pair_idx], dp_up,
                                          proj[:, pair_idx])
            u = resize_bilinear(unc, (lh, lw))[:, None]
            loss = loss + factor * bayesian_loss(ssim, u, mask.astype(ssim.dtype))
    return loss


def _per_scale_gather(outs, hw):
    """[B, N, H', W'] of detached cross-view depths, one per scale — the
    analogue of the reference's per-scale dist.all_gather
    (models/trainer.py:246-247)."""
    n_scales = len(outs[0]["depth_est_list"])
    return [
        jnp.stack([jax.lax.stop_gradient(
            resize_bilinear(o["depth_est_list"][i], hw)) for o in outs],
            axis=1)
        for i in range(n_scales)
    ]


@functools.partial(jax.jit, static_argnames=("config",))
def train_step(state: TrainState, batch, config: TrainConfig):
    """One optimizer step. With occ_masking, the loss is averaged over all N
    reference-view choices (equals the reference's N-rank DDP gradient
    average over ranks r = 0..N-1 on an identical batch)."""
    model = create_model(config)

    def make_apply(**static_kw):
        """model.apply with static kwargs closed over; with config.remat the
        forward is rematerialized in the backward pass — trades one extra
        forward for not keeping cost-volume-sized activations live
        (jax.checkpoint; the torch analogue would be checkpoint_sequential,
        which the reference does not use)."""
        def f(variables, *args):
            return model.apply(variables, *args, **static_kw)
        return jax.checkpoint(f) if config.remat else f

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        args = forward_args(batch, config)
        if config.occ_masking and not config.supervised:
            n = batch["imgs"].shape[1]
            h, w = batch["imgs"].shape[2:4]
            lh, lw = h // config.output_down, w // config.output_down
            outs, stats = [], None
            for r in range(n):
                # every forward updates BN batch stats; keep r=0's (the
                # reference's DDP broadcasts rank 0's buffers)
                out_r, mut = make_apply(reference_frame=r, train=True,
                                        mutable=["batch_stats"])(
                    variables, *args)
                if r == 0:
                    stats = mut["batch_stats"]
                outs.append(out_r)
            all_d = _per_scale_gather(outs, (lh, lw))
            total = jnp.zeros(())
            for r in range(n):
                total = total + loss_from_outputs(outs[r], batch, config, r,
                                                  all_depthmaps=all_d)
            return total / n, (stats, outs[0]["depth"])
        out, mut = make_apply(reference_frame=0, train=True,
                              mutable=["batch_stats"])(variables, *args)
        return (loss_from_outputs(out, batch, config, 0),
                (mut["batch_stats"], out["depth"]))

    (loss, (new_stats, depth_est)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads, batch_stats=new_stats)
    # depth_est rides along for image logging (models/trainer.py:78-92);
    # callers pop it before scalar metric accumulation
    return state, {"train_loss": loss, "depth_est": depth_est}


@functools.partial(jax.jit, static_argnames=("config",))
def eval_step(state: TrainState, batch, config: TrainConfig):
    """Validation loss (no grad, running BN stats). Parity: train.py:217-230
    — the reference's val loop runs the SAME Trainer.step loss as training,
    so occ_masking validation also computes all N reference views and the
    occlusion-masked photometric loss (mean over ranks, like the epoch
    all_reduce in utils/trainer.py:25-35)."""
    model = create_model(config)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    args = forward_args(batch, config)
    if config.occ_masking and not config.supervised:
        n = batch["imgs"].shape[1]
        h, w = batch["imgs"].shape[2:4]
        lh, lw = h // config.output_down, w // config.output_down
        outs = [model.apply(variables, *args, reference_frame=r, train=False)
                for r in range(n)]
        all_d = _per_scale_gather(outs, (lh, lw))
        total = jnp.zeros(())
        for r in range(n):
            total = total + loss_from_outputs(outs[r], batch, config, r,
                                              all_depthmaps=all_d)
        return {"val_loss": total / n}
    out = model.apply(variables, *args, reference_frame=0, train=False)
    return {"val_loss": loss_from_outputs(out, batch, config, 0)}


@functools.partial(jax.jit, static_argnames=("config",))
def test_step(state: TrainState, batch, config: TrainConfig):
    """Depth-metric evaluation on GT. Parity: models/trainer.py:280-321
    (incl. the per-architecture test-time overrides)."""
    model = create_model(config)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    kwargs = {}
    if config.architecture == "vis_mvsnet":
        kwargs = {"depth_nums": (64, 32, 16), "interval_scales": (2.0, 1.0, 0.5)}
    elif config.architecture == "cvp_mvsnet" and config.dataset != "dtu":
        kwargs = {"nscale": 4}
    outputs = model.apply(variables, batch["imgs"], batch["K"], batch["R"],
                          batch["t"], batch["depth_min"], batch["depth_max"],
                          train=False, **kwargs)
    gt = batch["depth"]
    mask = batch["mask"]
    est = resize_bilinear(outputs["depth"], gt.shape[1:3])
    return depth_metrics(est, gt, mask, batch["depth_min"][:, 0],
                         batch["depth_max"][:, 0])

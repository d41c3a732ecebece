"""Typed config tree — replaces the reference's argparse triplet.

Parity: train.py:255-315 (training flags + derived constraints),
models/trainer.py:26-51 (per-architecture resolution adapters and loss
weights). One dataclass, hashable so it can be a jit static argument.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    architecture: str = "mvsnet"       # mvsnet | mvsnet-s | vis_mvsnet | cvp_mvsnet
    dataset: str = "dtu"               # dtu | md | blended | synthetic
    supervised: bool = True
    occ_masking: bool = False
    upsample_training: bool = False
    num_im_train: int = 3
    batch_size: int = 1
    epochs: int = 15
    lr: float = 1e-3
    lrepochs: str = "13:10"            # "m1,m2:gamma_inv" MultiStepLR spec
    weight_decay: float = 0.0
    geom_clamping: float = 0.05        # occlusion-mask gate (train.py:278)
    seed: int = 1
    save_freq: int = 1
    print_every: int = 20
    logdir: str = "trained_models/debug"
    # dataset root override (None -> the reference's fixed layouts under
    # datasets/: dtu_training / megadepth / BlendedMVS)
    data_path: "str | None" = None
    debug: bool = False
    num_workers: int = 4               # prefetch threads (train.py:120's 8
    # worker processes; our decode is native+GIL-free so threads suffice)
    # mixed precision: compute dtype for the network (params, batch stats,
    # optimizer state and the loss stay f32 — MXU-native bf16 matmuls/convs)
    train_dtype: str = "float32"       # float32 | bfloat16
    # rematerialize the forward in the backward (jax.checkpoint): frees
    # cost-volume activations for larger batches/resolutions
    remat: bool = False
    # featurize all views in ONE batched call at train (faster; train-mode
    # BN then normalizes across views instead of the reference's per-view
    # calls — a deliberate deviation, off by default for parity)
    batched_bn: bool = False
    # cvp_mvsnet only — per-LEVEL rematerialization (extractor, cost
    # volume, and regularizer of each pyramid level recomputed in the
    # backward): peak activation memory drops from the sum over levels to
    # the largest level, the f32 full-pyramid recipe (finer-grained than
    # `remat`, which recomputes the whole forward once)
    remat_levels: bool = False
    # cvp_mvsnet only — run the depth-packed/block-packed 3D regularizer
    # at TRAIN time too (same math and parameters as the unpacked conv3d
    # stack, BN statistics still per-C over (B,D,H,W); the packed view is
    # what lets the MXU see 128+-channel matmuls instead of the 16-channel
    # ones that measured ~3% utilization)
    packed_training: bool = False
    # model structure overrides (None -> architecture defaults)
    num_depth: int = 192               # mvsnet hypothesis count (model.py:98)
    # mesh axis for depth-hypothesis slab sharding (mvsnet; requires an
    # ambient jax.sharding.use_mesh with this axis)
    hyp_axis: "str | None" = None

    def __post_init__(self):
        # constraint propagation, parity train.py:305-309
        if self.supervised and self.occ_masking:
            object.__setattr__(self, "occ_masking", False)

    # --- derived structure constants (models/trainer.py:33-51) ---

    @property
    def factors_loss(self) -> Tuple[float, ...]:
        """Multi-scale loss weights, finest-first (vis_mvsnet only)."""
        return (2.0, 1.0, 0.5)

    @property
    def input_down(self) -> int:
        """Downsampling applied to network input (upsample-training modes)."""
        if self.upsample_training:
            if self.architecture == "cvp_mvsnet":
                return 4
            if self.architecture == "vis_mvsnet":
                return 2
        return 1

    @property
    def output_down(self) -> int:
        """Loss resolution = input resolution / output_down."""
        if not self.upsample_training:
            if self.architecture.startswith("mvsnet"):
                return 4
            if self.architecture == "vis_mvsnet":
                return 2
        return 1

    @property
    def lr_milestones(self) -> Tuple[int, ...]:
        return tuple(int(e) for e in self.lrepochs.split(":")[0].split(","))

    @property
    def lr_gamma(self) -> float:
        return 1.0 / float(self.lrepochs.split(":")[1])

    def lr_at_epoch(self, epoch: int) -> float:
        """MultiStepLR schedule value. Parity: train.py:170-173."""
        passed = sum(1 for m in self.lr_milestones if epoch >= m)
        return self.lr * (self.lr_gamma ** passed)

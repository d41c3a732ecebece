"""MVSNet — classic single-scale plane sweep (variance and softmin variants).

Parity: models/MVSNet/model.py. Structure:
  FeatureNet: 7 conv2d (8->16->32 ch, two stride-2) + final conv -> 1/4-res
    32-ch features (model.py:21-41)
  cost volume over 192 fixed depth hypotheses, aggregated across views by
    feature variance (model.py:113-139) or learned-temperature softmin
    (model.py:141-173)
  CostRegNet: 3D U-Net (8/16/32/64 ch, three stride-2, transposed-conv up,
    additive skips; model.py:43-84)
  softmax over depth -> soft-argmin depth + 4-tap photometric confidence
    (model.py:205-215)

TPU-first choices: channels-last layouts, batched featurization of all N
views at eval (per-view at train for BN-statistics parity with the
reference's per-view calls), the warp+aggregate loop kept associative so it
shards over a mesh `view` axis.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.projective import build_proj_matrices, scale_K
from ..nn.blocks import ConvBnReLU, ConvTransposeBnReLU, TorchConv
from ..ops.plane_sweep import plane_sweep_warp
from ..ops.volumes import (depth_regression, photometric_confidence,
                           softmin_cost_volume, variance_cost_volume)
from .api import register_model, view_list


class FeatureNet(nn.Module):
    """8-8 / 16-16-16 / 32-32 conv stack, 1/4 resolution, 32 channels.
    Parity: models/MVSNet/model.py:21-41.

    (A space-to-depth-packed variant of the 8-channel head was measured
    NEUTRAL-to-negative in-model — XLA overlaps this stack's padding IO
    with the warp — and removed; CVP's full-resolution extractor keeps the
    packing where it does pay, see cvp_mvsnet.FeaturePyramidNet.)"""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnReLU(8, 3, 1, 1, dtype=self.dtype, name="conv0")(x, train)
        x = ConvBnReLU(8, 3, 1, 1, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBnReLU(16, 5, 2, 2, dtype=self.dtype, name="conv2")(x, train)
        x = ConvBnReLU(16, 3, 1, 1, dtype=self.dtype, name="conv3")(x, train)
        x = ConvBnReLU(16, 3, 1, 1, dtype=self.dtype, name="conv4")(x, train)
        x = ConvBnReLU(32, 5, 2, 2, dtype=self.dtype, name="conv5")(x, train)
        x = ConvBnReLU(32, 3, 1, 1, dtype=self.dtype, name="conv6")(x, train)
        return TorchConv(32, 3, 1, 1, use_bias=True, dtype=self.dtype,
                         name="feature")(x)


class CostRegNet(nn.Module):
    """3D U-Net cost regularizer with additive skips.
    Parity: models/MVSNet/model.py:43-84. Input [B, D, H, W, 32] -> [B, D, H, W, 1]."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 packed_block: int | None = None):
        # packed_block=p runs every conv BLOCK-depth-packed (nn/blocks.py):
        # input [B, D/p, H, W, p*32], stride-2 levels halve p, so with p=16
        # all four UNet levels contract exactly 128 packed channels on the
        # MXU (16*8 / 8*16 / 4*32 / 2*64) instead of tiny-C matmuls over
        # 16x-lane-padded activations. Same params, same math.
        pb = packed_block
        p1 = None if pb is None else pb // 2
        p2 = None if p1 is None else p1 // 2
        p3 = None if p2 is None else p2 // 2
        c0 = ConvBnReLU(8, dtype=self.dtype, name="conv0")(
            x, train, packed_block=pb)
        c1 = ConvBnReLU(16, strides=2, dtype=self.dtype, name="conv1")(
            c0, train, packed_block=pb)
        c2 = ConvBnReLU(16, dtype=self.dtype, name="conv2")(
            c1, train, packed_block=p1)
        c3 = ConvBnReLU(32, strides=2, dtype=self.dtype, name="conv3")(
            c2, train, packed_block=p1)
        c4 = ConvBnReLU(32, dtype=self.dtype, name="conv4")(
            c3, train, packed_block=p2)
        c5 = ConvBnReLU(64, strides=2, dtype=self.dtype, name="conv5")(
            c4, train, packed_block=p2)
        x = ConvBnReLU(64, dtype=self.dtype, name="conv6")(
            c5, train, packed_block=p3)
        x = c4 + ConvTransposeBnReLU(32, dtype=self.dtype, name="conv7")(
            x, train, packed_block=p3)
        x = c2 + ConvTransposeBnReLU(16, dtype=self.dtype, name="conv9")(
            x, train, packed_block=p2)
        x = c0 + ConvTransposeBnReLU(8, dtype=self.dtype, name="conv11")(
            x, train, packed_block=p1)
        return TorchConv(1, 3, 1, 1, use_bias=True, dtype=self.dtype,
                         name="prob")(x, packed_block=pb)


@register_model("mvsnet")
class MVSNet(nn.Module):
    """MVSNet frontend with the uniform model contract (see models/api.py)."""
    aggregation: str = "variance"  # "variance" | "softmin" (+ "norm" prefix)
    num_depth: int = 192
    # the reference featurizes each view in its own call (model.py:101-107),
    # so train-mode BatchNorm statistics are PER VIEW; batched_bn=True
    # featurizes all views in one batched call instead (identical at eval,
    # faster, but train-mode BN then normalizes across views)
    batched_bn: bool = False
    # plane-sweep warp backend: "auto" picks the Mosaic lane-gather kernel
    # (ops/mosaic_sweep.py; ~5x the exact XLA gather, with a runtime
    # span-cond fallback to it) at bf16 eval on TPU and the exact gather
    # everywhere else; "gather"/"mosaic"/"rect" force a backend (the
    # latter two inference-only) — see BASELINE.md.  (The superseded
    # "wide"/"pallas" octet/row-streaming studies were removed in r4;
    # their measurements live in BASELINE.md warp-study sections.)
    sweep_method: str = "auto"
    # mesh axis name to shard the depth-hypothesis dimension over (the
    # "hyp" slab sharding, SURVEY long-axis parallelism). When set, the
    # cost volume is constrained to P(None, hyp_axis) — the warp + Σ/Σ²
    # accumulation partition over depth slabs, and XLA inserts the
    # cross-slab collectives for the softmax/regression. Requires an
    # ambient mesh (jax.sharding.use_mesh) with that axis.
    hyp_axis: str | None = None
    # eval-time BLOCK-depth-packed 3D UNet (CostRegNet packed_block): same
    # params/math with depth folded into lanes so every level contracts
    # >=128 channels on the MXU. None = auto by feature-grid size:
    # measured on v5e the packed path WINS 2.1x at full-res DTU eval
    # (296x400 grid: reg 49.5 vs 102.9 ms) but LOSES ~4% at the 512x640
    # training config (128x160 grid: its volume transposes outweigh the
    # matmul win) — see BASELINE.md round 3
    packed_regnet: bool | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, imgs, K, R, t, depth_min, depth_max,
                 reference_frame: int = 0, train: bool = False, **kwargs):
        views, ragged = view_list(imgs)
        n = len(views)
        b = views[0].shape[0]
        dtype = views[0].dtype
        for v in views:
            vh, vw = v.shape[1:3]
            if vh % 32 or vw % 32:
                raise ValueError(
                    f"MVSNet input images must be /32 multiples (the 3D "
                    f"UNet's three stride-2 levels at 1/4 feature res), got "
                    f"{vh}x{vw}; crop like the reference's "
                    f"data/MVSDataset.py:77 (multi=32 center_crop)")

        # projection matrices at 1/4 feature resolution (model.py:183-185)
        proj = build_proj_matrices(scale_K(K, 0.25), R, t)  # [B, N, 4, 4]

        # 192 uniformly spaced hypotheses per view's own range (model.py:187-189)
        steps = jnp.arange(self.num_depth, dtype=dtype)
        interval = (depth_max - depth_min) / (self.num_depth - 1)  # [B, N]
        depth_values = depth_min[..., None] + interval[..., None] * steps  # [B,N,D]

        fnet = FeatureNet(dtype=self.dtype, name="feature")
        feats = None  # stacked [B, N, fh, fw, C] when views are uniform
        if ragged:
            # heterogeneous view sizes (in-the-wild eval): one trace-time
            # featurization per view, each with its own static shape
            feats_l = [fnet(v, train) for v in views]
        elif self.batched_bn or not train:
            # eval: running BN stats make batched == per-view; use one call
            h, w = views[0].shape[1:3]
            stacked = imgs if not isinstance(imgs, (list, tuple)) \
                else jnp.stack(views, axis=1)
            feats = fnet(stacked.reshape(b * n, h, w, 3), train)
            fh, fw = feats.shape[1:3]
            feats = feats.reshape(b, n, fh, fw, -1)
        else:
            # per-view featurization for train-mode BN parity
            feats = jnp.stack([fnet(v, train) for v in views], axis=1)
        if feats is not None:
            feats_l = [feats[:, i] for i in range(n)]
        if self.aggregation.startswith("norm"):
            feats_l = [f / jnp.linalg.norm(f, axis=-1,
                                           keepdims=True).clip(1e-12)
                       for f in feats_l]
            feats = (jnp.stack(feats_l, axis=1) if feats is not None
                     else None)

        src_idx = [i for i in range(n) if i != reference_frame]
        ref_feature = feats_l[reference_frame]
        fh, fw = ref_feature.shape[1:3]
        ref_proj = proj[:, reference_frame]
        ref_depths = depth_values[:, reference_frame]  # [B, D]

        # "auto" resolution: the Mosaic kernel needs bf16 features, uniform
        # views, fronto-parallel hypotheses, a TPU backend, and no ambient
        # hyp-axis sharding (pallas_call does not partition over the depth
        # axis); everything else keeps the exact XLA gather
        method = self.sweep_method
        if method not in ("auto", "gather", "mosaic", "rect"):
            raise NotImplementedError(f"sweep_method: {method}")
        hyp_active = False
        if self.hyp_axis is not None:
            from jax.sharding import get_abstract_mesh
            m = get_abstract_mesh()
            hyp_active = (m is not None
                          and self.hyp_axis in getattr(m, "axis_names", ()))
        if method == "auto":
            from ..ops.mosaic_sweep import mosaic_supported
            use = (not ragged and not hyp_active and feats is not None
                   and mosaic_supported(feats.shape[2:4], feats.shape[2:4],
                                        feats.shape[-1], feats.dtype,
                                        nv=n - 1))
            method = "mosaic" if use else "gather"
        if ragged:
            method = "gather"  # fast paths assume uniform source sizes
        if method == "mosaic" and train:
            # training: Mosaic forward, gather-path VJP (custom_vjp) inside
            # the standard streaming aggregation
            from ..ops.mosaic_sweep import plane_sweep_warp_mosaic

            def warp_fn(f, sp, rp, dv, hw):
                return plane_sweep_warp_mosaic(f, sp, rp, dv, hw, False)
        else:
            warp_fn = plane_sweep_warp

        agg = self.aggregation.removeprefix("norm").lstrip("-_") or self.aggregation
        temp = (self.param("temp", nn.initializers.ones, (1,), jnp.float32)
                if agg == "softmin" else None)

        def agg_fn(ref_feat, fns, nd=None):
            if agg == "variance":
                return variance_cost_volume(ref_feat, warp_fns=fns,
                                            num_depth=nd or self.num_depth)
            elif agg == "softmin":
                return softmin_cost_volume(ref_feat, warp_fns=fns,
                                           temperature=temp)
            raise NotImplementedError(f"aggregation: {self.aggregation}")

        if (method == "rect" and not train and not ragged
                and not hyp_active):
            # rectified (H_inf-factored) sweep: each source is resampled
            # once by its infinite homography, the residual epipole sweep
            # runs in the KY=2 cheap-window kernel regime for ANY rig
            # geometry (ops/rect_sweep.py; exact-gather runtime fallback)
            from ..ops.rect_sweep import rect_cost_volume
            order = [reference_frame] + src_idx
            cost_volume = rect_cost_volume(
                [feats_l[i] for i in order],
                proj[:, jnp.array(order)], ref_depths, (fh, fw),
                agg=agg, temp=temp)
        elif method == "mosaic" and not train:
            # Mosaic lane-gather sweep, ONE span-cond around the whole
            # aggregation per batch element (KY=2 -> KY=4 -> exact gather)
            from ..ops.mosaic_sweep import cost_volume_mosaic
            cost_volume = cost_volume_mosaic(
                feats, proj, src_idx, reference_frame, ref_depths,
                (fh, fw), agg, self.num_depth, temp=temp)
        else:
            from ..ops.volumes import (depth_chunked_volume,
                                       gather_chunk_planes)
            dcg = gather_chunk_planes(self.num_depth, (fh, fw),
                                      ref_feature.shape[-1])

            def cv_slab(db):                       # db [B, dc]
                fns = [
                    (lambda i=i: warp_fn(feats_l[i], proj[:, i], ref_proj,
                                         db, (fh, fw)))
                    for i in src_idx
                ]
                return agg_fn(ref_feature, fns, db.shape[-1])

            if hyp_active or dcg >= self.num_depth:
                cost_volume = cv_slab(ref_depths)
            else:
                # eval-res gather volumes blow past HBM unchunked (the
                # [dc, H, W, 4C] per-view gather intermediate is the peak);
                # lax.map over depth slabs bounds it. Chunking is skipped
                # under hyp-axis sharding (the slab map would fight the
                # depth partitioning).
                cost_volume = depth_chunked_volume(cv_slab, ref_depths,
                                                   dcg)

        if self.hyp_axis is not None:
            from jax.sharding import PartitionSpec, get_abstract_mesh
            # constrain only when an ambient mesh carries the axis, so the
            # model still traces outside jax.set_mesh (e.g. at init)
            mesh = get_abstract_mesh()
            if mesh is not None and self.hyp_axis in getattr(
                    mesh, "axis_names", ()):
                cost_volume = jax.lax.with_sharding_constraint(
                    cost_volume, PartitionSpec(None, self.hyp_axis))

        # layout fence: the 3D-reg convs want D-in-lanes layouts, and without
        # the barrier XLA propagates that layout up through the warp fusions,
        # relayouting the two 4C gathered tensors (~2 GB/view) instead of
        # this single [B,D,H,W,C] volume
        cost_volume = jax.lax.optimization_barrier(cost_volume)
        regnet = CostRegNet(dtype=self.dtype, name="cost_regularization")
        packed = self.packed_regnet
        if packed is None:
            packed = fh * fw >= 65536      # auto: wins above ~256x256 grids
        if (packed and not train and not hyp_active
                and self.num_depth % 16 == 0):
            # eval: run the 3D UNet BLOCK-depth-packed (p=16 -> every level
            # contracts exactly 128 packed channels; see CostRegNet) — same
            # params/math, rearranged matmuls
            p, db = 16, self.num_depth // 16
            c = cost_volume.shape[-1]
            v = cost_volume.reshape(b, db, p, fh, fw, c)
            v = jnp.transpose(v, (0, 1, 3, 4, 2, 5)).reshape(
                b, db, fh, fw, p * c)
            out = regnet(v, train, packed_block=p)      # [B, Db, H, W, p]
            cost_reg = jnp.transpose(out, (0, 1, 4, 2, 3)).reshape(
                b, self.num_depth, fh, fw)
        else:
            cost_reg = regnet(cost_volume, train)[..., 0]  # [B, D, H, W]
        prob_volume = nn.softmax(cost_reg, axis=1)
        depth = depth_regression(prob_volume, ref_depths)
        # confidence is a detached diagnostic (model.py:211 no_grad block)
        confidence = photometric_confidence(jax.lax.stop_gradient(prob_volume))
        return {
            "depth": depth,
            "depth_est_list": [depth],
            "depth_pair_list": [],
            "photometric_confidence": confidence,
        }

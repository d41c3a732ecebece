"""Vis-MVSNet — 3-stage coarse-to-fine cascade with per-pair visibility-
weighted fusion.

Parity: models/VisMVSNet/ (model_cas.py, frontend.py, nn_utils.py,
homography.py). Structure:
  FeatExt: stride-2 init conv + 3-scale UNet -> 32-ch features at 1/8, 1/4,
    1/2 resolution (model_cas.py:18-35)
  per stage (SingleStage, model_cas.py:166-420): per source view a
    groupwise-correlation cost volume (8 groups) over a homography sweep,
    regularized by a small 3D UNet (`Reg`); `RegPair` scores it to a per-pair
    depth + entropy -> `UncertNet` uncertainty; volumes fused with weights
    exp(-uncert) ('soft' mode) and re-regularized (`RegFuse`) -> stage depth
    via windowed soft-argmin (window=2)
  cascade (frontend.py:26-109): stage 1 sweeps depth_nums[0] hypotheses of
    width interval*interval_scales[0] from depth_min; stages 2-3 re-center a
    per-pixel slab around the upsampled previous depth.

Faithfully reproduced quirks:
  * slab re-centering uses the MODULE's interval_scales even when the sweep
    interval is overridden by kwargs (frontend.py:76-78 uses
    self.interval_scales, not the override)
  * the train-time trainer.test override passes `scales=` which the frontend
    ignores (models/trainer.py:294 vs frontend.py:33-41) — callers here must
    pass `interval_scales=` to actually override, as the eval pipeline does
    by setting the attributes (pipeline_utils.py:142-144)
  * UncertNet adds its 1-channel input to its 8-channel features by
    broadcast (model_cas.py:96)

TPU-first: all views featurized in one batched call; channels-last; the
homography sweep uses the A - B/d decomposition (ops/plane_sweep.py).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..losses.supervised import resize_bilinear
from ..nn.blocks import ConvBnReLU, TorchConv, UNet
from ..ops.plane_sweep import homography_sweep_warp
from ..ops.volumes import entropy, groupwise_correlation, soft_argmin
from .api import register_model, view_list


class FeatExt(nn.Module):
    """Shared multi-scale feature extractor. Parity: model_cas.py:18-35."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnReLU(16, 5, 2, 2, dtype=self.dtype, name="init_conv")(x, train)
        f8, f4, f2 = UNet(enc_blocks_per_stage=2, dec_blocks_per_stage=1,
                          filters=(32, 64, 128), dtype=self.dtype,
                          name="unet")(x, train, multi_scale=3)
        out1 = TorchConv(32, 3, 1, 1, dtype=self.dtype, name="final_conv_1")(f8)
        out2 = TorchConv(32, 3, 1, 1, dtype=self.dtype, name="final_conv_2")(f4)
        out3 = TorchConv(32, 3, 1, 1, dtype=self.dtype, name="final_conv_3")(f2)
        return out1, out2, out3  # 1/8, 1/4, 1/2 resolution


def _pack_gate(x, train):
    """Depth-pack eligibility for the 8-channel vis regularizers: the
    [.., 8]-minor volumes pay 16x lane-padding IO unpacked (BASELINE.md
    layout study); D/3 dense-fill overhead caps worthwhile D at ~32."""
    d, c = x.shape[1], x.shape[-1]
    return (not train) and x.ndim == 5 and d % 2 == 0 and d * c <= 256


class Reg(nn.Module):
    """Per-pair 3D regularizer (8 -> 8 ch). Parity: model_cas.py:38-48.

    Runs depth-packed at eval for small hypothesis counts (stages 2-3):
    same parameters/math, full MXU channel tiles (nn/blocks packed_depth)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        unet = UNet(enc_blocks_per_stage=1, dec_blocks_per_stage=0,
                    filters=(8, 16), dtype=self.dtype, name="unet")
        if _pack_gate(x, train):
            b, d, h, w, c = x.shape
            xp = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, d * c)
            out = unet(xp, train, packed_depth=d)
            co = out.shape[-1] // d
            return jnp.transpose(
                out.reshape(b, h, w, d, co), (0, 3, 1, 2, 4))
        return unet(x, train)


class RegFuse(nn.Module):
    """Fused-volume regularizer + scorer. Parity: model_cas.py:62-74.
    Depth-packed at eval like `Reg`."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        unet = UNet(enc_blocks_per_stage=1, dec_blocks_per_stage=0,
                    filters=(8, 16), dtype=self.dtype, name="unet")
        final = TorchConv(1, 3, 1, 1, dtype=self.dtype, name="final_conv")
        if _pack_gate(x, train):
            b, d, h, w, c = x.shape
            xp = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, d * c)
            out = unet(xp, train, packed_depth=d)
            out = final(out, packed_depth=d)          # [B, H, W, D*1]
            return jnp.transpose(out, (0, 3, 1, 2))[..., None]
        return final(unet(x, train))


class UncertNet(nn.Module):
    """Entropy -> uncertainty head. Parity: model_cas.py:77-98."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBnReLU(8, 3, 1, 1, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBnReLU(8, 3, 1, 1, dtype=self.dtype, name="conv2")(out, train)
        out = out + x  # 1-channel input broadcasts over the 8 channels
        return TorchConv(1, 3, 1, 1, dtype=self.dtype, name="head0")(out)


def _active_axis(axis):
    """True when `axis` names an axis of the ambient abstract mesh."""
    if axis is None:
        return False
    from jax.sharding import get_abstract_mesh
    m = get_abstract_mesh()
    return m is not None and axis in getattr(m, "axis_names", ())


class SingleStage(nn.Module):
    """One cascade stage with per-pair visibility fusion.
    Parity: model_cas.py:166-420 — all 5 fusion modes
    (soft / hard / average / uwta / maxpool); 'soft' is the repo default.

    TPU-first: at eval the per-pair branch (warp -> groupwise correlation ->
    Reg -> RegPair -> UncertNet) runs STACKED over source pairs via nn.vmap
    with broadcast parameters — the pair fusion (model_cas.py:354-394) is an
    associative weighted sum, so the stacked axis shards over a mesh `view`
    axis (SPMD inserts the cross-pair psum) and the cost volumes' depth axis
    shards over `hyp` (the SURVEY long-axis parallelism). Train keeps the
    reference's sequential per-pair calls for BN batch-stat parity."""
    mode: str = "soft"
    view_axis: str | None = None
    hyp_axis: str | None = None
    # "auto" (direct Mosaic kernel when supported) | "rect" (H_inf-factored
    # sweep, ops/rect_sweep.rect_gwc_volume — cheap KY=2 windows under any
    # rig geometry, once-resampled-source approximation) | "gather"
    sweep_method: str = "auto"
    dtype: Any = jnp.float32

    def setup(self):
        self.reg = Reg(dtype=self.dtype, name="reg")
        self.reg_pair = TorchConv(1, 3, 1, 1, dtype=self.dtype,
                                  name="reg_pair")
        self.uncert_net = UncertNet(dtype=self.dtype, name="uncert_net")
        self.reg_fuse = RegFuse(dtype=self.dtype, name="reg_fuse")

    def _pair_tail(self, ref_vol, warped, depth_start, depth_interval,
                   train):
        """correlation -> reg -> score -> uncert, from a warped volume."""
        cost = groupwise_correlation(
            jnp.broadcast_to(ref_vol, warped.shape), warped, 8)
        return self._pair_tail_cost(cost, depth_start, depth_interval,
                                    train)

    def _pair_tail_cost(self, cost, depth_start, depth_interval, train):
        """reg -> score -> uncert, from a correlation cost volume (entry
        point for the fused warp+correlation kernel)."""
        if _active_axis(self.hyp_axis):
            from jax.sharding import PartitionSpec as P
            cost = jax.lax.with_sharding_constraint(
                cost, P(None, self.hyp_axis))
        interm = self.reg(cost, train)                 # [B, D, H, W, 8]
        score = self.reg_pair(interm)[..., 0]          # [B, D, H, W]
        prob, est_class = soft_argmin(score)
        est_depth = est_class * depth_interval[:, 0] + depth_start[:, 0]
        ent = entropy(prob, axis=1, keepdims=False)[:, :, :, None]
        uncert = self.uncert_net(ent, train)[..., 0]   # [B, H, W]
        return interm, est_depth, uncert

    def _pair(self, ref_vol, src_feat, K0, R0, t0, Ks, Rs, ts,
              depth_num, depth_start, depth_interval, hw, train):
        """One source pair: warp -> correlation -> reg -> score -> uncert.

        Training (sequential per-pair calls) warps through the Mosaic
        kernel's custom-VJP wrapper when eligible — kernel forward,
        exact-gather VJP — the Vis arm of the fast bf16 train recipe."""
        use_kernel = False
        if train:
            from ..ops.mosaic_sweep import vis_mosaic_supported
            use_kernel = vis_mosaic_supported(hw, src_feat.shape[1:3],
                                              src_feat.dtype)
        if use_kernel:
            from ..ops.mosaic_sweep import homography_sweep_warp_mosaic
            warped = homography_sweep_warp_mosaic(
                src_feat, K0, R0, t0, Ks, Rs, ts,
                depth_num, depth_start, depth_interval, hw)
        else:
            warped = homography_sweep_warp(
                src_feat, K0, R0, t0, Ks, Rs, ts,
                depth_num, depth_start, depth_interval, hw)
        return self._pair_tail(ref_vol, warped, depth_start,
                               depth_interval, train)

    def __call__(self, ref_feat, srcs_feat, cams, depth_num: int,
                 depth_start, depth_interval, s_scale: int,
                 train: bool = False):
        """cams: dict with K/R/t of shape [B, N, ...], view 0 = reference;
        K is at full input resolution and scaled by 1/s_scale here
        (parity: model_cas.py:177 scale_camera)."""
        from ..geometry.projective import scale_K
        K = scale_K(cams["K"], 1.0 / s_scale)
        R, t = cams["R"], cams["t"]
        b, h, w, c = ref_feat.shape
        n_src = len(srcs_feat)
        ref_vol = ref_feat[:, None]  # [B, 1, H, W, C]

        uniform = all(s.shape == srcs_feat[0].shape for s in srcs_feat)
        if not train and uniform:
            # stacked pairs: vmap with broadcast params (eval-only; BN
            # statistics are frozen so this is bit-identical math to the
            # loop, and the stacked axis is shardable over `view`)
            srcs = jnp.stack(srcs_feat, 0)             # [S, B, h, w, C]
            Ks = jnp.swapaxes(K[:, 1:], 0, 1)          # [S, B, 3, 3]
            Rs = jnp.swapaxes(R[:, 1:], 0, 1)
            ts = jnp.swapaxes(t[:, 1:], 0, 1)
            if _active_axis(self.view_axis):
                from jax.sharding import PartitionSpec as P
                srcs = jax.lax.with_sharding_constraint(
                    srcs, P(self.view_axis))

            from ..ops.mosaic_sweep import vis_mosaic_supported
            kernel_ok = (vis_mosaic_supported((h, w),
                                              srcs_feat[0].shape[1:3],
                                              ref_feat.dtype)
                         and not _active_axis(self.view_axis))
            use_rect = kernel_ok and self.sweep_method == "rect"
            use_mosaic = kernel_ok and self.sweep_method == "auto"
            if use_rect:
                # rectified sweep: one A-resample per pair, then the fused
                # warp+gwc kernel in the KY=2 cheap-window regime (exact
                # homography-gather runtime fallback inside)
                from ..ops.rect_sweep import rect_gwc_volume
                cost_s = jnp.stack([
                    rect_gwc_volume(
                        srcs_feat[i], ref_feat, K[:, 0], R[:, 0], t[:, 0],
                        K[:, i + 1], R[:, i + 1], t[:, i + 1],
                        depth_num, depth_start, depth_interval, (h, w),
                        groups=8)
                    for i in range(n_src)], 0)     # [S, B, D, h, w, 8]
                vtail = nn.vmap(
                    SingleStage._pair_tail_cost,
                    in_axes=(0, None, None, None), out_axes=0,
                    variable_axes={"params": None, "batch_stats": None},
                    split_rngs={"params": False})
                interm_s, est_s, unc_s = vtail(
                    self, cost_s, depth_start, depth_interval, train)
            elif use_mosaic:
                # Mosaic streamed warp + group-wise correlation fused in
                # ONE kernel per pair (the [D, h, w, C] warped volume never
                # touches HBM — only the C/8-smaller correlation volume),
                # then the shared tail vmapped over the stacked volumes
                from ..ops.mosaic_sweep import homography_gwc_volume_mosaic
                cost_s = jnp.stack([
                    homography_gwc_volume_mosaic(
                        srcs_feat[i], ref_feat, K[:, 0], R[:, 0], t[:, 0],
                        K[:, i + 1], R[:, i + 1], t[:, i + 1],
                        depth_num, depth_start, depth_interval, (h, w),
                        groups=8)
                    for i in range(n_src)], 0)     # [S, B, D, h, w, 8]
                vtail = nn.vmap(
                    SingleStage._pair_tail_cost,
                    in_axes=(0, None, None, None), out_axes=0,
                    variable_axes={"params": None, "batch_stats": None},
                    split_rngs={"params": False})
                interm_s, est_s, unc_s = vtail(
                    self, cost_s, depth_start, depth_interval, train)
            else:
                vpair = nn.vmap(
                    SingleStage._pair,
                    in_axes=(None, 0, None, None, None, 0, 0, 0,
                             None, None, None, None, None),
                    out_axes=0,
                    variable_axes={"params": None, "batch_stats": None},
                    split_rngs={"params": False})
                interm_s, est_s, unc_s = vpair(
                    self, ref_vol, srcs, K[:, 0], R[:, 0], t[:, 0],
                    Ks, Rs, ts, depth_num, depth_start, depth_interval,
                    (h, w), train)
            pair_results = [(est_s[i], (unc_s[i],)) for i in range(n_src)]

            if self.mode == "soft":
                # exp(-u)/sum(exp(-u)) computed as softmax(-u) with
                # max-subtraction: identical real arithmetic to the
                # reference's bare exp weighting (model_cas.py:354-360)
                # but finite for ANY finite uncertainty — a weakly-trained
                # or out-of-distribution uncert head can emit u < -88,
                # where bare exp overflows to inf and the ratio to NaN
                lw = -unc_s[:, :, None, :, :, None]
                lw = lw - jax.lax.stop_gradient(jnp.max(lw, 0, keepdims=True))
                weight = jnp.exp(lw)
                weight_sum = jnp.sum(weight, 0)
                fused = jnp.sum(interm_s * weight, 0) / weight_sum
            elif self.mode == "hard":
                weight = (unc_s < 0).astype(interm_s.dtype)[
                    :, :, None, :, :, None] + 1e-4
                fused = jnp.sum(interm_s * weight, 0) / jnp.sum(weight, 0)
            elif self.mode == "average":
                fused = jnp.mean(interm_s, 0)
            elif self.mode == "uwta":
                # sequential strict-< min keeps the EARLIEST minimum, which
                # is exactly argmin's first-occurrence tie rule
                sel = jnp.argmin(unc_s[:, :, None, :, :, None], axis=0)
                fused = jnp.take_along_axis(interm_s, sel[None], axis=0)[0]
            elif self.mode == "maxpool":
                fused = jnp.max(interm_s, 0)
            else:
                raise NotImplementedError(self.mode)
        else:
            pair_results = []
            weight_sum = jnp.zeros((b, 1, h, w, 1), ref_feat.dtype)
            fused = jnp.zeros((b, depth_num, h, w, 8), ref_feat.dtype)
            min_weight = None

            for i in range(n_src):
                interm, est_depth, uncert = self._pair(
                    ref_vol, srcs_feat[i], K[:, 0], R[:, 0], t[:, 0],
                    K[:, i + 1], R[:, i + 1], t[:, i + 1],
                    depth_num, depth_start, depth_interval, (h, w), train)
                pair_results.append((est_depth, (uncert,)))

                # per-pair volume fusion — all 5 reference modes
                # (model_cas.py:354-394); 'soft' is the default everywhere
                if self.mode == "soft":
                    weight = jnp.exp(-uncert)[:, None, :, :, None]
                    weight_sum = weight_sum + weight
                    fused = fused + interm * weight
                elif self.mode == "hard":
                    weight = (uncert < 0).astype(interm.dtype)[
                        :, None, :, :, None] + 1e-4
                    weight_sum = weight_sum + weight
                    fused = fused + interm * weight
                elif self.mode == "average":
                    fused = fused + interm
                elif self.mode == "uwta":
                    weight = uncert[:, None, :, :, None]
                    if min_weight is None:
                        min_weight = weight
                        mask = jnp.ones_like(weight)
                    else:
                        mask = (weight < min_weight).astype(interm.dtype)
                        min_weight = weight * mask + min_weight * (1 - mask)
                    fused = interm * mask + fused * (1 - mask)
                elif self.mode == "maxpool":
                    fused = interm if i == 0 else jnp.maximum(fused, interm)
                else:
                    raise NotImplementedError(self.mode)

            if self.mode in ("soft", "hard"):
                fused = fused / weight_sum
            elif self.mode == "average":
                fused = fused / n_src

        if _active_axis(self.hyp_axis):
            from jax.sharding import PartitionSpec as P
            fused = jax.lax.with_sharding_constraint(
                fused, P(None, self.hyp_axis))
        score = self.reg_fuse(fused, train)[..., 0]
        prob, est_class, prob_map = soft_argmin(score, window=2)
        est_depth = est_class * depth_interval[:, 0] + depth_start[:, 0]
        return est_depth, prob_map, pair_results


@register_model("vis_mvsnet")
class VisMVSNet(nn.Module):
    """Vis-MVSNet frontend with the uniform model contract.
    Parity: frontend.py:26-109 (+ eval attribute overrides,
    pipeline_utils.py:142-144 expressed as constructor fields)."""
    depth_nums: Sequence[int] = (32, 16, 8)
    interval_scales: Sequence[float] = (4.0, 2.0, 1.0)
    mode: str = "soft"
    # per-view featurization at train (frontend.py:59-62 calls feat_ext per
    # view -> per-view BN stats); batched_bn featurizes all views at once
    batched_bn: bool = False
    # mesh axes for eval sharding: source pairs over `view_axis` (the
    # stacked per-pair branch; fusion is an associative weighted sum) and
    # cost-volume depth slabs over `hyp_axis` (see SingleStage)
    view_axis: str | None = None
    hyp_axis: str | None = None
    sweep_method: str = "auto"   # see SingleStage.sweep_method
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, imgs, K, R, t, depth_min, depth_max,
                 reference_frame: int = 0, train: bool = False, **kwargs):
        depth_nums = tuple(kwargs.get("depth_nums", self.depth_nums))
        interval_scales = tuple(kwargs.get("interval_scales",
                                           self.interval_scales))
        views, ragged = view_list(imgs)
        n = len(views)
        b = views[0].shape[0]
        ref = reference_frame
        order = [ref] + [i for i in range(n) if i != ref]
        # depth interval over 128 steps of the REference view (frontend.py:27)
        depth_interval = ((depth_max - depth_min) / 128.0)[:, ref]
        d_start0 = depth_min[:, ref].reshape(b, 1, 1, 1)
        d_interval = depth_interval.reshape(b, 1, 1, 1)

        fext = FeatExt(dtype=self.dtype, name="feat_ext")
        if ragged:
            # heterogeneous view sizes: featurize per view (the reference's
            # own structure, frontend.py:59-62); each shape stays static
            per_view = [fext(views[i], train) for i in order]
            feats = [[per_view[i][lvl] for i in range(n)]
                     for lvl in range(3)]
        elif self.batched_bn or not train:
            h, w, c = views[0].shape[1:]
            stacked = imgs if not isinstance(imgs, (list, tuple)) \
                else jnp.stack(views, axis=1)
            packs = fext(stacked.reshape(b * n, h, w, c), train)
            feats = [[f.reshape((b, n) + f.shape[1:])[:, i] for i in order]
                     for f in packs]
        else:
            per_view = [fext(views[i], train) for i in order]
            feats = [[per_view[i][lvl] for i in range(n)]
                     for lvl in range(3)]
        cams = {"K": K[:, jnp.array(order)], "R": R[:, jnp.array(order)],
                "t": t[:, jnp.array(order)]}

        def stage_feats(level):
            f = feats[level]
            return f[0], f[1:]

        # ---- stage 1 (1/8) ----
        ref1, srcs1 = stage_feats(0)
        est1, prob1, pairs1 = SingleStage(mode=self.mode, view_axis=self.view_axis,
                                          hyp_axis=self.hyp_axis,
                                          sweep_method=self.sweep_method,
                                          dtype=self.dtype, name="stage1")(
            ref1, srcs1, cams, depth_nums[0], d_start0,
            d_interval * interval_scales[0], 8, train)
        prob1_up = resize_bilinear(prob1, (prob1.shape[1] * 4,
                                           prob1.shape[2] * 4))

        # ---- stage 2 (1/4) ----
        ref2, srcs2 = stage_feats(1)
        up1 = resize_bilinear(jax.lax.stop_gradient(est1), ref2.shape[1:3])
        # NOTE: centering uses self.interval_scales (frontend.py:76-78 quirk)
        d_start2 = (up1 - depth_nums[1] * depth_interval[:, None, None]
                    * self.interval_scales[1] / 2.0)[:, None]  # [B,1,H,W]
        est2, prob2, pairs2 = SingleStage(mode=self.mode, view_axis=self.view_axis,
                                          hyp_axis=self.hyp_axis,
                                          sweep_method=self.sweep_method,
                                          dtype=self.dtype, name="stage2")(
            ref2, srcs2, cams, depth_nums[1], d_start2,
            d_interval * interval_scales[1], 4, train)
        prob2_up = resize_bilinear(prob2, (prob2.shape[1] * 2,
                                           prob2.shape[2] * 2))

        # ---- stage 3 (1/2) ----
        ref3, srcs3 = stage_feats(2)
        up2 = resize_bilinear(jax.lax.stop_gradient(est2), ref3.shape[1:3])
        d_start3 = (up2 - depth_nums[2] * depth_interval[:, None, None]
                    * self.interval_scales[2] / 2.0)[:, None]
        est3, prob3, pairs3 = SingleStage(mode=self.mode, view_axis=self.view_axis,
                                          hyp_axis=self.hyp_axis,
                                          sweep_method=self.sweep_method,
                                          dtype=self.dtype, name="stage3")(
            ref3, srcs3, cams, depth_nums[2], d_start3,
            d_interval * interval_scales[2], 2, train)

        return {
            "depth": est3,
            # finest-first (frontend.py:100-102)
            "depth_est_list": [est3, est2, est1],
            "depth_pair_list": [pairs3, pairs2, pairs1],
            "photometric_confidence": jnp.stack([prob1_up, prob2_up, prob3],
                                                axis=1),
        }

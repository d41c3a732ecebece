"""CVP-MVSNet — coarse-to-fine cost-volume pyramid over an IMAGE pyramid.

Parity: models/CVP_MVSNet/ (models/net.py, models/modules.py, frontend.py).
Structure:
  FeaturePyramid: one shared 9-conv LeakyReLU(0.1) extractor (16 ch, full
    res) run on each level of a bilinear 0.5x image pyramid (net.py:21-47)
  coarsest level: full plane sweep, 48 hypotheses at train / 96 at eval,
    interval (max-min)/D (net.py:126-127, modules.py:53-71), variance
    aggregation, one shared CostRegNet (16/32/64 3D enc-dec, net.py:50-85)
  each finer level: 2x bicubic-upsampled depth +- 4 hypotheses; interval
    halved per level at train (net.py:177-182); per-pixel epipolar
    1-px interval (calDepthHypo, modules.py:131-226) at eval — the
    reference computes it in float64 on GPU; here it runs in float32 with
    the same degenerate-point guards and the (repo-modified) median
    reduction, which is robust to the precision difference
  photometric confidence at the finest level (net.py:213-219).

TPU-first: channels-last; all views at one pyramid level featurized in one
batched conv call; the per-pixel-hypothesis warp reuses ops/plane_sweep
(depth maps [B, D, H, W] are first-class there).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..geometry.projective import scale_K
from ..nn.blocks import ConvBnReLU, ConvTransposeBnReLU, TorchConv
from ..ops.plane_sweep import plane_sweep_warp
from ..ops.select import masked_median
from ..ops.volumes import depth_regression, photometric_confidence
from .api import register_model, view_list


def _bilinear_half(x: jnp.ndarray) -> jnp.ndarray:
    """0.5x bilinear downsample (torch interpolate scale_factor=0.5,
    align_corners=None semantics == half-pixel centers)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h // 2, w // 2, c), method="linear",
                            antialias=False)


def _bicubic_double(x: jnp.ndarray) -> jnp.ndarray:
    """2x bicubic upsample of [B, H, W] (net.py:169-171)."""
    b, h, w = x.shape
    return jax.image.resize(x[..., None], (b, 2 * h, 2 * w, 1),
                            method="cubic", antialias=False)[..., 0]


class FeaturePyramidNet(nn.Module):
    """Shared per-level feature extractor. Parity: net.py:21-47 (convs have
    bias + LeakyReLU 0.1, modules.py:24-28).

    The 32/16-channel tail runs space-to-depth packed (2x2 blocks ->
    128/64-channel convs, nn/blocks.py _pack_kernel_s2d): full-resolution
    low-channel activations are padding-IO-bound under TPU lane tiling.
    No BN here, so the transform is exact at train time too (leaky-relu is
    elementwise; bias tiles per subpixel)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..nn.blocks import depth_to_space, space_to_depth
        chans = [64, 64, 64, 32, 32, 32, 16, 16, 16]
        names = ["conv0aa", "conv0ba", "conv0bb", "conv0bc", "conv0bd",
                 "conv0be", "conv0bf", "conv0bg", "conv0bh"]
        h, w = x.shape[1:3]
        pack_from = 4 if (h % 2 == 0 and w % 2 == 0) else len(names)
        packed = False
        for i, (ch, name) in enumerate(zip(chans, names)):
            if i == pack_from:
                x = space_to_depth(x, 2)
                packed = True
            conv = TorchConv(ch, 3, 1, 1, use_bias=True, dtype=self.dtype,
                             name=name)
            x = conv(x, packed_s2d=(2, 2)) if packed else conv(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
        if packed:
            x = depth_to_space(x, 2)
        return x


class CVPCostRegNet(nn.Module):
    """Shared 3D regularizer. Parity: net.py:50-85 (single stride-2 level,
    stride-1 transposed conv back up).

    At eval with few hypotheses (the refinement levels: D=8, C=16), the
    volume runs DEPTH-PACKED: depth folded into channels ([B, H, W, D*C])
    and every 3x3x3 conv executed as one dense 3x3 conv2d with a
    block-banded kernel (nn/blocks.py TorchConv.packed_depth). Same math
    and parameters; the MXU sees 128/256-channel matmuls instead of the
    16-channel ones that measured ~3% utilization — the dominant CVP eval
    cost (61 ms at 512x640, BASELINE.md round 2).

    `train_packing=True` extends the packed paths to TRAIN time (the bf16
    fast-train recipe): the packed BN view ([..., D, C], nn/blocks.py
    BatchNorm) already computes batch statistics and running-stat updates
    per C over (B, H, W, D) — identical to the unpacked conv3d BN — and
    the packed kernels are built from the SAME parameters by differentiable
    scatters, so gradients flow to the identical parameter set."""
    dtype: Any = jnp.float32
    train_packing: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, packing: str = "auto"):
        b, d, h, w, c = x.shape
        pack_ok = (not train) or self.train_packing
        packed = (packing == "auto" and pack_ok
                  and d % 2 == 0 and d * c <= 256)
        # larger hypothesis counts (the coarse full sweep: D=96, C=16) use
        # the BLOCK-depth-packed path instead (nn/blocks packed_block):
        # p=8 blocks keep every level at 128 packed channels with a
        # halo-plane concat for the cross-block taps (packing="off" forces
        # the unpacked conv3d stack — testing/debug)
        blocked = (packing == "auto" and pack_ok
                   and not packed and d % 8 == 0)
        pb1 = pb2 = None
        if packed:
            x = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, d * c)
            pd1, pd2 = d, d // 2
        elif blocked:
            pb1, pb2 = 8, 4
            x = jnp.transpose(x.reshape(b, d // 8, 8, h, w, c),
                              (0, 1, 3, 4, 2, 5)).reshape(
                b, d // 8, h, w, 8 * c)
            pd1 = pd2 = None
        else:
            pd1 = pd2 = None
        c0 = ConvBnReLU(16, dtype=self.dtype, name="conv0")(
            x, train, packed_depth=pd1, packed_block=pb1)
        c0 = ConvBnReLU(16, dtype=self.dtype, name="conv0a")(
            c0, train, packed_depth=pd1, packed_block=pb1)
        x1 = ConvBnReLU(32, strides=2, dtype=self.dtype, name="conv1")(
            c0, train, packed_depth=pd1, packed_block=pb1)
        x1 = ConvBnReLU(32, dtype=self.dtype, name="conv2")(
            x1, train, packed_depth=pd2, packed_block=pb2)
        c2 = ConvBnReLU(32, dtype=self.dtype, name="conv2a")(
            x1, train, packed_depth=pd2, packed_block=pb2)
        x2 = ConvBnReLU(64, dtype=self.dtype, name="conv3")(
            c2, train, packed_depth=pd2, packed_block=pb2)
        x2 = ConvBnReLU(64, dtype=self.dtype, name="conv4")(
            x2, train, packed_depth=pd2, packed_block=pb2)
        c4 = ConvBnReLU(64, dtype=self.dtype, name="conv4a")(
            x2, train, packed_depth=pd2, packed_block=pb2)
        c5 = c2 + ConvTransposeBnReLU(32, 3, 1, 1, 0, dtype=self.dtype,
                                      name="conv5")(c4, train,
                                                    packed_depth=pd2,
                                                    packed_block=pb2)
        c6 = c0 + ConvTransposeBnReLU(16, 3, 2, 1, 1, dtype=self.dtype,
                                      name="conv6")(c5, train,
                                                    packed_depth=pd2,
                                                    packed_block=pb2)
        out = TorchConv(1, 3, 1, 1, use_bias=True, dtype=self.dtype,
                        name="prob0")(c6, packed_depth=pd1, packed_block=pb1)
        if packed:
            return jnp.transpose(out, (0, 3, 1, 2))       # [B, D, H, W]
        if blocked:
            return jnp.transpose(out, (0, 1, 4, 2, 3)).reshape(b, d, h, w)
        return out[..., 0]


def cal_depth_hypo(ref_depth, K_ref, K_src, R_ref, t_ref, R_src, t_src,
                   depth_min, depth_max, d: int = 4,
                   pixel_interval: float = 1.0):
    """Per-level eval-time hypothesis maps: the depth change that moves the
    first source view's projection by one pixel along the epipolar line,
    median-reduced to a scalar per batch item.

    Parity: modules.py:131-226 (incl. the repo's degenerate-point guard and
    median reduction); computed in f32 instead of f64 — the median over all
    pixels absorbs the precision difference.

    Args:
      ref_depth: [B, H, W] upsampled previous-level depth.
      K_ref/K_src: [B, 3, 3] level-scaled intrinsics (src = first source).
      R_*, t_*: [B, 3, 3] / [B, 3, 1].
    Returns:
      [B, 2d, H, W] hypothesis maps.
    """
    b, h, w = ref_depth.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=ref_depth.dtype),
                          jnp.arange(w, dtype=ref_depth.dtype), indexing="ij")
    X = jnp.stack([xs, ys, jnp.ones_like(xs)], -1)  # [H, W, 3]

    def one(depth_b, K_r, K_s, R_r, t_r, R_s, t_s, dmin, dmax):
        Kr_inv = jnp.linalg.inv(K_r)
        D1 = depth_b
        D2 = D1 + 1.0
        ray = X @ Kr_inv.T                     # [H, W, 3]
        # world = R_r^T (cam - t_r); then into the src camera
        cam1 = ray * D1[..., None]
        cam2 = ray * D2[..., None]
        w1 = (cam1 - t_r[:, 0]) @ R_r                  # == R_r^T @ (cam - t)
        w2 = (cam2 - t_r[:, 0]) @ R_r
        # into src camera
        s1 = w1 @ R_s.T + t_s[:, 0]
        s2 = w2 @ R_s.T + t_s[:, 0]
        X1 = s1 @ K_s.T
        X2 = s2 @ K_s.T
        X1_d = X1[..., 2]
        X2_d = X2[..., 2]
        X1n = X1 / X1_d[..., None]
        X2n = X2 / X2_d[..., None]
        dir_vec = X2n - X1n
        norm_dir = jnp.linalg.norm(dir_vec, axis=-1)
        dir_unit = dir_vec / jnp.maximum(norm_dir, 1e-8)[..., None]
        X3 = X1n + pixel_interval * dir_unit

        A = K_r @ R_r @ jnp.linalg.inv(K_s @ R_s)
        tmp1 = X1_d[..., None] * (X1n @ A.T)          # [H, W, 3]
        tmp2 = X3 @ A.T                                # [H, W, 3]
        # 2x2 system on rows 1: [X[1:], tmp2[1:]] delta = tmp1[1:]
        M1 = jnp.stack([X[..., 1:], tmp2[..., 1:]], axis=-1)  # [H, W, 2, 2]
        M2 = tmp1[..., 1:]                             # [H, W, 2]
        det = (M1[..., 0, 0] * M1[..., 1, 1] - M1[..., 0, 1] * M1[..., 1, 0])
        valid = ((norm_dir > 1e-8) & (X1_d > 1e-8) & (X2_d > 1e-8)
                 & (jnp.abs(det) > 1e-8))
        safe_det = jnp.where(jnp.abs(det) > 1e-8, det, 1.0)
        # Cramer for the first unknown
        delta_d = (M2[..., 0] * M1[..., 1, 1] - M1[..., 0, 1] * M2[..., 1]) \
            / safe_det
        abs_dd = jnp.abs(delta_d)
        # median over valid pixels (torch.median rank (nvalid-1)//2,
        # modules.py:216) — exact order statistic via bit-pattern bisection
        # (ops/select.py) instead of an O(n log^2 n) TPU sort.  NaN entries
        # are invalid under masked_median's contract, so exclude them from
        # the guard count too: all-NaN-valid must take the fallback interval.
        nvalid = jnp.sum(valid & ~jnp.isnan(abs_dd))
        med = jnp.where(
            nvalid > 0,
            masked_median(abs_dd, valid),
            (dmax - dmin) / 128.0).astype(depth_b.dtype)
        levels = jnp.arange(-d, d, dtype=depth_b.dtype).reshape(2 * d, 1, 1)
        return depth_b[None] + levels * med

    return jax.vmap(one)(ref_depth, K_ref, K_src, R_ref, t_ref, R_src, t_src,
                         depth_min, depth_max)


@register_model("cvp_mvsnet")
class CVPMVSNet(nn.Module):
    """CVP-MVSNet frontend with the uniform model contract.
    Parity: frontend.py:10-38 + net.py:88-229."""
    nscale: int = 2            # train default (net.py:94); eval 4/5
    batched_bn: bool = False   # (no BN in CVP's extractor; kept for symmetry)
    # mesh axis to shard the coarse full sweep's depth-hypothesis dimension
    # over (same slab sharding as MVSNet — the variance aggregation is
    # associative over depth and the coarse level carries 96 hypotheses at
    # eval). The refinement levels (8 per-pixel hypotheses) stay unsharded.
    # Requires an ambient mesh (jax.set_mesh) carrying the axis.
    hyp_axis: str | None = None
    # "auto" (direct Mosaic kernel when supported) | "rect" (H_inf-factored
    # sweep, ops/rect_sweep.rect_cost_volume — cheap KY=2 windows under any
    # rig geometry, once-resampled-source approximation) | "gather"
    sweep_method: str = "auto"
    # per-LEVEL rematerialization at train (jax.checkpoint around each
    # pyramid level's extractor/cost-volume/regularizer): peak activation
    # memory = the largest level instead of the sum over levels — what
    # makes the f32 full-pyramid train graph fit 16 GB HBM (the torch
    # analogue would be checkpoint_sequential over net.py:96-229's level
    # loop, which the reference does not use)
    remat_levels: bool = False
    # run the packed 3D regularizer at train too (see CVPCostRegNet)
    packed_training: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, imgs, K, R, t, depth_min, depth_max,
                 reference_frame: int = 0, train: bool = False, **kwargs):
        nscale = int(kwargs.get("nscale", self.nscale))
        views, ragged = view_list(imgs)
        n = len(views)
        b = views[0].shape[0]
        dtype = views[0].dtype
        ref = reference_frame
        order = [ref] + [i for i in range(n) if i != ref]
        nsrc = n - 1
        h, w = views[ref].shape[1:3]
        c = views[ref].shape[-1]
        dmin = depth_min[:, ref]
        dmax = depth_max[:, ref]

        remat = self.remat_levels and train
        fp_cls = nn.remat(FeaturePyramidNet) if remat else FeaturePyramidNet
        # static_argnums: (self, x, train, packing) — 2 and 3 are Python
        reg_cls = (nn.remat(CVPCostRegNet, static_argnums=(2, 3)) if remat
                   else CVPCostRegNet)
        fp_net = fp_cls(dtype=self.dtype, name="feature_pyramid")
        reg_net = reg_cls(dtype=self.dtype, name="cost_reg_refine",
                          train_packing=self.packed_training)

        # image pyramid + per-level features; feats[level][i] is the ordered
        # view i's [B, fh_i, fw_i, C] features (ref first)
        if ragged:
            # heterogeneous view sizes: one pyramid per view (each level a
            # static shape), like the reference's per-view calls (net.py)
            pyr = []
            for i in order:
                lv = [views[i]]
                for _ in range(nscale - 1):
                    lv.append(_bilinear_half(lv[-1]))
                pyr.append(lv)
            feats = [[fp_net(pyr[vi][lvl]) for vi in range(n)]
                     for lvl in range(nscale)]
            level_ratio = [
                [pyr[vi][lvl].shape[1] / pyr[vi][0].shape[1]
                 for vi in range(n)] for lvl in range(nscale)]
        else:
            stacked = imgs if not isinstance(imgs, (list, tuple)) \
                else jnp.stack(views, axis=1)
            level_imgs = [stacked.reshape(b * n, h, w, c)]
            for _ in range(nscale - 1):
                level_imgs.append(_bilinear_half(level_imgs[-1]))
            feats = []
            for li in level_imgs:
                f = fp_net(li)
                fh, fw = f.shape[1:3]
                f = f.reshape(b, n, fh, fw, -1)[:, jnp.array(order)]
                feats.append([f[:, i] for i in range(n)])
            level_ratio = [[li.shape[1] / h] * n for li in level_imgs]

        Ko = K[:, jnp.array(order)]
        Ro = R[:, jnp.array(order)]
        to = t[:, jnp.array(order)]

        def level_K(level):
            # per-view intrinsics at this pyramid level (conditionIntrinsics
            # semantics, modules.py:31-46); ratios differ per view only when
            # ragged
            return jnp.stack([scale_K(Ko[:, i], level_ratio[level][i])
                              for i in range(n)], axis=1)

        def level_proj(level):
            from ..geometry.projective import build_proj_matrices
            return build_proj_matrices(level_K(level), Ro, to)  # [B,N,4,4]

        from ..ops.volumes import variance_cost_volume

        hyp_active = False
        if self.hyp_axis is not None:
            from jax.sharding import get_abstract_mesh
            m = get_abstract_mesh()
            hyp_active = (m is not None
                          and self.hyp_axis in getattr(m, "axis_names", ()))

        def level_cost(flevel, proj, hyp, fh, fw, sharded=False):
            """Variance cost volume for one pyramid level: the Mosaic
            streamed kernel (ops/mosaic_sweep.py, ~3.5-5x the gather at
            eval sizes, runtime exact-fallback cond) when eligible, else
            the exact XLA gather.  Only the slab-sharded call (the coarse
            full sweep under hyp_axis) must skip the kernel — pallas_call
            does not partition over the depth axis; the unsharded
            refinement levels keep the fast path regardless."""
            if not train and not ragged and not sharded:
                from ..ops.mosaic_sweep import (mosaic_px_supported,
                                                variance_volume_mosaic_px)
                if (self.sweep_method == "rect"
                        and mosaic_px_supported((fh, fw),
                                                flevel[0].dtype)):
                    # rectified sweep for both the uniform coarse sweep and
                    # the per-pixel refinement maps (exact-gather runtime
                    # fallback inside)
                    from ..ops.rect_sweep import rect_cost_volume
                    return rect_cost_volume(flevel, proj, hyp, (fh, fw))
                if (self.sweep_method == "auto"
                        and mosaic_px_supported((fh, fw),
                                                flevel[0].dtype)):
                    return variance_volume_mosaic_px(flevel, proj, hyp,
                                                     (fh, fw))
            warp = plane_sweep_warp
            if train and not ragged and not sharded:
                # bf16 training: Mosaic kernel forward, exact-gather VJP
                # (uniform coarse sweep AND per-pixel refinement maps)
                from ..ops.mosaic_sweep import (mosaic_px_supported,
                                                plane_sweep_warp_mosaic)
                if mosaic_px_supported((fh, fw), flevel[0].dtype):
                    def warp(f, sp, rp, dv, hw):
                        return plane_sweep_warp_mosaic(f, sp, rp, dv, hw,
                                                       False)
            warp_fns = [
                (lambda i=i: warp(flevel[i], proj[:, i],
                                  proj[:, 0], hyp, (fh, fw)))
                for i in range(1, n)
            ]
            return variance_cost_volume(flevel[0], warp_fns=warp_fns,
                                        num_depth=hyp.shape[1])

        if remat:
            # free each level's warp/aggregation intermediates after the
            # forward; the backward recomputes them level by level
            _lc = level_cost

            def level_cost(flevel, proj, hyp, fh, fw, sharded=False):
                return jax.checkpoint(
                    lambda fl, pr, hy: _lc(fl, pr, hy, fh, fw, sharded)
                )(list(flevel), proj, hyp)

        # ---- coarsest level: full sweep ----
        nhyp = 48 if train else 96
        interval = (dmax - dmin) / nhyp  # (max-min)/D (modules.py:58)
        steps = jnp.arange(nhyp, dtype=dtype)
        depth_hypos = dmin[:, None] + steps * interval[:, None]  # [B, D]

        proj = level_proj(nscale - 1)
        fcoarse = feats[nscale - 1]
        fh, fw = fcoarse[0].shape[1:3]
        cost = level_cost(fcoarse, proj, depth_hypos, fh, fw,
                          sharded=hyp_active)
        if hyp_active:
            from jax.sharding import PartitionSpec
            # slab-shard the coarse sweep: warp + Σ/Σ² partition over depth,
            # SPMD inserts the softmax/regression collectives
            cost = jax.lax.with_sharding_constraint(
                cost, PartitionSpec(None, self.hyp_axis))
        # keep the 3D-reg convs' D-in-lanes layout from propagating into the
        # warp gather (same measured win as mvsnet.py:204)
        cost = jax.lax.optimization_barrier(cost)
        prob = nn.softmax(reg_net(cost, train, "auto"), axis=1)
        depth = depth_regression(prob, depth_hypos)
        depth_est_list = [depth]

        # ---- refinement levels ----
        for id_level, level in enumerate(range(nscale - 2, -1, -1)):
            depth_up = _bicubic_double(depth)
            flevel = feats[level]
            fh, fw = flevel[0].shape[1:3]
            if train:
                # fixed halved intervals (net.py:177-182)
                isz = ((dmax - dmin) / 48.0 / (2.0 ** (id_level + 1)))
                offs = jnp.arange(-4, 4, dtype=dtype).reshape(1, 8, 1, 1)
                hyp = depth_up[:, None] + offs * isz[:, None, None, None]
            else:
                Ks = level_K(level)
                hyp = cal_depth_hypo(depth_up, Ks[:, 0], Ks[:, 1],
                                     Ro[:, 0], to[:, 0], Ro[:, 1], to[:, 1],
                                     dmin, dmax)
            proj = level_proj(level)
            cost = level_cost(flevel, proj, hyp, fh, fw)
            cost = jax.lax.optimization_barrier(cost)
            prob = nn.softmax(reg_net(cost, train, "auto"), axis=1)
            depth = depth_regression(prob, hyp)
            depth_est_list.append(depth)

        confidence = photometric_confidence(jax.lax.stop_gradient(prob))
        depth_est_list.reverse()  # finest first (net.py:225)
        return {
            "depth": depth_est_list[0],
            "depth_est_list": depth_est_list,
            "depth_pair_list": [],
            "photometric_confidence": confidence,
        }

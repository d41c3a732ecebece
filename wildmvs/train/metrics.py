"""Depth-quality metrics in interval units.

Parity: models/utils.py:122-171 (per-image averaging over the batch) and the
normalization protocol of models/trainer.py:311-314 / depthmap_eval.py:133-143:
both estimate and GT are divided by (depth_max - depth_min)/128 before EPE and
the >1px / >3px error rates.
"""
from __future__ import annotations

import jax.numpy as jnp


def _per_image_masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over masked pixels per image, then mean over the batch.
    Parity: models/utils.py:122-133 (compute_metrics_for_each_image) — an
    image with an EMPTY mask yields NaN, exactly like the reference's
    `values[mask].mean()` over an empty selection, so a degenerate eval
    sample is visible instead of silently deflating the averages."""
    m = mask.astype(values.dtype)
    msum = jnp.sum(m, axis=(1, 2))
    per_img = jnp.where(msum > 0,
                        jnp.sum(values * m, axis=(1, 2))
                        / jnp.maximum(msum, 1.0),
                        jnp.nan)
    return jnp.mean(per_img)


def abs_depth_error(depth_est: jnp.ndarray, depth_gt: jnp.ndarray,
                    mask: jnp.ndarray) -> jnp.ndarray:
    """EPE: mean |est - gt| over the mask. Parity: models/utils.py:155-159."""
    return _per_image_masked_mean(jnp.abs(depth_est - depth_gt), mask)


def threshold_error_rate(depth_est: jnp.ndarray, depth_gt: jnp.ndarray,
                         mask: jnp.ndarray, thres: float) -> jnp.ndarray:
    """Fraction of masked pixels with |err| > thres.
    Parity: models/utils.py:136-143."""
    err = (jnp.abs(depth_est - depth_gt) > thres).astype(depth_est.dtype)
    return _per_image_masked_mean(err, mask)


def depth_metrics(depth_est: jnp.ndarray, depth_gt: jnp.ndarray,
                  mask: jnp.ndarray, depth_min: jnp.ndarray,
                  depth_max: jnp.ndarray) -> dict:
    """EPE / 1px / 3px in units of (max-min)/128 on the full-res GT grid.

    Args:
      depth_est: [B, H, W] upsampled to the GT resolution.
      depth_gt, mask: [B, H, W].
      depth_min, depth_max: [B] reference-view depth range.
    """
    step = (depth_max - depth_min) / 128.0
    est = depth_est / step[:, None, None]
    gt = depth_gt / step[:, None, None]
    m = mask > 0.5
    return {
        "EPE": abs_depth_error(est, gt, m),
        "1pxError": threshold_error_rate(est, gt, m, 1.0),
        "3pxError": threshold_error_rate(est, gt, m, 3.0),
    }

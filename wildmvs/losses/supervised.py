"""Supervised depth losses + GT pyramid helpers.

Parity: models/trainer.py:114-198 and models/utils.py:110-119.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize, half-pixel centers (torch align_corners=False).

    Works on [B, H, W] or [B, H, W, C].
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    out = jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                           method="linear", antialias=False)
    return out[..., 0] if squeeze else out


def downsample_gt(gt: jnp.ndarray, mask: jnp.ndarray, hw: tuple[int, int]):
    """Downsample GT depth bilinearly; downsample the mask and keep only
    EXACT 1.0 (all four bilinear neighbours valid).

    Parity: models/trainer.py:130-132.

    Args:
      gt, mask: [B, H, W].
    Returns:
      (gt_down [B, h, w], mask_down [B, h, w] float in {0,1}).
    """
    gt_d = resize_bilinear(gt, hw)
    mask_d = (resize_bilinear(mask.astype(gt.dtype), hw) == 1.0).astype(gt.dtype)
    return gt_d, mask_d


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """sum(v*m)/sum(m), returning 0 (with graph) for an empty mask — the ONE
    masked-mean every loss routes through (parity: models/trainer.py:170-174,
    models/utils.py:110-119's empty-mask guard)."""
    msum = jnp.sum(mask)
    total = jnp.sum(values * mask)
    return jnp.where(msum > 0, total / jnp.maximum(msum, 1.0), total)


def masked_l1_interval(depth_est: jnp.ndarray, gt: jnp.ndarray,
                       mask: jnp.ndarray, depth_interval: jnp.ndarray):
    """Masked mean L1 in units of depth_interval = (max-min)/128.

    Parity: models/trainer.py:165-167.

    Args:
      depth_est, gt, mask: [B, h, w].
      depth_interval: [B] per-sample interval.
    Returns: scalar loss.
    """
    l1 = jnp.abs(depth_est - gt) / depth_interval[:, None, None]
    return masked_mean(l1, mask)


def bayesian_loss(l: jnp.ndarray, uncertainty: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    """Bayesian pair loss: mean over mask of (l*e^{-u} + u) plus plain mean l.

    Parity: models/utils.py:110-119 (`bayesian_version_loss`): returns 0 but
    keeps the graph when the mask is empty.
    """
    return masked_mean(l * jnp.exp(-uncertainty) + uncertainty + l, mask)

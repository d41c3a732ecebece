"""DSSIM map for the unsupervised photometric loss.

Parity: utils/ssimLoss.py — 11x11 gaussian window (sigma 1.5), depthwise
convolution with symmetric padding window//2, constants C1=0.01^2, C2=0.03^2,
returns 1 - SSIM per pixel per channel.  Channels-last.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2.0 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


def _depthwise_blur(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] depthwise conv with the gaussian window, pad k//2."""
    c = x.shape[-1]
    k = window.shape[0]
    kern = jnp.broadcast_to(window[:, :, None, None], (k, k, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kern.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=[(k // 2, k // 2)] * 2,
        dimension_numbers=dn, feature_group_count=c)


def dssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
          sigma: float = 1.5) -> jnp.ndarray:
    """1 - SSIM(img1, img2), elementwise.

    Args:
      img1, img2: [B, H, W, C].
    Returns:
      [B, H, W, C] DSSIM map.
    """
    window = jnp.asarray(_gaussian_window(window_size, sigma))
    mu1 = _depthwise_blur(img1, window)
    mu2 = _depthwise_blur(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_blur(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_blur(img1 * img2, window) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return 1.0 - ssim

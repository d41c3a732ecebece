"""Loss-stack tests: SSIM vs a torch oracle, photometric loss behavior,
supervised L1, bayesian loss edge cases, resize parity, metrics."""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from wildmvs.losses.ssim import dssim
from wildmvs.losses.photometric import (photometric_loss,
                                        masked_photometric_loss, masked_mean)
from wildmvs.losses.supervised import (resize_bilinear, downsample_gt,
                                       masked_l1_interval, bayesian_loss)
from wildmvs.train.metrics import depth_metrics
from wildmvs.geometry.projective import build_proj_matrices


def _torch_dssim(a, b, window_size=11, sigma=1.5):
    """Independent torch oracle of the standard SSIM (Wang et al. 2004)."""
    g = torch.exp(-((torch.arange(window_size).float() - window_size // 2) ** 2)
                  / (2 * sigma ** 2))
    g = g / g.sum()
    win = (g[:, None] @ g[None, :])[None, None].repeat(a.shape[1], 1, 1, 1)
    pad = window_size // 2
    conv = lambda x: F.conv2d(x, win, padding=pad, groups=a.shape[1])
    mu1, mu2 = conv(a), conv(b)
    s1 = conv(a * a) - mu1 ** 2
    s2 = conv(b * b) - mu2 ** 2
    s12 = conv(a * b) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
    return 1 - ssim


def test_dssim_matches_torch(rng):
    a = rng.random((2, 16, 20, 3)).astype(np.float32)
    b = rng.random((2, 16, 20, 3)).astype(np.float32)
    ours = np.asarray(dssim(jnp.array(a), jnp.array(b)))
    theirs = _torch_dssim(torch.from_numpy(a).permute(0, 3, 1, 2),
                          torch.from_numpy(b).permute(0, 3, 1, 2))
    np.testing.assert_allclose(ours, theirs.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_dssim_identical_images_zero(rng):
    a = rng.random((1, 12, 12, 3)).astype(np.float32)
    out = np.asarray(dssim(jnp.array(a), jnp.array(a)))
    np.testing.assert_allclose(out, 0.0, atol=1e-5)


def test_resize_matches_torch_align_false(rng):
    x = rng.random((2, 8, 10)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.array(x), (15, 7)))
    theirs = F.interpolate(torch.from_numpy(x)[:, None], size=(15, 7),
                           mode="bilinear", align_corners=False)[:, 0].numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_downsample_gt_exact_mask(rng):
    gt = rng.random((1, 8, 8)).astype(np.float32) + 1
    mask = np.ones((1, 8, 8), np.float32)
    mask[0, :4] = 0.0
    _, md = downsample_gt(jnp.array(gt), jnp.array(mask), (4, 4))
    md = np.asarray(md)
    # rows overlapping the invalid half must be dropped (not exactly 1.0)
    assert md[0, :2].sum() == 0
    assert (md[0, 3] == 1).all()


def test_masked_l1_interval():
    est = jnp.full((1, 4, 4), 2.0)
    gt = jnp.full((1, 4, 4), 3.0)
    mask = jnp.ones((1, 4, 4))
    interval = jnp.array([0.5])
    loss = masked_l1_interval(est, gt, mask, interval)
    np.testing.assert_allclose(float(loss), 2.0, rtol=1e-6)  # |2-3|/0.5


def test_bayesian_loss_zero_mask_keeps_graph():
    l = jnp.ones((1, 1, 4, 4))
    u = jnp.zeros((1, 1, 4, 4))
    mask = jnp.zeros((1, 1, 4, 4))
    out = bayesian_loss(l, u, mask)
    np.testing.assert_allclose(float(out), 0.0)
    full = bayesian_loss(l, u, jnp.ones_like(mask))
    # u=0: (l*1 + 0) + l = 2 * mean(l) = 2
    np.testing.assert_allclose(float(full), 2.0, rtol=1e-6)


def _identical_view_setup(rng, b=1, n=3, h=16, w=20):
    K = np.array([[30.0, 0, (w - 1) / 2], [0, 30.0, (h - 1) / 2], [0, 0, 1]],
                 np.float32)
    Ks = np.tile(K, (b, n, 1, 1))
    Rs = np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1))
    ts = np.zeros((b, n, 3, 1), np.float32)
    proj = build_proj_matrices(jnp.array(Ks), jnp.array(Rs), jnp.array(ts))
    img = rng.random((b, 1, h, w, 3)).astype(np.float32)
    imgs = np.tile(img, (1, n, 1, 1, 1))
    return jnp.array(imgs), proj


def test_photometric_loss_discriminates_depth(rng):
    # NOTE: the reference normalizes flows with the align_corners=True
    # convention but samples with align_corners=False (models/trainer.py:213
    # vs :231), so even an identity warp is not pixel-exact and the loss is
    # not 0 for identical views. We reproduce that; the property training
    # relies on is *discrimination*: for two cameras with real parallax the
    # true depth must score better than a wrong one.
    b, n, h, w = 1, 3, 16, 20
    K = np.array([[30.0, 0, (w - 1) / 2], [0, 30.0, (h - 1) / 2], [0, 0, 1]],
                 np.float32)
    Ks = np.tile(K, (b, n, 1, 1))
    Rs = np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1))
    ts = np.zeros((b, n, 3, 1), np.float32)
    ts[0, 1, 0, 0] = 0.2
    ts[0, 2, 0, 0] = -0.2
    proj = build_proj_matrices(jnp.array(Ks), jnp.array(Rs), jnp.array(ts))
    # smooth texture so sub-pixel convention offsets stay small
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = np.stack([np.sin(xx / 2.0), np.cos(yy / 2.0),
                     np.sin((xx + yy) / 3.0)], -1).astype(np.float32)
    z_true = 3.0
    # render sources for a fronto-parallel plane: shift by f*tx/z pixels
    imgs = np.zeros((b, n, h, w, 3), np.float32)
    imgs[0, 0] = base
    # src pixel = ref pixel + f*tx/z, so the source image *content* is the
    # reference pattern shifted by -f*tx/z
    for i, tx in [(1, 0.2), (2, -0.2)]:
        shift = -30.0 * tx / z_true
        imgs[0, i] = np.stack([np.sin((xx + shift) / 2.0), np.cos(yy / 2.0),
                               np.sin((xx + shift + yy) / 3.0)], -1)
    imgs = jnp.array(imgs)
    ssim_true, mask_t = photometric_loss(imgs, jnp.full((b, h, w), z_true), proj)
    ssim_bad, mask_b = photometric_loss(imgs, jnp.full((b, h, w), 1.2), proj)
    lt = float(masked_mean(ssim_true, mask_t))
    lb = float(masked_mean(ssim_bad, mask_b))
    assert mask_t.shape == (b, n - 1, h, w)
    assert lt < lb, (lt, lb)


def test_masked_photometric_agreeing_depths(rng):
    imgs, proj = _identical_view_setup(rng)
    all_depth = jnp.full((1, 3, 16, 20), 3.0)
    ssim, mask = masked_photometric_loss(imgs, all_depth, proj, ref_idx=1)
    # identical cams + consistent depth: interior mask on, ssim ~ 0
    m = np.asarray(mask)
    assert m[0, :, 4:-4, 4:-4].min() == 1.0
    # inconsistent source depths -> mask collapses
    bad = all_depth.at[:, 0].set(30.0).at[:, 2].set(30.0)
    _, mask_bad = masked_photometric_loss(imgs, bad, proj, ref_idx=1)
    assert np.asarray(mask_bad).sum() == 0


def test_depth_metrics_known_error():
    est = jnp.full((1, 8, 8), 12.0)
    gt = jnp.full((1, 8, 8), 10.0)
    mask = jnp.ones((1, 8, 8))
    dmin, dmax = jnp.array([0.0]), jnp.array([128.0])  # step = 1.0
    m = depth_metrics(est, gt, mask, dmin, dmax)
    np.testing.assert_allclose(float(m["EPE"]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(float(m["1pxError"]), 1.0)
    np.testing.assert_allclose(float(m["3pxError"]), 0.0)

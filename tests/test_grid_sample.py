"""Golden tests: wildmvs grid_sample vs torch.nn.functional.grid_sample (CPU).

torch is used purely as a numerical oracle for the sampling semantics the
reference framework relies on (bilinear, zeros padding, both align_corners
conventions).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from wildmvs.ops.grid_sample import grid_sample, grid_sample_nhwc


@pytest.mark.parametrize("align_corners", [True, False])
def test_matches_torch_random_grid(rng, align_corners):
    b, h, w, c = 2, 9, 13, 4
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    # grid values straddling in-range, edge, and far out-of-range
    grid = (rng.standard_normal((b, 17, 21, 2)) * 1.2).astype(np.float32)

    ours = np.asarray(grid_sample_nhwc(jnp.array(img), jnp.array(grid),
                                       align_corners=align_corners))

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    theirs = F.grid_sample(timg, torch.from_numpy(grid), mode="bilinear",
                           padding_mode="zeros", align_corners=align_corners)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [True, False])
def test_matches_torch_extreme_coords(rng, align_corners):
    # the reference clamps grids to +-10 / +-1.1; make sure huge coords -> 0
    h, w, c = 6, 7, 2
    img = rng.standard_normal((1, h, w, c)).astype(np.float32)
    grid = np.array([[[[-10.0, -10.0], [10.0, 10.0], [-1.0, -1.0],
                       [1.0, 1.0], [0.0, 0.0], [-1.1, 0.3]]]], np.float32)
    ours = np.asarray(grid_sample_nhwc(jnp.array(img), jnp.array(grid),
                                       align_corners=align_corners))
    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    theirs = F.grid_sample(timg, torch.from_numpy(grid), mode="bilinear",
                           padding_mode="zeros", align_corners=align_corners)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_identity_grid_reproduces_image(rng):
    h, w, c = 8, 10, 3
    img = rng.standard_normal((h, w, c)).astype(np.float32)
    ys = np.linspace(-1, 1, h, dtype=np.float32)
    xs = np.linspace(-1, 1, w, dtype=np.float32)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    grid = np.stack([gx, gy], -1)
    out = np.asarray(grid_sample(jnp.array(img), jnp.array(grid), align_corners=True))
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-5)


def test_nan_coords_are_memory_safe():
    # non-finite grid coords must not produce out-of-bounds reads (the
    # gather is promised in-bounds); NaN propagates through the weights
    import numpy as np
    import jax.numpy as jnp
    from wildmvs.ops.grid_sample import grid_sample_xy
    img = jnp.ones((8, 10, 3), jnp.float32)
    gx = jnp.array([[jnp.nan, jnp.inf], [-jnp.inf, 0.0]])
    gy = jnp.array([[0.0, jnp.nan], [0.5, -0.5]])
    out = np.asarray(grid_sample_xy(img, gx, gy))
    assert out.shape == (2, 2, 3)
    assert np.isfinite(out[1, 1]).all()  # the finite coord still samples

"""Golden tests: NN primitives vs torch (CPU oracle).

The torch modules here are *oracles* configured to the same hyperparameters,
with weights copied across layouts — they verify that our channels-last flax
primitives reproduce the reference's numerics.
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from wildmvs.nn.blocks import (TorchConv, TorchConvTranspose, ConvBnReLU,
                               BasicBlock, UNet)


def test_conv2d_matches_torch_stride2(rng):
    b, h, w, cin, cout = 2, 8, 10, 3, 6
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    m = TorchConv(cout, kernel_size=5, strides=2, padding=2)
    params = m.init(jax.random.PRNGKey(0), jnp.array(x))
    kernel = np.asarray(params["params"]["conv"]["kernel"])  # [kh,kw,cin,cout]

    tconv = torch.nn.Conv2d(cin, cout, 5, stride=2, padding=2, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(kernel.transpose(3, 2, 0, 1)))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        expect = tconv(tx).permute(0, 2, 3, 1).numpy()
    got = np.asarray(m.apply(params, jnp.array(x)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_conv3d_k3s2_matches_torch(rng):
    b, d, h, w, cin, cout = 1, 6, 8, 10, 4, 8
    x = rng.standard_normal((b, d, h, w, cin)).astype(np.float32)
    m = TorchConv(cout, kernel_size=3, strides=2, padding=1)
    params = m.init(jax.random.PRNGKey(0), jnp.array(x))
    # 3D convs keep their kernel at the module level (decomposed path)
    kernel = np.asarray(params["params"]["kernel"])  # [kd,kh,kw,cin,cout]

    tconv = torch.nn.Conv3d(cin, cout, 3, stride=2, padding=1, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(kernel.transpose(4, 3, 0, 1, 2)))
        tx = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
        expect = tconv(tx).permute(0, 2, 3, 4, 1).numpy()
    got = np.asarray(m.apply(params, jnp.array(x)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("nd", [2, 3])
def test_conv_transpose_matches_torch(rng, nd):
    cin, cout = 4, 3
    if nd == 2:
        x = rng.standard_normal((2, 5, 7, cin)).astype(np.float32)
        tmod = torch.nn.ConvTranspose2d(cin, cout, 3, stride=2, padding=1,
                                        output_padding=1, bias=False)
        perm_in, perm_out = (0, 3, 1, 2), (0, 2, 3, 1)
        wperm = (2, 3, 0, 1)  # [kh,kw,cin,cout] -> [cin,cout,kh,kw]
    else:
        x = rng.standard_normal((1, 4, 5, 6, cin)).astype(np.float32)
        tmod = torch.nn.ConvTranspose3d(cin, cout, 3, stride=2, padding=1,
                                        output_padding=1, bias=False)
        perm_in, perm_out = (0, 4, 1, 2, 3), (0, 2, 3, 4, 1)
        wperm = (3, 4, 0, 1, 2)  # [kd,kh,kw,cin,cout] -> [cin,cout,kd,kh,kw]

    m = TorchConvTranspose(cout, kernel_size=3, strides=2, padding=1,
                           output_padding=1)
    params = m.init(jax.random.PRNGKey(1), jnp.array(x))
    kernel = np.asarray(params["params"]["kernel"])
    with torch.no_grad():
        tmod.weight.copy_(torch.from_numpy(kernel.transpose(*wperm)))
        expect = tmod(torch.from_numpy(x).permute(*perm_in)).permute(*perm_out).numpy()
    got = np.asarray(m.apply(params, jnp.array(x)))
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_batchnorm_train_eval_matches_torch(rng):
    b, h, w, c = 4, 6, 5, 3
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    m = ConvBnReLU(c, kernel_size=1, strides=1, padding=0)
    variables = m.init(jax.random.PRNGKey(0), jnp.array(x), train=True)
    kernel = np.asarray(variables["params"]["conv"]["conv"]["kernel"])

    tconv = torch.nn.Conv2d(c, c, 1, bias=False)
    tbn = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(kernel.transpose(3, 2, 0, 1)))

    # two train steps then one eval step; running stats must track torch
    tbn.train()
    state = variables
    for _ in range(2):
        out, mut = m.apply(state, jnp.array(x), train=True,
                           mutable=["batch_stats"])
        state = {"params": state["params"], "batch_stats": mut["batch_stats"]}
        with torch.no_grad():
            expect = torch.relu(tbn(tconv(torch.from_numpy(x).permute(0, 3, 1, 2))))
        np.testing.assert_allclose(np.asarray(out),
                                   expect.permute(0, 2, 3, 1).numpy(),
                                   rtol=1e-3, atol=1e-4)
    tbn.eval()
    out_eval = m.apply(state, jnp.array(x), train=False)
    with torch.no_grad():
        expect_eval = torch.relu(tbn(tconv(torch.from_numpy(x).permute(0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(out_eval),
                               expect_eval.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-3, atol=1e-4)


def test_basic_block_shapes(rng):
    x = jnp.array(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    m = BasicBlock(32, strides=2)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, 4, 4, 32)
    assert (np.asarray(out) >= 0).all()  # final relu


def test_unet_multiscale_shapes(rng):
    # Vis-MVSNet FeatExt UNet config: enc=2, dec=1, filters [32,64,128]
    x = jnp.array(rng.standard_normal((1, 32, 32, 16)).astype(np.float32))
    m = UNet(enc_blocks_per_stage=2, dec_blocks_per_stage=1,
             filters=(32, 64, 128))
    variables = m.init(jax.random.PRNGKey(0), x, train=False, multi_scale=3)
    outs = m.apply(variables, x, train=False, multi_scale=3)
    assert [o.shape for o in outs] == [(1, 8, 8, 128), (1, 16, 16, 64),
                                       (1, 32, 32, 32)]


def test_space_to_depth_packed_conv_matches_unpacked():
    """The s2d-packed conv transform (nn/blocks._pack_kernel_s2d) is the
    same math as the plain conv — exercised through CVP's pyramid
    extractor whose 32/16-channel tail runs packed."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wildmvs.models.cvp_mvsnet import FeaturePyramidNet
    from wildmvs.nn.blocks import TorchConv

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 32, 48, 3)), jnp.float32)
    fp = FeaturePyramidNet()
    v = fp.init(jax.random.PRNGKey(0), x)
    got = fp.apply(v, x)

    class Unpacked(FeaturePyramidNet):
        @nn.compact
        def __call__(self, x):
            chans = [64, 64, 64, 32, 32, 32, 16, 16, 16]
            names = ["conv0aa", "conv0ba", "conv0bb", "conv0bc", "conv0bd",
                     "conv0be", "conv0bf", "conv0bg", "conv0bh"]
            for ch, name in zip(chans, names):
                x = TorchConv(ch, 3, 1, 1, use_bias=True, name=name)(x)
                x = nn.leaky_relu(x, negative_slope=0.1)
            return x

    ref = Unpacked().apply(v, x)
    assert float(jnp.abs(got - ref).max()) < 1e-5

    # gradients flow through the scatter-built kernel to the SAME params
    g1 = jax.grad(lambda v: (fp.apply(v, x) ** 2).sum())(v)
    g2 = jax.grad(lambda v: (Unpacked().apply(v, x) ** 2).sum())(v)
    leaves1 = jax.tree.leaves(g1)
    leaves2 = jax.tree.leaves(g2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    # odd sizes gate the packing off (ragged in-the-wild inputs)
    x_odd = x[:, :31, :47]
    out_odd = fp.apply(v, x_odd)
    assert out_odd.shape == (2, 31, 47, 16)

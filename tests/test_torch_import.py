"""Torch-checkpoint importer: reference state_dict -> wildmvs param tree.

The fabricated state_dict below carries the reference MVSNet's exact key
names and shapes (models/MVSNet/model.py:21-108 + module.py:21-58:
FeatureNet conv0..conv6 + final `feature` Conv2d; CostRegNet conv0..conv6
ConvBnReLU3D, conv7/9/11 Sequential(ConvTranspose3d, BatchNorm3d), `prob`
Conv3d; softmin `temp`). Layout transposes are asserted against the same
permutations the golden block tests (tests/test_nn_blocks.py) validate
numerically against torch.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wildmvs.models import build_model
from wildmvs.train.torch_import import convert_state_dict


def _bn(prefix, c, sd, rng):
    sd[f"{prefix}.weight"] = (1.0 + 0.1 * rng.standard_normal(c)
                              ).astype(np.float32)
    sd[f"{prefix}.bias"] = (0.1 * rng.standard_normal(c)).astype(np.float32)
    sd[f"{prefix}.running_mean"] = (0.1 * rng.standard_normal(c)
                                    ).astype(np.float32)
    sd[f"{prefix}.running_var"] = rng.random(c).astype(np.float32) + 0.5
    sd[f"{prefix}.num_batches_tracked"] = np.array(7)


def reference_mvsnet_state_dict(softmin=False, prefix="", seed=0):
    """Random tensors under the reference's exact keys/shapes."""
    rng = np.random.default_rng(seed)
    sd = {}

    def conv2d(name, ci, co, k):
        sd[f"{name}.conv.weight"] = rng.standard_normal(
            (co, ci, k, k)).astype(np.float32)
        _bn(f"{name}.bn", co, sd, rng)

    def conv3d(name, ci, co):
        sd[f"{name}.conv.weight"] = rng.standard_normal(
            (co, ci, 3, 3, 3)).astype(np.float32)
        _bn(f"{name}.bn", co, sd, rng)

    def deconv3d(name, ci, co):
        # nn.Sequential(ConvTranspose3d, BatchNorm3d, ReLU) -> .0 / .1
        sd[f"{name}.0.weight"] = rng.standard_normal(
            (ci, co, 3, 3, 3)).astype(np.float32)
        _bn(f"{name}.1", co, sd, rng)

    # FeatureNet (model.py:21-41)
    conv2d("feature.conv0", 3, 8, 3)
    conv2d("feature.conv1", 8, 8, 3)
    conv2d("feature.conv2", 8, 16, 5)
    conv2d("feature.conv3", 16, 16, 3)
    conv2d("feature.conv4", 16, 16, 3)
    conv2d("feature.conv5", 16, 32, 5)
    conv2d("feature.conv6", 32, 32, 3)
    sd["feature.feature.weight"] = rng.standard_normal(
        (32, 32, 3, 3)).astype(np.float32)
    sd["feature.feature.bias"] = rng.standard_normal(32).astype(np.float32)
    # CostRegNet (model.py:43-84)
    conv3d("cost_regularization.conv0", 32, 8)
    conv3d("cost_regularization.conv1", 8, 16)
    conv3d("cost_regularization.conv2", 16, 16)
    conv3d("cost_regularization.conv3", 16, 32)
    conv3d("cost_regularization.conv4", 32, 32)
    conv3d("cost_regularization.conv5", 32, 64)
    conv3d("cost_regularization.conv6", 64, 64)
    deconv3d("cost_regularization.conv7", 64, 32)
    deconv3d("cost_regularization.conv9", 32, 16)
    deconv3d("cost_regularization.conv11", 16, 8)
    sd["cost_regularization.prob.weight"] = rng.standard_normal(
        (1, 8, 3, 3, 3)).astype(np.float32)
    sd["cost_regularization.prob.bias"] = rng.standard_normal(
        1).astype(np.float32)
    if softmin:
        sd["temp"] = np.ones((1,), np.float32)
    if prefix:
        sd = {prefix + k: v for k, v in sd.items()}
    return sd


def _conv(sd, rng, name, ci, co, k, dim=2, bias=False):
    # small-magnitude weights: fabricated nets must stay numerically tame
    # through deep cascades (Vis runs 3 stages of exp/softmax paths)
    shape = (co, ci) + (k,) * dim
    sd[f"{name}.weight"] = (0.1 * rng.standard_normal(shape)
                            ).astype(np.float32)
    if bias:
        sd[f"{name}.bias"] = (0.1 * rng.standard_normal(co)
                              ).astype(np.float32)


def _basic_block(sd, rng, name, ci, co, downsample, dim):
    _conv(sd, rng, f"{name}.conv1", ci, co, 3, dim)
    _bn(f"{name}.bn1", co, sd, rng)
    _conv(sd, rng, f"{name}.conv2", co, co, 3, dim)
    _bn(f"{name}.bn2", co, sd, rng)
    if downsample:
        _conv(sd, rng, f"{name}.downsample.0", ci, co, 1, dim)
        _bn(f"{name}.downsample.1", co, sd, rng)


def _unet(sd, rng, name, inplanes, enc, dec, initial_scale, filters, prefix,
          dim):
    """Key generator mirroring the reference UNet registration scheme
    (nn_utils.py:196-255: ListModule keys f'{prefix}{scale}_{idx}',
    dec entries [deconv, post_concat(, res)])."""
    scale, idx, prev = initial_scale, 0, inplanes
    for f in filters:
        for j in range(enc):
            ci = prev if j == 0 else f
            down = (j == 0) and (idx > 0 or ci != f)
            _basic_block(sd, rng, f"{name}.enc_blocks.{prefix}{scale}_{idx}"
                         f".{j}", ci, f, down, dim)
        idx += 1
        scale *= 2
        prev = f
    for f in filters[-2::-1]:
        base = f"{name}.dec_blocks.{prefix}{scale}_{idx}"
        # torch ConvTranspose weight is [I, O, k...]
        sd[f"{base}.0.weight"] = rng.standard_normal(
            (prev, f) + (3,) * dim).astype(np.float32)
        _conv(sd, rng, f"{base}.1", 2 * f, f, 3, dim)
        if dec > 0:
            for j in range(dec):
                _basic_block(sd, rng, f"{base}.2.{j}", f, f, False, dim)
        idx += 1
        scale //= 2
        prev = f


def reference_vis_state_dict(prefix="module.", seed=0):
    """Random tensors under the reference Vis-MVSNet keys (model_cas.py:
    18-98 FeatExt/Reg/RegFuse/RegPair/UncertNet, :423-431 Model, wrapped as
    Frontend.model, frontend.py:6-11)."""
    rng = np.random.default_rng(seed)
    sd = {}
    _conv(sd, rng, "model.feat_ext.init_conv.0", 3, 16, 5)
    _bn("model.feat_ext.init_conv.1", 16, sd, rng)
    _unet(sd, rng, "model.feat_ext.unet", 16, 2, 1, 2, [32, 64, 128],
          "2d", 2)
    _conv(sd, rng, "model.feat_ext.final_conv_1", 128, 32, 3)
    _conv(sd, rng, "model.feat_ext.final_conv_2", 64, 32, 3)
    _conv(sd, rng, "model.feat_ext.final_conv_3", 32, 32, 3)
    for s in (1, 2, 3):
        st = f"model.stage{s}"
        _unet(sd, rng, f"{st}.reg.unet", 8, 1, 0, 4, [8, 16], "reg1", 3)
        _unet(sd, rng, f"{st}.reg_fuse.unet", 8, 1, 0, 4, [8, 16], "reg2", 3)
        _conv(sd, rng, f"{st}.reg_fuse.final_conv", 8, 1, 3, dim=3)
        _conv(sd, rng, f"{st}.reg_pair.final_conv", 8, 1, 3, dim=3)
        _conv(sd, rng, f"{st}.uncert_net.conv1.0", 1, 8, 3)
        _bn(f"{st}.uncert_net.conv1.1", 8, sd, rng)
        _conv(sd, rng, f"{st}.uncert_net.conv2.0", 8, 8, 3)
        _bn(f"{st}.uncert_net.conv2.1", 8, sd, rng)
        _conv(sd, rng, f"{st}.uncert_net.head_convs.0", 8, 1, 3)
    return {prefix + k: v for k, v in sd.items()}


def reference_cvp_state_dict(prefix="module.", seed=0):
    """Random tensors under the reference CVP-MVSNet keys (net.py:21-92:
    featurePyramid conv0aa..conv0bh Sequential(Conv2d, LeakyReLU),
    cost_reg_refine ConvBnReLU3D + Sequential deconvs + prob0)."""
    rng = np.random.default_rng(seed)
    sd = {}
    fp = [("conv0aa", 3, 64), ("conv0ba", 64, 64), ("conv0bb", 64, 64),
          ("conv0bc", 64, 32), ("conv0bd", 32, 32), ("conv0be", 32, 32),
          ("conv0bf", 32, 16), ("conv0bg", 16, 16), ("conv0bh", 16, 16)]
    for name, ci, co in fp:
        _conv(sd, rng, f"model.featurePyramid.{name}.0", ci, co, 3,
              bias=True)
    cr = [("conv0", 16, 16), ("conv0a", 16, 16), ("conv1", 16, 32),
          ("conv2", 32, 32), ("conv2a", 32, 32), ("conv3", 32, 64),
          ("conv4", 64, 64), ("conv4a", 64, 64)]
    for name, ci, co in cr:
        _conv(sd, rng, f"model.cost_reg_refine.{name}.conv", ci, co, 3,
              dim=3)
        _bn(f"model.cost_reg_refine.{name}.bn", co, sd, rng)
    for name, ci, co in [("conv5", 64, 32), ("conv6", 32, 16)]:
        sd[f"model.cost_reg_refine.{name}.0.weight"] = rng.standard_normal(
            (ci, co, 3, 3, 3)).astype(np.float32)
        _bn(f"model.cost_reg_refine.{name}.1", co, sd, rng)
    _conv(sd, rng, "model.cost_reg_refine.prob0", 16, 1, 3, dim=3,
          bias=True)
    return {prefix + k: v for k, v in sd.items()}


def init_variables(arch, size=32):
    kwargs = {"num_depth": 8} if arch.startswith("mvsnet") else {}
    model = build_model(arch, **kwargs)
    b, n, h, w = 1, 2, size, size
    imgs = jnp.zeros((b, n, h, w, 3))
    K = jnp.tile(jnp.eye(3) * 20, (b, n, 1, 1)).at[..., 2, 2].set(1.0)
    R = jnp.tile(jnp.eye(3), (b, n, 1, 1))
    t = jnp.zeros((b, n, 3, 1))
    v = model.init(jax.random.PRNGKey(0), imgs, K, R, t, jnp.ones((b, n)),
                   jnp.full((b, n), 2.0), train=False)
    return model, v, (imgs, K, R, t, jnp.ones((b, n)), jnp.full((b, n), 2.0))


@pytest.mark.slow
@pytest.mark.parametrize("prefix", ["", "module."])
def test_mvsnet_import_strict_and_layouts(prefix):
    sd = reference_mvsnet_state_dict(prefix=prefix)
    model, v, args = init_variables("mvsnet")
    params, stats = convert_state_dict(sd, v["params"],
                                       v["batch_stats"])  # strict
    # conv2d layout: [O,I,kh,kw] -> [kh,kw,I,O]
    np.testing.assert_array_equal(
        params["feature"]["conv2"]["conv"]["conv"]["kernel"],
        sd[prefix + "feature.conv2.conv.weight"].transpose(2, 3, 1, 0))
    # final conv (bare Conv2d in torch, named wrapper here) + its bias
    np.testing.assert_array_equal(
        params["feature"]["feature"]["conv"]["kernel"],
        sd[prefix + "feature.feature.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(params["feature"]["feature"]["conv"]["bias"],
                                  sd[prefix + "feature.feature.bias"])
    # conv3d layout: [O,I,kd,kh,kw] -> [kd,kh,kw,I,O]
    np.testing.assert_array_equal(
        params["cost_regularization"]["conv0"]["conv"]["kernel"],
        sd[prefix + "cost_regularization.conv0.conv.weight"].transpose(
            2, 3, 4, 1, 0))
    # deconv3d layout: [I,O,kd,kh,kw] -> [kd,kh,kw,I,O]; Sequential .0/.1
    np.testing.assert_array_equal(
        params["cost_regularization"]["conv7"]["deconv"]["kernel"],
        sd[prefix + "cost_regularization.conv7.0.weight"].transpose(
            2, 3, 4, 0, 1))
    np.testing.assert_array_equal(
        params["cost_regularization"]["conv7"]["bn"]["bn"]["scale"],
        sd[prefix + "cost_regularization.conv7.1.weight"])
    # running stats -> batch_stats
    np.testing.assert_array_equal(
        stats["feature"]["conv0"]["bn"]["bn"]["mean"],
        sd[prefix + "feature.conv0.bn.running_mean"])
    np.testing.assert_array_equal(
        stats["cost_regularization"]["conv9"]["bn"]["bn"]["var"],
        sd[prefix + "cost_regularization.conv9.1.running_var"])
    # imported weights run
    out = model.apply({"params": params, "batch_stats": stats}, *args,
                      train=False)
    assert np.isfinite(np.asarray(out["depth"])).all()


@pytest.mark.slow
def test_vis_mvsnet_import_strict():
    sd = reference_vis_state_dict()
    from wildmvs.models import build_model
    model = build_model("vis_mvsnet")
    b, n, h, w = 1, 2, 64, 64
    imgs = jnp.zeros((b, n, h, w, 3))
    K = jnp.tile(jnp.eye(3) * 20, (b, n, 1, 1)).at[..., 2, 2].set(1.0)
    R = jnp.tile(jnp.eye(3), (b, n, 1, 1))
    t = jnp.zeros((b, n, 3, 1))
    v = model.init(jax.random.PRNGKey(0), imgs, K, R, t, jnp.ones((b, n)),
                   jnp.full((b, n), 2.0), train=False,
                   depth_nums=(8, 4, 4), interval_scales=(4.0, 2.0, 1.0))
    params, stats = convert_state_dict(sd, v["params"],
                                       v["batch_stats"])  # strict
    # UNet enc block kernel: ListModule key '2d4_1' -> enc1, Sequential .0
    np.testing.assert_array_equal(
        params["feat_ext"]["unet"]["enc1"]["block0"]["conv1"]["conv"]["conv"]
        ["kernel"],
        sd["module.model.feat_ext.unet.enc_blocks.2d4_1.0.conv1.weight"]
        .transpose(2, 3, 1, 0))
    # BasicBlock bn1 sibling -> fused conv1/bn
    np.testing.assert_array_equal(
        stats["feat_ext"]["unet"]["enc2"]["block1"]["conv1"]["bn"]["bn"]
        ["mean"],
        sd["module.model.feat_ext.unet.enc_blocks.2d8_2.1.bn1.running_mean"])
    # dec deconv (3D, transposed layout [I,O,k..] -> [k..,I,O])
    np.testing.assert_array_equal(
        params["stage2"]["reg"]["unet"]["dec2_deconv"]["kernel"],
        sd["module.model.stage2.reg.unet.dec_blocks.reg116_2.0.weight"]
        .transpose(2, 3, 4, 0, 1))
    # RegPair bare conv
    np.testing.assert_array_equal(
        params["stage3"]["reg_pair"]["kernel"],
        sd["module.model.stage3.reg_pair.final_conv.weight"].transpose(
            2, 3, 4, 1, 0))
    out = model.apply({"params": params, "batch_stats": stats}, imgs, K, R,
                      t, jnp.ones((b, n)), jnp.full((b, n), 2.0),
                      train=False, depth_nums=(8, 4, 4),
                      interval_scales=(4.0, 2.0, 1.0))
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_cvp_mvsnet_import_strict():
    sd = reference_cvp_state_dict()
    model, v, args = init_variables("cvp_mvsnet", size=64)
    params, stats = convert_state_dict(sd, v["params"],
                                       v["batch_stats"])  # strict
    np.testing.assert_array_equal(
        params["feature_pyramid"]["conv0aa"]["conv"]["kernel"],
        sd["module.model.featurePyramid.conv0aa.0.weight"].transpose(
            2, 3, 1, 0))
    np.testing.assert_array_equal(
        params["cost_reg_refine"]["conv6"]["deconv"]["kernel"],
        sd["module.model.cost_reg_refine.conv6.0.weight"].transpose(
            2, 3, 4, 0, 1))
    out = model.apply({"params": params, "batch_stats": stats}, *args,
                      train=False)
    assert np.isfinite(np.asarray(out["depth"])).all()


def test_mvsnet_softmin_temp_param():
    sd = reference_mvsnet_state_dict(softmin=True)
    _, v, _ = init_variables("mvsnet-s")
    params, _ = convert_state_dict(sd, v["params"], v["batch_stats"])
    np.testing.assert_array_equal(params["temp"], sd["temp"])


def test_strict_mode_reports_mismatches():
    sd = reference_mvsnet_state_dict()
    del sd["cost_regularization.prob.weight"]
    sd["left.over.weight"] = np.zeros((4, 4, 3, 3), np.float32)
    _, v, _ = init_variables("mvsnet")
    with pytest.raises(ValueError, match="unmatched|unused"):
        convert_state_dict(sd, v["params"], v["batch_stats"])


def test_import_checkpoint_roundtrip(tmp_path):
    """Full tool path: torch .ckpt file -> orbax dir -> restore_params."""
    torch = pytest.importorskip("torch")
    from wildmvs.train.checkpoint import latest_checkpoint, restore_params
    from wildmvs.train.torch_import import import_checkpoint

    sd = reference_mvsnet_state_dict(prefix="module.")
    ckpt = {"epoch": 3, "architecture": "mvsnet",
            "model": {k: torch.from_numpy(v.copy()) for k, v in sd.items()
                      if not k.endswith("num_batches_tracked")}}
    ckpt_file = tmp_path / "model_000003.ckpt"
    torch.save(ckpt, ckpt_file)

    out = tmp_path / "imported"
    arch = import_checkpoint(ckpt_file, out, num_depth=8)
    assert arch == "mvsnet"
    path = latest_checkpoint(out)
    _, v, args2 = init_variables("mvsnet")
    params, stats, meta = restore_params(path, v["params"], v["batch_stats"])
    assert meta["architecture"] == "mvsnet" and meta["epoch"] == 3
    np.testing.assert_allclose(
        np.asarray(params["feature"]["conv2"]["conv"]["conv"]["kernel"]),
        sd["module.feature.conv2.conv.weight"].transpose(2, 3, 1, 0))

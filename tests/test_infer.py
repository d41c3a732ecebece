"""Serving API (wildmvs.infer.Predictor): checkpoint-metadata architecture
resolution, /32 auto-crop, batched/unbatched handling, jit shape caching."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wildmvs.data.synthetic import SyntheticMVSDataset, collate
from wildmvs.infer import Predictor
from wildmvs.models import build_model
from wildmvs.train.checkpoint import save_params


def sample(h=64, w=64, seed=0):
    ds = SyntheticMVSDataset(num_samples=1, num_views=3, height=h, width=w,
                             seed=seed)
    return ds[0]


@pytest.mark.slow
def test_predictor_random_weights_unbatched():
    s = sample()
    pred = Predictor(architecture="mvsnet", bf16=False)
    out = pred(s["imgs"], s["K"], s["R"], s["t"], s["depth_min"],
               s["depth_max"])
    assert out["depth"].shape == (16, 16)  # 1/4 output res
    assert out["confidence"].shape == (16, 16)
    assert np.isfinite(out["depth"]).all()


def test_predictor_loads_architecture_from_checkpoint(tmp_path):
    s = sample()
    b = collate([s])
    model = build_model("mvsnet-s")
    args = tuple(jnp.asarray(b[k]) for k in
                 ("imgs", "K", "R", "t", "depth_min", "depth_max"))
    v = model.init(jax.random.PRNGKey(0), *args, train=False)
    save_params(tmp_path / "m", v["params"], v.get("batch_stats", {}),
                architecture="mvsnet-s", epoch=0)
    pred = Predictor(tmp_path / "m", bf16=False)
    assert pred.architecture == "mvsnet-s"
    out = pred(s["imgs"], s["K"], s["R"], s["t"], s["depth_min"],
               s["depth_max"])
    # imported variables, not random re-init: matches a direct apply
    direct = model.apply(v, *args, train=False)
    np.testing.assert_allclose(out["depth"],
                               np.asarray(direct["depth"])[0], atol=1e-5)


def test_predictor_crops_unaligned_inputs():
    s = sample()
    # pad the images to a non-/32 resolution; predictor must crop back
    imgs = np.pad(s["imgs"], ((0, 0), (0, 7), (0, 13), (0, 0)))
    pred = Predictor(architecture="mvsnet", bf16=False)
    out = pred(imgs, s["K"], s["R"], s["t"], s["depth_min"], s["depth_max"])
    assert out["depth"].shape == (16, 16)
    with pytest.raises(ValueError):
        pred(np.zeros((2, 16, 16, 3)), s["K"][:2], s["R"][:2], s["t"][:2],
             1.0, 2.0)


def test_predictor_batched_and_scalar_ranges():
    s = sample()
    imgs = np.stack([s["imgs"], s["imgs"]])  # B=2
    K = np.stack([s["K"]] * 2)
    R = np.stack([s["R"]] * 2)
    t = np.stack([s["t"]] * 2)
    pred = Predictor(architecture="mvsnet", bf16=False)
    out = pred(imgs, K, R, t, float(s["depth_min"][0]),
               float(s["depth_max"][0]))
    assert out["depth"].shape == (2, 16, 16)
    np.testing.assert_allclose(out["depth"][0], out["depth"][1], atol=1e-6)


def test_predictor_ragged_view_sizes():
    """A list of per-view images with heterogeneous sizes (in-the-wild
    scenes): each view is /32-cropped independently; output tracks the
    reference view's grid."""
    s = sample()
    views = [s["imgs"][0], s["imgs"][1],
             np.pad(s["imgs"][2], ((0, 39), (0, 7), (0, 0)))]  # 103x71 -> /32 crop
    pred = Predictor(architecture="mvsnet", bf16=False)
    out = pred(views, s["K"], s["R"], s["t"], s["depth_min"],
               s["depth_max"])
    assert out["depth"].shape == (16, 16)
    assert np.isfinite(out["depth"]).all()
    # a uniform list behaves exactly like the stacked array
    out_l = pred(list(s["imgs"]), s["K"], s["R"], s["t"], s["depth_min"],
                 s["depth_max"])
    out_a = pred(s["imgs"], s["K"], s["R"], s["t"], s["depth_min"],
                 s["depth_max"])
    np.testing.assert_array_equal(out_l["depth"], out_a["depth"])

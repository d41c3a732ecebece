"""End-to-end numerical parity against the ACTUAL reference torch models.

These tests random-initialize the reference implementations (mounted
read-only at /root/reference, executed on torch CPU), export their
state_dicts through our torch-checkpoint importer
(wildmvs/train/torch_import.py), and compare full forward passes on
identical realistic inputs. They are the strongest interop guarantee we
have: a user's reference-trained weights produce the same depthmaps here.

Skipped when the reference checkout is not present (the suite stays
self-contained); all comparisons run on CPU in f32.

Reference entry points exercised:
  models/MVSNet/model.py:178      (MVSNet variance + softmin)
  models/VisMVSNet/frontend.py:26 (3-stage cascade, soft fusion)
  models/CVP_MVSNet/frontend.py:10 (image-pyramid coarse-to-fine)
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "models")),
                                reason="reference checkout not mounted")

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wildmvs.data.synthetic import SyntheticMVSDataset, collate  # noqa: E402
from wildmvs.models import build_model  # noqa: E402
from wildmvs.train.torch_import import convert_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def ref_path():
    """Make the reference importable and neutralize its hard .cuda() calls
    (frontend.py:26-29, modules.py:71-246, homography.py:78-79)."""
    sys.path.insert(0, REF)
    orig_cuda = torch.Tensor.cuda
    orig_empty = torch.cuda.empty_cache
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.empty_cache = lambda: None
    yield REF
    torch.Tensor.cuda = orig_cuda
    torch.cuda.empty_cache = orig_empty
    sys.path.remove(REF)


def make_inputs(h=64, w=64, n=3, seed=3):
    ds = SyntheticMVSDataset(num_samples=1, num_views=n, height=h, width=w,
                             seed=seed)
    b = collate([ds[0]])
    return {k: np.asarray(v) for k, v in b.items() if k != "filename"}


def torch_args(b):
    imgs = torch.from_numpy(b["imgs"]).permute(0, 1, 4, 2, 3).contiguous()
    return (imgs, torch.from_numpy(b["K"]), torch.from_numpy(b["R"]),
            torch.from_numpy(b["t"]), torch.from_numpy(b["depth_min"]),
            torch.from_numpy(b["depth_max"]))


def jax_args(b):
    return (jnp.array(b["imgs"]), jnp.array(b["K"]), jnp.array(b["R"]),
            jnp.array(b["t"]), jnp.array(b["depth_min"]),
            jnp.array(b["depth_max"]))


def import_into(model, sd, b, **init_kw):
    sd = {k: v.detach().numpy() for k, v in sd.items()}
    v = model.init(jax.random.PRNGKey(0), *jax_args(b), train=False,
                   **init_kw)
    params, stats = convert_state_dict(sd, v["params"], v["batch_stats"])
    return {"params": params, "batch_stats": stats}


def max_err(ours, theirs):
    ours = np.asarray(ours)
    theirs = theirs.detach().numpy()
    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
    return float(np.abs(ours - theirs).max())


@pytest.mark.parametrize("aggregation", ["variance", "softmin"])
def test_mvsnet_forward_parity(ref_path, aggregation):
    from models.MVSNet.model import MVSNet as RefMVSNet
    torch.manual_seed(0)
    ref_net = RefMVSNet(aggregation=aggregation).eval()

    b = make_inputs()
    with torch.no_grad():
        ref_out = ref_net(*torch_args(b), reference_frame=1)

    arch = "mvsnet-s" if aggregation == "softmin" else "mvsnet"
    model = build_model(arch)  # full 192 hypotheses, as the reference
    variables = import_into(model, ref_net.state_dict(), b)
    out = model.apply(variables, *jax_args(b), reference_frame=1,
                      train=False)

    # depth is a soft-argmin over 192 hypotheses spanning 4 units: demand
    # parity well below one hypothesis interval (~0.021)
    assert max_err(out["depth"], ref_out["depth"]) < 2e-3
    assert max_err(out["photometric_confidence"],
                   ref_out["photometric_confidence"]) < 2e-3


def test_vis_mvsnet_forward_parity(ref_path):
    from models.VisMVSNet.frontend import Frontend as RefFrontend
    torch.manual_seed(0)
    ref_net = RefFrontend().eval()

    b = make_inputs()
    kw = dict(depth_nums=[16, 8, 8], interval_scales=[4.0, 2.0, 1.0])
    with torch.no_grad():
        ref_out = ref_net(*torch_args(b), reference_frame=0, **kw)

    model = build_model("vis_mvsnet")
    variables = import_into(model, ref_net.state_dict(), b, **kw)
    out = model.apply(variables, *jax_args(b), reference_frame=0,
                      train=False, **kw)

    # finest stage interval = (6-2)/128 = 0.03125
    assert max_err(out["depth"], ref_out["depth"]) < 3e-3
    for i in range(3):  # finest-first stage list
        assert max_err(out["depth_est_list"][i],
                       ref_out["depth_est_list"][i]) < 3e-3
    # per-pair [est_depth, [uncert]] nests (model_cas.py:415-419)
    for stage in range(3):
        for pair in range(2):
            assert max_err(
                out["depth_pair_list"][stage][pair][0],
                ref_out["depth_pair_list"][stage][pair][0].squeeze(1)) < 5e-3
    assert max_err(out["photometric_confidence"],
                   ref_out["photometric_confidence"]) < 2e-3


def test_cvp_mvsnet_forward_parity(ref_path):
    from models.CVP_MVSNet.frontend import Frontend as RefFrontend
    torch.manual_seed(0)
    ref_net = RefFrontend().eval()

    b = make_inputs()
    with torch.no_grad():
        ref_out = ref_net(*torch_args(b), reference_frame=0, nscale=2)

    model = build_model("cvp_mvsnet")
    variables = import_into(model, ref_net.state_dict(), b, nscale=2)
    out = model.apply(variables, *jax_args(b), reference_frame=0,
                      train=False, nscale=2)

    # eval mode: 96 coarse hypotheses + per-pixel epipolar refine intervals
    assert max_err(out["depth"], ref_out["depth"]) < 5e-3
    # reference CVP alone emits confidence as [B,1,H,W] (frontend.py:38
    # unsqueeze); our contract normalizes to [B,H,W]
    assert max_err(out["photometric_confidence"],
                   ref_out["photometric_confidence"].squeeze(1)) < 2e-3

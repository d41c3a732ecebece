"""MVSNet end-to-end smoke + behavior tests (tiny shapes, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wildmvs.models.api import build_model
from .conftest import make_scene


def _sample(rng, b=1, n=3, h=32, w=64):
    K, R, t = make_scene(rng, n_views=n, h=h, w=w)
    imgs = rng.random((b, n, h, w, 3)).astype(np.float32)
    depth_min = np.full((b, n), 2.0, np.float32)
    depth_max = np.full((b, n), 6.0, np.float32)
    return (jnp.array(imgs), jnp.array(np.tile(K[None], (b, 1, 1, 1))),
            jnp.array(np.tile(R[None], (b, 1, 1, 1))),
            jnp.array(np.tile(t[None], (b, 1, 1, 1))),
            jnp.array(depth_min), jnp.array(depth_max))


@pytest.mark.parametrize("arch", ["mvsnet", "mvsnet-s"])
def test_forward_contract(rng, arch):
    model = build_model(arch, num_depth=16)
    args = _sample(rng)
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)
    out = model.apply(variables, *args, train=False)
    b, n, h, w, _ = args[0].shape
    assert out["depth"].shape == (b, h // 4, w // 4)
    assert out["photometric_confidence"].shape == (b, h // 4, w // 4)
    assert len(out["depth_est_list"]) == 1
    assert out["depth_pair_list"] == []
    d = np.asarray(out["depth"])
    assert np.isfinite(d).all()
    assert (d >= 2.0 - 1e-3).all() and (d <= 6.0 + 1e-3).all()
    conf = np.asarray(out["photometric_confidence"])
    assert (conf >= 0).all() and (conf <= 1 + 1e-5).all()


def test_reference_frame_selection(rng):
    # changing the reference frame must change the output (view roles differ)
    model = build_model("mvsnet", num_depth=8)
    args = _sample(rng)
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)
    out0 = model.apply(variables, *args, reference_frame=0, train=False)
    out1 = model.apply(variables, *args, reference_frame=1, train=False)
    assert not np.allclose(np.asarray(out0["depth"]), np.asarray(out1["depth"]))


def test_train_mode_updates_batch_stats(rng):
    model = build_model("mvsnet", num_depth=8)
    args = _sample(rng)
    variables = model.init(jax.random.PRNGKey(0), *args, train=True)
    _, mutated = model.apply(variables, *args, train=True,
                             mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(after, before))


def test_gradients_flow(rng):
    model = build_model("mvsnet-s", num_depth=8)
    args = _sample(rng, h=32, w=32)
    variables = model.init(jax.random.PRNGKey(0), *args, train=True)

    def loss_fn(params):
        out, _ = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             *args, train=True, mutable=["batch_stats"])
        return jnp.mean(out["depth"])

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the softmin temperature and both conv stacks must receive gradient
    assert np.abs(np.asarray(grads["temp"])).sum() > 0
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0

"""CVP-MVSNet fast-train recipes (round-4): packed_training and
remat_levels must not change the training math.

* packed_training: the depth-/block-packed 3D regularizer at train time is
  built from the SAME parameters as the unpacked conv3d stack and the
  packed BN view keeps statistics per C over (B, D, H, W) — so the loss
  AND gradients must match the unpacked step to f32 tolerance.
* remat_levels: jax.checkpoint is semantically the identity — loss and
  gradients must match bitwise-tightly; only peak memory changes.

Parity context: the step being accelerated is the reference's
models/trainer.py:96-198 with models/CVP_MVSNet/models/net.py:96-229.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wildmvs.data.synthetic import SyntheticMVSDataset, collate
from wildmvs.train.config import TrainConfig
from wildmvs.train import trainer as T


def _batch(h=32, w=32, n=3):
    ds = SyntheticMVSDataset(num_samples=1, num_views=n, height=h, width=w,
                             seed=7)
    b = collate([ds[0]])
    return {k: jnp.asarray(v) for k, v in b.items() if k != "filename"}


def _step_grads(cfg, batch):
    state = T.create_train_state(cfg, jax.random.PRNGKey(0), batch)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        out, mut = T.create_model(cfg).apply(
            variables, *T.forward_args(batch, cfg), reference_frame=0,
            train=True, mutable=["batch_stats"])
        return T.loss_from_outputs(out, batch, cfg, 0), mut["batch_stats"]

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    flat = np.concatenate([np.asarray(g).ravel()
                           for g in jax.tree_util.tree_leaves(grads)])
    sflat = np.concatenate([np.asarray(s).ravel()
                            for s in jax.tree_util.tree_leaves(stats)])
    return float(loss), flat, sflat


@pytest.fixture(scope="module")
def baseline():
    cfg = TrainConfig(architecture="cvp_mvsnet", dataset="synthetic",
                      supervised=True)
    return _step_grads(cfg, _batch())


@pytest.mark.slow
def test_packed_training_matches_unpacked(baseline):
    loss0, g0, s0 = baseline
    cfg = TrainConfig(architecture="cvp_mvsnet", dataset="synthetic",
                      supervised=True, packed_training=True)
    loss1, g1, s1 = _step_grads(cfg, _batch())
    assert abs(loss1 - loss0) < 1e-5 * max(1.0, abs(loss0))
    # the packed convs contract depth inside the channel dimension, so f32
    # accumulation ORDER differs from the conv3d stack; the backward sums
    # |grad|~200 terms in that changed order — measured deviation 4e-3
    # relative to the gradient scale (this host), bound at 1e-2
    scale = np.abs(g0).max()
    assert np.abs(g1 - g0).max() < 1e-2 * max(1.0, scale), (
        np.abs(g1 - g0).max(), scale)
    # BN running stats follow the identical batch statistics
    assert np.abs(s1 - s0).max() < 1e-4 * max(1.0, np.abs(s0).max())


@pytest.mark.slow
def test_remat_levels_matches_default(baseline):
    loss0, g0, _ = baseline
    cfg = TrainConfig(architecture="cvp_mvsnet", dataset="synthetic",
                      supervised=True, remat_levels=True)
    loss1, g1, _ = _step_grads(cfg, _batch())
    assert abs(loss1 - loss0) < 1e-6 * max(1.0, abs(loss0))
    # checkpoint is the identity, but XLA compiles (and reassociates) the
    # recomputed segment independently — measured 8.5e-5 relative to the
    # gradient scale on CPU; bound at 1e-3
    assert np.abs(g1 - g0).max() < 1e-3 * max(1.0, np.abs(g0).max())


def test_packed_regnet_train_grads_match_unpacked():
    """Default-suite packed-vs-unpacked GRADIENT parity (advisor r4): the
    full train-step variant above is slow-marked, so this pins the same
    equivalence at the unit that packed_training actually changes — the
    CVPCostRegNet train-mode path (train_packing) — in seconds: identical
    params, train=True BN, grads of sum(out) through the packed vs the
    unpacked conv3d stack."""
    from wildmvs.models.cvp_mvsnet import CVPCostRegNet

    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.standard_normal((1, 24, 8, 16, 16)),
                      dtype=jnp.float32)
    reg0 = CVPCostRegNet(train_packing=False)
    reg1 = CVPCostRegNet(train_packing=True)
    v = reg0.init(jax.random.PRNGKey(0), vol, train=True)

    def run(reg):
        def loss_fn(params):
            out, mut = reg.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, vol,
                train=True, mutable=["batch_stats"])
            return jnp.sum(out * out), mut["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(v["params"])
        g = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree_util.tree_leaves(grads)])
        s = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree_util.tree_leaves(stats)])
        return float(loss), g, s

    loss0, g0, s0 = run(reg0)
    loss1, g1, s1 = run(reg1)
    assert abs(loss1 - loss0) < 1e-5 * max(1.0, abs(loss0))
    scale = max(1.0, float(np.abs(g0).max()))
    assert np.abs(g1 - g0).max() < 1e-2 * scale, (
        np.abs(g1 - g0).max(), scale)
    assert np.abs(s1 - s0).max() < 1e-4 * max(1.0, np.abs(s0).max())


def test_combined_recipe_runs():
    """bf16 + packed + remat — the recommended fast recipe — trains."""
    cfg = TrainConfig(architecture="cvp_mvsnet", dataset="synthetic",
                      supervised=True, packed_training=True,
                      remat_levels=True, train_dtype="bfloat16")
    batch = _batch()
    state = T.create_train_state(cfg, jax.random.PRNGKey(0), batch)
    state2, metrics = T.train_step(state, batch, cfg)
    assert np.isfinite(float(metrics["train_loss"]))
    # parameters actually moved
    d0 = jax.tree_util.tree_leaves(state.params)[0]
    d1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert np.abs(np.asarray(d1) - np.asarray(d0)).max() > 0.0

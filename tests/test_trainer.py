"""Training-loop tests on the synthetic dataset (tiny shapes, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from wildmvs.data.synthetic import SyntheticMVSDataset, collate
from wildmvs.train.config import TrainConfig
from wildmvs.train import trainer as T


def make_batch(n_views=3, h=64, w=64, batch=1, seed=0):
    ds = SyntheticMVSDataset(num_samples=batch, num_views=n_views, height=h,
                             width=w, seed=seed)
    b = collate([ds[i] for i in range(batch)])
    return {k: jnp.array(v) for k, v in b.items() if k != "filename"}


def test_config_constraints_and_schedule():
    cfg = TrainConfig(supervised=True, occ_masking=True)
    assert not cfg.occ_masking  # supervised forces it off (train.py:305-309)
    cfg = TrainConfig(lrepochs="4,8:10", lr=1.0)
    assert cfg.lr_at_epoch(0) == 1.0
    assert cfg.lr_at_epoch(4) == pytest.approx(0.1)
    assert cfg.lr_at_epoch(8) == pytest.approx(0.01)
    assert TrainConfig(architecture="mvsnet").output_down == 4
    assert TrainConfig(architecture="vis_mvsnet").output_down == 2
    assert TrainConfig(architecture="cvp_mvsnet",
                       upsample_training=True).input_down == 4


@pytest.mark.slow
def test_supervised_training_reduces_loss():
    cfg = TrainConfig(architecture="mvsnet", dataset="synthetic",
                      supervised=True, num_depth=16, lr=1e-3)
    batch = make_batch()
    state = T.create_train_state(cfg, jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(8):
        state, m = T.train_step(state, batch, cfg)
        losses.append(float(m["train_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_bf16_mixed_precision_training():
    cfg = TrainConfig(architecture="mvsnet", dataset="synthetic",
                      supervised=True, num_depth=16, lr=1e-3,
                      train_dtype="bfloat16")
    batch = make_batch()
    state = T.create_train_state(cfg, jax.random.PRNGKey(0), batch)
    # params and batch stats stay f32 (mixed precision: bf16 compute only)
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(p.dtype == jnp.float32 for p in leaves)
    losses = []
    for _ in range(6):
        state, m = T.train_step(state, batch, cfg)
        losses.append(float(m["train_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_remat_matches_plain_training():
    """jax.checkpoint must not change the computed gradients: a remat step
    and a plain step from the same state produce identical losses."""
    batch = make_batch()
    results = []
    for remat in (False, True):
        cfg = TrainConfig(architecture="mvsnet", dataset="synthetic",
                          supervised=True, num_depth=16, lr=1e-3,
                          remat=remat)
        state = T.create_train_state(cfg, jax.random.PRNGKey(0), batch)
        losses = []
        for _ in range(3):
            state, m = T.train_step(state, batch, cfg)
            losses.append(float(m["train_loss"]))
        results.append(losses)
    np.testing.assert_allclose(results[0], results[1], rtol=1e-5)


def test_unsupervised_training_runs():
    cfg = TrainConfig(architecture="mvsnet-s", dataset="synthetic",
                      supervised=False, num_depth=16)
    batch = make_batch()
    state = T.create_train_state(cfg, jax.random.PRNGKey(0), batch)
    losses = []
    for _ in range(3):
        state, m = T.train_step(state, batch, cfg)
        losses.append(float(m["train_loss"]))
    assert all(np.isfinite(losses))


def test_occ_masking_training_runs():
    cfg = TrainConfig(architecture="mvsnet", dataset="synthetic",
                      supervised=False, occ_masking=True, num_depth=8)
    batch = make_batch(h=32, w=32)
    state = T.create_train_state(cfg, jax.random.PRNGKey(0), batch)
    state, m = T.train_step(state, batch, cfg)
    assert np.isfinite(float(m["train_loss"]))


def test_eval_and_test_steps():
    cfg = TrainConfig(architecture="mvsnet", dataset="synthetic",
                      supervised=True, num_depth=16)
    batch = make_batch()
    state = T.create_train_state(cfg, jax.random.PRNGKey(0), batch)
    ev = T.eval_step(state, batch, cfg)
    assert np.isfinite(float(ev["val_loss"]))
    metrics = T.test_step(state, batch, cfg)
    assert set(metrics) == {"EPE", "1pxError", "3pxError"}
    assert all(np.isfinite(float(v)) for v in metrics.values())


def test_run_resume_continues_from_checkpoint(tmp_path):
    """--resume restores the full train state (incl. optimizer) and picks up
    at epoch+1 (parity train.py:149-158)."""
    import dataclasses
    from wildmvs.train import cli
    from wildmvs.train.checkpoint import latest_checkpoint

    cfg = TrainConfig(architecture="mvsnet", dataset="synthetic",
                      supervised=True, num_depth=8, lr=1e-3, epochs=2,
                      logdir=str(tmp_path), save_freq=1, print_every=1000)
    h1 = cli.run(cfg)
    assert len(h1["train_loss"]) == 2
    assert latest_checkpoint(tmp_path).name == "model_000001"

    h2 = cli.run(dataclasses.replace(cfg, epochs=3), resume=True)
    # only epoch 2 ran on resume, continuing the checkpoint numbering
    assert len(h2["train_loss"]) == 1
    assert latest_checkpoint(tmp_path).name == "model_000002"
    assert np.isfinite(h2["train_loss"][0])


def test_set_epoch_lr_updates_optimizer():
    cfg = TrainConfig(lrepochs="2:10", lr=1e-3, num_depth=8)
    batch = make_batch(h=32, w=32)
    state = T.create_train_state(cfg, jax.random.PRNGKey(0), batch)
    state = T.set_epoch_lr(state, cfg, epoch=5)
    assert float(state.opt_state.hyperparams["learning_rate"]) == \
        pytest.approx(1e-4)


def test_metrics_empty_mask_is_nan():
    """An image with no valid GT pixels must surface as NaN (the reference's
    values[mask].mean() over an empty selection), not silently contribute 0
    (models/utils.py:122-133)."""
    from wildmvs.train.metrics import depth_metrics
    est = jnp.ones((2, 4, 4))
    gt = jnp.ones((2, 4, 4)) * 2.0
    mask = jnp.stack([jnp.ones((4, 4)), jnp.zeros((4, 4))])
    m = depth_metrics(est, gt, mask, jnp.zeros(2), jnp.full((2,), 128.0))
    assert np.isnan(float(m["EPE"]))
    m_ok = depth_metrics(est, gt, jnp.ones((2, 4, 4)), jnp.zeros(2),
                         jnp.full((2,), 128.0))
    assert np.isfinite(float(m_ok["EPE"]))


def test_optimizer_matches_torch_adam_with_weight_decay():
    """torch.optim.Adam's weight_decay is COUPLED L2 (wd*p added to the
    gradient before the moment updates, train.py:139) — one step of our
    optimizer must land on torch's parameters exactly."""
    torch = pytest.importorskip("torch")
    from wildmvs.train.trainer import make_optimizer

    p0 = np.array([0.5, -1.2, 3.0], np.float32)
    g = np.array([0.1, -0.4, 0.02], np.float32)
    lr, wd = 1e-3, 0.1

    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.Adam([tp], lr=lr, betas=(0.9, 0.999), weight_decay=wd)
    tp.grad = torch.tensor(g)
    for _ in range(3):
        opt.step()
    want = tp.detach().numpy()

    config = TrainConfig(architecture="mvsnet", dataset="synthetic", lr=lr,
                         weight_decay=wd)
    tx = make_optimizer(config)
    params = {"w": jnp.asarray(p0)}
    opt_state = tx.init(params)
    for _ in range(3):
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state,
                                       params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), want, atol=1e-6)


@pytest.mark.slow
def test_occ_masking_multiscale_vis_mvsnet():
    """Multi-scale occ_masking (vis_mvsnet): the cross-view gather is
    PER SCALE (the reference all-gathers the current scale's depth inside
    the per-scale loss loop, models/trainer.py:246-247), for both the train
    step and the validation loss (the reference's val runs the same masked
    loss, train.py:217-230)."""
    cfg = TrainConfig(architecture="vis_mvsnet", dataset="synthetic",
                      supervised=False, occ_masking=True)
    batch = make_batch(h=64, w=64)
    state = T.create_train_state(cfg, jax.random.PRNGKey(0), batch)
    state, m = T.train_step(state, batch, cfg)
    assert np.isfinite(float(m["train_loss"]))
    ev = T.eval_step(state, batch, cfg)
    assert np.isfinite(float(ev["val_loss"]))
    # the occ-masked validation loss must differ from the unmasked one —
    # before the fix eval_step silently fell back to the plain photometric
    # loss with reference view 0 only
    cfg_plain = TrainConfig(architecture="vis_mvsnet", dataset="synthetic",
                            supervised=False, occ_masking=False)
    ev_plain = T.eval_step(state, batch, cfg_plain)
    assert float(ev["val_loss"]) != pytest.approx(
        float(ev_plain["val_loss"]), rel=1e-6)


def test_training_panels_warped_srcs_reconstruct_ref():
    """training_panels (models/trainer.py:78-92 + :258-276 parity): with GT
    depth, the depth-warped source views must reconstruct the reference
    image inside the in-frustum mask."""
    import numpy as np
    from wildmvs.data.synthetic import SyntheticMVSDataset, collate
    from wildmvs.utils.monitor import training_panels

    ds = SyntheticMVSDataset(num_samples=1, num_views=3, height=32, width=48,
                             seed=0)
    b = collate([ds[0]])
    b = {k: np.asarray(v) for k, v in b.items() if k != "filename"}
    panels = training_panels(b, depth_est=b["depth"])
    assert set(panels) == {"ref_img", "src_img_0", "src_img_1",
                           "warped_ref0src_1", "warped_ref0src_2"}
    ref = panels["ref_img"]
    for k in ("warped_ref0src_1", "warped_ref0src_2"):
        w = panels[k]
        m = w.sum(-1) > 0
        assert m.mean() > 0.5
        assert np.abs(w - ref)[m].mean() < 0.1


def test_params_npz_roundtrip(tmp_path):
    """save_params_npz/load_params_npz: the committable single-file asset
    form must restore params + batch_stats bit-for-bit with metadata."""
    import numpy as np
    from wildmvs.train.checkpoint import load_params_npz, save_params_npz

    rng = np.random.default_rng(0)
    params = {"mod": {"conv": {"kernel": rng.standard_normal((3, 3, 4, 8))
                               .astype(np.float32)},
                      "bn": {"scale": np.ones(8, np.float32)}},
              "temp": np.float32(2.5)}
    stats = {"mod": {"bn": {"mean": rng.standard_normal(8)
                            .astype(np.float32)}}}
    out = save_params_npz(tmp_path / "a.npz", params, stats, "vis_mvsnet",
                          extra_meta={"epoch": 7})
    p2, s2, meta = load_params_npz(out)
    assert meta == {"architecture": "vis_mvsnet", "epoch": 7}
    np.testing.assert_array_equal(p2["mod"]["conv"]["kernel"],
                                  params["mod"]["conv"]["kernel"])
    np.testing.assert_array_equal(p2["temp"], params["temp"])
    np.testing.assert_array_equal(s2["mod"]["bn"]["mean"],
                                  stats["mod"]["bn"]["mean"])

"""View-parallel occ_masking on a virtual 8-device mesh — and the metamorphic
check: the sharded step must match the single-program all-refs loop."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wildmvs.data.synthetic import SyntheticMVSDataset, collate
from wildmvs.dist.mesh import make_mesh, replicate, shard_batch
from wildmvs.dist.view_parallel import make_view_parallel_train_step
from wildmvs.train.config import TrainConfig
from wildmvs.train import trainer as T


def make_batch(n_views, b, h=32, w=32, seed=0):
    ds = SyntheticMVSDataset(num_samples=b, num_views=n_views, height=h,
                             width=w, seed=seed)
    batch = collate([ds[i] for i in range(b)])
    return {k: jnp.array(v) for k, v in batch.items() if k != "filename"}


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_view_parallel_matches_single_program():
    n = 4
    cfg = TrainConfig(architecture="mvsnet", dataset="synthetic",
                      supervised=False, occ_masking=True, num_im_train=n,
                      num_depth=8, batch_size=2)
    batch = make_batch(n, b=2)
    state = T.create_train_state(cfg, jax.random.PRNGKey(0), batch)

    # reference: the all-refs-in-one-program step
    ref_state, ref_metrics = T.train_step(state, batch, cfg)

    # data=1: with data sharding each shard would normalize BN over its
    # LOCAL batch (per-replica BN — the reference's DDP semantics), which
    # intentionally differs from the single-program full-batch BN. Isolate
    # the view axis here.
    mesh = make_mesh(data=1, view=4, hyp=1, devices=jax.devices()[:4])
    step = make_view_parallel_train_step(mesh, cfg)
    sharded_batch = shard_batch(batch, mesh)
    rstate = state.replace(step=replicate(state.step, mesh),
                           params=replicate(state.params, mesh),
                           batch_stats=replicate(state.batch_stats, mesh),
                           opt_state=replicate(state.opt_state, mesh))
    new_state, metrics = step(rstate, sharded_batch)

    # the sharded loss must equal the single-program loss
    np.testing.assert_allclose(float(metrics["train_loss"]),
                               float(ref_metrics["train_loss"]),
                               rtol=2e-4)
    # parameters after one step must match too (same gradients)
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
    new_leaves = jax.tree_util.tree_leaves(new_state.params)
    for a, b in zip(new_leaves, ref_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    # BN batch stats after the step must match the single-program step's
    # (which keeps r=0's, the reference's rank-0 DDP buffers) — before the
    # fix the sharded step silently dropped the update entirely
    for a, b in zip(jax.tree_util.tree_leaves(new_state.batch_stats),
                    jax.tree_util.tree_leaves(ref_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # and they must actually have moved from initialization
    moved = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(new_state.batch_stats),
                             jax.tree_util.tree_leaves(state.batch_stats))]
    assert max(moved) > 0.0


def test_hyp_slab_sharding_matches_unsharded():
    """Metamorphic: the depth-hypothesis-sharded forward equals the
    unsharded one (SURVEY §4e). The cost volume is constrained to
    P(None, "hyp"); the warp and Σ/Σ² accumulation partition over depth
    slabs and XLA inserts the softmax/regression collectives."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wildmvs.dist.mesh import make_mesh
    from wildmvs.models import build_model

    rng = np.random.default_rng(3)
    b, n, h, w = 1, 3, 32, 64
    imgs = jnp.array(rng.random((b, n, h, w, 3)).astype(np.float32))
    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
    K = jnp.array(np.tile(K, (b, n, 1, 1)))
    R = jnp.array(np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1)))
    t = np.zeros((b, n, 3, 1), np.float32)
    for i in range(n):
        t[:, i, 0, 0] = 0.05 * i
    t = jnp.array(t)
    dmin = jnp.full((b, n), 2.0)
    dmax = jnp.full((b, n), 6.0)
    args = (imgs, K, R, t, dmin, dmax)

    m_ref = build_model("mvsnet", num_depth=16)
    v = m_ref.init(jax.random.PRNGKey(0), *args, train=False)
    d_ref = m_ref.apply(v, *args, train=False)["depth"]

    mesh = make_mesh(data=2, view=1, hyp=4, devices=jax.devices())
    m_sh = build_model("mvsnet", num_depth=16, hyp_axis="hyp")
    with jax.set_mesh(mesh):
        d_sh = jax.jit(lambda v, a: m_sh.apply(v, *a, train=False)["depth"]
                       )(v, args)
        d_sh = jax.device_get(d_sh)
    assert float(jnp.abs(d_ref - d_sh).max()) < 1e-5


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_view_parallel_data_sharding_averages_gradients():
    """With data > 1 the loss/gradients are pmean'd over BOTH mesh axes —
    DDP averages across every rank, and the returned loss must be genuinely
    replicated. A batch of two IDENTICAL samples makes each data shard's
    local BN statistics equal the full-batch ones, so the sharded step must
    reproduce the single-program step exactly (before the fix, gradients
    were 2x and train_loss was an arbitrary shard's value)."""
    n = 4
    cfg = TrainConfig(architecture="mvsnet", dataset="synthetic",
                      supervised=False, occ_masking=True, num_im_train=n,
                      num_depth=8, batch_size=2)
    one = make_batch(n, b=1)
    batch = {k: jnp.concatenate([v, v], axis=0) for k, v in one.items()}
    state = T.create_train_state(cfg, jax.random.PRNGKey(0), batch)
    ref_state, ref_metrics = T.train_step(state, batch, cfg)

    mesh = make_mesh(data=2, view=4, hyp=1, devices=jax.devices())
    step = make_view_parallel_train_step(mesh, cfg)
    rstate = state.replace(step=replicate(state.step, mesh),
                           params=replicate(state.params, mesh),
                           batch_stats=replicate(state.batch_stats, mesh),
                           opt_state=replicate(state.opt_state, mesh))
    new_state, metrics = step(rstate, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(metrics["train_loss"]),
                               float(ref_metrics["train_loss"]), rtol=2e-4)
    # Adam normalizes away small psum reduction-order noise unevenly; allow
    # slightly more than the data=1 metamorphic test
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    # identical samples on both data shards -> each shard's local BN stats
    # equal the full-batch ones, so the pmean'd stats must match exactly
    for a, b in zip(jax.tree_util.tree_leaves(new_state.batch_stats),
                    jax.tree_util.tree_leaves(ref_state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # sharper averaging check with two DISTINCT samples: each data shard
    # holds exactly one, and its local BN equals a b=1 single-program run,
    # so the replicated sharded loss must equal the mean of the two
    # single-sample losses (an unaveraged/unreplicated loss cannot)
    s0 = make_batch(n, b=1, seed=0)
    s1 = make_batch(n, b=1, seed=5)
    mixed = {k: jnp.concatenate([s0[k], s1[k]], axis=0) for k in s0}
    _, m_mixed = step(rstate, shard_batch(mixed, mesh))
    losses = []
    for s in (s0, s1):
        _, m = T.train_step(state, s, cfg)
        losses.append(float(m["train_loss"]))
    np.testing.assert_allclose(float(m_mixed["train_loss"]),
                               np.mean(losses), rtol=2e-4)


@pytest.mark.slow
def test_vis_mvsnet_pair_and_slab_sharding_matches_unsharded():
    """Metamorphic: Vis-MVSNet with source pairs sharded over `view` and
    cost-volume depth slabs over `hyp` equals the unsharded forward. The
    stacked per-pair branch (SingleStage eval path) is an associative
    weighted fusion (model_cas.py:354-394), so SPMD inserts the cross-pair
    psum; the per-pair Reg 3D convs partition over depth with halo
    exchange."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wildmvs.dist.mesh import make_mesh
    from wildmvs.models import build_model

    rng = np.random.default_rng(5)
    b, n, h, w = 1, 3, 32, 64
    imgs = jnp.array(rng.random((b, n, h, w, 3)).astype(np.float32))
    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
    K = jnp.array(np.tile(K, (b, n, 1, 1)))
    R = jnp.array(np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1)))
    t = np.zeros((b, n, 3, 1), np.float32)
    for i in range(n):
        t[:, i, 0, 0] = 0.05 * i
    t = jnp.array(t)
    dmin = jnp.full((b, n), 2.0)
    dmax = jnp.full((b, n), 6.0)
    args = (imgs, K, R, t, dmin, dmax)

    kw = dict(depth_nums=(8, 8, 8), interval_scales=(4.0, 2.0, 1.0))
    m_ref = build_model("vis_mvsnet", **kw)
    v = m_ref.init(jax.random.PRNGKey(0), *args, train=False)
    d_ref = m_ref.apply(v, *args, train=False)["depth"]

    mesh = make_mesh(data=1, view=2, hyp=4, devices=jax.devices())
    m_sh = build_model("vis_mvsnet", view_axis="view", hyp_axis="hyp", **kw)
    with jax.set_mesh(mesh):
        d_sh = jax.jit(lambda v, a: m_sh.apply(v, *a, train=False)["depth"]
                       )(v, args)
        d_sh = jax.device_get(d_sh)
    assert float(jnp.abs(d_ref - d_sh).max()) < 1e-4


@pytest.mark.slow
def test_cvp_hyp_slab_sharding_matches_unsharded():
    """Metamorphic: CVP-MVSNet with the coarse full sweep's 96-hypothesis
    depth axis sharded over `hyp` equals the unsharded eval forward (the
    variance aggregation is associative over depth slabs; the refinement
    levels stay unsharded)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from wildmvs.dist.mesh import make_mesh
    from wildmvs.models import build_model

    rng = np.random.default_rng(11)
    b, n, h, w = 1, 3, 32, 64
    imgs = jnp.array(rng.random((b, n, h, w, 3)).astype(np.float32))
    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
    K = jnp.array(np.tile(K, (b, n, 1, 1)))
    R = jnp.array(np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1)))
    t = np.zeros((b, n, 3, 1), np.float32)
    for i in range(n):
        t[:, i, 0, 0] = 0.05 * i
    t = jnp.array(t)
    dmin = jnp.full((b, n), 2.0)
    dmax = jnp.full((b, n), 6.0)
    args = (imgs, K, R, t, dmin, dmax)

    m_ref = build_model("cvp_mvsnet", nscale=2)
    v = m_ref.init(jax.random.PRNGKey(0), *args, train=False)
    d_ref = m_ref.apply(v, *args, train=False)["depth"]

    mesh = make_mesh(data=2, view=1, hyp=4, devices=jax.devices())
    m_sh = build_model("cvp_mvsnet", nscale=2, hyp_axis="hyp")
    with jax.set_mesh(mesh):
        d_sh = jax.jit(lambda v, a: m_sh.apply(v, *a, train=False)["depth"]
                       )(v, args)
        d_sh = jax.device_get(d_sh)
    assert float(jnp.abs(d_ref - d_sh).max()) < 1e-4


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
@pytest.mark.slow
def test_occ_masking_multi_epoch_dynamics():
    """Multi-epoch occ_masking training on the view mesh OPTIMIZES: the
    loss over 3 epochs of repeated steps must decrease monotonically-ish
    (strictly from first to last, no NaNs) — the regression guard for the
    recipe recorded in BASELINE.md (16 epochs, train_loss 0.220 -> 0.132,
    stable across a checkpoint resume)."""
    n = 4
    cfg = TrainConfig(architecture="mvsnet-s", dataset="synthetic",
                      supervised=False, occ_masking=True, num_im_train=n,
                      num_depth=16, batch_size=1, lr=1e-3)
    mesh = make_mesh(data=1, view=n, devices=jax.devices()[:n])
    step = make_view_parallel_train_step(mesh, cfg)
    batches_ = [make_batch(n, 1, seed=s) for s in range(2)]
    state = T.create_train_state(cfg, jax.random.PRNGKey(0), batches_[0])
    state = state.replace(step=replicate(state.step, mesh),
                          params=replicate(state.params, mesh),
                          batch_stats=replicate(state.batch_stats, mesh),
                          opt_state=replicate(state.opt_state, mesh))
    losses = []
    for epoch in range(3):
        ep = []
        for b in batches_:
            state, m = step(state, shard_batch(b, mesh))
            ep.append(float(m["train_loss"]))
        losses.append(np.mean(ep))
    assert np.all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses

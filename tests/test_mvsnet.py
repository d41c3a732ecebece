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


@pytest.mark.slow
def test_vis_mvsnet_contract(rng):
    model = build_model("vis_mvsnet", depth_nums=(8, 4, 4),
                        interval_scales=(4.0, 2.0, 1.0))
    args = _sample(rng, h=64, w=64)
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)
    out = model.apply(variables, *args, train=False)
    b, n, h, w, _ = args[0].shape
    # cascade resolutions: 1/8, 1/4, 1/2 — finest first
    assert out["depth"].shape == (b, h // 2, w // 2)
    assert out["depth_est_list"][0].shape == (b, h // 2, w // 2)
    assert out["depth_est_list"][1].shape == (b, h // 4, w // 4)
    assert out["depth_est_list"][2].shape == (b, h // 8, w // 8)
    assert len(out["depth_pair_list"]) == 3
    assert len(out["depth_pair_list"][0]) == n - 1
    d_pair, (unc,) = out["depth_pair_list"][0][0]
    assert d_pair.shape == (b, h // 2, w // 2)
    assert unc.shape == (b, h // 2, w // 2)
    assert out["photometric_confidence"].shape == (b, 3, h // 2, w // 2)
    for d in out["depth_est_list"]:
        assert np.isfinite(np.asarray(d)).all()


@pytest.mark.slow
def test_vis_mvsnet_gradients(rng):
    model = build_model("vis_mvsnet", depth_nums=(4, 4, 4))
    args = _sample(rng, h=32, w=32)
    variables = model.init(jax.random.PRNGKey(0), *args, train=True)

    def loss_fn(params):
        out, _ = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             *args, train=True, mutable=["batch_stats"])
        l = jnp.mean(out["depth"])
        for pairs in out["depth_pair_list"]:
            for d, (u,) in pairs:
                l = l + jnp.mean(d) * 0.1 + jnp.mean(u) * 0.1
        return l

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert sum(float(jnp.abs(g).sum()) for g in leaves) > 0


@pytest.mark.slow
def test_cvp_mvsnet_contract_train_and_eval(rng):
    model = build_model("cvp_mvsnet", nscale=2)
    args = _sample(rng, h=64, w=64)
    variables = model.init(jax.random.PRNGKey(0), *args, train=True)
    out = model.apply(variables, *args, train=True,
                      mutable=["batch_stats"])[0]
    b, n, h, w, _ = args[0].shape
    assert out["depth"].shape == (b, h, w)        # finest = full res
    assert out["depth_est_list"][1].shape == (b, h // 2, w // 2)
    assert out["depth_pair_list"] == []
    assert np.isfinite(np.asarray(out["depth"])).all()

    # eval path uses the epipolar per-pixel hypothesis intervals
    out_eval = model.apply(variables, *args, train=False)
    assert out_eval["depth"].shape == (b, h, w)
    assert np.isfinite(np.asarray(out_eval["depth"])).all()
    assert out_eval["photometric_confidence"].shape == (b, h, w)


def test_cvp_mvsnet_nscale_override(rng):
    model = build_model("cvp_mvsnet", nscale=2)
    args = _sample(rng, h=64, w=64)
    variables = model.init(jax.random.PRNGKey(0), *args, train=True)
    out = model.apply(variables, *args, train=False, nscale=3)
    assert len(out["depth_est_list"]) == 3
    assert out["depth_est_list"][2].shape[1:] == (16, 16)


@pytest.mark.parametrize("mode", ["hard", "average", "uwta", "maxpool"])
def test_vis_mvsnet_fusion_modes(rng, mode):
    model = build_model("vis_mvsnet", depth_nums=(4, 4, 4), mode=mode)
    args = _sample(rng, h=32, w=32)
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)
    out = model.apply(variables, *args, train=False)
    assert np.isfinite(np.asarray(out["depth"])).all()


@pytest.mark.parametrize("arch", ["mvsnet", "vis_mvsnet", "cvp_mvsnet"])
def test_ragged_view_sizes(rng, arch):
    """Heterogeneous per-view sizes (the in-the-wild eval contract): imgs as
    a tuple of [B,Hi,Wi,3] views — the reference accepts lists at
    model.py:179-182 / frontend.py:43-44 and its MegaDepth/YFCC test samples
    genuinely vary per view (md_yao.py:126). The output must track the
    reference view's grid, and when every view happens to be the same size
    the tuple form must match the stacked form exactly."""
    kw = {"mvsnet": dict(num_depth=16),
          "vis_mvsnet": dict(depth_nums=(8, 4, 4),
                             interval_scales=(4.0, 2.0, 1.0)),
          "cvp_mvsnet": dict(nscale=2)}[arch]
    model = build_model(arch, **kw)
    imgs, K, R, t, dmin, dmax = _sample(rng, h=64, w=64)
    variables = model.init(jax.random.PRNGKey(0), imgs, K, R, t, dmin, dmax,
                           train=False)

    # same-size tuple == stacked array, bit for bit
    tup = tuple(imgs[:, i] for i in range(imgs.shape[1]))
    out_a = model.apply(variables, imgs, K, R, t, dmin, dmax, train=False)
    out_b = model.apply(variables, tup, K, R, t, dmin, dmax, train=False)
    np.testing.assert_array_equal(np.asarray(out_a["depth"]),
                                  np.asarray(out_b["depth"]))

    # crop source view 2 to 64x32 (top-left, K unchanged) -> genuinely ragged
    ragged = (imgs[:, 0], imgs[:, 1], imgs[:, 2, :, :32])
    out_r = model.apply(variables, ragged, K, R, t, dmin, dmax, train=False)
    d = np.asarray(out_r["depth"])
    assert d.shape == np.asarray(out_a["depth"]).shape  # ref grid unchanged
    assert np.isfinite(d).all()
    assert (d >= 2.0 - 1e-3).all() and (d <= 6.0 + 1e-3).all()


def test_masked_median_matches_sort():
    """The bit-bisection order statistic used by cal_depth_hypo's median
    (ops/select.py) must equal sorted(x[valid])[(nvalid-1)//2] exactly —
    incl. duplicates, zeros, +-inf, negatives, NaN payloads, and partial
    masks (NaN counts as invalid regardless of the mask)."""
    from wildmvs.ops.select import masked_kth_smallest, masked_median
    rng = np.random.default_rng(7)
    for n in [1, 5, 1000, 4096]:
        x = rng.gamma(0.7, 10.0, size=n).astype(np.float32)
        x *= np.where(rng.random(n) < 0.4, -1.0, 1.0)   # signed inputs
        x[rng.random(n) < 0.05] = np.inf
        x[rng.random(n) < 0.05] = -np.inf
        x[rng.random(n) < 0.1] = 0.0          # duplicates at zero
        x[rng.random(n) < 0.2] = x[0]         # duplicated values
        valid = rng.random(n) < 0.8
        if n > 1:                              # NaNs must be skipped even
            x[-1] = np.nan                     # when the mask says valid
            valid[-1] = True
        valid[0] = True                        # keep nvalid >= 1
        x[0] = abs(x[0]) if np.isfinite(x[0]) else 1.0
        sel = np.sort(x[valid & ~np.isnan(x)])
        got = float(masked_median(jnp.asarray(x), jnp.asarray(valid)))
        want = float(sel[(len(sel) - 1) // 2])
        assert got == want, (n, got, want)  # inf==inf is sign-exact
        for k in [0, len(sel) - 1, len(sel) // 3]:
            gk = float(masked_kth_smallest(jnp.asarray(x), jnp.asarray(valid),
                                           jnp.int32(k)))
            assert gk == float(sel[k]), (n, k, gk, sel[k])


def test_depth_chunked_gather_matches_unchunked(rng, monkeypatch):
    """The depth-chunked gather aggregation (the eval-res memory-bounding
    path, ops/volumes.depth_chunked_volume) produces the same depth map as
    the unchunked gather."""
    import wildmvs.ops.volumes as vols

    args = _sample(rng)
    model = build_model("mvsnet", num_depth=48)
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)
    want = model.apply(variables, *args, train=False)["depth"]

    # force chunking (12 planes per slab) through the model's gather branch
    monkeypatch.setattr(vols, "gather_chunk_planes",
                        lambda nd, hw, c, limit=0: 12)
    got = model.apply(variables, *args, train=False)["depth"]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0, atol=1e-5)

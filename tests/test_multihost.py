"""Multi-host training wiring — per-process dataset sharding and global
batch assembly, validated two ways: (a) single-process invariants — the
per-process local orders are disjoint, cover every global batch exactly,
and arrays assembled from local shards equal the single-host sharded batch;
(b) a REAL 2-process `jax.distributed` rendezvous over localhost
(tools/multiproc_rendezvous.py — the TPU-native replacement for the
reference's mp.spawn + gloo process group, train.py:315 / :52-62), whose
one-step result must equal the single-process step. Parity:
DistributedSampler sharding + DDP (train.py:112-136) replaced by
dist.mesh.process_local_order + shard_batch.
"""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wildmvs.dist.mesh import (make_mesh, process_local_order, replicate,
                               shard_batch)


def test_process_local_order_disjoint_cover():
    order = np.random.default_rng(0).permutation(23)
    B, P = 4, 2
    locals_ = [process_local_order(order, B, num_processes=P, process_id=p)
               for p in range(P)]
    for lo, lbs in locals_:
        assert lbs == B // P
    # wrap-padded global order, reshaped into batches
    padded = np.concatenate([order, order[:(-len(order)) % B]])
    rows = padded.reshape(-1, B)
    # reassembling each batch row from the per-process slices must give the
    # exact global batch, in order
    per = B // P
    for r, row in enumerate(rows):
        got = np.concatenate([locals_[p][0].reshape(-1, per)[r]
                              for p in range(P)])
        np.testing.assert_array_equal(got, row)
    # single-process is the identity
    lo, lbs = process_local_order(order, B, num_processes=1, process_id=0)
    np.testing.assert_array_equal(lo, order)
    assert lbs == B


def test_process_local_order_rejects_uneven_batch():
    with pytest.raises(AssertionError):
        process_local_order(np.arange(8), 3, num_processes=2, process_id=0)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_shard_batch_from_local_equals_device_put():
    """Single-process ground truth: assembling through the multi-host path
    (make_array_from_process_local_data) must equal plain device_put
    sharding — the only difference multi-host introduces is WHO loads which
    rows, which test_process_local_order_disjoint_cover pins down."""
    mesh = make_mesh(data=4, view=1, hyp=1, devices=jax.devices()[:4])
    batch = {"x": np.arange(4 * 3, dtype=np.float32).reshape(4, 3),
             "y": np.ones((4, 2, 2), np.float32)}
    a = shard_batch({k: jnp.array(v) for k, v in batch.items()}, mesh,
                    from_local=False)
    b = shard_batch(batch, mesh, from_local=True)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding == b[k].sharding


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
@pytest.mark.slow
def test_data_parallel_step_on_assembled_batch_matches_single():
    """End-to-end: a train step fed through the multi-host assembly path
    equals the plain single-host step (the step itself is host-count
    agnostic under SPMD, so with the index invariant this is the full
    multi-host equivalence that can be proven on one host)."""
    from wildmvs.data.synthetic import SyntheticMVSDataset, collate
    from wildmvs.train.config import TrainConfig
    from wildmvs.train import trainer as T

    cfg = TrainConfig(architecture="mvsnet", dataset="synthetic",
                      supervised=True, num_depth=8, batch_size=2)
    ds = SyntheticMVSDataset(num_samples=2, num_views=3, height=32, width=32,
                             seed=0)
    batch = collate([ds[0], ds[1]])
    batch = {k: np.asarray(v) for k, v in batch.items() if k != "filename"}
    jbatch = {k: jnp.array(v) for k, v in batch.items()}
    state = T.create_train_state(cfg, jax.random.PRNGKey(0), jbatch)

    ref_state, ref_m = T.train_step(state, jbatch, cfg)

    mesh = make_mesh(data=2, view=1, hyp=1, devices=jax.devices()[:2])
    rstate = state.replace(step=replicate(state.step, mesh),
                           params=replicate(state.params, mesh),
                           batch_stats=replicate(state.batch_stats, mesh),
                           opt_state=replicate(state.opt_state, mesh))
    new_state, m = T.train_step(rstate, shard_batch(batch, mesh,
                                                    from_local=True), cfg)
    np.testing.assert_allclose(float(m["train_loss"]),
                               float(ref_m["train_loss"]), rtol=1e-5)
    # Adam turns psum reduction-order noise on a NEAR-ZERO gradient into a
    # +/-lr sign flip (update ~ lr * sign(m) when m, v ~ 0), so single
    # elements can differ by up to ~2*lr; require the overwhelming majority
    # exactly-tight and the worst case within that mechanism's bound.
    leaves_a = jax.tree_util.tree_leaves(new_state.params)
    leaves_b = jax.tree_util.tree_leaves(ref_state.params)
    diffs = np.concatenate([np.abs(np.asarray(a) - np.asarray(b)).ravel()
                            for a, b in zip(leaves_a, leaves_b)])
    assert np.mean(diffs < 2e-5) > 0.999, np.mean(diffs < 2e-5)
    assert diffs.max() < 2.5 * cfg.lr, diffs.max()


@pytest.mark.slow
def test_two_process_rendezvous_matches_single(tmp_path):
    """REAL multi-process coordinator path: two subprocesses, 4 virtual CPU
    devices each, rendezvous via jax.distributed over localhost, shared
    permutation -> disjoint local shards -> global batch assembly -> one DP
    train step; fetched loss and params must equal the single-process step
    (see tools/multiproc_rendezvous.py for the tolerance rationale).

    Recorded reference run (this host, 2026-08-20):
      {"ok": true, "loss_single": 15.472230, "loss_2proc": 15.472231,
       "param_diff_max": 1.95e-3, "param_frac_tight": 0.999994}
    """
    sys.path.insert(0, str(Path(__file__).parents[1] / "tools"))
    import multiproc_rendezvous as MR

    (single,) = MR.launch(1, tmp_path, timeout=600)
    pair = MR.launch(2, tmp_path, timeout=600)
    s = np.load(single)
    a, b = (np.load(p) for p in pair)
    # both processes fetch the same replicated global state: bitwise equal
    np.testing.assert_array_equal(a["params"], b["params"])
    assert a["loss"] == b["loss"]
    # vs single process: same global computation up to psum reduction order;
    # Adam amplifies near-zero-moment noise to ~2*lr per element (see
    # test_data_parallel_step_on_assembled_batch_matches_single)
    assert abs(float(a["loss"]) - float(s["loss"])) < 1e-5 * max(
        1.0, abs(float(s["loss"])))
    diffs = np.abs(a["params"] - s["params"])
    assert np.mean(diffs < 2e-5) > 0.999, np.mean(diffs < 2e-5)
    assert diffs.max() < 2.5e-3, diffs.max()


@pytest.mark.slow
def test_depthmap_sweep_2proc_scaling():
    """Multi-host depthmap-sweep scaling (SURVEY §6 / BASELINE ">=85% at 4
    hosts" target, measured at the host counts this 4-core rig supports):
    two pinned worker processes rendezvous via jax.distributed, run the
    REAL stage-1 entry point (pipeline.depthmaps.run_depthmaps) over
    disjoint view shards, and the launcher asserts the shards reassemble
    BIT-IDENTICALLY to the 1-process sweep.  The timed arm measures the
    steady-state per-view loop (pre-warmed jitted forward — a cold
    run_depthmaps call times persistent-cache lock contention instead).

    Recorded reference runs (this host, 2026-08-21): speedup 2.09 / 1.90
    at nprocs=2 (efficiency 104.5% / 94.8%), fence cost 1.3 ms,
    rendezvous 0.16 s — the sweep is embarrassingly parallel (zero
    steady-state collectives; ref: depthmap_eval.py:37-48 gloo sharding).
    Floor at 0.75 to absorb shared-host scheduler noise."""
    import json as _json
    env = dict(os.environ)
    env["WILDMVS_MP_VIEWS"] = "12"
    tool = str(Path(__file__).parents[1] / "tools" / "multiproc_depthmaps.py")
    out = subprocess.run([sys.executable, tool, "--nprocs", "2"],
                         env=env, capture_output=True, text=True,
                         timeout=1500)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = _json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["ok"] is True           # incl. bit-identical reassembly
    assert rec["nprocs"] == 2
    assert rec["efficiency_samehost"] >= 0.75, rec

"""Real multi-process `jax.distributed` rendezvous on one host (CPU).

The reference actually spawns processes and forms a gloo group
(train.py:315 `mp.spawn`, train.py:52-62 `init_process_group`); our
`dist.mesh.initialize` wraps `jax.distributed.initialize` but round 2 only
ever ran it with one process.  This tool exercises the REAL coordinator
path: N processes, each with 8/N virtual CPU devices, rendezvous over
localhost, build the global (data=8) mesh, derive the shared permutation,
load disjoint local shards (`process_local_order`), assemble the global
batch (`shard_batch(from_local=True)`), replicate the identically-seeded
train state, and run ONE supervised MVSNet train step.  The fetched loss
and updated parameters are written to an npz so a launcher (or
tests/test_multihost.py::test_two_process_rendezvous_matches_single) can
assert the multi-process step equals the single-process one.

Usage:
  worker:   python tools/multiproc_rendezvous.py worker <pid> <nprocs> <port> <out.npz>
  launcher: python tools/multiproc_rendezvous.py            (runs 1-proc + 2-proc, compares)
"""
import json
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
TOTAL_DEVICES = 8


def run_worker(pid: int, nprocs: int, port: int, out_path: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        .replace("--xla_force_host_platform_device_count=8", "").strip()
        + f" --xla_force_host_platform_device_count={TOTAL_DEVICES // nprocs}")
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

    sys.path.insert(0, str(REPO))
    from wildmvs.dist import mesh as M

    # must precede ANY backend-initializing jax call (jax.devices etc.)
    M.initialize(coordinator=f"localhost:{port}", num_processes=nprocs,
                 process_id=pid)

    import jax.numpy as jnp
    from wildmvs.data.synthetic import SyntheticMVSDataset, collate
    from wildmvs.train.config import TrainConfig
    from wildmvs.train import trainer as T
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == TOTAL_DEVICES, jax.device_count()

    mesh = M.make_mesh(data=TOTAL_DEVICES)
    cfg = TrainConfig(architecture="mvsnet", dataset="synthetic",
                      supervised=True, num_depth=8, batch_size=TOTAL_DEVICES)
    ds = SyntheticMVSDataset(num_samples=TOTAL_DEVICES, num_views=3,
                             height=32, width=32, seed=0)

    # shared permutation: every process derives the same epoch order from the
    # same seed (replaces SharedRandomSampler's rank-0 broadcast,
    # utils/SharedRandomSampler.py:45-56)
    order = np.random.default_rng(0).permutation(len(ds))
    local_order, local_bs = M.process_local_order(
        order, cfg.batch_size, num_processes=nprocs, process_id=pid)
    assert local_bs == cfg.batch_size // nprocs

    def to_batch(rows):
        b = collate([ds[int(i)] for i in rows])
        return {k: np.asarray(v) for k, v in b.items() if k != "filename"}

    # identically-seeded init on every process (the full global batch is
    # materializable on any host — synthetic data is deterministic)
    full = {k: jnp.array(v) for k, v in to_batch(order).items()}
    state = T.create_train_state(cfg, jax.random.PRNGKey(0), full)
    state = state.replace(step=M.replicate(state.step, mesh),
                          params=M.replicate(state.params, mesh),
                          batch_stats=M.replicate(state.batch_stats, mesh),
                          opt_state=M.replicate(state.opt_state, mesh))

    gbatch = M.shard_batch(to_batch(local_order[:local_bs]), mesh,
                           from_local=True)
    new_state, m = T.train_step(state, gbatch, cfg)
    loss = float(m["train_loss"])  # replicated scalar -> host fetch fences

    leaves = jax.tree_util.tree_leaves(new_state.params)
    flat = np.concatenate([np.asarray(l).ravel() for l in leaves])
    np.savez(out_path, loss=np.float32(loss), params=flat,
             nprocs=np.int32(nprocs), pid=np.int32(pid))
    print(json.dumps({"pid": pid, "nprocs": nprocs, "loss": loss,
                      "num_params": int(flat.size)}), flush=True)


def free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch(nprocs: int, out_dir: Path, timeout: int = 900):
    """Spawn nprocs workers; returns list of npz paths."""
    port = free_port()
    outs = [out_dir / f"worker_{nprocs}_{p}.npz" for p in range(nprocs)]
    env = dict(os.environ)
    # neutralize the axon sitecustomize (it registers/initializes the TPU
    # backend at interpreter start, which forbids jax.distributed.initialize)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, __file__, "worker", str(p), str(nprocs), str(port),
         str(outs[p])], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for p in range(nprocs)]
    logs = []
    for p, proc in enumerate(procs):
        try:
            stdout, stderr = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append((proc.returncode, stdout, stderr))
    for p, (rc, stdout, stderr) in enumerate(logs):
        if rc != 0:
            raise RuntimeError(
                f"worker {p}/{nprocs} rc={rc}\nstdout:{stdout}\n"
                f"stderr:{stderr[-2000:]}")
    return outs


def main():
    import numpy as np
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        (single,) = launch(1, td)
        pair = launch(2, td)
        s = np.load(single)
        a, b = (np.load(p) for p in pair)
        # the two processes fetch the same replicated global state: bitwise
        np.testing.assert_array_equal(a["params"], b["params"])
        assert a["loss"] == b["loss"]
        # 2-process step vs 1-process step: identical global computation up
        # to psum reduction order (see tests/test_multihost.py tolerance
        # rationale — Adam flips near-zero moments by ~lr)
        assert abs(float(a["loss"]) - float(s["loss"])) < 1e-5 * max(
            1.0, abs(float(s["loss"])))
        diffs = np.abs(a["params"] - s["params"])
        print(json.dumps({
            "ok": True,
            "loss_single": float(s["loss"]), "loss_2proc": float(a["loss"]),
            "param_diff_max": float(diffs.max()),
            "param_frac_tight": float(np.mean(diffs < 2e-5)),
        }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        run_worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                   sys.argv[5])
    else:
        main()

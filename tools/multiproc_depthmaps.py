"""Multi-host depthmap-sweep scaling on CPU: the REAL 2-process path.

The reference shards eval inference over gloo ranks (depthmap_eval.py:37-48
`init_process_group` + rank-strided scene loop); our stage 1 shards
reference views by `i % process_count == process_index`
(pipeline/depthmaps.py).  Round 3 proved the 2-process `jax.distributed`
rendezvous for a TRAIN step; this tool drives STAGE 1 itself through it:

  * N worker processes rendezvous over the localhost coordinator
    (`dist.mesh.initialize`), each pinned to the SAME number of CPU cores
    (taskset) so 1-proc vs N-proc walltimes compare per-process resources —
    the single-host analogue of "per chip".
  * Each worker runs `pipeline.depthmaps.run_depthmaps` over a
    SyntheticSceneDataset with its (process_index, process_count) shard:
    a cold pass (compile, populates the npz cache) then a timed
    `override=True` pass, fenced across processes with
    `sync_global_devices` so walltimes align.
  * The launcher asserts the N-proc shards reassemble BIT-IDENTICALLY to
    the single-process sweep (same jitted program, same inputs), and
    reports speedup + parallel efficiency against the >=85% @ 4 hosts
    BASELINE target.

Collective traffic: the sweep itself is embarrassingly parallel — zero
steady-state collectives; the only cross-process traffic is the
rendezvous + the two sync fences (see COLLECTIVES.md).

Usage:
  launcher: python tools/multiproc_depthmaps.py [--views 12] [--nprocs 2]
  worker:   python tools/multiproc_depthmaps.py worker <pid> <nprocs> <port> <out_dir>
"""
import json
import os
import socket
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

VIEWS = int(os.environ.get("WILDMVS_MP_VIEWS", "16"))
# big enough that per-view inference dominates the fences/dispatch (~2 s
# per 160x224/D96 view on 2 pinned cores); the tiny 64x96 smoke config
# measured fence-dominated "scaling" of 0.3x — meaningless
HW = tuple(int(x) for x in
           os.environ.get("WILDMVS_MP_HW", "160x224").split("x"))
NUM_DEPTH = int(os.environ.get("WILDMVS_MP_DEPTH", "96"))
CORES_PER_PROC = 2


def run_worker(pid: int, nprocs: int, port: int, out_dir: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        .replace("--xla_force_host_platform_device_count=8", "").strip()
        + " --xla_force_host_platform_device_count=1")
    import numpy as np  # noqa: F401
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

    sys.path.insert(0, str(REPO))
    from wildmvs.dist import mesh as M

    t_rdv0 = time.perf_counter()
    M.initialize(coordinator=f"localhost:{port}", num_processes=nprocs,
                 process_id=pid, timeout_s=600)
    rendezvous_s = time.perf_counter() - t_rdv0
    import jax.numpy as jnp  # noqa: F401
    from jax.experimental import multihost_utils
    from wildmvs.data.synthetic import SyntheticSceneDataset
    from wildmvs.models import build_model
    from wildmvs.pipeline.depthmaps import run_depthmaps
    assert jax.process_count() == nprocs, jax.process_count()

    ds = SyntheticSceneDataset(num_views=VIEWS, height=HW[0], width=HW[1],
                               seed=0)
    model = build_model("mvsnet", num_depth=NUM_DEPTH)
    sample = ds[0]
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(sample["imgs"])[None],
        *(jnp.asarray(sample[k])[None] for k in
          ("K", "R", "t", "depth_min", "depth_max")), train=False)

    out = Path(out_dir)
    # cold pass through the REAL stage-1 entry point: compiles (persistent
    # cache) + fills the npz cache that the launcher's reassembly check reads
    run_depthmaps(ds, model, variables, out,
                  process_index=jax.process_index(),
                  process_count=jax.process_count())

    # timed pass: the steady-state per-view loop with ONE pre-warmed jitted
    # forward (a fresh run_depthmaps call would re-trace + hit the shared
    # persistent-cache lock, timing file-lock contention instead of the
    # sweep; a real sweep amortizes trace/compile over hundreds of views)
    fwd = jax.jit(lambda imgs, K, R, t, dmin, dmax: (
        lambda o: (o["depth"], o["photometric_confidence"]))(
            model.apply(variables, imgs, K, R, t, dmin, dmax, train=False)))
    shard = [i for i in range(len(ds))
             if i % jax.process_count() == jax.process_index()]
    samples = [ds[i] for i in shard]          # host-side prep off the clock
    args = [tuple(jnp.asarray(s[k])[None] for k in
                  ("imgs", "K", "R", "t", "depth_min", "depth_max"))
            for s in samples]
    jax.block_until_ready(fwd(*args[0]))      # warm: trace + cache fetch

    multihost_utils.sync_global_devices("sweep_timed_start")
    # pure barrier cost: both procs are already AT the barrier, so a
    # back-to-back second fence times the collective itself
    t_f0 = time.perf_counter()
    multihost_utils.sync_global_devices("fence_cost_probe")
    fence_s = time.perf_counter() - t_f0
    t0 = time.perf_counter()
    for s, a in zip(samples, args):
        depth, prob = fwd(*a)
        import numpy as np
        np.savez_compressed(
            out / (s["filename"].replace("/", "_") + "_timed.npz"),
            depthmap=np.asarray(depth[0], dtype=np.float32),
            probability=np.asarray(prob[0], dtype=np.float32))
    dt_local = time.perf_counter() - t0
    multihost_utils.sync_global_devices("sweep_timed_end")
    dt_fenced = time.perf_counter() - t0
    print(json.dumps({"pid": pid, "nprocs": nprocs,
                      "sweep_s_local": round(dt_local, 3),
                      "sweep_s_fenced": round(dt_fenced, 3),
                      "rendezvous_s": round(rendezvous_s, 3),
                      "fence_s": round(fence_s, 4)}), flush=True)


def free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _have_taskset() -> bool:
    from shutil import which
    return which("taskset") is not None and (os.cpu_count() or 0) >= 4


def launch(nprocs: int, out_dirs, timeout: int = 1200,
           cores_per_proc: int = CORES_PER_PROC):
    """Spawn nprocs pinned workers; returns per-worker parsed timing dicts."""
    port = free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    for p in range(nprocs):
        cmd = [sys.executable, __file__, "worker", str(p), str(nprocs),
               str(port), str(out_dirs[p])]
        if _have_taskset():
            lo = p * cores_per_proc
            cmd = ["taskset", "-c", f"{lo}-{lo + cores_per_proc - 1}"] + cmd
        procs.append(subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE, text=True))
    stats = []
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
            raise RuntimeError(f"worker {p}/{nprocs} rc={rc}\n"
                               f"stdout:{stdout}\nstderr:{stderr[-2000:]}")
        stats.append(json.loads(stdout.strip().splitlines()[-1]))
    return stats


def main(nprocs: int = 2):
    """Three arms:
      (1) 1 proc x CORES_PER_PROC cores  — the per-"chip" baseline;
      (2) N procs x CORES_PER_PROC cores — the sharded sweep under test;
      (3) 1 proc x N*CORES_PER_PROC cores — the HOST CEILING: the same
          total silicon in one process.  On a single shared-memory host,
          arm (2) contends for memory bandwidth that real multi-HOST
          deployments do not share, so the honest multi-host efficiency
          estimate is arm3/arm2 (process-sharding overhead at equal
          silicon: rendezvous + 2 fences + any imbalance), while
          arm1/(N*arm2) reports raw same-host scaling for completeness."""
    import numpy as np
    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        d1 = td / "single"
        dn = td / "multi"          # all N workers share the out_dir: the
        dc = td / "ceiling"        # shards interleave into one cache
        d1.mkdir(), dn.mkdir(), dc.mkdir()
        (s1,) = launch(1, [d1])
        sn = launch(nprocs, [dn] * nprocs)
        (sc,) = launch(1, [dc], cores_per_proc=nprocs * CORES_PER_PROC)

        # shard reassembly: every view present exactly once, bit-identical
        files1 = sorted(d1.glob("*_out.npz"))
        filesn = sorted(dn.glob("*_out.npz"))
        assert [f.name for f in files1] == [f.name for f in filesn], (
            files1, filesn)
        assert len(files1) == VIEWS
        for f1, fn in zip(files1, filesn):
            a, b = np.load(f1), np.load(fn)
            np.testing.assert_array_equal(a["depthmap"], b["depthmap"])
            np.testing.assert_array_equal(a["probability"], b["probability"])

        t1 = s1["sweep_s_fenced"]
        tn = max(s["sweep_s_fenced"] for s in sn)
        tc = sc["sweep_s_fenced"]
        speedup = t1 / tn
        print(json.dumps({
            "ok": True, "views": VIEWS, "nprocs": nprocs,
            "pinned": _have_taskset(),
            "sweep_s_1proc": t1, "sweep_s_nproc": tn,
            "sweep_s_hostceiling": tc,
            "speedup": round(speedup, 3),
            "efficiency_samehost": round(speedup / nprocs, 3),
            # sharding overhead at equal silicon — the multi-host estimate
            "efficiency_vs_ceiling": round(tc / tn, 3),
            "workers_nproc": sn,
        }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        run_worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                   sys.argv[5])
    else:
        np_ = 2
        if "--nprocs" in sys.argv:
            np_ = int(sys.argv[sys.argv.index("--nprocs") + 1])
        main(np_)

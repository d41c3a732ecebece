"""Headline benchmark: depthmap inference throughput, single chip.

Primary metric: the flagship forward (MVSNet, N=3 views, 512x640, 192 depth
hypotheses — the reference's DTU training configuration,
data/dtu_yao.py:41-42 + models/MVSNet/model.py:98).  The same JSON line also
carries the other two architecture families at their training-res eval
configurations plus all three at the TRUE DTU eval-protocol resolution:
full-res 1200x1600 images /32-cropped to 1184x1600 (data/MVSDataset.py:77),
nviews=5, fed to every architecture at full resolution
(evaluation/run_depthmaps.py:55-58 passes the dataset images straight to the
net; the per-arch `downscale` in pipeline_utils.py:133-154 is the output
depthmap scale consumed by filtering.py:51-58, not an input resize).

Timeout-proofing: a complete JSON record line is printed (flushed) after
EVERY measurement, starting with the headline — the driver parses the last
complete line, so a timeout mid-extras can never lose the round's record
(the round-2 failure mode: BENCH_r02.json rc=124, parsed=null).

vs_baseline normalizes by the reference torch implementation's estimated
A100 throughput for the identical config.  Derivation (BASELINE.md
"Baseline anchor"): measured torch-CPU reference throughput on this host
(0.376 maps/s, tools/bench_torch_ref.py) x our own measured CPU->TPU
scaling (22.4x) as a charitable proxy for torch's CPU->A100 scaling.
Revised whenever a direct GPU measurement becomes available.
"""
import json
import os
import time

import numpy as np

BASELINE_DEPTHMAPS_PER_S = 8.4

# eval-protocol (1184x1600 N5, DTU-geometry rig) reference anchors:
# torch reference measured on this host's CPU (tools/bench_torch_ref_evalres
# .py, 2026-08-21: mvsnet 0.01825 / vis 0.02619 / cvp 0.00872 maps/s) x the
# same measured 22.4x CPU->TPU scaling the headline anchor uses
# (BASELINE.md "Baseline anchor") = charitable torch-A100 estimates.
EVALRES_BASELINE = {
    "mvsnet_eval_1184x1600_N5_maps_s": 0.01825 * 22.4,
    "mvsnet_eval_1184x1600_N5_rect_maps_s": 0.01825 * 22.4,
    "vis_eval_1184x1600_N5_maps_s": 0.02619 * 22.4,
    # same anchor: torch's conv/grid_sample timing is weight- and
    # content-independent, so the trained-regime measurement divides by
    # the identical reference throughput
    "vis_eval_1184x1600_N5_trained_maps_s": 0.02619 * 22.4,
    "cvp_eval_1184x1600_N5_maps_s": 0.00872 * 22.4,
    "cvp_eval_1184x1600_N5_rect_maps_s": 0.00872 * 22.4,
}

# experiment hook: sweep backend override (see wildmvs/models/mvsnet.py)
SWEEP_METHOD = os.environ.get("WILDMVS_BENCH_METHOD", "auto")

# set WILDMVS_BENCH_EXTRAS=0 to skip the vis/cvp measurements (faster runs
# while iterating on the headline kernel); WILDMVS_BENCH_EVALRES=0 to skip
# the eval-protocol-resolution measurements
EXTRAS = os.environ.get("WILDMVS_BENCH_EXTRAS", "1") != "0"
EVALRES = os.environ.get("WILDMVS_BENCH_EVALRES", "1") != "0"


def scene(b, n, h, w, f):
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    imgs = jnp.array(rng.random((b, n, h, w, 3)).astype(np.float32))
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    K = jnp.array(np.tile(K, (b, n, 1, 1)))
    R = jnp.array(np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1)))
    t = np.zeros((b, n, 3, 1), np.float32)
    for i in range(n):
        t[:, i, 0, 0] = 0.1 * i
    t = jnp.array(t)
    dmin = jnp.full((b, n), 425.0)
    dmax = jnp.full((b, n), 935.0)
    return imgs, K, R, t, dmin, dmax


def scene_dtu(b, n, h, w, f):
    """DTU-like rig: cameras on a ~650mm sphere, ~6 deg steps (pair.txt
    neighbor geometry). Unlike `scene` (mm-scale baselines kept for
    round-over-round headline comparability), this produces the REAL warp
    spans, so the kernel-vs-gather dispatch exercises the branches the
    eval protocol actually takes (tools/eval_span_study.py)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    imgs = jnp.array(rng.random((b, n, h, w, 3)).astype(np.float32))
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    Ks, Rs, ts = [], [], []
    up = np.array([0.0, -1.0, 0.0])
    for i in range(n):
        az = np.deg2rad(6.0) * ((i + 1) // 2) * (-1) ** i
        el = np.deg2rad(3.0) * (i % 3 - 1)
        d = np.array([np.sin(az) * np.cos(el), np.sin(el),
                      -np.cos(az) * np.cos(el)])
        eye = -650.0 * d
        z = -eye / np.linalg.norm(eye)
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], 0).astype(np.float32)
        ts.append((-R @ eye).astype(np.float32).reshape(3, 1))
        Rs.append(R)
        Ks.append(K)
    K = jnp.array(np.tile(np.stack(Ks)[None], (b, 1, 1, 1)))
    R = jnp.array(np.tile(np.stack(Rs)[None], (b, 1, 1, 1)))
    t = jnp.array(np.tile(np.stack(ts)[None], (b, 1, 1, 1)))
    dmin = jnp.full((b, n), 425.0)
    dmax = jnp.full((b, n), 935.0)
    return imgs, K, R, t, dmin, dmax


def small_init(model, args, kwargs):
    """Initialize parameters via ONE jitted program at a small spatial
    size (64x96).

    Parameter shapes depend only on channel structure, never on H/W, and
    values only on shapes + RNG — so a 64x96 init produces the identical
    variables.  The old eager full-res init instead dispatched thousands
    of ops through the tunnel at ~33 ms RTT each — the reason every
    "cached" bench run still blew the driver budget through round 4.  The
    jitted init is a small program that persists in .jax_cache like any
    other; the sweep backend contributes no parameters, so it is cloned
    to the pure-XLA gather to keep the init graph trivial."""
    import jax
    import jax.numpy as jnp
    b, n = args[0].shape[:2]
    rng = np.random.default_rng(0)
    mini = (jnp.asarray(rng.random((b, n, 64, 96, 3)), jnp.float32)
            .astype(args[0].dtype),) + tuple(args[1:])
    init_model = (model.clone(sweep_method="gather")
                  if hasattr(model, "sweep_method") else model)
    fn = jax.jit(lambda a: init_model.init(jax.random.PRNGKey(0), *a,
                                           train=False, **kwargs))
    return fn(mini)


# WILDMVS_BENCH_SMOKE=1: one iteration, one repeat — functional smoke of
# the whole bench path (field names, init, dispatch) without real timing
SMOKE = os.environ.get("WILDMVS_BENCH_SMOKE", "0") == "1"


# v5e single-chip hardware ceilings for the roofline fields (public spec:
# 16 GB HBM @ 819 GB/s, 197 bf16 TFLOP/s)
V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0


def time_model(model, args, kwargs, iters, repeats=3, info=None,
               variables=None):
    """Best-of-repeats seconds per forward.

    NOTE: on the tunneled axon backend, block_until_ready does not actually
    synchronize; the only reliable fence is a host fetch. We therefore chain
    `iters` forwards in ONE device program (scan over input perturbations,
    which also defeats CSE) and fetch a scalar at the end.

    `info` (optional dict) receives per-measurement diagnostics:
      * spread_pct — (max-min)/best over the timing repeats (VERDICT r4
        item 6: the 3x-boundary eval-res calls need spread, not a point);
      * bytes_gb / tflops — XLA's own cost analysis of the compiled chain,
        per forward;
      * roofline_ms / roofline_frac — the v5e HBM-roofline time for that
        byte traffic and the fraction of it this measurement achieves
        (VERDICT r4 item 4: grounds "fast" in what the chip can physically
        do for this gather/bandwidth-bound workload, instead of only the
        derived A100 anchor).
    """
    import jax
    import jax.numpy as jnp
    if SMOKE:
        iters, repeats = 1, 1
    imgs = args[0]
    if variables is None:
        variables = small_init(model, args, kwargs)

    @jax.jit
    def forward_chain(v, imgs):
        def body(carry, eps):
            out = model.apply(v, imgs + eps, *args[1:], train=False,
                              **kwargs)["depth"]
            return carry + out.sum().astype(jnp.float32), None
        total, _ = jax.lax.scan(body, jnp.zeros(()),
                                jnp.arange(iters, dtype=imgs.dtype) * 1e-6)
        return total

    float(forward_chain(variables, imgs))  # compile+warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(forward_chain(variables, imgs))
        times.append(time.perf_counter() - t0)
    best = min(times)
    if info is not None:
        info["spread_pct"] = round(100.0 * (max(times) - best)
                                   / max(best, 1e-9), 2)
        try:
            compiled = forward_chain.lower(variables, imgs).compile()
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            bytes_fw = float(ca.get("bytes accessed", 0.0)) / iters
            flops_fw = float(ca.get("flops", 0.0)) / iters
            if bytes_fw > 0:
                roof_s = bytes_fw / (V5E_HBM_GBPS * 1e9)
                info["bytes_gb"] = round(bytes_fw / 1e9, 3)
                info["roofline_ms"] = round(roof_s * 1e3, 2)
                info["roofline_frac"] = round(roof_s / (best / iters), 3)
            if flops_fw > 0:
                info["tflops"] = round(flops_fw / 1e12, 4)
                info["mfu_pct"] = round(
                    100.0 * (flops_fw / (best / iters))
                    / (V5E_BF16_TFLOPS * 1e12), 2)
        except Exception as e:   # cost analysis is best-effort per backend
            info["cost_analysis_error"] = str(e)[:120]
    return best / iters


def _timed_trained_vis(info):
    import jax.numpy as jnp
    from wildmvs.data.synthetic import render_rig_plane
    from wildmvs.models import build_model
    from wildmvs.train.checkpoint import load_params_npz

    asset = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "assets", "vis_synth_trained.npz")
    params, stats, meta = load_params_npz(asset)
    _, K, R, t, dmin, dmax = scene_dtu(1, 5, 1184, 1600, 2892.0)
    Kn, Rn, tn = (np.asarray(a[0]) for a in (K, R, t))
    imgs_np, _ = render_rig_plane(Kn, Rn, tn, 1184, 1600,
                                  plane=(-30.0, 0.12, -0.08),
                                  extent=320.0, seed=0)
    args = (jnp.asarray(imgs_np)[None], K, R, t, dmin, dmax)
    model = build_model("vis_mvsnet", depth_nums=(64, 32, 16),
                        interval_scales=(2.0, 1.0, 0.5), dtype=jnp.bfloat16)
    return time_model(model, args, {}, iters=3, info=info,
                      variables={"params": params, "batch_stats": stats})


def main():
    import sys
    import jax
    import jax.numpy as jnp
    from wildmvs.models import build_model

    # persistent compilation cache: the tunnel's cold compiles dominate the
    # wall clock (the 3-architecture run exceeds 25 min cold); cached reruns
    # skip them entirely
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    t_start = time.time()

    def note(msg):
        print(f"[t+{time.time() - t_start:5.0f}s] {msg}", file=sys.stderr,
              flush=True)

    record = {}

    def emit():
        # one complete record line per measurement; the driver keeps the
        # last complete JSON line, so progress is never lost to a timeout
        print(json.dumps(record), flush=True)

    # ---- headline: MVSNet 512x640 D192 N3, bf16 compute ----
    note("bench: compiling/timing mvsnet headline ...")
    args = scene(1, 3, 512, 640, 720.0)
    model = build_model("mvsnet", num_depth=192, dtype=jnp.bfloat16,
                        sweep_method=SWEEP_METHOD)
    headline_info = {}
    dt = time_model(model, args, {}, iters=10, info=headline_info)
    value = 1.0 / dt

    record.update({
        "metric": "mvsnet_depthmap_inference_512x640_D192_N3",
        "value": round(value, 3),
        "unit": "depthmaps/s",
        "vs_baseline": round(value / BASELINE_DEPTHMAPS_PER_S, 3),
    })
    for k, v in headline_info.items():
        record[f"headline_{k}"] = v
    note(f"bench: headline {record['value']} maps/s")
    emit()

    # graceful deadline: the driver kills the bench at ~1500 s; on a
    # slow-tunnel day (per-config compile-cache fetches have been observed
    # to take 3x their usual time) finishing early with the fields we have
    # beats an rc=124 that loses the record's tail
    deadline = float(os.environ.get("WILDMVS_BENCH_DEADLINE", "1380"))

    def measure(key, fn):
        if time.time() - t_start > deadline:
            record[f"{key}_skipped"] = "deadline"
            emit()
            return
        try:
            note(f"bench: compiling/timing {key} ...")
            info = {}
            record[key] = round(fn(info), 3)
            note(f"bench: {key} = {record[key]}")
            if key in EVALRES_BASELINE:
                record[f"{key}_vs_baseline"] = round(
                    record[key] / EVALRES_BASELINE[key], 3)
            for k, v in info.items():
                record[f"{key}_{k}"] = v
        except Exception as e:  # never lose prior fields to one crash
            record[f"{key}_error"] = str(e)[:200]
        emit()

    if EXTRAS:
        # training-res zoo configs (round-over-round comparable fields)
        measure("vis_mvsnet_maps_s", lambda info: 1.0 / time_model(
            build_model("vis_mvsnet", depth_nums=(64, 32, 16),
                        interval_scales=(2.0, 1.0, 0.5), dtype=jnp.bfloat16),
            scene(1, 3, 256, 320, 360.0), {}, iters=6, info=info))
        measure("cvp_mvsnet_maps_s", lambda info: 1.0 / time_model(
            build_model("cvp_mvsnet", dtype=jnp.bfloat16),
            args, {"nscale": 5}, iters=6, info=info))

    if EVALRES:
        # true DTU eval protocol: ALL architectures consume the full-res
        # /32-cropped images (1200x1600 -> 1184x1600, data/MVSDataset.py:77
        # multi=32; dtu_yao_eval.py feeds them uncropped to the net,
        # run_depthmaps.py:55-58). The per-arch `downscale` in
        # pipeline_utils.py:133-154 is the OUTPUT depth/image scale used by
        # filtering.py:51-58 to upsample depth back to image coords (mvsnet
        # /4 -> 296x400 maps, vis /2 -> 592x800, cvp /1), NOT an input
        # resize. f=2892 matches DTU full-res intrinsics; the DTU-like rig
        # makes the warp spans (and so the kernel dispatch) realistic.
        measure("mvsnet_train_dtugeo_maps_s", lambda info: 1.0 / time_model(
            build_model("mvsnet", num_depth=192, dtype=jnp.bfloat16,
                        sweep_method=SWEEP_METHOD),
            scene_dtu(1, 3, 512, 640, 1156.8), {}, iters=10, info=info))
        measure("mvsnet_eval_1184x1600_N5_maps_s", lambda info: 1.0 / time_model(
            build_model("mvsnet", num_depth=192, dtype=jnp.bfloat16,
                        sweep_method=SWEEP_METHOD),
            scene_dtu(1, 5, 1184, 1600, 2892.0), {}, iters=4, info=info))
        # the rectified (H_inf-factored) sweep — the fast eval-protocol
        # config (pipeline --sweep_method rect; ops/rect_sweep.py, exact
        # gather fallback, approximation bounded by tests/test_rect_sweep)
        measure("mvsnet_eval_1184x1600_N5_rect_maps_s",
                lambda info: 1.0 / time_model(
                    build_model("mvsnet", num_depth=192,
                                dtype=jnp.bfloat16, sweep_method="rect"),
                    scene_dtu(1, 5, 1184, 1600, 2892.0), {}, iters=4, info=info))
        measure("vis_eval_1184x1600_N5_maps_s", lambda info: 1.0 / time_model(
            build_model("vis_mvsnet", depth_nums=(64, 32, 16),
                        interval_scales=(2.0, 1.0, 0.5), dtype=jnp.bfloat16),
            scene_dtu(1, 5, 1184, 1600, 2892.0), {}, iters=3, info=info))

        # PRODUCTION-regime vis: trained weights on a rendered textured
        # scene.  The random-weights field above recenters stages 2-3 on
        # argmin-of-noise slabs, which forces the exact-gather fallback on
        # every pair (tools/dispatch_census.py) — a regime no deployed
        # network is in.  A net trained via the real train CLI
        # (assets/vis_synth_trained.npz, tools/make_trained_assets.py)
        # produces the smooth slabs the TIER_B kernels are built for.  The
        # torch anchor transfers unchanged: torch's dense conv /
        # grid_sample timing does not branch on weight values or image
        # content (no data-dependent dispatch in the reference model).
        measure("vis_eval_1184x1600_N5_trained_maps_s",
                lambda info: 1.0 / _timed_trained_vis(info))
        measure("cvp_eval_1184x1600_N5_maps_s", lambda info: 1.0 / time_model(
            build_model("cvp_mvsnet", dtype=jnp.bfloat16),
            scene_dtu(1, 5, 1184, 1600, 2892.0), {"nscale": 5}, iters=3, info=info))
        # the eval pipeline's PRODUCTION default for cvp since r4
        # (eval_model_kwargs: rect, 1.63x, ~exact — BASELINE.md round 4)
        measure("cvp_eval_1184x1600_N5_rect_maps_s",
                lambda info: 1.0 / time_model(
                    build_model("cvp_mvsnet", dtype=jnp.bfloat16,
                                sweep_method="rect"),
                    scene_dtu(1, 5, 1184, 1600, 2892.0), {"nscale": 5},
                    iters=3, info=info))


if __name__ == "__main__":
    main()

"""Eval-resolution baseline anchor: reference torch zoo at the TRUE DTU
eval protocol (1184x1600, N=5, full-res /32-cropped images,
evaluation/run_depthmaps.py:55-58) on this host's CPU.

VERDICT round 3 ("What's weak" #5): `vs_baseline` existed only for the
headline config.  This measures the torch reference forward for all three
architecture families at the eval protocol, the same way
tools/bench_torch_ref.py anchored the 512x640 headline: the measured
torch-CPU throughput x the measured CPU->TPU scaling factor (22.4x,
BASELINE.md "Baseline anchor") gives the charitable torch-A100 estimate
that bench.py's eval-res `vs_baseline` fields divide by.

Each architecture runs in its own subprocess (isolates a potential OOM /
f64 slowness of one family from the others' measurements) on the DTU-like
rig geometry bench.py's eval configs use.

Usage: timeout 5400 python tools/bench_torch_ref_evalres.py
       [--arch mvsnet|vis_mvsnet|cvp_mvsnet]  (subprocess entry)
Prints one JSON line per measurement + a combined line at the end.
"""
import argparse
import json
import subprocess
import sys
import time

import numpy as np

REPO = "/root/repo"
REF = "/root/reference"

H, W, N = 1184, 1600, 5
ITERS = 2


def scene_np():
    sys.path.insert(0, REPO)
    from bench import scene_dtu
    imgs, K, R, t, dmin, dmax = scene_dtu(1, N, H, W, 2892.0)
    return tuple(np.asarray(a) for a in (imgs, K, R, t, dmin, dmax))


def neutralize_cuda():
    import types
    import torch
    sys.path.insert(0, REF)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.empty_cache = lambda: None
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.utils = types.ModuleType("torchvision.utils")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.transforms.__getattr__ = lambda name: type(name, (), {})
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv.utils
        sys.modules["torchvision.transforms"] = tv.transforms
    # CVP's modules.py:12 np.seterr(all='raise') poisons later numpy calls
    saved = np.geterr()
    try:
        import models.CVP_MVSNet.models.modules  # noqa: F401
    finally:
        np.seterr(**saved)


def run_arch(arch: str):
    import torch
    neutralize_cuda()
    torch.manual_seed(0)
    kwargs = {}
    if arch == "mvsnet":
        from models.MVSNet.model import MVSNet as Net
        net = Net(aggregation="variance").eval()
    elif arch == "vis_mvsnet":
        from models.VisMVSNet.frontend import Frontend as Net
        net = Net().eval()
        # eval config, pipeline_utils.py:142-146
        kwargs = dict(depth_nums=[64, 32, 16],
                      interval_scales=[2.0, 1.0, 0.5])
    else:
        from models.CVP_MVSNet.frontend import Frontend as Net
        net = Net().eval()
        net.model.nscale = 5          # pipeline_utils.py:133-136
    imgs, K, R, t, dmin, dmax = scene_np()
    timgs = torch.from_numpy(imgs).permute(0, 1, 4, 2, 3).contiguous()
    targs = (timgs, torch.from_numpy(K), torch.from_numpy(R),
             torch.from_numpy(t), torch.from_numpy(dmin),
             torch.from_numpy(dmax))
    best = float("inf")
    with torch.no_grad():
        for i in range(ITERS):
            t0 = time.perf_counter()
            net(*targs, **kwargs)
            best = min(best, time.perf_counter() - t0)
    print(json.dumps({"arch": arch, "torch_ref_s_per_map": round(best, 2),
                      "torch_ref_maps_s": round(1.0 / best, 5)}), flush=True)


def main():
    results = {}
    for arch in ("mvsnet", "vis_mvsnet", "cvp_mvsnet"):
        proc = subprocess.run(
            [sys.executable, __file__, "--arch", arch],
            capture_output=True, text=True, timeout=5000)
        if proc.returncode != 0:
            results[arch] = {"error": proc.stderr[-400:]}
            print(json.dumps({"arch": arch,
                              "error": proc.stderr[-400:]}), flush=True)
            continue
        line = proc.stdout.strip().splitlines()[-1]
        print(line, flush=True)
        results[arch] = json.loads(line)
    print(json.dumps({"config": f"{H}x{W}_N{N}_f32_cpu_dtugeo",
                      "iters": ITERS, **{
                          a: r.get("torch_ref_maps_s", None)
                          for a, r in results.items()}}))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default=None)
    args = p.parse_args()
    if args.arch:
        run_arch(args.arch)
    else:
        main()

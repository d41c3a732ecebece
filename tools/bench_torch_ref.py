"""Baseline anchor: reference torch MVSNet vs wildmvs, same host CPU.

VERDICT round 1 ("What's missing" #1): bench.py's vs_baseline divided by an
ESTIMATED 4.0 maps/s A100 reference throughput.  This tool produces the
measured leg of a traceable derivation: the actual reference implementation
(/root/reference, models/MVSNet/model.py:178) and wildmvs, both on this
host's CPU, at the identical 512x640 / D192 / N3 / f32 configuration the
headline metric uses.  The CPU-vs-CPU ratio isolates the framework factor
from the hardware factor; BASELINE.md combines it with public
MVSNet-class GPU timings to anchor the A100 denominator.

Usage: timeout 3600 python tools/bench_torch_ref.py [--iters 3] [--small]
Prints one JSON line with both measurements.
"""
import argparse
import json
import sys
import time
import types

import numpy as np

REF = "/root/reference"


def neutralize_cuda_and_import():
    """Make the reference importable on CPU (same recipe as
    tests/test_reference_parity.py: no-op .cuda(), stub torchvision)."""
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


def scene_np(b, n, h, w):
    rng = np.random.default_rng(0)
    imgs = rng.random((b, n, h, w, 3)).astype(np.float32)
    K = np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]],
                 np.float32)
    K = np.tile(K, (b, n, 1, 1))
    R = np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1))
    t = np.zeros((b, n, 3, 1), np.float32)
    for i in range(n):
        t[:, i, 0, 0] = 0.1 * i
    dmin = np.full((b, n), 425.0, np.float32)
    dmax = np.full((b, n), 935.0, np.float32)
    return imgs, K, R, t, dmin, dmax


def bench_torch(args_np, iters, num_depth):
    import torch
    neutralize_cuda_and_import()
    from models.MVSNet.model import MVSNet as RefMVSNet
    torch.manual_seed(0)
    net = RefMVSNet(aggregation="variance").eval()
    net.num_depth = num_depth  # model.py:98 fixed 192; align for --small
    imgs, K, R, t, dmin, dmax = args_np
    timgs = torch.from_numpy(imgs).permute(0, 1, 4, 2, 3).contiguous()
    targs = (timgs, torch.from_numpy(K), torch.from_numpy(R),
             torch.from_numpy(t), torch.from_numpy(dmin),
             torch.from_numpy(dmax))
    with torch.no_grad():
        net(*targs)  # warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            net(*targs)
            best = min(best, time.perf_counter() - t0)
    return best


def bench_wildmvs_cpu(args_np, iters, num_depth):
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from wildmvs.models import build_model
    args = tuple(jnp.array(a) for a in args_np)
    model = build_model("mvsnet", num_depth=num_depth)  # f32, same as torch
    variables = model.init(jax.random.PRNGKey(0), *args, train=False)
    fwd = jax.jit(lambda v, a: model.apply(v, *a, train=False)["depth"])
    float(fwd(variables, args).sum())  # compile+warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fwd(variables, args).sum())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--small", action="store_true",
                   help="256x320/D64 config for a quick smoke run")
    args = p.parse_args()
    h, w, d = (256, 320, 64) if args.small else (512, 640, 192)
    args_np = scene_np(1, 3, h, w)

    dt_ours = bench_wildmvs_cpu(args_np, args.iters, d)
    dt_ref = bench_torch(args_np, args.iters, d)
    print(json.dumps({
        "config": f"{h}x{w}_D{d}_N3_f32_cpu",
        "torch_ref_s_per_map": round(dt_ref, 3),
        "wildmvs_s_per_map": round(dt_ours, 3),
        "torch_ref_maps_s": round(1.0 / dt_ref, 4),
        "wildmvs_maps_s": round(1.0 / dt_ours, 4),
        "wildmvs_over_torch": round(dt_ref / dt_ours, 3),
    }))


if __name__ == "__main__":
    main()

"""Per-phase collective inventory of the multi-chip dryrun programs.

The ≥85%-at-4-hosts scaling target (BASELINE.md) cannot be *measured*
without hardware, but it can be made analyzable: this tool compiles each
dryrun phase on the virtual 8-device CPU mesh, walks the optimized HLO,
and tabulates every cross-device collective (op kind, tensor shapes, bytes
moved per step) next to the step's FLOP count — the inputs to a roofline
scaling estimate (collective bytes / ICI bandwidth vs FLOPs / chip).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/collective_inventory.py
"""
import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1, "f64": 8}


def _shape_bytes(shape_str: str) -> int:
    """'f32[4,8,16]{...}' -> byte size (0 for tuple/token fragments)."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str.strip())
    if not m:
        return 0
    dt, dims = m.groups()
    if dt not in _DTYPE_BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def inventory(compiled) -> dict:
    """Collective table of a jax compiled object."""
    txt = compiled.as_text()
    rows = {}
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = ((?:\([^)]*\)|[\w\[\],{}/ ]+?)) "
                     r"([\w\-]+)\(", ls)
        if not m:
            continue
        shape_str, op = m.groups()
        base = op.rstrip("-start").rstrip("-done") if False else op
        kind = None
        for c in COLLECTIVES:
            if op == c or op.startswith(c + "-"):
                kind = c
                break
        if kind is None:
            continue
        # bytes = sum over output fragments
        frags = re.findall(r"\w+\[[\d,]*\]", shape_str)
        b = sum(_shape_bytes(f) for f in frags)
        r = rows.setdefault(kind, [0, 0])
        r[0] += 1
        r[1] += b
    try:
        flops = compiled.cost_analysis()
        flops = float(flops.get("flops", 0.0)) if isinstance(flops, dict) \
            else float(flops[0].get("flops", 0.0))
    except Exception:
        flops = float("nan")
    return {"collectives": rows, "flops": flops}


def fmt(name, inv):
    out = [f"### {name}", f"step FLOPs: {inv['flops']:.3e}"]
    total = 0
    if not inv["collectives"]:
        out.append("(no collectives)")
    for kind, (cnt, b) in sorted(inv["collectives"].items()):
        out.append(f"- {kind}: {cnt} ops, {b / 1e6:.3f} MB/step")
        total += b
    out.append(f"- TOTAL collective traffic: {total / 1e6:.3f} MB/step")
    return "\n".join(out)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from __graft_entry__ import _tiny_batch
    from wildmvs.dist.mesh import make_mesh, replicate, shard_batch
    from wildmvs.models import build_model
    from wildmvs.train import trainer as T
    from wildmvs.train.config import TrainConfig

    reports = []

    # phase 1: DP x hyp supervised train step
    mesh = make_mesh(data=4, view=1, hyp=2)
    cfg = TrainConfig(architecture="mvsnet", dataset="synthetic",
                      supervised=True, num_depth=16, hyp_axis="hyp",
                      batch_size=4)
    batch = _tiny_batch(4)
    state = T.create_train_state(cfg, jax.random.PRNGKey(0), batch)
    sb = shard_batch(batch, mesh)
    rstate = state.replace(
        step=replicate(state.step, mesh), params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh))
    with jax.set_mesh(mesh):
        lowered = jax.jit(lambda s, b: T.train_step(s, b, cfg)).lower(rstate,
                                                                      sb)
        reports.append(fmt("phase 1: data=4 x hyp=2 supervised DP train step",
                           inventory(lowered.compile())))

    # phase 2: view-parallel occ_masking step
    from wildmvs.dist.view_parallel import make_view_parallel_train_step
    mesh2 = make_mesh(data=2, view=4, hyp=1)
    cfg2 = TrainConfig(architecture="mvsnet", dataset="synthetic",
                       supervised=False, occ_masking=True, num_im_train=4,
                       num_depth=8, batch_size=2)
    batch2 = _tiny_batch(2, n=4)
    state2 = T.create_train_state(cfg2, jax.random.PRNGKey(0), batch2)
    step2 = make_view_parallel_train_step(mesh2, cfg2)
    rstate2 = state2.replace(
        step=replicate(state2.step, mesh2),
        params=replicate(state2.params, mesh2),
        batch_stats=replicate(state2.batch_stats, mesh2),
        opt_state=replicate(state2.opt_state, mesh2))
    lowered2 = jax.jit(step2).lower(rstate2, shard_batch(batch2, mesh2))
    reports.append(fmt("phase 2: data=2 x view=4 occ_masking train step",
                       inventory(lowered2.compile())))

    # phase 3: vis_mvsnet pair+slab-sharded eval
    mesh3 = make_mesh(data=1, view=2, hyp=4)
    model3 = build_model("vis_mvsnet", depth_nums=(8, 8, 8),
                         interval_scales=(4.0, 2.0, 1.0),
                         view_axis="view", hyp_axis="hyp")
    b3 = _tiny_batch(1)
    args3 = (b3["imgs"], b3["K"], b3["R"], b3["t"], b3["depth_min"],
             b3["depth_max"])
    v3 = model3.init(jax.random.PRNGKey(0), *args3, train=False)
    with jax.set_mesh(mesh3):
        lowered3 = jax.jit(
            lambda v, a: model3.apply(v, *a, train=False)["depth"]
        ).lower(v3, args3)
        reports.append(fmt("phase 3: view=2 x hyp=4 vis_mvsnet eval",
                           inventory(lowered3.compile())))

    text = ("# Collective inventory (virtual 8-device mesh dryrun)\n\n"
            "Generated by tools/collective_inventory.py — bytes moved by\n"
            "cross-device collectives per step, per dryrun phase, beside\n"
            "the step FLOPs: the inputs for a roofline estimate of the\n"
            "multi-host scaling target (BASELINE.md) until real multi-chip\n"
            "hardware is available. CPU-mesh HLO; on real TPUs XLA picks\n"
            "ICI-topology-specific algorithms, but op KINDS and byte counts\n"
            "are set by the sharding, not the backend.\n\n"
            + "\n\n".join(reports) + "\n")
    print(text)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "COLLECTIVES.md")
    with open(out, "w") as f:
        f.write(text)
    print(f"(written to {out})")


if __name__ == "__main__":
    main()

"""Compile the flagship forward and account its optimized-HLO byte traffic.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/hlo_account.py [out.hlo]

Lowers the bench configuration (MVSNet bf16, 512x640, D=192, N=3) for the
default (TPU) backend, writes the optimized HLO text, and prints the
top-level ops grouped by kind with their output-shape byte sizes — the
quick way to spot materialized copies/transposes/broadcasts that XLA
should have fused away (see BASELINE.md warp-study notes).
"""
import collections
import re
import sys

import numpy as np


def shape_bytes(shape_str: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dtype, dims = m.groups()
    nbytes = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
              "s8": 1, "u8": 1, "pred": 1, "s64": 8, "f64": 8}.get(dtype, 4)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * nbytes


def main():
    import jax
    import jax.numpy as jnp
    from wildmvs.models import build_model

    b, n, h, w, d = 1, 3, 512, 640, 192
    rng = np.random.default_rng(0)
    imgs = jnp.array(rng.random((b, n, h, w, 3)).astype(np.float32))
    K = np.array([[720.0, 0, w / 2], [0, 720.0, h / 2], [0, 0, 1]], np.float32)
    K = jnp.array(np.tile(K, (b, n, 1, 1)))
    R = jnp.array(np.tile(np.eye(3, dtype=np.float32), (b, n, 1, 1)))
    t = np.zeros((b, n, 3, 1), np.float32)
    for i in range(n):
        t[:, i, 0, 0] = 0.1 * i
    t = jnp.array(t)
    dmin = jnp.full((b, n), 425.0)
    dmax = jnp.full((b, n), 935.0)

    method = sys.argv[2] if len(sys.argv) > 2 else "auto"
    model = build_model("mvsnet", num_depth=d, dtype=jnp.bfloat16,
                        sweep_method=method)
    # abstract init (no device compute, no remote compile) — we only need
    # shapes/dtypes to lower the forward
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), imgs, K, R, t, dmin, dmax,
                           train=False))

    def fwd(v, imgs):
        return model.apply(v, imgs, K, R, t, dmin, dmax, train=False)["depth"]

    comp = jax.jit(fwd).lower(variables, imgs).compile()
    txt = comp.as_text()
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/model_opt.hlo"
    with open(out, "w") as f:
        f.write(txt)
    ma = comp.memory_analysis()
    print(f"optimized HLO -> {out} ({len(txt)} bytes)")
    print(f"temp MB: {ma.temp_size_in_bytes / 1e6:.1f}  "
          f"argument MB: {ma.argument_size_in_bytes / 1e6:.1f}")

    # top-level ops grouped by opcode — entry plus control-flow branch/body
    # computations (ops INSIDE fusions are not materialized and are skipped
    # by excluding %fused_computation/%region bodies)
    by_kind = collections.Counter()
    biggest = []
    in_scope = False
    for line in txt.splitlines():
        m = re.match(r"(ENTRY )?%?([\w.-]+)[\w\s.()\[\]{},:/-]* {$", line)
        if m and not line.startswith(" "):
            name = m.group(2)
            in_scope = not (name.startswith("fused_computation")
                            or name.startswith("region")
                            or ".clone" in name)
            continue
        if line.startswith("}"):
            in_scope = False
            continue
        if not in_scope:
            continue
        m = re.match(r"\s+%?([\w.-]+) = (\S+) (\w+)\(", line)
        if not m:
            continue
        name, shape, op = m.groups()
        nb = shape_bytes(shape)
        by_kind[op] += nb
        if nb >= 50_000_000:
            biggest.append((nb, op, name, shape))

    print("\n== bytes by top-level opcode (entry computation) ==")
    for op, nb in by_kind.most_common(15):
        print(f"  {op:20s} {nb/1e6:10.1f} MB")
    print("\n== top-level ops >= 50 MB ==")
    for nb, op, name, shape in sorted(biggest, reverse=True)[:25]:
        print(f"  {nb/1e6:8.1f} MB  {op:12s} {shape:28s} {name}")


if __name__ == "__main__":
    main()

"""CVP eval-config HLO byte accounting (same method as hlo_account.py)."""
import sys
import numpy as np

def main():
    import jax
    import jax.numpy as jnp
    from wildmvs.models import build_model
    sys.argv = [sys.argv[0], sys.argv[1] if len(sys.argv) > 1 else "/tmp/cvp_opt.hlo"]
    from tools.bench_more import scene
    args = scene(1, 3, 512, 640)
    model = build_model("cvp_mvsnet", dtype=jnp.bfloat16)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *args, train=False, nscale=5))

    def fwd(v, imgs):
        return model.apply(v, imgs, *args[1:], train=False, nscale=5)["depth"]

    comp = jax.jit(fwd).lower(variables, args[0]).compile()
    txt = comp.as_text()
    out = sys.argv[1]
    with open(out, "w") as f:
        f.write(txt)
    ma = comp.memory_analysis()
    print(f"optimized HLO -> {out} ({len(txt)} bytes)")
    print(f"temp MB: {ma.temp_size_in_bytes / 1e6:.1f}")
    from tools.hlo_account import shape_bytes
    import collections, re
    by_kind = collections.Counter()
    biggest = []
    # scope tracking by brace depth (not line-prefix heuristics): only ops
    # at depth 1 inside a non-fused top-level computation are counted, so a
    # header line the old regex missed can no longer leave stale scope
    in_scope = False
    depth = 0
    for line in txt.splitlines():
        if depth == 0 and line.rstrip().endswith("{"):
            m = re.match(r"(ENTRY )?%?([\w.$-]+)", line.strip())
            name = m.group(2) if m else ""
            in_scope = not (name.startswith("fused_computation")
                            or name.startswith("region") or ".clone" in name)
            depth = 1
            continue
        depth += line.count("{") - line.count("}")
        if depth <= 0:
            in_scope = False
            depth = 0
            continue
        if not in_scope or depth != 1:
            continue
        m = re.match(r"\s+%?([\w.-]+) = (\S+) (\w+)\(", line)
        if not m:
            continue
        name, shape, op = m.groups()
        nb = shape_bytes(shape)
        by_kind[op] += nb
        if nb >= 20_000_000:
            biggest.append((nb, op, name, shape))
    print("\n== bytes by top-level opcode ==")
    for op, nb in by_kind.most_common(15):
        print(f"  {op:20s} {nb/1e6:10.1f} MB")
    print("\n== top-level ops >= 20 MB ==")
    for nb, op, name, shape in sorted(biggest, reverse=True)[:30]:
        print(f"  {nb/1e6:8.1f} MB  {op:12s} {shape:40s} {name}")

if __name__ == "__main__":
    main()

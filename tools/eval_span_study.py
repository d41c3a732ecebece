"""Span/window statistics of the Mosaic kernels under REALISTIC DTU
geometry at the eval-protocol resolution (CPU-only — the plans are plain
XLA math).

The synthetic bench scene uses millimetric baselines (t = 0.1*i), which
makes every span trivially fit the kernel windows. Real DTU rigs move the
camera on a ~650 mm sphere with 30-100 mm baselines between neighboring
pair.txt views, so the per-(depth-chunk, row-block) source-row span at
296x400 features / D=192 is what actually decides whether the fused
streamed kernel (ops/mosaic_sweep.fused_cost_volume_px) runs or falls
back at eval. This tool prints yspan / xover / wspan for a DTU-like rig
across DC choices, for the mvsnet eval config and the CVP coarse level.

Geometry source: cameras look at the origin from radius R positions with
angular steps matching DTU's pair.txt neighbors (~4-9 deg); depth range
425..935 mm like scan cam files (dtu_yao_eval.py:73).
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def look_at(eye, target=np.zeros(3), up=np.array([0.0, -1.0, 0.0])):
    """World->camera R, t with the camera at `eye` looking at `target`."""
    z = target - eye
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], 0).astype(np.float32)   # rows = cam axes
    t = (-R @ eye).astype(np.float32).reshape(3, 1)
    return R, t


def dtu_rig(n_views, fh, fw, f, radius=650.0, step_deg=6.0):
    """Reference view at the sphere pole + sources stepped along az/el
    like DTU pair.txt neighbors (alternating directions, 2 elevation)."""
    Ks, Rs, ts = [], [], []
    K = np.array([[f, 0, fw / 2], [0, f, fh / 2], [0, 0, 1]], np.float32)
    center = np.array([0.0, 0.0, 0.0])
    base_dir = np.array([0.0, 0.0, -1.0])
    for i in range(n_views):
        az = np.deg2rad(step_deg) * ((i + 1) // 2) * (-1) ** i
        el = np.deg2rad(step_deg * 0.5) * (i % 3 - 1)
        ca, sa = np.cos(az), np.sin(az)
        ce, se = np.cos(el), np.sin(el)
        d = np.array([sa * ce, se, -ca * ce])
        eye = center - radius * d * np.sign(base_dir[2]) * -1
        R, t = look_at(eye, center)
        Ks.append(K)
        Rs.append(R)
        ts.append(t)
    return np.stack(Ks), np.stack(Rs), np.stack(ts)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from wildmvs.geometry.projective import build_proj_matrices
    from wildmvs.ops import mosaic_sweep as ms

    print("== mvsnet eval config: features 296x400 (input 1184x1600 /4), "
          "D=192, N=5, f=723 ==")
    fh, fw, D, C, NV = 296, 400, 192, 32, 4
    K, R, t = dtu_rig(NV + 1, fh, fw, 723.0)
    proj = np.asarray(build_proj_matrices(jnp.asarray(K)[None],
                                          jnp.asarray(R)[None],
                                          jnp.asarray(t)[None]))[0]
    depths = jnp.linspace(425.0, 935.0, D)
    KR = ms.fused_window_rows((fh, fw), C, NV)
    print(f"fused KR budget: {KR} rows (needs wspan <= KR-2 = {KR - 2})")
    for dc in (32, 16, 8, 4):
        stats = []
        for i in range(1, NV + 1):
            P, Q, sx, sy = ms.mvsnet_planes(jnp.asarray(proj[i]),
                                            jnp.asarray(proj[0]), (fh, fw))
            plan = ms.sweep_spans_px(P, Q, depths, (fh, fw), dc=dc)
            stats.append((int(plan["yspan"]), int(plan["xover"]),
                          int(plan["wspan"])))
        ys = max(s[0] for s in stats)
        xo = max(s[1] for s in stats)
        ws = max(s[2] for s in stats)
        fit = ys <= 1 and xo <= 0 and ws <= KR - 2
        print(f"  DC={dc:3d}: yspan={ys} xover={xo} wspan={ws}"
              f"  -> fused {'HITS' if fit else 'falls back'}")

    # per-view streamed fallback (KR=48 per view, whole-row window over
    # all D planes -> the wspan bound is the binding one)
    for i in range(1, NV + 1):
        P, Q, sx, sy = ms.mvsnet_planes(jnp.asarray(proj[i]),
                                        jnp.asarray(proj[0]), (fh, fw))
        plan = ms.sweep_spans_px(P, Q, depths, (fh, fw))
        print(f"  per-view streamed v{i}: yspan={int(plan['yspan'])} "
              f"xover={int(plan['xover'])} wspan={int(plan['wspan'])} "
              f"(KR=48 needs <= 46)")

    print("== vis stages at 1184x1600 input (s = 1/d convention) ==")
    for sname, (s_scale, Dv) in {"stage1 /8": (8, 64),
                                 "stage2 /4": (4, 32),
                                 "stage3 /2": (2, 16)}.items():
        fhv, fwv = 1184 // s_scale, 1600 // s_scale
        Kv, Rv, tv = dtu_rig(NV + 1, fhv, fwv, 2892.0 / s_scale)
        svals = 1.0 / jnp.linspace(425.0, 935.0, Dv)
        KRv = ms.tier_b_kr((fhv, fwv), 32)
        rows = []
        for i in range(1, NV + 1):
            P, Q, sx, sy = ms.vis_planes(
                jnp.asarray(Kv[0]), jnp.asarray(Rv[0]), jnp.asarray(tv[0]),
                jnp.asarray(Kv[i]), jnp.asarray(Rv[i]), jnp.asarray(tv[i]),
                (fhv, fwv), (fhv, fwv))
            pA = ms.sweep_spans_px(P, Q, svals, (fhv, fwv), sx=sx, sy=sy)
            pB = ms.sweep_spans_px(P, Q, svals, (fhv, fwv), sx=sx, sy=sy,
                                   nt=ms.TIER_B["NT"])
            rows.append((int(pA["yspan"]), int(pA["xover"]),
                         int(pA["wspan"]), int(pB["xover"])))
        ys = max(r[0] for r in rows)
        xoA = max(r[1] for r in rows)
        ws = max(r[2] for r in rows)
        xoB = max(r[3] for r in rows)
        a = ys <= 1 and xoA <= 0 and ws <= 46
        bfit = (ys <= ms.TIER_B["KY"] - 1 and xoB <= 0
                and ws <= KRv - ms.TIER_B["KY"])
        print(f"  {sname} {fhv}x{fwv} D={Dv}: yspan={ys} xoverA={xoA} "
              f"wspan={ws} xoverB={xoB} KRb={KRv} -> "
              f"{'tier A' if a else ('tier B' if bfit else 'GATHER')}")

    print("== cvp coarse level: 74x100 features, D=96 uniform ==")
    fh2, fw2, D2 = 74, 100, 96
    K2, R2, t2 = dtu_rig(NV + 1, fh2, fw2, 723.0 / 4)
    proj2 = np.asarray(build_proj_matrices(jnp.asarray(K2)[None],
                                           jnp.asarray(R2)[None],
                                           jnp.asarray(t2)[None]))[0]
    depths2 = jnp.linspace(425.0, 935.0, D2)
    KR2 = ms.fused_window_rows((fh2, fw2), 16, NV)
    print(f"fused KR budget: {KR2}")
    for dc in (32, 16, 8):
        ws = 0
        for i in range(1, NV + 1):
            P, Q, _, _ = ms.mvsnet_planes(jnp.asarray(proj2[i]),
                                          jnp.asarray(proj2[0]),
                                          (fh2, fw2))
            plan = ms.sweep_spans_px(P, Q, depths2, (fh2, fw2), dc=dc)
            ws = max(ws, int(plan["wspan"]))
        print(f"  DC={dc:3d}: wspan={ws} (needs <= {KR2 - 2})")


if __name__ == "__main__":
    main()

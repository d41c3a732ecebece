"""Wide-row plane-sweep warp: one gather serves 8 output pixels.

The XLA gather path (ops/grid_sample.py) pays a per-INDEX issue cost that
dominates the plane-sweep warp: measured on v5e, one 128-channel row per
output pixel streams at ~120 GB/s effective, while one 1024-channel row per
8 output pixels streams at ~630 GB/s — 5x fewer issued indices at the same
total bytes (see BASELINE.md, warp-kernel study).  This module exploits
that: the source image is expanded into a 30-group shifted-neighborhood
table (3 rows x 10 top-left columns, channel-concatenated), one gather per
*octet* of horizontally-adjacent output pixels fetches the whole
neighborhood, and a per-octet [8 x 30] @ [30 x C] contraction — a one-hot
matrix carrying the bilinear corner weights — performs corner selection and
the bilinear combine in one MXU step.

Exactness domain: within each 8-pixel octet the top-left-corner columns
must span <= 8 and the rows <= 1 (out-of-frustum pixels excluded — their
weights are zero).  Plane-sweep warps are locally near-unit-slope in x and
near-flat in y, so real MVS geometry satisfies this away from extreme
in-plane rotation; `plane_sweep_warp_wide` checks the spans at runtime and
`lax.cond`-dispatches to the exact gather path otherwise, so results never
depend on scene geometry (up to bf16 weight rounding on the fast path).

Semantics parity: models/MVSNet/module.py:111-169 (`homo_warping`) —
border-zero bilinear, align_corners=True, behind-camera -> far away.

ROUND-2 NOTE: superseded on TPU by ops/mosaic_sweep.py (the in-kernel
per-lane dynamic gather solves the combine problem this module hit at the
XLA level); kept as the study record and an XLA-only fallback.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Q = 8          # output pixels served per gather
GR, GC = 3, 10  # neighborhood groups: rows x top-left columns
G = GR * GC


def _octet_plan(xs: jnp.ndarray, ys: jnp.ndarray, h: int, w: int):
    """Shared per-pixel/per-octet quantities for the octet path.

    Returns (plan dict of [D,H,W]-sized f32 arrays + [D,H,O] idx,
    sx, sy int32 span scalars).  Only small per-pixel tensors cross the
    runtime-fallback cond boundary — the [.., Q, G] one-hot weight tensor
    is built inside `_octet_combine` so it stays fused into the einsum.
    """
    d, ho, wo = xs.shape
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    fx = xs - x0f
    fy = ys - y0f
    valid = ((x0f >= -1.0) & (x0f <= w - 1.0)
             & (y0f >= -1.0) & (y0f <= h - 1.0))

    # 2-pixel zero ring (as in grid_sample): clipped far-out coords land on
    # ring zeros, so any weight x ring read is an exact zero
    x0 = (jnp.clip(x0f, -2.0, w + 1.0) + 2.0).reshape(d, ho, wo // Q, Q)
    y0 = (jnp.clip(y0f, -2.0, h + 1.0) + 2.0).reshape(d, ho, wo // Q, Q)
    vg = valid.reshape(d, ho, wo // Q, Q)

    big = jnp.float32(1e9)
    xmin = jnp.min(jnp.where(vg, x0, big), axis=-1)
    ymin = jnp.min(jnp.where(vg, y0, big), axis=-1)
    xmax = jnp.max(jnp.where(vg, x0, -big), axis=-1)
    ymax = jnp.max(jnp.where(vg, y0, -big), axis=-1)
    sx = jnp.maximum(xmax - xmin, 0.0).max().astype(jnp.int32)
    sy = jnp.maximum(ymax - ymin, 0.0).max().astype(jnp.int32)

    xbase = jnp.clip(xmin, 0.0, w + 3.0)   # all-invalid octet: any base
    ybase = jnp.clip(ymin, 0.0, h + 3.0)

    # within-window group of each pixel's top-left corner (invalid pixels
    # carry zero weights, so their clipped group is arbitrary)
    ci = jnp.clip(x0 - xbase[..., None], 0.0, GC - 2.0)
    ri = jnp.clip(y0 - ybase[..., None], 0.0, GR - 2.0)
    g00 = (ri * GC + ci).reshape(d, ho, wo)

    idx = (ybase * (w + 4) + xbase).astype(jnp.int32)
    plan = {"fx": fx, "fy": fy, "v": valid.astype(jnp.float32),
            "g00": g00, "idx": idx}
    return plan, sx, sy


def _octet_table(src: jnp.ndarray) -> jnp.ndarray:
    """[(h+4)*(w+4), G*C] shifted-neighborhood table:
    T[y*(w+4)+x, (r*GC+c)*C:...] = P[y+r, x+c] of the 2-ring-padded src."""
    h, w, c = src.shape
    p = jnp.pad(src, ((2, 4), (2, 11), (0, 0)))
    t = jnp.concatenate(
        [p[r:r + h + 4, cc:cc + w + 4, :] for r in range(GR)
         for cc in range(GC)], axis=-1)
    return t.reshape((h + 4) * (w + 4), G * c)


def _octet_combine(src: jnp.ndarray, plan: dict) -> jnp.ndarray:
    """Gather table rows and contract with the one-hot bilinear weights
    (batched [Q x G] @ [G x C] einsum).

    The octet gather itself is 5x cheaper than the exact per-pixel gather
    (7.5 vs 35 ms/view at bench sizes on v5e) but every combine lowering
    tried gives the saving back — the per-pixel corner selection is the
    hard part (BASELINE.md, warp-study round 3): this einsum lowers as a
    491K-batch tiny matmul at ~25 ms (full warp 34 ms, a tie with the
    exact gather); an unrolled per-group masked FMA and a 128-lane
    chunk-select + bilinear FMA both measured slower.  A per-sublane
    dynamic lane-select primitive would solve this; XLA/Mosaic expose
    none, so the exact gather path stays the model default.
    """
    c = src.shape[-1]
    idx = plan["idx"]
    d, ho, o = idx.shape
    dtype = src.dtype

    fx, fy, v, g00 = plan["fx"], plan["fy"], plan["v"], plan["g00"]
    w00 = (1.0 - fy) * (1.0 - fx) * v
    w01 = (1.0 - fy) * fx * v
    w10 = fy * (1.0 - fx) * v
    w11 = fy * fx * v

    rows = _octet_table(src).at[idx.reshape(-1)].get(
        mode="promise_in_bounds")  # in-bounds by construction
    rows = rows.reshape(d, ho, o, G, c)

    giota = jnp.arange(G, dtype=jnp.float32)
    gg = g00[..., None]
    wmat = (w00[..., None] * (giota == gg)
            + w01[..., None] * (giota == gg + 1.0)
            + w10[..., None] * (giota == gg + GC)
            + w11[..., None] * (giota == gg + GC + 1.0))
    wmat = wmat.reshape(d, ho, o, Q, G).astype(dtype)
    # TPU f32 dots default to bf16 passes; force full precision for f32
    # inputs so the fast path is bit-comparable to the gather there (bf16
    # inputs keep the fast default — rounding is already at input precision)
    prec = "highest" if dtype == jnp.float32 else "default"
    out = jnp.einsum("dhoqg,dhogc->dhoqc", wmat, rows,
                     preferred_element_type=jnp.float32, precision=prec)
    return out.reshape(d, ho, o * Q, c).astype(dtype)


def octet_sweep_warp(src: jnp.ndarray, xs: jnp.ndarray,
                     ys: jnp.ndarray) -> jnp.ndarray:
    """Warp one source image onto continuous coords with octet gathers.

    Args:
      src: [h, w, C] source features.
      xs, ys: [D, H, W] continuous source pixel coords (align_corners
        convention — integer coords hit pixel centers). W % 8 == 0.
    Returns:
      [D, H, W, C]; exact iff the octet spans fit (sx <= Q, sy <= 1), which
      callers must guarantee (see `plane_sweep_warp_wide`).
    """
    h, w, _ = src.shape
    assert xs.shape[-1] % Q == 0, xs.shape
    plan, _, _ = _octet_plan(xs, ys, h, w)
    return _octet_combine(src, plan)


def octet_spans(xs: jnp.ndarray, ys: jnp.ndarray, h: int, w: int):
    """Max per-octet (col, row) top-left-corner spans over valid pixels.

    Returns two int32 scalars (sx, sy); the octet path is exact iff
    sx <= Q and sy <= 1. Octets with no valid pixel contribute zero.
    """
    _, sx, sy = _octet_plan(xs, ys, h, w)
    return sx, sy


def cost_volume_wide(feats: jnp.ndarray, proj: jnp.ndarray,
                     src_idx: list, reference_frame: int,
                     ref_depths: jnp.ndarray, ref_hw: tuple[int, int],
                     agg_fn) -> jnp.ndarray:
    """Aggregated cost volume with ONE octet-vs-exact cond per sample.

    The per-view `plane_sweep_warp_wide` cond is the wrong boundary in a
    model: XLA materializes each branch result — and hoists the caller's
    f32 cast and the variance path's square into the branch, so every view
    crosses the cond as TWO full-volume f32 buffers (~1 GB/view at bench
    sizes, measured: it erases the octet path's entire gather saving).
    Hoisting the cond around the whole aggregation means the only tensor
    that crosses a branch boundary is the final feature-dtype cost volume
    (which the caller materializes anyway — see the layout fence in
    models/mvsnet.py), and the source coords are recomputed inside each
    branch so the [D, H, W] coordinate planes are never materialized
    either (the span check recomputes them into a scalar reduce).

    Args:
      feats: [B, N, h, w, C] view features.
      proj: [B, N, 4, 4] projection matrices at feature resolution.
      src_idx: source-view indices (reference excluded).
      reference_frame: reference view index.
      ref_depths: [B, D] reference depth hypotheses.
      ref_hw: (H, W) reference feature grid; W % 8 == 0 for the octet path.
      agg_fn: (ref_feature [B', h, w, C], warp_fns) -> [B', D, H, W, C]
        aggregation closure (variance / softmin).
    Returns:
      [B, D, H, W, C] aggregated cost volume.
    """
    from .pallas_sweep import sweep_coords_from_projs
    from .plane_sweep import plane_sweep_warp
    b = feats.shape[0]
    h, w = feats.shape[2:4]
    if ref_hw[1] % Q != 0:
        fns = [(lambda i=i: plane_sweep_warp(
            feats[:, i], proj[:, i], proj[:, reference_frame], ref_depths,
            ref_hw)) for i in src_idx]
        return agg_fn(feats[:, reference_frame], fns)

    outs = []
    for bb in range(b):
        fb = feats[bb:bb + 1]
        pb = proj[bb:bb + 1]
        db = ref_depths[bb:bb + 1]
        rp = pb[:, reference_frame]

        ok = None
        for i in src_idx:
            xs, ys = sweep_coords_from_projs(pb[0, i], rp[0], db[0], ref_hw)
            _, sx, sy = _octet_plan(xs, ys, h, w)
            fit = (sx <= Q) & (sy <= 1)
            ok = fit if ok is None else (ok & fit)

        def wide_branch(fb=fb, pb=pb, db=db, rp=rp):
            def warp(i):
                xs, ys = sweep_coords_from_projs(pb[0, i], rp[0], db[0],
                                                 ref_hw)
                return octet_sweep_warp(fb[0, i], xs, ys)[None]
            return agg_fn(fb[:, reference_frame],
                          [(lambda i=i: warp(i)) for i in src_idx])

        def exact_branch(fb=fb, pb=pb, db=db, rp=rp):
            return agg_fn(fb[:, reference_frame],
                          [(lambda i=i: plane_sweep_warp(
                              fb[:, i], pb[:, i], rp, db, ref_hw))
                           for i in src_idx])

        outs.append(jax.lax.cond(ok, wide_branch, exact_branch))
    return jnp.concatenate(outs, axis=0) if b > 1 else outs[0]


def plane_sweep_warp_wide(src_fea: jnp.ndarray, src_proj: jnp.ndarray,
                          ref_proj: jnp.ndarray, depth_values: jnp.ndarray,
                          ref_hw: tuple[int, int] | None = None) -> jnp.ndarray:
    """`plane_sweep_warp` with the octet-gather path when it is exact.

    Per batch element a runtime `lax.cond` takes the wide path iff every
    octet's corner spans fit the table window, else the exact gather —
    model semantics never depend on scene geometry. Requires the reference
    width to be a multiple of 8 (static fallback otherwise).
    """
    from .pallas_sweep import sweep_coords_from_projs
    from .plane_sweep import plane_sweep_warp
    if ref_hw is None:
        ref_hw = src_fea.shape[1:3]
    if ref_hw[1] % Q != 0:
        return plane_sweep_warp(src_fea, src_proj, ref_proj, depth_values,
                                ref_hw)
    h, w = src_fea.shape[1:3]
    outs = []
    for b in range(src_fea.shape[0]):
        src, sp, rp, dv = (src_fea[b], src_proj[b], ref_proj[b],
                           depth_values[b])
        # only xs/ys cross the cond boundary: recomputing the plan inside
        # the branch fuses it with the einsum and measures faster than
        # materializing the per-pixel plan tensors across the cond
        xs, ys = sweep_coords_from_projs(sp, rp, dv, ref_hw)
        _, sx, sy = _octet_plan(xs, ys, h, w)
        outs.append(jax.lax.cond(
            (sx <= Q) & (sy <= 1),
            lambda: octet_sweep_warp(src, xs, ys),
            lambda: plane_sweep_warp(src[None], sp[None], rp[None],
                                     dv[None], ref_hw)[0].astype(src.dtype)))
    return jnp.stack(outs)

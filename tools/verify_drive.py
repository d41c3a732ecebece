# Drive the library through its public surface: a miniature end-to-end MVS.
# A textured plane at z=3.0 seen by two cameras; sweep 32 depth hypotheses,
# build a variance cost volume, pick argmin -> must recover depth 3.0.
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from wildmvs.geometry.projective import build_proj_matrices
from wildmvs.ops.plane_sweep import plane_sweep_warp
from wildmvs.ops.volumes import variance_cost_volume, depth_regression

h, w = 32, 48
rng = np.random.default_rng(0)
tex = rng.standard_normal((h*2, w*2, 8)).astype(np.float32)  # world texture

K = np.array([[60.0,0,(w-1)/2],[0,60.0,(h-1)/2],[0,0,1]], np.float32)
R = np.eye(3, dtype=np.float32)
t_ref = np.zeros((3,1), np.float32)
t_src = np.array([[-0.4],[0.0],[0.0]], np.float32)
z_true = 3.0

# render both views of the plane z=z_true by sampling the world texture
def render(t):
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float32)
    rays = pix @ np.linalg.inv(K).T
    pts = rays * z_true - (R.T @ t).T    # world points on the plane
    u = (pts[...,0] + 2.0) * 20          # texture coords
    v = (pts[...,1] + 2.0) * 20
    u0, v0 = np.clip(u.astype(int),0,w*2-2), np.clip(v.astype(int),0,h*2-2)
    fu, fv = u-u0, v-v0
    img = (tex[v0,u0]*(1-fu)[...,None]*(1-fv)[...,None] + tex[v0,u0+1]*fu[...,None]*(1-fv)[...,None]
         + tex[v0+1,u0]*(1-fu)[...,None]*fv[...,None] + tex[v0+1,u0+1]*fu[...,None]*fv[...,None])
    return img.astype(np.float32)

ref_img, src_img = render(t_ref), render(t_src)
Pref = build_proj_matrices(jnp.array(K)[None], jnp.array(R)[None], jnp.array(t_ref)[None])
Psrc = build_proj_matrices(jnp.array(K)[None], jnp.array(R)[None], jnp.array(t_src)[None])
D = 32
depths = np.linspace(2.0, 4.5, D, dtype=np.float32)[None]

warped = plane_sweep_warp(jnp.array(src_img)[None], Psrc, Pref, jnp.array(depths))
cv = variance_cost_volume(jnp.array(ref_img)[None], [warped], num_depth=D)
cost = jnp.mean(cv, axis=-1)            # [1,D,h,w] variance: low = consistent
scores = -cost * 50.0
prob = jax.nn.softmax(scores, axis=1)
est = np.asarray(depths[0][np.asarray(jnp.argmin(cost, axis=1))[0]])[None]
interior = est[0, 8:-8, 8:-8]
print("estimated depth: mean=%.4f  median=%.4f  true=%.1f" % (interior.mean(), np.median(interior), z_true))
err = np.abs(interior - z_true)
print("abs err: mean=%.4f  p95=%.4f  (hypothesis spacing=%.4f)" % (err.mean(), np.percentile(err,95), depths[0,1]-depths[0,0]))
assert err.mean() < (depths[0,1]-depths[0,0]), "depth not recovered"

# probe: all-behind-camera sweep must produce a zero volume, not NaN/garbage
warped_b = plane_sweep_warp(jnp.array(src_img)[None], Psrc, Pref, jnp.array([[-1.0,-2.0]], np.float32))
print("behind-camera warp: max|v| =", float(jnp.abs(warped_b).max()), " finite:", bool(jnp.isfinite(warped_b).all()))
print("OK")

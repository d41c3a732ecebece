"""Projective geometry core — pure jnp, batched, vmap-first.

Capability parity with the reference geometry layer
(/root/reference/utils/utils_3D.py:29-383) but written as stateless batched
functions over channels-last tensors.  Conventions:

  * pixel coordinates are (x, y); x goes along width, y along height
  * a pinhole view is (K [3,3], R [3,3], t [3,1]); world->cam: Xc = R Xw + t
  * projection matrices P are 4x4 with [:3,:4] = K [R|t] and P[3,3] = 1
  * depth is z in the camera frame
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def build_proj_matrices(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """4x4 projection matrices P = [[K R, K t], [0, 0, 0, 1]].

    Parity: utils/utils_3D.py:50-62.

    Args:
      K: [..., 3, 3] intrinsics.
      R: [..., 3, 3] rotations.
      t: [..., 3, 1] translations.
    Returns:
      [..., 4, 4] projection matrices.
    """
    top = jnp.concatenate([K @ R, K @ t], axis=-1)  # [..., 3, 4]
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def scale_K(K: jnp.ndarray, factor) -> jnp.ndarray:
    """Scale the first two rows of K by `factor` (resolution change).

    Parity: the `scaled_K[:, :, :2] /= 4` pattern in the reference
    (models/MVSNet/model.py:183-184, models/trainer.py:70-71).
    `factor` may be a scalar or broadcastable array: K_out rows 0,1 *= factor.
    """
    factor = jnp.asarray(factor, dtype=K.dtype)
    row_scale = jnp.stack([factor, factor, jnp.ones_like(factor)], axis=-1)
    return K * row_scale[..., :, None]


def add_hom(pts: jnp.ndarray) -> jnp.ndarray:
    """Append a homogeneous 1-coordinate. Parity: utils/utils_3D.py:85-93."""
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def project(coords: jnp.ndarray, K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
            eps: float = 1e-6):
    """Project world points into a view.

    Parity: utils/utils_3D.py:96-113 (torch branch: depth clamp eps).

    Args:
      coords: [..., 3] world points.
      K, R, t: single view intrinsics/pose ([3,3],[3,3],[3,1]).
    Returns:
      (pixels [..., 2], depth [...]).
    """
    cam = coords @ R.T + t[:, 0]
    pix = cam @ K.T
    depth = pix[..., 2]
    xy = pix[..., :2] / jnp.maximum(depth[..., None], eps)
    return xy, depth


def project_all(coords: jnp.ndarray, K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                eps: float = 1e-6):
    """Project points into N views at once.

    Parity: utils/utils_3D.py:64-82.

    Args:
      coords: [..., 3] world points.
      K, R, t: [N, 3, 3], [N, 3, 3], [N, 3, 1].
    Returns:
      (pixels [N, ..., 2], depth [N, ...]).
    """
    return jax.vmap(lambda k, r, tt: project(coords, k, r, tt, eps))(K, R, t)


def unproject(coords: jnp.ndarray, K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
              depth: jnp.ndarray) -> jnp.ndarray:
    """Lift pixels + depth to world points.

    Parity: utils/utils_3D.py:116-141 (invD=False path).

    Args:
      coords: [..., 2] pixel coordinates.
      K, R, t: single view ([3,3],[3,3],[3,1]).
      depth: [...] per-pixel depth.
    Returns:
      [..., 3] world points.
    """
    hom = add_hom(coords) * depth[..., None]
    return (hom @ jnp.linalg.inv(K).T - t[:, 0]) @ R


def pixel_grid(h: int, w: int, dtype=jnp.float32, offset: float = 0.0) -> jnp.ndarray:
    """[h, w, 2] grid of (x, y) pixel coordinates, optionally center-offset.

    offset=0.0 matches the MVSNet-style integer grid (module.py:132-136);
    offset=0.5 matches the Vis-MVSNet pixel-center grid (homography.py:77-82).
    """
    ys = jnp.arange(h, dtype=dtype) + offset
    xs = jnp.arange(w, dtype=dtype) + offset
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def flows_from_single_depthmap(depthmaps: jnp.ndarray, proj_mat: jnp.ndarray,
                               ref_idx: int, eps: float = 1e-6):
    """Pixel flow from the reference view to each of the N-1 source views.

    Parity: utils/utils_3D.py:185-208. Unprojects the reference depthmap with
    inv(P_ref), reprojects with each source P; the returned `depth` is the
    z-depth of each 3D point in the *source* camera frames.

    Args:
      depthmaps: [B, H, W] reference-view depth.
      proj_mat: [B, N, 4, 4] projection matrices (build_proj_matrices).
      ref_idx: static reference index in [0, N).
    Returns:
      (flows [B, N-1, H, W, 2] pixel coords in source frames,
       src_depth [B, N-1, H, W]).
    """
    b, h, w = depthmaps.shape
    n = proj_mat.shape[1]
    src_idx = [i for i in range(n) if i != ref_idx]
    inv_ref = jnp.linalg.inv(proj_mat[:, ref_idx])  # [B, 4, 4]

    grid = pixel_grid(h, w, depthmaps.dtype).reshape(1, h * w, 2)
    pts = add_hom(add_hom(grid) * depthmaps.reshape(b, h * w, 1))  # [B, HW, 4]
    world = pts @ jnp.swapaxes(inv_ref, -1, -2)[:, None].squeeze(1)  # [B, HW, 4]
    src_P = proj_mat[:, jnp.array(src_idx)]  # [B, N-1, 4, 4]
    reproj = world[:, None] @ jnp.swapaxes(src_P, -1, -2)  # [B, N-1, HW, 4]
    depth = reproj[..., 2]
    flow = reproj[..., :2] / jnp.maximum(depth[..., None], eps)
    return flow.reshape(b, n - 1, h, w, 2), depth.reshape(b, n - 1, h, w)


def normalize_flow(flow: jnp.ndarray, h, w, align_corners: bool = False,
                   clamp: float | None = None) -> jnp.ndarray:
    """Pixel coords -> [-1, 1] normalized device coords.

    Parity: utils/utils_3D.py:243-273 (the reference normalizes with the
    align_corners=True convention: x_n = 2 x / (w-1) - 1).
    """
    h = jnp.asarray(h, flow.dtype)
    w = jnp.asarray(w, flow.dtype)
    if align_corners:
        x = 2.0 * flow[..., 0] / (w - 1.0) - 1.0
        y = 2.0 * flow[..., 1] / (h - 1.0) - 1.0
    else:
        x = (2.0 * flow[..., 0] + 1.0) / w - 1.0
        y = (2.0 * flow[..., 1] + 1.0) / h - 1.0
    res = jnp.stack([x, y], axis=-1)
    if clamp is not None:
        res = jnp.clip(res, -clamp, clamp)
    return res


def unnormalize_flow(flow: jnp.ndarray, h, w) -> jnp.ndarray:
    """[-1, 1] NDC -> pixel coords (align_corners=True convention).

    Parity: utils/utils_3D.py:276-298.
    """
    h = jnp.asarray(h, flow.dtype)
    w = jnp.asarray(w, flow.dtype)
    x = (w - 1.0) * (flow[..., 0] + 1.0) / 2.0
    y = (h - 1.0) * (flow[..., 1] + 1.0) / 2.0
    return jnp.stack([x, y], axis=-1)


def compute_triangulation_angles(point_cloud: jnp.ndarray, R: jnp.ndarray,
                                 t: jnp.ndarray, ref_idx: int = 0) -> jnp.ndarray:
    """Per-point triangulation angle (deg) between ref view and each source.

    Parity: utils/utils_3D.py:300-315.

    Args:
      point_cloud: [H, W, 3] world points.
      R, t: [N, 3, 3], [N, 3, 1].
    Returns:
      [N-1, H, W] angles in degrees.
    """
    n = R.shape[0]
    src_idx = jnp.array([i for i in range(n) if i != ref_idx])
    centers = -jnp.swapaxes(R, -1, -2) @ t  # [N, 3, 1] camera centers (negated below)
    ray_ref = point_cloud - centers[ref_idx, :, 0]
    rays_src = point_cloud[None] - centers[src_idx][:, None, None, :, 0]
    num = jnp.sum(ray_ref[None] * rays_src, axis=-1)
    den = jnp.maximum(jnp.linalg.norm(ray_ref, axis=-1), 1e-12)[None] * \
        jnp.maximum(jnp.linalg.norm(rays_src, axis=-1), 1e-12)
    cos = jnp.clip(num / den, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def compute_triangulation_angle(point_cloud: jnp.ndarray, R: jnp.ndarray,
                                t: jnp.ndarray) -> jnp.ndarray:
    """Triangulation angle (deg) of points between a view pair given their
    relative pose. Parity: utils/utils_3D.py:317-324.

    Args:
      point_cloud: [M, 3] points in frame 1.
      R, t: relative pose ([3,3],[3,1]).
    """
    ray1 = point_cloud
    ray2 = point_cloud + (R.T @ t)[:, 0]
    cos = jnp.clip(
        jnp.sum(ray1 * ray2, axis=-1)
        / jnp.maximum(jnp.linalg.norm(ray1, axis=-1), 1e-12)
        / jnp.maximum(jnp.linalg.norm(ray2, axis=-1), 1e-12),
        -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (wxyz) -> rotation matrix. Parity: utils/utils_3D.py:326-343.

    Args: q [N, 4]. Returns [N, 3, 3].
    """
    a, b, c, d = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    a2, b2, c2, d2 = a * a, b * b, c * c, d * d
    rows = [
        jnp.stack([a2 + b2 - c2 - d2, 2 * b * c - 2 * a * d, 2 * a * c + 2 * b * d], -1),
        jnp.stack([2 * a * d + 2 * b * c, a2 - b2 + c2 - d2, 2 * c * d - 2 * a * b], -1),
        jnp.stack([2 * b * d - 2 * a * c, 2 * a * b + 2 * c * d, a2 - b2 - c2 + d2], -1),
    ]
    return jnp.stack(rows, axis=-2)


def rot_to_quat(M: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (wxyz), branch-free (jnp.where).

    Parity: utils/utils_3D.py:345-378 (Shepperd's method, 4 branches on the
    dominant diagonal entry; here evaluated dense + selected, TPU-friendly).

    Args: M [N, 3, 3]. Returns [N, 4] unit quaternions.
    """
    m = M
    tr = jnp.trace(m, axis1=-2, axis2=-1)

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # case 1: trace dominant
    s1 = 2.0 * safe_sqrt(1.0 + tr)
    q1 = jnp.stack([0.25 * s1,
                    (m[:, 2, 1] - m[:, 1, 2]) / s1,
                    (m[:, 0, 2] - m[:, 2, 0]) / s1,
                    (m[:, 1, 0] - m[:, 0, 1]) / s1], -1)
    # case 2: m00 dominant
    s2 = 2.0 * safe_sqrt(1.0 + m[:, 0, 0] - m[:, 1, 1] - m[:, 2, 2])
    q2 = jnp.stack([(m[:, 2, 1] - m[:, 1, 2]) / s2,
                    0.25 * s2,
                    (m[:, 0, 1] + m[:, 1, 0]) / s2,
                    (m[:, 0, 2] + m[:, 2, 0]) / s2], -1)
    # case 3: m11 dominant
    s3 = 2.0 * safe_sqrt(1.0 + m[:, 1, 1] - m[:, 0, 0] - m[:, 2, 2])
    q3 = jnp.stack([(m[:, 0, 2] - m[:, 2, 0]) / s3,
                    (m[:, 0, 1] + m[:, 1, 0]) / s3,
                    0.25 * s3,
                    (m[:, 1, 2] + m[:, 2, 1]) / s3], -1)
    # case 4: m22 dominant
    s4 = 2.0 * safe_sqrt(1.0 + m[:, 2, 2] - m[:, 0, 0] - m[:, 1, 1])
    q4 = jnp.stack([(m[:, 1, 0] - m[:, 0, 1]) / s4,
                    (m[:, 0, 2] + m[:, 2, 0]) / s4,
                    (m[:, 1, 2] + m[:, 2, 1]) / s4,
                    0.25 * s4], -1)

    cond1 = tr > 0
    cond2 = (~cond1) & (m[:, 0, 0] > m[:, 1, 1]) & (m[:, 0, 0] > m[:, 2, 2])
    cond3 = (~cond1) & (~cond2) & (m[:, 1, 1] > m[:, 2, 2])
    q = jnp.where(cond1[:, None], q1,
                  jnp.where(cond2[:, None], q2,
                            jnp.where(cond3[:, None], q3, q4)))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def relative_pose(R1: jnp.ndarray, t1: jnp.ndarray, R2: jnp.ndarray,
                  t2: jnp.ndarray):
    """Pose of view 2 relative to view 1. Parity: utils/utils_3D.py:380-383."""
    R = R2 @ R1.T
    t = t2 - R @ t1
    return R, t

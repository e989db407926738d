"""Batched 3D geometry primitives (JAX).

TPU-native equivalents of the reference's scattered numpy/open3d geometry:
rigid transforms (loader.py:3337-3352), pinhole projection (loader.py:3354-3399),
depth back-projection (metric3d.py:319-345), voxel downsampling
(filtering.py:67-96 via point_cloud_utils), and 3D box corners.

Everything is mask-aware: point sets are padded to static shapes with a
validity mask, per the arrays-not-objects design (SURVEY.md §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1e9


def rot_y(theta: jnp.ndarray) -> jnp.ndarray:
    """Rotation about the camera y (yaw) axis; works on any batch shape.

    Matches scipy ``R.from_euler('zyx', [0, theta, 0])`` used by the
    reference's template posing (optimizer.py:468-472)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    o, z = jnp.ones_like(theta), jnp.zeros_like(theta)
    return jnp.stack([
        jnp.stack([c, z, s], -1),
        jnp.stack([z, o, z], -1),
        jnp.stack([-s, z, c], -1),
    ], -2)


def transform_points(tmat: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 (or batch of) rigid transform to (..., N, 3) points."""
    return pts @ tmat[..., :3, :3].swapaxes(-1, -2) + tmat[..., None, :3, 3]


def project_to_image(pts: jnp.ndarray, p2: jnp.ndarray):
    """(..., N, 3) cam points -> pixel (u, v) and depth via P2 (3, 4)."""
    hom = pts @ p2[:3, :3].T + p2[:3, 3]
    uv = hom[..., :2] / jnp.maximum(hom[..., 2:3], 1e-6)
    return uv, hom[..., 2]


def backproject_depth(depth: jnp.ndarray, fu: float, fv: float,
                      cu: float, cv: float) -> jnp.ndarray:
    """Depth map (H, W) -> (H*W, 3) camera-frame points.

    Equivalent of the meshgrid back-projection in metric3d.py:330-341."""
    h, w = depth.shape
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    x = (u - cu) * depth / fu
    y = (v - cv) * depth / fv
    return jnp.stack([x, y, depth], axis=-1).reshape(-1, 3)


def masked_median(pts: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-axis median of valid points; (N, 3), (N,) -> (3,).

    Implemented as the midpoint of the sorted valid prefix so it works with
    padding (invalid entries sort to +inf)."""
    n = jnp.sum(mask)
    # sort along the point axis as the minor dim (TPU lane layout); a
    # (N, 3) column sort pads the 3-wide minor dim to the lane width
    big = jnp.where(mask[None, :], pts.T, BIG)          # (3, N)
    srt = jnp.sort(big, axis=1)
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    med = (jnp.take_along_axis(srt, jnp.full((3, 1), lo, jnp.int32), axis=1)
           + jnp.take_along_axis(srt, jnp.full((3, 1), hi, jnp.int32),
                                 axis=1))[:, 0] / 2.0
    return jnp.where(n > 0, med, jnp.zeros(3, pts.dtype))


def voxel_downsample_mask(pts: jnp.ndarray, mask: jnp.ndarray,
                          voxel: float) -> jnp.ndarray:
    """Keep one representative point per occupied voxel (first in scan order).

    Returns a refined boolean mask over the same padded array — shapes stay
    static.  Equivalent in role to point_cloud_utils voxel downsampling
    (filtering.py:151-153); representative choice differs (first vs centroid)
    which downstream statistics tolerate.
    """
    key = jnp.floor(pts / voxel).astype(jnp.int32)
    # int32 spatial hash (wrap-around ok; collisions vanishingly rare for
    # car-scale sets); invalid rows sort last via lexsort on (~mask, h)
    h = (key[:, 0] * 73856093) ^ (key[:, 1] * 19349663) ^ (key[:, 2] * 83492791)
    order = jnp.lexsort((h, (~mask).astype(jnp.int32)))
    sorted_h = h[order]
    sorted_valid = mask[order]
    first = jnp.concatenate([jnp.array([True]),
                             (sorted_h[1:] != sorted_h[:-1])
                             | (~sorted_valid[:-1])])
    keep_sorted = jnp.zeros_like(mask).at[order].set(first)
    return keep_sorted & mask


def random_downsample_mask(key: jax.Array, mask: jnp.ndarray,
                           max_points: int) -> jnp.ndarray:
    """Randomly keep at most ``max_points`` valid entries (mask-preserving)."""
    scores = jax.random.uniform(key, mask.shape)
    scores = jnp.where(mask, scores, 2.0)
    thresh_idx = jnp.minimum(max_points, jnp.sum(mask))
    kth = jnp.sort(scores)[jnp.maximum(thresh_idx - 1, 0)]
    keep = (scores <= kth) & mask
    return jnp.where(jnp.sum(mask) <= max_points, mask, keep)


def box3d_corners(center: jnp.ndarray, lwh: jnp.ndarray,
                  ry: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) center (box middle), (..., 3) l/w/h, (...,) yaw -> (..., 8, 3)
    corners in camera coords (x right, y down, z forward); yaw about y."""
    l, w, h = lwh[..., 0], lwh[..., 1], lwh[..., 2]
    sx = jnp.stack([l, l, -l, -l, l, l, -l, -l], -1) / 2.0
    sy = jnp.stack([h, h, h, h, -h, -h, -h, -h], -1) / 2.0
    sz = jnp.stack([w, -w, -w, w, w, -w, -w, w], -1) / 2.0
    corners = jnp.stack([sx, sy, sz], -1)  # (..., 8, 3)
    rot = rot_y(ry)
    return corners @ rot.swapaxes(-1, -2) + center[..., None, :]


def points_in_obb(pts: jnp.ndarray, center: jnp.ndarray, lwh: jnp.ndarray,
                  ry: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of points inside an oriented (yaw-only) box.

    Replaces open3d OBB containment queries (scale_detector.py:78).

    Axis convention: templates/fitter put width on camera x, height on y,
    length on z at ry=0 (templates.py), and the reference's KITTI boxes use
    extent order [w, h, l] on the local (x, y, z) axes
    (scale_detector.py:112 + open3d OrientedBoundingBox), so the local-frame
    half extents are (w/2, h/2, l/2)."""
    local = (pts - center) @ rot_y(ry)  # inverse rotate: R^T applied from right
    half = jnp.stack([lwh[..., 1], lwh[..., 2], lwh[..., 0]], -1) / 2.0
    return jnp.all(jnp.abs(local) <= half, axis=-1)


def points_in_obb_r(pts: jnp.ndarray, center: jnp.ndarray,
                    lwh: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Containment for a general-rotation OBB (columns of ``rot`` are the
    box axes) — the scale-lidar gather transforms a yaw box through an
    arbitrary SE(3) ego-motion, so the transformed box is no longer
    yaw-only (scale_detector.py:67-78)."""
    local = (pts - center) @ rot                    # R^T (p - c) per row
    half = jnp.stack([lwh[..., 1], lwh[..., 2], lwh[..., 0]], -1) / 2.0
    return jnp.all(jnp.abs(local) <= half, axis=-1)

"""Rotated 3D box IoU and NMS (JAX, fixed shapes).

Replaces two native components of the reference (SURVEY.md §2.4):

* pytorch3d ``box3d_overlap`` used by pseudo-label NMS (loader.py:2727-2800);
* the numba-CUDA rotated-BEV IoU kernels (kitti_eval_python/rotate_iou.py)
  used by KITTI AP evaluation.

Method: the intersection of two convex quads is convex, so collect the <=24
candidate vertices (corners of A in B, corners of B in A, 16 edge-edge
intersections), sort them by angle about their centroid, and take the
shoelace area — the same construction as the reference's CUDA kernel
(rotate_iou.py:17-293) but expressed with static-size masks, vmappable over
arbitrary box-pair batches.  3D IoU = BEV intersection x vertical overlap
(yaw-only boxes), matching pytorch3d's result for this box family.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

EPS = 1e-8


def bev_corners(center_xz: jnp.ndarray, lw: jnp.ndarray,
                ry: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) center, (..., 2) (l, w), (...,) yaw -> (..., 4, 2) corners.

    BEV plane is camera (x, z); yaw rotates x toward z like
    ops.geometry.rot_y restricted to the plane.  Corner order is CCW.
    """
    l, w = lw[..., 0], lw[..., 1]
    dx = jnp.stack([l, l, -l, -l], -1) / 2.0
    dz = jnp.stack([w, -w, -w, w], -1) / 2.0
    c, s = jnp.cos(ry), jnp.sin(ry)
    x = c[..., None] * dx + s[..., None] * dz
    z = -s[..., None] * dx + c[..., None] * dz
    return jnp.stack([x, z], -1) + center_xz[..., None, :]


def _cross2(o, a, b):
    return ((a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1])
            - (a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0]))


def _points_in_quad(pts: jnp.ndarray, quad: jnp.ndarray) -> jnp.ndarray:
    """(..., N, 2) points, (..., 4, 2) convex quad -> (..., N) bool.

    A point is inside iff it is on the same side of all four edges."""
    q0 = quad[..., None, :, :]                      # (..., 1, 4, 2)
    q1 = jnp.roll(quad, -1, axis=-2)[..., None, :, :]
    p = pts[..., :, None, :]                        # (..., N, 1, 2)
    cr = _cross2(q0, q1, p)                         # (..., N, 4)
    return (jnp.all(cr >= -EPS, axis=-1) | jnp.all(cr <= EPS, axis=-1))


def _edge_intersections(qa: jnp.ndarray, qb: jnp.ndarray):
    """All 16 segment-segment intersection points between two quads.

    Returns points (..., 16, 2) and validity (..., 16)."""
    a0 = qa[..., :, None, :]                        # (..., 4, 1, 2)
    a1 = jnp.roll(qa, -1, axis=-2)[..., :, None, :]
    b0 = qb[..., None, :, :]                        # (..., 1, 4, 2)
    b1 = jnp.roll(qb, -1, axis=-2)[..., None, :, :]
    da = a1 - a0
    db = b1 - b0
    denom = da[..., 0] * db[..., 1] - da[..., 1] * db[..., 0]
    diff = b0 - a0
    t = (diff[..., 0] * db[..., 1] - diff[..., 1] * db[..., 0]) / (
        jnp.where(jnp.abs(denom) < EPS, 1.0, denom))
    u = (diff[..., 0] * da[..., 1] - diff[..., 1] * da[..., 0]) / (
        jnp.where(jnp.abs(denom) < EPS, 1.0, denom))
    valid = (jnp.abs(denom) >= EPS) & (t >= -EPS) & (t <= 1 + EPS) \
        & (u >= -EPS) & (u <= 1 + EPS)
    pts = a0 + t[..., None] * da
    bshape = pts.shape[:-3]
    return (pts.reshape(bshape + (16, 2)), valid.reshape(bshape + (16,)))


def quad_intersection_area(qa: jnp.ndarray, qb: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 2) x (..., 4, 2) -> (...,) intersection area."""
    in_b = _points_in_quad(qa, qb)                  # (..., 4)
    in_a = _points_in_quad(qb, qa)
    inter, ivalid = _edge_intersections(qa, qb)
    pts = jnp.concatenate([qa, qb, inter], axis=-2)          # (..., 24, 2)
    valid = jnp.concatenate([in_b, in_a, ivalid], axis=-1)   # (..., 24)

    n = jnp.sum(valid, axis=-1)
    centroid = (jnp.sum(jnp.where(valid[..., None], pts, 0.0), axis=-2)
                / jnp.maximum(n, 1)[..., None])
    rel = pts - centroid[..., None, :]
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    ang = jnp.where(valid, ang, 1e9)                # invalid sort to the end
    order = jnp.argsort(ang, axis=-1)
    sp = jnp.take_along_axis(pts, order[..., None], axis=-2)
    sv = jnp.take_along_axis(valid, order, axis=-1)

    # shoelace over the valid prefix with wraparound to vertex 0
    k = sp.shape[-2]
    idx = jax.lax.broadcasted_iota(jnp.int32, sv.shape, sv.ndim - 1)
    nxt = jnp.where(idx + 1 < n[..., None], idx + 1, 0)
    p_next = jnp.take_along_axis(sp, nxt[..., None], axis=-2)
    cross = sp[..., 0] * p_next[..., 1] - sp[..., 1] * p_next[..., 0]
    area = 0.5 * jnp.abs(jnp.sum(jnp.where(idx < n[..., None], cross, 0.0),
                                 axis=-1))
    return jnp.where(n >= 3, area, 0.0)


def iou_bev(centers_a, lw_a, ry_a, centers_b, lw_b, ry_b,
            criterion: int = -1) -> jnp.ndarray:
    """Pairwise rotated BEV IoU: (N, ...) vs (M, ...) -> (N, M).

    ``criterion`` matches rotate_iou.py:236-249: -1 = IoU (union), 0 =
    intersection / area_a, 1 = intersection / area_b."""
    qa = bev_corners(centers_a, lw_a, ry_a)         # (N, 4, 2)
    qb = bev_corners(centers_b, lw_b, ry_b)         # (M, 4, 2)
    inter = jax.vmap(
        lambda q1: jax.vmap(lambda q2: quad_intersection_area(q1, q2))(qb)
    )(qa)                                           # (N, M)
    area_a = (lw_a[:, 0] * lw_a[:, 1])[:, None]
    area_b = (lw_b[:, 0] * lw_b[:, 1])[None, :]
    if criterion == -1:
        denom = area_a + area_b - inter
    elif criterion == 0:
        denom = area_a * jnp.ones_like(inter)
    else:
        denom = area_b * jnp.ones_like(inter)
    return inter / jnp.maximum(denom, EPS)


def iou_3d(center_a, lwh_a, ry_a, center_b, lwh_b, ry_b) -> jnp.ndarray:
    """Pairwise exact 3D IoU for yaw-only boxes: (N,...) x (M,...) -> (N,M).

    ``center`` is the box middle (not KITTI bottom-center); lwh = (l, w, h).
    """
    qa = bev_corners(center_a[:, [0, 2]], lwh_a[:, :2], ry_a)
    qb = bev_corners(center_b[:, [0, 2]], lwh_b[:, :2], ry_b)
    inter_bev = jax.vmap(
        lambda q1: jax.vmap(lambda q2: quad_intersection_area(q1, q2))(qb))(qa)
    ya0 = center_a[:, 1] - lwh_a[:, 2] / 2
    ya1 = center_a[:, 1] + lwh_a[:, 2] / 2
    yb0 = center_b[:, 1] - lwh_b[:, 2] / 2
    yb1 = center_b[:, 1] + lwh_b[:, 2] / 2
    y_overlap = jnp.maximum(
        jnp.minimum(ya1[:, None], yb1[None, :])
        - jnp.maximum(ya0[:, None], yb0[None, :]), 0.0)
    inter = inter_bev * y_overlap
    vol_a = jnp.prod(lwh_a, axis=1)[:, None]
    vol_b = jnp.prod(lwh_b, axis=1)[None, :]
    return inter / jnp.maximum(vol_a + vol_b - inter, EPS)


@partial(jax.jit, static_argnames=())
def nms_3d(center, lwh, ry, score, valid, iou_thresh: jnp.ndarray):
    """Greedy 3D NMS over a padded box set.

    Returns (keep, merged_into): ``keep[i]`` True if box i survives;
    ``merged_into[i]`` = index of the surviving box that suppressed i (or i
    itself).  The reference merges the loser's points into the winner and
    re-optimizes (loader.py:2727-2800, main_class.py:227-235); merged_into
    gives the mapping needed to do that batched.
    """
    n = center.shape[0]
    iou = iou_3d(center, lwh, ry, center, lwh, ry)
    order_score = jnp.where(valid, score, -jnp.inf)
    order = jnp.argsort(-order_score)

    def step(k, state):
        keep, merged = state
        i = order[k]
        alive = keep[i] & valid[i]
        overlaps = (iou[i] > iou_thresh) & valid & keep
        overlaps = overlaps & (jnp.arange(n) != i)
        # only a currently-alive box suppresses others
        suppress = jnp.where(alive, overlaps, jnp.zeros_like(overlaps))
        # suppressed boxes must come later in score order
        later = jnp.zeros(n, bool).at[order[k + 1:]].set(True)
        suppress = suppress & later
        keep = keep & ~suppress
        merged = jnp.where(suppress, i, merged)
        return keep, merged

    keep0 = jnp.ones(n, bool)
    merged0 = jnp.arange(n)
    # python loop: n is static and small (<= ~64 boxes per frame)
    state = (keep0, merged0)
    for k in range(n):
        state = step(k, state)
    keep, merged = state
    return keep & valid, merged

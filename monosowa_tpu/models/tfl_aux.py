"""Template-Fitting auxiliary loss for the detector (use_tfl path).

Behavioral contract (MonoDETR monodetr.py):

* ``decode_preds`` (:1085-1157): lift matched queries to camera-frame
  (x, y, z, h, w, l, ry) using the canonical-scale-corrected depth;
* ``perform_matching`` (:1053-1083): match each query to the nearest
  pseudo-label car by center distance (centers = per-car point medians);
* ``get_templates`` (:577-660): pose all 4 template clouds scaled by the
  predicted dims (y*h, x*w, z*l about the template dims), rotated by
  ry + pi/2 (rotation detached for moving cars), translated to the
  predicted center;
* ``tfl_knn`` (:817-845): differentiable two-way sigmoid TFL on SQUARED
  kNN distances (sigmoid(10 d^2) - 0.5), min over the 4 templates, mean
  over the queries matched to each car, summed over cars and batch.

Fixed-shape JAX: cars and points padded with masks; the template posing is
one einsum over (Q, 4, T, 3).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from monosowa_tpu.ops.geometry import masked_median
from monosowa_tpu.ops.tfl import pairwise_sq_dists

BIG = 1e9


def pose_templates(pred_boxes7: jnp.ndarray, templates: jnp.ndarray,
                   template_dims_hwl: jnp.ndarray,
                   detach_rotation: jnp.ndarray) -> jnp.ndarray:
    """(Q, 7) [x,y,z,h,w,l,ry] x (4, T, 3) -> (Q, 4, T, 3) posed templates."""
    scale_h = jax.lax.stop_gradient(pred_boxes7[:, 3]) / template_dims_hwl[0]
    scale_w = jax.lax.stop_gradient(pred_boxes7[:, 4]) / template_dims_hwl[1]
    scale_l = jax.lax.stop_gradient(pred_boxes7[:, 5]) / template_dims_hwl[2]
    t = templates[None] * jnp.stack(
        [scale_w, scale_h, scale_l], -1)[:, None, None, :]   # (Q,4,T,3)

    ry = pred_boxes7[:, 6] + jnp.pi / 2.0
    ry = jnp.where(detach_rotation, jax.lax.stop_gradient(ry), ry)
    c, s = jnp.cos(ry), jnp.sin(ry)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    rot = jnp.stack([jnp.stack([c, z, s], -1),
                     jnp.stack([z, o, z], -1),
                     jnp.stack([-s, z, c], -1)], -2)          # (Q, 3, 3)
    posed = jnp.einsum("qkti,qji->qktj", t, rot)
    return posed + pred_boxes7[:, None, None, :3]


@partial(jax.jit, static_argnames=("steepness", "match_dist"))
def loss_tfl_aux(pred_boxes7: jnp.ndarray, pred_matched: jnp.ndarray,
                 car_points: jnp.ndarray, car_point_mask: jnp.ndarray,
                 car_valid: jnp.ndarray, car_moving: jnp.ndarray,
                 templates: jnp.ndarray, template_dims_hwl: jnp.ndarray,
                 steepness: float = 10.0,
                 match_dist: float = 5.0) -> jnp.ndarray:
    """One image's TFL auxiliary loss.

    pred_boxes7 (Q, 7); pred_matched (Q,) bool (Hungarian-matched queries);
    car_points (C, P, 3) padded pseudo-label clouds; car_point_mask (C, P);
    car_valid (C,); car_moving (C,); templates (4, T, 3) canonical.
    """
    q = pred_boxes7.shape[0]
    centers = jax.vmap(masked_median)(car_points, car_point_mask)   # (C, 3)
    d = jnp.sqrt(pairwise_sq_dists(pred_boxes7[None, :, :3],
                                   centers[None])[0] + 1e-12)       # (Q, C)
    d = jnp.where(car_valid[None, :], d, BIG)
    match = jnp.argmin(d, axis=1)                                   # (Q,)
    ok = pred_matched & (jnp.min(d, axis=1) < match_dist)

    detach_rot = car_moving[match]
    posed = pose_templates(pred_boxes7, templates, template_dims_hwl,
                           detach_rot)                              # (Q,4,T,3)

    pts = car_points[match]                                         # (Q, P, 3)
    pmask = car_point_mask[match]
    d2 = pairwise_sq_dists(posed.reshape(q, -1, 3), pts)            # (Q,4T,P)
    d2 = d2.reshape(q, posed.shape[1], posed.shape[2], -1)
    d2m = jnp.where(pmask[:, None, None, :], d2, BIG)

    t2s = jax.nn.sigmoid(steepness * jnp.min(d2m, axis=-1)) - 0.5   # (Q,4,T)
    s_min = jnp.min(d2m, axis=2)                                    # (Q,4,P)
    s2t = jax.nn.sigmoid(steepness * s_min) - 0.5
    s2t = jnp.where(pmask[:, None, :], s2t, 0.0)
    n_pts = jnp.maximum(jnp.sum(pmask, -1), 1)[:, None]

    per_tmpl = (jnp.mean(t2s, axis=-1)
                + jnp.sum(s2t, axis=-1) / n_pts)                    # (Q, 4)
    per_query = jnp.min(per_tmpl, axis=-1)                          # (Q,)

    # mean over queries matched to each car, summed over cars (tfl_knn)
    contrib = jnp.where(ok, per_query, 0.0)
    car_ids = jnp.where(ok, match, car_points.shape[0])
    sums = jnp.zeros(car_points.shape[0] + 1).at[car_ids].add(contrib)
    counts = jnp.zeros(car_points.shape[0] + 1).at[car_ids].add(
        ok.astype(jnp.float32))
    return jnp.sum(sums[:-1] / jnp.maximum(counts[:-1], 1.0))


def _apply_affine(trans: jnp.ndarray, u: jnp.ndarray,
                  v: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(2, 3) affine on pixel coords."""
    return (trans[0, 0] * u + trans[0, 1] * v + trans[0, 2],
            trans[1, 0] * u + trans[1, 1] * v + trans[1, 2])


def decode_pred_boxes7(pred_boxes: jnp.ndarray, pred_depth: jnp.ndarray,
                       pred_dims: jnp.ndarray, pred_angle: jnp.ndarray,
                       calib: jnp.ndarray, resolution: jnp.ndarray,
                       canonical_scale: jnp.ndarray,
                       mean_size_hwl: jnp.ndarray,
                       trans_inv: Optional[jnp.ndarray] = None,
                       flip: Optional[jnp.ndarray] = None,
                       img_w: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(Q, ...) head outputs -> (Q, 7) [x,y,z,h,w,l,ry] camera-frame boxes.

    Faithful to decode_preds (monodetr.py:1085-1157): normalized centers
    unprojected through the inverse augmentation affine and un-flipped back
    to the original image, depth de-canonicalized, center rays including
    the calib baseline terms, dims used directly (+ mean shape, zeros with
    meanshape=False like the shipped configs), heading = 12-bin argmax +
    residual, flipped to -h+pi, plus the global-ray correction
    arctan2(u_box_center - cu, fu) from the un-affined 2D box corners.
    """
    depth = pred_depth[:, 0] / canonical_scale
    u = pred_boxes[:, 0] * resolution[0]
    v = pred_boxes[:, 1] * resolution[1]
    if trans_inv is not None:
        u, v = _apply_affine(trans_inv, u, v)
    if flip is not None:
        u = jnp.where(flip, img_w - u, u)
    fu, fv = calib[0, 0], calib[1, 1]
    cu, cv = calib[0, 2], calib[1, 2]
    x = (u - cu) * depth / fu + calib[0, 3] / -fu
    y = (v - cv) * depth / fv + calib[1, 3] / -fv
    dims = pred_dims + mean_size_hwl

    bin_id = jnp.argmax(pred_angle[:, :12], axis=1)
    res = jnp.take_along_axis(pred_angle[:, 12:24], bin_id[:, None],
                              axis=1)[:, 0]
    heading = res + bin_id.astype(jnp.float32) * (2 * jnp.pi / 12)

    # box-center u in the original image for the ray correction (:1121-1151)
    u1 = (pred_boxes[:, 0] - pred_boxes[:, 2]) * resolution[0]
    v1 = (pred_boxes[:, 1] - pred_boxes[:, 4]) * resolution[1]
    u2 = (pred_boxes[:, 0] + pred_boxes[:, 3]) * resolution[0]
    v2 = (pred_boxes[:, 1] + pred_boxes[:, 5]) * resolution[1]
    if trans_inv is not None:
        u1, v1 = _apply_affine(trans_inv, u1, v1)
        u2, v2 = _apply_affine(trans_inv, u2, v2)
    uc = (u1 + u2) / 2.0
    if flip is not None:
        uc = jnp.where(flip, img_w - uc, uc)
        heading = jnp.where(flip, -heading + jnp.pi, heading)
    ry = heading + jnp.arctan2(uc - cu, fu)
    return jnp.concatenate([x[:, None], y[:, None], depth[:, None],
                            dims, ry[:, None]], axis=1)


def gather_matched_queries(match_idx: jnp.ndarray, k: int
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Q,) Hungarian assignment row -> indices of the first ``k`` matched
    queries (padded with 0) and their validity mask.  Keeps the aux-loss
    pairwise tensors at a fixed small K instead of Q = queries x groups."""
    matched = match_idx >= 0
    order = jnp.argsort(~matched, stable=True)
    return order[:k], matched[order[:k]]

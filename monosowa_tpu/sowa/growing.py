"""Context-aware region growing (CAAR) — ground removal + region growing.

Behavioral contract (pseudo_label_generator/3d/scripts/context_growing.py):

* ``segment_plane`` (:12-53): RANSAC ground plane on a 0.2-voxel-downsampled
  cloud (distance_threshold 0.1, 10k iterations via open3d); points farther
  than 0.2 m from the plane survive;
* ``growing_algorithm`` (:67-119): faiss-based region growing from the
  mask-frustum ("car") points at 7 thresholds (config growing_thresholds);
  a grown region is kept when >= 95% of its points are frustum points.

* ``perform_growing`` (:121-234): per-mask frame flow — median center of
  the mask-frustum points, 10 m XY-distance crop of the whole scan, plane
  removal, growing from the frustum indices, keep the LARGEST accepted
  region across all thresholds, then a second 5 m round around that
  region's median (fresh plane segmentation + growing) — the final
  largest region's xyz points are the extraction result.

TPU-native design: RANSAC as a batched hypothesis evaluation (vmapped
triple-sampling + inlier counting); region growing as connected components
of the eps-neighborhood graph via iterative min-label propagation with
pointer jumping (log-depth, fixed iterations) — regions are exactly the
components touched by car points, accepted by final-overlap >= 0.95
(equivalent to the reference's early-abort growth up to mid-growth
tie-breaking on pathological shapes).  ``perform_growing_frame`` is the
reference-exact frame flow; ``perform_growing`` (union of accepted
regions, single round) is the simpler standalone variant.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from monosowa_tpu.ops.geometry import voxel_downsample_mask
from monosowa_tpu.ops.tfl import pairwise_sq_dists

BIG = 1e9


@partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_plane(pts: jnp.ndarray, mask: jnp.ndarray, key: jax.Array,
                 distance_threshold: float = 0.1,
                 num_hypotheses: int = 1024) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched-hypothesis RANSAC plane fit.

    Returns (abcd normalized, inlier_count).  All hypotheses evaluate in one
    (H, N) distance matrix — no sequential iterations.
    """
    n = pts.shape[0]
    valid_idx = jnp.where(mask, jnp.arange(n), 0)
    probs = mask.astype(jnp.float32) / jnp.maximum(jnp.sum(mask), 1)
    tri = jax.random.choice(key, n, shape=(num_hypotheses, 3), p=probs)
    p0, p1, p2 = (pts[tri[:, k]] for k in range(3))        # (H, 3)
    normal = jnp.cross(p1 - p0, p2 - p0)
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(norm, 1e-9)
    d = -jnp.sum(normal * p0, axis=-1)                     # (H,)
    dist = jnp.abs(pts @ normal.T + d[None, :])            # (N, H)
    inliers = jnp.sum((dist < distance_threshold) & mask[:, None], axis=0)
    degenerate = norm[:, 0] < 1e-9
    inliers = jnp.where(degenerate, -1, inliers)
    best = jnp.argmax(inliers)
    abcd = jnp.concatenate([normal[best], d[best][None]])
    return abcd, inliers[best]


def remove_plane_points(pts: jnp.ndarray, mask: jnp.ndarray,
                        abcd: jnp.ndarray,
                        keep_distance: float = 0.2) -> jnp.ndarray:
    """Refined mask keeping points farther than ``keep_distance`` from the
    plane (context_growing.py:34-40)."""
    dist = jnp.abs(pts @ abcd[:3] + abcd[3])
    return mask & (dist > keep_distance)


@partial(jax.jit, static_argnames=("num_iters",))
def connected_components(pts: jnp.ndarray, mask: jnp.ndarray,
                         threshold: float,
                         num_iters: int = 24) -> jnp.ndarray:
    """Component label per point (min point index in its component).

    eps-graph connectivity via min-label propagation + pointer jumping;
    ``num_iters`` of combined steps covers components of diameter ~2^24.
    Invalid points get label n.
    """
    n = pts.shape[0]
    d2 = pairwise_sq_dists(pts, pts)
    adj = (d2 <= threshold * threshold) & mask[None, :] & mask[:, None]
    labels = jnp.where(mask, jnp.arange(n), n)

    def body(_, labels):
        nbr_min = jnp.min(jnp.where(adj, labels[None, :], n), axis=1)
        labels = jnp.minimum(labels, nbr_min)
        # pointer jumping: label of my label
        safe = jnp.clip(labels, 0, n - 1)
        jumped = jnp.where(labels < n, jnp.minimum(labels, labels[safe]),
                           labels)
        return jumped

    return jax.lax.fori_loop(0, num_iters, body, labels)


@partial(jax.jit, static_argnames=())
def grow_mask(pts: jnp.ndarray, mask: jnp.ndarray, car_mask: jnp.ndarray,
              threshold: jnp.ndarray,
              overlap_min: float = 0.95) -> jnp.ndarray:
    """One growing pass: keep points of components that (a) contain car
    points and (b) have >= overlap_min fraction of car points."""
    n = pts.shape[0]
    labels = connected_components(pts, mask, threshold)
    car = car_mask & mask
    # per-component counts via segment sums over labels
    total = jnp.zeros(n + 1).at[labels].add(mask.astype(jnp.float32))
    fg = jnp.zeros(n + 1).at[labels].add(car.astype(jnp.float32))
    comp_ok = (fg > 0) & (fg / jnp.maximum(total, 1) >= overlap_min)
    return mask & comp_ok[labels]


def largest_region(pts, mask, car_mask, thresholds,
                   overlap_min: float = 0.95):
    """Boolean mask of the single largest accepted region across all
    growing thresholds (context_growing.py:164-175 top-candidates scan:
    a region is accepted when >= overlap_min of its points are frustum
    points; size counts ALL grown points)."""
    import numpy as np

    pts = jnp.asarray(pts, jnp.float32)
    mask = jnp.asarray(mask)
    car = np.asarray(car_mask & mask)
    best_size, best = -1, None
    for t in thresholds:
        labels = np.asarray(connected_components(pts, mask, float(t)))
        valid = labels < pts.shape[0]
        if not valid.any():
            continue
        total = np.bincount(labels[valid], minlength=pts.shape[0] + 1)
        fg = np.bincount(labels[valid & car], minlength=pts.shape[0] + 1)
        ok = (fg > 0) & (fg / np.maximum(total, 1) >= overlap_min)
        ok_labels = np.flatnonzero(ok)
        for lab in ok_labels:
            if total[lab] > best_size:
                best_size = int(total[lab])
                best = labels == lab
    return best


def _plane_filter(scan_xyz, key, distance_threshold=0.1, keep_distance=0.2,
                  voxel=0.2):
    """segment_plane (context_growing.py:12-53): RANSAC on the 0.2-voxel
    downsample, keep points farther than keep_distance.  Returns a boolean
    keep mask (None when degenerate)."""
    pts = jnp.asarray(scan_xyz, jnp.float32)
    if pts.shape[0] < 3:
        return None
    full = jnp.ones(pts.shape[0], bool)
    ds = voxel_downsample_mask(pts, full, voxel)
    if int(jnp.sum(ds)) < 3:
        return None
    abcd, _ = ransac_plane(pts, ds, key,
                           distance_threshold=distance_threshold)
    import numpy as np

    return np.asarray(remove_plane_points(pts, full, abcd,
                                          keep_distance=keep_distance))


def perform_growing_frame(scan, mask_img, camera_idx, key,
                          thresholds=(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7)):
    """Reference-exact per-mask frame flow (context_growing.py:121-234).

    scan: (N, 6) [x, y, z, camera_idx, px, py] (loader.py:3354-3376 layout,
    pixel rows already cropped to the image); mask_img: (H, W) bool.
    Returns the grown (M, 3) xyz points or None, matching every early-out
    of the reference (empty frustum, < 3 crop points, degenerate plane,
    no accepted region).
    """
    import numpy as np

    scan = np.asarray(scan)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
    cam = scan[scan[:, 3] == camera_idx]
    in_mask = mask_img[cam[:, 4].astype(int), cam[:, 5].astype(int)]
    if in_mask.sum() == 0:
        return None
    center = np.median(cam[in_mask, :3], axis=0)

    def _round(center, radius, kk):
        d = np.hypot(center[0] - scan[:, 0], center[1] - scan[:, 1])
        crop = scan[d < radius]
        if crop.shape[0] < 3:
            return None
        keep = _plane_filter(crop[:, :3], kk)
        if keep is None:
            return None
        seg = crop[keep]
        cam_sel = seg[:, 3] == camera_idx
        seg_cam = seg[cam_sel]
        if seg_cam.shape[0] == 0:
            return None
        car = mask_img[seg_cam[:, 4].astype(int), seg_cam[:, 5].astype(int)]
        if car.sum() == 0:
            return None
        region = largest_region(seg_cam[:, :3].astype(np.float32),
                                np.ones(seg_cam.shape[0], bool), car,
                                thresholds)
        if region is None:
            return None
        return seg_cam[region, :3]

    first = _round(center, 10.0, k1)
    if first is None:
        return None
    return _round(np.median(first, axis=0), 5.0, k2)


def perform_growing(pts, mask, car_mask, key,
                    thresholds=(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7),
                    remove_ground: bool = True):
    """Full CAAR pass: optional RANSAC ground removal, then the union of
    accepted regions across all thresholds (context_growing.py:121-234 keeps
    the per-threshold regions; the pipeline consumes their union)."""
    import jax.numpy as jnp

    if remove_ground:
        abcd, _ = ransac_plane(pts, mask, key)
        mask = remove_plane_points(pts, mask, abcd)
    out = jnp.zeros_like(mask)
    for t in thresholds:
        out = out | grow_mask(pts, mask, car_mask, jnp.float32(t))
    return out

"""Context-aware region growing (CAAR) — ground removal + region growing.

Behavioral contract (pseudo_label_generator/3d/scripts/context_growing.py):

* ``segment_plane`` (:12-53): RANSAC ground plane on a 0.2-voxel-downsampled
  cloud (distance_threshold 0.1, 10k iterations via open3d); points farther
  than 0.2 m from the plane survive;
* ``growing_algorithm`` (:67-119): faiss-based region growing from the
  mask-frustum ("car") points at 7 thresholds (config growing_thresholds);
  a grown region is kept when >= 95% of its points are frustum points.

TPU-native design: RANSAC as a batched hypothesis evaluation (vmapped
triple-sampling + inlier counting); region growing as connected components
of the eps-neighborhood graph via iterative min-label propagation with
pointer jumping (log-depth, fixed iterations) — regions are exactly the
components touched by car points, accepted by final-overlap >= 0.95
(equivalent to the reference's early-abort growth up to mid-growth
tie-breaking on pathological shapes).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

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

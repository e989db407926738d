"""Point-to-plane ICP (fixed-iteration, jittable).

Behavioral contract (pseudo_label_generator/3d/scripts/loader.py:3902-3921,
icp_point_to_plane_open3d): open3d TransformationEstimationPointToPlane with
max_correspondence_distance 1.0, used by the optional ICP transformation
refinement (calculate_transformationsV2 :1016-1301, off by default —
use_icp False).

TPU design: fixed ``num_iters`` Gauss-Newton steps; correspondences via the
full pairwise-distance matmul (MXU); target normals from k-NN PCA (closed
3x3 eigen-solve via jnp.linalg.eigh); the 6x6 normal-equation solve is a
tiny host-free linalg.solve.  Entirely static-shape: padded point sets with
masks, vmappable over many scan pairs at once (the reference refines a
whole sequence pairwise — here that is one batched call).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from monosowa_tpu.ops.tfl import pairwise_sq_dists

BIG = 1e9


def estimate_normals(pts: jnp.ndarray, mask: jnp.ndarray,
                     k: int = 10) -> jnp.ndarray:
    """(N, 3) -> unit normals via k-NN PCA (smallest eigenvector)."""
    d2 = pairwise_sq_dists(pts, pts)
    d2 = jnp.where(mask[None, :], d2, BIG)
    _, idx = jax.lax.top_k(-d2, k)                 # (N, k) nearest incl self
    nbrs = pts[idx]                                # (N, k, 3)
    mean = jnp.mean(nbrs, axis=1, keepdims=True)
    centered = nbrs - mean
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / k
    _, vecs = jnp.linalg.eigh(cov)                 # ascending eigenvalues
    normals = vecs[:, :, 0]
    return normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=1, keepdims=True), 1e-9)


def _se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Small-angle se(3) -> 4x4 (first-order rotation, re-orthogonalized)."""
    wx, wy, wz, tx, ty, tz = xi
    rot = jnp.array([[1.0, -wz, wy], [wz, 1.0, -wx], [-wy, wx, 1.0]])
    # project to SO(3) via SVD for stability over iterations
    u, _, vt = jnp.linalg.svd(rot)
    r = u @ vt
    t = jnp.eye(4)
    t = t.at[:3, :3].set(r)
    t = t.at[:3, 3].set(jnp.array([tx, ty, tz]))
    return t


@partial(jax.jit, static_argnames=("num_iters", "normal_k"))
def icp_point_to_plane(source: jnp.ndarray, source_mask: jnp.ndarray,
                       target: jnp.ndarray, target_mask: jnp.ndarray,
                       max_dist: float = 1.0, num_iters: int = 20,
                       normal_k: int = 10
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (T 4x4 mapping source -> target, final rms residual)."""
    normals = estimate_normals(target, target_mask, normal_k)

    def body(_, carry):
        tmat, _ = carry
        src = source @ tmat[:3, :3].T + tmat[:3, 3]
        d2 = pairwise_sq_dists(src, target)
        d2 = jnp.where(target_mask[None, :], d2, BIG)
        nn = jnp.argmin(d2, axis=1)                    # (N,)
        nn_d2 = jnp.min(d2, axis=1)
        w = (source_mask & (nn_d2 < max_dist * max_dist)).astype(jnp.float32)

        q = target[nn]
        n = normals[nn]
        r = jnp.sum((src - q) * n, axis=1)             # point-to-plane resid
        # jacobian rows: [p x n, n]
        jac = jnp.concatenate([jnp.cross(src, n), n], axis=1)  # (N, 6)
        a = jnp.einsum("ni,nj,n->ij", jac, jac, w) + 1e-6 * jnp.eye(6)
        b = -jnp.einsum("ni,n,n->i", jac, r, w)
        xi = jnp.linalg.solve(a, b)
        delta = _se3_exp(xi)
        rms = jnp.sqrt(jnp.sum(w * r * r) / jnp.maximum(jnp.sum(w), 1.0))
        return delta @ tmat, rms

    tmat, rms = jax.lax.fori_loop(0, num_iters, body,
                                  (jnp.eye(4), jnp.float32(0.0)))
    return tmat, rms


icp_batch = jax.vmap(icp_point_to_plane, in_axes=(0, 0, 0, 0, None))
"""Batched ICP over (B, N, 3) source/target stacks — the whole-sequence
pairwise chain of calculate_transformationsV2 as one call."""

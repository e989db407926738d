"""Car dimension estimation (rotating-calipers style, vmappable JAX).

Behavioral contract (pseudo_label_generator/3d/scripts/dimension_estimator.py):

* ``estimate_best_params`` (:189-238): for theta in 0..89 deg project XZ
  onto the rotated axes; closeness-to-edge score = -sum sigmoid(steepness *
  min(distance to 10th/90th-percentile edges)); pick the best theta and the
  min/max extent rectangle;
* ``get_3D_bbox`` (:122-149): PCA OBB of the 8 rectangle corners with the
  y-extent from the point heights;
* degenerate-view handling (:77-100): when the viewing direction nearly
  aligns with the car axis (|sin diff| < 0.09) only width/height are
  estimable (length forced to template); |cos diff| < 0.2 similarly for
  width;
* per-car result = median over the k=3 closest frames (:111-114); sanity
  clamps (l/w > 4, l < 2, w < 1 ... ) fall back to template dims — note the
  reference's line 115 carries an ``or True`` that forces template dims
  ALWAYS; ``force_template_dims=True`` reproduces that shipped behavior.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e9


@dataclasses.dataclass(frozen=True)
class DimConfig:
    steepness: float = 10.0
    template_length: float = 3.88
    template_width: float = 1.63
    template_height: float = 1.526
    k_frames: int = 3
    force_template_dims: bool = True  # reference dimension_estimator.py:115


def _percentile_sorted(sorted_vals: jnp.ndarray, n: jnp.ndarray,
                       q: float) -> jnp.ndarray:
    """Linear-interpolated percentile over the valid (sorted) prefix."""
    pos = q / 100.0 * (n - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, n - 1)
    w = pos - lo
    return sorted_vals[lo] * (1 - w) + sorted_vals[hi] * w


@partial(jax.jit, static_argnames=("cfg",))
def estimate_rectangle(points: jnp.ndarray, mask: jnp.ndarray,
                       cfg: DimConfig = DimConfig()):
    """(N, 3) padded points -> (theta_best, extent_xz (2,), score).

    theta is the in-plane rotation of the best-fit rectangle in [0, pi/2).
    """
    xz = points[:, [0, 2]]
    n = jnp.maximum(jnp.sum(mask), 1)
    thetas = jnp.deg2rad(jnp.arange(0, 90, dtype=jnp.float32))

    def per_theta(theta):
        e1 = jnp.stack([jnp.cos(theta), jnp.sin(theta)])
        e2 = jnp.stack([-jnp.sin(theta), jnp.cos(theta)])
        c1 = xz @ e1
        c2 = xz @ e2
        c1s = jnp.sort(jnp.where(mask, c1, BIG))
        c2s = jnp.sort(jnp.where(mask, c2, BIG))
        p90_1 = _percentile_sorted(c1s, n, 90)
        p10_1 = _percentile_sorted(c1s, n, 10)
        p90_2 = _percentile_sorted(c2s, n, 90)
        p10_2 = _percentile_sorted(c2s, n, 10)
        d1 = jnp.minimum(jnp.abs(c1 - p10_1), jnp.abs(p90_1 - c1))
        d2 = jnp.minimum(jnp.abs(c2 - p10_2), jnp.abs(p90_2 - c2))
        d1 = jax.nn.sigmoid(d1 * cfg.steepness)
        d2 = jax.nn.sigmoid(d2 * cfg.steepness)
        score = -jnp.sum(jnp.where(mask, jnp.minimum(d1, d2), 0.0))
        ext1 = (jnp.max(jnp.where(mask, c1, -BIG))
                - jnp.min(jnp.where(mask, c1, BIG)))
        ext2 = (jnp.max(jnp.where(mask, c2, -BIG))
                - jnp.min(jnp.where(mask, c2, BIG)))
        return score, jnp.stack([ext1, ext2])

    scores, extents = jax.lax.map(per_theta, thetas)
    best = jnp.argmax(scores)
    return thetas[best], extents[best], scores[best]


@partial(jax.jit, static_argnames=("cfg",))
def estimate_dimensions_one(points: jnp.ndarray, mask: jnp.ndarray,
                            center: jnp.ndarray,
                            cfg: DimConfig = DimConfig()):
    """One frame's points -> (l, h, w) with degenerate-view handling.

    points are car-local (centered); center is the camera-frame car center
    used for the viewing-angle test (dimension_estimator.py:77-100).
    Returns (dims_lhw (3,), est_theta).
    """
    theta, ext_xz, _ = estimate_rectangle(points, mask, cfg)
    ys = jnp.where(mask, points[:, 1], BIG)
    y_min = jnp.min(ys)
    y_max = jnp.max(jnp.where(mask, points[:, 1], -BIG))
    height = y_max - y_min

    # order extents so index 0 = long axis (length candidate)
    long_first = ext_xz[0] >= ext_xz[1]
    ext0 = jnp.where(long_first, ext_xz[0], ext_xz[1])
    ext1 = jnp.where(long_first, ext_xz[1], ext_xz[0])
    theta_long = jnp.where(long_first, theta, theta + jnp.pi / 2)

    # the reference's OBB angle is the NEGATED 2D long-axis angle
    # (get_3D_bbox: angle = -arctan2(ez, ex)), so angle_of_car =
    # -angle - pi/2 = theta_long - pi/2 in our scan coordinates
    angle_of_car = theta_long - jnp.pi / 2.0
    viewing = jnp.arctan2(center[2], center[0]) - jnp.pi / 2.0
    diff = angle_of_car - viewing

    normal = jnp.stack([ext0, height, ext1])
    degen_length = jnp.stack([jnp.float32(cfg.template_length), height, ext1])
    degen_width = jnp.stack([ext0, height, jnp.float32(cfg.template_width)])
    degen_weird = jnp.stack([jnp.float32(cfg.template_length), height, ext0])

    dims = jnp.where(jnp.abs(jnp.sin(diff)) < 0.09, degen_length,
                     jnp.where(jnp.abs(jnp.cos(diff)) < 0.2,
                               jnp.where(ext0 > 2.5, degen_width,
                                         degen_weird),
                               normal))
    # est_theta convention = reference angle - pi/2 (estimate_dimensions
    # est_theta branch) with angle = -theta_long
    return dims, -theta_long - jnp.pi / 2.0


def estimate_car_dimensions(frames_points, frames_masks, center,
                            cfg: DimConfig = DimConfig()) -> Tuple[np.ndarray, float]:
    """Median over up to k frames (host orchestration).

    frames_points: (F, N, 3) car-local per-frame clouds; frames_masks (F, N).
    Returns ((l, w, h), theta_est) with the reference's sanity clamps.
    """
    k = min(len(frames_points), cfg.k_frames)
    dims_all = np.zeros((k, 3), np.float32)
    thetas = np.zeros(k, np.float32)
    for i in range(k):
        d, t = estimate_dimensions_one(jnp.asarray(frames_points[i]),
                                       jnp.asarray(frames_masks[i]),
                                       jnp.asarray(center), cfg)
        dims_all[i] = np.asarray(d)
        thetas[i] = float(t)
    l = float(np.median(dims_all[:, 0]))
    h = float(np.median(dims_all[:, 1]))
    w = float(np.median(dims_all[:, 2]))

    bad = (w <= 0 or l / max(w, 1e-6) > 4.0 or l < 2.0 or w < 1.0
           or h < 1.0 or w > 2.5 or l > 6.0
           or np.isnan(l) or np.isnan(w) or np.isnan(h))
    if bad or cfg.force_template_dims:
        l, w, h = cfg.template_length, cfg.template_width, cfg.template_height
    return np.array([l, w, h], np.float32), float(np.median(thetas))

"""Outlier-removal ensemble + downsampling (vmappable JAX).

Behavioral contract (pseudo_label_generator/3d/scripts/loader.py:4072-4132,
ensamble_clustering): five detectors vote on standardized points; a point is
dropped when >= ensamble_threshold (2) flag it:

1. z-score: max per-axis |z| > 3;
2. HBOS (pyod): histogram-based outlier score;
3. open3d statistical outlier removal: mean 200-NN distance beyond
   mean + 1.0 std of that statistic;
4. HDBSCAN noise; 5. DBSCAN(eps=0.2, min_samples=10) noise.

TPU-native equivalents with the same decision semantics: z-score exact;
HBOS via fixed-bin per-axis histograms (density rank-scored at the
contamination quantile, pyod's default 0.1); SOR exact via top-k over the
distance matrix; DBSCAN noise exact (a point is noise iff no core point
within eps, computed from the neighbor-count matrix); HDBSCAN exact via
``hdbscan_np`` (mutual-reachability MST -> condensed tree -> excess-of-mass,
differentially tested against scikit-learn) in the host ensemble
(``ensemble_inlier_mask_host``, the pipeline default).  The fully-jitted
``ensemble_inlier_mask`` keeps a second-DBSCAN approximation for that vote
(HDBSCAN's hierarchy extraction is sequential union-find work that does not
map to fixed-shape XLA) — use the host variant when exactness matters.

All functions are mask-aware and fixed-shape (they return refined masks).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from monosowa_tpu.ops.tfl import pairwise_sq_dists

BIG = 1e9


def _standardize(pts, mask):
    n = jnp.maximum(jnp.sum(mask), 1)
    mean = jnp.sum(jnp.where(mask[:, None], pts, 0.0), 0) / n
    var = jnp.sum(jnp.where(mask[:, None], (pts - mean) ** 2, 0.0), 0) / n
    return (pts - mean) / jnp.sqrt(var + 1e-9)


def zscore_outliers(pts, mask, threshold: float = 3.0):
    z = _standardize(pts, mask)
    z = jnp.abs(_standardize(z, mask))  # reference standardizes twice
    return (jnp.max(z, axis=1) > threshold) & mask


def hbos_outliers(pts, mask, n_bins: int = 10, contamination: float = 0.1):
    """Per-axis histogram density score; top ``contamination`` fraction
    flagged (pyod HBOS defaults)."""
    z = _standardize(pts, mask)
    score = jnp.zeros(pts.shape[0])
    for axis in range(3):
        v = z[:, axis]
        lo = jnp.min(jnp.where(mask, v, BIG))
        hi = jnp.max(jnp.where(mask, v, -BIG))
        width = jnp.maximum(hi - lo, 1e-6) / n_bins
        idx = jnp.clip(((v - lo) / width).astype(jnp.int32), 0, n_bins - 1)
        counts = jnp.zeros(n_bins).at[idx].add(mask.astype(jnp.float32))
        dens = counts[idx] / jnp.maximum(jnp.sum(mask), 1)
        score = score + (-jnp.log(dens + 1e-9))
    score = jnp.where(mask, score, -BIG)
    n = jnp.maximum(jnp.sum(mask), 1)
    k = jnp.maximum((n * contamination).astype(jnp.int32), 1)
    srt = jnp.sort(score)[::-1]
    thresh = srt[jnp.minimum(k - 1, score.shape[0] - 1)]
    return (score >= thresh) & mask


def sor_outliers(pts, mask, nb_neighbors: int = 200, std_ratio: float = 1.0):
    """Statistical outlier removal (open3d semantics)."""
    d2 = pairwise_sq_dists(pts, pts)
    d2 = jnp.where(mask[None, :], d2, BIG)
    d2 = d2 + jnp.eye(pts.shape[0]) * BIG
    k = min(nb_neighbors, pts.shape[0] - 1)
    nn = -jax.lax.top_k(-d2, k)[0]                      # (N, k) smallest
    mean_d = jnp.mean(jnp.sqrt(jnp.maximum(nn, 0.0)), axis=1)
    n = jnp.maximum(jnp.sum(mask), 1)
    mu = jnp.sum(jnp.where(mask, mean_d, 0.0)) / n
    sd = jnp.sqrt(jnp.sum(jnp.where(mask, (mean_d - mu) ** 2, 0.0)) / n)
    return (mean_d > mu + std_ratio * sd) & mask


def dbscan_noise(pts, mask, eps: float = 0.2, min_samples: int = 10):
    """Noise flag: not within eps of any core point (standardized space)."""
    z = _standardize(pts, mask)
    d2 = pairwise_sq_dists(z, z)
    within = (d2 <= eps * eps) & mask[None, :] & mask[:, None]
    n_nbr = jnp.sum(within, axis=1)                     # includes self
    core = (n_nbr >= min_samples) & mask
    reachable = jnp.any(within & core[None, :], axis=1)
    return (~reachable) & mask


@partial(jax.jit, static_argnames=("threshold",))
def ensemble_inlier_mask(pts: jnp.ndarray, mask: jnp.ndarray,
                         threshold: int = 2) -> jnp.ndarray:
    """Refined validity mask after the 5-vote ensemble."""
    votes = (zscore_outliers(pts, mask).astype(jnp.int32)
             + hbos_outliers(pts, mask).astype(jnp.int32)
             + sor_outliers(pts, mask).astype(jnp.int32)
             + dbscan_noise(pts, mask, eps=0.2).astype(jnp.int32)
             + dbscan_noise(pts, mask, eps=0.45, min_samples=5
                            ).astype(jnp.int32))
    keep = mask & (votes < threshold)
    # degenerate guard: if everything got flagged, keep the original mask
    return jnp.where(jnp.any(keep), keep, mask)


@jax.jit
def _four_votes(pts: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Vote counts from the four detectors that map cleanly to XLA."""
    return (zscore_outliers(pts, mask).astype(jnp.int32)
            + hbos_outliers(pts, mask).astype(jnp.int32)
            + sor_outliers(pts, mask).astype(jnp.int32)
            + dbscan_noise(pts, mask, eps=0.2).astype(jnp.int32))


def ensemble_inlier_mask_host(pts, threshold: int = 2):
    """Exact five-voter ensemble: four jitted votes + exact HDBSCAN noise.

    Host-side counterpart of ``ensemble_inlier_mask`` with the HDBSCAN vote
    computed by the real algorithm (loader.py:4112-4115 uses
    ``hdbscan.HDBSCAN()`` defaults on the standardized cloud).  Returns a
    boolean keep-mask over the dense (unpadded) input points.
    """
    import numpy as np

    from monosowa_tpu.sowa.hdbscan_np import hdbscan_noise

    pts = np.asarray(pts, dtype=np.float64)
    n = pts.shape[0]
    if n <= 3:  # reference guard, loader.py:4074-4075
        return np.ones(n, dtype=bool)
    votes = np.asarray(_four_votes(jnp.asarray(pts), jnp.ones(n, bool)))
    z = (pts - pts.mean(0)) / np.sqrt(pts.var(0) + 1e-9)
    votes = votes + hdbscan_noise(z)
    keep = votes < threshold
    return keep if keep.any() else np.ones(n, dtype=bool)

"""Differential parity for the outlier-ensemble voters that are exactly
runnable in this image: the z-score voter (the reference's literal numpy
formula, loader.py:4080-4091) and the DBSCAN voter against real
scikit-learn DBSCAN(eps=0.2, min_samples=10) on StandardScaler-scaled
points (loader.py:4116-4120).  pyod/open3d/hdbscan are absent, so those
voters keep their documented same-decision-semantics equivalents.
"""

import numpy as np
import pytest

sklearn = pytest.importorskip("sklearn")

from sklearn.cluster import DBSCAN  # noqa: E402
from sklearn.preprocessing import StandardScaler  # noqa: E402


def _cloud(seed, n=400):
    rng = np.random.default_rng(seed)
    core = rng.normal(size=(n - 24, 3)) * np.array([0.8, 0.3, 1.6])
    stragglers = rng.normal(size=(16, 3)) * 0.2 + np.array([4.0, 0.0, 2.0])
    far = rng.uniform(6, 9, (8, 3))
    return np.concatenate([core, stragglers, far]).astype(np.float64)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_zscore_voter_matches_reference_formula(seed):
    import jax.numpy as jnp

    from monosowa_tpu.sowa.filtering import zscore_outliers

    pcloud = _cloud(seed)
    scaler = StandardScaler()
    pcloud_scaled = scaler.fit_transform(pcloud)
    z_scores = np.abs((pcloud_scaled - np.mean(pcloud_scaled, axis=0))
                      / np.std(pcloud_scaled, axis=0))
    ref = np.where(np.max(z_scores, axis=1) > 3, 1, 0).astype(bool)

    ours = np.asarray(zscore_outliers(
        jnp.asarray(pcloud, jnp.float32),
        jnp.ones(pcloud.shape[0], bool)))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dbscan_voter_matches_sklearn(seed):
    import jax.numpy as jnp

    from monosowa_tpu.sowa.filtering import dbscan_noise

    pcloud = _cloud(seed)
    pcloud_scaled = StandardScaler().fit_transform(pcloud)
    labels = DBSCAN(eps=0.2, min_samples=10).fit_predict(pcloud_scaled)
    ref_noise = labels == -1

    ours = np.asarray(dbscan_noise(
        jnp.asarray(pcloud, jnp.float32),
        jnp.ones(pcloud.shape[0], bool), eps=0.2, min_samples=10))
    np.testing.assert_array_equal(ours, ref_noise)

"""Differential parity for the exact HDBSCAN ensemble voter.

The reference's fifth outlier-ensemble vote is ``hdbscan.HDBSCAN()`` noise
(pseudo_label_generator/3d/scripts/loader.py:4112-4115).  scikit-learn in
this image ships the same algorithm (``sklearn.cluster.HDBSCAN``) including
its Cython tree stage, so the rebuild is tested two ways:

1. tree-stage bit-exactness: our single-linkage output fed through
   scikit-learn's own ``tree_to_labels`` must reproduce our condensed-tree /
   excess-of-mass / labelling decisions exactly — this isolates our tree
   logic from MST tie ordering;
2. full-pipeline agreement vs ``sklearn.cluster.HDBSCAN`` across a grid of
   blob+noise scenes and parameter settings.  Mutual-reachability graphs are
   tie-dense by construction (every in-radius edge of a point weighs exactly
   its core distance), and equal-weight MST edge order legitimately changes
   marginal clusters, so the pipeline check requires exact equality in the
   large majority of cases and bounded divergence (tie artifacts only) in
   the rest.
"""

from __future__ import annotations

import numpy as np
import pytest

from monosowa_tpu.sowa import hdbscan_np as H
from monosowa_tpu.sowa.hdbscan_np import hdbscan_labels, hdbscan_noise

sklearn = pytest.importorskip("sklearn")
from sklearn.cluster import HDBSCAN as SkHDBSCAN  # noqa: E402


def _scene(seed: int):
    r = np.random.default_rng(seed)
    ncl = int(r.integers(2, 5))
    centers = [(0, 0, 0), (3, 0, 1), (0, 4, -2), (5, 5, 5)][:ncl]
    blobs = [r.normal(c, 0.3, (int(r.integers(40, 120)), 3)) for c in centers]
    noise = r.uniform(-6, 8, (60, 3))
    return np.vstack(blobs + [noise])


def _partition_consistent(a, b):
    """Every cluster of ``a`` maps to exactly one non-noise cluster of ``b``."""
    for lab in set(a.tolist()) - {-1}:
        tgt = set(b[a == lab].tolist())
        if len(tgt) != 1 or -1 in tgt:
            return False
    return True


def test_tree_stage_bit_exact_vs_sklearn():
    """Condense + EOM + labelling agree with sklearn's own Cython tree code
    when both consume the identical single-linkage hierarchy."""
    from sklearn.cluster._hdbscan._tree import HIERARCHY_dtype, tree_to_labels

    for seed in range(4):
        x = _scene(seed)
        n = len(x)
        for mcs, ms in [(5, 5), (10, 10), (25, 10)]:
            d, core = H._core_distances(x, ms)
            mreach = np.maximum(np.maximum(core[:, None], core[None, :]), d)
            np.fill_diagonal(mreach, np.inf)
            linkage = H._single_linkage(H._mst_prim(mreach), n)

            hier = np.empty(n - 1, dtype=HIERARCHY_dtype)
            hier["left_node"] = linkage[:, 0].astype(np.intp)
            hier["right_node"] = linkage[:, 1].astype(np.intp)
            hier["value"] = linkage[:, 2]
            hier["cluster_size"] = linkage[:, 3].astype(np.intp)
            sk_labels, _ = tree_to_labels(hier, min_cluster_size=mcs)

            ours = hdbscan_labels(x, mcs, ms)
            assert np.array_equal(ours == -1, sk_labels == -1)
            assert _partition_consistent(ours, sk_labels)
            assert _partition_consistent(sk_labels, ours)


def test_full_pipeline_vs_sklearn_grid():
    params = [(5, None), (10, None), (25, 10), (50, 10), (5, 15)]
    exact = total = 0
    for seed in range(8):
        x = _scene(seed)
        for mcs, ms in params:
            ours = hdbscan_labels(x, mcs, ms)
            sk = SkHDBSCAN(min_cluster_size=mcs, min_samples=ms,
                           algorithm="brute").fit_predict(x)
            total += 1
            if (np.array_equal(ours == -1, sk == -1)
                    and _partition_consistent(ours, sk)
                    and _partition_consistent(sk, ours)):
                exact += 1
            else:
                # tie-artifact bound: tiny noise-set divergence only
                diff = np.sum((ours == -1) != (sk == -1))
                assert diff <= max(2, int(0.02 * len(x))), (seed, mcs, ms)
    assert exact >= int(0.85 * total), f"{exact}/{total} exact"


def test_well_separated_blobs_exact():
    """No uniform-noise floor -> no marginal tie clusters -> exact match."""
    for seed in range(4):
        r = np.random.default_rng(seed + 100)
        x = np.vstack([r.normal(c, 0.2, (80, 3))
                       for c in [(0, 0, 0), (6, 0, 0), (0, 6, 6)]])
        ours = hdbscan_labels(x, 10, None)
        sk = SkHDBSCAN(min_cluster_size=10, algorithm="brute").fit_predict(x)
        assert np.array_equal(ours == -1, sk == -1)
        assert _partition_consistent(ours, sk)
        assert _partition_consistent(sk, ours)


def test_degenerate_inputs():
    assert np.array_equal(hdbscan_labels(np.zeros((0, 3))), np.empty(0))
    assert (hdbscan_labels(np.random.default_rng(0).normal(size=(3, 3)),
                           min_cluster_size=5) == -1).all()
    with pytest.raises(ValueError):
        hdbscan_labels(np.zeros((10, 3)), min_cluster_size=1)


def test_duplicate_points_do_not_crash():
    r = np.random.default_rng(3)
    base = r.normal(0, 0.3, (40, 3))
    x = np.vstack([base, base[:10], r.uniform(-4, 4, (20, 3))])
    labels = hdbscan_labels(x, 5, None)
    assert labels.shape == (70,)
    assert (labels >= -1).all()


def test_host_ensemble_uses_exact_vote():
    """The host ensemble keeps a dense car body and drops planted far
    outliers, with the HDBSCAN vote live (monkeypatched counter)."""
    from monosowa_tpu.sowa import filtering

    r = np.random.default_rng(0)
    body = r.normal(0, 1.0, (400, 3)) * np.array([2.0, 0.7, 0.8])
    outliers = r.uniform(15, 25, (12, 3))
    pts = np.vstack([body, outliers])
    keep = filtering.ensemble_inlier_mask_host(pts)
    assert keep[:400].mean() > 0.9
    assert keep[400:].mean() < 0.2

    calls = []
    orig = hdbscan_noise

    def spy(x, *a, **k):
        calls.append(len(x))
        return orig(x, *a, **k)

    import monosowa_tpu.sowa.hdbscan_np as mod
    old = mod.hdbscan_noise
    mod.hdbscan_noise = spy
    try:
        filtering.ensemble_inlier_mask_host(pts)
    finally:
        mod.hdbscan_noise = old
    assert calls == [len(pts)]

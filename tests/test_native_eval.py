"""Native C++ eval kernels vs the python oracle (randomized parity)."""

import numpy as np
import pytest

from monosowa_tpu.evalkitti import eval as E
from monosowa_tpu.evalkitti import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native kernels unavailable")


def _rand_boxes5(n, rng):
    return np.stack([rng.uniform(-20, 20, n), rng.uniform(5, 50, n),
                     rng.uniform(2, 5, n), rng.uniform(1, 2.5, n),
                     rng.uniform(-np.pi, np.pi, n)], 1)


def test_rotated_overlap_matches_jax():
    rng = np.random.default_rng(0)
    a = _rand_boxes5(12, rng)
    b = _rand_boxes5(9, rng)
    got = native.rotated_overlap(a, b)
    want = E.bev_box_overlap(a, b)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_d3_overlap_matches_jax():
    rng = np.random.default_rng(1)
    a7 = np.stack([rng.uniform(-20, 20, 10), rng.uniform(0.5, 2, 10),
                   rng.uniform(5, 50, 10), rng.uniform(2, 5, 10),
                   rng.uniform(1.2, 2, 10), rng.uniform(1, 2.5, 10),
                   rng.uniform(-np.pi, np.pi, 10)], 1)
    b7 = a7.copy()
    b7[:, 0] += rng.uniform(-1, 1, 10)
    got = native.d3_overlap(a7, b7)
    want = E.d3_box_overlap(a7, b7)
    np.testing.assert_allclose(got, want, atol=1e-4)


def _random_stat_case(rng, num_gt=8, num_dt=12):
    overlaps = rng.uniform(0, 1, (num_dt, num_gt))
    gt_datas = np.concatenate([rng.uniform(0, 300, (num_gt, 4)),
                               rng.uniform(-np.pi, np.pi, (num_gt, 1))], 1)
    dt_datas = np.concatenate([rng.uniform(0, 300, (num_dt, 4)),
                               rng.uniform(-np.pi, np.pi, (num_dt, 1)),
                               rng.uniform(0, 1, (num_dt, 1))], 1)
    ignored_gt = rng.choice([-1, 0, 1], num_gt).astype(np.int64)
    ignored_det = rng.choice([-1, 0, 1], num_dt).astype(np.int64)
    dc = rng.uniform(0, 300, (2, 4))
    dc[:, 2:] = dc[:, :2] + rng.uniform(10, 100, (2, 2))
    return overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("compute_fp", [False, True])
def test_compute_statistics_parity(seed, compute_fp):
    rng = np.random.default_rng(seed)
    case = _random_stat_case(rng)
    for thresh in (0.0, 0.5):
        got = native.compute_statistics(*case, metric=0, min_overlap=0.5,
                                        thresh=thresh, compute_fp=compute_fp,
                                        compute_aos=True)
        want = E.compute_statistics(*case, metric=0, min_overlap=0.5,
                                    thresh=thresh, compute_fp=compute_fp,
                                    compute_aos=True)
        assert got[0] == want[0]            # tp
        assert got[1] == want[1]            # fp
        assert got[2] == want[2]            # fn
        assert got[3] == pytest.approx(want[3], abs=1e-9)
        np.testing.assert_allclose(got[4], want[4])


def test_accumulate_pr_parity():
    rng = np.random.default_rng(42)
    case = _random_stat_case(rng, num_gt=10, num_dt=15)
    thresholds = np.linspace(0.1, 0.9, 7)
    pr_native = np.zeros((7, 4))
    native.accumulate_pr(*case, metric=0, min_overlap=0.5,
                         thresholds=thresholds, compute_aos=True,
                         pr=pr_native)
    pr_py = np.zeros((7, 4))
    for t, th in enumerate(thresholds):
        tp, fp, fn, sim, _ = E.compute_statistics(
            *case, metric=0, min_overlap=0.5, thresh=th, compute_fp=True,
            compute_aos=True)
        pr_py[t, 0] += tp
        pr_py[t, 1] += fp
        pr_py[t, 2] += fn
        if sim != -1:
            pr_py[t, 3] += sim
    np.testing.assert_allclose(pr_native, pr_py, atol=1e-9)


def test_accumulate_pr_parity_at_scale():
    """Fused statistics at realistic-eval scale: ~1k GT x ~1.5k dets per
    call with a dense DontCare field (the devkit's fp-inside-dc discount),
    plus every ignored-class combination.  Guards the native path where the
    small randomized cases cannot: score-threshold tie-breaks, dc overlap
    accumulation and assigned-det bookkeeping all at volume."""
    rng = np.random.default_rng(7)
    num_gt, num_dt = 800, 1200
    overlaps = rng.uniform(0, 1, (num_dt, num_gt))
    # cluster overlaps near the 0.5 min_overlap so assignment order matters
    near = rng.uniform(size=overlaps.shape) < 0.3
    overlaps[near] = 0.5 + rng.normal(scale=0.02, size=int(near.sum()))
    gt_datas = np.concatenate([rng.uniform(0, 1200, (num_gt, 4)),
                               rng.uniform(-np.pi, np.pi, (num_gt, 1))], 1)
    dt_datas = np.concatenate([rng.uniform(0, 1200, (num_dt, 4)),
                               rng.uniform(-np.pi, np.pi, (num_dt, 1)),
                               rng.uniform(0, 1, (num_dt, 1))], 1)
    # duplicate scores: threshold comparisons must tie-break identically
    dt_datas[::7, -1] = np.round(dt_datas[::7, -1], 1)
    ignored_gt = rng.choice([-1, 0, 1], num_gt,
                            p=[0.3, 0.4, 0.3]).astype(np.int64)
    ignored_det = rng.choice([-1, 0, 1], num_dt,
                             p=[0.3, 0.4, 0.3]).astype(np.int64)
    # pathological DontCare density: 64 large, heavily overlapping regions
    dc = rng.uniform(0, 1100, (64, 4))
    dc[:, 2:] = dc[:, :2] + rng.uniform(50, 400, (64, 2))

    case = (overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc)
    thresholds = np.linspace(0.05, 0.95, 11)
    pr_native = np.zeros((11, 4))
    native.accumulate_pr(*case, metric=0, min_overlap=0.5,
                         thresholds=thresholds, compute_aos=True,
                         pr=pr_native)
    pr_py = np.zeros((11, 4))
    for t, th in enumerate(thresholds):
        tp, fp, fn, sim, _ = E.compute_statistics(
            *case, metric=0, min_overlap=0.5, thresh=th, compute_fp=True,
            compute_aos=True)
        pr_py[t, :3] += (tp, fp, fn)
        if sim != -1:
            pr_py[t, 3] += sim
    np.testing.assert_allclose(pr_native, pr_py, atol=1e-9)

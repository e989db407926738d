"""ICP recovery tests + custom-dataset harness round trip."""

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.ops.geometry import rot_y
from monosowa_tpu.ops.icp import estimate_normals, icp_point_to_plane
from monosowa_tpu.sowa import custom_dataset


def _surface_cloud(n=600, seed=0):
    """Points on a bumpy plane + a wall (gives point-to-plane constraints in
    multiple directions)."""
    rng = np.random.default_rng(seed)
    plane = np.stack([rng.uniform(-5, 5, n // 2),
                      0.05 * np.sin(rng.uniform(0, 6, n // 2)),
                      rng.uniform(-5, 5, n // 2)], 1)
    wall = np.stack([rng.uniform(-5, 5, n // 4),
                     rng.uniform(0, 2, n // 4),
                     np.full(n // 4, 5.0) + 0.05 * rng.normal(size=n // 4)], 1)
    wall2 = np.stack([np.full(n - n // 2 - n // 4, -5.0),
                      rng.uniform(0, 2, n - n // 2 - n // 4),
                      rng.uniform(-5, 5, n - n // 2 - n // 4)], 1)
    return np.concatenate([plane, wall, wall2]).astype(np.float32)


def test_normals_on_plane():
    pts = _surface_cloud()
    mask = np.ones(len(pts), bool)
    normals = np.asarray(estimate_normals(jnp.asarray(pts),
                                          jnp.asarray(mask)))
    # plane points (first half) should have ~vertical normals
    ny = np.abs(normals[:200, 1])
    assert np.median(ny) > 0.95


def test_icp_recovers_small_transform():
    src = _surface_cloud(seed=1)
    true_t = np.eye(4)
    true_t[:3, :3] = np.asarray(rot_y(jnp.float32(0.05)))
    true_t[:3, 3] = [0.3, 0.05, -0.2]
    tgt = src @ true_t[:3, :3].T + true_t[:3, 3]
    mask = np.ones(len(src), bool)
    est, rms = icp_point_to_plane(jnp.asarray(src), jnp.asarray(mask),
                                  jnp.asarray(tgt), jnp.asarray(mask))
    est = np.asarray(est)
    np.testing.assert_allclose(est[:3, 3], true_t[:3, 3], atol=0.05)
    np.testing.assert_allclose(est[:3, :3], true_t[:3, :3], atol=0.02)
    assert float(rms) < 0.05


def test_custom_dataset_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    for i in range(3):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        gt = np.array([i * 2.0, 1.0, 10.0, 3.9, 1.6, 1.5, 0.3], np.float32)
        custom_dataset.save_pair(str(tmp_path), f"car{i}", pts, gt)
    points, boxes, offsets = custom_dataset.load_pairs(str(tmp_path),
                                                       distance_between=10.0)
    assert len(points) == 3 and boxes.shape == (3, 7)
    np.testing.assert_allclose(offsets[:, 0], [0, 10, 20])

    # identity fit -> IoU 1; shifted fit -> lower
    iou_same = custom_dataset.compute_pair_iou(boxes[0], boxes[0])
    assert iou_same == pytest.approx(1.0, abs=1e-4)
    shifted = boxes[0].copy()
    shifted[0] += 1.0
    assert custom_dataset.compute_pair_iou(shifted, boxes[0]) < 0.6

    ious = custom_dataset.evaluate_fitting_on_pairs(
        str(tmp_path), fit_fn=lambda pts: boxes[0])
    assert len(ious) == 3 and ious[0] == pytest.approx(1.0, abs=1e-4)


def test_find_gt_matching_gate():
    gt = np.array([[0.0, 0, 10], [20.0, 0, 30]])
    assert custom_dataset.find_gt_for_car(np.array([1.0, 0, 10.5]), gt) == 0
    assert custom_dataset.find_gt_for_car(np.array([10.0, 0, 20.0]), gt) is None

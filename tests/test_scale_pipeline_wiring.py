"""Wiring tests for the real-LiDAR scale-detector branch of the pipeline.

Reference semantics under test (scale_detector.py / optimizer.py):
  * the re-gathered scale_lidar cloud feeds ONLY optimize_scale
    (optimizer.py:186-188); bbox_reducer_tracked always gathers from the
    AGGREGATED cloud cars[i].lidar (scale_detector.py:161, 204);
  * an empty scale_lidar gather skips both the scale optimizer and the
    reducer (optimizer.py:47, scale_detector.py:139) — the car keeps its
    grid-fit pose/dims.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.sowa import pipeline
from monosowa_tpu.sowa import scale as scale_mod
from monosowa_tpu.sowa.fitting import FitConfig

from test_pipeline_e2e import H, P2, TRUE_POSE, W, _make_scene


def _labeler():
    cfg = pipeline.PipelineConfig(
        nscans_before=3, nscans_after=3, max_cars=4, max_points=1024,
        min_standing_points=400,
        use_pseudo_lidar=False,
        use_scale_detector=True, use_bbox_reducer=True,
        fit=FitConfig(fine_chunk=12))
    return pipeline.PseudoLabeler(cfg)


def _run(labeler, pts, masks, transforms):
    window = list(range(-3, 4))
    return labeler.label_frame(
        window, 3,
        get_points=lambda k: pts[k],
        get_masks=lambda k: masks[k],
        transforms=transforms, p2=P2, img_hw=(H, W))


SENTINEL = 123.0   # x-coordinate tag for the re-gathered cloud


def test_reducer_uses_aggregated_cloud(monkeypatch):
    """optimize_scale sees the re-gathered scan; bbox_reduce does not."""
    pts, masks, transforms = _make_scene()
    labeler = _labeler()

    calls = {}

    def fake_extract(center, lwh, theta, scans, tmats, bbox_scale=1.5):
        calls["bbox_scale"] = bbox_scale
        return np.full((64, 3), SENTINEL, np.float32)

    real_opt = scale_mod.optimize_scale

    def spy_opt(scan, scan_mask, bank_pts, init, *a, **k):
        calls["opt_scan"] = np.asarray(scan)[np.asarray(scan_mask)]
        return real_opt(scan, scan_mask, bank_pts, init, *a, **k)

    real_reduce = scale_mod.bbox_reduce

    def spy_reduce(scan, scan_mask, center, lwh, theta):
        calls["reduce_scan"] = np.asarray(scan)[np.asarray(scan_mask)]
        return real_reduce(scan, scan_mask, center, lwh, theta)

    monkeypatch.setattr(scale_mod, "extract_scale_lidar_scans", fake_extract)
    monkeypatch.setattr(scale_mod, "optimize_scale", spy_opt)
    monkeypatch.setattr(scale_mod, "bbox_reduce", spy_reduce)

    cars = _run(labeler, pts, masks, transforms)
    assert len(cars) == 1
    # the gather box is bloated by the configured scale (config.yaml:105)
    assert calls["bbox_scale"] == pytest.approx(1.5)
    # the scale optimizer consumed the re-gathered cloud ...
    assert np.all(calls["opt_scan"][:, 0] == SENTINEL)
    # ... but the reducer ran on the aggregated cloud, which contains no
    # sentinel rows
    assert len(calls["reduce_scan"]) > 0
    assert not np.any(calls["reduce_scan"][:, 0] == SENTINEL)


def test_empty_gather_skips_scale_and_reducer(monkeypatch):
    """Empty scale_lidar -> neither stage runs; grid-fit pose survives."""
    pts, masks, transforms = _make_scene()
    labeler = _labeler()

    monkeypatch.setattr(
        scale_mod, "extract_scale_lidar_scans",
        lambda *a, **k: np.zeros((0, 3), np.float32))

    def boom(*a, **k):   # pragma: no cover - failure path
        raise AssertionError("must not run on an empty scale_lidar gather")

    monkeypatch.setattr(scale_mod, "optimize_scale", boom)
    monkeypatch.setattr(scale_mod, "bbox_reduce", boom)

    cars = _run(labeler, pts, masks, transforms)
    assert len(cars) == 1
    car = cars[0]
    # grid-fit pose preserved (same gate as test_label_frame_recovers_car)
    assert car["x"] == pytest.approx(TRUE_POSE["x"], abs=0.35)
    assert car["z"] == pytest.approx(TRUE_POSE["z"], abs=0.35)

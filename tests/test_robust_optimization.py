"""robust_optimization branch (optimize_car_robust / optimize_loc_only,
optimizer.py:27-44, 114-155): dims-estimator yaw + translation-only grid,
with fallback to the standard fit on invalid estimates."""

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.ops.geometry import rot_y
from monosowa_tpu.sowa import fitting, pipeline
from monosowa_tpu.sowa.fitting import FitConfig
from monosowa_tpu.sowa.templates import TemplateBank

from test_pipeline_e2e import H, P2, TRUE_POSE, W, _make_scene


def test_fit_loc_only_recovers_translation():
    rng = np.random.default_rng(0)
    bank = TemplateBank.default()
    template = jnp.asarray(bank.points[0])
    true = dict(x=0.8, z=1.2, theta=0.7)
    rot = np.asarray(rot_y(jnp.float32(true["theta"])))
    scan = (bank.points[0] @ rot.T + [true["x"], 0.0, true["z"]]
            + rng.normal(scale=0.02, size=bank.points[0].shape))
    mask = np.ones(len(scan), bool)
    cfg = FitConfig(n_dx=20, n_dz=20, exact_grid_chunk=20)
    res = fitting.fit_loc_only(jnp.asarray(scan, jnp.float32),
                               jnp.asarray(mask), template,
                               jnp.float32(true["theta"]), cfg)
    assert float(res.x) == pytest.approx(true["x"], abs=0.25)
    assert float(res.z) == pytest.approx(true["z"], abs=0.25)
    # theta restricted to {est, est+pi}
    assert min(abs(float(res.theta) - true["theta"]),
               abs(float(res.theta) - true["theta"] - np.pi)) < 1e-6


def test_fit_loc_only_picks_flipped_theta():
    """The pi-flip candidate wins when the scan is flipped relative to the
    estimate (the 2-value theta set of optimize_loc_only:127)."""
    rng = np.random.default_rng(1)
    bank = TemplateBank.default()
    template = jnp.asarray(bank.points[0])
    theta_scan = 0.7 + np.pi
    rot = np.asarray(rot_y(jnp.float32(theta_scan)))
    scan = (bank.points[0] @ rot.T
            + rng.normal(scale=0.02, size=bank.points[0].shape))
    mask = np.ones(len(scan), bool)
    cfg = FitConfig(n_dx=12, n_dz=12, exact_grid_chunk=12)
    res = fitting.fit_loc_only(jnp.asarray(scan, jnp.float32),
                               jnp.asarray(mask), template,
                               jnp.float32(0.7), cfg)
    assert float(res.theta) == pytest.approx(theta_scan)


def test_pipeline_robust_flag_recovers_car():
    """End-to-end label_frame with use_robust_optimization=True matches the
    standard gates (the estimator yaw feeds the loc-only grid)."""
    pts, masks, transforms = _make_scene()
    cfg = pipeline.PipelineConfig(
        nscans_before=3, nscans_after=3, max_cars=4, max_points=1024,
        min_standing_points=400, use_robust_optimization=True,
        fit=FitConfig(fine_chunk=12, n_dx=16, n_dz=16, exact_grid_chunk=16))
    labeler = pipeline.PseudoLabeler(cfg)
    window = list(range(-3, 4))
    cars = labeler.label_frame(
        window, 3,
        get_points=lambda k: pts[k],
        get_masks=lambda k: masks[k],
        transforms=transforms, p2=P2, img_hw=(H, W))
    assert len(cars) == 1
    car = cars[0]
    assert car["x"] == pytest.approx(TRUE_POSE["x"], abs=0.45)
    assert car["z"] == pytest.approx(TRUE_POSE["z"], abs=0.45)
    dtheta = (car["theta"] - TRUE_POSE["theta"] + np.pi) % (2 * np.pi) - np.pi
    assert min(abs(dtheta), abs(abs(dtheta) - np.pi)) < np.deg2rad(12)

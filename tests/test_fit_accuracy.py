"""Optimizer accuracy harness: planted cars -> fitted boxes -> 3D IoU.

Mirrors the reference's custom-dataset debug path (custom_dataset.py:144-149)
as an automated quality gate on template fitting.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.ops.geometry import rot_y
from monosowa_tpu.sowa import custom_dataset, fitting
from monosowa_tpu.sowa.templates import TEMPLATE_H, TEMPLATE_L, TEMPLATE_W, \
    TemplateBank


def test_fit_accuracy_mean_iou():
    bank = TemplateBank.default()
    tmpl = bank.points[0]
    cfg = fitting.FitConfig()
    spec, occ, memb = fitting.make_conv_kernels(tmpl, cfg)

    rng = np.random.default_rng(0)
    n_cars, S = 8, 1536
    pts = np.zeros((n_cars, S, 3), np.float32)
    mask = np.zeros((n_cars, S), bool)
    gt_boxes = []
    for b in range(n_cars):
        theta = rng.uniform(0, 2 * np.pi)
        t = np.array([rng.uniform(-8, 8), rng.uniform(0.8, 1.2),
                      rng.uniform(8, 35)])
        rot = np.asarray(rot_y(jnp.float32(theta)))
        scan = tmpl @ rot.T + t
        # partial visibility: drop a random half-space of points (simulates
        # self-occlusion) + noise
        normal = rng.normal(size=3)
        normal /= np.linalg.norm(normal)
        keep = (scan - t) @ normal > rng.uniform(-0.4, 0.0)
        scan = scan[keep]
        reps = int(np.ceil(S / max(len(scan), 1)))
        scan = np.tile(scan, (reps, 1))[:S]
        scan = scan + rng.normal(scale=0.03, size=scan.shape)
        pts[b] = scan
        mask[b] = True
        gt_boxes.append([t[0], t[1], t[2], TEMPLATE_L, TEMPLATE_W,
                         TEMPLATE_H, theta])

    batch = fitting.CarBatch(points=jnp.asarray(pts), mask=jnp.asarray(mask),
                             moving=jnp.zeros(n_cars, bool),
                             theta_est=jnp.zeros(n_cars, jnp.float32),
                             theta_valid=jnp.zeros(n_cars, bool),
                             car_valid=jnp.ones(n_cars, bool))
    res = fitting.fit_cars_conv(batch, jnp.asarray(tmpl), occ, memb, spec,
                                cfg)

    ious = []
    for b in range(n_cars):
        fitted = np.array([float(res.x[b]), float(res.y[b]), float(res.z[b]),
                           TEMPLATE_L, TEMPLATE_W, TEMPLATE_H,
                           float(res.theta[b])], np.float32)
        ious.append(custom_dataset.compute_pair_iou(fitted,
                                                    np.array(gt_boxes[b])))
    ious = np.asarray(ious)
    # the harness's quality gate: strong mean overlap, no catastrophic miss
    assert ious.mean() > 0.65, ious
    assert (ious > 0.4).mean() >= 7 / 8, ious


def _planted_batch(rng, n_cars, S, moving_flags, theta_valid_flags,
                   noise=0.03):
    bank = TemplateBank.default()
    tmpl = bank.points[0]
    pts = np.zeros((n_cars, S, 3), np.float32)
    mask = np.zeros((n_cars, S), bool)
    theta_est = np.zeros(n_cars, np.float32)
    gt = []
    for b in range(n_cars):
        theta = rng.uniform(0, 2 * np.pi)
        t = np.array([rng.uniform(-8, 8), rng.uniform(0.8, 1.2),
                      rng.uniform(8, 35)])
        rot = np.asarray(rot_y(jnp.float32(theta)))
        scan = tmpl @ rot.T + t
        # CAMERA-FACING self-occlusion: only the side toward the sensor is
        # observed — this is the bias the reference's +1 moving-car
        # z-range shift compensates (optimize_moving, optimizer.py:300)
        normal = -t / np.linalg.norm(t)
        keep = (scan - t) @ normal > rng.uniform(-0.4, 0.0)
        scan = scan[keep]
        reps = int(np.ceil(S / max(len(scan), 1)))
        scan = np.tile(scan, (reps, 1))[:S]
        scan = scan + rng.normal(scale=noise, size=scan.shape)
        pts[b] = scan
        mask[b] = True
        # a moving car's trajectory angle estimate carries ~3 deg jitter
        theta_est[b] = theta + rng.normal(scale=np.deg2rad(3))
        gt.append([t[0], t[1], t[2], TEMPLATE_L, TEMPLATE_W, TEMPLATE_H,
                   theta])
    batch = fitting.CarBatch(
        points=jnp.asarray(pts), mask=jnp.asarray(mask),
        moving=jnp.asarray(moving_flags),
        theta_est=jnp.asarray(theta_est),
        theta_valid=jnp.asarray(theta_valid_flags),
        car_valid=jnp.ones(n_cars, bool))
    return batch, np.asarray(gt), tmpl


@pytest.mark.slow
def test_fit_accuracy_production_scale():
    """Quality gate at PRODUCTION point counts: 10k-point cars (the
    reference's per-car cap, loader.py:188-192; the pipeline's default
    max_points=2048 is a deliberate subsample of the same clouds) plus
    MOVING cars with jittered trajectory angles.  Prints one tracked
    FIT_QUALITY line (mean 3D IoU + recall) so perf work cannot silently
    degrade accuracy round-over-round."""
    import json

    rng = np.random.default_rng(7)
    n_cars, S = 8, 10000
    moving = np.zeros(n_cars, bool)
    moving[4:] = True                   # 4 standing + 4 moving
    theta_valid = moving.copy()
    theta_valid[7] = False              # one moving car w/o trajectory angle

    batch, gt, tmpl = _planted_batch(rng, n_cars, S, moving, theta_valid)
    # reduced grid keeps the CPU test tractable at S=10k; geometry ranges
    # stay the shipped ones
    cfg = fitting.FitConfig(n_dx=24, n_dz=24, n_theta=24, n_theta_fine=120,
                            fine_chunk=12)
    spec, occ, memb = fitting.make_conv_kernels(tmpl, cfg)
    res = fitting.fit_cars_conv(batch, jnp.asarray(tmpl), occ, memb, spec,
                                cfg)

    ious = []
    for b in range(n_cars):
        fitted = np.array([float(res.x[b]), float(res.y[b]), float(res.z[b]),
                           TEMPLATE_L, TEMPLATE_W, TEMPLATE_H,
                           float(res.theta[b])], np.float32)
        ious.append(custom_dataset.compute_pair_iou(fitted, gt[b]))
    ious = np.asarray(ious)
    metrics = {"mean_iou": round(float(ious.mean()), 3),
               "recall@0.4": round(float((ious > 0.4).mean()), 3),
               "standing_mean": round(float(ious[:4].mean()), 3),
               "moving_mean": round(float(ious[4:].mean()), 3)}
    print("FIT_QUALITY " + json.dumps(metrics))
    assert metrics["mean_iou"] > 0.6, (metrics, ious)
    assert metrics["recall@0.4"] >= 7 / 8, (metrics, ious)

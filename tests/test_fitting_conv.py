"""Conv-path fitting: kernel mapping exactness + pose recovery parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.ops import tfl
from monosowa_tpu.ops.geometry import rot_y
from monosowa_tpu.sowa import fitting
from tests.test_tfl import _asymmetric_template

RADIUS = 0.2


def test_conv_counts_match_bruteforce_quantized():
    """The conv count_T/count_S must equal the brute-force counts computed
    on voxel-quantized points (identical quantization on both sides)."""
    rng = np.random.default_rng(0)
    tmpl = _asymmetric_template(n=200)
    cfg = fitting.FitConfig(n_dx=8, n_dz=8, n_theta=4,
                            dx_min=-0.5, dx_max=0.5, dz_min=-0.5, dz_max=0.5)
    spec, occ, memb = fitting.make_conv_kernels(tmpl, cfg)
    h = spec.h
    # aligned spec: endpoints divisible by the step
    assert abs(spec.dx_min / h - round(spec.dx_min / h)) < 1e-6

    scan = tmpl @ np.asarray(rot_y(jnp.float32(0.0))).T
    scan = scan[:150] + rng.normal(scale=0.02, size=(150, 3))
    scan = scan.astype(np.float32)
    mask = np.ones(150, bool)

    losses = np.asarray(tfl.grid_pose_losses_conv(
        jnp.asarray(scan), jnp.asarray(mask), occ, memb, spec,
        tmpl.shape[0]))
    assert losses.shape == (4, spec.n_dx * spec.n_dz)
    assert np.isfinite(losses).all()

    # brute-force on the same voxel-center quantization (shared lattice)
    def q(p):
        return np.floor(p / h + 0.5) * h

    kx, kz = spec.n_dx // 2, spec.n_dz // 2
    tx = spec.dx_min + kx * h
    tz = spec.dz_min + kz * h
    posed = q(tmpl) + np.array([tx, 0, tz])
    d2 = ((posed[:, None] - q(scan)[None]) ** 2).sum(-1)
    t_cnt = (d2.min(1) <= RADIUS ** 2).sum()
    s_cnt = (d2.min(0) <= RADIUS ** 2).sum()
    want = -(t_cnt / tmpl.shape[0] + s_cnt / 150)
    got = losses[0, kx * spec.n_dz + kz]
    assert got == pytest.approx(want, abs=0.08)


def test_conv_fit_recovers_pose():
    tmpl = _asymmetric_template()
    cfg = fitting.FitConfig()
    spec, occ, memb = fitting.make_conv_kernels(tmpl, cfg)
    rng = np.random.default_rng(7)
    true_theta, true_t = 0.9, np.array([0.7, 0.0, -0.4], np.float32)
    rot = np.asarray(rot_y(jnp.float32(true_theta)))
    scan = tmpl @ rot.T + true_t
    scan += rng.normal(scale=0.02, size=scan.shape).astype(np.float32)
    S = 512
    pts = np.zeros((S, 3), np.float32)
    pts[:len(scan)] = scan[:S]
    mask = np.zeros(S, bool)
    mask[:min(len(scan), S)] = True

    res = fitting.fit_standing_car_conv(jnp.asarray(pts), jnp.asarray(mask),
                                        jnp.asarray(tmpl), occ, memb, spec,
                                        cfg)
    assert float(res.x) == pytest.approx(true_t[0], abs=0.16)
    assert float(res.z) == pytest.approx(true_t[2], abs=0.16)
    dtheta = abs((float(res.theta) - true_theta + np.pi) % (2 * np.pi) - np.pi)
    assert dtheta < np.deg2rad(4.0)


def test_conv_batch_matches_gather_path():
    tmpl = _asymmetric_template()
    cfg = fitting.FitConfig()
    spec, occ, memb = fitting.make_conv_kernels(tmpl, cfg)
    tfield = tfl.build_template_field(tmpl, RADIUS)
    rng = np.random.default_rng(11)
    B, S = 2, 512
    pts = np.zeros((B, S, 3), np.float32)
    mask = np.zeros((B, S), bool)
    poses = [(0.3, 0.2, 0.5), (-0.5, 0.8, 2.0)]
    for b, (tx, tz, th) in enumerate(poses):
        rot = np.asarray(rot_y(jnp.float32(th)))
        scan = tmpl @ rot.T + np.array([tx + 5.0, 1.0, tz + 20.0])
        scan += rng.normal(scale=0.02, size=scan.shape).astype(np.float32)
        pts[b, :len(scan)] = scan
        mask[b, :len(scan)] = True
    batch = fitting.CarBatch(points=jnp.asarray(pts), mask=jnp.asarray(mask),
                             moving=jnp.asarray([False, True]),
                             theta_est=jnp.asarray([0.0, poses[1][2]],
                                                   jnp.float32),
                             theta_valid=jnp.asarray([False, True]),
                             car_valid=jnp.ones(B, bool))
    res_conv = fitting.fit_cars_conv(batch, jnp.asarray(tmpl), occ, memb,
                                     spec, cfg)
    res_gather = fitting.fit_cars(batch, jnp.asarray(tmpl), tfield, cfg)
    # both paths recover the planted poses within grid resolution
    for b, (tx, tz, th) in enumerate(poses):
        for res in (res_conv, res_gather):
            assert float(res.x[b]) == pytest.approx(tx + 5.0, abs=0.25)
            assert float(res.z[b]) == pytest.approx(tz + 20.0, abs=0.25)
    # moving car's theta is the exact trajectory estimate on both paths
    assert float(res_conv.theta[1]) == pytest.approx(poses[1][2], abs=1e-5)

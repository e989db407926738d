"""TFL kernels: exact losses vs numpy oracle, membership fields, grid fit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monosowa_tpu.ops import tfl
from monosowa_tpu.ops.geometry import masked_median, rot_y
from monosowa_tpu.sowa import fitting
from monosowa_tpu.sowa.templates import TemplateBank

RADIUS = 0.2


def naive_binary2way(scan, template, radius):
    d = np.sqrt(((template[:, None, :] - scan[None, :, :]) ** 2).sum(-1))
    t_frac = (d.min(1) < radius).mean()
    s_frac = (d.min(0) < radius).mean()
    return -(t_frac + s_frac)


def test_pairwise_sq_dists():
    rng = np.random.default_rng(0)
    a, b = rng.normal(size=(7, 3)), rng.normal(size=(11, 3))
    got = np.asarray(tfl.pairwise_sq_dists(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_binary_both_way_matches_naive():
    rng = np.random.default_rng(1)
    scan = rng.normal(size=(64, 3)).astype(np.float32)
    tmpl = (scan[:32] + rng.normal(scale=0.05, size=(32, 3))).astype(np.float32)
    mask = np.ones(64, bool)
    loss = tfl.binary_both_way_loss(jnp.asarray(scan), jnp.asarray(mask),
                                    jnp.asarray(tmpl)[None], RADIUS)
    want = naive_binary2way(scan, tmpl, RADIUS)
    assert float(loss[0]) == pytest.approx(want, abs=1e-6)


def test_binary_both_way_respects_mask():
    rng = np.random.default_rng(2)
    scan = rng.normal(size=(50, 3)).astype(np.float32)
    tmpl = rng.normal(size=(20, 3)).astype(np.float32)
    mask = np.zeros(50, bool)
    mask[:30] = True
    # padded garbage that would match everything if unmasked
    scan[30:] = tmpl[:20]
    loss = tfl.binary_both_way_loss(jnp.asarray(scan), jnp.asarray(mask),
                                    jnp.asarray(tmpl)[None], RADIUS)
    want = naive_binary2way(scan[:30], tmpl, RADIUS)
    assert float(loss[0]) == pytest.approx(want, abs=1e-6)


def test_membership_field_vs_exact():
    rng = np.random.default_rng(3)
    # stay inside the CAR_FIELD domain (x,z ~ +-4.5, y ~ +-1.3)
    pts = rng.uniform([-2.0, -0.9, -2.0], [2.0, 0.9, 2.0],
                      size=(200, 3)).astype(np.float32)
    mask = np.ones(200, bool)
    field = tfl.build_membership_field(jnp.asarray(pts), jnp.asarray(mask),
                                       tfl.CAR_FIELD, RADIUS)
    queries = rng.uniform([-3.0, -1.1, -3.0], [3.0, 1.1, 3.0],
                          size=(500, 3)).astype(np.float32)
    got = np.asarray(tfl.sample_membership(field, tfl.CAR_FIELD,
                                           jnp.asarray(queries)))
    exact = np.sqrt(((queries[:, None] - pts[None]) ** 2).sum(-1)).min(1)
    # both the stored points and the queries quantize to voxel centers, so
    # the field is exact outside a one-voxel-diagonal band
    band = tfl.CAR_FIELD.voxel * np.sqrt(3)
    sure_in = exact < RADIUS - band
    sure_out = exact > RADIUS + band
    assert np.all(got[sure_in] == 1)
    assert np.all(got[sure_out] == 0)
    # and boundary disagreements are rare
    agree = (got == (exact < RADIUS)).mean()
    assert agree > 0.9


def _asymmetric_template(n=400, seed=5):
    """L-shaped cloud — unambiguous yaw for recovery tests."""
    rng = np.random.default_rng(seed)
    a = np.stack([rng.uniform(-0.8, 0.8, n // 2),
                  rng.uniform(-0.7, 0.7, n // 2),
                  rng.uniform(-1.9, -1.0, n // 2)], 1)
    b = np.stack([rng.uniform(-0.3, 0.8, n - n // 2),
                  rng.uniform(-0.7, 0.7, n - n // 2),
                  rng.uniform(-1.0, 1.9, n - n // 2)], 1)
    return np.concatenate([a, b]).astype(np.float32)


def test_grid_fit_recovers_known_pose():
    tmpl = _asymmetric_template()
    true_theta = 0.9
    true_t = np.array([0.7, 0.0, -0.4], np.float32)
    rot = np.asarray(rot_y(jnp.float32(true_theta)))
    rng = np.random.default_rng(7)
    scan = tmpl @ rot.T + true_t
    scan += rng.normal(scale=0.02, size=scan.shape).astype(np.float32)
    keep = rng.permutation(len(scan))[:300]
    scan = scan[keep]

    S = 512
    pts = np.zeros((S, 3), np.float32)
    pts[:len(scan)] = scan
    mask = np.zeros(S, bool)
    mask[:len(scan)] = True

    tfield = tfl.build_template_field(tmpl, RADIUS)
    cfg = fitting.FitConfig()
    center = np.asarray(masked_median(jnp.asarray(pts), jnp.asarray(mask)))
    res = fitting.fit_standing_car(jnp.asarray(pts - center),
                                   jnp.asarray(mask),
                                   jnp.asarray(tmpl), tfield, cfg)
    got_x = float(res.x) + center[0]
    got_z = float(res.z) + center[2]
    # translation grid step is ~0.1 m; theta fine step 1 degree
    assert got_x == pytest.approx(true_t[0], abs=0.15)
    assert got_z == pytest.approx(true_t[2], abs=0.15)
    dtheta = abs((float(res.theta) - true_theta + np.pi) % (2 * np.pi) - np.pi)
    assert dtheta < np.deg2rad(4.0)
    assert float(res.loss) < -1.5  # both coverage fractions high


def test_fit_cars_batch_consistency():
    tmpl = _asymmetric_template()
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

    batch = fitting.CarBatch(
        points=jnp.asarray(pts), mask=jnp.asarray(mask),
        moving=jnp.zeros(B, bool),
        theta_est=jnp.zeros(B, jnp.float32),
        theta_valid=jnp.zeros(B, bool),
        car_valid=jnp.ones(B, bool))
    res = fitting.fit_cars(batch, jnp.asarray(tmpl), tfield)
    for b, (tx, tz, th) in enumerate(poses):
        assert float(res.x[b]) == pytest.approx(tx + 5.0, abs=0.2)
        assert float(res.z[b]) == pytest.approx(tz + 20.0, abs=0.2)
        dtheta = abs((float(res.theta[b]) - th + np.pi) % (2 * np.pi) - np.pi)
        assert dtheta < np.deg2rad(4.0)


def test_moving_fit_uses_fixed_theta():
    tmpl = _asymmetric_template()
    tfield = tfl.build_template_field(tmpl, RADIUS)
    th = 1.1
    rot = np.asarray(rot_y(jnp.float32(th)))
    rng = np.random.default_rng(13)
    scan = (tmpl @ rot.T + np.array([0.2, 0.0, 1.4])).astype(np.float32)
    scan += rng.normal(scale=0.02, size=scan.shape).astype(np.float32)
    S = 512
    pts = np.zeros((S, 3), np.float32)
    pts[:len(scan)] = scan
    mask = np.zeros(S, bool)
    mask[:len(scan)] = True
    res = fitting.fit_moving_car(jnp.asarray(pts), jnp.asarray(mask),
                                 jnp.asarray(tmpl), tfield,
                                 jnp.float32(th), jnp.asarray(True))
    assert float(res.theta) == pytest.approx(th)
    assert float(res.x) == pytest.approx(0.2, abs=0.2)
    assert float(res.z) == pytest.approx(1.4, abs=0.2)


def test_estimate_angle_from_track():
    # car driving along +z at 1 m/frame, ref in the middle
    F = 15
    locs = np.zeros((F, 3))
    locs[:, 2] = np.arange(F) * 1.0
    valid = np.ones(F, bool)
    ang = fitting.estimate_angle_from_track(locs, valid, ref_idx=7)
    # arctan2(dz, dx) = pi/2 -> kitti convention: -pi/2 + pi/2 = 0
    assert ang == pytest.approx(0.0, abs=1e-6)
    # too-short track
    assert fitting.estimate_angle_from_track(locs[:2], valid[:2], 0) is None


def test_templates_have_exact_extents():
    bank = TemplateBank.default()
    assert bank.points.shape == (4, 1000, 3)
    for i in range(4):
        p = bank.points[i]
        assert p[:, 0].max() - p[:, 0].min() == pytest.approx(1.63, abs=1e-4)
        assert p[:, 1].max() - p[:, 1].min() == pytest.approx(1.526, abs=1e-4)
        assert p[:, 2].max() - p[:, 2].min() == pytest.approx(3.88, abs=1e-4)
        np.testing.assert_allclose((p.max(0) + p.min(0)) / 2, 0, atol=1e-4)

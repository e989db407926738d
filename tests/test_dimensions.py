"""Dimension estimator: rectangle recovery on synthetic box clouds."""

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.sowa import dimensions


def _box_cloud(l=4.2, w=1.7, h=1.5, theta=0.0, n=1500, seed=0):
    """Surface points of a box footprint rotated by theta about y."""
    rng = np.random.default_rng(seed)
    # sample the 4 side walls in the XZ plane (long axis along z at theta=0)
    t = rng.uniform(-0.5, 0.5, n)
    side = rng.integers(0, 4, n)
    x = np.where(side == 0, -w / 2, np.where(side == 1, w / 2, t * w))
    z = np.where(side >= 2, np.where(side == 2, -l / 2, l / 2), t * l)
    y = rng.uniform(-h / 2, h / 2, n)
    pts = np.stack([x, y, z], 1)
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return (pts @ rot.T).astype(np.float32)


def test_rectangle_recovery_axis_aligned():
    pts = _box_cloud(theta=0.0)
    mask = np.ones(len(pts), bool)
    theta, ext, _ = dimensions.estimate_rectangle(jnp.asarray(pts),
                                                  jnp.asarray(mask))
    # theta=0 projects onto x (width) and z (length)
    got = sorted([float(ext[0]), float(ext[1])])
    assert got[0] == pytest.approx(1.7, abs=0.15)
    assert got[1] == pytest.approx(4.2, abs=0.2)


def test_rectangle_recovery_rotated():
    true_theta = np.deg2rad(35)
    pts = _box_cloud(theta=true_theta, seed=3)
    mask = np.ones(len(pts), bool)
    theta, ext, _ = dimensions.estimate_rectangle(jnp.asarray(pts),
                                                  jnp.asarray(mask))
    got = sorted([float(ext[0]), float(ext[1])])
    assert got[0] == pytest.approx(1.7, abs=0.2)
    assert got[1] == pytest.approx(4.2, abs=0.25)
    # projection-angle convention: rot_y(+t) rotates the BEV frame by -t,
    # so accept theta == +-true mod 90 deg
    cands = []
    for signed in (float(theta) - true_theta, float(theta) + true_theta):
        d = abs(signed) % (np.pi / 2)
        cands.append(min(d, np.pi / 2 - d))
    assert min(cands) < np.deg2rad(4)


def test_estimate_dimensions_one_side_view():
    # car viewed broadside (not degenerate): full dims recovered
    pts = _box_cloud(theta=np.deg2rad(80), h=1.5, seed=4)
    mask = np.ones(len(pts), bool)
    center = np.array([8.0, 1.0, 15.0], np.float32)  # off to the side
    dims, _ = dimensions.estimate_dimensions_one(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(center))
    dims = np.asarray(dims)
    assert dims[1] == pytest.approx(1.5, abs=0.1)      # height
    # normal or degenerate: length slot either measured (~4.2) or template
    assert 3.5 < dims[0] < 4.5


def test_force_template_dims_default():
    pts = [_box_cloud(seed=i) for i in range(3)]
    masks = [np.ones(len(p), bool) for p in pts]
    dims, _ = dimensions.estimate_car_dimensions(
        np.stack(pts), np.stack(masks), np.array([0.0, 1.0, 15.0]))
    np.testing.assert_allclose(dims, [3.88, 1.63, 1.526], atol=1e-5)


def test_measured_dims_when_not_forced():
    cfg = dimensions.DimConfig(force_template_dims=False)
    pts = [_box_cloud(theta=np.deg2rad(70), seed=i) for i in range(3)]
    masks = [np.ones(len(p), bool) for p in pts]
    dims, _ = dimensions.estimate_car_dimensions(
        np.stack(pts), np.stack(masks), np.array([10.0, 1.0, 12.0]), cfg)
    assert dims[2] == pytest.approx(1.5, abs=0.15)     # height measured

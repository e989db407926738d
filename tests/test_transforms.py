"""Transformation stage tests: window packing, pose sources, ICP chain."""

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.ops.geometry import rot_y
from monosowa_tpu.sowa import transforms as T


def test_window_pack_and_slice():
    rel = np.tile(np.eye(4), (10, 1, 1))
    for i in range(10):
        rel[i, 0, 3] = float(i)
    out = T._window_pack(rel, ref=5, rng=3)
    assert out.shape == (7, 4, 4)
    assert out[3, 0, 3] == 5.0      # center = ref
    assert out[0, 0, 3] == 2.0
    sliced = T.slice_window(out, full_rng=3, before=1, after=1)
    assert sliced.shape == (3, 4, 4)
    assert sliced[1, 0, 3] == 5.0


def test_pose_window_transforms_invalid_zeroed():
    poses = np.tile(np.eye(4), (6, 1, 1))
    poses[:, 2, 3] = np.arange(6) * 2.0
    valid = np.array([True, True, False, True, True, True])
    out = T.pose_window_transforms(poses, valid, ref=3, rng=2)
    # invalid frame 2 -> zero matrix (loader.py:956-961 semantics)
    assert np.all(out[1] == 0)
    np.testing.assert_allclose(out[2], np.eye(4), atol=1e-12)
    # frame 4 maps +2 in z relative to ref
    assert out[3][2, 3] == pytest.approx(2.0)


def test_kitti_window_transforms_shapes():
    pkts = np.array([[49.0 + i * 1e-5, 8.43, 110.0, 0.0, 0.0, 0.5]
                     for i in range(9)])
    out = T.kitti_window_transforms(pkts, np.eye(4), ref=4, rng=3)
    assert out.shape == (7, 4, 4)
    np.testing.assert_allclose(out[3], np.eye(4), atol=1e-9)


def test_icp_window_transforms_recovers_motion():
    # scene points observed from a camera moving +0.4 z per frame
    rng = np.random.default_rng(0)
    plane = np.stack([rng.uniform(-5, 5, 400), np.full(400, 1.6),
                      rng.uniform(2, 20, 400)], 1)
    wall = np.stack([rng.uniform(-5, 5, 200), rng.uniform(0, 1.5, 200),
                     np.full(200, 20.0)], 1)
    wall2 = np.stack([np.full(200, 5.0), rng.uniform(0, 1.5, 200),
                      rng.uniform(2, 20, 200)], 1)
    world = np.concatenate([plane, wall, wall2]).astype(np.float32)

    def get_scan(f):
        cam_z = 0.4 * f
        return world - np.array([0.0, 0.0, cam_z], np.float32)

    out = T.icp_window_transforms(get_scan, ref=4, rng=4, n_frames=9,
                                  jump=2)
    assert out.shape == (9, 4, 4)
    np.testing.assert_allclose(out[4], np.eye(4), atol=1e-9)
    # frame 6 (camera +0.8 ahead): a world point w reads p_6 = w - 2.4z in
    # frame 6 and p_ref = w - 1.6z in the ref frame, so T_cur_to_ref
    # translates by +0.8 in z (and -0.8 for frame 2)
    assert out[6][2, 3] == pytest.approx(0.8, abs=0.1)
    assert out[2][2, 3] == pytest.approx(-0.8, abs=0.1)
    # interpolated odd frame
    assert out[5][2, 3] == pytest.approx(0.4, abs=0.1)


def test_icp_v2_recovers_motion_per_frame():
    """calculate_transformationsV2: every non-anchor frame gets its OWN
    prior+ICP against the nearest anchor (loader.py:1234-1301), no
    interpolation."""
    rng = np.random.default_rng(1)
    plane = np.stack([rng.uniform(-5, 5, 400), np.full(400, 1.6),
                      rng.uniform(2, 20, 400)], 1)
    wall = np.stack([rng.uniform(-5, 5, 200), rng.uniform(0, 1.5, 200),
                     np.full(200, 20.0)], 1)
    wall2 = np.stack([np.full(200, 5.0), rng.uniform(0, 1.5, 200),
                      rng.uniform(2, 20, 200)], 1)
    world = np.concatenate([plane, wall, wall2]).astype(np.float32)

    def get_scan(f):
        return world - np.array([0.0, 0.0, 0.4 * f], np.float32)

    out = T.icp_window_transforms_v2(get_scan, ref=5, rng=4, n_frames=11,
                                     jump=2)
    assert out.shape == (9, 4, 4)
    np.testing.assert_allclose(out[4], np.eye(4), atol=1e-9)
    # out index k holds frame k+1 (window 1..9 around ref=5)
    for k, exp in [(5, 0.4), (6, 0.8), (7, 1.2), (2, -0.8), (1, -1.2)]:
        assert out[k][2, 3] == pytest.approx(exp, abs=0.1), k


def test_icp_v2_escalates_over_missing_anchor():
    """A missing anchor partner escalates the pairwise chain to x2..x5
    jumps (loader.py:1054-1135) instead of breaking the chain."""
    rng = np.random.default_rng(2)
    plane = np.stack([rng.uniform(-5, 5, 400), np.full(400, 1.6),
                      rng.uniform(2, 20, 400)], 1)
    wall = np.stack([rng.uniform(-5, 5, 200), rng.uniform(0, 1.5, 200),
                     np.full(200, 20.0)], 1)
    wall2 = np.stack([np.full(200, 5.0), rng.uniform(0, 1.5, 200),
                      rng.uniform(2, 20, 200)], 1)
    world = np.concatenate([plane, wall, wall2]).astype(np.float32)

    missing = {3}     # the -2 anchor's x1 partner (ref - jump)

    def get_scan(f):
        if f in missing:
            return None
        return world - np.array([0.0, 0.0, 0.4 * f], np.float32)

    out = T.icp_window_transforms_v2(get_scan, ref=5, rng=4, n_frames=11,
                                     jump=2)
    # frame 1 = out[0] (offset -4): its x1 partner (offset -2 = frame 3)
    # is missing, so the pair escalates to the x2 partner (offset 0) and
    # the motion is still recovered
    assert out[0][2, 3] == pytest.approx(-1.6, abs=0.15)
    # the missing frame itself keeps identity (reference init, :1027-1031)
    np.testing.assert_allclose(out[2], np.eye(4), atol=1e-12)


def test_icp_v2_rng_not_multiple_of_jump():
    """rng % jump != 0: all three phases agree on the multiples-of-jump
    anchor set, so positive-side frames still recover their motion (a
    -rng-anchored sweep would leave the positive chain composing
    never-written identity entries)."""
    rng_np = np.random.default_rng(3)
    plane = np.stack([rng_np.uniform(-5, 5, 400), np.full(400, 1.6),
                      rng_np.uniform(2, 20, 400)], 1)
    wall = np.stack([rng_np.uniform(-5, 5, 200), rng_np.uniform(0, 1.5, 200),
                     np.full(200, 20.0)], 1)
    wall2 = np.stack([np.full(200, 5.0), rng_np.uniform(0, 1.5, 200),
                      rng_np.uniform(2, 20, 200)], 1)
    world = np.concatenate([plane, wall, wall2]).astype(np.float32)

    def get_scan(f):
        return world - np.array([0.0, 0.0, 0.4 * f], np.float32)

    out = T.icp_window_transforms_v2(get_scan, ref=5, rng=5, n_frames=11,
                                     jump=2)
    assert out.shape == (11, 4, 4)
    np.testing.assert_allclose(out[5], np.eye(4), atol=1e-9)
    # every offset in the window, including the off-lattice extremes +-5
    for k in range(11):
        off = k - 5
        assert out[k][2, 3] == pytest.approx(0.4 * off, abs=0.15), off

"""Differential parity for the bbox reducer against the REFERENCE'S OWN
code (pseudo_label_generator/3d/scripts/scale_detector.py:106-259).

``bbox_reducer_tracked`` + ``create_bboxes_from_opt_values_tracker`` are
pure numpy/scipy except open3d geometry, replaced by contract-exact stubs:

* ``OrientedBoundingBox(center, R, extent)`` with
  ``get_point_indices_within_bounding_box`` = |R^T (p - center)| <= extent/2
  per axis (open3d's definition);
* ``PointCloud.get_axis_aligned_bounding_box`` = min/max AABB with
  ``get_center``/``get_extent``.

The rebuild's jitted ``scale.bbox_reduce`` must produce the same center,
dims, and fallback decision on randomized scenes (both branches).

This test originally CAUGHT a real axis-convention bug: the fitter poses
templates with length on local z, but the old ``points_in_obb``/
``bbox_reduce`` treated local x as the length axis (hidden by a
self-consistent synthetic test).
"""

from __future__ import annotations

import importlib
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp  # noqa: E402

from monosowa_tpu.ops.geometry import rot_y  # noqa: E402
from monosowa_tpu.sowa import scale as scale_mod  # noqa: E402

REF_SCRIPTS = "/root/reference/pseudo_label_generator/3d/scripts"

TEMPLATE_LWH = (3.88, 1.63, 1.526)
WIDTH_BLOAT = 0.5
MAX_LDIFF = 0.75
LEN_OFFSET = 0.1


# --------------------------------------------------------------------------
# open3d contract stubs
# --------------------------------------------------------------------------

class _V3d:
    def __init__(self, arr):
        self.arr = np.asarray(arr, np.float64)


class _OBB:
    def __init__(self, center, R, extent):
        self.center = np.asarray(center, np.float64).reshape(3)
        self.R = np.asarray(R, np.float64)
        self.extent = np.asarray(extent, np.float64).reshape(3)
        self.color = None

    def get_center(self):
        return self.center

    def get_point_indices_within_bounding_box(self, v3d):
        local = (v3d.arr - self.center) @ self.R   # R^T p as rows
        ok = np.all(np.abs(local) <= self.extent / 2.0 + 1e-12, axis=1)
        return list(np.nonzero(ok)[0])


class _AABB:
    def __init__(self, pts):
        pts = np.asarray(pts, np.float64)
        if len(pts) == 0:
            self.lo = np.zeros(3)
            self.hi = np.zeros(3)
        else:
            self.lo = pts.min(0)
            self.hi = pts.max(0)

    def get_center(self):
        return (self.lo + self.hi) / 2.0

    def get_extent(self):
        return self.hi - self.lo


class _PointCloud:
    def __init__(self):
        self.points = None

    def get_axis_aligned_bounding_box(self):
        return _AABB(self.points.arr if isinstance(self.points, _V3d)
                     else self.points)


class _Cfg:
    """Attribute tree mirroring the reference config keys the code reads."""

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


class _Car:
    pass


@pytest.fixture(scope="module")
def ref_reducer():
    from ref_pipeline_harness import install_stubs, reference_available

    if not reference_available():
        pytest.skip("reference checkout not present")
    install_stubs()
    if REF_SCRIPTS not in sys.path:
        sys.path.insert(0, REF_SCRIPTS)
    o3d = sys.modules["open3d"]
    geom = getattr(o3d, "geometry", None) or types.ModuleType(
        "open3d.geometry")
    geom.OrientedBoundingBox = _OBB
    geom.PointCloud = _PointCloud
    util = getattr(o3d, "utility", None) or types.ModuleType("open3d.utility")
    util.Vector3dVector = _V3d
    o3d.geometry, o3d.utility = geom, util

    mod = importlib.import_module("scale_detector")
    importlib.reload(mod)

    cls = mod.ScaleDetector

    def run(center, lwh, theta, scan):
        """Drive the reference reducer on one car; returns
        (center, lwh, fell_back)."""
        self = types.SimpleNamespace(
            create_bboxes_from_opt_values_tracker=lambda cars, **kw:
                cls.create_bboxes_from_opt_values_tracker(self, cars, **kw),
            args=types.SimpleNamespace(dataset="kitti"),
            cfg=_Cfg(
                scale_detector=_Cfg(width_bloat=WIDTH_BLOAT,
                                    max_length_diff_scale=MAX_LDIFF,
                                    scale_offset_length=LEN_OFFSET,
                                    bbox_scale=1.2),
                templates=_Cfg(template_length=TEMPLATE_LWH[0],
                               template_width=TEMPLATE_LWH[1],
                               template_height=TEMPLATE_LWH[2]),
            ))
        car = _Car()
        car.optimized = True
        car.moving = False
        car.x, car.y, car.z = (float(center[0]), float(center[1]),
                               float(center[2]))
        car.theta = float(theta)
        car.x_scale, car.y_scale, car.z_scale = car.x, car.y, car.z
        car.theta_scale = float(theta)
        car.length, car.width, car.height = (float(lwh[0]), float(lwh[1]),
                                             float(lwh[2]))
        car.lidar = np.concatenate(
            [scan.T, np.ones((1, len(scan)))], 0)       # (4, N)
        car.scale_lidar = car.lidar
        car.bbox = None
        out = cls.bbox_reducer_tracked(self, [car])[0]
        fell_back = bool(np.allclose(
            [out.length, out.width, out.height],
            [TEMPLATE_LWH[0], TEMPLATE_LWH[1], TEMPLATE_LWH[2]])
            and np.allclose([out.x, out.y, out.z], center, atol=1e-9))
        return (np.array([out.x, out.y, out.z]),
                np.array([out.length, out.width, out.height]), out)

    return run


def _scene(seed, true_len=3.5, offset=(0.0, 0.0, 0.0)):
    r = np.random.default_rng(seed)
    theta = float(r.uniform(-np.pi, np.pi))
    center = np.array([r.uniform(-3, 3), r.uniform(0.5, 1.3),
                       r.uniform(8, 25)])
    rot = np.asarray(rot_y(jnp.float32(theta)))
    local = np.stack([r.uniform(-0.78, 0.78, 900),
                      r.uniform(-0.72, 0.72, 900),
                      r.uniform(-true_len / 2, true_len / 2, 900)], 1)
    scan = (local @ rot.T + center + np.asarray(offset)).astype(np.float32)
    # clutter outside the box
    clutter = (center + r.uniform(-6, 6, (200, 3))).astype(np.float32)
    return theta, center, np.concatenate([scan, clutter])


def _ours(center, lwh, theta, scan):
    c, d, ok = scale_mod.bbox_reduce(
        jnp.asarray(scan), jnp.ones(len(scan), bool),
        jnp.asarray(center, jnp.float32), jnp.asarray(lwh, jnp.float32),
        jnp.float32(theta), width_bloat=WIDTH_BLOAT,
        length_offset=LEN_OFFSET, max_length_diff=MAX_LDIFF,
        template_dims=TEMPLATE_LWH)
    return np.asarray(c), np.asarray(d), bool(ok)


def test_reduction_branch_parity(ref_reducer):
    for seed in range(6):
        theta, center, scan = _scene(seed)
        lwh = np.array(TEMPLATE_LWH)
        ref_c, ref_d, _ = ref_reducer(center, lwh, theta, scan)
        our_c, our_d, ok = _ours(center, lwh, theta, scan)
        assert ok, seed
        np.testing.assert_allclose(our_c, ref_c, atol=2e-5)
        np.testing.assert_allclose(our_d, ref_d, atol=2e-5)


def test_fallback_branch_parity(ref_reducer):
    """A cloud much shorter than the fitted length trips the template
    fallback in both implementations."""
    for seed in range(3):
        theta, center, scan = _scene(seed + 50, true_len=1.2)
        lwh = np.array(TEMPLATE_LWH)
        ref_c, ref_d, _ = ref_reducer(center, lwh, theta, scan)
        our_c, our_d, ok = _ours(center, lwh, theta, scan)
        assert not ok, seed
        np.testing.assert_allclose(our_c, ref_c, atol=2e-5)
        np.testing.assert_allclose(our_d, ref_d, atol=2e-5)


def test_scale_lidar_gather_matches_reference_sequence():
    """The real-LiDAR scale re-aggregation (extract_lidar_data_from_
    bbox_tracker, scale_detector.py:62-91) carries the bloated yaw box into
    each frame with T_inv (center moved, R_cur = T_inv[:3,:3] @ R_y(theta)),
    gathers live-scan points inside, and returns them with T.  Reproduce
    that exact sequence with the open3d OBB stub and compare."""
    r = np.random.default_rng(0)
    theta = 0.6
    center = np.array([1.0, 0.9, 14.0])
    lwh = np.array([3.88, 1.63, 1.526])
    bscale = 1.5
    ry = np.asarray(rot_y(jnp.float32(theta)))

    scans, tmats = [], []
    for k in range(3):
        t = np.eye(4)
        ang = 0.05 * (k - 1)
        t[:3, :3] = np.asarray(rot_y(jnp.float32(ang)))
        t[2, 3] = -0.8 * (k - 1)
        tmats.append(t)
        t_inv = np.linalg.inv(t)
        # car points planted in the ref frame, moved into frame k
        local = np.stack([r.uniform(-0.8, 0.8, 300),
                          r.uniform(-0.75, 0.75, 300),
                          r.uniform(-1.9, 1.9, 300)], 1)
        car_ref = local @ ry.T + center
        clutter = center + r.uniform(-7, 7, (150, 3))
        pts_ref = np.concatenate([car_ref, clutter])
        scans.append((pts_ref @ t_inv[:3, :3].T + t_inv[:3, 3]
                      ).astype(np.float32))

    ours = scale_mod.extract_scale_lidar_scans(
        center, lwh, theta, scans, np.stack(tmats), bbox_scale=bscale)

    # reference-style computation with the stub OBB
    expect = []
    for scan, t in zip(scans, tmats):
        t_inv = np.linalg.inv(t)
        c4 = np.pad(center.reshape(3, 1), ((0, 1), (0, 0)))
        c4[3] = 1.0
        c_cur = (t_inv @ c4)[:3, 0]
        # open3d extent order [w, h, l] on local (x, y, z)
        obb = _OBB(c_cur, t_inv[:3, :3] @ ry,
                   np.array([lwh[1], lwh[2], lwh[0]]) * bscale)
        idx = obb.get_point_indices_within_bounding_box(
            _V3d(np.asarray(scan, np.float64)))
        if not idx:
            continue
        sel = np.asarray(scan, np.float64)[idx]
        expect.append(sel @ t[:3, :3].T + t[:3, 3])
    expect = np.concatenate(expect, 0)

    assert len(ours) == len(expect)
    assert len(ours) > 600          # the planted car is captured each frame
    np.testing.assert_allclose(ours, expect, atol=1e-5)


def test_off_center_cloud_recenters_like_reference(ref_reducer):
    """Shifted clouds exercise the y/length recentering (width shift must
    stay zeroed)."""
    for seed in range(3):
        theta, center, scan = _scene(seed + 100,
                                     offset=(0.15, -0.12, 0.10))
        lwh = np.array(TEMPLATE_LWH)
        ref_c, ref_d, _ = ref_reducer(center, lwh, theta, scan)
        our_c, our_d, _ok = _ours(center, lwh, theta, scan)
        np.testing.assert_allclose(our_c, ref_c, atol=2e-5)
        np.testing.assert_allclose(our_d, ref_d, atol=2e-5)

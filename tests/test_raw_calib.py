"""KITTI raw calib parsing + raw transform tool on synthetic files."""

import os
import subprocess
import sys

import numpy as np
import pytest

from monosowa_tpu.kittiio.raw_calib import load_raw_calib


def _write_calibs(d):
    (d / "calib_imu_to_velo.txt").write_text(
        "R: 1 0 0 0 1 0 0 0 1\nT: -0.8 0.3 -0.7\n")
    (d / "calib_velo_to_cam.txt").write_text(
        "R: 0 -1 0 0 0 -1 1 0 0\nT: -0.01 -0.07 -0.27\n")
    (d / "calib_cam_to_cam.txt").write_text(
        "R_rect_00: 1 0 0 0 1 0 0 0 1\n"
        "P_rect_02: 720 0 600 45.0 0 720 180 0 0 0 1 0\n")


def test_load_raw_calib_chain(tmp_path):
    _write_calibs(tmp_path)
    c = load_raw_calib(str(tmp_path))
    t = c["T_cam2rect_imu"]
    assert t.shape == (4, 4)
    # IMU forward (x) maps to camera z (axis permutation of velo->cam)
    fwd = t[:3, :3] @ np.array([1.0, 0, 0])
    np.testing.assert_allclose(fwd, [0, 0, 1], atol=1e-9)
    # cam2 x-baseline = P[0,3]/fx applied
    assert t[0, 3] == pytest.approx(
        (np.array([0, -1, 0]) @ np.array([-0.8, 0.3, -0.7])
         + -0.01 + 45.0 / 720), abs=1e-9)


def test_raw_transforms_tool(tmp_path):
    _write_calibs(tmp_path)
    oxts = tmp_path / "drive0" / "oxts" / "data"
    oxts.mkdir(parents=True)
    for i in range(6):
        # drive north-ish; heading yaw=pi/2 so IMU x == north
        vals = [49.0 + i * 1e-5, 8.43, 110.0, 0.0, 0.0, np.pi / 2] + [0.0] * 24
        (oxts / f"{i:010d}.txt").write_text(" ".join(str(v) for v in vals))

    out_dir = tmp_path / "transforms"
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "kitti_raw_transforms.py")
    subprocess.run([sys.executable, tool, str(tmp_path), "drive0",
                    str(out_dir), "--range", "3"], check=True,
                   env={**os.environ, "JAX_PLATFORMS": "cpu"})
    files = sorted(os.listdir(out_dir))
    assert len(files) == 6
    w = np.load(out_dir / "0000000002.npy")
    assert w.shape == (7, 4, 4)
    np.testing.assert_allclose(w[3], np.eye(4), atol=1e-9)
    # forward IMU motion appears along camera z
    assert abs(w[4][2, 3]) > abs(w[4][0, 3]) * 0.5
    assert abs(w[4][2, 3]) == pytest.approx(1.11, abs=0.1)

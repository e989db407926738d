"""Converter CLIs: byte-format and coordinate-math tests (no TF needed)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import label_preparation
import label_sorter
import waymo_to_kitti_projected as w2k


def test_label_preparation_truncates_and_stubs(tmp_path):
    d = tmp_path / "training" / "label_2"
    d.mkdir(parents=True)
    (d / "000000.txt").write_text(
        "Car 0 0 -10 1 2 3 4 1.5 1.6 3.9 0 1 10 0.5 0.99 extra\n")
    (d / "000001.txt").write_text("")
    label_preparation.process_txt_files(str(d))
    out0 = (d / "000000.txt").read_text()
    assert len(out0.split()) == 15
    out1 = (d / "000001.txt").read_text()
    assert out1.startswith("DontCare -1 -1 -10")


def test_label_sorter_orders_by_score(tmp_path):
    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    (src / "a.txt").write_text(
        "Car 0 0 -10 1 1 2 2 1 1 1 0 0 10 0 0.30\n"
        "DontCare -1 -1 -10 0 0 0 0 -1 -1 -1 -1000 -1000 -1000 -10 0.99\n"
        "Car 0 0 -10 1 1 2 2 1 1 1 0 0 10 0 0.90\n")
    label_sorter.main(str(src), str(dst))
    lines = (dst / "a.txt").read_text().splitlines()
    assert lines[0].endswith("0.90")
    assert lines[1].endswith("0.30")
    assert lines[2].startswith("DontCare")


def test_waymo_heading_conversion():
    assert w2k.waymo_heading_to_kitti(0.0) == pytest.approx(-np.pi / 2)
    assert w2k.waymo_heading_to_kitti(-np.pi / 2) == pytest.approx(0.0)


def test_waymo_axis_permutation():
    # vehicle frame: x forward, y left, z up -> camera: x right, y down,
    # z forward (identity extrinsic)
    c = w2k.vehicle_center_to_kitti_cam([10.0, 2.0, 1.0], np.eye(4))
    np.testing.assert_allclose(c, [-2.0, -1.0, 10.0])


def test_waymo_calib_text_roundtrip():
    intr = [1000.0, 1001.0, 960.0, 640.0]
    pose = np.arange(16, dtype=float).reshape(4, 4)
    txt = w2k.waymo_calib_text(intr, np.eye(4), pose)
    lines = dict(ln.split(": ", 1) for ln in txt.strip().split("\n"))
    p2 = np.array([float(v) for v in lines["P2"].split()]).reshape(3, 4)
    assert p2[0, 0] == 1000.0 and p2[1, 2] == 640.0
    cur = np.array([float(v) for v in lines["Cur_pose"].split()]).reshape(4, 4)
    np.testing.assert_allclose(cur, pose)
    # parser side must pick up the pose
    from monosowa_tpu.kittiio.calib import Calibration, read_calib_file
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(txt)
        path = f.name
    calib = Calibration(path)
    np.testing.assert_allclose(calib.pose, pose)
    assert calib.fu == 1000.0
    os.unlink(path)


def test_waymo_label_line_format():
    line = w2k.label_line(10.0, 20.0, 110.0, 90.0, 2.0, 1.6, 4.5,
                          1.0, 0.7, 15.0, -1.2)
    # y written as bottom (y + h/2)
    assert line == ("Car -1 -1 -10 10.00 20.00 110.00 90.00 "
                    "2.00 1.60 4.50 1.00 1.50 15.00 -1.20\n")


def test_waymo_level_and_bands():
    assert w2k.level_of(4) == 2 and w2k.level_of(5) == 1
    assert w2k.distance_bands(10) == "030"
    assert w2k.distance_bands(30) == "3050"
    assert w2k.distance_bands(49.9) == "3050"
    assert w2k.distance_bands(50) == "50xx"

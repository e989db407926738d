"""kittiio tests: label byte-format round trips, calib math, oxts poses."""

import numpy as np
import pytest

from monosowa_tpu.kittiio import (
    Calibration, KittiObject, LabelSet, obj_level, oxts_to_poses,
    read_label_file, write_detection_file, write_pseudo_label_file,
)
from monosowa_tpu.kittiio.oxts import relative_cam_transforms

SAMPLE_LABEL = (
    "Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 "
    "-0.65 1.71 46.70 -1.59\n"
    "Cyclist 0.00 3 -2.46 665.45 160.00 717.93 217.99 1.72 0.47 1.65 "
    "2.45 1.35 22.10 -2.35\n"
    "DontCare -1 -1 -10 425.00 161.00 601.00 224.00 -1 -1 -1 -1000 -1000 -1000 -10\n"
)

P2 = np.array([
    [721.5377, 0.0, 609.5593, 44.85728],
    [0.0, 721.5377, 172.854, 0.2163791],
    [0.0, 0.0, 1.0, 0.002745884],
])


def make_calib():
    return Calibration({"P2": P2, "R0": np.eye(3),
                        "Tr_velo2cam": np.hstack([np.eye(3), np.zeros((3, 1))])})


def test_label_parse_roundtrip(tmp_path):
    p = tmp_path / "000001.txt"
    p.write_text(SAMPLE_LABEL)
    labels = read_label_file(str(p))
    assert len(labels) == 3
    assert labels.names == ["Car", "Cyclist", "DontCare"]
    np.testing.assert_allclose(labels.pos[0], [-0.65, 1.71, 46.70], atol=1e-6)
    np.testing.assert_allclose(labels.hwl[1], [1.72, 0.47, 1.65], atol=1e-6)
    assert labels.score[0] == -1.0
    # level: height of car box = 200.12-173.33+1 = 27.79 -> Moderate (occl 0, trunc 0)
    assert labels.objects[0].level == 2
    assert labels.objects[2].level == 0  # DontCare


def test_obj_level_thresholds():
    assert obj_level([0, 0, 10, 50], 0.0, 0) == 1      # h=51 easy
    assert obj_level([0, 0, 10, 30], 0.2, 1) == 2      # moderate
    assert obj_level([0, 0, 10, 30], 0.45, 2) == 3     # hard
    assert obj_level([0, 0, 10, 10], 0.0, 0) == 4      # too small
    assert obj_level([0, 0, 10, 100], -1, -1) == 0     # DontCare


def test_pseudo_label_writer_byte_format(tmp_path):
    p = tmp_path / "out.txt"
    cars = [dict(box2d=np.array([100.0, 50.0, 200.0, 120.0]),
                 h=1.526, w=1.63, l=3.88, x=1.0, y=0.5, z=10.0,
                 theta=np.pi)]  # theta-pi/2 = pi/2
    write_pseudo_label_file(str(p), cars)
    line = p.read_text()
    # Reference writer (output.py:30-54): trailing space before newline,
    # y emitted as center+h/2, yaw shifted by -pi/2.
    assert line == ("Car -1 -1 -10 100.00 50.00 200.00 120.00 "
                    "1.53 1.63 3.88 1.00 1.26 10.00 1.57 0.99 \n")
    # And it must reparse through the standard KITTI parser.
    labels = read_label_file(str(p))
    assert labels.names == ["Car"]
    assert labels.score[0] == pytest.approx(0.99)


def test_pseudo_label_writer_yaw_wrap(tmp_path):
    p = tmp_path / "wrap.txt"
    # theta = -3 -> yaw = -3 - pi/2 = -4.57 -> wraps to  +1.71
    write_pseudo_label_file(str(p), [dict(box2d=None, h=1.5, w=1.6, l=3.9,
                                          x=0, y=0, z=5, theta=-3.0)])
    labels = read_label_file(str(p))
    assert labels.ry[0] == pytest.approx(-3.0 - np.pi / 2 + 2 * np.pi, abs=5e-3)


def test_detection_writer_format(tmp_path):
    p = tmp_path / "det.txt"
    row = [0, -1.5, 100.0, 50.0, 200.0, 120.0, 1.5, 1.6, 3.9, 1.0, 1.7, 30.0,
           -1.2, 0.87]
    write_detection_file(str(p), [row], ["Car", "Pedestrian", "Cyclist"])
    assert p.read_text() == ("Car 0.0 0 -1.50 100.00 50.00 200.00 120.00 "
                             "1.50 1.60 3.90 1.00 1.70 30.00 -1.20 0.87\n")


def test_calib_project_unproject():
    calib = make_calib()
    pts = np.array([[1.0, 0.5, 10.0], [-2.0, 1.2, 25.0]])
    img, depth = calib.rect_to_img(pts)
    rec = calib.img_to_rect(img[:, 0], img[:, 1], depth)
    # img_to_rect drops the P2[2,3] projective term (reference
    # kitti_utils.py:205-213 does the same) -> mm-level roundtrip error.
    np.testing.assert_allclose(rec, pts, atol=5e-3)
    np.testing.assert_allclose(depth, pts[:, 2], atol=1e-9)


def test_calib_alpha_ry_inverse():
    calib = make_calib()
    for ry in [-3.0, -1.0, 0.3, 2.9]:
        alpha = calib.ry2alpha(ry, 700.0)
        assert calib.alpha2ry(alpha, 700.0) == pytest.approx(ry, abs=1e-9)


def test_corners3d_matches_box_dims():
    obj = KittiObject.from_line(
        "Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 "
        "-0.65 1.71 46.70 0.0")
    c = obj.corners3d()
    assert c.shape == (8, 3)
    # extents equal l, h, w at ry=0
    assert c[:, 0].max() - c[:, 0].min() == pytest.approx(3.64)
    assert c[:, 1].max() - c[:, 1].min() == pytest.approx(1.65)
    assert c[:, 2].max() - c[:, 2].min() == pytest.approx(1.67)
    # bottom face at y = pos.y
    assert c[:, 1].max() == pytest.approx(1.71)


def test_oxts_pose_chain_straight_line():
    # Drive due north at constant speed on flat ground: poses should advance
    # along +y (Mercator northing), identity rotation after normalization.
    lat0, lon0 = 49.0, 8.43
    pkts = []
    for i in range(5):
        pkts.append([lat0 + i * 1e-5, lon0, 110.0, 0.0, 0.0, np.pi / 2.0])
    poses = oxts_to_poses(np.array(pkts))
    assert poses.shape == (5, 4, 4)
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-9)
    dists = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1)
    # 1e-5 deg latitude ~ 1.11 m; heading yaw=pi/2 means +x in vehicle frame
    np.testing.assert_allclose(dists, dists[0], rtol=1e-6)
    assert 1.0 < dists[0] < 1.25
    # forward motion should be along the IMU x axis after normalization
    assert abs(poses[1][0, 3]) > abs(poses[1][1, 3])


def test_relative_cam_transforms_identity_at_ref():
    pkts = np.array([[49.0 + i * 1e-5, 8.43, 110.0, 0.01, -0.02, 0.5 + 0.01 * i]
                     for i in range(7)])
    poses = oxts_to_poses(pkts)
    imu2cam = np.eye(4)
    imu2cam[:3, 3] = [0.3, -0.08, 0.7]
    rel = relative_cam_transforms(poses, imu2cam, ref_index=3)
    np.testing.assert_allclose(rel[3], np.eye(4), atol=1e-9)
    # transforms map points of frame i into ref frame: composing rel[i] with
    # the inverse chain must return identity
    for i in range(7):
        inv = np.linalg.inv(rel[i])
        np.testing.assert_allclose(inv @ rel[i], np.eye(4), atol=1e-9)

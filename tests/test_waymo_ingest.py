"""Native Waymo ingestion (monosowa_tpu/waymo/): TFRecord framing
differential vs tensorflow's own reader/writer, range-image ->
point-cloud geometry, and the converter end-to-end on a synthetic
TFRecord sequence (no waymo_open_dataset anywhere).

Reference semantics: pseudo_label_generator/waymo_to_kitti_projected.py
+ the public waymo_open_dataset.utils.frame_utils pipeline it calls.
"""

import io
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from monosowa_tpu.waymo import dataset_pb2 as od
from monosowa_tpu.waymo import frame_utils as fu
from monosowa_tpu.waymo.tfrecord import (masked_crc32c, read_tfrecord,
                                         write_tfrecord)


def test_tfrecord_roundtrip(tmp_path):
    recs = [b"alpha", b"", b"\x00" * 1000, os.urandom(4096)]
    path = str(tmp_path / "t.tfrecord")
    write_tfrecord(path, recs)
    assert list(read_tfrecord(path)) == recs


def test_tfrecord_crc_detects_corruption(tmp_path):
    path = str(tmp_path / "t.tfrecord")
    write_tfrecord(path, [b"payload"])
    raw = bytearray(open(path, "rb").read())
    raw[14] ^= 0xFF                       # flip a payload byte
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(read_tfrecord(path))


def test_tfrecord_differential_vs_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")
    recs = [b"first", os.urandom(2048), b"x"]
    ours = str(tmp_path / "ours.tfrecord")
    theirs = str(tmp_path / "theirs.tfrecord")

    write_tfrecord(ours, recs)
    got = [bytes(r.numpy()) for r in
           tf.data.TFRecordDataset(ours, compression_type="")]
    assert got == recs

    with tf.io.TFRecordWriter(theirs) as w:
        for r in recs:
            w.write(r)
    assert list(read_tfrecord(theirs)) == recs


def test_masked_crc_known_vector():
    # crc32c("123456789") = 0xE3069283; TF mask applied on top.
    c = 0xE3069283
    assert masked_crc32c(b"123456789") == \
        ((((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


# ---------------------------------------------------------------- geometry

def _laser_calib(name, lo, hi, extrinsic=np.eye(4)):
    c = od.LaserCalibration()
    c.name = name
    c.beam_inclination_min = lo
    c.beam_inclination_max = hi
    c.extrinsic.transform.extend(np.asarray(extrinsic).reshape(-1).tolist())
    return c


def test_axis_aligned_pixel_maps_to_x_axis():
    """W=5 col 2 has azimuth 0; H=1 with symmetric range has
    inclination 0 -> the point lies on +x at the measured range."""
    frame = od.Frame()
    frame.pose.transform.extend(np.eye(4).reshape(-1).tolist())
    frame.context.laser_calibrations.append(
        _laser_calib(od.LaserName.REAR, -0.1, 0.1))
    ri = np.zeros((1, 5, 4))
    ri[0, 2, 0] = 7.5
    cp = np.zeros((1, 5, 6), np.int32)
    pts, cps = fu.convert_range_image_to_point_cloud(
        frame, {od.LaserName.REAR: [ri]}, {od.LaserName.REAR: [cp]}, None)
    assert len(pts) == 1 and pts[0].shape == (1, 3)
    np.testing.assert_allclose(pts[0][0], [7.5, 0.0, 0.0], atol=1e-9)


def test_extrinsic_translation_and_yaw_correction():
    """A yawed extrinsic subtracts its yaw from the azimuth sweep and
    then rotates back — the vehicle-frame direction of a given column is
    extrinsic-invariant up to the translation."""
    ri = np.zeros((1, 5, 4))
    ri[0, 2, 0] = 4.0
    cp = np.zeros((1, 5, 6), np.int32)

    def run(extrinsic):
        frame = od.Frame()
        frame.pose.transform.extend(np.eye(4).reshape(-1).tolist())
        frame.context.laser_calibrations.append(
            _laser_calib(od.LaserName.REAR, -0.1, 0.1, extrinsic))
        pts, _ = fu.convert_range_image_to_point_cloud(
            frame, {od.LaserName.REAR: [ri]}, {od.LaserName.REAR: [cp]},
            None)
        return pts[0][0]

    base = run(np.eye(4))
    yaw = 0.7
    e = np.eye(4)
    e[:3, :3] = fu.rotation_from_rpy(0.0, 0.0, yaw)
    e[:3, 3] = [1.0, -2.0, 0.5]
    np.testing.assert_allclose(run(e), base + [1.0, -2.0, 0.5], atol=1e-9)


def test_top_pixel_pose_identity_when_static():
    """pixel_pose == frame.pose everywhere -> the rolling-shutter
    correction is a no-op (vehicle -> global -> same vehicle)."""
    h, w = 2, 8
    ri = np.zeros((h, w, 4))
    ri[:, ::2, 0] = np.arange(1, 1 + h * w // 2).reshape(h, -1)
    cp = np.zeros((h, w, 6), np.int32)
    pose = np.eye(4)
    pose[:3, :3] = fu.rotation_from_rpy(0.05, -0.02, 1.3)
    pose[:3, 3] = [10.0, -4.0, 0.3]
    rpy_xyz = np.broadcast_to(
        np.array([0.05, -0.02, 1.3, 10.0, -4.0, 0.3]), (h, w, 6))

    def run(top_pose, frame_pose):
        frame = od.Frame()
        frame.pose.transform.extend(frame_pose.reshape(-1).tolist())
        frame.context.laser_calibrations.append(
            _laser_calib(od.LaserName.TOP, -0.3, 0.2))
        pts, _ = fu.convert_range_image_to_point_cloud(
            frame, {od.LaserName.TOP: [ri]}, {od.LaserName.TOP: [cp]},
            top_pose)
        return pts[0]

    np.testing.assert_allclose(run(rpy_xyz, pose), run(None, np.eye(4)),
                               atol=1e-9)


def test_beam_inclination_rows_reversed():
    """Row 0 carries the TOP (max-inclination) beam."""
    frame = od.Frame()
    frame.pose.transform.extend(np.eye(4).reshape(-1).tolist())
    frame.context.laser_calibrations.append(
        _laser_calib(od.LaserName.REAR, -0.4, 0.4))
    ri = np.zeros((2, 5, 4))
    ri[0, 2, 0] = 1.0                       # top row
    cp = np.zeros((2, 5, 6), np.int32)
    pts, _ = fu.convert_range_image_to_point_cloud(
        frame, {od.LaserName.REAR: [ri]}, {od.LaserName.REAR: [cp]}, None)
    incl = fu.compute_inclination((-0.4, 0.4), 2)[1]   # row-center max
    assert pts[0][0][2] == pytest.approx(np.sin(incl))


def test_matrix_compress_roundtrip():
    arr = np.random.default_rng(0).normal(size=(3, 4, 6)).astype(np.float32)
    buf = fu.compress_matrix(arr, od.MatrixFloat)
    out = fu._decompress_matrix(buf, od.MatrixFloat)
    np.testing.assert_allclose(out, arr, rtol=1e-6)


# ------------------------------------------------------------- end-to-end

def _jpeg_bytes(h, w):
    from PIL import Image
    img = Image.fromarray(
        (np.indices((h, w)).sum(0) % 256).astype(np.uint8)).convert("RGB")
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return buf.getvalue()


def _synthetic_frame():
    frame = od.Frame()
    frame.timestamp_micros = 1
    frame.pose.transform.extend(np.eye(4).reshape(-1).tolist())

    cam = frame.context.camera_calibrations.add()
    cam.name = od.CameraName.FRONT
    cam.intrinsic.extend([2000.0, 2000.0, 960.0, 640.0, 0, 0, 0, 0, 0])
    cam.extrinsic.transform.extend(np.eye(4).reshape(-1).tolist())
    cam.width, cam.height = 64, 48

    img = frame.images.add()
    img.name = od.CameraName.FRONT
    img.image = _jpeg_bytes(48, 64)

    lc = frame.context.laser_calibrations.add()
    lc.name = od.LaserName.TOP
    lc.beam_inclination_min = -0.3
    lc.beam_inclination_max = 0.2
    lc.extrinsic.transform.extend(np.eye(4).reshape(-1).tolist())

    h, w = 4, 16
    ri = np.zeros((h, w, 4), np.float32)
    ri[1, 3, 0], ri[2, 10, 0] = 12.0, 30.0
    cp = np.zeros((h, w, 6), np.int32)
    cp[1, 3, :3] = [od.CameraName.FRONT, 100, 200]
    pose6 = np.zeros((h, w, 6), np.float32)

    laser = frame.lasers.add()
    laser.name = od.LaserName.TOP
    laser.ri_return1.range_image_compressed = fu.compress_matrix(
        ri, od.MatrixFloat)
    laser.ri_return1.camera_projection_compressed = fu.compress_matrix(
        cp, od.MatrixInt32)
    laser.ri_return1.range_image_pose_compressed = fu.compress_matrix(
        pose6, od.MatrixFloat)

    l3 = frame.laser_labels.add()
    l3.id = "veh0"
    l3.type = od.Label.TYPE_VEHICLE
    l3.num_lidar_points_in_box = 12
    l3.box.center_x, l3.box.center_y, l3.box.center_z = 20.0, 1.0, 0.5
    l3.box.length, l3.box.width, l3.box.height = 4.5, 1.8, 1.6
    l3.box.heading = 0.3

    pl = frame.projected_lidar_labels.add()
    pl.name = od.CameraName.FRONT
    il = pl.labels.add()
    il.id = "veh0_FRONT"
    il.type = od.Label.TYPE_VEHICLE
    il.box.center_x, il.box.center_y = 480.0, 320.0
    il.box.length, il.box.width = 80.0, 40.0
    return frame, ri


def test_converter_end_to_end(tmp_path):
    import waymo_to_kitti_projected as w2k

    frame, ri = _synthetic_frame()
    split = tmp_path / "validation"
    split.mkdir()
    write_tfrecord(str(split / "segment-000.tfrecord"),
                   [frame.SerializeToString()])

    out = tmp_path / "out" / "validation"
    n = w2k.convert_split(str(split), str(out), -1, -1, validation=True)
    assert n == 1

    seq = out / "segment-000.tfrecord"
    stem = "0" * 10
    assert (seq / "image_2" / (stem + ".png")).exists()

    # fused lidar: [x y z cam u v] rows for every range > 0 pixel
    fused = np.load(str(seq / "velodyne" / (stem + ".npz")))["arr_0"]
    assert fused.shape == ((ri[..., 0] > 0).sum(), 6)
    exp_pts, exp_cp = fu.convert_range_image_to_point_cloud(
        frame, *fu.parse_range_image_and_camera_projection(frame)[:2],
        fu.parse_range_image_and_camera_projection(frame)[3])
    np.testing.assert_allclose(fused[:, :3], exp_pts[0], rtol=1e-5)
    np.testing.assert_allclose(fused[:, 3:], exp_cp[0][:, :3], rtol=1e-6)

    calib = (seq / "calib" / (stem + ".txt")).read_text()
    assert calib.startswith("P0: 2000.0")
    assert "Cur_pose:" in calib

    label = (seq / "label_2" / (stem + ".txt")).read_text().strip()
    f = label.split()
    assert f[0] == "Car"
    # projected 2D box corners
    assert [float(v) for v in f[4:8]] == [440.0, 300.0, 520.0, 340.0]
    # KITTI cam coords: AXIS_PERM @ center, y shifted to box bottom
    assert float(f[11]) == pytest.approx(-1.0, abs=5e-3)
    assert float(f[12]) == pytest.approx(-0.5 + 0.8, abs=5e-3)
    assert float(f[13]) == pytest.approx(20.0, abs=5e-3)
    assert float(f[14]) == pytest.approx(
        w2k.waymo_heading_to_kitti(0.3), abs=5e-3)
    # L1 (12 points), dist < 30 stratification
    assert (seq / "label_l1_030" / (stem + ".txt")).read_text() == label + "\n"
    assert (seq / "label_l1_3050" / (stem + ".txt")).read_text() == ""

"""Visualization smoke tests (headless file rendering)."""

import numpy as np

from monosowa_tpu.kittiio import Calibration, KittiObject
from monosowa_tpu.sowa import visualization as vis


def _obj(x=1.0, z=15.0, ry=0.3):
    return KittiObject.from_line(
        f"Car 0.00 0 -1.58 500 150 600 250 1.52 1.63 3.88 {x} 1.7 {z} {ry}")


def test_plot_bev_writes_file(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.uniform([-10, 0, 0], [10, 2, 40], (500, 3))
    out = vis.plot_bev(pts, {"pred": [_obj()], "gt": [_obj(1.2, 15.2)]},
                       str(tmp_path / "bev.png"))
    assert (tmp_path / "bev.png").stat().st_size > 1000


def test_draw_boxes_on_image():
    img = np.zeros((375, 1242, 3), np.uint8)
    calib = Calibration({"P2": np.array([[721.5, 0, 609.6, 44.9],
                                         [0, 721.5, 172.9, 0.2],
                                         [0, 0, 1, 0.003]])})
    out = vis.draw_boxes_on_image(img, [_obj()], calib)
    assert out.sum() > 0  # something was drawn


def test_compare_label_dirs(tmp_path):
    d1 = tmp_path / "pred"
    d2 = tmp_path / "gt"
    d1.mkdir()
    d2.mkdir()
    (d1 / "000001.txt").write_text(
        "Car 0.00 0 -1.58 500 150 600 250 1.52 1.63 3.88 1.0 1.7 15.0 0.3\n")
    (d2 / "000001.txt").write_text(
        "Car 0.00 0 -1.58 500 150 600 250 1.52 1.63 3.88 1.1 1.7 15.1 0.3\n")
    out = vis.compare_label_dirs("000001", str(tmp_path / "cmp.png"),
                                 pred_dir=str(d1), gt_dir=str(d2))
    assert (tmp_path / "cmp.png").exists()

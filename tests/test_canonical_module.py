"""Canonical Object Space numerical fidelity: encode (adjust_intrinsics,
canonical depth scaling) -> decode (inverse canonicalization) round trip.

The canonical module is the multi-dataset aggregation mechanism
(kitti_dataset.py:232-245/491-525, decode_helper.py:25-43) and must be
numerically faithful (SURVEY.md §7 guiding decisions).
"""

import numpy as np
import pytest
from PIL import Image

from monosowa_tpu.data.kitti_dataset import KittiDetectionDataset
from monosowa_tpu.kittiio import Calibration


IMG_W, IMG_H = 1242, 375
P2 = np.array([[721.5, 0, 609.6, 44.9], [0, 721.5, 172.9, 0.2],
               [0, 0, 1, 0.003]])


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_obj")
    for sub in ("image_2", "calib", "label_2"):
        (root / "training" / sub).mkdir(parents=True)
    fid = "000007"
    Image.fromarray(np.zeros((IMG_H, IMG_W, 3), np.uint8)).save(
        root / "training" / "image_2" / f"{fid}.png")
    p2l = " ".join(str(v) for v in P2.reshape(-1))
    (root / "training" / "calib" / f"{fid}.txt").write_text(
        f"P0: {p2l}\nP1: {p2l}\nP2: {p2l}\nP3: {p2l}\n"
        "R0_rect: 1 0 0 0 1 0 0 0 1\n"
        "Tr_velo_to_cam: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    # one car at a known pose, fully visible
    (root / "training" / "label_2" / f"{fid}.txt").write_text(
        "Car 0.00 0 -1.40 500.00 160.00 620.00 220.00 "
        "1.52 1.63 3.88 -1.50 1.70 25.00 -1.46\n")
    (root / "ImageSets").mkdir()
    (root / "ImageSets" / "val.txt").write_text(fid + "\n")
    return str(root)


def _dataset(kitti_dir, canonical):
    return KittiDetectionDataset(kitti_dir, "val", {
        "use_canonical_module": canonical,
        "canonical_focal_length": 500.0,
        "random_flip": 0.0, "aug_crop": False,
    })


def test_canonical_scale_and_height_crop(kitti_dir):
    ds = _dataset(kitti_dir, canonical=True)
    sample = ds[0]
    # fx scaled to output resolution: fx' = 721.5 * 1280/1242 = 743.6
    fx_adj = 721.5 * 1280 / 1242
    assert sample["canonical_scale"] == pytest.approx(500.0 / fx_adj,
                                                      rel=1e-6)
    cy_adj = 172.9 * 1280 / 1242
    assert sample["height_crop"] == pytest.approx(cy_adj / (384 / 2),
                                                  rel=1e-6)
    # encoded depth = gt z * canonical_scale (depth_scale 'normal', scale 1)
    assert sample["valid"][0]
    assert sample["depth"][0] == pytest.approx(
        25.0 * sample["canonical_scale"], rel=1e-6)


def test_encode_decode_roundtrip(kitti_dir):
    """Simulate a perfect prediction of the encoded targets and decode it —
    the recovered 3D location/ry must equal the GT label."""
    from monosowa_tpu.train.decode import decode_detections

    ds = _dataset(kitti_dir, canonical=True)
    sample = ds[0]
    assert sample["valid"][0]
    # build a (1, 1, 36) dets row from encoded targets
    det = np.zeros((1, 1, 37), np.float32)  # extract_dets layout: 37 cols
    det[0, 0, 0] = 1                      # cls id (Car)
    det[0, 0, 1] = 0.9                    # score
    b3d = sample["boxes_3d"][0]
    det[0, 0, 2] = b3d[0]                 # cx (2d approx = 3d here)
    det[0, 0, 3] = b3d[1]
    det[0, 0, 4] = b3d[2] + b3d[3]        # w
    det[0, 0, 5] = b3d[4] + b3d[5]        # h
    det[0, 0, 6] = sample["depth"][0]     # canonical depth
    hb = int(sample["heading_bin"][0])
    det[0, 0, 7 + hb] = 10.0              # bin logit argmax
    det[0, 0, 19 + hb] = sample["heading_res"][0]
    det[0, 0, 31:34] = sample["size_3d"][0]
    det[0, 0, 34] = b3d[0]                # 3d center x (normalized)
    det[0, 0, 35] = b3d[1]
    det[0, 0, -1] = 1.0                   # exp(-sigma)

    # decode runs in ORIGINAL image coordinates with the original calib
    # (decode_helper.py:25-44: img_size is the raw size, height_crop +
    # padding un-crop the resized frame's vertical axis)
    infos = {"img_size": np.array([sample["img_size"]]),
             "img_id": np.array([7]),
             "canonical_scale": np.array([sample["canonical_scale"]]),
             "height_crop": np.array([sample["height_crop"]])}
    calib = Calibration({"P2": P2})
    results = decode_detections(det, infos, [calib], np.zeros((3, 3)), 0.2)
    rows = results[7]
    assert len(rows) == 1
    row = rows[0]
    # [cls, alpha, x1,y1,x2,y2, h,w,l, x,y,z, ry, score]
    x, y, z, ry = row[9], row[10], row[11], row[12]
    assert z == pytest.approx(25.0, abs=0.15)
    assert x == pytest.approx(-1.50, abs=0.15)
    assert y == pytest.approx(1.70, abs=0.15)
    dry = (ry - (-1.46) + np.pi) % (2 * np.pi) - np.pi
    assert abs(dry) < 0.27   # 12-bin quantization half-step is ~0.26

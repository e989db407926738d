"""Differential parity: detection extraction + decoding vs the
reference's own decode_helper.py and Calibration.

Runs the reference `extract_dets_from_outputs` (torch) and
`decode_detections` (numpy, using the reference's own Calibration from
kitti_utils.py) against `train/decode.py` driven with our kittiio
Calibration built from the same calib text — pinning the 36-column
detection layout, the top-k-over-(Q*C) selection, the height-crop
un-padding, the Canonical Object Space depth unscaling, img_to_rect /
alpha2ry, and the sigma score product.

Reference: lib/helpers/decode_helper.py:8-113,
lib/datasets/kitti/kitti_utils.py:137-280.
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference/MonoDETR"

B, Q, C, TOPK = 2, 30, 3, 12

CALIB_TXT = """P0: 707.0 0.0 601.8 0.0 0.0 707.0 183.1 0.0 0.0 0.0 1.0 0.0
P1: 707.0 0.0 601.8 0.0 0.0 707.0 183.1 0.0 0.0 0.0 1.0 0.0
P2: 707.0493 0.0 604.0814 45.75831 0.0 707.0493 180.5066 -0.3454157 0.0 0.0 1.0 0.004981016
P3: 707.0 0.0 601.8 0.0 0.0 707.0 183.1 0.0 0.0 0.0 1.0 0.0
R0_rect: 0.9999 0.0098 -0.0074 -0.0098 0.9999 -0.0043 0.0074 0.0043 0.9999
Tr_velo_to_cam: 0.0075 -0.9999 -0.0006 -0.0040 0.0148 0.0007 -0.9998 -0.0767 0.9998 0.0075 0.0148 -0.2717
Tr_imu_to_velo: 0.9999 0.0075 -0.0014 -0.8086 -0.0075 0.9999 -0.0004 0.3195 0.0014 0.0004 1.0 -0.7997
"""


def _stub_torchvision():
    import torchvision_stub
    torchvision_stub.install()


def _load_ref(relpath, name):
    key = f"refdec.{name}"
    if key in sys.modules:
        return sys.modules[key]
    _stub_torchvision()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    try:
        spec = importlib.util.spec_from_file_location(
            key, f"{REF_ROOT}/{relpath}")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[key] = mod
        spec.loader.exec_module(mod)
    finally:
        if REF_ROOT in sys.path:
            sys.path.remove(REF_ROOT)
    return mod


def _calib_file(tmp_path):
    p = tmp_path / "000000.txt"
    p.write_text(CALIB_TXT)
    return str(p)


def test_decode_matches_reference(tmp_path):
    import jax.numpy as jnp

    from monosowa_tpu.kittiio.calib import Calibration as OurCalib
    from monosowa_tpu.train.decode import decode_detections, extract_dets

    ref_dec = _load_ref("lib/helpers/decode_helper.py", "decode_helper")
    ref_ku = _load_ref("lib/datasets/kitti/kitti_utils.py", "kitti_utils")

    rng = np.random.default_rng(0)
    outputs = {
        "pred_logits": rng.normal(size=(B, Q, C)).astype(np.float32),
        "pred_boxes": rng.uniform(0.1, 0.4, (B, Q, 6)).astype(np.float32),
        "pred_angle": rng.normal(size=(B, Q, 24)).astype(np.float32),
        "pred_3d_dim": rng.uniform(-0.3, 0.3, (B, Q, 3)).astype(np.float32),
        "pred_depth": np.stack(
            [rng.uniform(5, 50, (B, Q)),
             rng.normal(size=(B, Q)) * 0.3], -1).astype(np.float32),
    }
    outputs["pred_boxes"][..., :2] = rng.uniform(0.3, 0.7, (B, Q, 2))

    with torch.no_grad():
        t_dets = ref_dec.extract_dets_from_outputs(
            {k: torch.from_numpy(v) for k, v in outputs.items()},
            K=TOPK, topk=TOPK).numpy()
    j_dets = np.asarray(extract_dets(
        {k: jnp.asarray(v) for k, v in outputs.items()}, topk=TOPK))
    np.testing.assert_allclose(j_dets, t_dets, atol=1e-5, rtol=1e-5)

    path = _calib_file(tmp_path)
    ref_calib = ref_ku.Calibration(path)
    our_calib = OurCalib(path)

    infos = {
        "img_size": np.array([[1242, 375], [1224, 370]], np.float32),
        "height_crop": np.array([1.0, 2.0], np.float32),
        "canonical_scale": np.array([1.0, 1.3], np.float32),
        "img_id": np.array([7, 8]),
    }
    mean_size = np.array([[1.52, 1.62, 3.88],
                          [1.76, 0.66, 0.84],
                          [1.73, 0.67, 1.77]], np.float32)

    ref_infos = {k: v for k, v in infos.items()}
    ref_res = ref_dec.decode_detections(
        t_dets.copy(), ref_infos, [ref_calib, ref_calib],
        mean_size.copy(), threshold=0.2)
    our_res = decode_detections(j_dets, infos, [our_calib, our_calib],
                                mean_size, threshold=0.2)

    assert set(our_res) == {7, 8} and set(ref_res) == {7, 8}
    for img_id in (7, 8):
        r, o = ref_res[img_id], our_res[img_id]
        assert len(r) == len(o) and len(r) > 0
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)

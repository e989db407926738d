"""Dataset-encode differential parity: the reference KITTI_Dataset
(__getitem__, MonoDETR/lib/datasets/kitti/kitti_dataset.py:164-449) running
its own code on a synthetic KITTI dir vs the rebuilt KittiDetectionDataset
on the SAME dir — the detector's entire input contract (aug affine, label
encode, canonicalization) must match numerically.

Covers: no-aug encode (exact), seeded flip+crop aug (both sides consume
the identical np.random stream by construction), the canonical module
(canonical_scale / height_crop / depth scaling), and filter rules
(writelist, z<2, z>65, truncation/occlusion mask_2d gates, center outside
the image).
"""

import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/MonoDETR"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                                reason="reference checkout not present")


def _load_reference_dataset_cls():
    import ref_pipeline_harness as harness
    harness.install_stubs()
    # the dataset module imports its AP-eval siblings at module scope;
    # stub them (numba/skimage are not in the image and eval is not under
    # test here — tests/test_eval_reference_parity.py covers it)
    for name in ("lib.datasets.kitti.kitti_eval_python",
                 "lib.datasets.kitti.kitti_eval_python.eval",
                 "lib.datasets.kitti.kitti_eval_python.kitti_common"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name.endswith(".eval"):
                mod.get_official_eval_result = None
                mod.get_distance_eval_result = None
            sys.modules[name] = mod
    # pd.py's `from torchvision import transforms` is a dead import (the
    # name only appears in a docstring); torchvision isn't in the image —
    # the shared ADDITIVE stub also fixes up stubs other tests installed
    import torchvision_stub
    torchvision_stub.install()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    try:
        from lib.datasets.kitti.kitti_dataset import KITTI_Dataset
    finally:
        # the reference tree also has a top-level tools/ package; leaving
        # REF_ROOT on sys.path makes later `import tools.train_val`
        # resolve to the REFERENCE's trainer (imported modules stay
        # cached under lib.*, which nothing else claims)
        if REF_ROOT in sys.path:
            sys.path.remove(REF_ROOT)
    return KITTI_Dataset


# rows cover: Easy / Moderate / Hard kept cars (bboxes contain the
# projected 3D centers), a z>65 drop, a z<2 drop, a truncation>0.5
# UnKnown-level drop, a GHOST row (projected 3D center OUTSIDE its 2D box
# -> negative lrtb -> the reference sets labels/size_2d then `continue`s,
# kitti_dataset.py:336-360), a writelist drop, a DontCare row
LABELS = """\
Car 0.00 0 -1.56 564.62 160.59 616.43 224.74 1.61 1.66 3.20 -0.69 1.69 25.01 -1.58
Car 0.20 1 1.85 420.00 185.00 480.00 225.00 1.67 1.87 3.69 -8.53 2.39 38.49 1.57
Car 0.45 2 -1.65 630.00 170.00 690.00 210.00 1.86 1.60 4.10 2.70 1.61 35.20 -1.59
Car 0.00 0 -1.20 700.00 150.00 760.00 210.00 1.55 1.65 3.90 8.00 1.75 70.50 -1.10
Car 0.00 0 -1.20 600.00 155.00 640.00 200.00 1.48 1.60 3.70 0.10 1.66 1.40 -1.20
Car 0.80 1 -1.65 420.00 140.00 500.00 200.00 1.50 1.70 4.00 -5.20 1.80 30.00 -1.70
Car 0.20 1 -1.65 500.00 185.00 560.00 220.00 1.50 1.70 4.00 -5.20 1.80 30.00 -1.70
Pedestrian 0.00 0 0.50 500.00 160.00 520.00 220.00 1.80 0.60 0.90 -2.00 1.70 15.00 0.40
DontCare -1 -1 -10 503.89 169.71 590.61 190.13 -1 -1 -1 -1000 -1000 -1000 -10
"""

CALIB = (
    "P0: 707.0493 0 604.0814 0 0 707.0493 180.5066 0 0 0 1 0\n"
    "P1: 707.0493 0 604.0814 0 0 707.0493 180.5066 0 0 0 1 0\n"
    "P2: 707.0493 0 604.0814 45.75831 0 707.0493 180.5066 -0.3454157 "
    "0 0 1 0.004981016\n"
    "P3: 707.0493 0 604.0814 0 0 707.0493 180.5066 0 0 0 1 0\n"
    "R0_rect: 0.9999128 0.01009263 -0.008511932 -0.01012729 0.9999406 "
    "-0.004037671 0.008470675 0.004123522 0.9999556\n"
    "Tr_velo_to_cam: 0.006927964 -0.9999722 -0.002757829 -0.02457729 "
    "-0.001162982 0.002749836 -0.9999955 -0.06127237 0.9999753 "
    "0.006931141 -0.001143899 -0.3321029\n"
    "Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 0\n")


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("kitti")
    for sub in ("training/image_2", "training/calib", "training/label_2",
                "ImageSets"):
        os.makedirs(root / sub, exist_ok=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (375, 1242, 3), np.uint8)
    Image.fromarray(img).save(str(root / "training/image_2/000000.png"))
    (root / "training/calib/000000.txt").write_text(CALIB)
    (root / "training/label_2/000000.txt").write_text(LABELS)
    (root / "ImageSets/train.txt").write_text("000000\n")
    (root / "ImageSets/val.txt").write_text("000000\n")
    return str(root)


CFG = dict(use_3d_center=True, writelist=["Car"], meanshape=False,
           aug_pd=False, aug_crop=True, random_flip=0.5, random_crop=0.5,
           scale=0.05, shift=0.05, depth_scale="normal",
           use_canonical_module=True, canonical_focal_length=500.0,
           clip_2d=False)

TARGET_KEYS = ("labels", "boxes", "boxes_3d", "depth", "size_2d", "size_3d",
               "src_size_3d", "heading_bin", "heading_res", "mask_2d")


def _fetch(split, seed, kitti_dir):
    """(reference (inputs, p2, targets, info), ours sample) at one seed."""
    from monosowa_tpu.data.kitti_dataset import KittiDetectionDataset

    KITTI_Dataset = _load_reference_dataset_cls()
    cfg = dict(CFG)
    cfg["root_dir"] = kitti_dir
    ref_ds = KITTI_Dataset(split, cfg)
    np.random.seed(seed)
    ref = ref_ds[0]

    our_ds = KittiDetectionDataset(kitti_dir, split, cfg)
    np.random.seed(seed)
    ours = our_ds[0]
    return ref, ours


def _assert_targets_match(ref, ours, ctx=""):
    _, ref_p2, targets, info = ref
    valid = np.asarray(ours["valid"])
    for key in TARGET_KEYS:
        want = np.asarray(targets[key])
        got = np.asarray(ours[key])
        if want.ndim == 2 and want.shape[1] == 1:
            want = want[:, 0]
        if got.ndim == 2 and got.shape[1] == 1:
            got = got[:, 0]
        n = min(want.shape[0], got.shape[0])
        np.testing.assert_allclose(
            got[:n].astype(np.float64), want[:n].astype(np.float64),
            rtol=1e-5, atol=1e-5,
            err_msg=f"{ctx}: key {key}")
    # the reference has no explicit valid mask; a slot is real iff its
    # label row was filled (labels!=0 only for Car=1 here)
    ref_valid = np.asarray(targets["labels"]) != 0
    np.testing.assert_array_equal(valid, ref_valid, err_msg=f"{ctx}: valid")
    return targets, info


def test_encode_parity_no_aug(kitti_dir):
    ref, ours = _fetch("val", 3, kitti_dir)
    targets, info = _assert_targets_match(ref, ours, "no-aug")
    # filters: of the 9 label rows the 3 Easy/Mod/Hard Cars survive fully
    # and the negative-lrtb row becomes a GHOST slot (labels + size_2d
    # written, boxes/mask_2d zero); z=70.5 and z=1.4 dropped, trunc 0.8 is
    # UnKnown level, Pedestrian/DontCare filtered
    labels_np = np.asarray(targets["labels"])
    assert int((labels_np != 0).sum()) == 4
    assert int(np.asarray(targets["mask_2d"]).sum()) == 3
    ghost = (labels_np != 0) & ~np.asarray(targets["mask_2d"]).astype(bool)
    assert int(ghost.sum()) == 1
    assert not np.asarray(targets["boxes_3d"])[ghost].any()
    assert np.asarray(targets["size_2d"])[ghost].any()
    np.testing.assert_allclose(float(ours["canonical_scale"]),
                               float(info["canonical_scale"]), rtol=1e-6)
    np.testing.assert_allclose(float(ours["height_crop"]),
                               float(info["height_crop"]), rtol=1e-6)
    # the encoded image itself (reference CHW, ours HWC)
    want = np.asarray(ref[0])
    got = np.asarray(ours["image"])
    if got.shape[-1] in (3, 4):
        got = got.transpose(2, 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("seed", [1, 2, 5, 11])
def test_encode_parity_seeded_aug(kitti_dir, seed):
    """train split: flip/crop draws come from the same np.random stream in
    the same order on both sides, so every seed must agree bit-for-bit on
    the aug decisions and numerically on the encodes."""
    ref, ours = _fetch("train", seed, kitti_dir)
    _, _, targets, info = ref
    assert bool(info["flip"]) == bool(ours["flip_flag"])
    np.testing.assert_allclose(float(ours["crop_scale"]),
                               float(info["scale_depth"]), rtol=1e-6)
    _assert_targets_match(ref, ours, f"aug seed {seed}")
    np.testing.assert_allclose(float(ours["canonical_scale"]),
                               float(info["canonical_scale"]), rtol=1e-6)
    np.testing.assert_allclose(float(ours["height_crop"]),
                               float(info["height_crop"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ours["trans"]),
                               np.asarray(info["affine"]), rtol=1e-5,
                               atol=1e-6)

"""Differential test: the repo's KITTI AP evaluator vs the REFERENCE
implementation (MonoDETR/lib/datasets/kitti/kitti_eval_python/eval.py) run
as pure python on randomized annotations.

This breaks the round-1 circularity where the C++ kernels were only checked
against the repo's own python port: here both AP11 and AP_R40 for
bbox/bev/3d (and AOS) must match the reference bit-for-bit on annos with
varied classes, occlusion, truncation, DontCare boxes, and empty frames.
"""

import os

import numpy as np
import pytest

from monosowa_tpu.evalkitti import eval as my_eval
from tests.ref_eval_loader import REF_EVAL_DIR, load_reference_eval

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_EVAL_DIR),
                                reason="reference checkout not present")

NAMES = np.array(["Car", "Car", "Car", "Van", "Pedestrian", "Cyclist",
                  "Person_sitting", "Truck", "DontCare"])

# reference get_official_eval_result overlap tables (eval.py:821-831),
# [metric, class] for classes (car, ped, cyc)
OVERLAP_07 = np.array([[0.7, 0.5, 0.5], [0.7, 0.5, 0.5], [0.7, 0.5, 0.5]])
OVERLAP_05 = np.array([[0.5, 0.5, 0.5], [0.5, 0.25, 0.25],
                       [0.5, 0.25, 0.25]])
OVERLAP_03 = np.array([[0.3, 0.5, 0.5], [0.3, 0.25, 0.25],
                       [0.3, 0.25, 0.25]])


def _empty_anno():
    return {"name": np.array([], dtype="<U16"),
            "truncated": np.zeros(0), "occluded": np.zeros(0),
            "alpha": np.zeros(0), "bbox": np.zeros((0, 4)),
            "dimensions": np.zeros((0, 3)), "location": np.zeros((0, 3)),
            "rotation_y": np.zeros(0), "score": np.zeros(0)}


def _pack(objs):
    if not objs:
        return _empty_anno()
    return {
        "name": np.array([o["name"] for o in objs]),
        "truncated": np.array([o["trunc"] for o in objs], np.float64),
        "occluded": np.array([o["occ"] for o in objs], np.float64),
        "alpha": np.array([o["alpha"] for o in objs], np.float64),
        "bbox": np.stack([o["bbox"] for o in objs]).astype(np.float64),
        "dimensions": np.stack([o["dims"] for o in objs]).astype(np.float64),
        "location": np.stack([o["loc"] for o in objs]).astype(np.float64),
        "rotation_y": np.array([o["rot"] for o in objs], np.float64),
        "score": np.array([o["score"] for o in objs], np.float64),
    }


def _rand_gt_obj(rng):
    name = NAMES[rng.integers(len(NAMES))]
    h_px = rng.uniform(12.0, 140.0)           # straddles MIN_HEIGHT 40/25
    w_px = h_px * rng.uniform(0.6, 2.2)
    x1 = rng.uniform(0, 1100)
    y1 = rng.uniform(0, 300)
    big = name in ("Car", "Van", "Truck")
    dims = (np.array([rng.uniform(3.2, 5.2), rng.uniform(1.4, 2.0),
                      rng.uniform(1.5, 1.9)]) if big else
            np.array([rng.uniform(0.4, 1.8), rng.uniform(1.5, 1.9),
                      rng.uniform(0.4, 0.9)]))
    return {
        "name": name,
        "trunc": float(rng.uniform(0.0, 0.65)),  # straddles 0.15/0.3/0.5
        "occ": int(rng.integers(0, 4)),          # straddles 0/1/2
        "alpha": float(rng.uniform(-np.pi, np.pi)),
        "bbox": np.array([x1, y1, x1 + w_px, y1 + h_px]),
        "dims": dims,                            # (l, h, w) layout
        "loc": np.array([rng.uniform(-20, 20), rng.uniform(0.5, 2.5),
                         rng.uniform(5, 60)]),
        "rot": float(rng.uniform(-np.pi, np.pi)),
        "score": 0.0,
    }


def _perturb_det(rng, gt):
    o = {k: (v.copy() if isinstance(v, np.ndarray) else v)
         for k, v in gt.items()}
    tight = rng.uniform() < 0.5                  # mix of near-exact and
    s = 0.2 if tight else 1.0                    # loose matches so strict
    o["bbox"] = gt["bbox"] + rng.normal(0, 6.0 * s, 4)   # overlaps also
    o["loc"] = gt["loc"] + rng.normal(0, 0.35 * s, 3)    # see mid-range AP
    o["dims"] = gt["dims"] * rng.uniform(1 - 0.08 * s, 1 + 0.08 * s, 3)
    o["rot"] = gt["rot"] + float(rng.normal(0, 0.12 * s))
    o["alpha"] = gt["alpha"] + float(rng.normal(0, 0.15 * s))
    o["trunc"] = -1.0
    o["occ"] = -1.0
    o["score"] = float(rng.uniform(0.05, 1.0))
    if rng.uniform() < 0.08:                     # class confusions
        o["name"] = NAMES[rng.integers(len(NAMES) - 1)]
    return o


def make_annos(n_frames=200, seed=20240816):
    rng = np.random.default_rng(seed)
    gt_annos, dt_annos = [], []
    for f in range(n_frames):
        if f == 0:
            gts = []                              # empty-GT frame
        else:
            gts = [_rand_gt_obj(rng) for _ in range(rng.integers(1, 8))]
        dts = []
        if f != 1:                                # frame 1: empty detections
            for g in gts:
                if g["name"] != "DontCare" and rng.uniform() < 0.8:
                    dts.append(_perturb_det(rng, g))
            for _ in range(rng.integers(0, 3)):   # pure false positives
                fp = _rand_gt_obj(rng)
                while fp["name"] == "DontCare":
                    fp = _rand_gt_obj(rng)
                fp["trunc"], fp["occ"] = -1.0, -1.0
                fp["score"] = float(rng.uniform(0.05, 1.0))
                dts.append(fp)
        gt_annos.append(_pack(gts))
        dt_annos.append(_pack(dts))
    return gt_annos, dt_annos


@pytest.fixture(scope="module")
def annos():
    return make_annos()


@pytest.fixture(scope="module")
def ref_results(annos):
    ref = load_reference_eval()
    gt, dt = annos
    min_overlaps = np.stack([OVERLAP_07, OVERLAP_05, OVERLAP_03])
    return ref.do_eval(gt, dt, [0, 1, 2], min_overlaps, compute_aos=True)


def test_ap_matches_reference(annos, ref_results):
    gt, dt = annos
    (bbox11, bev11, d311, aos11,
     bbox40, bev40, d340, aos40) = ref_results
    mine = my_eval.get_official_eval_result(
        gt, dt, current_classes=(0, 1, 2),
        overlap_sets={"o07": OVERLAP_07, "o05": OVERLAP_05,
                      "o03": OVERLAP_03})
    ref11 = {"bbox": bbox11, "bev": bev11, "3d": d311}
    ref40 = {"bbox": bbox40, "bev": bev40, "3d": d340}
    for j, cls_name in enumerate(("car", "pedestrian", "cyclist")):
        for i, set_name in enumerate(("o07", "o05", "o03")):
            for metric_name in ("bbox", "bev", "3d"):
                r = mine[f"{cls_name}_{metric_name}_{set_name}"]
                np.testing.assert_allclose(
                    r["ap40"], ref40[metric_name][j, :, i],
                    rtol=0, atol=1e-6,
                    err_msg=f"AP_R40 {cls_name}/{metric_name}/{set_name}")
                np.testing.assert_allclose(
                    r["ap11"], ref11[metric_name][j, :, i],
                    rtol=0, atol=1e-6,
                    err_msg=f"AP11 {cls_name}/{metric_name}/{set_name}")


def test_distance_stratified_ap_matches_reference(annos):
    """Distance-band difficulties (clean_data_by_distance, DIForDIS=False)."""
    ref = load_reference_eval()
    gt, dt = annos
    min_overlaps = np.stack([OVERLAP_07, OVERLAP_05])
    (bbox11, bev11, d311, _, bbox40, bev40, d340, _) = ref.do_eval(
        gt, dt, [0, 1, 2], min_overlaps, compute_aos=False, DIForDIS=False)
    mine = my_eval.get_distance_eval_result(gt, dt, current_classes=(0, 1, 2))
    ref40 = {"bbox": bbox40, "bev": bev40, "3d": d340}
    ref11 = {"bbox": bbox11, "bev": bev11, "3d": d311}
    for j, cls_name in enumerate(("car", "pedestrian", "cyclist")):
        for i, set_name in enumerate(("strict", "loose")):
            for metric_name in ("bbox", "bev", "3d"):
                r = mine[f"{cls_name}_{metric_name}_{set_name}"]
                np.testing.assert_allclose(
                    r["ap40"], ref40[metric_name][j, :, i],
                    rtol=0, atol=1e-6,
                    err_msg=f"dist AP_R40 {cls_name}/{metric_name}/{set_name}")
                np.testing.assert_allclose(
                    r["ap11"], ref11[metric_name][j, :, i],
                    rtol=0, atol=1e-6,
                    err_msg=f"dist AP11 {cls_name}/{metric_name}/{set_name}")


def test_aos_matches_reference(annos, ref_results):
    gt, dt = annos
    aos11, aos40 = ref_results[3], ref_results[7]
    for difficulty in (0, 1, 2):
        r = my_eval.eval_class(gt, dt, 0, difficulty, metric=0,
                               min_overlap=0.7, compute_aos=True)
        assert my_eval.ap40(r["aos"]) == pytest.approx(
            aos40[0, difficulty, 0], abs=1e-6)
        assert my_eval.ap11(r["aos"]) == pytest.approx(
            aos11[0, difficulty, 0], abs=1e-6)

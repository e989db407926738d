"""KITTI AP stack tests: analytic cases where AP is known exactly.

Note: eval.py emits one recall threshold per distinct TP score, so scenarios
use >= 41 GT objects (spread over 50 images) to sample the recall axis
fully — single-object cases degenerate to near-zero AP by construction of
the official metric.
"""

import numpy as np
import pytest

from monosowa_tpu.evalkitti import eval as E

N_IMG = 50
BOX = [100, 100, 200, 200]  # height 100 -> easy-eligible


def make_anno(names, bboxes, locs=None, dims=None, rys=None, scores=None,
              trunc=None, occl=None, alphas=None):
    n = len(names)
    locs = np.asarray(locs if locs is not None else np.zeros((n, 3)), np.float64)
    dims = np.asarray(dims if dims is not None
                      else np.tile([3.9, 1.5, 1.6], (n, 1)), np.float64)
    return {
        "name": np.array(names),
        "truncated": np.asarray(trunc if trunc is not None else np.zeros(n), np.float64),
        "occluded": np.asarray(occl if occl is not None else np.zeros(n), np.float64),
        "alpha": np.asarray(alphas if alphas is not None else np.zeros(n), np.float64),
        "bbox": np.asarray(bboxes, np.float64).reshape(n, 4),
        "dimensions": dims.reshape(n, 3),
        "location": locs.reshape(n, 3),
        "rotation_y": np.asarray(rys if rys is not None else np.zeros(n), np.float64),
        "score": np.asarray(scores if scores is not None else np.ones(n), np.float64),
    }


def test_perfect_detection_ap_100():
    rng = np.random.default_rng(0)
    gt = [make_anno(["Car"], [BOX]) for _ in range(N_IMG)]
    dt = [make_anno(["Car"], [BOX], scores=[s])
          for s in rng.uniform(0.3, 1.0, N_IMG)]
    r = E.eval_class(gt, dt, current_class=0, difficulty=0, metric=0,
                     min_overlap=0.7)
    assert E.ap40(r["precision"]) == pytest.approx(100.0)
    assert E.ap11(r["precision"]) == pytest.approx(100.0)


def test_missed_detection_ap_0():
    gt = [make_anno(["Car"], [BOX])]
    dt = [make_anno([], np.zeros((0, 4)))]
    r = E.eval_class(gt, dt, 0, 0, 0, 0.7)
    assert E.ap40(r["precision"]) == 0.0


def test_high_scored_false_positives_halve_precision():
    rng = np.random.default_rng(1)
    gt, dt = [], []
    for i in range(N_IMG):
        gt.append(make_anno(["Car"], [BOX]))
        # fp (disjoint box) always outranks the tp
        dt.append(make_anno(["Car", "Car"], [BOX, [400, 100, 500, 200]],
                            scores=[rng.uniform(0.1, 0.4),
                                    rng.uniform(0.6, 0.9)]))
    r = E.eval_class(gt, dt, 0, 0, 0, 0.7)
    # at recall r: tp = 50r, fp = 50 (all fps above any tp threshold);
    # envelope -> precision at full recall = 0.5 everywhere
    assert E.ap40(r["precision"]) == pytest.approx(50.0, abs=1.0)


def test_low_scored_false_positives_ignored():
    rng = np.random.default_rng(2)
    gt, dt = [], []
    for i in range(N_IMG):
        gt.append(make_anno(["Car"], [BOX]))
        dt.append(make_anno(["Car", "Car"], [BOX, [400, 100, 500, 200]],
                            scores=[rng.uniform(0.6, 0.9),
                                    rng.uniform(0.0, 0.2)]))
    r = E.eval_class(gt, dt, 0, 0, 0, 0.7)
    # fps score below every tp threshold -> never counted
    assert E.ap40(r["precision"]) == pytest.approx(100.0)


def test_van_gt_is_ignored_not_fp():
    rng = np.random.default_rng(3)
    gt, dt = [], []
    for i in range(N_IMG):
        gt.append(make_anno(["Van", "Car"], [[300, 100, 400, 200], BOX]))
        dt.append(make_anno(["Car", "Car"], [[300, 100, 400, 200], BOX],
                            scores=[0.95, rng.uniform(0.3, 0.9)]))
    r = E.eval_class(gt, dt, 0, 0, 0, 0.7)
    assert E.ap40(r["precision"]) == pytest.approx(100.0)


def test_dontcare_region_absorbs_detections():
    rng = np.random.default_rng(4)
    gt, dt = [], []
    for i in range(N_IMG):
        gt.append(make_anno(["Car", "DontCare"], [BOX, [400, 100, 500, 200]],
                            trunc=[0, -1], occl=[0, -1]))
        dt.append(make_anno(["Car", "Car"], [BOX, [400, 100, 500, 200]],
                            scores=[rng.uniform(0.3, 0.6), 0.9]))
    r = E.eval_class(gt, dt, 0, 0, 0, 0.7)
    assert E.ap40(r["precision"]) == pytest.approx(100.0)


def test_difficulty_filtering_small_box():
    rng = np.random.default_rng(5)
    small = [100, 100, 130, 130]
    gt = [make_anno(["Car"], [small]) for _ in range(N_IMG)]
    dt = [make_anno(["Car"], [small], scores=[s])
          for s in rng.uniform(0.3, 1.0, N_IMG)]
    r_easy = E.eval_class(gt, dt, 0, 0, 0, 0.7)
    r_mod = E.eval_class(gt, dt, 0, 1, 0, 0.7)
    assert E.ap40(r_easy["precision"]) == 0.0  # no valid easy gt
    assert E.ap40(r_mod["precision"]) == pytest.approx(100.0)


def test_bev_and_3d_metrics_perfect():
    rng = np.random.default_rng(6)
    loc = [[2.0, 1.5, 20.0]]
    gt = [make_anno(["Car"], [BOX], locs=loc, rys=[0.3])
          for _ in range(N_IMG)]
    dt = [make_anno(["Car"], [BOX], locs=loc, rys=[0.3], scores=[s])
          for s in rng.uniform(0.3, 1.0, N_IMG)]
    for metric in (1, 2):
        r = E.eval_class(gt, dt, 0, 0, metric, 0.7)
        assert E.ap40(r["precision"]) == pytest.approx(100.0), metric


def test_3d_offset_below_threshold_fails():
    gt = [make_anno(["Car"], [BOX], locs=[[0.0, 1.5, 20.0]], rys=[0.0])
          for _ in range(N_IMG)]
    dt = [make_anno(["Car"], [BOX], locs=[[2.5, 1.5, 20.0]], rys=[0.0],
                    scores=[0.9]) for _ in range(N_IMG)]
    r = E.eval_class(gt, dt, 0, 0, 2, 0.7)
    assert E.ap40(r["precision"]) == 0.0


def test_get_thresholds_spacing():
    scores = np.linspace(1, 0, 100)
    th = E.get_thresholds(scores, num_gt=100)
    assert len(th) == 41
    assert th[0] == pytest.approx(1.0)


def test_official_result_structure():
    rng = np.random.default_rng(7)
    gt = [make_anno(["Car"], [BOX], locs=[[2.0, 1.5, 20.0]])
          for _ in range(N_IMG)]
    dt = [make_anno(["Car"], [BOX], locs=[[2.0, 1.5, 20.0]], scores=[s])
          for s in rng.uniform(0.3, 1.0, N_IMG)]
    res = E.get_official_eval_result(gt, dt)
    assert "car_3d_strict" in res and "car_bev_loose" in res
    assert res["car_3d_strict"]["ap40"][0] == pytest.approx(100.0)


def test_anno_from_label_file(tmp_path):
    p = tmp_path / "000000.txt"
    p.write_text("Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 "
                 "1.65 1.67 3.64 -0.65 1.71 46.70 -1.59 0.88\n")
    a = E.anno_from_label_file(str(p))
    assert a["name"][0] == "Car"
    # dimensions reordered to (l, h, w)
    np.testing.assert_allclose(a["dimensions"][0], [3.64, 1.65, 1.67])
    assert a["score"][0] == pytest.approx(0.88)


def test_offline_evaluate_cli(tmp_path, capsys):
    """The thin offline-eval driver (reference kitti_eval_python/evaluate.py
    equivalent): perfect predictions -> AP 100 printed."""
    from monosowa_tpu.evalkitti import evaluate as ev

    gt = tmp_path / "gt"
    pred = tmp_path / "pred"
    gt.mkdir()
    pred.mkdir()
    row = ("Car 0.0 0 -1.2 300.0 150.0 400.0 250.0 "
           "1.5 1.6 3.9 1.0 1.5 12.0 -1.0")
    for i in range(45):
        (gt / f"{i:06d}.txt").write_text(row + "\n")
        # >= 41 GT with distinct scores: fewer under-sample the 40-point
        # recall grid (KITTI metric definition) and cap the AP below 100
        (pred / f"{i:06d}.txt").write_text(row + f" 0.{100 + i}\n")

    res = ev.evaluate(str(gt), str(pred))
    assert res["car_3d_strict"]["ap40"][1] > 99.0

    ev.main([str(gt), str(pred)])
    out = capsys.readouterr().out
    assert "car_3d_strict" in out and "AP_R40" in out

    # --split restricting the evaluated ids still runs (single-GT AP is
    # degenerate under the 40-point recall grid; assert structure only)
    split = tmp_path / "ids.txt"
    split.write_text("000001\n")
    res = ev.evaluate(str(gt), str(pred), split_file=str(split))
    assert set(res) >= {"car_bbox_strict", "car_3d_loose"}

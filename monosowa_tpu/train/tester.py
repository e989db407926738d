"""Tester: inference -> KITTI result files -> AP evaluation (+ visu).

Behavioral contract (MonoDETR/lib/helpers/tester_helper.py:14-254): batch
inference with decode (canonical-module inversion), per-image KITTI result
txt under <save_path>/outputs/data, dataset eval via the KITTI AP stack, a
per-image s/img report, and optional prediction/GT visualisation
(visu_predictions / visu_ground_truth -> BEV renders here).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np


def run_inference(model, state, dataset, cfg: Dict, logger=print,
                  visu: bool = False) -> str:
    """Writes result files; returns the results dir."""
    import jax.numpy as jnp

    from monosowa_tpu.data.kitti_dataset import CLS_MEAN_SIZE, collate
    from monosowa_tpu.kittiio import Calibration
    from monosowa_tpu.kittiio.labels import write_detection_file
    from monosowa_tpu.train.decode import decode_detections
    from monosowa_tpu.train.trainer import make_eval_step

    tester_cfg = cfg.get("tester", {})
    threshold = float(tester_cfg.get("threshold", 0.2))
    out_dir = os.path.join(cfg["trainer"].get("save_path", "outputs"),
                           "outputs", "data")
    os.makedirs(out_dir, exist_ok=True)
    eval_step = make_eval_step(model, topk=int(tester_cfg.get("topk", 50)))
    batch_size = int(cfg["dataset"].get("batch_size", 16))
    mean_size = (CLS_MEAN_SIZE if cfg["dataset"].get("meanshape", False)
                 else np.zeros((3, 3), np.float32))
    class_names = ["Pedestrian", "Car", "Cyclist"]

    n = 0
    t0 = time.time()
    order = np.arange(len(dataset))
    for i in range(0, len(order), batch_size):
        idxs = order[i:i + batch_size]
        batch = collate([dataset[int(j)] for j in idxs])
        dets = np.asarray(eval_step(state, {
            k: jnp.asarray(v) for k, v in batch.items()
            if k in ("image", "calib", "img_size")}))
        infos = {"img_size": batch["img_size"], "img_id": batch["img_id"],
                 "canonical_scale": batch["canonical_scale"],
                 "height_crop": batch["height_crop"]}
        calibs = [Calibration({"P2": batch["calib"][k]})
                  for k in range(len(idxs))]
        results = decode_detections(dets, infos, calibs, mean_size, threshold)
        for img_id, rows in results.items():
            write_detection_file(os.path.join(out_dir, f"{img_id:06d}.txt"),
                                 rows, class_names)
        n += len(idxs)
    logger(f"inference on {n} images, {(time.time() - t0) / max(n, 1):.3f}"
           " s/img")

    if visu or tester_cfg.get("visu_predictions", False):
        visualize_results(dataset, out_dir, cfg, logger)
    return out_dir


def visualize_results(dataset, results_dir: str, cfg: Dict, logger=print,
                      max_images: int = 20) -> None:
    """BEV comparison renders (tester_helper.py:196-254 headless analog)."""
    from monosowa_tpu.sowa.visualization import compare_label_dirs

    visu_dir = os.path.join(cfg["trainer"].get("save_path", "outputs"),
                            "outputs", "visu")
    os.makedirs(visu_dir, exist_ok=True)
    gt_dir = os.path.join(cfg["dataset"]["root_dir"], "training", "label_2")
    show_gt = cfg.get("tester", {}).get("visu_ground_truth", True)
    for idx in dataset.idx_list[:max_images]:
        fid = f"{int(idx):06d}"
        compare_label_dirs(fid, os.path.join(visu_dir, fid + ".png"),
                           pred_dir=results_dir,
                           gt_dir=gt_dir if show_gt else None)
    logger(f"visualisations under {visu_dir}")


def evaluate_results(dataset, results_dir: str, cfg: Dict,
                     logger=print) -> Dict:
    from monosowa_tpu.evalkitti import annos_from_label_dir, \
        get_official_eval_result
    from monosowa_tpu.evalkitti.eval import anno_from_label_file

    gt_dir = os.path.join(cfg["dataset"]["root_dir"], "training", "label_2")
    ids = [f"{int(i):06d}" for i in dataset.idx_list]
    gt = annos_from_label_dir(gt_dir, ids)
    dt = [anno_from_label_file(os.path.join(results_dir, f"{i}.txt"))
          for i in ids]
    res = get_official_eval_result(gt, dt, current_classes=(0,))
    for k, v in res.items():
        logger(f"{k}: AP40 {['%.2f' % a for a in v['ap40']]}")
    return res


def test(model, state, dataset, cfg: Dict, logger=print,
         visu: bool = False) -> Dict:
    out_dir = run_inference(model, state, dataset, cfg, logger, visu)
    return evaluate_results(dataset, out_dir, cfg, logger)

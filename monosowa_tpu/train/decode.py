"""Detection extraction + decoding into KITTI label rows.

Behavioral contract (MonoDETR/lib/helpers/decode_helper.py):

* ``extract_dets`` (:58-113): top-k over flattened sigmoid class scores,
  gathered per-query outputs concatenated into the 36-column detection
  array [cls, score, cx2d, cy2d, w2d, h2d, depth, 24x heading, 3x dim,
  cx3d, cy3d, exp(-sigma)];
* ``decode_detections`` (:8-55): un-crop the vertical padding via
  height_crop, invert the Canonical Object Space scaling
  (depth /= canonical_scale), lift to 3D through the calib, alpha -> ry;
* ``get_heading_angle`` (:176-183): argmax bin + residual -> angle.

extract runs jitted on device; decode is host-side numpy producing KITTI
rows for the label writer.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.data.kitti_dataset import class2angle
from monosowa_tpu.models.matcher import box_cxcylrtb_to_xyxy


@partial(jax.jit, static_argnames=("topk",))
def extract_dets(outputs: Dict[str, jnp.ndarray], topk: int = 50
                 ) -> jnp.ndarray:
    """Model outputs -> (B, topk, 36) detections array."""
    logits = outputs["pred_logits"]                   # (B, Q, C)
    boxes = outputs["pred_boxes"]                     # (B, Q, 6)
    b, q, c = logits.shape
    prob = jax.nn.sigmoid(logits).reshape(b, q * c)
    scores, idx = jax.lax.top_k(prob, topk)
    qidx = idx // c
    labels = (idx % c).astype(jnp.float32)

    def g(x):
        return jnp.take_along_axis(
            x, qidx[..., None].repeat(x.shape[-1], -1), axis=1)

    boxes_k = g(boxes)
    heading = g(outputs["pred_angle"])
    size3d = g(outputs["pred_3d_dim"])
    depth = g(outputs["pred_depth"][..., 0:1])
    sigma = jnp.exp(-g(outputs["pred_depth"][..., 1:2]))

    xyxy = box_cxcylrtb_to_xyxy(boxes_k)
    cx2d = (xyxy[..., 0:1] + xyxy[..., 2:3]) / 2
    cy2d = (xyxy[..., 1:2] + xyxy[..., 3:4]) / 2
    size2d = jnp.concatenate([xyxy[..., 2:3] - xyxy[..., 0:1],
                              xyxy[..., 3:4] - xyxy[..., 1:2]], -1)
    return jnp.concatenate(
        [labels[..., None], scores[..., None], cx2d, cy2d, size2d,
         depth, heading, size3d, boxes_k[..., 0:1], boxes_k[..., 1:2],
         sigma], axis=2)


def get_heading_angle(heading: np.ndarray) -> float:
    cls = int(np.argmax(heading[:12]))
    res = float(heading[12 + cls])
    return class2angle(cls, res, to_label_format=True)


def decode_detections(dets: np.ndarray, infos: Dict[str, np.ndarray],
                      calibs: Sequence, cls_mean_size: np.ndarray,
                      threshold: float = 0.2) -> Dict[int, List[List[float]]]:
    """(B, K, 36) -> {img_id: [[cls, alpha, x1,y1,x2,y2, h,w,l, x,y,z, ry,
    score], ...]} (decode_helper.py:8-55)."""
    results: Dict[int, List[List[float]]] = {}
    for i in range(dets.shape[0]):
        preds = []
        img_w, img_h = infos["img_size"][i]
        hc = infos["height_crop"][i]
        cscale = infos["canonical_scale"][i]
        padding = (img_h - (img_h / hc)) // 2
        for j in range(dets.shape[1]):
            cls_id = int(dets[i, j, 0])
            score = float(dets[i, j, 1])
            if score < threshold:
                continue
            x = dets[i, j, 2] * img_w
            y = dets[i, j, 3] * (img_h / hc) + padding
            w = dets[i, j, 4] * img_w
            h = dets[i, j, 5] * (img_h / hc)
            bbox = [x - w / 2, y - h / 2, x + w / 2, y + h / 2]

            depth = dets[i, j, 6] / cscale
            dims = dets[i, j, 31:34] + cls_mean_size[cls_id]
            x3d = dets[i, j, 34] * img_w
            y3d = dets[i, j, 35] * (img_h / hc) + padding
            loc = calibs[i].img_to_rect(x3d, y3d, depth).reshape(-1)
            loc[1] += dims[0] / 2

            alpha = get_heading_angle(dets[i, j, 7:31])
            ry = calibs[i].alpha2ry(alpha, x)
            score = score * float(dets[i, j, -1])
            preds.append([cls_id, alpha] + bbox + dims.tolist()
                         + loc.tolist() + [ry, score])
        results[int(infos["img_id"][i])] = preds
    return results

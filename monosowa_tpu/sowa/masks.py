"""Instance-mask generation interface + cache.

Behavioral contract (SURVEY.md §2.1 P6): the reference runs Detectron2
cascade_mask_rcnn MViTv2-H, keeps car-class masks with score > 0.7
(filtering.py:97-110), and caches them per frame under ``masks_raw/``
(loader.py:1703-1790, zstd-pickle).

Capability interface: segmentation is pluggable.  ``CachedMaskBackend``
reads precomputed masks (bit-packed npz — our cache format); a torch/JAX
served backend can implement ``predict_masks`` when checkpoints exist.
"""

from __future__ import annotations

import os
from typing import List, Optional, Protocol

import numpy as np

SCORE_THRESHOLD = 0.7  # filtering.score_detectron_thresh


class MaskBackend(Protocol):
    def predict_masks(self, image: np.ndarray) -> List[np.ndarray]:
        """(H, W, 3) uint8 -> list of (H, W) bool car masks."""
        ...


class MaskRefineBackend(Protocol):
    """Box-prompted mask refinement (the reference's SAM ViT-H stage,
    run_SAM_batch filtering.py:112-148 / load_and_init_SAM loader.py:97-103):
    given the image and one 2D box per instance, return one refined mask
    per box (SamPredictor.predict(box=..., multimask_output=False))."""

    def refine(self, image: np.ndarray, boxes: np.ndarray
               ) -> List[np.ndarray]:
        """image (H, W, 3) uint8; boxes (N, 4) [x1, y1, x2, y2] int ->
        N (H, W) bool masks."""
        ...


def mask_box(mask: np.ndarray) -> np.ndarray:
    ys, xs = np.where(mask)
    if len(xs) == 0:
        return np.zeros(4, np.int64)
    return np.array([xs.min(), ys.min(), xs.max(), ys.max()], np.int64)


def refine_masks(masks: List[np.ndarray], scores: List[float],
                 image: np.ndarray, backend: MaskRefineBackend,
                 score_thresh: float = SCORE_THRESHOLD) -> List[np.ndarray]:
    """Replace each above-threshold detection's mask with the backend's
    box-prompted refinement (run_SAM_batch :133-146: boxes come from the
    detector's pred_boxes; low-score masks pass through untouched)."""
    eligible = [i for i, s in enumerate(scores)
                if s > score_thresh and np.any(masks[i])]
    if not eligible:
        return list(masks)
    boxes = np.stack([mask_box(masks[i]) for i in eligible])
    refined = backend.refine(image, boxes)
    out = list(masks)
    for j, i in enumerate(eligible):
        out[i] = np.asarray(refined[j], bool)
    return out


def save_masks(cache_dir: str, frame: str, masks: List[np.ndarray],
               img_hw) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    h, w = img_hw
    if masks:
        arr = np.stack([m.astype(bool) for m in masks])
    else:
        arr = np.zeros((0, h, w), bool)
    np.savez_compressed(os.path.join(cache_dir, f"{frame}.npz"),
                        packed=np.packbits(arr, axis=-1),
                        shape=np.array(arr.shape))


def load_masks(cache_dir: str, frame: str) -> Optional[List[np.ndarray]]:
    path = os.path.join(cache_dir, f"{frame}.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        shape = z["shape"]
        packed = z["packed"]
    arr = np.unpackbits(packed, axis=-1, count=int(shape[-1])).astype(bool)
    return [arr[i] for i in range(int(shape[0]))]

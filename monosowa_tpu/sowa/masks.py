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

"""Photometric distortion augmentation.

Behavioral contract (MonoDETR/lib/datasets/kitti/pd.py, aug_pd — OFF by
default in configs/monodetr.yaml): random brightness / contrast /
saturation / hue jitter and channel permutation on float32 RGB images.
"""

from __future__ import annotations

import numpy as np


def photometric_distort(img: np.ndarray,
                        rng: np.random.Generator | None = None) -> np.ndarray:
    """img: (H, W, 3) float32 RGB in [0, 255]; returns same."""
    rng = rng or np.random.default_rng()
    img = img.copy()

    # brightness
    if rng.random() < 0.5:
        img += rng.uniform(-32, 32)
    # contrast (mode 0: before saturation/hue)
    contrast_last = rng.random() < 0.5
    if not contrast_last and rng.random() < 0.5:
        img *= rng.uniform(0.5, 1.5)

    # saturation/hue in HSV
    if rng.random() < 0.5 or rng.random() < 0.5:
        import cv2
        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                           cv2.COLOR_RGB2HSV).astype(np.float32)
        if rng.random() < 0.5:
            hsv[..., 1] *= rng.uniform(0.5, 1.5)
        if rng.random() < 0.5:
            hsv[..., 0] = (hsv[..., 0] + rng.uniform(-18, 18)) % 180
        hsv[..., 1] = np.clip(hsv[..., 1], 0, 255)
        img = cv2.cvtColor(hsv.astype(np.uint8),
                           cv2.COLOR_HSV2RGB).astype(np.float32)

    if contrast_last and rng.random() < 0.5:
        img *= rng.uniform(0.5, 1.5)

    # random channel swap
    if rng.random() < 0.5:
        img = img[..., rng.permutation(3)]
    return np.clip(img, 0, 255)

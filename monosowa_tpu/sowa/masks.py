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


class FlaxMask2FormerBackend:
    """TPU-served instance segmentation (``MaskBackend``).

    Runs the pure-JAX Mask2Former port (``monosowa_tpu.models.mask2former``,
    differentially tested against transformers' torch implementation) and
    applies the reference's detection contract (filtering.py:97-110): keep
    masks whose class probability for the configured car-family labels
    exceeds ``score_threshold`` (0.7 in the reference).  Per-query score =
    P(car class) from the softmaxed class logits (null class dropped);
    masks are the sigmoid(>0.5) binarized mask logits resampled to the
    input resolution.
    """

    IMAGENET01_MEAN = (0.485, 0.456, 0.406)
    IMAGENET01_STD = (0.229, 0.224, 0.225)

    def __init__(self, params, cfg, car_label_ids=(2,),
                 score_threshold: float = SCORE_THRESHOLD,
                 input_hw=(384, 1280)):
        import functools

        import jax

        from monosowa_tpu.models.mask2former import mask2former_forward

        self.cfg = cfg
        self.car_label_ids = tuple(car_label_ids)
        self.score_threshold = float(score_threshold)
        self.input_hw = (input_hw[0] // 32 * 32, input_hw[1] // 32 * 32)
        self._fwd = jax.jit(functools.partial(mask2former_forward, params,
                                              cfg=cfg))

    def _encode(self, image: np.ndarray) -> np.ndarray:
        import cv2

        img = cv2.resize(np.asarray(image),
                         (self.input_hw[1], self.input_hw[0]),
                         interpolation=cv2.INTER_LINEAR)
        img = img.astype(np.float32) / 255.0
        return (img - np.asarray(self.IMAGENET01_MEAN, np.float32)) \
            / np.asarray(self.IMAGENET01_STD, np.float32)

    def predict_masks_multi(self, image: np.ndarray, label_groups):
        """ONE forward, several class filters: for each label-id group
        return (masks, scores) of the queries whose max class probability
        over the group clears the threshold.  Used for the car classes and
        (extract_pedestrians) the person class without a second inference
        pass."""
        import cv2
        import jax.nn
        import jax.numpy as jnp

        h, w = image.shape[:2]
        x = self._encode(image)[None]
        classes, masks = self._fwd(jnp.asarray(x))
        probs = np.asarray(jax.nn.softmax(classes[0].astype(jnp.float32),
                                          -1))[:, :-1]   # drop null class
        mask_logits = np.asarray(masks[0])
        out = []
        for ids in label_groups:
            prob = probs[:, list(ids)].max(-1)
            keep = np.flatnonzero(prob > self.score_threshold)
            g_masks, g_scores = [], []
            for q in keep:
                m = cv2.resize(mask_logits[q], (w, h),
                               interpolation=cv2.INTER_LINEAR)
                m = m > 0.0  # sigmoid(x) > 0.5 <=> x > 0
                if m.any():
                    g_masks.append(m)
                    g_scores.append(float(prob[q]))
            out.append((g_masks, g_scores))
        return out

    def predict_masks_scores(self, image: np.ndarray):
        return self.predict_masks_multi(image, [self.car_label_ids])[0]

    def predict_masks(self, image: np.ndarray) -> List[np.ndarray]:
        return self.predict_masks_scores(image)[0]


class FlaxSamRefineBackend:
    """TPU-served SAM box-prompted refinement (``MaskRefineBackend``).

    Runs the pure-JAX SAM port (``monosowa_tpu.models.sam``, differentially
    tested against transformers' torch ``SamModel``) with the reference's
    usage pattern: one box prompt per detection, ``multimask_output=False``
    (filtering.py:133-146).  Pre/post-processing mirrors the SAM predictor:
    longest side resized to the model's input size, ImageNet-normalized,
    zero-padded square; low-res mask logits upsampled (torch-exact
    bilinear), cropped to the resized region, resampled to the original
    resolution and thresholded at 0.
    """

    IMAGENET01_MEAN = (0.485, 0.456, 0.406)
    IMAGENET01_STD = (0.229, 0.224, 0.225)

    def __init__(self, params, cfg, max_boxes: int = 16):
        import functools

        import jax

        from monosowa_tpu.models.sam import sam_predict_boxes

        self.cfg = cfg
        self.max_boxes = int(max_boxes)
        self._fwd = jax.jit(functools.partial(sam_predict_boxes, params,
                                              cfg=cfg))

    def _encode(self, image: np.ndarray):
        import cv2

        s = self.cfg.vision.image_size
        h, w = image.shape[:2]
        scale = s / max(h, w)
        nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
        img = cv2.resize(np.asarray(image), (nw, nh),
                         interpolation=cv2.INTER_LINEAR)
        img = img.astype(np.float32) / 255.0
        img = (img - np.asarray(self.IMAGENET01_MEAN, np.float32)) \
            / np.asarray(self.IMAGENET01_STD, np.float32)
        padded = np.zeros((s, s, 3), np.float32)
        padded[:nh, :nw] = img
        return padded, (nh, nw), scale

    def refine(self, image: np.ndarray, boxes: np.ndarray
               ) -> List[np.ndarray]:
        import cv2
        import jax.numpy as jnp

        from monosowa_tpu.ops.resize import resize_bilinear_torch

        h, w = image.shape[:2]
        padded, (nh, nw), scale = self._encode(image)
        n = len(boxes)
        # fixed-width prompt batch: avoids one XLA compile per box count
        nb = min(self.max_boxes, max(n, 1))
        out: List[np.ndarray] = []
        for start in range(0, max(n, 1), nb):
            chunk = np.zeros((nb, 4), np.float32)
            take = min(nb, n - start) if n else 0
            if take:
                chunk[:take] = np.asarray(
                    boxes[start:start + take], np.float32) * scale
            masks, _ = self._fwd(jnp.asarray(padded)[None],
                                 jnp.asarray(chunk)[None])
            low = masks[0, :take, 0]                       # (take, 4g, 4g)
            s = self.cfg.vision.image_size
            up = resize_bilinear_torch(low[..., None], (s, s))[..., 0]
            up = np.asarray(up[:, :nh, :nw])
            for m in up:
                full = cv2.resize(m, (w, h),
                                  interpolation=cv2.INTER_LINEAR)
                out.append(full > 0.0)
            if not n:
                break
        return out


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

"""Waymo 2D mask tracking across stitched panoramas.

Behavioral contract (pseudo_label_generator/3d/scripts/tracker_ODTrack.py):

* single-object tracking of each detected mask across panorama frames via
  an external tracker (ODTrack, dynamically imported in the reference —
  here the pluggable ``SingleObjectTracker`` protocol, with a
  template-matching fallback that needs no checkpoint);
* tracked boxes match back to per-frame detectron masks by IoU >= 0.25
  (perform_tracking :60-155);
* overlapping detections are filtered by IoU (filter_overlapping_detections
  :414-462);
* camera-switch logic maps panorama coordinates back to the source camera
  (check_for_image_switch :304-375) — represented here by the panorama
  x-extent bookkeeping in ``camera_of_box``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Protocol, Sequence

import numpy as np


def box_iou(a: np.ndarray, b: np.ndarray) -> float:
    """xyxy IoU."""
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = ((a[2] - a[0]) * (a[3] - a[1])
          + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / ua if ua > 0 else 0.0


class SingleObjectTracker(Protocol):
    def init(self, image: np.ndarray, box_xywh: Sequence[float]) -> None: ...

    def track(self, image: np.ndarray) -> Sequence[float]:
        """-> box xywh in the new frame."""
        ...


class TemplateMatchTracker:
    """Checkpoint-free fallback tracker (normalized cross-correlation over a
    search window).  Stands in for ODTrack when its weights are absent; the
    interface contract is what the pipeline depends on."""

    def __init__(self, search_margin: float = 1.0):
        self.search_margin = search_margin
        self._tmpl = None
        self._box = None

    def init(self, image: np.ndarray, box_xywh: Sequence[float]) -> None:
        x, y, w, h = (int(v) for v in box_xywh)
        gray = image.mean(-1) if image.ndim == 3 else image
        self._tmpl = gray[y:y + h, x:x + w].astype(np.float32)
        self._box = [x, y, w, h]

    def track(self, image: np.ndarray):
        import cv2

        gray = (image.mean(-1) if image.ndim == 3 else image).astype(
            np.float32)
        x, y, w, h = self._box
        mx = int(w * self.search_margin)
        my = int(h * self.search_margin)
        x0, y0 = max(x - mx, 0), max(y - my, 0)
        x1 = min(x + w + mx, gray.shape[1])
        y1 = min(y + h + my, gray.shape[0])
        window = gray[y0:y1, x0:x1]
        if (window.shape[0] < self._tmpl.shape[0]
                or window.shape[1] < self._tmpl.shape[1]):
            return self._box
        # TM_SQDIFF stays well-defined for low-texture templates (normalized
        # ccoeff divides by template variance)
        res = cv2.matchTemplate(window, self._tmpl, cv2.TM_SQDIFF)
        _, _, loc, _ = cv2.minMaxLoc(res)
        self._box = [x0 + loc[0], y0 + loc[1], w, h]
        return self._box


class FlaxViTTrackerBackend:
    """TPU-served one-stream ViT tracker (``SingleObjectTracker``).

    Runs the pure-JAX OSTrack/ODTrack-family network
    (``monosowa_tpu.models.vit_tracker``) with ODTrack-style track-token
    propagation across frames.  Crop convention (the OSTrack one ODTrack
    inherits): template = 2x box side, search = 4x box side, both square
    crops of side ``factor * sqrt(w*h)`` zero-padded at image borders.
    """

    IMAGENET01_MEAN = (0.485, 0.456, 0.406)
    IMAGENET01_STD = (0.229, 0.224, 0.225)

    def __init__(self, params, cfg, template_factor: float = 2.0,
                 search_factor: float = 4.0):
        import functools

        import jax

        from monosowa_tpu.models.vit_tracker import tracker_forward

        self.cfg = cfg
        self.template_factor = template_factor
        self.search_factor = search_factor
        self._params = params
        self._fwd = jax.jit(functools.partial(tracker_forward, params,
                                              cfg=cfg))
        self._template = None
        self._track_tokens = None
        self._box = None  # xywh

    def _crop(self, image: np.ndarray, cx: float, cy: float, side: float,
              out_size: int) -> np.ndarray:
        import cv2

        h, w = image.shape[:2]
        x0, y0 = int(round(cx - side / 2)), int(round(cy - side / 2))
        x1, y1 = int(round(cx + side / 2)), int(round(cy + side / 2))
        pad = np.zeros((y1 - y0, x1 - x0, 3), np.uint8)
        sx0, sy0 = max(x0, 0), max(y0, 0)
        sx1, sy1 = min(x1, w), min(y1, h)
        if sx1 > sx0 and sy1 > sy0:
            pad[sy0 - y0:sy1 - y0, sx0 - x0:sx1 - x0] = \
                image[sy0:sy1, sx0:sx1]
        crop = cv2.resize(pad, (out_size, out_size),
                          interpolation=cv2.INTER_LINEAR)
        crop = crop.astype(np.float32) / 255.0
        return (crop - np.asarray(self.IMAGENET01_MEAN, np.float32)) \
            / np.asarray(self.IMAGENET01_STD, np.float32)

    def init(self, image: np.ndarray, box_xywh: Sequence[float]) -> None:
        x, y, w, h = (float(v) for v in box_xywh)
        side = self.template_factor * float(np.sqrt(max(w * h, 1.0)))
        self._template = self._crop(image, x + w / 2, y + h / 2, side,
                                    self.cfg.template_size)
        self._track_tokens = np.asarray(self._params["track_token"],
                                        np.float32)
        self._box = [x, y, w, h]

    def track(self, image: np.ndarray):
        import jax.numpy as jnp

        x, y, w, h = self._box
        cx, cy = x + w / 2, y + h / 2
        side = self.search_factor * float(np.sqrt(max(w * h, 1.0)))
        search = self._crop(image, cx, cy, side, self.cfg.search_size)
        box, _, tok = self._fwd(jnp.asarray(self._template)[None],
                                jnp.asarray(search)[None],
                                jnp.asarray(self._track_tokens
                                            ).reshape(1, -1,
                                                      self.cfg.hidden_size))
        self._track_tokens = np.asarray(tok[0])[None]
        bcx, bcy, bw, bh = (float(v) for v in np.asarray(box[0]))
        # normalized search-crop coords -> image coords
        ox, oy = cx - side / 2, cy - side / 2
        nw, nh = bw * side, bh * side
        nx = ox + bcx * side - nw / 2
        ny = oy + bcy * side - nh / 2
        self._box = [nx, ny, nw, nh]
        return self._box


def make_odtrack(model: str = "baseline_large"):
    """Load the external ODTrack repo when available (tracker_ODTrack.py
    imports it dynamically from paths.odtrack_path)."""
    raise RuntimeError(
        "ODTrack weights/repo not available offline; use "
        "TemplateMatchTracker or plug a SingleObjectTracker implementation")


@dataclasses.dataclass
class TrackedObject:
    track_id: int
    boxes: List[Optional[np.ndarray]]     # per-frame xyxy or None
    matched_mask_idx: List[Optional[int]]


def filter_overlapping_detections(boxes: List[np.ndarray],
                                  iou_threshold: float = 0.25
                                  ) -> List[int]:
    """Keep-first filtering of overlapping detections (:414-462)."""
    keep: List[int] = []
    for i, b in enumerate(boxes):
        if all(box_iou(b, boxes[j]) < iou_threshold for j in keep):
            keep.append(i)
    return keep


def track_masks(frames: Sequence[np.ndarray],
                initial_boxes: Sequence[np.ndarray],
                per_frame_mask_boxes: Sequence[Sequence[np.ndarray]],
                tracker_factory=TemplateMatchTracker,
                match_iou: float = 0.25) -> List[TrackedObject]:
    """Track each initial box through the frames, matching back to detected
    mask boxes by IoU >= match_iou (perform_tracking_of_single :201-280)."""
    out = []
    for tid, box0 in enumerate(initial_boxes):
        tracker = tracker_factory()
        x0, y0, x1, y1 = box0
        tracker.init(frames[0], [x0, y0, x1 - x0, y1 - y0])
        boxes: List[Optional[np.ndarray]] = [np.asarray(box0, float)]
        matched: List[Optional[int]] = [None]
        for f in range(1, len(frames)):
            x, y, w, h = tracker.track(frames[f])
            cur = np.array([x, y, x + w, y + h], float)
            boxes.append(cur)
            best, best_iou = None, match_iou
            for mi, mb in enumerate(per_frame_mask_boxes[f]):
                iou = box_iou(cur, mb)
                if iou >= best_iou:
                    best, best_iou = mi, iou
            matched.append(best)
        out.append(TrackedObject(tid, boxes, matched))
    return out


def camera_of_box(box_xyxy: np.ndarray, pano_width: int,
                  cam_w: int = 1920, width_pad: int = 750) -> int:
    """Which source camera a panorama box belongs to (-1 left, 0 front,
    1 right) — the coordinate bookkeeping behind check_for_image_switch."""
    cx = (box_xyxy[0] + box_xyxy[2]) / 2
    front_x0 = (pano_width - cam_w) / 2
    if cx < front_x0:
        return -1
    if cx >= front_x0 + cam_w:
        return 1
    return 0

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

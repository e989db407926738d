"""Candidate extraction: instance masks + per-frame points -> car centroids.

Behavioral contract (pseudo_label_generator/3d/scripts/loader.py:2802-2922,
get_car_locations_from_img):

per mask: shrink the mask by ``2 + sqrt(area)//10`` erosion iterations to
avoid boundary outliers; gather points projecting into the shrunk mask (with
x1-erosion and no-erosion fallbacks when fewer than the
moving_detection_threshold points survive); take the per-axis *median* as
the center; keep points within filter_diameter (4 m) of the center in the
ground plane and re-take the median; drop pseudo-lidar candidates beyond
max_distance (75 m); transform the center into the reference frame and keep
only candidates in front of the camera; the candidate's stored point set is
re-gathered with the *full* mask, circle-filtered, and transformed to the
reference frame.

Projection matches project_lidar_points (loader.py:3354-3376): rounded pixel
coordinates, cropped to the image.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np
import scipy.ndimage


@dataclasses.dataclass(frozen=True)
class CandidateConfig:
    moving_detection_threshold: int = 2   # filtering.moving_detection_threshold
    filter_diameter: float = 4.0          # filtering.filter_diameter
    max_distance_pseudo_lidar: float = 75.0
    use_pseudo_lidar: bool = True


def project_points(points_cam: np.ndarray, p2: np.ndarray,
                   img_hw) -> np.ndarray:
    """(N, 3) camera points -> (N, 6) [x y z 1? u v]-style array (cols), with
    rounded pixel coords, cropped to the image and to z > 0."""
    pts = np.asarray(points_cam, np.float64)
    hom = np.hstack([pts, np.ones((pts.shape[0], 1))])
    proj = hom @ np.asarray(p2).T            # (N, 3)
    keep_z = proj[:, 2] > 1e-6
    uv = np.rint(proj[:, :2] / np.maximum(proj[:, 2:3], 1e-6))
    h, w = img_hw
    keep = (keep_z & (uv[:, 0] >= 0) & (uv[:, 0] < w)
            & (uv[:, 1] >= 0) & (uv[:, 1] < h))
    return np.hstack([pts[keep], uv[keep]]), keep


def erode_mask(mask: np.ndarray, iterations: int) -> np.ndarray:
    """Erosion implemented exactly like the reference: invert -> binary
    dilation (3x3 cross, ``iterations`` times) -> invert."""
    if iterations <= 0:
        return mask
    inv = np.invert(mask)
    inv = scipy.ndimage.binary_dilation(inv, iterations=iterations)
    return np.invert(inv)


def _points_in_mask(pts_uv: np.ndarray, mask: np.ndarray) -> np.ndarray:
    u = pts_uv[:, 3].astype(int)
    v = pts_uv[:, 4].astype(int)
    return pts_uv[mask[v, u], :3]


def _median3(pts: np.ndarray) -> np.ndarray:
    return np.median(pts, axis=0)


def _circle_filter(pts: np.ndarray, center: np.ndarray,
                   diameter: float) -> np.ndarray:
    d = np.hypot(pts[:, 0] - center[0], pts[:, 2] - center[2])
    return pts[d < diameter]


def extract_candidates(points_cam: np.ndarray, p2: np.ndarray,
                       img_hw, masks: Sequence[np.ndarray],
                       t_cur_to_ref: np.ndarray,
                       cfg: CandidateConfig = CandidateConfig()) -> dict:
    """One frame -> candidate dict for the tracker (lomm.greedy_track).

    points_cam: (N, 3) this frame's (pseudo-)LiDAR in its own camera frame;
    masks: list of (H, W) bool instance masks; t_cur_to_ref: (4, 4).
    Returns {"locations": (K, 3) ref-frame centroids, "points": [(Ni, 3)
    ref-frame points], "masks": [mask]}.
    """
    proj, _ = project_points(points_cam, p2, img_hw)
    locations, pts_out, masks_out = [], [], []
    rot, tr = t_cur_to_ref[:3, :3], t_cur_to_ref[:3, 3]

    for mask in masks:
        area = int(np.count_nonzero(mask))
        if area == 0:
            continue
        struct = int(2 + np.sqrt(area) // 10)
        core = _points_in_mask(proj, erode_mask(mask, struct))
        if core.shape[0] < cfg.moving_detection_threshold:
            core = _points_in_mask(proj, erode_mask(mask, 1))
            if core.shape[0] < cfg.moving_detection_threshold:
                core = _points_in_mask(proj, mask)
                if core.shape[0] < cfg.moving_detection_threshold:
                    continue
        center = _median3(core)
        core = _circle_filter(core, center, cfg.filter_diameter)
        if core.shape[0] > 0:
            center = _median3(core)
        if cfg.use_pseudo_lidar and np.linalg.norm(center) > \
                cfg.max_distance_pseudo_lidar:
            continue
        center_ref = rot @ center + tr
        if center_ref[2] <= 0.0:
            continue
        # the stored point set comes from the FULL mask (loader.py:2878-2896)
        full = _points_in_mask(proj, mask)
        if full.shape[0] == 0:
            continue
        fc = _median3(full)
        full = _circle_filter(full, fc, cfg.filter_diameter)
        full_ref = full @ rot.T + tr
        if full_ref.shape[0] < cfg.moving_detection_threshold:
            continue
        locations.append(center_ref)
        pts_out.append(full_ref)
        masks_out.append(mask)

    if not locations:
        return {"locations": np.zeros((0, 3)), "points": [], "masks": []}
    return {"locations": np.stack(locations), "points": pts_out,
            "masks": masks_out}

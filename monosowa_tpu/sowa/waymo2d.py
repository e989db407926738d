"""Waymo raw-camera pipeline stages: pair stitching, 2D mask tracking across
panoramas, and un-warping tracked masks back to per-camera frames.

Behavioral contract (reference, pseudo_label_generator/3d/scripts):

* 5 cameras per frame in "slot" order [SIDE_LEFT, FRONT_LEFT, FRONT,
  FRONT_RIGHT, SIDE_RIGHT] (get_imgs, stitching.py:279-312; waymo camera
  ids 4/2/1/3/5).  Side cameras (886 px tall) are zero-padded at the TOP
  to the front height (stitching.py:294-296).
* Four stitched PAIR canvases per frame (stitching.py:80-131): for z=0,1
  the left image is warped by H into the canvas and the right image is
  pasted un-warped at the right slot; for z=2,3 mirrored.  Canvas shape
  (cam_h + height_pad, 2*cam_w + width_pad) with the paste slot offset
  vertically by height_pad/2 (config image_stitching.*: 100 / 750).
* Per-sequence best homography per pair: every frame contributes a RANSAC
  candidate; each candidate is scored by total inliers over ALL frames'
  matches and the best one is frozen for the sequence.  (Deviation: the
  reference's find_the_best_homo, stitching.py:153-216, effectively scores
  each candidate only against its own frame's matches — its frame loop
  never indexes the match set; all-frames scoring is the intended
  behavior and is what this rebuild does.)
* Mask tracking (tracker_ODTrack.py:60-198): detection masks on each pair
  canvas; every not-yet-matched mask seeds a single-object track that runs
  to the end of the sequence with camera-switch logic
  (check_for_image_switch :304-375: 2 consecutive off-slot frames switch
  the pair index, 3-frame grace after a switch, track break on
  iou < 0.5 && center jump > 100); tracked boxes re-associate to detected
  masks by xywh IoU > 0.25 (:104-115).
* Un-warping (filtering.py:405-425, loader.py:701-754): a pair-canvas mask
  maps to BOTH cameras of the pair — the fixed slot by slicing, the warped
  camera by inverse homography — and the camera with the larger mask area
  claims the observation; side-camera masks keep only the bottom side_h
  rows (the top rows are padding).
* Point gathering (extract_lidar_features, filtering.py:164-403): the fused
  lidar is (N, 6) = xyz (vehicle frame) + camera id + (u, v) pixel; a
  track's points in a frame are the union of points whose projection lands
  in either un-warped camera mask of the pair.

The homography/RANSAC math lives in sowa.stitching (numpy, tested); the
matcher and single-object tracker are pluggable backends (sowa.stitching
MatcherBackend / sowa.tracker2d SingleObjectTracker — EfficientLoFTR and
the ViT tracker are the TPU-served implementations, ORB/template-matching
the checkpoint-free fallbacks).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from monosowa_tpu.sowa import stitching as stitch_mod
from monosowa_tpu.sowa.lomm import Track
from monosowa_tpu.sowa.tracker2d import TemplateMatchTracker

# camera slot -> waymo camera id (FRONT=1, FRONT_LEFT=2, FRONT_RIGHT=3,
# SIDE_LEFT=4, SIDE_RIGHT=5); slots follow get_imgs order
CAM_SLOT_TO_WAYMO_ID = (4, 2, 1, 3, 5)

# pair z -> (left slot, right slot, left_to_right) per stitching.py:80-96
PAIRS = ((0, 1, True), (1, 2, True), (2, 3, False), (3, 4, False))

# vehicle -> camera-like axis permutation (waymo_to_kitti_projected.py:235:
# R = [[0,-1,0],[0,0,-1],[1,0,0]]) so the standard KITTI-frame fitting
# pipeline runs unchanged on waymo points
VEHICLE_TO_CAM = np.array([[0.0, -1.0, 0.0],
                           [0.0, 0.0, -1.0],
                           [1.0, 0.0, 0.0]])


@dataclasses.dataclass(frozen=True)
class PairLayout:
    """Pair-canvas geometry (config image_stitching.* + waymo image sizes).

    Defaults are the production Waymo values; tests shrink them."""

    cam_h: int = 1280
    cam_w: int = 1920
    side_h: int = 886          # SIDE_* camera height before top-padding
    height_pad: int = 100
    width_pad: int = 750

    @property
    def canvas_hw(self) -> Tuple[int, int]:
        return (self.cam_h + self.height_pad,
                2 * self.cam_w + self.width_pad)

    @property
    def paste_y0(self) -> int:
        return self.height_pad // 2

    def paste_slice(self, left_to_right: bool):
        """Canvas region of the un-warped (pasted) camera."""
        ys = slice(self.paste_y0, self.paste_y0 + self.cam_h)
        xs = (slice(self.canvas_hw[1] - self.cam_w, self.canvas_hw[1])
              if left_to_right else slice(0, self.cam_w))
        return ys, xs


def pad_side_image(img: np.ndarray, layout: PairLayout) -> np.ndarray:
    """Zero-pad a side camera image at the TOP to the front-camera height
    (stitching.py:294-296)."""
    if img.shape[0] >= layout.cam_h:
        return img
    pad = layout.cam_h - img.shape[0]
    width = [(pad, 0)] + [(0, 0)] * (img.ndim - 1)
    return np.pad(img, width)


def stitch_pair(img_a: np.ndarray, img_b: np.ndarray, homo: np.ndarray,
                left_to_right: bool, layout: PairLayout) -> np.ndarray:
    """One stitched pair canvas (stitching.py:112-130): the warped camera
    (left image for left_to_right pairs, right otherwise) fills the canvas
    via H; the other camera overwrites its fixed slot."""
    import cv2

    h, w = layout.canvas_hw
    src = img_a if left_to_right else img_b
    fixed = img_b if left_to_right else img_a
    if homo is None:
        # a pair with <4 matches over the whole sequence has no homography
        # (estimate_pair_homographies NaN sentinel) — the canvas then holds
        # only the pasted fixed camera, mirroring the None guards in
        # check_for_image_switch
        canvas = np.zeros((h, w) + src.shape[2:], src.dtype)
    else:
        canvas = cv2.warpPerspective(
            src, np.asarray(homo, np.float64), (w, h))
        if canvas.ndim < src.ndim:    # cv2 drops trailing singleton channels
            canvas = canvas[..., None]
    ys, xs = layout.paste_slice(left_to_right)
    canvas[ys, xs] = fixed
    return canvas


def unwarp_pair_mask(mask: np.ndarray, homo: np.ndarray, left_to_right: bool,
                     layout: PairLayout) -> Tuple[np.ndarray, np.ndarray]:
    """Pair-canvas mask -> (warped-camera mask, fixed-camera mask), both in
    padded camera coords (inverse_of_mask_img01/23, filtering.py:405-425).
    The reference inverse-warps the FULL canvas mask (fixed slot included)
    and crops to the camera window."""
    import cv2

    ys, xs = layout.paste_slice(left_to_right)
    fixed_mask = np.asarray(mask, bool)[ys, xs]
    if homo is None:
        return np.zeros((layout.cam_h, layout.cam_w), bool), fixed_mask
    inv = np.linalg.inv(np.asarray(homo, np.float64))
    warped = cv2.warpPerspective(
        np.asarray(mask, np.float32), inv,
        (mask.shape[1], mask.shape[0]))[:layout.cam_h, :layout.cam_w]
    return warped > 0.5, fixed_mask


def pano_mask_to_camera(mask: np.ndarray, pair_idx: int,
                        homos: Sequence[np.ndarray], layout: PairLayout
                        ) -> Tuple[Optional[np.ndarray], int]:
    """Pair-canvas mask -> (camera-frame mask, camera SLOT) — the larger
    un-warped area claims the observation (convert_stitched_img_to_normal,
    loader.py:701-754).  Side-camera masks (slots 0/4) are cropped to the
    bottom side_h rows."""
    left_slot, right_slot, ltr = PAIRS[pair_idx]
    warped_m, fixed_m = unwarp_pair_mask(mask, homos[pair_idx], ltr, layout)
    warped_slot = left_slot if ltr else right_slot
    fixed_slot = right_slot if ltr else left_slot
    if warped_slot in (0, 4):
        warped_m = warped_m[-layout.side_h:, :]
    if warped_m.sum() > fixed_m.sum():
        return warped_m, warped_slot
    return fixed_m, fixed_slot


def pano_mask_to_both_cameras(mask: np.ndarray, pair_idx: int,
                              homos: Sequence[np.ndarray],
                              layout: PairLayout
                              ) -> List[Tuple[np.ndarray, int]]:
    """Pair-canvas mask -> BOTH camera-frame masks [(mask, slot), ...]
    (extract_lidar_features unions in-mask points from the two cameras of
    the pair, filtering.py:164-280).  Side-camera masks are cropped to the
    bottom side_h rows; empty masks are dropped."""
    left_slot, right_slot, ltr = PAIRS[pair_idx]
    warped_m, fixed_m = unwarp_pair_mask(mask, homos[pair_idx], ltr, layout)
    warped_slot = left_slot if ltr else right_slot
    fixed_slot = right_slot if ltr else left_slot
    if warped_slot in (0, 4):
        warped_m = warped_m[-layout.side_h:, :]
    if fixed_slot in (0, 4):
        fixed_m = fixed_m[-layout.side_h:, :]
    return [(m, s) for m, s in
            ((warped_m, warped_slot), (fixed_m, fixed_slot)) if m.any()]


def estimate_pair_homographies(get_imgs, n_frames: int,
                               matcher=None,
                               layout: PairLayout = PairLayout(),
                               threshold: float = 3.0,
                               iterations: int = 500
                               ) -> List[Optional[np.ndarray]]:
    """Per-sequence best homography for each of the 4 pairs
    (perform_img_stitching + find_the_best_homo): each frame contributes a
    candidate H; candidates are scored by total inliers over every frame's
    matches; the best per pair is frozen for the sequence.

    ``get_imgs(i)`` -> list of 5 slot-ordered images (side images may be
    un-padded; they are padded here).  Warp direction is always
    side->canvas: for left_to_right pairs H maps the LEFT image, otherwise
    the RIGHT image, composed with the paste offset of the fixed slot so
    the stitched pair lines up (reference homographies already include the
    canvas placement — get_homography_all matches warped corner coords)."""
    matcher = matcher or stitch_mod.OrbMatcherBackend()
    per_pair_matches: List[List[Tuple[np.ndarray, np.ndarray]]] = [
        [] for _ in PAIRS]
    for i in range(n_frames):
        imgs = [pad_side_image(np.asarray(im), layout) for im in get_imgs(i)]
        for z, (a, b, ltr) in enumerate(PAIRS):
            src = imgs[a] if ltr else imgs[b]
            dst = imgs[b] if ltr else imgs[a]
            kp_src, kp_dst = matcher.match(src, dst)
            if len(kp_src) >= 4:
                # lift destination keypoints into canvas coords (the fixed
                # slot's placement) so H maps src -> canvas directly
                ys, xs = layout.paste_slice(ltr)
                kp_dst = kp_dst + np.array([xs.start, ys.start], float)
                per_pair_matches[z].append((kp_src, kp_dst))
    out: List[Optional[np.ndarray]] = []
    for z in range(len(PAIRS)):
        if not per_pair_matches[z]:
            out.append(None)
            continue
        out.append(stitch_mod.select_best_homography(
            per_pair_matches[z], threshold, iterations))
    return out


def stitch_frame(imgs: Sequence[np.ndarray], homos: Sequence[np.ndarray],
                 layout: PairLayout = PairLayout()) -> List[np.ndarray]:
    """All 4 pair canvases for one frame's 5 slot-ordered images."""
    padded = [pad_side_image(np.asarray(im), layout) for im in imgs]
    return [stitch_pair(padded[a], padded[b], homos[z], ltr, layout)
            for z, (a, b, ltr) in enumerate(PAIRS)]


# ---------------------------------------------------------------------------
# tracking across pair canvases (tracker_ODTrack.py)
# ---------------------------------------------------------------------------

def _iou_xywh(b1, b2) -> float:
    """Reference IoU with the +1 pixel convention (compute_iou :283-302)."""
    x1, y1, w1, h1 = b1
    x2, y2, w2, h2 = b2
    xa, ya = max(x1, x2), max(y1, y2)
    xb, yb = min(x1 + w1, x2 + w2), min(y1 + h1, y2 + h2)
    inter = max(0, xb - xa + 1) * max(0, yb - ya + 1)
    return inter / float(w1 * h1 + w2 * h2 - inter)


def mask_bbox_xywh(mask: np.ndarray) -> Optional[np.ndarray]:
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return None
    return np.array([xs.min(), ys.min(), xs.max() - xs.min() + 1,
                     ys.max() - ys.min() + 1], float)


def check_for_image_switch(bbox_xywh, pair_idx: int, rdy: int, switched: int,
                           homos: Sequence[np.ndarray],
                           layout: PairLayout,
                           min_pixels: int = 50
                           ) -> Tuple[int, int, int]:
    """Camera-switch logic (check_for_image_switch :304-375), numpy port.

    Builds the box mask on the pair canvas and tests which slot the object
    occupies; 2 consecutive off-slot frames trigger the switch, which then
    holds for a 3-frame grace period (switched=3)."""
    import cv2

    h, w = layout.canvas_hw
    x, y, bw, bh = (int(v) for v in bbox_xywh)
    m = np.zeros((h, w), np.float32)
    m[max(y, 0):y + bh, max(x, 0):x + bw] = 1.0
    y0 = layout.paste_y0
    cw, ch = layout.cam_w, layout.cam_h

    def warp_region(region, homo):
        full = np.zeros((h, w), np.float32)
        full[:region.shape[0], :region.shape[1]] = region
        return cv2.warpPerspective(full, np.asarray(homo, np.float64),
                                   (w, h))

    if pair_idx == 0:
        # does the fixed (front-left) part land in pair 1's canvas?
        region = m[y0:y0 + ch, -cw:]
        if homos[1] is not None and (
                warp_region(region, homos[1])[:, -cw:].sum() > min_pixels):
            rdy += 1
            if rdy >= 2:
                return 1, 0, 3
        else:
            rdy = 0
    elif pair_idx == 1:
        right = m[:, -cw:]
        if right.sum() > min_pixels:
            idx = np.nonzero(right)
            if np.mean(idx[1]) > cw / 2:
                rdy += 1
                if rdy >= 2:
                    return 2, 0, 3
            else:
                rdy = 0
        else:
            rdy += 1
            if rdy >= 2:
                return 0, 0, 3
    elif pair_idx == 2:
        left = m[:, :cw]
        if left.sum() > min_pixels:
            idx = np.nonzero(left)
            if np.mean(idx[1]) <= cw / 2:
                rdy += 1
                if rdy >= 2:
                    return 1, 0, 3
            else:
                rdy = 0
        else:
            rdy += 1
            if rdy >= 2:
                return 3, 0, 3
    else:
        region = m[y0:y0 + ch, :cw]
        if homos[2] is not None and (
                warp_region(region, homos[2])[:, :cw].sum() > min_pixels):
            rdy += 1
            if rdy >= 2:
                return 2, 0, 3
        else:
            rdy = 0
    return pair_idx, rdy, switched


def track_single(stitched: Sequence[Sequence[np.ndarray]],
                 init_bbox: np.ndarray, frame_start: int, pair_start: int,
                 homos: Sequence[np.ndarray], layout: PairLayout,
                 tracker_factory=TemplateMatchTracker
                 ) -> Tuple[List[np.ndarray], List[int]]:
    """Track one object from (frame_start, pair_start) to the sequence end
    (perform_tracking_of_single :201-280): per-frame tracker updates with
    camera-switch bookkeeping and the iou/center-jump break rule."""
    tracker = tracker_factory()
    tracker.init(stitched[frame_start][pair_start], list(init_bbox))
    boxes = [np.asarray(init_bbox, float)]
    pair_idxs = [pair_start]
    pair_idx, rdy, switched = pair_start, 0, 0
    old_bbox = np.asarray(init_bbox, float)
    old_center = old_bbox[:2] + old_bbox[2:] / 2
    old_diff = np.zeros(2)
    for f in range(frame_start + 1, len(stitched)):
        if switched > 0:
            switched -= 1
        pred = np.asarray(
            tracker.track(stitched[f][pair_idx]), float)
        pair_idx, rdy, switched = check_for_image_switch(
            pred, pair_idx, rdy, switched, homos, layout)
        new_center = pred[:2] + pred[2:] / 2
        new_diff = new_center - old_center
        if switched == 0:
            iou = _iou_xywh(old_bbox, pred)
            jump = (np.linalg.norm(new_diff - old_diff)
                    if np.any(old_diff) else 0.0)
            old_bbox, old_center, old_diff = pred, new_center, new_diff
            if iou < 0.5 and jump > 100:
                break
        else:
            old_bbox, old_center, old_diff = pred, new_center, new_diff
        boxes.append(pred)
        pair_idxs.append(pair_idx)
    return boxes, pair_idxs


def track_pair_sequence(stitched: Sequence[Sequence[np.ndarray]],
                        det_masks: Sequence[Sequence[Sequence[np.ndarray]]],
                        homos: Sequence[np.ndarray],
                        layout: PairLayout = PairLayout(),
                        tracker_factory=TemplateMatchTracker,
                        match_iou: float = 0.25
                        ) -> List[List[Tuple[int, int, int]]]:
    """The full perform_tracking flow (:60-155): every unmatched detection
    seeds a track; tracked boxes re-associate to detections by IoU >
    ``match_iou``; returns per-car observation lists of
    (frame_idx, pair_idx, mask_idx) (the reference's masks_for_car_ids
    rows [0, frame, img, mask] minus the unused SAM tag)."""
    n_frames = len(stitched)
    det_bboxes = [[[mask_bbox_xywh(m) for m in det_masks[f][z]]
                   for z in range(len(PAIRS))] for f in range(n_frames)]
    matched = [[[False] * len(det_masks[f][z])
                for z in range(len(PAIRS))] for f in range(n_frames)]
    cars: List[List[Tuple[int, int, int]]] = []
    for f0 in range(n_frames):
        for z0 in range(len(PAIRS)):
            for m0 in range(len(det_masks[f0][z0])):
                if matched[f0][z0][m0] or det_bboxes[f0][z0][m0] is None:
                    continue
                matched[f0][z0][m0] = True
                boxes, pair_idxs = track_single(
                    stitched, det_bboxes[f0][z0][m0], f0, z0, homos,
                    layout, tracker_factory)
                obs = [(f0, z0, m0)]
                for k in range(1, len(boxes)):
                    f, z = f0 + k, pair_idxs[k]
                    best, best_iou = None, match_iou
                    for mi, cand in enumerate(det_bboxes[f][z]):
                        if cand is None or matched[f][z][mi]:
                            continue
                        iou = _iou_xywh(boxes[k], cand)
                        if iou > best_iou:
                            best, best_iou = mi, iou
                    if best is not None:
                        matched[f][z][best] = True
                        obs.append((f, z, best))
                cars.append(obs)
    return cars


# ---------------------------------------------------------------------------
# tracked pano masks -> per-frame 3D points -> lomm Tracks
# ---------------------------------------------------------------------------

def gather_mask_points(mask_cam: np.ndarray, cam_slot: int,
                       fused_lidar: np.ndarray) -> np.ndarray:
    """Vehicle-frame points whose camera projection lands in the mask
    (extract_lidar_features, filtering.py:194-204): fused_lidar (N, 6) =
    xyz + camera id + (u, v)."""
    cam_id = CAM_SLOT_TO_WAYMO_ID[cam_slot]
    rows = fused_lidar[fused_lidar[:, 3] == cam_id]
    if len(rows) == 0:
        return np.zeros((0, 3), np.float32)
    u = rows[:, 4].astype(int)
    v = rows[:, 5].astype(int)
    ok = ((u >= 0) & (u < mask_cam.shape[1])
          & (v >= 0) & (v < mask_cam.shape[0]))
    ok[ok] &= mask_cam[v[ok], u[ok]]
    return rows[ok, :3].astype(np.float32)


def tracks_from_2d(cars: Sequence[Sequence[Tuple[int, int, int]]],
                   det_masks, fused_lidars, homos,
                   transforms_cam: np.ndarray, ref_frame: int,
                   window: Sequence[int],
                   layout: PairLayout = PairLayout(),
                   min_points: int = 10) -> List[Track]:
    """2D-tracked observations -> lomm ``Track``s in the KITTI-style camera
    frame, window-relative and ref-frame-aligned — the
    load_and_prepare_lidar_scan_from_multiple_waymo_tracker composition:
    pano mask -> camera mask -> fused-lidar gather -> VEHICLE_TO_CAM
    permutation -> T_cur_to_ref -> per-frame centroid.

    ``transforms_cam``: (len(window), 4, 4) T_cur_to_ref in the CAMERA
    frame (conjugate vehicle poses with VEHICLE_TO_CAM).  Observations
    outside the window are dropped; tracks with no in-window observation
    of at least ``min_points`` points are dropped."""
    lo, hi = window[0], window[-1]
    out: List[Track] = []
    for obs in cars:
        frames: List[int] = []
        locations: List[np.ndarray] = []
        points: List[Optional[np.ndarray]] = []
        masks: List[Optional[object]] = []
        for (f, z, mi) in obs:
            k = f - ref_frame
            if k < lo or k > hi:
                continue
            # union in-mask points from BOTH cameras of the pair
            # (extract_lidar_features, filtering.py:164-280) — the
            # larger-mask camera decides only the ref-frame mask payload
            both = pano_mask_to_both_cameras(
                det_masks[f][z][mi], z, homos, layout)
            if not both:
                continue
            pts_v = np.concatenate(
                [gather_mask_points(m, s, fused_lidars[f])
                 for m, s in both], axis=0)
            if len(pts_v) < min_points:
                continue
            mask_cam, slot = pano_mask_to_camera(
                det_masks[f][z][mi], z, homos, layout)
            pts_c = pts_v @ VEHICLE_TO_CAM.T
            t = transforms_cam[k - lo]
            pts_r = pts_c @ t[:3, :3].T + t[:3, 3]
            frames.append(k)
            locations.append(np.median(pts_r, axis=0))
            points.append(pts_r.astype(np.float32))
            # ref-frame mask payload: only the FRONT camera feeds the
            # label writer's 2D box (slot 2); other cameras have no
            # front-image footprint
            masks.append(mask_cam if (k == 0 and slot == 2) else None)
        if frames:
            order = np.argsort(frames)
            out.append(Track(
                frames=[frames[i] for i in order],
                locations=[locations[i] for i in order],
                points=[points[i] for i in order],
                masks=[masks[i] for i in order]))
    return out


def camera_transforms_from_vehicle(poses_w_vehicle: np.ndarray,
                                   ref_idx: int) -> np.ndarray:
    """Per-frame vehicle poses T_world<-vehicle -> (T, 4, 4) camera-frame
    T_cur_to_ref: inv(pose_ref) @ pose_cur conjugated by VEHICLE_TO_CAM
    (calculate_transformations_waymo semantics with the converter's fixed
    axis permutation)."""
    poses = np.asarray(poses_w_vehicle, np.float64)
    perm = np.eye(4)
    perm[:3, :3] = VEHICLE_TO_CAM
    inv_ref = np.linalg.inv(poses[ref_idx])
    out = np.empty_like(poses)
    inv_perm = np.linalg.inv(perm)
    for i in range(len(poses)):
        out[i] = perm @ inv_ref @ poses[i] @ inv_perm
    return out

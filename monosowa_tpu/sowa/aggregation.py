"""Track-level point aggregation and filtering, plus CarBatch assembly.

Behavioral contract (pseudo_label_generator/3d/scripts/loader.py):

* ``choose_ref_mask``            = choose_proper_mask (639-660): the mask of
  the reference-frame observation; cars never seen in the reference frame
  are "hidden" (mask None).
* ``aggregate_standing_clever``  = standing_concatenate_lidar_clever
  (783-810): keep the 10 observation frames where the car was closest to the
  ego camera (distance computed in that frame's own coordinates via the
  inverse ego transform), truncated masks penalized +5 m; concatenate their
  ref-frame points.
* ``moving_keep_ref``            = moving_lidar_keep_ref (756-771): a moving
  car keeps only its reference-frame points.
* ``filter_moving_not_visible``  = filter_moving_and_not_visible (826-849).
* ``filter_hidden_standing``     = filter_hidden_standing_cars_tracked
  (851-875), pseudo-lidar branch: drop standing cars with no ref mask.
* point cap 10 000 per car       = loader.py:188-192.
* ``build_car_batch``: pad everything into the SoA arrays the vmapped TPU
  fitter consumes (fitting.CarBatch).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from monosowa_tpu.sowa.fitting import CarBatch, estimate_angle_from_track
from monosowa_tpu.sowa.lomm import Track

MAX_POINTS_PER_CAR = 10000


def mask_is_truncated(mask: Optional[np.ndarray], cols: int = 10) -> bool:
    """True if the 2D mask touches the LEFT or RIGHT image border.

    The reference checks ``cur_mask[:10, :] | cur_mask[-10:, :]``
    (loader.py:794) on its TRANSPOSED (W, H) mask layout — i.e. the first/
    last 10 pixel COLUMNS of the image; on this package's (H, W) masks that
    is ``mask[:, :10] | mask[:, -10:]``."""
    if mask is None:
        return False
    return bool(np.any(mask[:, :cols]) or np.any(mask[:, -cols:]))


def choose_ref_mask(track: Track):
    """Return the reference-frame (offset 0) mask or None if hidden."""
    for f, m in zip(track.frames, track.masks):
        if f == 0:
            return m
    return None


def aggregate_standing_clever(track: Track,
                              transforms: np.ndarray,
                              window: Sequence[int],
                              keep_k: int = 10,
                              inv_transforms: Optional[np.ndarray] = None,
                              trunc_cache: Optional[dict] = None
                              ) -> Optional[np.ndarray]:
    """Concatenate ref-frame points of the k closest untruncated frames.

    transforms: (W, 4, 4) per-window-frame ``T_cur_to_ref`` (camera coords);
    the per-frame ego distance of the car is computed by mapping its
    ref-frame location back through inv(T) (loader.py:786-800).
    ``inv_transforms``/``trunc_cache`` let callers share the batched
    inverses and per-mask truncation flags across a frame's tracks.
    """
    base = window[0]
    if inv_transforms is None:
        inv_transforms = np.linalg.inv(transforms)
    dists = []
    pts_list = []
    for f, loc, pts, mask in zip(track.frames, track.locations, track.points,
                                 track.masks):
        if pts is None:
            continue
        t_inv = inv_transforms[f - base]
        loc_local = t_inv[:3, :3] @ np.asarray(loc[:3]) + t_inv[:3, 3]
        d = float(np.hypot(loc_local[0], loc_local[2]))
        if trunc_cache is not None and mask is not None:
            key = id(mask)
            t = trunc_cache.get(key)
            if t is None:
                t = mask_is_truncated(mask)
                trunc_cache[key] = t
        else:
            t = mask_is_truncated(mask)
        if t:
            d += 5.0
        dists.append(d)
        pts_list.append(pts)
    if not pts_list:
        return None
    order = np.argsort(np.asarray(dists))[:keep_k]
    return np.concatenate([pts_list[i] for i in order], axis=0)


def aggregate_standing_all(track: Track) -> Optional[np.ndarray]:
    """Plain aggregation (use_clever_aggregation: False):
    standing_concatenate_lidar (loader.py:773-781) — concatenate EVERY
    observation's ref-frame points, no frame selection."""
    pts_list = [p for p in track.points if p is not None]
    if not pts_list:
        return None
    return np.concatenate(pts_list, axis=0)


def moving_keep_ref(track: Track) -> Optional[np.ndarray]:
    for f, pts in zip(track.frames, track.points):
        if f == 0:
            return pts
    return None


def filter_moving_not_visible(tracks: Sequence[Track]) -> List[Track]:
    """Drop moving cars with no reference-frame observation."""
    out = []
    for t in tracks:
        if t.moving and 0 not in t.frames:
            continue
        out.append(t)
    return out


def filter_hidden_standing(tracks: Sequence[Track]) -> List[Track]:
    """Pseudo-lidar branch: keep cars whose reference mask exists."""
    return [t for t in tracks if choose_ref_mask(t) is not None or t.moving]


def hidden_standing_keep_real(points: np.ndarray,
                              ref_scan: Optional[np.ndarray],
                              radius: float = 0.1,
                              strict: bool = False,
                              chunk: int = 2048) -> bool:
    """Real-LiDAR hidden-standing check for ONE car's aggregated points
    against the reference frame's live scan (loader.py:860-873).

    The reference builds a faiss range query with radius 0.1 m and keeps
    the car ``if len(idx) > 0`` — but ``idx`` is faiss's ``lims`` prefix
    array, whose length is ALWAYS nq+1, so the shipped filter keeps every
    standing car.  Default replicates that quirk (keep); ``strict=True``
    applies the evidently intended semantics: keep iff any aggregated
    point lies within ``radius`` of a live scan point (brute-force
    chunked distances — faiss-free).
    """
    if not strict:
        return True
    if ref_scan is None or ref_scan.shape[0] == 0 or points.shape[0] == 0:
        return False
    scan = np.asarray(ref_scan[:, :3], np.float32)
    r2 = radius * radius
    for c0 in range(0, points.shape[0], chunk):
        p = points[c0:c0 + chunk, :3]
        d2 = ((p ** 2).sum(1)[:, None] + (scan ** 2).sum(1)[None, :]
              - 2.0 * (p @ scan.T))
        if (d2 < r2).any():
            return True
    return False


def filter_distant(points: np.ndarray, max_distance: float = 75.0) -> bool:
    """Pseudo-lidar distant-car filter: keep iff the aggregated cloud's
    median is within ``max_distance`` of the camera
    (loader.py:3944-3954 filter_distant_cars_pseudo_lidar)."""
    loc = np.median(points[:, :3], axis=0)
    return bool(np.linalg.norm(loc) < max_distance)


def cap_points(pts: np.ndarray, cap: int = MAX_POINTS_PER_CAR,
               seed: int = 12345) -> np.ndarray:
    if pts.shape[0] <= cap:
        return pts
    rng = np.random.default_rng(seed)
    idx = rng.choice(pts.shape[0], size=cap, replace=False)
    return pts[idx]


def aggregate_tracks(tracks: Sequence[Track], transforms: np.ndarray,
                     window: Sequence[int], keep_k: int = 10,
                     min_points: int = 1000,
                     use_pseudo_lidar: bool = True,
                     max_distance: float = 75.0,
                     ref_scan: Optional[np.ndarray] = None,
                     strict_hidden: bool = False,
                     clever: bool = True):
    """Full post-classification aggregation: returns (kept_tracks,
    per-track aggregated points, per-track ref masks).

    ``min_points`` mirrors lidar_threshold_during_optim (standing cars with
    fewer aggregated points are dropped — filtering.py:21-22).

    ``clever=False`` = the reference's use_clever_aggregation: False
    branch (loader.py:176-179): standing cars concatenate every
    observation instead of the keep-k closest frames.

    ``use_pseudo_lidar=False`` (real velodyne scans): the hidden-standing
    filter switches from the mask branch to the live-scan range query
    (``ref_scan`` = the reference frame's cam-frame scan; see
    hidden_standing_keep_real for the reference's len(lims) quirk and
    ``strict_hidden``), and the 75 m distant-car filter is skipped
    (loader.py:185-186 gates it on use_pseudo_lidar).
    """
    tracks = filter_moving_not_visible(tracks)
    if use_pseudo_lidar:
        tracks = filter_hidden_standing(tracks)
    kept, points, masks = [], [], []
    inv_transforms = np.linalg.inv(np.asarray(transforms))
    trunc_cache: dict = {}
    for t in tracks:
        if t.moving:
            # moving cars seen < 3 times are never optimized/written
            # (filtering.py est_location_and_downsample:62-65)
            if len(t.frames) < 3:
                continue
            pts = moving_keep_ref(t)
        else:
            pts = (aggregate_standing_clever(t, transforms, window, keep_k,
                                             inv_transforms, trunc_cache)
                   if clever else aggregate_standing_all(t))
            if pts is not None and pts.shape[0] < min_points:
                pts = None
            if (pts is not None and not use_pseudo_lidar
                    and not hidden_standing_keep_real(
                        pts, ref_scan, strict=strict_hidden)):
                pts = None
        if pts is None or pts.shape[0] == 0:
            continue
        if use_pseudo_lidar and not filter_distant(
                np.asarray(pts), max_distance):
            continue
        kept.append(t)
        points.append(cap_points(np.asarray(pts, np.float32)))
        masks.append(choose_ref_mask(t))
    return kept, points, masks


def build_car_batch(tracks: Sequence[Track],
                    points: Sequence[np.ndarray],
                    window: Sequence[int],
                    max_cars: int,
                    max_points: int,
                    angle_min_dist: float = 3.0,
                    per_track_windows: Optional[Sequence[Sequence[int]]] = None,
                    ) -> CarBatch:
    """Pad per-car point clouds into the SoA batch the fitter vmaps over.

    Cars beyond ``max_cars`` are dropped (callers should size generously);
    per-car points beyond ``max_points`` are randomly subsampled.

    ``per_track_windows``: when tracks come from *different* frames (the
    cross-frame batched fit in pipeline.label_frames), each track's frame
    offsets are relative to its own frame's window — pass that window per
    track here so moving-car trajectory angles index the right slots.
    """
    b = min(len(tracks), max_cars)
    pts = np.zeros((max_cars, max_points, 3), np.float32)
    mask = np.zeros((max_cars, max_points), bool)
    moving = np.zeros(max_cars, bool)
    theta_est = np.zeros(max_cars, np.float32)
    theta_valid = np.zeros(max_cars, bool)
    valid = np.zeros(max_cars, bool)

    for i in range(b):
        p = points[i]
        if p.shape[0] > max_points:
            p = cap_points(p, max_points, seed=12345 + i)
        pts[i, :p.shape[0]] = p
        mask[i, :p.shape[0]] = True
        valid[i] = True
        moving[i] = tracks[i].moving
        if tracks[i].moving:
            win_i = (per_track_windows[i] if per_track_windows is not None
                     else window)
            locs, lvalid = tracks[i].location_array(win_i)
            try:
                ref_idx = list(win_i).index(0)
            except ValueError:
                ref_idx = 0
            ang = estimate_angle_from_track(locs, lvalid, ref_idx,
                                            min_dist=angle_min_dist)
            if ang is not None:
                theta_est[i] = ang
                theta_valid[i] = True

    import jax.numpy as jnp
    return CarBatch(points=jnp.asarray(pts), mask=jnp.asarray(mask),
                    moving=jnp.asarray(moving),
                    theta_est=jnp.asarray(theta_est),
                    theta_valid=jnp.asarray(theta_valid),
                    car_valid=jnp.asarray(valid))

"""Ego-motion transformation stage.

Behavioral contract (pseudo_label_generator/3d/scripts/loader.py:901-1013):
per reference frame, a (2*R+1, 4, 4) array of ``T_cur_to_ref`` camera-frame
transforms over the +-nscans_transformation_range window, cached as
``transformations/<frame>.npy`` with skip-if-exists resumability
(:902-905, :938).

Three pose sources:
* KITTI raw: OXTS IMU chain conjugated into cam2 (:917-935) — vectorized in
  kittiio.oxts;
* KITTI-360: cam0_to_world.txt poses (:942-982), missing frames -> zero
  matrices that downstream skips (:956-961);
* waymo_converted: per-frame ``Cur_pose`` rows appended to the calib files
  (:984-1013).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from monosowa_tpu.kittiio.oxts import (oxts_to_poses, poses_file_transforms,
                                       relative_cam_transforms)


def window_indices(ref: int, n_frames: int, rng: int):
    """Clamped window [ref-rng, ref+rng] intersected with [0, n_frames)."""
    lo = max(ref - rng, 0)
    hi = min(ref + rng, n_frames - 1)
    return list(range(lo, hi + 1))


def kitti_window_transforms(oxts_packets: np.ndarray, imu_to_cam: np.ndarray,
                            ref: int, rng: int = 130) -> np.ndarray:
    """(T_frames, >=6) oxts -> (2*rng+1, 4, 4) T_cur_to_ref, zero-padded
    outside the sequence (matching the reference's fixed-size window)."""
    poses = oxts_to_poses(oxts_packets)
    rel = relative_cam_transforms(poses, imu_to_cam, ref)
    return _window_pack(rel, ref, rng)


def pose_window_transforms(poses_w_cam: np.ndarray, valid: np.ndarray,
                           ref: int, rng: int = 130) -> np.ndarray:
    """KITTI-360 / waymo_converted style world poses -> windowed transforms;
    invalid frames produce zero matrices (loader.py:956-961)."""
    rel = poses_file_transforms(poses_w_cam, ref)
    rel = np.where(valid[:, None, None], rel, np.zeros((4, 4)))
    return _window_pack(rel, ref, rng)


def _window_pack(rel: np.ndarray, ref: int, rng: int) -> np.ndarray:
    out = np.zeros((2 * rng + 1, 4, 4))
    n = rel.shape[0]
    for k, f in enumerate(range(ref - rng, ref + rng + 1)):
        if 0 <= f < n:
            out[k] = rel[f]
    return out


def transforms_cache_path(cache_dir: str, frame: str) -> str:
    return os.path.join(cache_dir, f"{frame}.npy")


def save_window_transforms(cache_dir: str, frame: str,
                           transforms: np.ndarray) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    np.save(transforms_cache_path(cache_dir, frame), transforms)


def load_window_transforms(cache_dir: str, frame: str
                           ) -> Optional[np.ndarray]:
    p = transforms_cache_path(cache_dir, frame)
    if not os.path.exists(p):
        return None
    return np.load(p)


def slice_window(transforms_full: np.ndarray, full_rng: int,
                 before: int, after: int) -> np.ndarray:
    """Cut the +-full_rng cache down to the [-before, +after] aggregation
    window (the reference caches 130 and aggregates 30)."""
    c = full_rng
    return transforms_full[c - before:c + after + 1]

"""CenterNet-style 3-point affine transforms.

Behavioral contract: MonoDETR kitti_utils.py:332-391 (get_affine_transform /
affine_transform) — center/scale to output-resolution warp built from three
control points, solved without cv2.
"""

from __future__ import annotations

import numpy as np


def _get_dir(src_point, rot_rad):
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return np.array([src_point[0] * cs - src_point[1] * sn,
                     src_point[0] * sn + src_point[1] * cs], np.float32)


def _get_3rd_point(a, b):
    direct = a - b
    return b + np.array([-direct[1], direct[0]], np.float32)


def _solve_affine(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Exact affine (2x3) mapping three src points to three dst points."""
    a = np.zeros((6, 6), np.float64)
    b = np.zeros(6, np.float64)
    for i in range(3):
        a[2 * i, 0:2] = src[i]
        a[2 * i, 2] = 1
        a[2 * i + 1, 3:5] = src[i]
        a[2 * i + 1, 5] = 1
        b[2 * i] = dst[i, 0]
        b[2 * i + 1] = dst[i, 1]
    sol = np.linalg.solve(a, b)
    return sol.reshape(2, 3).astype(np.float64)


def get_affine_transform(center, scale, rot, output_size,
                         shift=np.array([0.0, 0.0], np.float32), inv=0):
    if not isinstance(scale, (np.ndarray, list, tuple)):
        scale = np.array([scale, scale], np.float32)
    scale = np.asarray(scale, np.float32)
    center = np.asarray(center, np.float32)
    src_w = scale[0]
    dst_w, dst_h = output_size[0], output_size[1]

    rot_rad = np.pi * rot / 180.0
    src_dir = _get_dir([0, src_w * -0.5], rot_rad)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center + scale * shift
    src[1] = center + src_dir + scale * shift
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = np.array([dst_w * 0.5, dst_h * 0.5], np.float32) + dst_dir
    src[2] = _get_3rd_point(src[0], src[1])
    dst[2] = _get_3rd_point(dst[0], dst[1])

    trans = _solve_affine(src, dst)
    if inv:
        return trans, _solve_affine(dst, src)
    return trans


def affine_transform(pt, t):
    p = np.array([pt[0], pt[1], 1.0], np.float64)
    return (t @ p)[:2]

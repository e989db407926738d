"""KITTI calibration: projection matrices and frame conversions.

Behavioral contract: MonoDETR/lib/datasets/kitti/kitti_utils.py:118-330
(Calibration) plus the pseudo-labeller calib loaders
(pseudo_label_generator/3d/scripts/metric3d.py:346-373).  The math here is
vectorized numpy; batched JAX variants of the hot projections live in
``monosowa_tpu.ops.geometry``.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def read_calib_file(path: str) -> Dict[str, np.ndarray]:
    """Parse a KITTI-object calib txt into named matrices.

    Robust to both `key: v0 v1 ...` and plain ordered-line layouts; also
    captures the converter's appended ``Cur_pose`` row when present
    (waymo_to_kitti_projected.py:194-202)."""
    entries: Dict[str, np.ndarray] = {}
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line or ":" not in line:
                continue
            key, _, rest = line.partition(":")
            vals = rest.split()
            if not vals:
                continue
            try:
                entries[key.strip()] = np.array([float(v) for v in vals], np.float64)
            except ValueError:
                continue
    return entries


class Calibration:
    """Camera-2 projection and the rect/lidar/image frame conversions."""

    def __init__(self, calib):
        if isinstance(calib, str):
            calib = read_calib_file(calib)
        if isinstance(calib, dict) and "P2" in calib and calib["P2"].ndim == 1:
            calib = {k: v for k, v in calib.items()}
            calib["P2"] = calib["P2"].reshape(3, 4)
            if "P3" in calib:
                calib["P3"] = calib["P3"].reshape(3, 4)
            r0 = calib.get("R0_rect", calib.get("R0"))
            calib["R0"] = (r0.reshape(3, 3) if r0 is not None else np.eye(3))
            v2c = calib.get("Tr_velo_to_cam", calib.get("Tr_velo2cam"))
            calib["Tr_velo2cam"] = (v2c.reshape(3, 4) if v2c is not None
                                    else np.hstack([np.eye(3), np.zeros((3, 1))]))

        self.P2 = np.asarray(calib["P2"], np.float64).reshape(3, 4)
        self.R0 = np.asarray(calib.get("R0", np.eye(3)), np.float64).reshape(3, 3)
        self.V2C = np.asarray(
            calib.get("Tr_velo2cam", np.hstack([np.eye(3), np.zeros((3, 1))])),
            np.float64).reshape(3, 4)
        self.C2V = inverse_rigid_trans(self.V2C)
        self.pose: Optional[np.ndarray] = None
        if isinstance(calib, dict) and "Cur_pose" in calib:
            self.pose = np.asarray(calib["Cur_pose"], np.float64).reshape(4, 4)

        self.cu = self.P2[0, 2]
        self.cv = self.P2[1, 2]
        self.fu = self.P2[0, 0]
        self.fv = self.P2[1, 1]
        self.tx = self.P2[0, 3] / (-self.fu)
        self.ty = self.P2[1, 3] / (-self.fv)

    # -- frame conversions (kitti_utils.py:157-215) --------------------------

    @staticmethod
    def _hom(pts: np.ndarray) -> np.ndarray:
        return np.hstack([pts, np.ones((pts.shape[0], 1), pts.dtype)])

    def lidar_to_rect(self, pts_lidar: np.ndarray) -> np.ndarray:
        return self._hom(pts_lidar) @ self.V2C.T @ self.R0.T

    def rect_to_lidar(self, pts_rect: np.ndarray) -> np.ndarray:
        pts_ref = pts_rect @ np.linalg.inv(self.R0).T
        return self._hom(pts_ref) @ self.C2V.T

    def rect_to_img(self, pts_rect: np.ndarray):
        # NOTE: divides by the input rect-frame z, NOT the homogeneous w
        # (they differ by P2[2,3] ~ 5e-3 m) — the reference/OpenPCDet
        # convention (kitti_utils.py:180-189), kept for exact parity
        hom = self._hom(pts_rect) @ self.P2.T
        pts_img = hom[:, :2] / np.asarray(pts_rect)[:, 2:3]
        depth = hom[:, 2] - self.P2.T[3, 2]
        return pts_img, depth

    def lidar_to_img(self, pts_lidar: np.ndarray):
        return self.rect_to_img(self.lidar_to_rect(pts_lidar))

    def img_to_rect(self, u, v, depth_rect):
        u = np.asarray(u, np.float64).reshape(-1)
        v = np.asarray(v, np.float64).reshape(-1)
        depth_rect = np.asarray(depth_rect, np.float64).reshape(-1)
        x = (u - self.cu) * depth_rect / self.fu + self.tx
        y = (v - self.cv) * depth_rect / self.fv + self.ty
        return np.stack([x, y, depth_rect], axis=1)

    def depthmap_to_rect(self, depth_map: np.ndarray):
        h, w = depth_map.shape
        xi, yi = np.meshgrid(np.arange(w), np.arange(h))
        xi, yi = xi.reshape(-1), yi.reshape(-1)
        return self.img_to_rect(xi, yi, depth_map[yi, xi]), xi, yi

    def corners3d_to_img_boxes(self, corners3d: np.ndarray):
        n = corners3d.shape[0]
        hom = np.concatenate([corners3d, np.ones((n, 8, 1))], axis=2)
        img = hom @ self.P2.T
        x = img[:, :, 0] / img[:, :, 2]
        y = img[:, :, 1] / img[:, :, 2]
        boxes = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
        corners = np.stack([x, y], axis=2)
        return boxes, corners

    # -- angle conversions (kitti_utils.py:273-295) --------------------------

    def alpha2ry(self, alpha: float, u: float) -> float:
        ry = alpha + np.arctan2(u - self.cu, self.fu)
        if ry > np.pi:
            ry -= 2 * np.pi
        if ry < -np.pi:
            ry += 2 * np.pi
        return ry

    def ry2alpha(self, ry: float, u: float) -> float:
        alpha = ry - np.arctan2(u - self.cu, self.fu)
        if alpha > np.pi:
            alpha -= 2 * np.pi
        if alpha < -np.pi:
            alpha += 2 * np.pi
        return alpha

    def flip(self, img_size) -> None:
        """Recompute P2 for a horizontally-flipped image via DLT on 8 control
        points (kitti_utils.py:297-330) — used by the flip augmentation."""
        wsize, hsize = 4, 2
        us = np.tile(np.linspace(0, img_size[0], wsize)[None, :], (hsize, 1))
        vs = np.tile(np.linspace(0, img_size[1], hsize)[:, None], (1, wsize))
        ds = np.linspace(2, 78, wsize * hsize).reshape(hsize, wsize)
        p2ds = np.stack([us, vs, ds], axis=-1).reshape(-1, 3)
        p3ds = self.img_to_rect(p2ds[:, 0], p2ds[:, 1], p2ds[:, 2])
        p3ds[:, 0] *= -1
        p2ds[:, 0] = img_size[0] - p2ds[:, 0]

        m = np.zeros([wsize * hsize, 2, 7])
        m[:, 0, 0] = p3ds[:, 0]
        m[:, 0, 1] = m[:, 1, 2] = p3ds[:, 2]
        m[:, 1, 0] = p3ds[:, 1]
        m[:, 0, 3] = m[:, 1, 4] = 1
        m[:, :, -2] = -p2ds[:, :2]
        m[:, :, -1] = -p2ds[:, :2] * p3ds[:, 2:3]
        sol = np.linalg.svd(m.reshape(-1, 7))[-1][-1]
        sol /= sol[-1]

        new_p2 = np.zeros([4, 3])
        new_p2[0, 0] = new_p2[1, 1] = sol[0]
        new_p2[2, 0:2] = sol[1:3]
        new_p2[3, :] = sol[3:6]
        new_p2[-1, -1] = self.P2[-1, -1]
        self.P2 = new_p2.T
        self.cu, self.cv = self.P2[0, 2], self.P2[1, 2]
        self.fu, self.fv = self.P2[0, 0], self.P2[1, 1]
        self.tx = self.P2[0, 3] / (-self.fu)
        self.ty = self.P2[1, 3] / (-self.fv)


def inverse_rigid_trans(tr: np.ndarray) -> np.ndarray:
    inv = np.zeros_like(tr)
    inv[:3, :3] = tr[:3, :3].T
    inv[:3, 3] = -tr[:3, :3].T @ tr[:3, 3]
    return inv

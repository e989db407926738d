"""KITTI object-label parsing and writing.

Formats reproduced byte-for-byte from the reference:

* pseudo-label writer rows (pseudo_label_generator/3d/scripts/output.py:12-91):
  ``Car -1 -1 -10 x1 y1 x2 y2 h w l x y z ry score `` — every float printed
  with ``%.2f``, a trailing space before the newline, yaw already shifted by
  −π/2 and the y coordinate moved from box *center* to box *bottom* (+h/2).
* detector result rows (MonoDETR/lib/helpers/tester_helper.py:168-188):
  ``<cls> 0.0 0 alpha x1 y1 x2 y2 h w l x y z ry score`` with ``%.2f`` floats.
* parser (MonoDETR/lib/datasets/kitti/kitti_utils.py:13-49): 15 or 16
  whitespace-separated fields; difficulty from 2D box height / truncation /
  occlusion thresholds.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

# KITTI difficulty thresholds (reference: kitti_utils.py:33-49 and the C++
# devkit evaluate_object.cpp:44-59).
MIN_HEIGHT = (40.0, 25.0, 25.0)
MAX_OCCLUSION = (0, 1, 2)
MAX_TRUNCATION = (0.15, 0.3, 0.5)


@dataclasses.dataclass
class KittiObject:
    """One KITTI label row (parsed form of kitti_utils.py Object3d)."""

    cls_type: str
    truncation: float
    occlusion: float
    alpha: float
    box2d: np.ndarray  # (4,) x1 y1 x2 y2
    h: float
    w: float
    l: float
    pos: np.ndarray  # (3,) x y z — bottom-center, camera/rect coords
    ry: float
    score: float = -1.0

    @classmethod
    def from_line(cls, line: str) -> "KittiObject":
        f = line.strip().split(" ")
        return cls(
            cls_type=f[0],
            truncation=float(f[1]),
            occlusion=float(f[2]),
            alpha=float(f[3]),
            box2d=np.array([float(f[4]), float(f[5]), float(f[6]), float(f[7])],
                           dtype=np.float32),
            h=float(f[8]), w=float(f[9]), l=float(f[10]),
            pos=np.array([float(f[11]), float(f[12]), float(f[13])],
                         dtype=np.float32),
            ry=float(f[14]),
            score=float(f[15]) if len(f) == 16 else -1.0,
        )

    @property
    def level(self) -> int:
        return obj_level(self.box2d, self.truncation, self.occlusion)

    def corners3d(self) -> np.ndarray:
        """(8, 3) camera-frame corners; y measured up from the bottom face
        (reference: kitti_utils.py:54-70)."""
        l, h, w = self.l, self.h, self.w
        x = np.array([l, l, -l, -l, l, l, -l, -l]) / 2.0
        y = np.array([0, 0, 0, 0, -h, -h, -h, -h], dtype=np.float64)
        z = np.array([w, -w, -w, w, w, -w, -w, w]) / 2.0
        c, s = np.cos(self.ry), np.sin(self.ry)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        return (rot @ np.vstack([x, y, z])).T + self.pos

    def to_kitti_line(self) -> str:
        b = self.box2d
        base = (f"{self.cls_type} {self.truncation:.2f} {int(self.occlusion)} "
                f"{self.alpha:.2f} {b[0]:.2f} {b[1]:.2f} {b[2]:.2f} {b[3]:.2f} "
                f"{self.h:.2f} {self.w:.2f} {self.l:.2f} "
                f"{self.pos[0]:.2f} {self.pos[1]:.2f} {self.pos[2]:.2f} "
                f"{self.ry:.2f}")
        if self.score >= 0:
            base += f" {self.score:.2f}"
        return base


def obj_level(box2d: Sequence[float], truncation: float, occlusion: float) -> int:
    """0=DontCare 1=Easy 2=Moderate 3=Hard 4=Unknown (kitti_utils.py:33-49)."""
    height = float(box2d[3]) - float(box2d[1]) + 1.0
    if truncation == -1:
        return 0
    if height >= MIN_HEIGHT[0] and truncation <= MAX_TRUNCATION[0] and occlusion <= MAX_OCCLUSION[0]:
        return 1
    if height >= MIN_HEIGHT[1] and truncation <= MAX_TRUNCATION[1] and occlusion <= MAX_OCCLUSION[1]:
        return 2
    if height >= MIN_HEIGHT[2] and truncation <= MAX_TRUNCATION[2] and occlusion <= MAX_OCCLUSION[2]:
        return 3
    return 4


class LabelSet:
    """Structure-of-arrays view over a list of label rows.

    TPU-first design: downstream geometry (AP eval, NMS, encoding) consumes
    padded arrays, not python objects.
    """

    def __init__(self, objects: List[KittiObject]):
        self.objects = objects
        n = len(objects)
        self.names = [o.cls_type for o in objects]
        self.truncation = np.array([o.truncation for o in objects], np.float32).reshape(n)
        self.occlusion = np.array([o.occlusion for o in objects], np.float32).reshape(n)
        self.alpha = np.array([o.alpha for o in objects], np.float32).reshape(n)
        self.box2d = (np.stack([o.box2d for o in objects]).astype(np.float32)
                      if n else np.zeros((0, 4), np.float32))
        self.hwl = np.array([[o.h, o.w, o.l] for o in objects], np.float32).reshape(n, 3)
        self.pos = (np.stack([o.pos for o in objects]).astype(np.float32)
                    if n else np.zeros((0, 3), np.float32))
        self.ry = np.array([o.ry for o in objects], np.float32).reshape(n)
        self.score = np.array([o.score for o in objects], np.float32).reshape(n)

    def __len__(self) -> int:
        return len(self.objects)

    def __iter__(self):
        return iter(self.objects)


def read_label_file(path: str) -> LabelSet:
    with open(path, "r") as f:
        lines = [ln for ln in f.readlines() if ln.strip()]
    return LabelSet([KittiObject.from_line(ln) for ln in lines])


def write_detection_file(path: str, rows: Sequence[Sequence[float]],
                         class_names: Sequence[str]) -> None:
    """Write detector predictions, row = [cls_id, alpha, x1,y1,x2,y2, h,w,l,
    x,y,z, ry, score] (tester_helper.py:181-188 byte format:
    ``<cls> 0.0 0`` then each value as `` %.2f``)."""
    with open(path, "w") as f:
        for row in rows:
            f.write("{} 0.0 0".format(class_names[int(row[0])]))
            for v in row[1:]:
                f.write(" {:.2f}".format(float(v)))
            f.write("\n")


def write_pseudo_label_file(path: str, cars: Sequence[dict],
                            yaw_already_kitti: bool = False) -> None:
    """Write pseudo-label rows in the auto-labeller's exact byte format
    (output.py:30-54).

    Each car dict needs: ``cls`` (default "Car"), ``box2d`` (4,) or None,
    ``h w l x y z theta`` and optional ``score`` (default 0.99).  ``y`` is the
    box *center* y; the writer emits bottom y (= y + h/2) like the reference.
    ``theta`` is the fitting frame yaw; the writer applies the −π/2 KITTI
    shift and wraps to (−π, π] unless ``yaw_already_kitti``.
    """
    with open(path, "w") as f:
        for car in cars:
            box = car.get("box2d")
            if box is None:
                box = np.zeros(4, np.float64)
            score = float(car.get("score", 0.99))
            yaw = float(car["theta"])
            if not yaw_already_kitti:
                yaw -= np.pi / 2.0
            if yaw > np.pi:
                yaw -= 2 * np.pi
            elif yaw < -np.pi:
                yaw += 2 * np.pi
            f.write(f'{car.get("cls", "Car")} -1 -1 -10 ')
            for z in range(4):
                f.write(f"{float(box[z]):3.2f} ")
            f.write(f'{car["h"]:.2f} {car["w"]:.2f} {car["l"]:.2f} ')
            f.write(f'{float(car["x"]):3.2f} ')
            f.write(f'{float(car["y"] + car["h"] / 2.0):3.2f} ')
            f.write(f'{float(car["z"]):3.2f} ')
            f.write(f"{yaw:3.2f} ")
            f.write(f"{score:3.2f} ")
            f.write("\n")

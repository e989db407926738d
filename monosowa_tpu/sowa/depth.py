"""Pseudo-LiDAR generation: monocular depth -> camera-frame point clouds.

Behavioral contract (pseudo_label_generator/3d/scripts/metric3d.py):

* the Metric3Dv2 backbone predicts canonical depth at a 1000-focal; actual
  depth = canonical * fx / 1000, clamped to 300 m (:319-341);
* back-projection through the pinhole intrinsics on the full pixel grid,
  keeping points with depth > 0 (:330-341);
* per-frame outputs cached as npz under ``lidar_raw/<seq>/pcds/`` with
  skip-if-exists resumability (:82-83, :97).

Capability interface (SURVEY.md §2.4.8): the depth *estimator* is pluggable.
``CachedDepthBackend`` consumes precomputed depth maps / point clouds so the
pipeline runs without the ViT-giant checkpoint; ``TorchHubMetric3DBackend``
wires the original torch-hub model when a checkpoint is locally available.
The geometric lift itself is jitted JAX (ops.geometry.backproject_depth).
"""

from __future__ import annotations

import os
from typing import Optional, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.ops.geometry import backproject_depth

MAX_DEPTH = 300.0
CANONICAL_FOCAL = 1000.0


class DepthBackend(Protocol):
    def predict_depth(self, image: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 RGB -> (H, W) float32 canonical depth."""
        ...


class CachedDepthBackend:
    """Reads precomputed depth maps (``<depth_dir>/<frame>.npz`` with key
    'depth') — the phase-1 operating mode."""

    def __init__(self, depth_dir: str, key: str = "depth"):
        self.depth_dir = depth_dir
        self.key = key

    def predict_depth_for(self, frame: str) -> Optional[np.ndarray]:
        path = os.path.join(self.depth_dir, f"{frame}.npz")
        if not os.path.exists(path):
            return None
        with np.load(path) as z:
            return np.asarray(z[self.key], np.float32)


class TorchHubMetric3DBackend:
    """Runs yvanyin/metric3d (metric3d.py:17-37) when available locally.

    Requires network or a pre-fetched torch-hub cache; raises with guidance
    otherwise.  Inference follows encode_img/decode_img: resize+pad to
    616x1064, normalize, de-pad, upsample back.
    """

    def __init__(self, model_name: str = "metric3d_vit_giant2"):
        import torch

        try:
            self.model = torch.hub.load("yvanyin/metric3d", model_name,
                                        pretrain=True)
        except Exception as e:  # zero-egress environments
            raise RuntimeError(
                "Metric3D weights unavailable (offline). Use "
                "CachedDepthBackend with precomputed depth maps.") from e
        self.model.eval()

    def predict_depth(self, image: np.ndarray) -> np.ndarray:
        import torch

        h, w = image.shape[:2]
        input_size = (616, 1064)
        scale = min(input_size[0] / h, input_size[1] / w)
        hs, ws = int(h * scale), int(w * scale)
        import cv2
        rgb = cv2.resize(image, (ws, hs), interpolation=cv2.INTER_LINEAR)
        pad_h, pad_w = input_size[0] - hs, input_size[1] - ws
        ph0, pw0 = pad_h // 2, pad_w // 2
        padded = np.full((*input_size, 3), [123.675, 116.28, 103.53],
                         np.float32)
        padded[ph0:ph0 + hs, pw0:pw0 + ws] = rgb
        x = (padded - [123.675, 116.28, 103.53]) / [58.395, 57.12, 57.375]
        t = torch.from_numpy(x.transpose(2, 0, 1))[None].float()
        with torch.no_grad():
            depth, *_ = self.model.inference({"input": t})
        d = depth.squeeze().cpu().numpy()[ph0:ph0 + hs, pw0:pw0 + ws]
        d = cv2.resize(d, (w, h), interpolation=cv2.INTER_LINEAR)
        return (d / scale).astype(np.float32)


@jax.jit
def lift_depth_to_points(depth: jnp.ndarray, fu: float, fv: float,
                         cu: float, cv: float,
                         fx_scale: jnp.ndarray) -> jnp.ndarray:
    """Canonical depth map -> (H*W, 3) metric camera points.

    fx_scale = fx / 1000 de-canonicalizes depth (metric3d.py:327-333);
    depth clamped to MAX_DEPTH."""
    metric = jnp.clip(depth * fx_scale, 0.0, MAX_DEPTH)
    return backproject_depth(metric, fu, fv, cu, cv)


def pseudo_lidar_from_depth(depth: np.ndarray, p2: np.ndarray,
                            canonical: bool = True) -> np.ndarray:
    """Host convenience wrapper -> (N, 3) float32 points (z > 0)."""
    fu, fv = p2[0, 0], p2[1, 1]
    cu, cv = p2[0, 2], p2[1, 2]
    scale = fu / CANONICAL_FOCAL if canonical else 1.0
    pts = np.asarray(lift_depth_to_points(jnp.asarray(depth), fu, fv, cu, cv,
                                          jnp.float32(scale)))
    return pts[pts[:, 2] > 0].astype(np.float32)


def generate_pseudo_lidar_cache(frames, images_or_depths, p2: np.ndarray,
                                out_dir: str, backend=None,
                                canonical: bool = True) -> int:
    """Write per-frame pseudo-lidar npz caches (skip-if-exists).

    frames: frame name list; images_or_depths: matching (H, W[,3]) arrays —
    depth maps when backend is None, RGB images otherwise.
    Returns the number of frames newly generated."""
    os.makedirs(out_dir, exist_ok=True)
    done = 0
    for frame, arr in zip(frames, images_or_depths):
        out = os.path.join(out_dir, f"{frame}.npz")
        if os.path.exists(out):
            continue
        depth = backend.predict_depth(arr) if backend is not None else arr
        pts = pseudo_lidar_from_depth(np.asarray(depth, np.float32), p2,
                                      canonical)
        np.savez_compressed(out, points=pts)
        done += 1
    return done


def load_pseudo_lidar(path: str) -> Optional[np.ndarray]:
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        key = "points" if "points" in z else list(z.keys())[0]
        pts = np.asarray(z[key], np.float32)
    return pts.reshape(-1, pts.shape[-1])[:, :3]

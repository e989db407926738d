"""Pseudo-LiDAR generation: monocular depth -> camera-frame point clouds.

Behavioral contract (pseudo_label_generator/3d/scripts/metric3d.py):

* ``encode_img`` (:290-317): keep-ratio resize to fit 616x1064, scale ALL
  FOUR intrinsics by the same factor, center-pad with the ImageNet mean,
  then normalize with the ImageNet mean/std (values in 0-255 space);
* the Metric3Dv2 backbone predicts canonical depth at a 1000-focal camera;
  ``decode_img`` (:319-345) crops the padding, bilinearly upsamples to the
  original resolution, de-canonicalizes with the SCALED intrinsic
  (``depth * fx_scaled / 1000``), clamps to [0, 300] m, and back-projects
  the full pixel grid through the ORIGINAL intrinsics;
* per-frame outputs cached as npz under ``lidar_raw/<seq>/pcds/`` with
  skip-if-exists resumability (:82-83, :97).

Deviation: the reference keeps all H*W back-projected points including the
degenerate depth-0 pixels; ``pseudo_lidar_from_depth`` drops z <= 0 points
(they carry no geometry and downstream projection divides by z).

Capability interface (SURVEY.md §2.4.8): the depth *estimator* is pluggable.
``CachedDepthBackend`` consumes precomputed depth maps / point clouds so the
pipeline runs without the ViT-giant checkpoint; ``TorchHubMetric3DBackend``
wires the original torch-hub model when a checkpoint is locally available.
Cached-depth protocol: ``predict_depth`` returns canonical depth at the
ORIGINAL resolution with the encode resize factor already folded in, so
metric depth = value * fx_orig / 1000 (equal to the reference's
``upsampled * fx_scaled / 1000``).  The geometric decode+lift is jitted JAX.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Protocol, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.ops.geometry import backproject_depth

MAX_DEPTH = 300.0
CANONICAL_FOCAL = 1000.0
METRIC3D_INPUT_SIZE = (616, 1064)  # ViT models (metric3d.py:294)
IMAGENET_MEAN = (123.675, 116.28, 103.53)
IMAGENET_STD = (58.395, 57.12, 57.375)


def encode_image(img: np.ndarray, intrinsic) -> Tuple[
        np.ndarray, list, list, float]:
    """Exact ``Metric3D.encode_img`` (metric3d.py:290-317).

    img: (H, W, 3) RGB (any dtype, 0-255 range); intrinsic: [fx, fy, cx, cy].
    Returns (chw normalized float32 (3, 616, 1064), pad_info
    [top, bottom, left, right], intrinsic_scaled, scale).
    """
    import cv2

    ih, iw = METRIC3D_INPUT_SIZE
    h, w = img.shape[:2]
    scale = min(ih / h, iw / w)
    rgb = cv2.resize(np.asarray(img), (int(w * scale), int(h * scale)),
                     interpolation=cv2.INTER_LINEAR)
    intrinsic_scaled = [float(intrinsic[0]) * scale,
                        float(intrinsic[1]) * scale,
                        float(intrinsic[2]) * scale,
                        float(intrinsic[3]) * scale]
    hs, ws = rgb.shape[:2]
    pad_h, pad_w = ih - hs, iw - ws
    ph0, pw0 = pad_h // 2, pad_w // 2
    pad_info = [ph0, pad_h - ph0, pw0, pad_w - pw0]
    padded = cv2.copyMakeBorder(rgb, ph0, pad_h - ph0, pw0, pad_w - pw0,
                                cv2.BORDER_CONSTANT, value=list(IMAGENET_MEAN))
    mean = np.asarray(IMAGENET_MEAN, np.float32)[:, None, None]
    std = np.asarray(IMAGENET_STD, np.float32)[:, None, None]
    chw = (padded.transpose(2, 0, 1).astype(np.float32) - mean) / std
    return chw, pad_info, intrinsic_scaled, scale


@functools.partial(jax.jit, static_argnums=(1, 2))
def metric3d_decode_lift(pred_depth: jnp.ndarray, pad_info: tuple,
                         orig_hw: tuple, fx_scaled: jnp.ndarray,
                         intrinsic_orig: jnp.ndarray) -> Tuple[
                             jnp.ndarray, jnp.ndarray]:
    """Exact ``Metric3D.decode_img`` geometry (metric3d.py:319-345), jitted.

    pred_depth: (616, 1064) canonical depth from the model; pad_info/orig_hw
    static; fx_scaled = fx * encode-scale; intrinsic_orig = [fx, fy, cx, cy].
    Returns (points (H*W, 3) over the FULL pixel grid — reference keeps
    depth-0 pixels too — and the metric depth map (H, W)).

    The bilinear upsample uses half-pixel source coordinates, matching
    ``torch.nn.functional.interpolate(mode='bilinear')`` with its default
    ``align_corners=False`` (the reference call at metric3d.py:324-325).
    """
    t, b, l, r = pad_info
    h616, w1064 = pred_depth.shape
    cropped = pred_depth[t:h616 - b, l:w1064 - r]
    depth = jax.image.resize(cropped, orig_hw, method="linear")
    metric = jnp.clip(depth * fx_scaled / CANONICAL_FOCAL, 0.0, MAX_DEPTH)
    fu, fv, cu, cv = (intrinsic_orig[0], intrinsic_orig[1],
                      intrinsic_orig[2], intrinsic_orig[3])
    return backproject_depth(metric, fu, fv, cu, cv), metric


def compute_pseudo_lidar(img: np.ndarray, intrinsic, model_fn) -> Tuple[
        np.ndarray, np.ndarray]:
    """Full ``Metric3D.compute_pseudo_lidar`` (metric3d.py:280-288).

    model_fn: (3, 616, 1064) normalized chw -> (616, 1064) canonical depth
    (the pluggable network).  Returns (points (H*W, 3) float32, metric depth
    (H, W) float32) with the reference's exact encode/decode math.
    """
    chw, pad_info, intr_s, _ = encode_image(img, intrinsic)
    pred = np.asarray(model_fn(chw), np.float32)
    pts, metric = metric3d_decode_lift(
        jnp.asarray(pred), tuple(pad_info), tuple(img.shape[:2]),
        jnp.float32(intr_s[0]),
        jnp.asarray([float(v) for v in intrinsic], jnp.float32))
    return np.asarray(pts, np.float32), np.asarray(metric, np.float32)


class DepthBackend(Protocol):
    def predict_depth(self, image: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 RGB -> (H, W) float32 canonical depth
        (original resolution, encode resize factor folded in — see module
        docstring)."""
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
    otherwise.  Uses the shared exact encode/decode math above.
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

    def _infer_canonical(self, chw: np.ndarray) -> np.ndarray:
        import torch

        t = torch.from_numpy(chw)[None].float()
        with torch.no_grad():
            depth, *_ = self.model.inference({"input": t})
        return depth.squeeze().cpu().numpy().astype(np.float32)

    def predict_depth(self, image: np.ndarray) -> np.ndarray:
        """Canonical depth at original resolution, resize factor folded in
        (metric = result * fx_orig / 1000 == reference's
        upsampled * fx_scaled / 1000)."""
        import cv2

        h, w = image.shape[:2]
        # intrinsics don't affect the canonical prediction; encode with a
        # unit intrinsic to reuse the exact resize/pad/normalize math
        chw, pad_info, _, scale = encode_image(image, [1.0, 1.0, 0.0, 0.0])
        pred = self._infer_canonical(chw)
        t, b, l, r = pad_info
        d = pred[t:pred.shape[0] - b, l:pred.shape[1] - r]
        d = cv2.resize(d, (w, h), interpolation=cv2.INTER_LINEAR)
        return (d * scale).astype(np.float32)


class FlaxDepthAnythingBackend:
    """TPU-served monocular depth: the JAX DINOv2+DPT stack
    (``monosowa_tpu.models.depth_anything``, differentially tested against
    the torch implementation) behind the pipeline's canonical-depth
    contract.

    Works with any HuggingFace ``DepthAnythingForDepthEstimation``
    checkpoint imported via ``import_hf_depth_anything`` — for the
    pseudo-LiDAR pipeline use a METRIC checkpoint (e.g. the KITTI
    metric-depth release): ``predict_depth`` converts metric meters to the
    pipeline's canonical contract (metric = value * fx / 1000, matching the
    reference's Metric3D decode at metric3d.py:327-333).

    Preprocessing mirrors the HF DPT image processor: keep-ratio resize of
    the shorter side to ``input_size`` rounded to a multiple of the patch
    size, rescale 1/255, ImageNet-normalize; the prediction is resampled
    back to the input resolution with the torch-exact bicubic.
    """

    IMAGENET01_MEAN = (0.485, 0.456, 0.406)
    IMAGENET01_STD = (0.229, 0.224, 0.225)

    def __init__(self, params, cfg, fx: float, input_size: int = 518):
        from monosowa_tpu.models.depth_anything import depth_anything_forward

        if cfg.depth_estimation_type != "metric":
            raise ValueError(
                "pseudo-LiDAR needs a metric depth checkpoint "
                "(depth_estimation_type='metric'); relative depth has no "
                "scale to canonicalize")
        self.cfg = cfg
        self.fx = float(fx)
        self.input_size = int(input_size)
        self._fwd = jax.jit(
            functools.partial(depth_anything_forward, params, cfg=cfg))

    def _encode(self, image: np.ndarray) -> np.ndarray:
        import cv2

        p = self.cfg.backbone.patch_size
        h, w = image.shape[:2]
        scale = self.input_size / min(h, w)
        nh = max(p, int(round(h * scale / p)) * p)
        nw = max(p, int(round(w * scale / p)) * p)
        img = cv2.resize(np.asarray(image), (nw, nh),
                         interpolation=cv2.INTER_CUBIC)
        img = img.astype(np.float32) / 255.0
        return (img - np.asarray(self.IMAGENET01_MEAN, np.float32)) \
            / np.asarray(self.IMAGENET01_STD, np.float32)

    def predict_metric_depth(self, image: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 RGB -> (H, W) float32 metric depth [m]."""
        from monosowa_tpu.ops.resize import resize_bicubic_torch

        x = self._encode(image)[None]
        pred = self._fwd(jnp.asarray(x))[0]
        out = resize_bicubic_torch(pred[..., None], image.shape[:2])[..., 0]
        return np.asarray(jnp.maximum(out, 0.0), np.float32)

    def predict_depth(self, image: np.ndarray) -> np.ndarray:
        """Canonical depth per the module contract (metric * 1000 / fx)."""
        return (self.predict_metric_depth(image)
                * (CANONICAL_FOCAL / self.fx)).astype(np.float32)


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

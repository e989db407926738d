"""Waymo panorama stitching: homography estimation + side-camera warping.

Behavioral contract (pseudo_label_generator/3d/scripts/stitching.py):

* LoFTR (kornia) matches between the front and side cameras (:29-151) —
  here a pluggable ``MatcherBackend`` (LoFTR needs its checkpoint; any
  correspondence source works);
* RANSAC homography per camera pair with transfer-error inlier scoring
  (:218-379 re-implements kornia's verification);
* per-sequence best-homography selection by total inlier count over all
  frames (find_the_best_homo :153-216);
* side cameras warp into a 1380 x (2*1920+750) panorama
  (image_stitching.height_pxl_pad 100 / width_pxl_pad 750).

The homography math (normalized DLT + RANSAC) is dependency-free numpy and
fully tested; warping uses cv2.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Protocol, Tuple

import numpy as np


class MatcherBackend(Protocol):
    def match(self, img_a: np.ndarray, img_b: np.ndarray
              ) -> Tuple[np.ndarray, np.ndarray]:
        """Two grayscale images -> matched keypoints (N, 2), (N, 2)."""
        ...


def _normalize_points(pts: np.ndarray):
    mean = pts.mean(0)
    scale = np.sqrt(2.0) / max(np.mean(np.linalg.norm(pts - mean, axis=1)),
                               1e-9)
    t = np.array([[scale, 0, -scale * mean[0]],
                  [0, scale, -scale * mean[1]],
                  [0, 0, 1.0]])
    hom = np.hstack([pts, np.ones((len(pts), 1))]) @ t.T
    return hom[:, :2], t


def homography_dlt(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Normalized DLT from >= 4 correspondences -> 3x3 H (src -> dst)."""
    sn, t_s = _normalize_points(src)
    dn, t_d = _normalize_points(dst)
    n = len(src)
    a = np.zeros((2 * n, 9))
    for i in range(n):
        x, y = sn[i]
        u, v = dn[i]
        a[2 * i] = [-x, -y, -1, 0, 0, 0, u * x, u * y, u]
        a[2 * i + 1] = [0, 0, 0, -x, -y, -1, v * x, v * y, v]
    _, _, vt = np.linalg.svd(a)
    h_norm = vt[-1].reshape(3, 3)
    h = np.linalg.inv(t_d) @ h_norm @ t_s
    return h / h[2, 2]


def transfer_error(h: np.ndarray, src: np.ndarray,
                   dst: np.ndarray) -> np.ndarray:
    """Symmetric-free forward transfer error per correspondence
    (stitching.py's kornia oneway re-implementation)."""
    hom = np.hstack([src, np.ones((len(src), 1))]) @ h.T
    proj = hom[:, :2] / np.maximum(np.abs(hom[:, 2:3]), 1e-9) \
        * np.sign(hom[:, 2:3])
    return np.linalg.norm(proj - dst, axis=1)


def ransac_homography(src: np.ndarray, dst: np.ndarray,
                      threshold: float = 3.0, iterations: int = 2000,
                      seed: int = 0) -> Tuple[Optional[np.ndarray], int]:
    """RANSAC H(src->dst); returns (H refit on inliers, inlier count)."""
    n = len(src)
    if n < 4:
        return None, 0
    rng = np.random.default_rng(seed)
    best_mask = None
    best_count = 0
    for _ in range(iterations):
        idx = rng.choice(n, 4, replace=False)
        try:
            h = homography_dlt(src[idx], dst[idx])
        except np.linalg.LinAlgError:
            continue
        err = transfer_error(h, src, dst)
        mask = err < threshold
        c = int(mask.sum())
        if c > best_count:
            best_count = c
            best_mask = mask
    if best_mask is None or best_count < 4:
        return None, 0
    h = homography_dlt(src[best_mask], dst[best_mask])
    return h, best_count


@dataclasses.dataclass
class PanoramaLayout:
    """Waymo 5-camera panorama geometry (config image_stitching.*)."""

    height_pad: int = 100
    width_pad: int = 750
    cam_w: int = 1920
    cam_h: int = 1280

    @property
    def pano_shape(self) -> Tuple[int, int]:
        return (self.cam_h + self.height_pad,
                2 * self.cam_w + 2 * self.width_pad)

    def center_offset(self) -> np.ndarray:
        """Translation placing the front camera at the panorama center."""
        t = np.eye(3)
        t[0, 2] = (self.pano_shape[1] - self.cam_w) / 2
        t[1, 2] = self.height_pad / 2
        return t


def select_best_homography(per_frame_matches: List[Tuple[np.ndarray,
                                                         np.ndarray]],
                           threshold: float = 3.0,
                           iterations: int = 500) -> Optional[np.ndarray]:
    """Per-sequence best homography: estimate H per frame, score each by
    TOTAL inliers across every frame's matches, keep the best.

    Deliberate deviation from find_the_best_homo (stitching.py:153-216):
    the reference's outer frame loop never indexes the match set, so each
    candidate is effectively scored only against its own frame's matches
    (the same sum repeated N times).  Scoring against ALL frames is the
    evidently intended behavior and is kept here — when parity-debugging
    homography selection, compare against own-frame-only scoring."""
    candidates = []
    for i, (src, dst) in enumerate(per_frame_matches):
        h, _ = ransac_homography(src, dst, threshold, iterations, seed=i)
        if h is not None:
            candidates.append(h)
    if not candidates:
        return None
    best_h, best_score = None, -1
    for h in candidates:
        score = 0
        for src, dst in per_frame_matches:
            if len(src):
                score += int((transfer_error(h, src, dst) < threshold).sum())
        if score > best_score:
            best_score, best_h = score, h
    return best_h


def warp_into_panorama(pano: np.ndarray, image: np.ndarray, h: np.ndarray,
                       layout: PanoramaLayout) -> np.ndarray:
    """Warp a side camera into the panorama via H composed with the center
    offset; non-zero warped pixels overwrite."""
    import cv2

    full_h = layout.center_offset() @ h
    warped = cv2.warpPerspective(image, full_h,
                                 (pano.shape[1], pano.shape[0]))
    mask = warped.sum(axis=-1) > 0 if warped.ndim == 3 else warped > 0
    out = pano.copy()
    out[mask] = warped[mask]
    return out


def unwarp_mask(mask_pano: np.ndarray, h: np.ndarray,
                layout: PanoramaLayout, cam_hw: Tuple[int, int]) -> np.ndarray:
    """Panorama-space mask -> original camera frame (inverse warp,
    filtering.py:405-425)."""
    import cv2

    full_h = layout.center_offset() @ h
    return cv2.warpPerspective(
        mask_pano.astype(np.uint8), np.linalg.inv(full_h),
        (cam_hw[1], cam_hw[0])).astype(bool)


class OrbMatcherBackend:
    """Checkpoint-free correspondence backend (OpenCV ORB + ratio test).

    Stands in for kornia LoFTR when its weights are absent; any
    MatcherBackend implementation can replace it.
    """

    def __init__(self, n_features: int = 4000, ratio: float = 0.75):
        import cv2

        self.orb = cv2.ORB_create(nfeatures=n_features)
        self.matcher = cv2.BFMatcher(cv2.NORM_HAMMING)
        self.ratio = ratio

    def match(self, img_a: np.ndarray, img_b: np.ndarray):
        import cv2

        def gray(im):
            if im.ndim == 3:
                return cv2.cvtColor(im.astype(np.uint8), cv2.COLOR_RGB2GRAY)
            return im.astype(np.uint8)

        ka, da = self.orb.detectAndCompute(gray(img_a), None)
        kb, db = self.orb.detectAndCompute(gray(img_b), None)
        if da is None or db is None or len(ka) < 4 or len(kb) < 4:
            return np.zeros((0, 2)), np.zeros((0, 2))
        pairs = self.matcher.knnMatch(da, db, k=2)
        src, dst = [], []
        for pair in pairs:
            if len(pair) < 2:
                continue
            m, n = pair
            if m.distance < self.ratio * n.distance:
                src.append(ka[m.queryIdx].pt)
                dst.append(kb[m.trainIdx].pt)
        return np.asarray(src, np.float64), np.asarray(dst, np.float64)


class FlaxLoFTRMatcherBackend:
    """TPU-served detector-free matcher (``MatcherBackend``).

    Runs the pure-JAX EfficientLoFTR port (``monosowa_tpu.models.
    efficientloftr``, the CVPR'24 successor of the LoFTR matcher the
    reference loads from kornia, stitching.py:29-151) and returns mutually-
    nearest matched keypoint pairs above the coarse confidence threshold.
    Images are resized so both dims are multiples of 32 (the backbone
    stride x aggregation window) and keypoints are mapped back to the
    original pixel grid.
    """

    def __init__(self, params, cfg, input_hw: Tuple[int, int] = (480, 640),
                 min_confidence: Optional[float] = None):
        import functools

        import jax

        from monosowa_tpu.models.efficientloftr import match_pair

        self.cfg = cfg
        self.min_confidence = (cfg.coarse_matching_threshold
                               if min_confidence is None else min_confidence)
        self.input_hw = (input_hw[0] // 32 * 32, input_hw[1] // 32 * 32)
        self._fwd = jax.jit(functools.partial(match_pair, params, cfg=cfg))

    def _gray(self, im: np.ndarray) -> np.ndarray:
        import cv2

        if im.ndim == 3:
            im = cv2.cvtColor(im.astype(np.uint8), cv2.COLOR_RGB2GRAY)
        return cv2.resize(im, (self.input_hw[1], self.input_hw[0]),
                          interpolation=cv2.INTER_AREA
                          ).astype(np.float32) / 255.0

    def match(self, img_a: np.ndarray, img_b: np.ndarray
              ) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        pair = np.stack([self._gray(img_a), self._gray(img_b)])[None]
        kp, scores, matches = self._fwd(jnp.asarray(pair))
        kp = np.asarray(kp[0])            # (2, L, 2) normalized
        scores = np.asarray(scores[0])    # (2, L)
        matches = np.asarray(matches[0])  # (2, L)
        # direction 0: slot j (an image-B cell) holds the matched image-A
        # cell index i = matches[0][j]; by mutual-nearest symmetry the
        # refined image-B coordinates of that same pair live at kp[1][i]
        keep = np.flatnonzero((matches[0] >= 0)
                              & (scores[0] > self.min_confidence))
        if keep.size == 0:
            return np.zeros((0, 2)), np.zeros((0, 2))
        src = kp[0][keep] * [img_a.shape[1], img_a.shape[0]]
        dst = kp[1][matches[0][keep]] * [img_b.shape[1], img_b.shape[0]]
        return src.astype(np.float64), dst.astype(np.float64)


def estimate_sequence_homography(frames_a, frames_b,
                                 matcher: Optional[MatcherBackend] = None,
                                 threshold: float = 3.0,
                                 iterations: int = 500):
    """Per-sequence best homography A->B from frame pair lists
    (perform_img_stitching + find_the_best_homo composition)."""
    matcher = matcher or OrbMatcherBackend()
    per_frame = []
    for ia, ib in zip(frames_a, frames_b):
        src, dst = matcher.match(ia, ib)
        if len(src) >= 4:
            per_frame.append((src, dst))
    if not per_frame:
        return None
    return select_best_homography(per_frame, threshold, iterations)

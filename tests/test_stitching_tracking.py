"""Homography estimation + 2D tracking tests (pure math, no external models)."""

import numpy as np
import pytest

from monosowa_tpu.sowa import stitching, tracker2d


def _apply_h(h, pts):
    hom = np.hstack([pts, np.ones((len(pts), 1))]) @ h.T
    return hom[:, :2] / hom[:, 2:3]


def test_dlt_recovers_exact_homography():
    rng = np.random.default_rng(0)
    h_true = np.array([[1.1, 0.05, 30.0], [-0.03, 0.95, -12.0],
                       [1e-4, -5e-5, 1.0]])
    src = rng.uniform(0, 1000, (20, 2))
    dst = _apply_h(h_true, src)
    h = stitching.homography_dlt(src, dst)
    np.testing.assert_allclose(h, h_true / h_true[2, 2], atol=1e-6)


def test_ransac_rejects_outliers():
    rng = np.random.default_rng(1)
    h_true = np.array([[1.0, 0.0, 50.0], [0.0, 1.0, -20.0], [0, 0, 1.0]])
    src = rng.uniform(0, 1000, (100, 2))
    dst = _apply_h(h_true, src) + rng.normal(scale=0.3, size=(100, 2))
    # corrupt 30%
    dst[:30] += rng.uniform(50, 200, (30, 2))
    h, inliers = stitching.ransac_homography(src, dst, threshold=3.0,
                                             iterations=300)
    assert inliers >= 65
    err = stitching.transfer_error(h, src[30:], dst[30:])
    assert np.median(err) < 1.5


def test_select_best_homography_across_frames():
    rng = np.random.default_rng(2)
    h_true = np.array([[1.0, 0.02, 80.0], [0.01, 1.0, 5.0], [0, 0, 1.0]])
    frames = []
    for f in range(4):
        src = rng.uniform(0, 1000, (40, 2))
        noise = 0.2 if f != 2 else 30.0   # frame 2 is garbage
        dst = _apply_h(h_true, src) + rng.normal(scale=noise, size=(40, 2))
        frames.append((src, dst))
    h = stitching.select_best_homography(frames, iterations=200)
    assert h is not None
    src = rng.uniform(0, 1000, (50, 2))
    np.testing.assert_allclose(_apply_h(h, src), _apply_h(h_true, src),
                               atol=3.0)


def test_panorama_layout_and_camera_mapping():
    layout = stitching.PanoramaLayout()
    ph, pw = layout.pano_shape
    assert ph == 1380 and pw == 2 * 1920 + 1500
    # front camera occupies the center band
    assert tracker2d.camera_of_box(np.array([pw / 2 - 10, 0, pw / 2 + 10, 50]),
                                   pw) == 0
    assert tracker2d.camera_of_box(np.array([10, 0, 60, 50]), pw) == -1
    assert tracker2d.camera_of_box(np.array([pw - 60, 0, pw - 10, 50]),
                                   pw) == 1


def test_box_iou_and_overlap_filter():
    a = np.array([0, 0, 10, 10], float)
    b = np.array([5, 0, 15, 10], float)
    c = np.array([100, 100, 110, 110], float)
    assert tracker2d.box_iou(a, a) == pytest.approx(1.0)
    assert tracker2d.box_iou(a, b) == pytest.approx(50 / 150)
    keep = tracker2d.filter_overlapping_detections([a, b, c])
    assert keep == [0, 2]


def test_template_tracker_follows_moving_patch():
    rng = np.random.default_rng(3)
    frames = []
    for f in range(5):
        img = rng.uniform(0, 50, (120, 200)).astype(np.float32)
        x = 40 + 6 * f
        img[50:70, x:x + 20] = 255.0
        frames.append(img)
    masks = [[np.array([40 + 6 * f, 50, 60 + 6 * f, 70], float)]
             for f in range(5)]
    tracks = tracker2d.track_masks(frames, [masks[0][0]], masks)
    assert len(tracks) == 1
    t = tracks[0]
    # tracker re-associates with the detection in the final frame
    assert t.matched_mask_idx[-1] == 0
    final = t.boxes[-1]
    assert abs(final[0] - (40 + 24)) < 6


def test_orb_matcher_and_sequence_homography():
    """End-to-end offline stitching: textured synthetic frames related by a
    known homography -> ORB matches -> recovered H."""
    rng = np.random.default_rng(9)
    base = (rng.uniform(0, 255, (240, 320)) > 127).astype(np.uint8) * 255
    import cv2
    base = cv2.GaussianBlur(base, (5, 5), 0)
    h_true = np.array([[1.0, 0.02, 25.0], [-0.01, 1.0, 8.0], [0, 0, 1.0]])
    frames_a, frames_b = [], []
    for k in range(3):
        shift = np.eye(3)
        shift[0, 2] = 5.0 * k
        a = cv2.warpPerspective(base, shift, (320, 240))
        b = cv2.warpPerspective(a, h_true, (320, 240))
        frames_a.append(a)
        frames_b.append(b)
    h = stitching.estimate_sequence_homography(frames_a, frames_b,
                                               iterations=300)
    assert h is not None
    pts = np.random.default_rng(1).uniform(40, 200, (30, 2))
    got = stitching.transfer_error(h, pts, _apply_h(h_true, pts))
    assert np.median(got) < 2.0

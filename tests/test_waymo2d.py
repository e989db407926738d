"""Waymo pair stitching + panorama 2D tracking (sowa/waymo2d.py) against the
reference contracts (stitching.py:29-216, tracker_ODTrack.py:60-375,
filtering.py:405-425, loader.py:701-754)."""

import numpy as np
import pytest

from monosowa_tpu.sowa import waymo2d
from monosowa_tpu.sowa.waymo2d import PAIRS, PairLayout

LAYOUT = PairLayout(cam_h=80, cam_w=120, side_h=56, height_pad=10,
                    width_pad=30)


def _translation_h(tx, ty):
    h = np.eye(3)
    h[0, 2], h[1, 2] = tx, ty
    return h


def _true_homos():
    """Simple ground-truth canvas placements: each warped camera sits next
    to its fixed partner with a small offset."""
    cw, y0 = LAYOUT.cam_w, LAYOUT.paste_y0
    right_x0 = LAYOUT.canvas_hw[1] - cw
    return [
        _translation_h(right_x0 - cw + 8, y0 + 2),    # pair0: left of right slot
        _translation_h(right_x0 - cw + 8, y0 + 2),    # pair1
        _translation_h(cw - 8, y0 + 2),               # pair2: right of left slot
        _translation_h(cw - 8, y0 + 2),               # pair3
    ]


def test_stitch_and_unwarp_roundtrip():
    rng = np.random.default_rng(0)
    img_a = rng.uniform(0, 255, (LAYOUT.cam_h, LAYOUT.cam_w, 3))
    img_b = rng.uniform(0, 255, (LAYOUT.cam_h, LAYOUT.cam_w, 3))
    homo = _true_homos()[1]
    canvas = waymo2d.stitch_pair(img_a, img_b, homo, True, LAYOUT)
    assert canvas.shape[:2] == LAYOUT.canvas_hw
    # the fixed image occupies its slot exactly
    ys, xs = LAYOUT.paste_slice(True)
    np.testing.assert_allclose(canvas[ys, xs], img_b)

    # a canvas mask inside the fixed slot unwarps to the fixed camera
    mask = np.zeros(LAYOUT.canvas_hw, bool)
    mask[ys.start + 10:ys.start + 20, xs.start + 30:xs.start + 50] = True
    m, slot = waymo2d.pano_mask_to_camera(mask, 1, _true_homos(), LAYOUT)
    assert slot == 2                       # pair1 fixed = front (slot 2)
    assert m.shape == (LAYOUT.cam_h, LAYOUT.cam_w)
    assert m[10:20, 30:50].all() and m.sum() == 200

    # a canvas mask inside the warped region unwarps to the warped camera
    mask2 = np.zeros(LAYOUT.canvas_hw, bool)
    # homo is a translation: camera pixel (r, c) -> canvas (r+ty, c+tx)
    tx, ty = int(homo[0, 2]), int(homo[1, 2])
    mask2[ty + 20:ty + 30, tx + 10:tx + 40] = True
    m2, slot2 = waymo2d.pano_mask_to_camera(mask2, 1, _true_homos(), LAYOUT)
    assert slot2 == 1                      # pair1 warped = front-left (slot 1)
    assert m2[20:30, 10:40].sum() >= 0.9 * 300


def test_side_camera_padding_and_crop():
    """Side cameras are top-padded to cam_h; their unwarped masks crop to
    the bottom side_h rows (stitching.py:294-296, loader.py:705-710)."""
    side = np.ones((LAYOUT.side_h, LAYOUT.cam_w, 3))
    padded = waymo2d.pad_side_image(side, LAYOUT)
    assert padded.shape[0] == LAYOUT.cam_h
    assert padded[:LAYOUT.cam_h - LAYOUT.side_h].sum() == 0

    homos = _true_homos()
    mask = np.zeros(LAYOUT.canvas_hw, bool)
    tx, ty = int(homos[0][0, 2]), int(homos[0][1, 2])
    # mask in the warped (side-left) region, in the VALID bottom rows
    pad_rows = LAYOUT.cam_h - LAYOUT.side_h
    mask[ty + pad_rows + 5:ty + pad_rows + 15, tx + 10:tx + 30] = True
    m, slot = waymo2d.pano_mask_to_camera(mask, 0, homos, LAYOUT)
    assert slot == 0
    assert m.shape == (LAYOUT.side_h, LAYOUT.cam_w)
    assert m[5:15, 10:30].sum() >= 0.9 * 200


class _OracleMatcher:
    """Matcher that emits exact correspondences from the true homographies
    (keyed by which pair the image sizes/pointers identify)."""

    def __init__(self, homos, layout):
        self.homos = homos
        self.layout = layout
        self.calls = 0

    def match(self, img_src, img_dst):
        # identify the pair by the call counter (4 pairs per frame)
        z = self.calls % 4
        self.calls += 1
        rng = np.random.default_rng(z)
        pts = rng.uniform([0, 0], [self.layout.cam_w, self.layout.cam_h],
                          (24, 2))
        h = self.homos[z]
        hom = np.hstack([pts, np.ones((24, 1))]) @ h.T
        dst_canvas = hom[:, :2] / hom[:, 2:3]
        # the matcher reports dst in the FIXED image's own coords; the
        # estimator lifts them into canvas coords by the paste offset
        ys, xs = self.layout.paste_slice(PAIRS[z][2])
        dst = dst_canvas - [xs.start, ys.start]
        return pts, dst


def test_estimate_pair_homographies_recovers_truth():
    homos_true = _true_homos()
    matcher = _OracleMatcher(homos_true, LAYOUT)
    imgs = [np.zeros((LAYOUT.side_h if s in (0, 4) else LAYOUT.cam_h,
                      LAYOUT.cam_w, 3)) for s in range(5)]
    est = waymo2d.estimate_pair_homographies(
        lambda i: imgs, n_frames=3, matcher=matcher, layout=LAYOUT)
    for z in range(4):
        assert est[z] is not None
        np.testing.assert_allclose(est[z] / est[z][2, 2], homos_true[z],
                                   atol=1e-4)


def _moving_square_sequence(n_frames=6):
    """A bright square moving right on pair-1 canvases + det masks."""
    rng = np.random.default_rng(3)
    homos = _true_homos()
    stitched, det_masks = [], []
    # the square lives inside pair 1's FIXED front slot — staying there
    # keeps check_for_image_switch from (correctly) handing the track to
    # pair 0, which is exercised separately below
    slot_x0 = LAYOUT.paste_slice(True)[1].start
    for f in range(n_frames):
        canvases = [rng.uniform(0, 40, LAYOUT.canvas_hw + (3,))
                    for _ in range(4)]
        x0, y0 = slot_x0 + 12 + 6 * f, 40
        canvases[1][y0:y0 + 12, x0:x0 + 16] = 255.0
        mask = np.zeros(LAYOUT.canvas_hw, bool)
        mask[y0:y0 + 12, x0:x0 + 16] = True
        stitched.append(canvases)
        frame_masks = [[], [mask], [], []]
        det_masks.append(frame_masks)
    return stitched, det_masks, homos


def test_track_pair_sequence_associates_all_frames():
    stitched, det_masks, homos = _moving_square_sequence()
    cars = waymo2d.track_pair_sequence(stitched, det_masks, homos, LAYOUT)
    assert len(cars) == 1
    obs = cars[0]
    assert [o[0] for o in obs] == list(range(len(stitched)))
    assert all(o[1] == 1 for o in obs)


def test_image_switch_pair1_to_pair0():
    """An object absent from pair 1's fixed front slot for 2 consecutive
    frames hands the track to pair 0 (check_for_image_switch :329-343)."""
    homos = _true_homos()
    bbox = [10, 40, 16, 12]        # far left: not in the right (front) slot
    pair, rdy, sw = waymo2d.check_for_image_switch(
        bbox, 1, 0, 0, homos, LAYOUT)
    assert (pair, rdy, sw) == (1, 1, 0)
    pair, rdy, sw = waymo2d.check_for_image_switch(
        bbox, 1, rdy, 0, homos, LAYOUT)
    assert (pair, rdy, sw) == (0, 0, 3)


def test_iou_xywh_reference_convention():
    # +1 pixel convention (tracker_ODTrack.compute_iou :283-302)
    assert waymo2d._iou_xywh([0, 0, 10, 10], [0, 0, 10, 10]) == pytest.approx(
        (11 * 11) / (200 - 121))


def test_camera_transforms_from_vehicle():
    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[0, 0, 3] = -2.0     # vehicle 2 m behind ref along +x (forward)
    poses[2, 0, 3] = 2.0
    t = waymo2d.camera_transforms_from_vehicle(poses, ref_idx=1)
    np.testing.assert_allclose(t[1], np.eye(4), atol=1e-12)
    # forward (+x vehicle) = +z camera: frame 0's points land 2 m closer
    p = np.array([0.0, 0.0, 10.0, 1.0])    # camera-frame point
    np.testing.assert_allclose((t[0] @ p)[:3], [0, 0, 8.0], atol=1e-9)
    np.testing.assert_allclose((t[2] @ p)[:3], [0, 0, 12.0], atol=1e-9)


def test_gather_mask_points_uses_uv_and_camera_id():
    mask = np.zeros((20, 30), bool)
    mask[5:10, 10:20] = True
    lidar = np.array([
        [1.0, 2.0, 3.0, 1, 12, 7],     # front cam, inside mask
        [4.0, 5.0, 6.0, 1, 2, 2],      # front cam, outside mask
        [7.0, 8.0, 9.0, 2, 12, 7],     # other cam, same pixel
        [1.5, 2.5, 3.5, 1, 29, 19],    # inside image, outside mask
    ])
    pts = waymo2d.gather_mask_points(mask, 2, lidar)   # slot 2 = cam id 1
    np.testing.assert_allclose(pts, [[1.0, 2.0, 3.0]])


def test_stitch_frame_none_homography_keeps_fixed_slot():
    """A pair whose sequence-wide homography is None (under 4 matches in
    every frame) still stitches: the canvas holds only the pasted fixed
    camera instead of crashing in warpPerspective."""
    rng = np.random.default_rng(5)
    imgs = [rng.uniform(0, 255, ((LAYOUT.side_h if s in (0, 4)
                                  else LAYOUT.cam_h), LAYOUT.cam_w, 3))
            for s in range(5)]
    homos = _true_homos()
    homos[0] = None
    canvases = waymo2d.stitch_frame(imgs, homos, LAYOUT)
    assert len(canvases) == 4
    ys, xs = LAYOUT.paste_slice(True)
    np.testing.assert_allclose(canvases[0][ys, xs],
                               waymo2d.pad_side_image(imgs[1], LAYOUT))
    # everything outside the fixed slot is empty (nothing was warped)
    outside = canvases[0].copy()
    outside[ys, xs] = 0
    assert outside.sum() == 0
    # unwarping a mask against the None pair yields only the fixed mask
    mask = np.zeros(LAYOUT.canvas_hw, bool)
    mask[ys.start + 3:ys.start + 8, xs.start + 4:xs.start + 9] = True
    m, slot = waymo2d.pano_mask_to_camera(mask, 0, homos, LAYOUT)
    assert slot == 1 and m.sum() == 25


def test_tracks_from_2d_unions_points_from_both_cameras():
    """Seam-straddling masks gather lidar from BOTH cameras of the pair
    (extract_lidar_features unions in-mask points, filtering.py:164-280),
    not just the larger-mask camera."""
    homos = _true_homos()
    ys, xs = LAYOUT.paste_slice(True)
    # pair-1 canvas mask with a large part in the FIXED front slot and a
    # smaller part in the warped front-left region
    mask = np.zeros(LAYOUT.canvas_hw, bool)
    mask[ys.start + 10:ys.start + 30, xs.start + 10:xs.start + 30] = True
    tx, ty = int(homos[1][0, 2]), int(homos[1][1, 2])
    mask[ty + 10:ty + 20, tx + 10:tx + 20] = True     # warped region (100px)

    # one lidar point lands in each camera's mask
    # slots: front=2 -> cam id 1; front-left=1 -> cam id 2
    fused = np.array([
        [1.0, 0.0, 5.0, 1, 15, 15],    # front cam, inside fixed mask
        [1.2, 0.0, 5.2, 2, 15, 15],    # front-left cam, inside warped mask
        [9.0, 9.0, 9.0, 1, 100, 70],   # front cam, outside mask
    ])
    fused = np.repeat(fused, 6, axis=0)   # clear min_points=10 when unioned
    cars = [[(0, 1, 0)]]
    det_masks = [[[], [mask], [], []]]
    transforms = np.tile(np.eye(4), (1, 1, 1))
    tracks = waymo2d.tracks_from_2d(
        cars, det_masks, [fused], homos, transforms, ref_frame=0,
        window=[0], layout=LAYOUT, min_points=10)
    assert len(tracks) == 1
    # 12 points total: 6 from each camera — single-camera gathering would
    # have found only 6 (front) and the other camera's 6 would be lost
    assert len(tracks[0].points[0]) == 12

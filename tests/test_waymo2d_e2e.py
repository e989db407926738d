"""End-to-end Waymo 2D-tracker path on a synthetic multi-camera scene:
5-camera frames -> per-pair homographies -> stitched pair canvases ->
detection masks -> panorama tracking -> un-warping + fused-lidar gather ->
moving/standing -> aggregation -> grid fit -> KITTI labels.

This is the tracker_for_merging: '2D' Waymo product path
(main_class.py:60-66 perform_stitching_and_trackingV2 +
load_and_prepare_lidar_scan_from_multiple_waymo_tracker) rebuilt on
sowa.waymo2d + the standard PseudoLabeler fit."""

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.ops.geometry import rot_y
from monosowa_tpu.sowa import aggregation, lomm, pipeline, waymo2d
from monosowa_tpu.sowa.fitting import FitConfig
from monosowa_tpu.sowa.templates import TemplateBank
from monosowa_tpu.sowa.waymo2d import VEHICLE_TO_CAM, PairLayout

LAYOUT = PairLayout(cam_h=80, cam_w=120, side_h=56, height_pad=10,
                    width_pad=30)
F, CX, CY = 100.0, 60.0, 40.0
TRUE_POSE = dict(x=1.0, y=0.9, z=14.0, theta=0.6)   # camera frame
N_FRAMES = 7


def _true_homos():
    cw, y0 = LAYOUT.cam_w, LAYOUT.paste_y0
    right_x0 = LAYOUT.canvas_hw[1] - cw
    def t(tx, ty):
        h = np.eye(3)
        h[0, 2], h[1, 2] = tx, ty
        return h
    return [t(right_x0 - cw + 8, y0 + 2), t(right_x0 - cw + 8, y0 + 2),
            t(cw - 8, y0 + 2), t(cw - 8, y0 + 2)]


def _build_scene(seed=0):
    rng = np.random.default_rng(seed)
    bank = TemplateBank.default()
    rot = np.asarray(rot_y(jnp.float32(TRUE_POSE["theta"])))
    car_cam_ref = bank.points[0] @ rot.T + np.array(
        [TRUE_POSE["x"], TRUE_POSE["y"], TRUE_POSE["z"]])
    # world = ref-frame VEHICLE coords (camera -> vehicle)
    car_world = car_cam_ref @ np.linalg.inv(VEHICLE_TO_CAM).T

    ref = N_FRAMES // 2
    poses = []
    lidars, det_masks, stitched = [], [], []
    homos = _true_homos()
    ys_slot, xs_slot = LAYOUT.paste_slice(True)
    for k in range(N_FRAMES):
        pose = np.eye(4)
        pose[0, 3] = (k - ref) * 0.5          # ego forward (+x vehicle)
        poses.append(pose)
        car_veh = car_world - pose[:3, 3]
        car_veh += rng.normal(scale=0.02, size=car_veh.shape)
        ground_cam = np.stack([rng.uniform(-6, 6, 800),
                               np.full(800, 1.66),
                               rng.uniform(4, 30, 800)], 1)
        ground_veh = ground_cam @ np.linalg.inv(VEHICLE_TO_CAM).T
        pts_veh = np.concatenate([car_veh, ground_veh])

        pts_cam = pts_veh @ VEHICLE_TO_CAM.T
        u = F * pts_cam[:, 0] / pts_cam[:, 2] + CX
        v = F * pts_cam[:, 1] / pts_cam[:, 2] + CY
        vis = ((pts_cam[:, 2] > 1) & (u >= 0) & (u < LAYOUT.cam_w)
               & (v >= 0) & (v < LAYOUT.cam_h))
        fused = np.concatenate(
            [pts_veh[vis], np.full((vis.sum(), 1), 1.0),
             np.stack([u[vis], v[vis]], 1)], 1)
        lidars.append(fused)

        # front-camera car mask from the car's projection, dilated
        import scipy.ndimage
        cam_mask = np.zeros((LAYOUT.cam_h, LAYOUT.cam_w), bool)
        car_vis = vis[:len(car_veh)]
        cu = np.rint(u[:len(car_veh)][car_vis]).astype(int)
        cv_ = np.rint(v[:len(car_veh)][car_vis]).astype(int)
        cam_mask[np.clip(cv_, 0, LAYOUT.cam_h - 1),
                 np.clip(cu, 0, LAYOUT.cam_w - 1)] = True
        cam_mask = scipy.ndimage.binary_dilation(cam_mask, iterations=2)

        # the front camera is the fixed slot of BOTH pair 1 (right slot)
        # and pair 2 (left slot) — like the reference's detector, the car
        # is detected on both canvases (get_all_masks runs per pair;
        # overlap filtering is per pair, tracker_ODTrack.py:163-196)
        ys2, xs2 = LAYOUT.paste_slice(False)
        pano1 = np.zeros(LAYOUT.canvas_hw, bool)
        pano1[ys_slot, xs_slot] = cam_mask
        pano2 = np.zeros(LAYOUT.canvas_hw, bool)
        pano2[ys2, xs2] = cam_mask
        det_masks.append([[], [pano1], [pano2], []])

        canvases = [np.full(LAYOUT.canvas_hw + (3,), 20.0)
                    for _ in range(4)]
        canvases[1][pano1] = 230.0
        canvases[2][pano2] = 230.0
        stitched.append(canvases)
    return poses, lidars, det_masks, stitched, homos, ref


def test_waymo_2d_path_recovers_car():
    poses, lidars, det_masks, stitched, homos, ref = _build_scene()

    cars2d = waymo2d.track_pair_sequence(stitched, det_masks, homos, LAYOUT)
    assert len(cars2d) >= 1
    # the longest track covers every frame (the car sits in the right half
    # of the front image, so its stable home is pair 2 — the pair-1 seed
    # hands off and dies, exactly like the reference's switch logic)
    obs = max(cars2d, key=len)
    assert len(obs) == N_FRAMES

    window = list(range(-ref, N_FRAMES - ref))
    transforms_cam = waymo2d.camera_transforms_from_vehicle(
        np.stack(poses), ref)
    tracks = waymo2d.tracks_from_2d(
        cars2d, det_masks, lidars, homos, transforms_cam, ref, window,
        LAYOUT)
    assert len(tracks) >= 1
    lomm.classify_all(tracks, method="both5")
    kept, points, ref_masks = aggregation.aggregate_tracks(
        tracks, transforms_cam, window, keep_k=10, min_points=400)
    # the duplicate pair-1 seed may survive as a second candidate; the
    # pipeline's 3D NMS dedups it below
    assert len(kept) >= 1 and not kept[0].moving

    cfg = pipeline.PipelineConfig(
        nscans_before=ref, nscans_after=N_FRAMES - 1 - ref, max_cars=4,
        max_points=1024, min_standing_points=400,
        fit=FitConfig(fine_chunk=12))
    labeler = pipeline.PseudoLabeler(cfg)
    cars = labeler.label_from_cars(kept, points, ref_masks, window)
    assert len(cars) == 1
    car = cars[0]
    assert car["x"] == pytest.approx(TRUE_POSE["x"], abs=0.35)
    assert car["z"] == pytest.approx(TRUE_POSE["z"], abs=0.35)
    # the 2D-tracked gather keeps every point projecting into the mask —
    # including ground rows under/behind the car (extract_lidar_features
    # has no erosion/radius filter; the reference optionally cleans this
    # up with CAAR growing, use_growing_for_point_extraction) — so y sits
    # between the car center and the ground plane
    assert car["y"] == pytest.approx(TRUE_POSE["y"], abs=0.55)
    dtheta = (car["theta"] - TRUE_POSE["theta"] + np.pi) % (2 * np.pi) - np.pi
    assert min(abs(dtheta), abs(abs(dtheta) - np.pi)) < np.deg2rad(8)
    # the ref-frame FRONT-camera mask feeds the 2D box
    assert car["box2d"] is not None

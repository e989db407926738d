"""Real-LiDAR (velodyne) branch: .bin loader contract, velo->cam prep, the
hidden-standing live-scan filter (incl. the reference's len(lims) quirk),
and an end-to-end labelling run with use_pseudo_lidar=False.

Reference: utils2.py:6-9 (loader), loader.py:3337-3352 (velo->cam),
loader.py:851-875 (hidden standing), config.yaml use_pseudo_lidar switch.
"""

import numpy as np
import pytest

from monosowa_tpu.kittiio.velodyne import load_velo_scan, velo_to_cam
from monosowa_tpu.sowa import aggregation
from monosowa_tpu.sowa.lomm import Track

# KITTI-style velodyne->cam2 axis permutation (forward x -> z, left y -> -x,
# up z -> -y) with a small lever arm
T_CAM_VELO = np.array([[0, -1, 0, 0.06],
                       [0, 0, -1, -0.08],
                       [1, 0, 0, -0.27],
                       [0, 0, 0, 1]], np.float64)


def test_load_velo_scan_contract(tmp_path):
    pts = np.arange(24, dtype=np.float32).reshape(6, 4)
    path = tmp_path / "000000.bin"
    pts.tofile(str(path))
    got = load_velo_scan(str(path))
    assert got.shape == (6, 4) and got.dtype == np.float32
    np.testing.assert_array_equal(got, pts)


def test_velo_to_cam_math_and_zfilter():
    velo = np.array([[10.0, 1.0, -1.0, 0.5],     # in front (cam z = 10)
                     [-5.0, 0.0, 0.0, 0.1]],     # behind (cam z = -5)
                    np.float32)
    cam = velo_to_cam(velo, T_CAM_VELO)
    assert cam.shape == (1, 3)
    np.testing.assert_allclose(
        cam[0], [-1.0 + 0.06, 1.0 - 0.08, 10.0 - 0.27], atol=1e-6)
    cam_all = velo_to_cam(velo, T_CAM_VELO, filter_points=False)
    assert cam_all.shape == (2, 3)


def _standing_track(points, n_frames=4):
    """A standing track whose every observation carries ``points``."""
    return Track(frames=list(range(-1, n_frames - 1)),
                 locations=[np.append(np.median(points, 0), f)
                            for f in range(-1, n_frames - 1)],
                 points=[points.copy() for _ in range(n_frames)],
                 masks=[np.ones((8, 8), bool)] * n_frames)


def test_hidden_standing_quirk_and_strict():
    rng = np.random.default_rng(0)
    car = rng.normal(size=(1200, 3)).astype(np.float32) + [0, 1, 12]
    scan_with = np.concatenate(
        [car[:50] + rng.normal(scale=0.02, size=(50, 3)),
         rng.uniform(-20, 20, (500, 3))]).astype(np.float32)
    scan_without = (rng.uniform(30, 60, (500, 3))).astype(np.float32)

    # shipped reference behavior: len(lims) > 0 is always true -> keep
    assert aggregation.hidden_standing_keep_real(car, scan_without,
                                                 strict=False)
    # strict (intended) semantics
    assert aggregation.hidden_standing_keep_real(car, scan_with, strict=True)
    assert not aggregation.hidden_standing_keep_real(car, scan_without,
                                                    strict=True)


def test_aggregate_tracks_real_lidar_branches():
    rng = np.random.default_rng(1)
    visible = rng.normal(scale=0.5, size=(600, 3)).astype(np.float32) \
        + [0, 1, 10]
    hidden = rng.normal(scale=0.5, size=(600, 3)).astype(np.float32) \
        + [6, 1, 30]
    # a distant car (pseudo-lidar branch would drop it at 75 m; the real
    # branch must keep it)
    distant = rng.normal(scale=0.5, size=(600, 3)).astype(np.float32) \
        + [0, 1, 90]
    ref_scan = np.concatenate(
        [visible + rng.normal(scale=0.02, size=visible.shape)
         .astype(np.float32),
         distant + rng.normal(scale=0.02, size=distant.shape)
         .astype(np.float32),
         rng.uniform(-30, 30, (400, 3)).astype(np.float32)])
    tracks = [_standing_track(visible), _standing_track(hidden),
              _standing_track(distant)]
    window = list(range(-1, 3))
    transforms = np.tile(np.eye(4), (len(window), 1, 1))

    kept, pts, masks = aggregation.aggregate_tracks(
        tracks, transforms, window, keep_k=10, min_points=100,
        use_pseudo_lidar=False, ref_scan=ref_scan, strict_hidden=True)
    assert len(kept) == 2          # hidden car dropped, distant kept

    kept_q, _, _ = aggregation.aggregate_tracks(
        tracks, transforms, window, keep_k=10, min_points=100,
        use_pseudo_lidar=False, ref_scan=ref_scan, strict_hidden=False)
    assert len(kept_q) == 3        # reference quirk: filter is a no-op

    kept_p, _, _ = aggregation.aggregate_tracks(
        tracks, transforms, window, keep_k=10, min_points=100,
        use_pseudo_lidar=True)
    # pseudo branch: distant car dropped at 75 m, hidden kept (has masks)
    assert len(kept_p) == 2


def test_e2e_velodyne_labeling(tmp_path):
    """Label a synthetic VELODYNE scene end-to-end with
    use_pseudo_lidar=False: .bin files -> velo_to_cam -> PseudoLabeler."""
    import jax.numpy as jnp

    from monosowa_tpu.kittiio import read_label_file
    from monosowa_tpu.ops.geometry import rot_y
    from monosowa_tpu.sowa import pipeline
    from monosowa_tpu.sowa.fitting import FitConfig
    from monosowa_tpu.sowa.templates import TemplateBank

    h, w = 180, 400
    p2 = np.array([[250.0, 0, w / 2, 0], [0, 250.0, h / 2, 0], [0, 0, 1, 0]])
    true = dict(x=1.0, y=0.9, z=14.0, theta=0.6)
    rng = np.random.default_rng(0)
    bank = TemplateBank.default()
    rot = np.asarray(rot_y(jnp.float32(true["theta"])))
    car_ref = bank.points[0] @ rot.T + np.array(
        [true["x"], true["y"], true["z"]])

    inv = np.linalg.inv(T_CAM_VELO)
    n_frames, ref = 7, 3
    pts_cam_frames, masks_frames, transforms = [], [], []
    import scipy.ndimage
    for k in range(n_frames):
        t_cur_to_ref = np.eye(4)
        t_cur_to_ref[2, 3] = (k - ref) * -0.5
        transforms.append(t_cur_to_ref)
        t_ref_to_cur = np.linalg.inv(t_cur_to_ref)
        car_cur = car_ref @ t_ref_to_cur[:3, :3].T + t_ref_to_cur[:3, 3]
        car_cur = car_cur + rng.normal(scale=0.02, size=car_cur.shape)
        ground = np.stack([rng.uniform(-8, 8, 800), np.full(800, 1.66),
                           rng.uniform(4, 30, 800)], 1)
        cam = np.concatenate([car_cur, ground])
        # write a velodyne .bin in the VELO frame, then go through the
        # real loader + transform path
        velo = (np.hstack([cam, np.ones((len(cam), 1))]) @ inv.T)[:, :3]
        velo = np.hstack([velo,
                          rng.uniform(0, 1, (len(velo), 1))]) \
            .astype(np.float32)
        path = tmp_path / f"{k:010d}.bin"
        velo.tofile(str(path))
        got_cam = velo_to_cam(load_velo_scan(str(path)), T_CAM_VELO)
        pts_cam_frames.append(got_cam)

        hom = np.hstack([car_cur, np.ones((len(car_cur), 1))]) @ p2.T
        uv = np.rint(hom[:, :2] / hom[:, 2:3]).astype(int)
        ok = ((uv[:, 0] >= 0) & (uv[:, 0] < w) & (uv[:, 1] >= 0)
              & (uv[:, 1] < h))
        mask = np.zeros((h, w), bool)
        mask[uv[ok, 1], uv[ok, 0]] = True
        masks_frames.append([scipy.ndimage.binary_dilation(mask,
                                                           iterations=3)])

    cfg = pipeline.PipelineConfig(
        nscans_before=3, nscans_after=3, max_cars=4, max_points=2048,
        min_standing_points=400, use_pseudo_lidar=False,
        strict_hidden_standing=True,
        fit=FitConfig(n_dx=12, n_dz=12, n_theta=16, fine_chunk=12))
    labeler = pipeline.PseudoLabeler(cfg)
    out = tmp_path / "000003.txt"
    cars = labeler.label_and_write(
        str(out), list(range(-3, 4)), 3,
        get_points=lambda k: pts_cam_frames[k],
        get_masks=lambda k: masks_frames[k],
        transforms=np.stack(transforms), p2=p2, img_hw=(h, w))
    assert cars is not None and len(cars) == 1
    car = cars[0]
    assert abs(car["x"] - true["x"]) < 0.4
    assert abs(car["z"] - true["z"]) < 0.4
    labels = read_label_file(str(out))
    assert labels.names == ["Car"]

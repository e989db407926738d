"""Synthetic end-to-end pseudo-labeling test: a rendered car across a short
ego-motion window -> label file with the correct pose."""

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.kittiio import read_label_file
from monosowa_tpu.ops.geometry import rot_y
from monosowa_tpu.sowa import pipeline
from monosowa_tpu.sowa.fitting import FitConfig
from monosowa_tpu.sowa.templates import TemplateBank

H, W = 180, 400
P2 = np.array([[250.0, 0, W / 2, 0], [0, 250.0, H / 2, 0], [0, 0, 1, 0]])

TRUE_POSE = dict(x=1.0, y=0.9, z=14.0, theta=0.6)


def _make_scene(n_frames=7, seed=0):
    """Returns (points_per_frame, masks_per_frame, transforms)."""
    rng = np.random.default_rng(seed)
    bank = TemplateBank.default()
    car_local = bank.points[0]
    rot = np.asarray(rot_y(jnp.float32(TRUE_POSE["theta"])))
    car_ref = car_local @ rot.T + np.array(
        [TRUE_POSE["x"], TRUE_POSE["y"], TRUE_POSE["z"]])

    pts_frames, mask_frames, transforms = [], [], []
    ref = n_frames // 2
    for k in range(n_frames):
        # ego moves forward 0.5 m/frame along +z
        t_cur_to_ref = np.eye(4)
        t_cur_to_ref[2, 3] = (k - ref) * -0.5
        transforms.append(t_cur_to_ref)
        t_ref_to_cur = np.linalg.inv(t_cur_to_ref)
        car_cur = car_ref @ t_ref_to_cur[:3, :3].T + t_ref_to_cur[:3, 3]
        car_cur = car_cur + rng.normal(scale=0.02, size=car_cur.shape)

        ground = np.stack([rng.uniform(-8, 8, 600),
                           np.full(600, 1.66),
                           rng.uniform(4, 30, 600)], 1)
        pts = np.concatenate([car_cur, ground]).astype(np.float32)
        pts_frames.append(pts)

        # mask from the car's projection, dilated
        hom = np.hstack([car_cur, np.ones((len(car_cur), 1))]) @ P2.T
        uv = np.rint(hom[:, :2] / hom[:, 2:3]).astype(int)
        ok = ((uv[:, 0] >= 0) & (uv[:, 0] < W)
              & (uv[:, 1] >= 0) & (uv[:, 1] < H))
        mask = np.zeros((H, W), bool)
        mask[uv[ok, 1], uv[ok, 0]] = True
        import scipy.ndimage
        mask = scipy.ndimage.binary_dilation(mask, iterations=3)
        mask_frames.append([mask])
    return pts_frames, mask_frames, np.stack(transforms)


@pytest.fixture(scope="module")
def labeler():
    cfg = pipeline.PipelineConfig(
        nscans_before=3, nscans_after=3, max_cars=4, max_points=1024,
        min_standing_points=400,
        fit=FitConfig(fine_chunk=12))
    return pipeline.PseudoLabeler(cfg)


def test_label_frame_recovers_car(labeler):
    pts, masks, transforms = _make_scene()
    window = list(range(-3, 4))
    cars = labeler.label_frame(
        window, 3,
        get_points=lambda k: pts[k],
        get_masks=lambda k: masks[k],
        transforms=transforms, p2=P2, img_hw=(H, W))
    assert len(cars) == 1
    car = cars[0]
    assert not car["moving"]
    assert car["x"] == pytest.approx(TRUE_POSE["x"], abs=0.35)
    assert car["z"] == pytest.approx(TRUE_POSE["z"], abs=0.35)
    assert car["y"] == pytest.approx(TRUE_POSE["y"], abs=0.3)
    dtheta = (car["theta"] - TRUE_POSE["theta"] + np.pi) % (2 * np.pi) - np.pi
    assert min(abs(dtheta), abs(abs(dtheta) - np.pi)) < np.deg2rad(6)
    assert car["box2d"] is not None


def test_label_and_write_roundtrip(labeler, tmp_path):
    pts, masks, transforms = _make_scene()
    window = list(range(-3, 4))
    out = tmp_path / "000003.txt"
    cars = labeler.label_and_write(
        str(out), window, 3,
        get_points=lambda k: pts[k],
        get_masks=lambda k: masks[k],
        transforms=transforms, p2=P2, img_hw=(H, W))
    assert cars is not None and out.exists()
    labels = read_label_file(str(out))
    assert labels.names == ["Car"]
    # writer shifts y to bottom (y + h/2) and yaw by -pi/2
    assert labels.pos[0][2] == pytest.approx(TRUE_POSE["z"], abs=0.4)
    # skip-if-exists: second call returns None and leaves the file
    assert labeler.label_and_write(
        str(out), window, 3,
        get_points=lambda k: pts[k],
        get_masks=lambda k: masks[k],
        transforms=transforms, p2=P2, img_hw=(H, W)) is None


def test_empty_frame_writes_empty_file(labeler, tmp_path):
    out = tmp_path / "empty.txt"
    cars = labeler.label_and_write(
        str(out), list(range(-3, 4)), 3,
        get_points=lambda k: None,
        get_masks=lambda k: None,
        transforms=np.tile(np.eye(4), (7, 1, 1)), p2=P2, img_hw=(H, W))
    assert cars == []
    assert out.read_text() == ""


def test_mask_bbox():
    m = np.zeros((10, 20), bool)
    m[2:5, 3:9] = True
    np.testing.assert_array_equal(pipeline.mask_bbox(m), [3, 2, 8, 4])

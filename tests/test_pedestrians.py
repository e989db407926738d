"""extract_pedestrians branch (sowa/pedestrians.py): person-class masks ->
Pedestrian label rows through the standard writer and the CLI optimization
action.  Reference: the declared-but-unfinished pedestrian path —
extract_pedestrians dir prep (output.py:141-143) + writetxt_cars'
pedestrians argument (output.py:55-91)."""

import numpy as np
import yaml
import jax.numpy as jnp
import pytest
from PIL import Image

from monosowa_tpu.kittiio import read_label_file
from monosowa_tpu.ops.geometry import rot_y
from monosowa_tpu.sowa import cli, masks as masks_mod, pedestrians
from monosowa_tpu.sowa.templates import TemplateBank

H, W = 180, 400
P2 = np.array([[250.0, 0, W / 2, 0], [0, 250.0, H / 2, 0], [0, 0, 1, 0]])
CAR_POSE = dict(x=1.0, y=0.9, z=14.0, theta=0.6)
PED = dict(x=-2.0, z=9.0, h=1.7, r=0.25)   # standing person at ground 1.66


def _person_cloud(rng, n=600):
    """Vertical cylinder of points: a person at PED (ground y=1.66, up is
    -y in the camera frame)."""
    ang = rng.uniform(0, 2 * np.pi, n)
    rad = PED["r"] * np.sqrt(rng.uniform(0, 1, n))
    y = 1.66 - rng.uniform(0, PED["h"], n)
    return np.stack([PED["x"] + rad * np.cos(ang), y,
                     PED["z"] + rad * np.sin(ang)], 1).astype(np.float32)


def _project_mask(pts):
    hom = np.hstack([pts, np.ones((len(pts), 1))]) @ P2.T
    uv = np.rint(hom[:, :2] / hom[:, 2:3]).astype(int)
    ok = ((uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0)
          & (uv[:, 1] < H))
    mask = np.zeros((H, W), bool)
    mask[uv[ok, 1], uv[ok, 0]] = True
    import scipy.ndimage
    return scipy.ndimage.binary_dilation(mask, iterations=1)


def test_extract_pedestrian_labels_recovers_blob():
    rng = np.random.default_rng(0)
    person = _person_cloud(rng)
    ground = np.stack([rng.uniform(-8, 8, 800), np.full(800, 1.66),
                       rng.uniform(4, 30, 800)], 1).astype(np.float32)
    pts = np.concatenate([person, ground])
    mask = _project_mask(person)
    out = pedestrians.extract_pedestrian_labels(pts, P2, (H, W), [mask])
    assert len(out) == 1
    p = out[0]
    assert p["cls"] == "Pedestrian"
    assert p["x"] == pytest.approx(PED["x"], abs=0.3)
    assert p["z"] == pytest.approx(PED["z"], abs=0.4)
    assert p["h"] == pytest.approx(PED["h"], abs=0.3)
    assert p["w"] < 1.0 and p["l"] < 1.0
    # bottom of the box sits on the ground
    assert p["y"] + p["h"] / 2 == pytest.approx(1.66, abs=0.2)


def test_extract_pedestrian_labels_filters_small_blobs():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, (30, 3)).astype(np.float32) + [0, 0, 10]
    mask = np.zeros((H, W), bool)
    mask[:4, :4] = True          # mask misses every projected point
    cfg = pedestrians.PedestrianConfig(min_points=50)
    assert pedestrians.extract_pedestrian_labels(pts, P2, (H, W), [mask],
                                                 cfg) == []


def test_cli_optimization_emits_pedestrian_row(tmp_path):
    """e2e: synthetic scene (one car + one person), pedestrians/ cache +
    extract_pedestrians: True -> the optimization action writes a label
    file containing both a Car and a Pedestrian row."""
    kitti = tmp_path / "kitti"
    cache = tmp_path / "cache"
    labels = tmp_path / "labels"
    (kitti / "training" / "image_2").mkdir(parents=True)
    (kitti / "training" / "calib").mkdir(parents=True)
    fid = "000000"
    Image.fromarray(np.zeros((H, W, 3), np.uint8)).save(
        kitti / "training" / "image_2" / f"{fid}.png")
    p2_line = " ".join(str(v) for v in P2.reshape(-1))
    (kitti / "training" / "calib" / f"{fid}.txt").write_text(
        "\n".join([f"P{i}: {p2_line}" for i in range(4)]
                  + ["R0_rect: 1 0 0 0 1 0 0 0 1",
                     "Tr_velo_to_cam: 1 0 0 0 0 1 0 0 0 0 1 0",
                     "Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 0"]) + "\n")

    rng = np.random.default_rng(0)
    bank = TemplateBank.default()
    rot = np.asarray(rot_y(jnp.float32(CAR_POSE["theta"])))
    car = bank.points[0] @ rot.T + np.array(
        [CAR_POSE["x"], CAR_POSE["y"], CAR_POSE["z"]])
    car = np.tile(car, (2, 1)) + rng.normal(scale=0.02, size=(2000, 3))
    person = _person_cloud(rng)
    ground = np.stack([rng.uniform(-8, 8, 800), np.full(800, 1.66),
                       rng.uniform(4, 30, 800)], 1)
    pts = np.concatenate([car, person, ground]).astype(np.float32)

    (cache / "lidar_raw").mkdir(parents=True)
    np.savez_compressed(cache / "lidar_raw" / f"{fid}.npz", points=pts)

    masks_mod.save_masks(str(cache / "masks_raw"), fid,
                         [_project_mask(car)], (H, W))
    masks_mod.save_masks(str(cache / "pedestrians"), fid,
                         [_project_mask(person)], (H, W))

    cfg = {
        "paths": {"kitti_path": str(kitti) + "/",
                  "merged_frames_path": str(cache) + "/",
                  "labels_path": str(labels) + "/"},
        "frames_creation": {"nscans_before": 0, "nscans_after": 0,
                            "extract_pedestrians": True},
        "optimization": {"opt_param1_iters": 16, "opt_param2_iters": 16,
                         "opt_param3_iters": 24, "opt_fine_iters": 60},
        "filtering": {"lidar_threshold_during_optim": 400,
                      "max_points_per_car": 1024},
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    rc = cli.main(["--config", str(cfg_path), "--dataset", "kitti",
                   "--action", "optimization"])
    assert rc == 0
    objs = read_label_file(str(labels / f"{fid}.txt"))
    assert "Car" in objs.names and "Pedestrian" in objs.names
    pi = objs.names.index("Pedestrian")
    assert objs.pos[pi][0] == pytest.approx(PED["x"], abs=0.3)
    assert objs.pos[pi][2] == pytest.approx(PED["z"], abs=0.4)
    assert objs.ry[pi] == pytest.approx(0.0, abs=0.01)

"""CLI end-to-end: synthetic on-disk KITTI layout -> staged actions ->
pseudo-label txt output."""

import os

import numpy as np
import yaml
import jax.numpy as jnp
import pytest
from PIL import Image

from monosowa_tpu.kittiio import read_label_file
from monosowa_tpu.ops.geometry import rot_y
from monosowa_tpu.sowa import cli, masks as masks_mod
from monosowa_tpu.sowa.templates import TemplateBank

H, W = 180, 400
P2 = np.array([[250.0, 0, W / 2, 0], [0, 250.0, H / 2, 0], [0, 0, 1, 0]])
POSE = dict(x=1.0, y=0.9, z=14.0, theta=0.6)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    kitti = root / "kitti"
    cache = root / "cache"
    labels = root / "labels"
    (kitti / "training" / "image_2").mkdir(parents=True)
    (kitti / "training" / "calib").mkdir(parents=True)

    fid = "000000"
    Image.fromarray(np.zeros((H, W, 3), np.uint8)).save(
        kitti / "training" / "image_2" / f"{fid}.png")
    p2_line = " ".join(str(v) for v in P2.reshape(-1))
    calib_txt = "\n".join([f"P{i}: {p2_line}" for i in range(4)]
                          + ["R0_rect: " + " ".join(["1", "0", "0", "0",
                                                     "1", "0", "0", "0", "1"]),
                             "Tr_velo_to_cam: 1 0 0 0 0 1 0 0 0 0 1 0",
                             "Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 0"]) + "\n"
    (kitti / "training" / "calib" / f"{fid}.txt").write_text(calib_txt)

    # scene: one car (template cloud at POSE) + ground
    rng = np.random.default_rng(0)
    bank = TemplateBank.default()
    rot = np.asarray(rot_y(jnp.float32(POSE["theta"])))
    car = bank.points[0] @ rot.T + np.array([POSE["x"], POSE["y"], POSE["z"]])
    car = np.tile(car, (2, 1)) + rng.normal(scale=0.02, size=(2000, 3))
    ground = np.stack([rng.uniform(-8, 8, 800), np.full(800, 1.66),
                       rng.uniform(4, 30, 800)], 1)
    pts = np.concatenate([car, ground]).astype(np.float32)

    pcd_dir = cache / "lidar_raw"
    pcd_dir.mkdir(parents=True)
    np.savez_compressed(pcd_dir / f"{fid}.npz", points=pts)

    hom = np.hstack([car, np.ones((len(car), 1))]) @ P2.T
    uv = np.rint(hom[:, :2] / hom[:, 2:3]).astype(int)
    ok = ((uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H))
    mask = np.zeros((H, W), bool)
    mask[uv[ok, 1], uv[ok, 0]] = True
    import scipy.ndimage
    mask = scipy.ndimage.binary_dilation(mask, iterations=3)
    masks_mod.save_masks(str(cache / "masks_raw"), fid, [mask], (H, W))

    cfg = {
        "general": {"supress_debug_prints": True},
        "paths": {"kitti_path": str(kitti) + "/",
                  "merged_frames_path": str(cache) + "/",
                  "labels_path": str(labels) + "/"},
        "frames_creation": {"nscans_before": 0, "nscans_after": 0,
                            "nscans_transformation_range": 2,
                            "dist_treshold_tracking": 10.0},
        "filtering": {"lidar_threshold_during_optim": 500,
                      "max_points_per_car": 512},
        # reduced grid/caps: full 40x40x40 (+360 fine) at 32x2048 cars on
        # XLA-CPU costs minutes per run and the CLI wiring under test is
        # size independent
        "optimization": {"nms_threshold": 0.1,
                         "opt_param1_iters": 14, "opt_param2_iters": 14,
                         "opt_param3_iters": 16, "opt_fine_iters": 48,
                         "max_cars_per_frame": 4},
    }
    cfg_path = root / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return {"cfg": str(cfg_path), "labels": labels, "cache": cache,
            "fid": fid}


def test_transformations_action(dataset):
    rc = cli.main(["--config", dataset["cfg"], "--dataset", "kitti",
                   "--action", "transformations"])
    assert rc == 0
    assert (dataset["cache"] / "transformations" / "000000.npy").exists()


def test_candidates_action(dataset):
    cli.main(["--config", dataset["cfg"], "--dataset", "kitti",
              "--action", "candidates"])
    assert (dataset["cache"] / "candidates" / "000000.npz").exists()


def test_frames_aggregation_action(dataset):
    cli.main(["--config", dataset["cfg"], "--dataset", "kitti",
              "--action", "frames_aggregation"])
    from monosowa_tpu.sowa import cache as cache_mod
    tracks, points, ref_masks = cache_mod.load_merged_cars(
        str(dataset["cache"] / "merged_cars"), "000000")
    assert len(tracks) == 1
    assert points[0].shape[0] >= 500
    assert ref_masks[0] is not None and ref_masks[0].dtype == bool


def test_optimization_action_writes_labels(dataset):
    cli.main(["--config", dataset["cfg"], "--dataset", "kitti",
              "--action", "optimization"])
    label_file = dataset["labels"] / "000000.txt"
    assert label_file.exists()
    labels = read_label_file(str(label_file))
    assert labels.names == ["Car"]
    assert labels.pos[0][2] == pytest.approx(POSE["z"], abs=0.5)
    # second run skips (idempotent resume)
    before = label_file.stat().st_mtime_ns
    cli.main(["--config", dataset["cfg"], "--dataset", "kitti",
              "--action", "optimization"])
    assert label_file.stat().st_mtime_ns == before


def test_optimize_job_device_fields(dataset):
    """_optimize_job supplies global frame_ids (shared-extraction key) and,
    when a per-window depth-map cache exists, a get_depth that
    de-canonicalizes exactly like pseudo_lidar_from_depth."""
    import shutil

    from monosowa_tpu.config import Config, load_config
    from monosowa_tpu.sowa.cli import KittiObjectDriver, PipelineFlags

    driver = KittiObjectDriver(load_config(dataset["cfg"]),
                               PipelineFlags("optimization"))
    fid = dataset["fid"]
    job = driver._optimize_job(fid)
    assert job["frame_ids"] == [int(fid)]
    assert "get_depth" not in job

    dm_dir = dataset["cache"] / "depth_maps" / fid
    dm_dir.mkdir(parents=True)
    try:
        rng = np.random.default_rng(3)
        canon = rng.uniform(1.0, 80.0, (H, W)).astype(np.float32)
        np.savez_compressed(dm_dir / "+0.npz", depth=canon)
        job = driver._optimize_job(fid)
        d = job["get_depth"](0)
        fu = P2[0, 0]
        np.testing.assert_allclose(
            d, np.clip(canon * (fu / 1000.0), 0.0, 300.0), rtol=1e-6)
        assert job["get_depth"](0) is not None
    finally:
        shutil.rmtree(dm_dir)

"""CLI `--action transformations` pose-source dispatch: the identity stub is
replaced by real windows for kitti360 (cam0_to_world.txt) and
waymo_converted (calib Cur_pose rows) — loader.py:942-1013 semantics."""

import os

import numpy as np
import yaml

from monosowa_tpu.sowa import cli
from monosowa_tpu.sowa import transforms as transforms_mod

from test_transforms_pose_parity import _random_pose, _write_waymoc_calib

RNG = 4   # nscans_transformation_range for the tests


def _base_cfg(root, extra_paths):
    cfg = {
        "paths": dict({"kitti_path": str(root / "kitti"),
                       "merged_frames_path": str(root / "cache") + "/",
                       "labels_path": str(root / "labels") + "/"},
                      **extra_paths),
        "frames_creation": {"nscans_transformation_range": RNG},
    }
    p = root / "config.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def _touch_images(root, fids):
    from PIL import Image
    img_dir = root / "kitti" / "training" / "image_2"
    img_dir.mkdir(parents=True)
    for fid in fids:
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            img_dir / f"{fid}.png")


def test_kitti360_transformations_from_cam0_to_world(tmp_path):
    rng = np.random.default_rng(2)
    seq = "2013_05_28_drive_0000_sync"
    n = 12
    poses = np.stack([_random_pose(rng) for _ in range(n)])
    pose_dir = tmp_path / "k360" / "data_poses" / seq
    pose_dir.mkdir(parents=True)
    with open(pose_dir / "cam0_to_world.txt", "w") as f:
        for i in range(n):
            f.write(f"{i} " + " ".join(map(str, poses[i].ravel())) + "\n")

    fids = [f"{seq}_{i:010d}" for i in (5, 6)]
    _touch_images(tmp_path, fids)
    cfg = _base_cfg(tmp_path,
                    {"all_dataset_path": str(tmp_path / "k360")})

    rc = cli.main(["--config", cfg, "--dataset", "kitti360",
                   "--action", "transformations"])
    assert rc == 0
    tdir = tmp_path / "cache" / "transformations"
    full = transforms_mod.load_window_transforms(str(tdir), fids[0])
    assert full.shape == (2 * RNG + 1, 4, 4)
    expect = transforms_mod.k360_window_transforms(poses, 5, RNG, RNG)
    np.testing.assert_allclose(full, expect, atol=1e-9)
    # real motion, not the identity stub
    assert not np.allclose(full[0], np.eye(4))


def test_waymoc_transformations_from_flat_calib(tmp_path):
    rng = np.random.default_rng(3)
    calib_dir = tmp_path / "kitti" / "training" / "calib"
    calib_dir.mkdir(parents=True)
    v2c = _random_pose(rng)
    for i in range(8):
        _write_waymoc_calib(calib_dir / f"{i:06d}.txt", _random_pose(rng),
                            v2c, rng)
    fids = ["000003"]
    _touch_images(tmp_path, fids)
    cfg = _base_cfg(tmp_path, {})

    rc = cli.main(["--config", cfg, "--dataset", "waymo_converted",
                   "--action", "transformations"])
    assert rc == 0
    tdir = tmp_path / "cache" / "transformations"
    full = transforms_mod.load_window_transforms(str(tdir), "000003")
    expect = transforms_mod.waymoc_window_transforms(
        str(calib_dir), 3, RNG, RNG, name_fn=lambda i: f"{i:06d}")
    np.testing.assert_allclose(full, expect, atol=1e-6)
    assert np.allclose(full[RNG], np.eye(4), atol=1e-6)
    assert not np.allclose(full[RNG - 1], np.eye(4))


def test_kitti_object_layout_keeps_identity(tmp_path):
    _touch_images(tmp_path, ["000000"])
    cfg = _base_cfg(tmp_path, {})
    rc = cli.main(["--config", cfg, "--dataset", "kitti",
                   "--action", "transformations"])
    assert rc == 0
    full = transforms_mod.load_window_transforms(
        str(tmp_path / "cache" / "transformations"), "000000")
    assert np.allclose(full, np.eye(4))

"""Differential parity of the KITTI-360 / waymo_converted pose-window
builders against the REFERENCE'S OWN code (calculate_transformations_all
loader.py:942-982, calculate_transformations_waymoc :984-1013) on synthetic
pose files."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import ref_pipeline_harness as harness  # noqa: E402

from monosowa_tpu.sowa import transforms as transforms_mod  # noqa: E402

pytestmark = pytest.mark.skipif(not harness.reference_available(),
                                reason="reference repo not present")


def _random_pose(rng):
    from scipy.spatial.transform import Rotation
    t = np.eye(4)
    t[:3, :3] = Rotation.random(random_state=rng.integers(1 << 30)).as_matrix()
    t[:3, 3] = rng.uniform(-50, 50, 3)
    return t


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refpipe")
    p = harness.build_reference_pipeline(str(tmp), window=4)
    # the harness builds with action=optimization (load_merged_frames=True);
    # the pose-source branches under test require the generation flags
    p.load_merged_frames = False
    p.load_transformations = False
    return p


def test_k360_cam0_to_world_parity(pipe, tmp_path):
    rng = np.random.default_rng(0)
    n = 30
    poses = np.stack([_random_pose(rng) for _ in range(n)])
    # pose gaps: frames missing from the file -> zero matrices (:956-961)
    missing = {5, 6, 17}

    seq = "2013_05_28_drive_0000_sync"
    pose_dir = tmp_path / "data_poses" / seq
    pose_dir.mkdir(parents=True)
    with open(pose_dir / "cam0_to_world.txt", "w") as f:
        for i in range(n):
            if i in missing:
                continue
            f.write(f"{i} " + " ".join(f"{v:.12f}"
                                       for v in poses[i].ravel()) + "\n")

    pipe.cfg.paths.all_dataset_path = str(tmp_path) + "/"
    pipe.folder = seq

    ours_poses = transforms_mod.read_cam0_to_world(
        str(pose_dir / "cam0_to_world.txt"))
    for number in (0, 3, 7, 16, 29):
        pipe.number = str(number)
        ref = pipe.calculate_transformations_all(4, 4, save=False)
        ours = transforms_mod.k360_window_transforms(ours_poses, number, 4, 4)
        np.testing.assert_allclose(ours, ref, atol=1e-9,
                                   err_msg=f"number={number}")

    # reference frame inside a pose gap -> all-zero window
    pipe.number = "5"
    ref = pipe.calculate_transformations_all(4, 4, save=False)
    ours = transforms_mod.k360_window_transforms(ours_poses, 5, 4, 4)
    assert np.all(ref == 0) and np.all(ours == 0)

    # frame id beyond the pose table -> all-zero window (:958-963)
    pipe.number = str(n + 10)
    ref = pipe.calculate_transformations_all(4, 4, save=False)
    ours = transforms_mod.k360_window_transforms(ours_poses, n + 10, 4, 4)
    assert np.all(ref == 0) and np.all(ours == 0)


def _write_waymoc_calib(path, pose, v2c, rng):
    p2 = np.array([700.0, 0, 600, 0, 0, 700, 200, 0, 0, 0, 1, 0])
    rows = [
        "P0: " + " ".join(map(str, p2)),
        "P1: " + " ".join(map(str, p2)),
        "P2: " + " ".join(map(str, p2)),
        "P3: " + " ".join(map(str, p2)),
        "R0_rect: " + " ".join(map(str, np.eye(3).ravel())),
        "Tr_velo_to_cam: " + " ".join(map(str, v2c[:3].ravel())),
        "Tr_imu_to_velo: " + " ".join(map(str, np.eye(4)[:3].ravel())),
        "Cur_pose: " + " ".join(map(str, pose.ravel())),
    ]
    with open(path, "w") as f:
        f.write("\n".join(rows) + "\n")


def test_waymoc_cur_pose_parity(pipe, tmp_path):
    rng = np.random.default_rng(1)
    n = 16
    seq = "segment-777"
    calib_dir = tmp_path / "training" / seq / "calib"
    calib_dir.mkdir(parents=True)
    v2c = _random_pose(rng)
    for i in range(n):
        if i == 9:
            continue       # missing neighbour calib -> zero entry
        _write_waymoc_calib(calib_dir / f"{i:010d}.txt",
                            _random_pose(rng), v2c, rng)

    pipe.cfg.paths.all_dataset_path = str(tmp_path)
    pipe.folder = seq
    for number in (4, 8, 12):
        pipe.number = str(number)
        ref = pipe.calculate_transformations_waymoc(4, 4, save=False)
        ours = transforms_mod.waymoc_window_transforms(
            str(calib_dir), number, 4, 4)
        np.testing.assert_allclose(ours, ref, atol=1e-6,
                                   err_msg=f"number={number}")
        assert np.all(ours[9 - number + 4] == 0) if abs(9 - number) <= 4 \
            else True

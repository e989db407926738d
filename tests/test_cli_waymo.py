"""CLI integration for the raw-Waymo 2D-tracker path: --dataset waymo with
--action homographies -> mask_tracking -> optimization on a synthetic
segment written to disk (cached-artifact masks), producing KITTI labels.

Orchestration contract: main_class.main_waymo :39-150 with
tracker_for_merging: '2D' (perform_stitching_and_trackingV2)."""

import os

import numpy as np
import pytest
import yaml

from monosowa_tpu.kittiio import read_label_file
from monosowa_tpu.sowa import cli, masks as masks_mod
from monosowa_tpu.sowa.waymo2d import PAIRS

from test_waymo2d_e2e import (LAYOUT, N_FRAMES, TRUE_POSE, _build_scene,
                              _true_homos)


@pytest.fixture(scope="module")
def waymo_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("waymo")
    seg_dir = root / "segments" / "seg-000"
    cache = root / "cache"
    labels = root / "labels"

    poses, lidars, det_masks, stitched, homos, ref = _build_scene()
    from PIL import Image
    h_side, h_front = LAYOUT.side_h, LAYOUT.cam_h
    rng = np.random.default_rng(7)
    for slot in range(5):
        d = seg_dir / f"camera_{slot}"
        d.mkdir(parents=True)
        hh = h_side if slot in (0, 4) else h_front
        for i in range(N_FRAMES):
            img = rng.integers(0, 40, (hh, LAYOUT.cam_w, 3), dtype=np.uint8)
            if slot == 2:
                # paint the car pixels bright so ORB/tracking see texture
                ys_slot, xs_slot = LAYOUT.paste_slice(True)
                pano = det_masks[i][1][0]
                img[pano[ys_slot, xs_slot]] = 230
            Image.fromarray(img).save(d / f"{i:06d}.png")
    (seg_dir / "lidar").mkdir()
    for i in range(N_FRAMES):
        np.savez_compressed(seg_dir / "lidar" / f"{i:06d}.npz",
                            points=lidars[i])
    np.save(seg_dir / "poses.npy", np.stack(poses))

    # precomputed pair-canvas masks (cached-artifact mode)
    mask_dir = cache / "masks_raw" / "seg-000"
    for i in range(N_FRAMES):
        for z in range(4):
            masks_mod.save_masks(str(mask_dir), f"{i:06d}_{z}",
                                 det_masks[i][z], LAYOUT.canvas_hw)

    cfg = {
        "paths": {"waymo_path": str(root / "segments"),
                  "merged_frames_path": str(cache) + "/",
                  "labels_path": str(labels) + "/"},
        "image_stitching": {"height_pxl_pad": LAYOUT.height_pad,
                            "width_pxl_pad": LAYOUT.width_pad},
        "frames_creation": {"nscans_before": N_FRAMES // 2,
                            "nscans_after": N_FRAMES // 2,
                            "nscans_transformation_range": N_FRAMES // 2},
        "optimization": {"opt_param1_iters": 16, "opt_param2_iters": 16,
                         "opt_param3_iters": 24, "opt_fine_iters": 60},
        "filtering": {"lidar_threshold_during_optim": 400,
                      "max_points_per_car": 1024},
    }
    cfg_path = root / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return dict(root=root, cfg=str(cfg_path), cache=cache, labels=labels,
                homos_true=homos, ref=ref)


def test_homographies_action(waymo_tree):
    rc = cli.main(["--config", waymo_tree["cfg"], "--dataset", "waymo",
                   "--action", "homographies"])
    assert rc == 0
    out = waymo_tree["cache"] / "homographies" / "seg-000.npz"
    assert out.exists()
    # second run is a no-op (skip-if-exists idempotency)
    cli.main(["--config", waymo_tree["cfg"], "--dataset", "waymo",
              "--action", "homographies"])


def test_mask_tracking_action(waymo_tree):
    # tracking consumes the homography cache; overwrite it with the true
    # homographies so the synthetic scene's geometry is exact (ORB on
    # near-textureless synthetic frames is best-effort)
    hp = waymo_tree["cache"] / "homographies" / "seg-000.npz"
    hp.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(hp, homos=np.stack(waymo_tree["homos_true"]))

    rc = cli.main(["--config", waymo_tree["cfg"], "--dataset", "waymo",
                   "--action", "mask_tracking"])
    assert rc == 0
    out = waymo_tree["cache"] / "detandtracked" / "seg-000.npz"
    assert out.exists()
    with np.load(out, allow_pickle=True) as z:
        cars = z["cars"]
        assert len(cars) >= 1
        assert max(len(o) for o in cars) == N_FRAMES


def test_optimization_action_writes_labels(waymo_tree):
    # pre-mark every frame but the reference as done (skip-if-exists) so
    # the test pays for ONE fit instead of seven edge-window recompiles
    ref = waymo_tree["ref"]
    seg_labels = waymo_tree["labels"] / "seg-000"
    seg_labels.mkdir(parents=True, exist_ok=True)
    for i in range(N_FRAMES):
        if i != ref:
            (seg_labels / f"{i:06d}.txt").write_text("")
    rc = cli.main(["--config", waymo_tree["cfg"], "--dataset", "waymo",
                   "--action", "optimization"])
    assert rc == 0
    label_path = seg_labels / f"{ref:06d}.txt"
    assert label_path.exists()
    labels = read_label_file(str(label_path))
    assert len(labels) >= 1
    assert labels.names[0] == "Car"
    assert labels.pos[0][0] == pytest.approx(TRUE_POSE["x"], abs=0.5)
    assert labels.pos[0][2] == pytest.approx(TRUE_POSE["z"], abs=0.5)


def test_transformations_action(waymo_tree):
    rc = cli.main(["--config", waymo_tree["cfg"], "--dataset", "waymo",
                   "--action", "transformations"])
    assert rc == 0
    tdir = waymo_tree["cache"] / "transformations" / "seg-000"
    files = sorted(os.listdir(tdir))
    assert len(files) == N_FRAMES
    from monosowa_tpu.sowa import transforms as transforms_mod
    full = transforms_mod.load_window_transforms(str(tdir), "000003")
    rng = N_FRAMES // 2
    # ego moves +0.5 m forward per frame => previous frame is 0.5 closer
    # along camera +z after the permutation
    assert full[rng - 1][2, 3] == pytest.approx(-0.5, abs=1e-6)
    assert np.allclose(full[rng], np.eye(4))

"""Full training-CLI integration: tools/train_val.py main() runs one epoch
on a synthetic KITTI dir with a tiny model — dataloader, criterion config
from the reference yaml keys, sharded step, checkpointing, and the per-epoch
evaluation path all wired together (M1/M2/M3)."""

import os
import sys

import numpy as np
import pytest
import yaml
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

IMG_W, IMG_H = 160, 96
P2 = np.array([[120.0, 0, IMG_W / 2, 0], [0, 120.0, IMG_H / 2, 0],
               [0, 0, 1, 0]])


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_cli")
    for sub in ("image_2", "calib", "label_2"):
        (root / "training" / sub).mkdir(parents=True)
    rng = np.random.default_rng(0)
    ids = [f"{i:06d}" for i in range(4)]
    p2l = " ".join(str(v) for v in P2.reshape(-1))
    for fid in ids:
        Image.fromarray(rng.integers(0, 255, (IMG_H, IMG_W, 3),
                                     dtype=np.uint8).astype(np.uint8)).save(
            root / "training" / "image_2" / f"{fid}.png")
        (root / "training" / "calib" / f"{fid}.txt").write_text(
            f"P0: {p2l}\nP1: {p2l}\nP2: {p2l}\nP3: {p2l}\n"
            "R0_rect: 1 0 0 0 1 0 0 0 1\n"
            "Tr_velo_to_cam: 1 0 0 0 0 1 0 0 0 0 1 0\n")
        (root / "training" / "label_2" / f"{fid}.txt").write_text(
            "Car 0.00 0 -1.40 60.00 40.00 100.00 70.00 "
            "1.52 1.63 3.88 -1.50 1.70 10.00 -1.46\n")
    (root / "ImageSets").mkdir()
    (root / "ImageSets" / "train.txt").write_text(
        "\n".join(ids[:2]) + "\n")
    (root / "ImageSets" / "val.txt").write_text("\n".join(ids[2:]) + "\n")
    return root


@pytest.mark.slow
def test_train_val_main_one_epoch(kitti_root, tmp_path):
    from tools import train_val

    cfg = {
        "random_seed": 444,
        "dataset": {
            "type": "KITTI", "root_dir": str(kitti_root),
            "train_split": "train", "test_split": "val",
            "batch_size": 2, "resolution": [IMG_W, IMG_H],
            "max_objs": 8, "random_flip": 0.0, "aug_crop": False,
            "use_canonical_module": True, "canonical_focal_length": 120.0,
        },
        "model": {
            "num_classes": 3, "enc_layers": 1, "dec_layers": 2,
            "hidden_dim": 64, "dim_feedforward": 64, "nheads": 4,
            "num_queries": 10, "num_depth_bins": 16,
            "cls_loss_coef": 2, "bbox_loss_coef": 5,
        },
        "optimizer": {"type": "adamw", "lr": 2e-4, "weight_decay": 1e-4},
        "lr_scheduler": {"type": "step", "decay_list": [125, 165]},
        "trainer": {"max_epoch": 1, "save_frequency": 1,
                    "save_path": str(tmp_path / "out")},
        "tester": {"threshold": 0.2, "topk": 10},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    train_val.main(["--config", str(cfg_path)])

    # one epoch ran: checkpoint written, eval produced detection files
    out = tmp_path / "out"
    assert out.exists()
    ckpts = [p for p in os.listdir(out)]
    assert ckpts, "no checkpoint written"


def test_train_val_evaluate_only(kitti_root, tmp_path, capsys):
    from tools import train_val

    cfg = {
        "dataset": {
            "type": "KITTI", "root_dir": str(kitti_root),
            "train_split": "train", "test_split": "val",
            "batch_size": 2, "resolution": [IMG_W, IMG_H],
            "max_objs": 8, "random_flip": 0.0, "aug_crop": False,
        },
        "model": {
            "num_classes": 3, "enc_layers": 1, "dec_layers": 2,
            "hidden_dim": 64, "dim_feedforward": 64, "nheads": 4,
            "num_queries": 10, "num_depth_bins": 16,
        },
        "optimizer": {"lr": 2e-4},
        "lr_scheduler": {},
        "trainer": {"max_epoch": 1, "save_path": str(tmp_path / "out2")},
        "tester": {"threshold": 0.2, "topk": 10},
    }
    cfg_path = tmp_path / "cfg_eval.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train_val.main(["--config", str(cfg_path), "--evaluate_only"])


@pytest.mark.slow
def test_tester_all_checkpoints_sweep(kitti_root, tmp_path, capsys):
    """tester.mode 'all' (tester_helper.py:28-78): the best checkpoint is
    evaluated first, then every epoch checkpoint in epoch order."""
    from tools import train_val

    cfg = {
        "dataset": {
            "type": "KITTI", "root_dir": str(kitti_root),
            "train_split": "train", "test_split": "val",
            "batch_size": 2, "resolution": [IMG_W, IMG_H],
            "max_objs": 8, "random_flip": 0.0, "aug_crop": False,
        },
        "model": {
            "num_classes": 3, "enc_layers": 1, "dec_layers": 2,
            "hidden_dim": 64, "dim_feedforward": 64, "nheads": 4,
            "num_queries": 10, "num_depth_bins": 16,
        },
        "optimizer": {"lr": 2e-4},
        "lr_scheduler": {},
        "trainer": {"max_epoch": 2, "save_frequency": 1,
                    "save_path": str(tmp_path / "out_sweep")},
        "tester": {"threshold": 0.2, "topk": 10, "mode": "all"},
    }
    cfg_path = tmp_path / "cfg_sweep.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train_val.main(["--config", str(cfg_path)])

    capsys.readouterr()
    train_val.main(["--config", str(cfg_path), "--evaluate_only"])
    out = capsys.readouterr().out
    evals = [ln for ln in out.splitlines() if ln.startswith("== evaluating")]
    # best first (if tracked), then checkpoint_epoch_1, checkpoint_epoch_2
    assert len(evals) >= 2
    assert "checkpoint_epoch_1" in evals[-2]
    assert "checkpoint_epoch_2" in evals[-1]
    if len(evals) == 3:
        assert "best" in evals[0]

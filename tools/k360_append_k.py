#!/usr/bin/env python
"""Append KITTI-360 pseudo-labelled frames (ids from 10000) into an existing
KITTI-format dir for joint training.

Behavioral contract (pseudo_label_generator/k360_append_k.py): training
sequences only; pseudo labels into training/label_2 (empty file when
missing); ImageSets/train.txt appended.
"""

import argparse
import glob
import os
import shutil

from k360_to_k import TRAIN_SEQS


def main(data_folder: str, out_root: str, start_index: int = 10000) -> int:
    idx = start_index
    for folder in sorted(os.listdir(data_folder)):
        if folder not in TRAIN_SEQS:
            continue
        cur = os.path.join(data_folder, folder)
        for image in sorted(glob.glob(os.path.join(
                cur, "image_00/data_rect/", "*.png"))):
            num = os.path.basename(image).split(".")[0]
            calib = os.path.join(cur, "calib", num + ".txt")
            label = os.path.join(cur, "label_00", num + ".txt")
            pseudo = os.path.join(data_folder, "label_pseudo",
                                  f"{folder}_{num}.txt")
            if not (os.path.exists(calib) and os.path.exists(label)):
                continue
            stem = str(idx).zfill(6)
            shutil.copy(image, os.path.join(out_root, "training", "image_2",
                                            stem + ".png"))
            shutil.copy(calib, os.path.join(out_root, "training", "calib",
                                            stem + ".txt"))
            dst = os.path.join(out_root, "training", "label_2", stem + ".txt")
            if os.path.exists(pseudo):
                shutil.copy(pseudo, dst)
            else:
                open(dst, "w").close()
            idx += 1
    with open(os.path.join(out_root, "ImageSets", "train.txt"), "a") as f:
        f.writelines(str(i).zfill(6) + "\n" for i in range(start_index, idx))
    return idx - start_index


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("data_folder", help="KITTI-360 root")
    p.add_argument("output_folder", help="existing KITTI-layout root")
    p.add_argument("--start_index", type=int, default=10000)
    a = p.parse_args()
    main(a.data_folder, a.output_folder, a.start_index)

#!/usr/bin/env python
"""KITTI-360 (+pseudo-labels) -> flat KITTI object layout.

Behavioral contract (pseudo_label_generator/k360_to_k.py): 6/2/1
train/val/test sequence split, renumbered 000000.. images/calib/labels_gt/
labels_pseudo, ImageSets txt files; validation frames get GT copied into
labels_pseudo; missing pseudo-labels produce empty files.  Paths are CLI
args instead of the reference's hardcoded constants.
"""

import argparse
import glob
import os
import shutil

TRAIN_SEQS = ["2013_05_28_drive_0000_sync", "2013_05_28_drive_0002_sync",
              "2013_05_28_drive_0004_sync", "2013_05_28_drive_0005_sync",
              "2013_05_28_drive_0006_sync", "2013_05_28_drive_0009_sync"]
VAL_SEQS = ["2013_05_28_drive_0003_sync", "2013_05_28_drive_0007_sync"]
TEST_SEQS = ["2013_05_28_drive_0010_sync"]


def _frames(data_folder, seqs):
    out = []
    for folder in sorted(os.listdir(data_folder)):
        if folder in seqs:
            out.extend(sorted(glob.glob(os.path.join(
                data_folder, folder, "image_00/data_rect/", "*.png"))))
    return out


def _copy_frame(image, data_folder, out_root, split, idx, pseudo=True,
                gt_as_pseudo=False):
    img_number = os.path.basename(image).split(".")[0]
    folder = os.path.basename(
        os.path.dirname(os.path.dirname(os.path.dirname(image))))
    cur = os.path.join(data_folder, folder)
    calib = os.path.join(cur, "calib", img_number + ".txt")
    label = os.path.join(cur, "label_00", img_number + ".txt")
    pseudo_label = os.path.join(data_folder, "label_pseudo",
                                f"{folder}_{img_number}.txt")
    if not (os.path.exists(calib) and os.path.exists(label)):
        return False
    stem = str(idx).zfill(6)
    shutil.copy(image, os.path.join(out_root, split, "image_2", stem + ".png"))
    shutil.copy(calib, os.path.join(out_root, split, "calib", stem + ".txt"))
    shutil.copy(label, os.path.join(out_root, split, "labels_gt",
                                    stem + ".txt"))
    dst_pseudo = os.path.join(out_root, split, "labels_pseudo", stem + ".txt")
    if gt_as_pseudo:
        shutil.copy(label, dst_pseudo)
    elif pseudo and os.path.exists(pseudo_label):
        shutil.copy(pseudo_label, dst_pseudo)
    else:
        open(dst_pseudo, "w").close()
    return True


def main(data_folder: str, out_root: str) -> None:
    subdirs = {"training": ["calib", "image_2", "labels_gt", "velodyne",
                            "labels_pseudo", "velodyne_pseudo"],
               "testing": ["calib", "image_2", "labels_gt", "velodyne",
                           "labels_pseudo"],
               "ImageSets": []}
    for top, subs in subdirs.items():
        os.makedirs(os.path.join(out_root, top), exist_ok=True)
        for s in subs:
            os.makedirs(os.path.join(out_root, top, s), exist_ok=True)

    idx = 0
    for image in _frames(data_folder, TRAIN_SEQS):
        if _copy_frame(image, data_folder, out_root, "training", idx):
            idx += 1
    n_train = idx
    with open(os.path.join(out_root, "ImageSets", "train.txt"), "w") as f:
        f.writelines(str(i).zfill(6) + "\n" for i in range(n_train))

    for image in _frames(data_folder, VAL_SEQS):
        if _copy_frame(image, data_folder, out_root, "training", idx,
                       gt_as_pseudo=True):
            idx += 1
    with open(os.path.join(out_root, "ImageSets", "val.txt"), "w") as f:
        f.writelines(str(i).zfill(6) + "\n" for i in range(n_train, idx))

    idx = 0
    for image in _frames(data_folder, TEST_SEQS):
        if _copy_frame(image, data_folder, out_root, "testing", idx,
                       gt_as_pseudo=True):
            idx += 1
    with open(os.path.join(out_root, "ImageSets", "test.txt"), "w") as f:
        f.writelines(str(i).zfill(6) + "\n" for i in range(idx))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("data_folder", help="KITTI-360 root")
    p.add_argument("output_folder", help="output KITTI-layout root")
    a = p.parse_args()
    main(a.data_folder, a.output_folder)

#!/usr/bin/env python
"""Replace train-split label_2 files with pseudo-labels and clear OpenPCDet
caches.

CLI contract (pseudo_label_generator/label_replacer.py): argv1 = kitti data
root, argv2 = pseudo-label dir; removes gt_database/ and kitti_*info pkl
caches; copies pseudo labels over training/label_2 for ids in
ImageSets/train.txt.
"""

import os
import shutil
import sys


def main(original_folder: str, replacement_folder: str) -> int:
    txt_file = os.path.join(original_folder, "ImageSets", "train.txt")

    gtdb = os.path.join(original_folder, "gt_database")
    if os.path.exists(gtdb):
        shutil.rmtree(gtdb)
    for filename in ("kitti_dbinfos_train.pkl", "kitti_infos_test.pkl",
                     "kitti_infos_train.pkl", "kitti_infos_trainval.pkl",
                     "kitti_infos_val.pkl"):
        p = os.path.join(original_folder, filename)
        if os.path.exists(p):
            os.remove(p)

    with open(txt_file) as f:
        indexes = {line.strip() for line in f if line.strip()}

    label_dir = os.path.join(original_folder, "training", "label_2")
    n = 0
    for filename in os.listdir(label_dir):
        index = os.path.splitext(filename)[0]
        if index in indexes:
            src = os.path.join(replacement_folder, filename)
            dst = os.path.join(label_dir, filename)
            shutil.copyfile(src, dst)
            n += 1
            print(f"Replaced file: {dst}")
    return n


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print("Usage: label_replacer.py <kitti_root> <pseudo_label_dir>")
        sys.exit(1)
    main(sys.argv[1], sys.argv[2])

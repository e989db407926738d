#!/usr/bin/env python
"""Build the sampled KITTI-360 test split.

Behavioral contract (pseudo_label_generator/k360_test.py): copies only the
test-sequence frames listed in <data_folder>/sampled.txt into a
KITTI-layout ``testing/`` dir (image/calib/label_2/velodyne/label_pseudo,
renumbered), writing ImageSets/test.txt.
"""

import argparse
import glob
import os
import shutil

from k360_to_k import TEST_SEQS


def main(data_folder: str, out_root: str) -> int:
    for split in ("training", "testing"):
        for sub in ("calib", "image_2", "label_2", "velodyne",
                    "label_pseudo"):
            os.makedirs(os.path.join(out_root, split, sub), exist_ok=True)
    os.makedirs(os.path.join(out_root, "ImageSets"), exist_ok=True)

    with open(os.path.join(data_folder, "sampled.txt")) as f:
        sampled = {line.split(".")[0].strip() for line in f if line.strip()}

    idx = 0
    for folder in sorted(os.listdir(data_folder)):
        if folder not in TEST_SEQS:
            continue
        cur = os.path.join(data_folder, folder)
        for image in sorted(glob.glob(os.path.join(
                cur, "image_00/data_rect/", "*.png"))):
            num = os.path.basename(image).split(".")[0]
            if num not in sampled:
                continue
            calib = os.path.join(cur, "calib", num + ".txt")
            label = os.path.join(cur, "label_00", num + ".txt")
            pseudo = os.path.join(data_folder, "label_pseudo",
                                  f"{folder}_{num}.txt")
            velo = os.path.join(cur, "velodyne_points/data", num + ".bin")
            if not (os.path.exists(calib) and os.path.exists(label)):
                continue
            stem = str(idx).zfill(6)
            shutil.copy(image, os.path.join(out_root, "testing", "image_2",
                                            stem + ".png"))
            shutil.copy(calib, os.path.join(out_root, "testing", "calib",
                                            stem + ".txt"))
            shutil.copy(label, os.path.join(out_root, "testing", "label_2",
                                            stem + ".txt"))
            if os.path.exists(velo):
                shutil.copy(velo, os.path.join(out_root, "testing",
                                               "velodyne", stem + ".bin"))
            dst = os.path.join(out_root, "testing", "label_pseudo",
                               stem + ".txt")
            if os.path.exists(pseudo):
                shutil.copy(pseudo, dst)
            else:
                open(dst, "w").close()
            idx += 1

    with open(os.path.join(out_root, "ImageSets", "test.txt"), "w") as f:
        f.writelines(str(i).zfill(6) + "\n" for i in range(idx))
    return idx


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("data_folder")
    p.add_argument("output_folder")
    a = p.parse_args()
    main(a.data_folder, a.output_folder)

#!/usr/bin/env python
"""Flatten waymo_to_kitti_projected output into a MonoDETR KITTI layout.

Behavioral contract (pseudo_label_generator/waymo_kitti_to_monodetr.py):
renumber per-sequence frames into a single training/ dir (train +
validation appended), ImageSets/{train,val}.txt + mapping.txt.  Paths are
CLI args.  ``--label_dir`` selects which label variant to flatten (the
reference's _labels.py twin does the same for alternate label dirs).
"""

import argparse
import glob
import os
import shutil


def _copy_split(data_folder, split, out_root, start_idx, mapping=None,
                label_dir="label_2"):
    idx = start_idx
    split_root = os.path.join(data_folder, split)
    if not os.path.isdir(split_root):
        return idx
    for folder in sorted(os.listdir(split_root)):
        cur = os.path.join(split_root, folder)
        for image in sorted(glob.glob(os.path.join(cur, "image_2", "*.png"))):
            num = os.path.basename(image).split(".")[0]
            calib = os.path.join(cur, "calib", num + ".txt")
            label = os.path.join(cur, label_dir, num + ".txt")
            if not (os.path.exists(calib) and os.path.exists(label)):
                continue
            stem = str(idx).zfill(6)
            shutil.copy(image, os.path.join(out_root, "training", "image_2",
                                            stem + ".png"))
            shutil.copy(calib, os.path.join(out_root, "training", "calib",
                                            stem + ".txt"))
            shutil.copy(label, os.path.join(out_root, "training", "label_2",
                                            stem + ".txt"))
            if mapping is not None:
                mapping.write(f"{stem} {image}\n")
            idx += 1
    return idx


def main(data_folder: str, out_root: str, label_dir: str = "label_2") -> None:
    for sub in ("calib", "image_2", "label_2", "velodyne"):
        os.makedirs(os.path.join(out_root, "training", sub), exist_ok=True)
    os.makedirs(os.path.join(out_root, "ImageSets"), exist_ok=True)

    with open(os.path.join(out_root, "ImageSets", "mapping.txt"), "w") as m:
        n_train = _copy_split(data_folder, "training", out_root, 0, m,
                              label_dir)
    with open(os.path.join(out_root, "ImageSets", "train.txt"), "w") as f:
        f.writelines(str(i).zfill(6) + "\n" for i in range(n_train))

    n_total = _copy_split(data_folder, "validation", out_root, n_train,
                          None, label_dir)
    with open(os.path.join(out_root, "ImageSets", "val.txt"), "w") as f:
        f.writelines(str(i).zfill(6) + "\n" for i in range(n_train, n_total))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("data_folder", help="waymo_to_kitti output root")
    p.add_argument("output_folder")
    p.add_argument("--label_dir", default="label_2")
    a = p.parse_args()
    main(a.data_folder, a.output_folder, a.label_dir)

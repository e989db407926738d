#!/usr/bin/env python
"""Copy the +-30 raw-sequence frames around each KITTI-object detection
frame into a per-index debug layout.

Behavioral contract (pseudo_label_generator/3d/eval/whole_dataset_generator
.py): read devkit train_rand/train_mapping, and for each object-detection
index copy image/velodyne/oxts of frames [-30, 30) from the raw sequence
into image_2_add/velodyne_add/odx_add/<index>/ plus a per-index timestamp
file.  Paths are CLI args instead of hardcoded.
"""

from __future__ import annotations

import argparse
import os
import shutil


def main(kitti_root: str, sequences_root: str, out_root: str,
         window: int = 30) -> int:
    mapping_dir = os.path.join(kitti_root, "object_detection",
                               "devkit_object", "mapping")
    with open(os.path.join(mapping_dir, "train_rand.txt")) as f:
        random_indexes = f.readline().strip().split(",")
    with open(os.path.join(mapping_dir, "train_mapping.txt")) as f:
        mapping_data = [line.strip().split(" ") for line in f]

    for sub in ("image_2_add", "velodyne_add", "odx_add", "timestamps"):
        os.makedirs(os.path.join(out_root, sub), exist_ok=True)

    n = 0
    for index, rnd_idx in enumerate(random_indexes):
        m = mapping_data[int(rnd_idx)]
        seq_dir = os.path.join(sequences_root, m[0], m[1])
        img_out = os.path.join(out_root, "image_2_add", f"{index:0>6}")
        if os.path.exists(img_out):
            continue
        ts_path = os.path.join(seq_dir, "oxts", "timestamps.txt")
        if not os.path.exists(ts_path):
            continue
        with open(ts_path) as f:
            timestamps = [line.strip().split(" ") for line in f]

        os.makedirs(img_out)
        os.makedirs(os.path.join(out_root, "velodyne_add", f"{index:0>6}"))
        os.makedirs(os.path.join(out_root, "odx_add", f"{index:0>6}"))

        file_number = int(m[2])
        with open(os.path.join(out_root, "timestamps",
                               f"{index}.txt"), "w") as ts_out:
            for i in range(-window, window):
                fn = file_number + i
                src_img = os.path.join(seq_dir, "image_02", "data",
                                       f"{fn:0>10}.png")
                src_velo = os.path.join(seq_dir, "velodyne_points", "data",
                                        f"{fn:0>10}.bin")
                src_oxts = os.path.join(seq_dir, "oxts", "data",
                                        f"{fn:0>10}.txt")
                if not all(os.path.isfile(p)
                           for p in (src_img, src_velo, src_oxts)):
                    continue
                shutil.copy(src_img, os.path.join(img_out, f"{i}.png"))
                shutil.copy(src_velo, os.path.join(
                    out_root, "velodyne_add", f"{index:0>6}", f"{i}.bin"))
                shutil.copy(src_oxts, os.path.join(
                    out_root, "odx_add", f"{index:0>6}", f"{i}.txt"))
                if 0 <= fn < len(timestamps):
                    ts_out.write(f"{i} {timestamps[fn][1]}\n")
        n += 1
    return n


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("kitti_root")
    p.add_argument("sequences_root")
    p.add_argument("out_root")
    p.add_argument("--window", type=int, default=30)
    a = p.parse_args()
    main(a.kitti_root, a.sequences_root, a.out_root, a.window)

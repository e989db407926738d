#!/usr/bin/env python
"""Truncate label rows to 15 fields; write a DontCare stub into empty files.

CLI contract (pseudo_label_generator/label_preparation.py): argv1 = dataset
root; operates on <root>/training/label_2/*.txt in place.
"""

import os
import sys

DONTCARE = ("DontCare -1 -1 -10 0.00 0.00 0.00 0.00 -1 -1 -1 "
            "-1000 -1000 -1000 -10")


def process_txt_files(folder_path: str) -> int:
    n = 0
    for file_name in sorted(os.listdir(folder_path)):
        if not file_name.endswith(".txt"):
            continue
        path = os.path.join(folder_path, file_name)
        with open(path) as f:
            lines = f.readlines()
        out = []
        for line in lines:
            values = line.strip().split(" ")
            if len(values) > 15:
                values = values[:15]
            out.append(" ".join(values) + "\n")
        if not lines:
            out.append(DONTCARE + "\n")
        with open(path, "w") as f:
            f.writelines(out)
        n += 1
    return n


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print("Usage: label_preparation.py <dataset_root>")
        sys.exit(1)
    process_txt_files(os.path.join(sys.argv[1], "training", "label_2"))

#!/usr/bin/env python
"""Sort label rows by score descending, Cars before DontCare.

CLI contract (pseudo_label_generator/label_sorter.py): positional input_dir
and output_dir.
"""

import argparse
import os


def get_score(line: str) -> float:
    return float(line.split()[-1])


def main(input_dir: str, output_dir: str) -> int:
    os.makedirs(output_dir, exist_ok=True)
    n = 0
    for txt_file in sorted(f for f in os.listdir(input_dir)
                           if f.endswith(".txt")):
        with open(os.path.join(input_dir, txt_file)) as f:
            lines = f.readlines()
        sorted_lines = sorted(lines, key=get_score, reverse=True)
        car_lines = [ln for ln in sorted_lines if ln.startswith("Car")]
        dontcare = [ln for ln in sorted_lines if ln.startswith("DontCare")]
        with open(os.path.join(output_dir, txt_file), "w") as f:
            f.writelines(car_lines + dontcare)
        n += 1
    return n


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("input_dir")
    p.add_argument("output_dir")
    a = p.parse_args()
    main(a.input_dir, a.output_dir)

"""KITTI AP evaluation stack (numpy + JAX rotated IoU).

Rebuild of the reference's numba AP implementation
(pseudo_label_generator/3d/eval/kitti_eval_python/eval.py and the identical
copy under MonoDETR) — the correctness-critical metric definition.
"""

from monosowa_tpu.evalkitti.eval import (  # noqa: F401
    annos_from_label_dir, clean_data, eval_class, get_official_eval_result,
    get_thresholds, image_box_overlap)

"""Load the reference KITTI python evaluator (/root/reference/MonoDETR/
lib/datasets/kitti/kitti_eval_python) as plain Python.

The image has no numba, so a stub is installed whose ``jit``/``cuda.jit``
decorators are identity and whose ``cuda.local.array`` is numpy — the
decorated functions then run as ordinary Python with identical math.  The
numba-CUDA host launcher ``rotate_iou_gpu_eval`` is replaced with a loop
calling the (undecorated) per-pair device function ``devRotateIoUEval`` with
exactly the kernel's argument order (rotate_iou.py:263-293:
``dev_iou[row * K + col] = devRotateIoUEval(query[col], boxes[row], c)``).
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np

REF_EVAL_DIR = ("/root/reference/MonoDETR/lib/datasets/kitti/"
                "kitti_eval_python")


def _identity_jit(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def deco(fn):
        return fn

    return deco


class _LocalArrays:
    @staticmethod
    def array(shape, dtype=np.float32):
        return np.zeros(shape, dtype=np.dtype(dtype))


def install_numba_stub():
    """Install a pure-python numba stand-in (no-op if numba is importable)."""
    try:
        import numba  # noqa: F401
        return
    except ImportError:
        pass
    if "numba" in sys.modules:
        return
    numba_stub = types.ModuleType("numba")
    numba_stub.jit = _identity_jit
    numba_stub.njit = _identity_jit
    for name in ("float32", "float64", "int32", "int64", "boolean"):
        setattr(numba_stub, name,
                np.bool_ if name == "boolean" else getattr(np, name))
    cuda_stub = types.ModuleType("numba.cuda")
    cuda_stub.jit = _identity_jit
    cuda_stub.local = _LocalArrays
    numba_stub.cuda = cuda_stub
    sys.modules["numba"] = numba_stub
    sys.modules["numba.cuda"] = cuda_stub


def _load_submodule(pkg_name, pkg_dir, name):
    spec = importlib.util.spec_from_file_location(
        f"{pkg_name}.{name}", os.path.join(pkg_dir, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{pkg_name}.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_eval(pkg_dir: str = REF_EVAL_DIR):
    """Returns the reference ``eval`` module with a CPU rotate-IoU backend.

    Raises FileNotFoundError when the reference checkout is absent (callers
    should skip)."""
    if not os.path.isdir(pkg_dir):
        raise FileNotFoundError(pkg_dir)
    pkg_name = "ref_kitti_eval"
    if f"{pkg_name}.eval" in sys.modules:
        return sys.modules[f"{pkg_name}.eval"]
    install_numba_stub()

    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [pkg_dir]
    sys.modules[pkg_name] = pkg

    rot = _load_submodule(pkg_name, pkg_dir, "rotate_iou")

    def rotate_iou_cpu_eval(boxes, query_boxes, criterion=-1, device_id=0):
        box_dtype = boxes.dtype
        boxes = boxes.astype(np.float32)
        qboxes = query_boxes.astype(np.float32)
        n, k = boxes.shape[0], qboxes.shape[0]
        iou = np.zeros((n, k), np.float32)
        for row in range(n):
            for col in range(k):
                iou[row, col] = rot.devRotateIoUEval(
                    qboxes[col], boxes[row], criterion)
        return iou.astype(box_dtype)

    rot.rotate_iou_gpu_eval = rotate_iou_cpu_eval
    ref_eval = _load_submodule(pkg_name, pkg_dir, "eval")
    # eval.py binds the launcher at import via `from .rotate_iou import
    # rotate_iou_gpu_eval`; the patch above runs before that import, but be
    # explicit in case of reload ordering:
    ref_eval.rotate_iou_gpu_eval = rotate_iou_cpu_eval
    return ref_eval

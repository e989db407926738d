"""Shared, ADDITIVE torchvision stub for the reference-parity tests.

torchvision is not in this image; several reference modules import bits of
it (utils/misc.py's version check, utils/box_ops.py's box_area,
lib/datasets/kitti/pd.py's dead `from torchvision import transforms`).
Each parity test used to install its own partial stub — whichever ran
first won, and later tests crashed on the attributes their own stub would
have provided.  install() creates the stub if absent and ALWAYS fills in
every attribute any consumer needs, so test order doesn't matter.
"""

import sys
import types


def install():
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        sys.modules["torchvision"] = tv
    if not hasattr(tv, "__version__"):
        tv.__version__ = "0.15.0"
    if not hasattr(tv, "_is_tracing"):
        tv._is_tracing = lambda: False

    if not hasattr(tv, "transforms"):
        tr = types.ModuleType("torchvision.transforms")
        tv.transforms = tr
        sys.modules["torchvision.transforms"] = tr

    ops = getattr(tv, "ops", None)
    if ops is None:
        ops = types.ModuleType("torchvision.ops")
        tv.ops = ops
        sys.modules["torchvision.ops"] = ops
    if not hasattr(ops, "boxes"):
        bm = types.ModuleType("torchvision.ops.boxes")
        bm.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        ops.boxes = bm
        sys.modules["torchvision.ops.boxes"] = bm
    if not hasattr(ops, "misc"):
        om = types.ModuleType("torchvision.ops.misc")
        ops.misc = om
        sys.modules["torchvision.ops.misc"] = om
    return tv

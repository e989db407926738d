"""Native Waymo Open Dataset ingestion (no tensorflow / waymo_open_dataset).

The wire schema the converters need is transcribed in
``waymo_dataset.proto`` (see its header) and compiled with the image's
``protoc`` on first import; ``frame_utils`` ports the public
range-image -> point-cloud math to numpy; ``tfrecord`` reads/writes the
TFRecord framing in pure python.

Reference consumer: pseudo_label_generator/waymo_to_kitti_projected.py:4-5
(``from waymo_open_dataset import dataset_pb2`` + ``frame_utils``).
"""

from __future__ import annotations

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_PROTO = os.path.join(_HERE, "waymo_dataset.proto")
_GEN = os.path.join(_HERE, "waymo_dataset_pb2.py")


def _ensure_generated() -> None:
    """protoc-compile the schema if the generated module is missing or
    older than the .proto (same build-on-demand pattern as native/)."""
    if (os.path.exists(_GEN)
            and os.path.getmtime(_GEN) >= os.path.getmtime(_PROTO)):
        return
    subprocess.run(
        ["protoc", f"--proto_path={_HERE}", f"--python_out={_HERE}",
         os.path.basename(_PROTO)],
        check=True, capture_output=True)


_ensure_generated()

if _HERE not in sys.path:  # generated module imports nothing; path-load it
    sys.path.insert(0, _HERE)
import waymo_dataset_pb2 as dataset_pb2  # noqa: E402

__all__ = ["dataset_pb2"]

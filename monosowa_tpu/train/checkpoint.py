"""Orbax checkpointing of train state.

Behavioral contract (MonoDETR/lib/helpers/save_helper.py:13-45,
trainer_helper.py:86-107): per-epoch checkpoints carrying model/optimizer/
epoch, a tracked best checkpoint (by Car-moderate AP3D), and resume.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


@functools.lru_cache(maxsize=None)
def _checkpointer():
    # one instance per process: letting a Checkpointer get GC'd shuts down
    # orbax's shared async executor, and the NEXT checkpointer's restore
    # dies with "cannot schedule new futures after shutdown"
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, state: Any, epoch: int,
                    best_ap: Optional[float] = None,
                    tag: str = "checkpoint") -> str:
    """Save params/frozen/opt_state/step + metadata under
    <ckpt_dir>/<tag>_epoch_<n>."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"{tag}_epoch_{epoch}")
    payload = {
        "params": state.params,
        "frozen": state.frozen,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    _checkpointer().save(path, payload, force=True)
    meta = os.path.join(os.path.abspath(ckpt_dir), f"{tag}_epoch_{epoch}.meta")
    with open(meta, "w") as f:
        f.write(f"epoch={epoch}\nbest_ap={best_ap if best_ap else ''}\n")
    return path


def restore_checkpoint(path: str, state: Any) -> Tuple[Any, int]:
    """Restore into an initialized TrainState (shapes from ``state``)."""
    template = {
        "params": state.params,
        "frozen": state.frozen,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = _checkpointer().restore(os.path.abspath(path), template)
    new_state = state.replace(params=restored["params"],
                              frozen=restored["frozen"],
                              opt_state=restored["opt_state"],
                              step=restored["step"])
    epoch = _epoch_from_path(path)
    return new_state, epoch


def latest_checkpoint(ckpt_dir: str, tag: str = "checkpoint"
                      ) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(ckpt_dir):
        if name.startswith(f"{tag}_epoch_") and not name.endswith(".meta"):
            try:
                e = int(name.rsplit("_", 1)[1])
            except ValueError:
                continue
            if e > best_epoch:
                best, best_epoch = os.path.join(ckpt_dir, name), e
    return best


def list_checkpoints(ckpt_dir: str, tag: str = "checkpoint"):
    """All <tag>_epoch_<n> checkpoints sorted by epoch — the tester's
    'all' sweep enumeration (tester_helper.py:62-68: every epoch
    checkpoint, ordered by its epoch suffix)."""
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        if name.startswith(f"{tag}_epoch_") and not name.endswith(".meta"):
            try:
                e = int(name.rsplit("_", 1)[1])
            except ValueError:
                continue
            out.append((e, os.path.join(ckpt_dir, name)))
    return [p for _, p in sorted(out)]


def _epoch_from_path(path: str) -> int:
    try:
        return int(os.path.basename(path.rstrip("/")).rsplit("_", 1)[1])
    except (ValueError, IndexError):
        return 0

"""Config-driven dispatch of the TPU-served model zoo.

The reference instantiates its external models straight from config keys:
Detectron2 from ``general.detectron_config``/``model_path`` (loader.py:80-95),
SAM refinement gated by ``frames_creation.use_SAM`` + ``paths.sam_path``
(config.yaml:27, loader.py:97-103 / 1727-1739), Metric3D by
``metric3d.model`` (metric3d.py:24-39), kornia LoFTR inside the stitcher
(stitching.py:29-151), and ODTrack via ``paths.odtrack_path``
(tracker_ODTrack.py:10-58).  This module is the rebuild's equivalent: a
``backends:`` config section selects, per capability, either the cached /
checkpoint-free mode or a TPU-served Flax network restored from a
checkpoint file.

Config keys (all optional — defaults preserve cached/fallback behavior)::

    backends:
      depth: cached | metric3d_hub | depth_anything
      depth_checkpoint: <path.npz>        # depth_anything mode
      depth_input_size: 518
      mask: cached | mask2former
      mask_checkpoint: <path.npz>
      mask_input_hw: [384, 1280]
      matcher: orb | loftr
      matcher_checkpoint: <path.npz>
      matcher_input_hw: [480, 640]
      tracker: template | vit
      tracker_checkpoint: <path.npz>
    frames_creation:
      use_SAM: False                      # reference key, config.yaml:27
    paths:
      sam_path: <path.npz>                # reference key (loader.py:99)

Checkpoint format: one ``.npz`` holding the flattened param pytree
(``/``-joined path keys, list indices as digit segments) plus a
``__config__`` JSON blob describing the model's config dataclass.  Produce
checkpoints from HuggingFace weights with the per-model importers
(``import_hf_*``) and :func:`save_checkpoint` — see
``tools/import_zoo_checkpoint.py``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# param pytree <-> flat npz
# ---------------------------------------------------------------------------

def flatten_params(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested dict/list pytree of arrays -> flat ``{path: array}``."""
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            if "/" in str(k):
                raise ValueError(f"param key {k!r} may not contain '/'")
            out.update(flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_params(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Any:
    """Inverse of :func:`flatten_params`; all-digit key segments rebuild
    lists (sorted numerically)."""
    root: Dict[str, Any] = {}
    for path, arr in flat.items():
        node = root
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def build(node: Any) -> Any:
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [build(node[k]) for k in sorted(keys, key=int)]
        return {k: build(v) for k, v in node.items()}

    return build(root)


# ---------------------------------------------------------------------------
# config dataclass <-> JSON
# ---------------------------------------------------------------------------

def _config_classes(kind: str) -> Dict[str, type]:
    """Name -> dataclass map for a checkpoint kind (lazy model imports)."""
    if kind == "depth_anything":
        from monosowa_tpu.models.depth_anything import DepthAnythingConfig
        from monosowa_tpu.models.dinov2 import Dinov2Config
        return {"DepthAnythingConfig": DepthAnythingConfig,
                "Dinov2Config": Dinov2Config}
    if kind == "mask2former":
        from monosowa_tpu.models.mask2former import Mask2FormerConfig
        from monosowa_tpu.models.swin import SwinConfig
        return {"Mask2FormerConfig": Mask2FormerConfig,
                "SwinConfig": SwinConfig}
    if kind == "sam":
        from monosowa_tpu.models.sam import (SamConfig, SamDecoderConfig,
                                             SamVisionConfig)
        return {"SamConfig": SamConfig, "SamVisionConfig": SamVisionConfig,
                "SamDecoderConfig": SamDecoderConfig}
    if kind == "loftr":
        from monosowa_tpu.models.efficientloftr import EfficientLoFTRConfig
        return {"EfficientLoFTRConfig": EfficientLoFTRConfig}
    if kind == "vit_tracker":
        from monosowa_tpu.models.vit_tracker import ViTTrackerConfig
        return {"ViTTrackerConfig": ViTTrackerConfig}
    raise ValueError(f"unknown checkpoint kind {kind!r}")


def _cfg_to_jsonable(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {"__class__": type(cfg).__name__,
                **{f.name: _cfg_to_jsonable(getattr(cfg, f.name))
                   for f in dataclasses.fields(cfg)}}
    if isinstance(cfg, (list, tuple)):
        return [_cfg_to_jsonable(v) for v in cfg]
    return cfg


def _cfg_from_jsonable(data: Any, classes: Dict[str, type]) -> Any:
    if isinstance(data, dict) and "__class__" in data:
        cls = classes[data["__class__"]]
        kw = {k: _cfg_from_jsonable(v, classes)
              for k, v in data.items() if k != "__class__"}
        # dataclasses with Sequence fields default to tuples; JSON lists
        # are fine for all uses, but keep tuples for hashability
        kw = {k: tuple(v) if isinstance(v, list) else v
              for k, v in kw.items()}
        return cls(**kw)
    if isinstance(data, list):
        return [_cfg_from_jsonable(v, classes) for v in data]
    return data


# ---------------------------------------------------------------------------
# checkpoint file
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, kind: str, params: Any, cfg: Any) -> None:
    """Serialize a model-zoo checkpoint (see module docstring format)."""
    _config_classes(kind)     # validate kind early
    meta = json.dumps({"kind": kind, "config": _cfg_to_jsonable(cfg)})
    flat = flatten_params(params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, __config__=np.frombuffer(
        meta.encode(), dtype=np.uint8), **flat)


def load_checkpoint(path: str) -> Tuple[str, Any, Any]:
    """-> (kind, params pytree, config dataclass)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__config__"]).decode())
        flat = {k: z[k] for k in z.files if k != "__config__"}
    kind = meta["kind"]
    cfg = _cfg_from_jsonable(meta["config"], _config_classes(kind))
    return kind, unflatten_params(flat), cfg


def _load_checked(path: str, expect_kind: str) -> Tuple[Any, Any]:
    kind, params, cfg = load_checkpoint(path)
    if kind != expect_kind:
        raise ValueError(
            f"checkpoint {path} holds a {kind!r} model; expected "
            f"{expect_kind!r}")
    return params, cfg


# ---------------------------------------------------------------------------
# backend factories (driver entry points)
# ---------------------------------------------------------------------------

def _backends(cfg) -> Any:
    from monosowa_tpu.config import Config
    return cfg.backends or Config({})


def depth_backend(cfg, depth_dir: str):
    """``--action lidar_scans`` depth source (reference metric3d.py:24-39).

    Returns an object with either ``predict_depth_for(frame)`` (cached
    mode) or ``predict_depth(image)`` + a settable ``fx`` (live modes).
    """
    from monosowa_tpu.sowa import depth as depth_mod

    b = _backends(cfg)
    kind = b.get("depth", "cached")
    if kind == "cached":
        return depth_mod.CachedDepthBackend(depth_dir)
    if kind == "metric3d_hub":
        model = (cfg.metric3d or type(cfg)({})).get("model",
                                                    "metric3d_vit_giant2")
        return depth_mod.TorchHubMetric3DBackend(model)
    if kind == "depth_anything":
        params, dcfg = _load_checked(b.get("depth_checkpoint"),
                                     "depth_anything")
        return depth_mod.FlaxDepthAnythingBackend(
            params, dcfg, fx=depth_mod.CANONICAL_FOCAL,
            input_size=int(b.get("depth_input_size", 518)))
    raise ValueError(f"unknown backends.depth {kind!r}")


def mask_backend(cfg):
    """Live instance-segmentation backend (reference loader.py:80-95), or
    None for cached-artifact mode (masks_raw/)."""
    b = _backends(cfg)
    kind = b.get("mask", "cached")
    if kind == "cached":
        return None
    if kind == "mask2former":
        from monosowa_tpu.sowa.masks import (SCORE_THRESHOLD,
                                             FlaxMask2FormerBackend)

        params, mcfg = _load_checked(b.get("mask_checkpoint"), "mask2former")
        thresh = float((cfg.filtering or type(cfg)({}))
                       .get("score_detectron_thresh", SCORE_THRESHOLD))
        hw = b.get("mask_input_hw", (384, 1280))
        return FlaxMask2FormerBackend(params, mcfg,
                                      car_label_ids=tuple(
                                          b.get("mask_car_labels", (2,))),
                                      score_threshold=thresh,
                                      input_hw=tuple(int(v) for v in hw))
    raise ValueError(f"unknown backends.mask {kind!r}")


def sam_refine_backend(cfg):
    """SAM box-prompted refinement when ``frames_creation.use_SAM`` is on
    (reference config.yaml:27 gating loader.py:1727-1739; weights from
    ``paths.sam_path``)."""
    fc = cfg.frames_creation or type(cfg)({})
    if not fc.get("use_SAM", False):
        return None
    from monosowa_tpu.sowa.masks import FlaxSamRefineBackend

    path = (cfg.paths or type(cfg)({})).get("sam_path") \
        or _backends(cfg).get("sam_checkpoint")
    if not path:
        raise ValueError("use_SAM: True needs paths.sam_path (a zoo "
                         "checkpoint produced by save_checkpoint)")
    params, scfg = _load_checked(path, "sam")
    return FlaxSamRefineBackend(params, scfg)


def matcher_backend(cfg):
    """Stitching keypoint matcher (reference kornia LoFTR,
    stitching.py:29-151): ORB by default, the TPU-served EfficientLoFTR
    when ``backends.matcher: loftr`` names a checkpoint."""
    from monosowa_tpu.sowa import stitching as stitch_mod

    b = _backends(cfg)
    kind = b.get("matcher", "orb")
    if kind == "orb":
        return stitch_mod.OrbMatcherBackend()
    if kind == "loftr":
        params, lcfg = _load_checked(b.get("matcher_checkpoint"), "loftr")
        hw = b.get("matcher_input_hw", (480, 640))
        return stitch_mod.FlaxLoFTRMatcherBackend(
            params, lcfg, input_hw=tuple(int(v) for v in hw))
    raise ValueError(f"unknown backends.matcher {kind!r}")


def tracker_factory(cfg) -> Callable[[], Any]:
    """Single-object tracker factory for panorama mask tracking (reference
    ODTrack, tracker_ODTrack.py:10-58): template matching by default, the
    TPU-served ViT tracker when ``backends.tracker: vit`` names a
    checkpoint."""
    b = _backends(cfg)
    kind = b.get("tracker", "template")
    if kind == "template":
        from monosowa_tpu.sowa.tracker2d import TemplateMatchTracker
        return TemplateMatchTracker
    if kind == "vit":
        import copy

        from monosowa_tpu.sowa.tracker2d import FlaxViTTrackerBackend

        params, tcfg = _load_checked(b.get("tracker_checkpoint"),
                                     "vit_tracker")
        # one prototype holds the single jitted forward; per-track
        # instances are shallow copies with fresh track state (a new
        # backend per track would re-trace the network every time)
        proto = FlaxViTTrackerBackend(params, tcfg)

        def make():
            t = copy.copy(proto)
            t._template = None
            t._track_tokens = None
            t._box = None
            return t

        return make
    raise ValueError(f"unknown backends.tracker {kind!r}")

#!/usr/bin/env python
"""Convert a HuggingFace checkpoint into a model-zoo ``.npz`` the pipeline's
``backends:`` config section can load (sowa/zoo.py).

The reference downloads its external models at run time (Metric3D via
torch.hub metric3d.py:24, Detectron2 weights loader.py:80-95, SAM
loader.py:97-103, kornia LoFTR stitching.py:29); the rebuild serves them as
pure-JAX networks restored from these self-contained checkpoints instead.

Usage (needs the HF weights locally — run once wherever you have them)::

    python tools/import_zoo_checkpoint.py --kind depth_anything \
        --hf depth-anything/Depth-Anything-V2-Metric-Outdoor-Base-hf \
        --out ckpts/depth_metric_outdoor.npz
    python tools/import_zoo_checkpoint.py --kind mask2former \
        --hf facebook/mask2former-swin-large-coco-instance --out ...
    python tools/import_zoo_checkpoint.py --kind sam \
        --hf facebook/sam-vit-huge --out ...
    python tools/import_zoo_checkpoint.py --kind loftr \
        --hf zju-community/efficientloftr --out ...

Then point the pipeline config at the file, e.g.::

    backends:
      depth: depth_anything
      depth_checkpoint: ckpts/depth_metric_outdoor.npz
"""

from __future__ import annotations

import argparse


def _load(kind: str, hf_name: str):
    import torch  # noqa: F401  (transformers needs it for state_dicts)
    import transformers

    if kind == "depth_anything":
        from monosowa_tpu.models.depth_anything import (
            config_from_hf_depth_anything, import_hf_depth_anything)

        tm = transformers.DepthAnythingForDepthEstimation.from_pretrained(
            hf_name)
        cfg = config_from_hf_depth_anything(tm.config)
        return import_hf_depth_anything(tm.state_dict(), cfg), cfg
    if kind == "mask2former":
        from monosowa_tpu.models.mask2former import (
            config_from_hf_mask2former, import_hf_mask2former)

        tm = transformers.Mask2FormerForUniversalSegmentation \
            .from_pretrained(hf_name)
        cfg = config_from_hf_mask2former(tm.config)
        return import_hf_mask2former(tm.state_dict(), cfg), cfg
    if kind == "sam":
        from monosowa_tpu.models.sam import config_from_hf_sam, import_hf_sam

        tm = transformers.SamModel.from_pretrained(hf_name)
        cfg = config_from_hf_sam(tm.config)
        return import_hf_sam(tm.state_dict(), cfg), cfg
    if kind == "loftr":
        from monosowa_tpu.models.efficientloftr import (
            config_from_hf_efficientloftr, import_hf_efficientloftr)

        tm = transformers.EfficientLoFTRForKeypointMatching.from_pretrained(
            hf_name)
        cfg = config_from_hf_efficientloftr(tm.config)
        return import_hf_efficientloftr(tm.state_dict(), cfg), cfg
    raise SystemExit(f"unknown --kind {kind!r} (vit_tracker checkpoints "
                     "come from training, not a public HF release)")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--kind", required=True,
                    choices=["depth_anything", "mask2former", "sam",
                             "loftr"])
    ap.add_argument("--hf", required=True,
                    help="HF model name or local checkpoint dir")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args(argv)

    from monosowa_tpu.sowa import zoo

    params, cfg = _load(args.kind, args.hf)
    zoo.save_checkpoint(args.out, args.kind, params, cfg)
    print(f"wrote {args.out} ({args.kind})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

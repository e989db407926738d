"""Benchmark the TPU-served model zoo at production configurations.

Measures single-chip inference throughput of the networks that replace the
reference's external GPU models (SURVEY.md §2.4.8): the DepthAnything
depth stack (Metric3Dv2's role), Mask2Former instance segmentation
(Detectron2 MViTv2's role), SAM box refinement, the EfficientLoFTR
matcher (kornia LoFTR's role) and the ViT tracker (ODTrack's role).

Weights are random (zero-egress image) — throughput is weight-agnostic.
Timing: jit + warmup, then per-iteration host value pulls.  The axon
tunnel's async dispatch makes block_until_ready-only timing
untrustworthy (see ROADMAP.md: host-side value pulls are the only sync
the tunnel cannot fake); each call also gets a distinct scalar input
perturbation so no caching layer can replay a previous result.  The
bare tunnel round trip (measured on a no-op scalar pull) is reported
and subtracted.

Usage: python tools/bench_models.py [--dtype bf16] [--iters 10] [--only X]
Prints one JSON line per model.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _cast(params, dtype):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, dtype) if np.issubdtype(
            np.asarray(x).dtype, np.floating) else jnp.asarray(x), params)


def _null_rtt(iters=5):
    """Median wall time of a compiled no-op scalar dispatch + host pull."""
    f = jax.jit(lambda s: s + 1.0)
    float(f(jnp.float32(0.0)))            # compile
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(f(jnp.float32(float(i))))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _time(fn, args, iters):
    """Median per-call seconds.  ``fn(*args, s)`` must thread the scalar
    ``s`` into its input so every call is a distinct computation; a scalar
    from each output is pulled to host before the clock stops."""
    out = fn(*args, jnp.float32(0.0))
    jax.block_until_ready(out)            # compile + warmup
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, jnp.float32(1e-6 * (i + 1)))
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.ravel(leaf)[0])         # host pull = trustworthy sync
        times.append(time.perf_counter() - t0)
    rtt = _null_rtt()
    return max(float(np.median(times)) - rtt, 1e-9), rtt


def bench_depth(dtype, iters):
    from monosowa_tpu.models import depth_anything as da
    from monosowa_tpu.models import dinov2 as dn

    # DepthAnything-Large: DINOv2-L trunk, KITTI-aspect input
    bb = dn.Dinov2Config(hidden_size=1024, num_hidden_layers=24,
                         num_attention_heads=16, pos_grid=37)
    cfg = da.DepthAnythingConfig(
        backbone=bb, out_indices=(21, 22, 23, 24),
        neck_hidden_sizes=(256, 512, 1024, 1024), fusion_hidden_size=256,
        head_hidden_size=32, depth_estimation_type="metric", max_depth=80.0)
    params = _cast(da.init_depth_anything_params(0, cfg), dtype)
    h, w = 518, 1722                      # 375x1242 scaled, multiple of 14
    x = jnp.zeros((1, h, w, 3), dtype)
    fn = jax.jit(lambda p, v, s: da.depth_anything_forward(
        p, v + s.astype(v.dtype), cfg))
    dt, rtt = _time(fn, (params, x), iters)
    return {"model": "depth_anything_large", "input": f"{h}x{w}",
            "s_per_image": round(dt, 4), "images_per_s": round(1 / dt, 2),
            "rtt_s": round(rtt, 4)}


def bench_mask2former(dtype, iters):
    from monosowa_tpu.models import mask2former as m2f
    from monosowa_tpu.models import swin as sw

    # Swin-Base trunk (COCO instance config), KITTI-resolution input
    bb = sw.SwinConfig(embed_dim=128, depths=(2, 2, 18, 2),
                       num_heads=(4, 8, 16, 32), window_size=12)
    cfg = m2f.Mask2FormerConfig(backbone=bb, num_labels=80)
    # random params in the import layout
    import torch
    import transformers
    hf_bb = transformers.SwinConfig(
        embed_dim=128, depths=[2, 2, 18, 2], num_heads=[4, 8, 16, 32],
        window_size=12,
        out_features=["stage1", "stage2", "stage3", "stage4"])
    hf = transformers.Mask2FormerConfig(backbone_config=hf_bb, num_labels=80)
    with torch.device("meta"):
        tm = transformers.Mask2FormerForUniversalSegmentation(hf)
    state = {k: torch.zeros(v.shape) for k, v in tm.state_dict().items()}
    params = _cast(m2f.import_hf_mask2former(state, cfg), dtype)
    h, w = 384, 1280
    x = jnp.zeros((1, h, w, 3), dtype)
    fn = jax.jit(lambda p, v, s: m2f.mask2former_forward(
        p, v + s.astype(v.dtype), cfg))
    dt, rtt = _time(fn, (params, x), iters)
    return {"model": "mask2former_swin_base", "input": f"{h}x{w}",
            "s_per_image": round(dt, 4), "images_per_s": round(1 / dt, 2),
            "rtt_s": round(rtt, 4)}


def bench_sam(dtype, iters):
    import torch
    import transformers

    from monosowa_tpu.models import sam as sm

    hf = transformers.SamConfig()         # ViT-Base vision encoder
    cfg = sm.config_from_hf_sam(hf)
    with torch.device("meta"):
        tm = transformers.SamModel(hf)
    state = {k: torch.zeros(v.shape) for k, v in tm.state_dict().items()}
    params = _cast(sm.import_hf_sam(state, cfg), dtype)
    x = jnp.zeros((1, 1024, 1024, 3), dtype)
    boxes = jnp.asarray([[[100.0, 100.0, 600.0, 500.0]] * 8])
    fn = jax.jit(lambda p, v, b, s: sm.sam_predict_boxes(
        p, v + s.astype(v.dtype), b, cfg))
    dt, rtt = _time(fn, (params, x, boxes), iters)
    return {"model": "sam_vit_base_8boxes", "input": "1024x1024",
            "s_per_image": round(dt, 4), "images_per_s": round(1 / dt, 2),
            "rtt_s": round(rtt, 4)}


def bench_loftr(dtype, iters):
    import torch
    import transformers

    from monosowa_tpu.models import efficientloftr as elo

    hf = transformers.EfficientLoFTRConfig()
    cfg = elo.config_from_hf_efficientloftr(hf)
    with torch.device("meta"):
        tm = transformers.EfficientLoFTRForKeypointMatching(hf)
    state = {k: torch.rand(v.shape) * 0.02 + (
        1.0 if "running_var" in k else 0.0)
        for k, v in tm.state_dict().items()}
    params = _cast(elo.import_hf_efficientloftr(state, cfg), dtype)
    pair = jnp.zeros((1, 2, 480, 640), dtype)
    fn = jax.jit(lambda p, v, s: elo.match_pair(
        p, v + s.astype(v.dtype), cfg))
    dt, rtt = _time(fn, (params, pair), iters)
    return {"model": "efficientloftr", "input": "2x480x640",
            "s_per_pair": round(dt, 4), "pairs_per_s": round(1 / dt, 2),
            "rtt_s": round(rtt, 4)}


def bench_tracker(dtype, iters):
    from monosowa_tpu.models import vit_tracker as vt

    cfg = vt.ViTTrackerConfig()           # base: 384 hidden, 6 layers
    params = _cast(vt.init_tracker_params(0, cfg), dtype)
    t = jnp.zeros((1, cfg.template_size, cfg.template_size, 3), dtype)
    s = jnp.zeros((1, cfg.search_size, cfg.search_size, 3), dtype)
    tok = jnp.asarray(params["track_token"])
    fn = jax.jit(lambda p, a, b, c, e: vt.tracker_forward(
        p, a, b + e.astype(b.dtype), c, cfg))
    dt, rtt = _time(fn, (params, t, s, tok), iters)
    return {"model": "vit_tracker", "input": "z128/x256",
            "s_per_frame": round(dt, 4), "frames_per_s": round(1 / dt, 2),
            "rtt_s": round(rtt, 4)}


BENCHES = {"depth": bench_depth, "mask2former": bench_mask2former,
           "sam": bench_sam, "loftr": bench_loftr, "tracker": bench_tracker}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default=None, choices=list(BENCHES))
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    names = [args.only] if args.only else list(BENCHES)
    for name in names:
        try:
            res = BENCHES[name](dtype, args.iters)
            res["dtype"] = args.dtype
            print(json.dumps(res), flush=True)
        except Exception as e:  # keep the rest of the suite running
            print(json.dumps({"model": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()

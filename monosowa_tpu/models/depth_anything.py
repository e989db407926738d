"""Depth-Anything (DINOv2 backbone + DPT neck/head) in pure JAX.

Role in the framework (SURVEY.md §2.4.8, P5): the reference's pseudo-LiDAR
stage runs a frozen monocular depth network (Metric3Dv2 = DINOv2-giant2
trunk + depth decoder, pseudo_label_generator/3d/scripts/metric3d.py:17-37).
This module is the TPU-served depth-estimator implementation of that
capability: the canonical DINOv2+DPT depth stack, forward-compatible with
any HuggingFace ``DepthAnythingForDepthEstimation`` checkpoint (relative or
metric, e.g. the KITTI metric-depth release) via ``import_hf``.
Differentially tested against the torch implementation in
``tests/test_depth_anything_parity.py``.

TPU-first notes: NHWC everywhere; the DPT reassemble's stride-k transposed
convs are expressed as a per-patch matmul + reshape (no scatter); all
resizes are the torch-exact dense-matrix resamplers from ``ops.resize``
(align_corners=True bilinear in the fusion/head, as in DPT).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.models.dinov2 import (Dinov2Config, config_from_hf,
                                        dinov2_features, import_hf_dinov2,
                                        init_dinov2_params)
from monosowa_tpu.ops.resize import resize_bilinear_torch


@dataclasses.dataclass(frozen=True)
class DepthAnythingConfig:
    backbone: Dinov2Config
    out_indices: Sequence[int] = (9, 10, 11, 12)
    reassemble_factors: Sequence[float] = (4.0, 2.0, 1.0, 0.5)
    neck_hidden_sizes: Sequence[int] = (48, 96, 192, 384)
    fusion_hidden_size: int = 64
    head_hidden_size: int = 32
    head_in_index: int = -1
    depth_estimation_type: str = "relative"  # or "metric"
    max_depth: float = 1.0


def _conv(x: jnp.ndarray, p: Dict[str, Any], stride: int = 1,
          pad: int = 0) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"] if "bias" in p else y


def _upsample_conv(x: jnp.ndarray, p: Dict[str, Any], f: int) -> jnp.ndarray:
    """ConvTranspose2d(kernel=f, stride=f, padding=0) as matmul+reshape:
    out[b, i*f+di, j*f+dj, o] = sum_c x[b,i,j,c] W[di,dj,c,o] + bias."""
    b, h, w, c = x.shape
    o = p["kernel"].shape[-1]
    y = jnp.einsum("bhwc,dkco->bhwdko", x, p["kernel"])
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * f, w * f, o)
    return y + p["bias"]


def _pre_act_residual(x: jnp.ndarray, p: Dict[str, Any]) -> jnp.ndarray:
    y = _conv(jax.nn.relu(x), p["convolution1"], pad=1)
    y = _conv(jax.nn.relu(y), p["convolution2"], pad=1)
    return y + x


def _fusion_layer(p: Dict[str, Any], fused: Optional[jnp.ndarray],
                  feat: jnp.ndarray, out_hw) -> jnp.ndarray:
    """DepthAnythingFeatureFusionLayer.forward (fused=None on first call)."""
    if fused is None:
        h = feat
    else:
        res = feat
        if fused.shape[1:3] != res.shape[1:3]:
            res = resize_bilinear_torch(res, fused.shape[1:3],
                                        align_corners=False)
        h = fused + _pre_act_residual(res, p["residual_layer1"])
    h = _pre_act_residual(h, p["residual_layer2"])
    hw = out_hw if out_hw is not None else (h.shape[1] * 2, h.shape[2] * 2)
    h = resize_bilinear_torch(h, hw, align_corners=True)
    return _conv(h, p["projection"])


def depth_anything_forward(params: Dict[str, Any], pixels: jnp.ndarray,
                           cfg: DepthAnythingConfig) -> jnp.ndarray:
    """pixels: (B, H, W, 3) normalized NHWC -> predicted depth (B, H', W')
    with H' = ph*patch (== H when patch | H), torch-module-exact."""
    bb = cfg.backbone
    ph = pixels.shape[1] // bb.patch_size
    pw = pixels.shape[2] // bb.patch_size
    feats = dinov2_features(params["backbone"], pixels, bb, cfg.out_indices)

    # Reassemble: drop cls (+ register) tokens -> image grid -> proj+resize.
    # (The HF module drops only the cls token; with registers present the
    # correct behavior — and ours — is to drop them too.)
    skip = 1 + bb.num_register_tokens
    stages: List[jnp.ndarray] = []
    for i, s in enumerate(feats):
        g = s[:, skip:].reshape(s.shape[0], ph, pw, s.shape[-1])
        rp = params["reassemble"][i]
        g = _conv(g, rp["projection"])
        f = cfg.reassemble_factors[i]
        if f > 1:
            g = _upsample_conv(g, rp["resize"], int(f))
        elif f < 1:
            g = _conv(g, rp["resize"], stride=int(round(1 / f)), pad=1)
        stages.append(_conv(g, params["neck_convs"][i], pad=1))

    # Fusion: from the deepest stage upward (DepthAnythingFeatureFusionStage).
    rev = stages[::-1]
    fused = None
    for i, feat in enumerate(rev):
        out_hw = rev[i + 1].shape[1:3] if i + 1 < len(rev) else None
        fused = _fusion_layer(params["fusion"][i], fused, feat, out_hw)

    # Head (DepthAnythingDepthEstimationHead).
    y = _conv(fused, params["head"]["conv1"], pad=1)
    y = resize_bilinear_torch(y, (ph * bb.patch_size, pw * bb.patch_size),
                              align_corners=True)
    y = jax.nn.relu(_conv(y, params["head"]["conv2"], pad=1))
    y = _conv(y, params["head"]["conv3"])
    if cfg.depth_estimation_type == "metric":
        y = jax.nn.sigmoid(y) * cfg.max_depth
    else:
        y = jax.nn.relu(y) * cfg.max_depth
    return y[..., 0]


def _conv_rand(rng, k: int, cin: int, cout: int,
               bias: bool = True) -> Dict[str, np.ndarray]:
    p = {"kernel": rng.normal(0, 0.02, (k, k, cin, cout)).astype(np.float32)}
    if bias:
        p["bias"] = np.zeros(cout, np.float32)
    return p


def init_depth_anything_params(seed: int,
                               cfg: DepthAnythingConfig) -> Dict[str, Any]:
    rng = np.random.default_rng(seed + 1)
    c = cfg.backbone.hidden_size
    fus = cfg.fusion_hidden_size
    reassemble = []
    for ch, f in zip(cfg.neck_hidden_sizes, cfg.reassemble_factors):
        rp = {"projection": _conv_rand(rng, 1, c, ch)}
        if f > 1:
            rp["resize"] = _conv_rand(rng, int(f), ch, ch)
        elif f < 1:
            rp["resize"] = _conv_rand(rng, 3, ch, ch)
        reassemble.append(rp)
    fusion = [{"projection": _conv_rand(rng, 1, fus, fus),
               "residual_layer1": {"convolution1": _conv_rand(rng, 3, fus, fus),
                                   "convolution2": _conv_rand(rng, 3, fus, fus)},
               "residual_layer2": {"convolution1": _conv_rand(rng, 3, fus, fus),
                                   "convolution2": _conv_rand(rng, 3, fus, fus)}}
              for _ in cfg.neck_hidden_sizes]
    return {
        "backbone": init_dinov2_params(seed, cfg.backbone),
        "reassemble": reassemble,
        "neck_convs": [_conv_rand(rng, 3, ch, fus, bias=False)
                       for ch in cfg.neck_hidden_sizes],
        "fusion": fusion,
        "head": {"conv1": _conv_rand(rng, 3, fus, fus // 2),
                 "conv2": _conv_rand(rng, 3, fus // 2, cfg.head_hidden_size),
                 "conv3": _conv_rand(rng, 1, cfg.head_hidden_size, 1)},
    }


def _t(state, name) -> np.ndarray:
    v = state[name]
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      np.float32)


def _cv(state, name, transpose_conv: bool = False) -> Dict[str, np.ndarray]:
    w = _t(state, name + ".weight")
    # torch Conv2d OIHW -> HWIO; ConvTranspose2d IOHW -> HWIO
    kernel = w.transpose(2, 3, 0, 1) if transpose_conv \
        else w.transpose(2, 3, 1, 0)
    p = {"kernel": kernel}
    if name + ".bias" in state:
        p["bias"] = _t(state, name + ".bias")
    return p


def import_hf_depth_anything(state: Dict[str, Any],
                             cfg: DepthAnythingConfig) -> Dict[str, Any]:
    """Map a ``DepthAnythingForDepthEstimation.state_dict()`` onto the
    params pytree (conv OIHW->HWIO, transposed-conv IOHW->HWIO)."""
    reassemble = []
    for i, f in enumerate(cfg.reassemble_factors):
        base = f"neck.reassemble_stage.layers.{i}."
        rp = {"projection": _cv(state, base + "projection")}
        if f > 1:
            rp["resize"] = _cv(state, base + "resize", transpose_conv=True)
        elif f < 1:
            rp["resize"] = _cv(state, base + "resize")
        reassemble.append(rp)
    fusion = []
    for i in range(len(cfg.neck_hidden_sizes)):
        base = f"neck.fusion_stage.layers.{i}."
        fusion.append({
            "projection": _cv(state, base + "projection"),
            "residual_layer1": {
                "convolution1": _cv(state, base + "residual_layer1.convolution1"),
                "convolution2": _cv(state, base + "residual_layer1.convolution2")},
            "residual_layer2": {
                "convolution1": _cv(state, base + "residual_layer2.convolution1"),
                "convolution2": _cv(state, base + "residual_layer2.convolution2")},
        })
    return {
        "backbone": import_hf_dinov2(state, cfg.backbone,
                                     prefix="backbone."),
        "reassemble": reassemble,
        "neck_convs": [_cv(state, f"neck.convs.{i}")
                       for i in range(len(cfg.neck_hidden_sizes))],
        "fusion": fusion,
        "head": {"conv1": _cv(state, "head.conv1"),
                 "conv2": _cv(state, "head.conv2"),
                 "conv3": _cv(state, "head.conv3")},
    }


def config_from_hf_depth_anything(hf_cfg: Any) -> DepthAnythingConfig:
    return DepthAnythingConfig(
        backbone=config_from_hf(hf_cfg.backbone_config),
        out_indices=tuple(hf_cfg.backbone_config.out_indices),
        reassemble_factors=tuple(hf_cfg.reassemble_factors),
        neck_hidden_sizes=tuple(hf_cfg.neck_hidden_sizes),
        fusion_hidden_size=hf_cfg.fusion_hidden_size,
        head_hidden_size=hf_cfg.head_hidden_size,
        head_in_index=hf_cfg.head_in_index,
        depth_estimation_type=hf_cfg.depth_estimation_type,
        max_depth=hf_cfg.max_depth,
    )

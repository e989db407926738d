"""Mask2Former universal segmentation in pure JAX (TPU mask generator).

Role in the framework (SURVEY.md §2.1 P6): the reference's instance masks
come from a Detectron2 cascade Mask R-CNN (MViTv2-H) run offline
(loader.py:80-95, filtering.py:97-110; car-class masks, score > 0.7).
``sowa/masks.py`` exposes the pluggable ``MaskBackend``; this module is
its TPU-served implementation — Mask2Former (CVPR'22, the successor
architecture for instance segmentation) with the Swin hierarchy from
``models/swin.py``, forward-compatible with HuggingFace
``Mask2FormerForUniversalSegmentation`` checkpoints (e.g. the COCO
instance-segmentation releases) via ``import_hf_mask2former``.
Differentially tested against the installed transformers torch
implementation in ``tests/test_mask2former_parity.py``.

TPU-first notes:
* the pixel decoder's multi-scale deformable attention reuses the repo's
  tuned ``ops.msda.ms_deform_attn`` (the same Deformable-DETR sampling
  spec, already Pallas/MXU-optimized for the detector's encoder);
* sine position embeddings, reference points and level indices are
  compile-time constants for static feature shapes;
* the masked-attention decoder runs batch-first with f32 softmaxes; the
  per-layer binarized attention masks are computed with the torch-exact
  bilinear resampler.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.models.swin import (SwinConfig, config_from_hf_swin,
                                      import_hf_swin_backbone, swin_backbone)
from monosowa_tpu.ops.msda import ms_deform_attn
from monosowa_tpu.ops.resize import resize_bilinear_torch


@dataclasses.dataclass(frozen=True)
class Mask2FormerConfig:
    backbone: SwinConfig
    feature_size: int = 256
    mask_feature_size: int = 256
    hidden_dim: int = 256
    encoder_layers: int = 6
    decoder_layers: int = 10          # 1 + 9 masked layers (torch counts +1)
    num_attention_heads: int = 8
    encoder_feedforward_dim: int = 1024
    dim_feedforward: int = 2048
    num_queries: int = 100
    num_labels: int = 80
    pre_norm: bool = False
    common_stride: int = 4
    feature_strides: Sequence[int] = (4, 8, 16, 32)
    deform_points: int = 4
    num_feature_levels: int = 3


def _ln(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * p["scale"]
            + p["bias"]).astype(x.dtype)


def _gn32(x, p, eps=1e-5):
    """GroupNorm(32) over NHWC."""
    b, h, w, c = x.shape
    g = 32
    xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mu = xf.mean((1, 2, 4), keepdims=True)
    var = ((xf - mu) ** 2).mean((1, 2, 4), keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _conv(x, p, stride=1, pad=0):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"] if "bias" in p else y


@functools.lru_cache(maxsize=64)
def _sine_pos(h: int, w: int, num_feats: int) -> np.ndarray:
    """Mask2FormerSinePositionEmbedding(normalize=True) -> (h, w, 2F) with
    channel order [y-features, x-features]."""
    scale = 2.0 * np.pi
    eps = 1e-6
    y = (np.arange(1, h + 1, dtype=np.float32)[:, None]
         * np.ones((1, w), np.float32))
    x = (np.ones((h, 1), np.float32)
         * np.arange(1, w + 1, dtype=np.float32)[None])
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    dim_t = 10000.0 ** (2 * (np.arange(num_feats) // 2) / num_feats)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])],
                  -1).reshape(h, w, -1)
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])],
                  -1).reshape(h, w, -1)
    return np.concatenate([py, px], -1).astype(np.float32)


def _reference_points(shapes: Tuple[Tuple[int, int], ...]) -> np.ndarray:
    """(sum(HW), L, 2) normalized (x, y) grid centers, valid_ratios == 1."""
    pts = []
    for h, w in shapes:
        ry = (np.arange(h, dtype=np.float32) + 0.5) / h
        rx = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ry, rx, indexing="ij")
        pts.append(np.stack([gx, gy], -1).reshape(-1, 2))
    ref = np.concatenate(pts, 0)
    return np.broadcast_to(ref[:, None], (ref.shape[0], len(shapes), 2)
                           ).astype(np.float32)


def _encoder_layer(p, hidden, pos, ref, shapes, cfg: Mask2FormerConfig):
    """Mask2FormerPixelDecoderEncoderLayer (eval: no dropout)."""
    b, n, c = hidden.shape
    m = cfg.num_attention_heads
    l = len(shapes)
    pts = cfg.deform_points
    q = hidden + pos
    offsets = (q @ p["sampling_offsets"]["kernel"]
               + p["sampling_offsets"]["bias"]).reshape(b, n, m, l, pts, 2)
    weights = (q @ p["attention_weights"]["kernel"]
               + p["attention_weights"]["bias"]).reshape(b, n, m, l * pts)
    weights = jax.nn.softmax(weights.astype(jnp.float32), -1
                             ).astype(hidden.dtype).reshape(b, n, m, l, pts)
    value = (hidden @ p["value_proj"]["kernel"] + p["value_proj"]["bias"]
             ).reshape(b, n, m, c // m)
    norm = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)
    loc = ref[None, :, None, :, None, :] \
        + offsets / norm[None, None, None, :, None, :]
    out = ms_deform_attn(value, shapes, loc, weights).astype(hidden.dtype)
    out = out @ p["output_proj"]["kernel"] + p["output_proj"]["bias"]
    hidden = _ln(hidden + out, p["self_attn_layer_norm"])
    y = jax.nn.relu(hidden @ p["fc1"]["kernel"] + p["fc1"]["bias"])
    y = y @ p["fc2"]["kernel"] + p["fc2"]["bias"]
    return _ln(hidden + y, p["final_layer_norm"])


def pixel_decoder(params, features: List[jnp.ndarray],
                  cfg: Mask2FormerConfig
                  ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """features: NHWC backbone maps low->high stride.  Returns
    (mask_features (B, H/4, W/4, mask_dim), multi_scale [1/32, 1/16, 1/8])."""
    nl = cfg.num_feature_levels
    fd = cfg.feature_size
    levels = features[::-1][:nl]                    # high stride first
    embeds, poss = [], []
    for i, f in enumerate(levels):
        e = _gn32(_conv(f, params["input_projections"][i]),
                  params["input_projections_gn"][i])
        embeds.append(e)
        poss.append(jnp.asarray(_sine_pos(f.shape[1], f.shape[2], fd // 2)
                                ).astype(e.dtype))
    shapes = tuple((e.shape[1], e.shape[2]) for e in embeds)
    b = embeds[0].shape[0]
    flat = jnp.concatenate([e.reshape(b, -1, fd) for e in embeds], 1)
    pos = jnp.concatenate(
        [(p + params["level_embed"][i]).reshape(1, -1, fd)
         for i, p in enumerate(poss)], 1)
    hidden = flat
    ref = jnp.asarray(_reference_points(shapes))
    for lp in params["encoder_layers"]:
        hidden = _encoder_layer(lp, hidden, pos, ref, shapes, cfg)

    outs = []
    start = 0
    for (h, w) in shapes:
        outs.append(hidden[:, start:start + h * w].reshape(b, h, w, fd))
        start += h * w
    # FPN tail: lowest-stride backbone features fused in
    n_fpn = int(np.log2(min(cfg.feature_strides[-nl:]))
                - np.log2(cfg.common_stride))
    fpn_feats = features[:n_fpn][::-1]
    for i, f in enumerate(fpn_feats):
        lat = _gn32(_conv(f, params["lateral_convs"][i]),
                    params["lateral_convs_gn"][i])
        up = resize_bilinear_torch(outs[-1], lat.shape[1:3])
        y = lat + up
        y = jax.nn.relu(_gn32(_conv(y, params["output_convs"][i], pad=1),
                              params["output_convs_gn"][i]))
        outs.append(y)
    mask_features = _conv(outs[-1], params["mask_projection"])
    return mask_features, outs[:nl]


def _mha(p, q, k, v, heads: int, mask=None):
    """torch nn.MultiheadAttention semantics, batch-first (B, N, C).
    mask: (B*heads, Q, S) bool, True = disallowed."""
    b, nq, c = q.shape
    d = c // heads
    qp = (q @ p["q"]["kernel"] + p["q"]["bias"]).reshape(b, nq, heads, d)
    kp = (k @ p["k"]["kernel"] + p["k"]["bias"]).reshape(b, -1, heads, d)
    vp = (v @ p["v"]["kernel"] + p["v"]["bias"]).reshape(b, -1, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qp, kp) / math.sqrt(d)
    if mask is not None:
        m = mask.reshape(b, heads, nq, -1)
        logits = jnp.where(m, -jnp.inf, logits)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
    y = jnp.einsum("bhqk,bkhd->bqhd", probs, vp).reshape(b, nq, c)
    return y @ p["out"]["kernel"] + p["out"]["bias"]


def _self_attn(p, hidden, qpe, heads: int):
    """Mask2FormerAttention: q = k = hidden + qpe, v = hidden."""
    return _mha(p, hidden + qpe, hidden + qpe, hidden, heads)


def _mask_predictor(p, hidden, pixel_emb, target_hw, heads: int):
    """-> (mask logits (B, Q, H4, W4), attn mask (B*heads, Q, th*tw))."""
    emb = hidden
    for i, layer in enumerate(p["mask_embedder"]):
        emb = emb @ layer["kernel"] + layer["bias"]
        if i < len(p["mask_embedder"]) - 1:
            emb = jax.nn.relu(emb)
    masks = jnp.einsum("bqc,bhwc->bqhw", emb, pixel_emb)
    att = resize_bilinear_torch(masks.transpose(0, 2, 3, 1), target_hw)
    att = att.transpose(0, 3, 1, 2)                    # (B, Q, th, tw)
    att = jax.nn.sigmoid(att).reshape(*att.shape[:2], -1)
    att = att[:, None].repeat(heads, 1) < 0.5          # (B, heads, Q, S)
    return masks, att.reshape(-1, att.shape[2], att.shape[3])


def transformer_module(params, multi_scale: List[jnp.ndarray],
                       mask_features: jnp.ndarray, cfg: Mask2FormerConfig
                       ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Masked-attention decoder.  Returns (per-layer class logits,
    per-layer mask logits) — last entries are the final predictions."""
    b = mask_features.shape[0]
    hd = cfg.hidden_dim
    heads = cfg.num_attention_heads
    nl = cfg.num_feature_levels
    size_list = [(f.shape[1], f.shape[2]) for f in multi_scale]
    enc, pos = [], []
    for i, f in enumerate(multi_scale):
        p2 = jnp.asarray(_sine_pos(f.shape[1], f.shape[2], hd // 2)
                         ).astype(f.dtype)
        pos.append(p2.reshape(1, -1, hd))
        e = f.reshape(b, -1, hd) + params["level_embed"][i]
        enc.append(e)

    qpe = jnp.broadcast_to(params["queries_embedder"][None],
                           (b, cfg.num_queries, hd))
    hidden = jnp.broadcast_to(params["queries_features"][None],
                              (b, cfg.num_queries, hd))

    classes, masks_out = [], []

    inter = _ln(hidden, params["decoder_norm"])
    classes.append(inter @ params["class_predictor"]["kernel"]
                   + params["class_predictor"]["bias"])
    mask_logits, att = _mask_predictor(params["mask_predictor"], inter,
                                       mask_features, size_list[0], heads)
    masks_out.append(mask_logits)

    for idx, lp in enumerate(params["decoder_layers"]):
        li = idx % nl
        # un-mask fully-masked rows (else softmax NaNs), as in torch
        full = att.sum(-1) == att.shape[-1]
        att = att & ~full[..., None]
        # masked cross-attention (post-norm order)
        y = _mha(lp["cross_attn"], hidden + qpe, enc[li] + pos[li], enc[li],
                 heads, mask=att)
        hidden = _ln(hidden + y, lp["cross_attn_layer_norm"])
        y = _self_attn(lp["self_attn"], hidden, qpe, heads)
        hidden = _ln(hidden + y, lp["self_attn_layer_norm"])
        y = jax.nn.relu(hidden @ lp["fc1"]["kernel"] + lp["fc1"]["bias"])
        y = y @ lp["fc2"]["kernel"] + lp["fc2"]["bias"]
        hidden = _ln(hidden + y, lp["final_layer_norm"])

        inter = _ln(hidden, params["decoder_norm"])
        classes.append(inter @ params["class_predictor"]["kernel"]
                       + params["class_predictor"]["bias"])
        mask_logits, att = _mask_predictor(
            params["mask_predictor"], inter, mask_features,
            size_list[(idx + 1) % nl], heads)
        masks_out.append(mask_logits)
    return classes, masks_out


def mask2former_forward(params: Dict[str, Any], pixels: jnp.ndarray,
                        cfg: Mask2FormerConfig
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pixels (B, H, W, 3) normalized NHWC -> (class logits
    (B, Q, num_labels+1), mask logits (B, Q, H/4, W/4))."""
    feats = swin_backbone(params["backbone"], pixels, cfg.backbone)
    mask_features, multi_scale = pixel_decoder(params["pixel_decoder"],
                                               feats, cfg)
    classes, masks = transformer_module(params["transformer"], multi_scale,
                                        mask_features, cfg)
    return classes[-1], masks[-1]


# ---------------------------------------------------------------- import


def _t(state, name):
    v = state[name]
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      np.float32)


def _lin(state, name):
    return {"kernel": _t(state, name + ".weight").T,
            "bias": _t(state, name + ".bias")}


def _nrm(state, name):
    return {"scale": _t(state, name + ".weight"),
            "bias": _t(state, name + ".bias")}


def _cv(state, name, bias=True):
    p = {"kernel": _t(state, name + ".weight").transpose(2, 3, 1, 0)}
    if bias:
        p["bias"] = _t(state, name + ".bias")
    return p


def import_hf_mask2former(state: Dict[str, Any],
                          cfg: Mask2FormerConfig) -> Dict[str, Any]:
    """Map ``Mask2FormerForUniversalSegmentation.state_dict()`` onto the
    params pytree (incl. splitting nn.MultiheadAttention's packed
    in_proj into q/k/v)."""
    pfx = "model.pixel_level_module.decoder."
    nl = cfg.num_feature_levels
    enc_layers = []
    for i in range(cfg.encoder_layers):
        b = pfx + f"encoder.layers.{i}."
        enc_layers.append({
            "sampling_offsets": _lin(state, b + "self_attn.sampling_offsets"),
            "attention_weights": _lin(state,
                                      b + "self_attn.attention_weights"),
            "value_proj": _lin(state, b + "self_attn.value_proj"),
            "output_proj": _lin(state, b + "self_attn.output_proj"),
            "self_attn_layer_norm": _nrm(state, b + "self_attn_layer_norm"),
            "fc1": _lin(state, b + "fc1"), "fc2": _lin(state, b + "fc2"),
            "final_layer_norm": _nrm(state, b + "final_layer_norm"),
        })
    n_fpn = int(np.log2(min(cfg.feature_strides[-nl:]))
                - np.log2(cfg.common_stride))
    pd = {
        "level_embed": _t(state, pfx + "level_embed"),
        "input_projections": [
            _cv(state, pfx + f"input_projections.{i}.0")
            for i in range(nl)],
        "input_projections_gn": [
            _nrm(state, pfx + f"input_projections.{i}.1")
            for i in range(nl)],
        "encoder_layers": enc_layers,
        "mask_projection": _cv(state, pfx + "mask_projection"),
        "lateral_convs": [_cv(state, pfx + f"adapter_{i + 1}.0", bias=False)
                          for i in range(n_fpn)][::-1],
        "lateral_convs_gn": [_nrm(state, pfx + f"adapter_{i + 1}.1")
                             for i in range(n_fpn)][::-1],
        "output_convs": [_cv(state, pfx + f"layer_{i + 1}.0", bias=False)
                         for i in range(n_fpn)][::-1],
        "output_convs_gn": [_nrm(state, pfx + f"layer_{i + 1}.1")
                            for i in range(n_fpn)][::-1],
    }

    tfx = "model.transformer_module."
    dec_layers = []
    for i in range(cfg.decoder_layers - 1):
        b = tfx + f"decoder.layers.{i}."
        inw = _t(state, b + "cross_attn.in_proj_weight")
        inb = _t(state, b + "cross_attn.in_proj_bias")
        hd = cfg.hidden_dim
        cross = {
            "q": {"kernel": inw[:hd].T, "bias": inb[:hd]},
            "k": {"kernel": inw[hd:2 * hd].T, "bias": inb[hd:2 * hd]},
            "v": {"kernel": inw[2 * hd:].T, "bias": inb[2 * hd:]},
            "out": _lin(state, b + "cross_attn.out_proj"),
        }
        dec_layers.append({
            "cross_attn": cross,
            "cross_attn_layer_norm": _nrm(state, b + "cross_attn_layer_norm"),
            "self_attn": {
                "q": _lin(state, b + "self_attn.q_proj"),
                "k": _lin(state, b + "self_attn.k_proj"),
                "v": _lin(state, b + "self_attn.v_proj"),
                "out": _lin(state, b + "self_attn.out_proj")},
            "self_attn_layer_norm": _nrm(state, b + "self_attn_layer_norm"),
            "fc1": _lin(state, b + "fc1"), "fc2": _lin(state, b + "fc2"),
            "final_layer_norm": _nrm(state, b + "final_layer_norm"),
        })
    tr = {
        "level_embed": _t(state, tfx + "level_embed.weight"),
        "queries_embedder": _t(state, tfx + "queries_embedder.weight"),
        "queries_features": _t(state, tfx + "queries_features.weight"),
        "decoder_layers": dec_layers,
        "decoder_norm": _nrm(state, tfx + "decoder.layernorm"),
        "mask_predictor": {"mask_embedder": [
            _lin(state, tfx + f"decoder.mask_predictor.mask_embedder.{i}.0")
            for i in range(3)]},
        "class_predictor": _lin(state, "class_predictor"),
    }
    return {
        "backbone": import_hf_swin_backbone(
            state, cfg.backbone, prefix="model.pixel_level_module.encoder."),
        "pixel_decoder": pd,
        "transformer": tr,
    }


def config_from_hf_mask2former(hf_cfg: Any) -> Mask2FormerConfig:
    return Mask2FormerConfig(
        backbone=config_from_hf_swin(hf_cfg.backbone_config),
        feature_size=hf_cfg.feature_size,
        mask_feature_size=hf_cfg.mask_feature_size,
        hidden_dim=hf_cfg.hidden_dim,
        encoder_layers=hf_cfg.encoder_layers,
        decoder_layers=hf_cfg.decoder_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        encoder_feedforward_dim=hf_cfg.encoder_feedforward_dim,
        dim_feedforward=hf_cfg.dim_feedforward,
        num_queries=hf_cfg.num_queries,
        num_labels=hf_cfg.num_labels,
        pre_norm=hf_cfg.pre_norm,
        common_stride=hf_cfg.common_stride,
        feature_strides=tuple(hf_cfg.feature_strides),
    )

"""Swin-Transformer backbone in pure JAX (TPU instance-segmentation trunk).

Role in the framework (SURVEY.md §2.1 P6): the reference's 2D masks come
from a Detectron2 cascade Mask R-CNN with an MViTv2-H trunk — a
multi-scale-attention hierarchy.  The TPU-served instance-segmentation
backend (``models/mask2former.py``) uses the Swin hierarchy this module
implements, matching the HuggingFace ``SwinBackbone`` layout so pretrained
Mask2Former checkpoints import directly.  Differentially tested against
the installed transformers torch implementation in
``tests/test_mask2former_parity.py``.

TPU-first notes: NHWC; window partition/cyclic shift as reshape/roll with
static shapes; the relative-position-bias gather index and the shifted-
window attention mask are compile-time numpy constants per (H, W) — the
backbone runs with ``always_partition`` semantics (fixed window/shift),
exactly like ``SwinBackbone``.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    patch_size: int = 4
    num_channels: int = 3
    layer_norm_eps: float = 1e-5
    out_indices: Sequence[int] = (1, 2, 3, 4)

    def stage_dim(self, i: int) -> int:
        return int(self.embed_dim * 2 ** i)


def _ln(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * p["scale"]
            + p["bias"]).astype(x.dtype)


@functools.lru_cache(maxsize=64)
def _rel_index(window: int) -> np.ndarray:
    """(w*w, w*w) gather index into the (2w-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=256)
def _shift_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """SW-MSA attention mask (num_windows, w*w, w*w) of 0 / -100."""
    img = np.zeros((hp, wp), np.float32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift),
               slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(hp // window, window, wp // window, window)
    wins = wins.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_attention(p, x, heads: int, window: int, mask, eps: float):
    """x: (nW, w*w, C); mask: (num_windows_per_image, w*w, w*w) or None."""
    b, n, c = x.shape
    d = c // heads
    q = (x @ p["query"]["kernel"] + p["query"]["bias"]).reshape(b, n, heads,
                                                                d)
    k = (x @ p["key"]["kernel"] + p["key"]["bias"]).reshape(b, n, heads, d)
    v = (x @ p["value"]["kernel"] + p["value"]["bias"]).reshape(b, n, heads,
                                                                d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d)
    bias = p["rel_bias_table"][_rel_index(window).reshape(-1)]
    bias = bias.reshape(n, n, heads).transpose(2, 0, 1)
    logits = logits + bias[None]
    if mask is not None:
        m = mask.shape[0]
        logits = logits.reshape(b // m, m, heads, n, n) + mask[None, :, None]
        logits = logits.reshape(b, heads, n, n)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    y = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, c)
    return y @ p["proj"]["kernel"] + p["proj"]["bias"]


def _swin_layer(p, x, hw: Tuple[int, int], heads: int, window: int,
                shift: int, cfg: SwinConfig):
    h, w = hw
    b, _, c = x.shape
    shortcut = x
    y = _ln(x, p["norm1"], cfg.layer_norm_eps).reshape(b, h, w, c)
    ph, pw = -h % window, -w % window
    y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    if shift > 0:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(_shift_mask(hp, wp, window, shift))
    else:
        mask = None
    y = y.reshape(b, hp // window, window, wp // window, window, c)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)
    y = _window_attention(p["attn"], y, heads, window, mask,
                          cfg.layer_norm_eps)
    y = y.reshape(b, hp // window, wp // window, window, window, c)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    if shift > 0:
        y = jnp.roll(y, (shift, shift), axis=(1, 2))
    y = y[:, :h, :w].reshape(b, h * w, c)
    x = shortcut + y
    y = _ln(x, p["norm2"], cfg.layer_norm_eps)
    y = jax.nn.gelu(y @ p["fc1"]["kernel"] + p["fc1"]["bias"],
                    approximate=False)
    return x + (y @ p["fc2"]["kernel"] + p["fc2"]["bias"])


def _patch_merge(p, x, hw: Tuple[int, int], cfg: SwinConfig):
    h, w = hw
    b, _, c = x.shape
    y = x.reshape(b, h, w, c)
    y = jnp.pad(y, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    y = jnp.concatenate([y[:, 0::2, 0::2], y[:, 1::2, 0::2],
                         y[:, 0::2, 1::2], y[:, 1::2, 1::2]], axis=-1)
    y = y.reshape(b, -1, 4 * c)
    y = _ln(y, p["norm"], cfg.layer_norm_eps)
    return y @ p["reduction"]


def swin_backbone(params: Dict[str, Any], pixels: jnp.ndarray,
                  cfg: SwinConfig) -> List[jnp.ndarray]:
    """pixels (B, H, W, 3) normalized NHWC -> NHWC feature maps at the
    configured out stages (1-indexed; stride 4 * 2^(i-1), layernormed),
    exactly SwinBackbone.forward with always_partition=True."""
    b, hh, ww, _ = pixels.shape
    x = jax.lax.conv_general_dilated(
        pixels, params["patch_proj"]["kernel"],
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h, w = x.shape[1], x.shape[2]
    x = x.reshape(b, h * w, cfg.embed_dim) + params["patch_proj"]["bias"]
    x = _ln(x, params["embed_norm"], cfg.layer_norm_eps)

    out: List[jnp.ndarray] = []
    for si, depth in enumerate(cfg.depths):
        sp = params[f"stage_{si}"]
        for bi in range(depth):
            shift = 0 if bi % 2 == 0 else cfg.window_size // 2
            x = _swin_layer(sp[f"block_{bi}"], x, (h, w),
                            cfg.num_heads[si], cfg.window_size, shift, cfg)
        if (si + 1) in cfg.out_indices:
            c = cfg.stage_dim(si)
            f = _ln(x, params[f"out_norm_{si + 1}"], cfg.layer_norm_eps)
            out.append(f.reshape(b, h, w, c))
        if "downsample" in sp:
            x = _patch_merge(sp["downsample"], x, (h, w), cfg)
            h, w = (h + 1) // 2, (w + 1) // 2
    return out


def _t(state, name):
    v = state[name]
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      np.float32)


def _lin(state, name):
    return {"kernel": _t(state, name + ".weight").T,
            "bias": _t(state, name + ".bias")}


def _norm_i(state, name):
    return {"scale": _t(state, name + ".weight"),
            "bias": _t(state, name + ".bias")}


def import_hf_swin_backbone(state: Dict[str, Any], cfg: SwinConfig,
                            prefix: str = "") -> Dict[str, Any]:
    """Map a ``transformers.SwinBackbone`` state dict (optionally under
    ``prefix``, e.g. Mask2Former's ``model.pixel_level_module.encoder.``)
    onto the params pytree."""
    g = lambda n: _t(state, prefix + n)  # noqa: E731
    p: Dict[str, Any] = {
        "patch_proj": {
            "kernel": g("embeddings.patch_embeddings.projection.weight"
                        ).transpose(2, 3, 1, 0),
            "bias": g("embeddings.patch_embeddings.projection.bias")},
        "embed_norm": _norm_i(state, prefix + "embeddings.norm"),
    }
    for i in cfg.out_indices:
        p[f"out_norm_{i}"] = _norm_i(state,
                                     prefix + f"hidden_states_norms.stage{i}")
    for si, depth in enumerate(cfg.depths):
        sp: Dict[str, Any] = {}
        for bi in range(depth):
            base = prefix + f"encoder.layers.{si}.blocks.{bi}."
            sp[f"block_{bi}"] = {
                "norm1": _norm_i(state, base + "layernorm_before"),
                "norm2": _norm_i(state, base + "layernorm_after"),
                "attn": {
                    "query": _lin(state, base + "attention.self.query"),
                    "key": _lin(state, base + "attention.self.key"),
                    "value": _lin(state, base + "attention.self.value"),
                    "proj": _lin(state, base + "attention.output.dense"),
                    "rel_bias_table": _t(
                        state,
                        base + "attention.self.relative_position_bias_table"),
                },
                "fc1": _lin(state, base + "intermediate.dense"),
                "fc2": _lin(state, base + "output.dense"),
            }
        ds = prefix + f"encoder.layers.{si}.downsample."
        if ds + "reduction.weight" in state or any(
                k.startswith(ds) for k in state):
            sp["downsample"] = {
                "reduction": _t(state, ds + "reduction.weight").T,
                "norm": _norm_i(state, ds + "norm"),
            }
        p[f"stage_{si}"] = sp
    return p


def config_from_hf_swin(hf_cfg: Any) -> SwinConfig:
    name_to_idx = {f"stage{i}": i for i in range(1, 1 + len(hf_cfg.depths))}
    out = tuple(sorted(name_to_idx[n] for n in hf_cfg.out_features))
    return SwinConfig(
        embed_dim=hf_cfg.embed_dim, depths=tuple(hf_cfg.depths),
        num_heads=tuple(hf_cfg.num_heads), window_size=hf_cfg.window_size,
        mlp_ratio=hf_cfg.mlp_ratio, patch_size=hf_cfg.patch_size,
        num_channels=hf_cfg.num_channels,
        layer_norm_eps=hf_cfg.layer_norm_eps, out_indices=out)

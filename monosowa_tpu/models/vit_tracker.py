"""One-stream ViT single-object tracker in pure JAX (TPU 2D tracker).

Role in the framework (SURVEY.md §2.1 P23): the reference tracks each car
mask across stitched Waymo panoramas with the external ODTrack repo
(pseudo_label_generator/3d/scripts/tracker_ODTrack.py:10, dynamically
imported).  ``sowa/tracker2d.py`` defines the ``SingleObjectTracker``
protocol; this module provides the TPU-native network implementation of
that capability: a one-stream transformer tracker in the OSTrack/ODTrack
family — template and search crops jointly attended by a ViT, with
ODTrack's signature *online token propagation* (a learnable track token
carried across frames so temporal context flows through the video) and a
center/offset/size head.

ODTrack's exact pretrained weights target its own repo layout and are not
importable in this image (zero egress, no published HF port); this
implementation is therefore trainable/finetunable rather than
checkpoint-compatible, and is differentially tested against an
independently-written torch mirror (``tests/test_vit_tracker_parity.py``)
to pin the numerics, plus importer tests for the torch state-dict mapping.

TPU-first: static crop sizes (one compile), batched einsum attention, the
whole per-frame step is one jitted call returning (box, score, new track
token).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ViTTrackerConfig:
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 6
    mlp_ratio: float = 4.0
    patch_size: int = 16
    template_size: int = 128
    search_size: int = 256
    num_track_tokens: int = 1
    layer_norm_eps: float = 1e-6

    @property
    def grid_t(self) -> int:
        return self.template_size // self.patch_size

    @property
    def grid_s(self) -> int:
        return self.search_size // self.patch_size


def _ln(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * p["scale"]
            + p["bias"]).astype(x.dtype)


def _block(p, x, cfg: ViTTrackerConfig):
    b, n, c = x.shape
    h = cfg.num_heads
    d = c // h
    y = _ln(x, p["norm1"], cfg.layer_norm_eps)
    qkv = (y @ p["qkv"]["kernel"] + p["qkv"]["bias"]).reshape(b, n, 3, h, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    att = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, c)
    x = x + att @ p["proj"]["kernel"] + p["proj"]["bias"]
    y = _ln(x, p["norm2"], cfg.layer_norm_eps)
    y = jax.nn.gelu(y @ p["fc1"]["kernel"] + p["fc1"]["bias"],
                    approximate=False)
    return x + (y @ p["fc2"]["kernel"] + p["fc2"]["bias"])


def _embed(p, img, cfg: ViTTrackerConfig):
    """(B, S, S, 3) -> (B, g*g, C) patch tokens."""
    x = jax.lax.conv_general_dilated(
        img, p["kernel"], (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x.reshape(img.shape[0], -1, cfg.hidden_size) + p["bias"]


def tracker_forward(params: Dict[str, Any], template: jnp.ndarray,
                    search: jnp.ndarray, track_tokens: jnp.ndarray,
                    cfg: ViTTrackerConfig
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """template (B, T, T, 3), search (B, S, S, 3) normalized crops;
    track_tokens (B, K, C) propagated from the previous frame
    (params["track_token"] broadcast for the first frame).

    Returns (box (B, 4) as normalized search-crop cxcywh, score map
    (B, gs, gs), new track tokens (B, K, C))."""
    zt = _embed(params["patch_proj"], template, cfg) + params["pos_z"]
    xt = _embed(params["patch_proj"], search, cfg) + params["pos_x"]
    n_z = zt.shape[1]
    k = cfg.num_track_tokens
    tokens = jnp.concatenate([track_tokens, zt, xt], axis=1)
    for i in range(cfg.num_layers):
        tokens = _block(params[f"block_{i}"], tokens, cfg)
    tokens = _ln(tokens, params["final_norm"], cfg.layer_norm_eps)
    new_track = tokens[:, :k]
    xs = tokens[:, k + n_z:]

    gs = cfg.grid_s
    fmap = xs.reshape(xs.shape[0], gs, gs, cfg.hidden_size)

    def head(branch, x):
        for j, layer in enumerate(branch["convs"]):
            x = jax.lax.conv_general_dilated(
                x, layer["kernel"], (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + layer["bias"]
            if j < len(branch["convs"]) - 1:
                x = jax.nn.relu(x)
        return x

    score = head(params["score_head"], fmap)[..., 0]        # (B, gs, gs)
    offset = jax.nn.sigmoid(head(params["offset_head"], fmap))  # (B,gs,gs,2)
    size = jax.nn.sigmoid(head(params["size_head"], fmap))      # (B,gs,gs,2)

    flat = score.reshape(score.shape[0], -1)
    idx = jnp.argmax(flat, axis=-1)
    iy, ix = idx // gs, idx % gs
    bi = jnp.arange(score.shape[0])
    off = offset[bi, iy, ix]
    sz = size[bi, iy, ix]
    cx = (ix.astype(jnp.float32) + off[:, 0]) / gs
    cy = (iy.astype(jnp.float32) + off[:, 1]) / gs
    box = jnp.stack([cx, cy, sz[:, 0], sz[:, 1]], axis=-1)
    return box, score, new_track


def _dense(rng, n_in, n_out):
    return {"kernel": (rng.normal(0, 0.02, (n_in, n_out))
                       ).astype(np.float32),
            "bias": np.zeros(n_out, np.float32)}


def _norm(c):
    return {"scale": np.ones(c, np.float32), "bias": np.zeros(c, np.float32)}


def _conv_stack(rng, dims):
    return {"convs": [
        {"kernel": rng.normal(0, 0.02, (3, 3, dims[i], dims[i + 1])
                              ).astype(np.float32),
         "bias": np.zeros(dims[i + 1], np.float32)}
        for i in range(len(dims) - 1)]}


def init_tracker_params(seed: int, cfg: ViTTrackerConfig) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    c = cfg.hidden_size
    m = int(c * cfg.mlp_ratio)
    p: Dict[str, Any] = {
        "patch_proj": {
            "kernel": rng.normal(0, 0.02, (cfg.patch_size, cfg.patch_size,
                                           3, c)).astype(np.float32),
            "bias": np.zeros(c, np.float32)},
        "pos_z": rng.normal(0, 0.02, (1, cfg.grid_t ** 2, c)
                            ).astype(np.float32),
        "pos_x": rng.normal(0, 0.02, (1, cfg.grid_s ** 2, c)
                            ).astype(np.float32),
        "track_token": rng.normal(0, 0.02, (1, cfg.num_track_tokens, c)
                                  ).astype(np.float32),
        "final_norm": _norm(c),
        "score_head": _conv_stack(rng, [c, c // 2, 1]),
        "offset_head": _conv_stack(rng, [c, c // 2, 2]),
        "size_head": _conv_stack(rng, [c, c // 2, 2]),
    }
    for i in range(cfg.num_layers):
        p[f"block_{i}"] = {
            "norm1": _norm(c), "norm2": _norm(c),
            "qkv": _dense(rng, c, 3 * c), "proj": _dense(rng, c, c),
            "fc1": _dense(rng, c, m), "fc2": _dense(rng, m, c),
        }
    return p


def _t(state, name):
    v = state[name]
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      np.float32)


def import_torch_tracker(state: Dict[str, Any],
                         cfg: ViTTrackerConfig) -> Dict[str, Any]:
    """Map the torch mirror's state dict (tests/test_vit_tracker_parity.py
    layout: patch_proj Conv2d, blocks.{i}.{norm1,qkv,proj,norm2,fc1,fc2},
    {score,offset,size}_head.{0,2} Conv2d) onto the params pytree."""
    lin = lambda n: {"kernel": _t(state, n + ".weight").T,  # noqa: E731
                     "bias": _t(state, n + ".bias")}
    nrm = lambda n: {"scale": _t(state, n + ".weight"),  # noqa: E731
                     "bias": _t(state, n + ".bias")}
    cv = lambda n: {"kernel": _t(state, n + ".weight"  # noqa: E731
                                 ).transpose(2, 3, 1, 0),
                    "bias": _t(state, n + ".bias")}
    p: Dict[str, Any] = {
        "patch_proj": cv("patch_proj"),
        "pos_z": _t(state, "pos_z"),
        "pos_x": _t(state, "pos_x"),
        "track_token": _t(state, "track_token"),
        "final_norm": nrm("final_norm"),
    }
    for head in ("score_head", "offset_head", "size_head"):
        p[head] = {"convs": [cv(f"{head}.0"), cv(f"{head}.2")]}
    for i in range(cfg.num_layers):
        b = f"blocks.{i}."
        p[f"block_{i}"] = {
            "norm1": nrm(b + "norm1"), "norm2": nrm(b + "norm2"),
            "qkv": lin(b + "qkv"), "proj": lin(b + "proj"),
            "fc1": lin(b + "fc1"), "fc2": lin(b + "fc2"),
        }
    return p

"""DINOv2 vision-transformer backbone in pure JAX (TPU inference path).

Capability context (SURVEY.md §2.4.8): the reference pipeline consumes two
frozen external ViT models — Metric3Dv2 (a DINOv2-giant2 backbone + depth
decoder, pseudo_label_generator/3d/scripts/metric3d.py:17-37) and SAM.
This module provides the DINOv2 trunk those stacks share, as a functional
JAX forward over an explicit parameter pytree, plus an importer from the
HuggingFace ``transformers`` checkpoint layout
(``Dinov2Model``/``Dinov2WithRegistersModel``).  It is differentially
tested against the torch implementation in
``tests/test_depth_anything_parity.py``.

Design notes (TPU-first):
* one params pytree, jit the whole forward; static config via closure;
* attention as batched einsums (MXU), f32 softmax;
* position-embedding resampling uses the torch-exact bicubic matrices from
  ``monosowa_tpu.ops.resize`` (plain kernel for Dinov2, antialiased A=-0.5
  kernel for the with-registers variant) contracted as matmuls;
* supports the SwiGLU FFN used by the giant2 models and register tokens.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.ops.resize import resize_bicubic_torch


@dataclasses.dataclass(frozen=True)
class Dinov2Config:
    hidden_size: int = 384
    num_hidden_layers: int = 12
    num_attention_heads: int = 6
    mlp_ratio: float = 4.0
    patch_size: int = 14
    num_channels: int = 3
    pos_grid: int = 37            # position-embedding grid side (image//patch)
    layer_norm_eps: float = 1e-6
    use_swiglu_ffn: bool = False
    num_register_tokens: int = 0
    antialias_pos_interp: bool = False  # with-registers variant uses AA bicubic

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    def swiglu_hidden(self) -> int:
        h = int(self.hidden_size * self.mlp_ratio)
        return (int(h * 2 / 3) + 7) // 8 * 8


def _ln(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
        eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)


def _attention(p: Dict[str, Any], x: jnp.ndarray, cfg: Dinov2Config
               ) -> jnp.ndarray:
    b, n, c = x.shape
    h, d = cfg.num_attention_heads, cfg.head_dim
    q = (x @ p["query"]["kernel"] + p["query"]["bias"]).reshape(b, n, h, d)
    k = (x @ p["key"]["kernel"] + p["key"]["bias"]).reshape(b, n, h, d)
    v = (x @ p["value"]["kernel"] + p["value"]["bias"]).reshape(b, n, h, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, c)
    return out @ p["out"]["kernel"] + p["out"]["bias"]


def _mlp(p: Dict[str, Any], x: jnp.ndarray, cfg: Dinov2Config) -> jnp.ndarray:
    if cfg.use_swiglu_ffn:
        y = x @ p["weights_in"]["kernel"] + p["weights_in"]["bias"]
        x1, x2 = jnp.split(y, 2, axis=-1)
        return (jax.nn.silu(x1) * x2) @ p["weights_out"]["kernel"] \
            + p["weights_out"]["bias"]
    y = jax.nn.gelu(x @ p["fc1"]["kernel"] + p["fc1"]["bias"],
                    approximate=False)
    return y @ p["fc2"]["kernel"] + p["fc2"]["bias"]


def _layer(p: Dict[str, Any], x: jnp.ndarray, cfg: Dinov2Config
           ) -> jnp.ndarray:
    y = _attention(p["attention"], _ln(x, p["norm1"]["scale"],
                                       p["norm1"]["bias"],
                                       cfg.layer_norm_eps), cfg)
    x = x + y * p["layer_scale1"]
    y = _mlp(p["mlp"], _ln(x, p["norm2"]["scale"], p["norm2"]["bias"],
                           cfg.layer_norm_eps), cfg)
    return x + y * p["layer_scale2"]


def _interp_pos(pos: jnp.ndarray, ph: int, pw: int,
                cfg: Dinov2Config) -> jnp.ndarray:
    """Resample the (1, G*G+1, C) table to (1, ph*pw+1, C), torch-exact
    (modeling_dinov2.py interpolate_pos_encoding)."""
    g = cfg.pos_grid
    if ph == g and pw == g:
        return pos
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    grid = patch_pos.reshape(1, g, g, -1)
    grid = resize_bicubic_torch(grid, (ph, pw), align_corners=False,
                                antialias=cfg.antialias_pos_interp)
    return jnp.concatenate([cls_pos, grid.reshape(1, ph * pw, -1)], axis=1)


def dinov2_hidden_states(params: Dict[str, Any], pixels: jnp.ndarray,
                         cfg: Dinov2Config) -> List[jnp.ndarray]:
    """pixels: (B, H, W, 3) normalized NHWC -> [embeddings, layer1, ...]
    token sequences of shape (B, 1 + num_register_tokens + ph*pw, C)."""
    b, h, w, _ = pixels.shape
    ph, pw = h // cfg.patch_size, w // cfg.patch_size
    x = jax.lax.conv_general_dilated(
        pixels, params["patch_proj"]["kernel"],
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x.reshape(b, ph * pw, cfg.hidden_size) + params["patch_proj"]["bias"]
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interp_pos(params["position_embeddings"], ph, pw, cfg)
    if cfg.num_register_tokens:
        reg = jnp.broadcast_to(
            params["register_tokens"],
            (b, cfg.num_register_tokens, cfg.hidden_size))
        x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)
    states = [x]
    for i in range(cfg.num_hidden_layers):
        x = _layer(params[f"layer_{i}"], x, cfg)
        states.append(x)
    return states


def dinov2_features(params: Dict[str, Any], pixels: jnp.ndarray,
                    cfg: Dinov2Config, out_indices: Sequence[int],
                    apply_layernorm: bool = True) -> List[jnp.ndarray]:
    """Backbone contract (Dinov2Backbone.forward, reshape_hidden_states
    False): pick hidden states by index (0 = embeddings), optionally apply
    the final layernorm; token sequences keep cls (+ register) tokens."""
    states = dinov2_hidden_states(params, pixels, cfg)
    out = []
    for i in out_indices:
        s = states[i]
        if apply_layernorm:
            s = _ln(s, params["final_norm"]["scale"],
                    params["final_norm"]["bias"], cfg.layer_norm_eps)
        out.append(s)
    return out


def _dense(rng, n_in: int, n_out: int) -> Dict[str, np.ndarray]:
    k = rng.normal(0.0, 0.02, (n_in, n_out)).astype(np.float32)
    return {"kernel": k, "bias": np.zeros(n_out, np.float32)}


def init_dinov2_params(seed: int, cfg: Dinov2Config) -> Dict[str, Any]:
    rng = np.random.default_rng(seed)
    c = cfg.hidden_size
    p: Dict[str, Any] = {
        "cls_token": rng.normal(0, 0.02, (1, 1, c)).astype(np.float32),
        "position_embeddings": rng.normal(
            0, 0.02, (1, cfg.pos_grid * cfg.pos_grid + 1, c)
        ).astype(np.float32),
        "patch_proj": {
            "kernel": rng.normal(0, 0.02, (cfg.patch_size, cfg.patch_size,
                                           cfg.num_channels, c)
                                 ).astype(np.float32),
            "bias": np.zeros(c, np.float32)},
        "final_norm": {"scale": np.ones(c, np.float32),
                       "bias": np.zeros(c, np.float32)},
    }
    if cfg.num_register_tokens:
        p["register_tokens"] = np.zeros(
            (1, cfg.num_register_tokens, c), np.float32)
    for i in range(cfg.num_hidden_layers):
        mlp = ({"weights_in": _dense(rng, c, 2 * cfg.swiglu_hidden()),
                "weights_out": _dense(rng, cfg.swiglu_hidden(), c)}
               if cfg.use_swiglu_ffn else
               {"fc1": _dense(rng, c, int(c * cfg.mlp_ratio)),
                "fc2": _dense(rng, int(c * cfg.mlp_ratio), c)})
        p[f"layer_{i}"] = {
            "norm1": {"scale": np.ones(c, np.float32),
                      "bias": np.zeros(c, np.float32)},
            "norm2": {"scale": np.ones(c, np.float32),
                      "bias": np.zeros(c, np.float32)},
            "attention": {"query": _dense(rng, c, c),
                          "key": _dense(rng, c, c),
                          "value": _dense(rng, c, c),
                          "out": _dense(rng, c, c)},
            "layer_scale1": np.ones(c, np.float32),
            "layer_scale2": np.ones(c, np.float32),
            "mlp": mlp,
        }
    return p


def _t(state: Dict[str, Any], name: str) -> np.ndarray:
    v = state[name]
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      np.float32)


def _lin(state, name) -> Dict[str, np.ndarray]:
    return {"kernel": _t(state, name + ".weight").T,
            "bias": _t(state, name + ".bias")}


def import_hf_dinov2(state: Dict[str, Any], cfg: Dinov2Config,
                     prefix: str = "") -> Dict[str, Any]:
    """Map a ``transformers`` Dinov2(/WithRegisters)(Model|Backbone)
    state dict (optionally under ``prefix``, e.g. ``backbone.``) onto the
    params pytree used here.  Conv weights go OIHW -> HWIO."""
    g = lambda n: _t(state, prefix + n)  # noqa: E731
    lin = lambda n: _lin(state, prefix + n)  # noqa: E731
    p: Dict[str, Any] = {
        "cls_token": g("embeddings.cls_token"),
        "position_embeddings": g("embeddings.position_embeddings"),
        "patch_proj": {
            "kernel": g("embeddings.patch_embeddings.projection.weight"
                        ).transpose(2, 3, 1, 0),
            "bias": g("embeddings.patch_embeddings.projection.bias")},
    }
    if cfg.num_register_tokens:
        p["register_tokens"] = g("embeddings.register_tokens")
    if prefix + "layernorm.weight" in state:
        p["final_norm"] = {"scale": g("layernorm.weight"),
                           "bias": g("layernorm.bias")}
    else:  # backbones keep the same tensor under the same name; models too
        p["final_norm"] = {"scale": np.ones(cfg.hidden_size, np.float32),
                           "bias": np.zeros(cfg.hidden_size, np.float32)}
    for i in range(cfg.num_hidden_layers):
        base = f"encoder.layer.{i}."
        mlp = ({"weights_in": lin(base + "mlp.weights_in"),
                "weights_out": lin(base + "mlp.weights_out")}
               if cfg.use_swiglu_ffn else
               {"fc1": lin(base + "mlp.fc1"), "fc2": lin(base + "mlp.fc2")})
        p[f"layer_{i}"] = {
            "norm1": {"scale": g(base + "norm1.weight"),
                      "bias": g(base + "norm1.bias")},
            "norm2": {"scale": g(base + "norm2.weight"),
                      "bias": g(base + "norm2.bias")},
            "attention": {
                "query": lin(base + "attention.attention.query"),
                "key": lin(base + "attention.attention.key"),
                "value": lin(base + "attention.attention.value"),
                "out": lin(base + "attention.output.dense")},
            "layer_scale1": g(base + "layer_scale1.lambda1"),
            "layer_scale2": g(base + "layer_scale2.lambda1"),
            "mlp": mlp,
        }
    return p


def config_from_hf(hf_cfg: Any) -> Dinov2Config:
    """Build from a ``transformers`` Dinov2Config/Dinov2WithRegistersConfig."""
    return Dinov2Config(
        hidden_size=hf_cfg.hidden_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        mlp_ratio=hf_cfg.mlp_ratio,
        patch_size=hf_cfg.patch_size,
        num_channels=hf_cfg.num_channels,
        pos_grid=hf_cfg.image_size // hf_cfg.patch_size,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        use_swiglu_ffn=hf_cfg.use_swiglu_ffn,
        num_register_tokens=getattr(hf_cfg, "num_register_tokens", 0),
        antialias_pos_interp=getattr(hf_cfg, "num_register_tokens", 0) > 0,
    )

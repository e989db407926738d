"""Segment-Anything (SAM) in pure JAX — the TPU mask-refinement network.

Role in the framework (SURVEY.md §2.1 P6): the reference optionally
refines each Detectron2 car mask with a box-prompted SAM ViT-H pass
(pseudo_label_generator/3d/scripts/filtering.py:112-148 ``run_SAM_batch``,
loader.py:97-103 ``load_and_init_SAM``).  ``sowa/masks.py`` defines the
``MaskRefineBackend`` protocol; this module provides the TPU-served
implementation: the full SAM stack (windowed-attention ViT image encoder
with decomposed relative positions, Fourier prompt encoder, two-way
transformer mask decoder), forward-compatible with any HuggingFace
``SamModel`` checkpoint via ``import_hf_sam``.  Differentially tested
against the installed transformers torch implementation in
``tests/test_sam_parity.py``.

TPU-first notes: NHWC; window partition as reshape/transpose (static
shapes — the encoder always runs at the padded square training size, so
no data-dependent padding); decomposed rel-pos bias via two einsums;
the decoder's stride-2 transposed convs as per-patch matmul + reshape.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SamVisionConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 1024
    patch_size: int = 16
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (2, 5, 8, 11)
    output_channels: int = 256
    mlp_dim: int = 3072
    layer_norm_eps: float = 1e-6
    use_abs_pos: bool = True
    use_rel_pos: bool = True

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


@dataclasses.dataclass(frozen=True)
class SamDecoderConfig:
    hidden_size: int = 256
    num_attention_heads: int = 8
    num_hidden_layers: int = 2
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    layer_norm_eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class SamConfig:
    vision: SamVisionConfig = SamVisionConfig()
    decoder: SamDecoderConfig = SamDecoderConfig()
    prompt_image_size: int = 1024      # prompt_encoder_config.image_size
    embedding_size: int = 64           # prompt_encoder_config.image_embedding_size


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * w + b).astype(x.dtype)


# ---------------------------------------------------------------- vision


def _interp_rel_pos(rel_pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """get_rel_pos's F.interpolate(mode='linear') resize to 2*size-1 rows."""
    max_rel = 2 * size - 1
    if rel_pos.shape[0] == max_rel:
        return rel_pos
    from monosowa_tpu.ops.resize import _matrix  # torch-exact linear matrix
    m = jnp.asarray(_matrix(max_rel, rel_pos.shape[0], False, "linear"))
    return m @ rel_pos


def _rel_bias(q: jnp.ndarray, rel_h: jnp.ndarray, rel_w: jnp.ndarray,
              h: int, w: int) -> jnp.ndarray:
    """Decomposed rel-pos bias (get_decomposed_rel_pos, q_size == k_size):
    q: (B*, h*w, d) -> (B*, h*w, h*w)."""
    # static (h, w) -> build gather indices in numpy so they stay
    # compile-time constants under jit
    ih = (np.arange(h)[:, None] - np.arange(h)[None, :]) + (h - 1)
    iw = (np.arange(w)[:, None] - np.arange(w)[None, :]) + (w - 1)
    rh = jnp.asarray(_interp_rel_pos(rel_h, h))[ih]
    rw = jnp.asarray(_interp_rel_pos(rel_w, w))[iw]
    qg = q.reshape(q.shape[0], h, w, q.shape[-1])
    bh = jnp.einsum("bhwc,hkc->bhwk", qg, rh)
    bw = jnp.einsum("bhwc,wkc->bhwk", qg, rw)
    return (bh[..., :, None] + bw[..., None, :]).reshape(
        q.shape[0], h * w, h * w)


def _vision_attention(p, x, cfg: SamVisionConfig):
    """x: (B', h, w, C) windowed or global grid."""
    b, h, w, c = x.shape
    nh = cfg.num_attention_heads
    d = c // nh
    qkv = x.reshape(b, h * w, c) @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    qkv = qkv.reshape(b, h * w, 3, nh, d).transpose(2, 0, 3, 1, 4)
    qkv = qkv.reshape(3, b * nh, h * w, d)
    q, k, v = qkv[0], qkv[1], qkv[2]
    logits = (q / math.sqrt(d)) @ k.transpose(0, 2, 1)
    if cfg.use_rel_pos:
        logits = logits + _rel_bias(q, p["rel_pos_h"], p["rel_pos_w"], h, w)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    y = (probs @ v).reshape(b, nh, h, w, d).transpose(0, 2, 3, 1, 4)
    y = y.reshape(b, h, w, c)
    return y @ p["proj"]["kernel"] + p["proj"]["bias"]


def _window_partition(x: jnp.ndarray, ws: int):
    b, h, w, c = x.shape
    ph, pw = -h % ws, -w % ws
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hh, ww = h + ph, w + pw
    x = x.reshape(b, hh // ws, ws, ww // ws, ws, c)
    return (x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c), (hh, ww))


def _window_unpartition(wins: jnp.ndarray, ws: int, padded, orig):
    hh, ww = padded
    h, w = orig
    b = wins.shape[0] // (hh * ww // ws // ws)
    x = wins.reshape(b, hh // ws, ww // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, -1)
    return x[:, :h, :w]


def _mlp_block(p, x, act: str = "gelu"):
    y = x @ p["lin1"]["kernel"] + p["lin1"]["bias"]
    y = jax.nn.relu(y) if act == "relu" else jax.nn.gelu(y,
                                                         approximate=False)
    return y @ p["lin2"]["kernel"] + p["lin2"]["bias"]


def _ln2d(p, x, eps=1e-6):
    """SamLayerNorm over the channel axis of (B, H, W, C)."""
    return _ln(x, p["scale"], p["bias"], eps)


def sam_vision_forward(params: Dict[str, Any], pixels: jnp.ndarray,
                       cfg: SamVisionConfig) -> jnp.ndarray:
    """pixels: (B, S, S, 3) normalized NHWC (S = cfg.image_size) ->
    image embeddings (B, grid, grid, output_channels)."""
    x = jax.lax.conv_general_dilated(
        pixels, params["patch_proj"]["kernel"],
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + params["patch_proj"]["bias"]
    if cfg.use_abs_pos:
        x = x + params["pos_embed"]
    for i in range(cfg.num_hidden_layers):
        p = params[f"layer_{i}"]
        ws = 0 if i in cfg.global_attn_indexes else cfg.window_size
        res = x
        y = _ln(x, p["norm1"]["scale"], p["norm1"]["bias"],
                cfg.layer_norm_eps)
        if ws > 0:
            h, w = y.shape[1], y.shape[2]
            y, padded = _window_partition(y, ws)
            y = _vision_attention(p["attn"], y, cfg)
            y = _window_unpartition(y, ws, padded, (h, w))
        else:
            y = _vision_attention(p["attn"], y, cfg)
        x = res + y
        x = x + _mlp_block(p["mlp"], _ln(x, p["norm2"]["scale"],
                                         p["norm2"]["bias"],
                                         cfg.layer_norm_eps))
    # neck: conv1x1 -> LN2d -> conv3x3 -> LN2d (channels-first in torch)
    n = params["neck"]
    x = jax.lax.conv_general_dilated(
        x, n["conv1"]["kernel"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = _ln2d(n["layer_norm1"], x)
    x = jax.lax.conv_general_dilated(
        x, n["conv2"]["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _ln2d(n["layer_norm2"], x)


# ---------------------------------------------------------------- prompts


def _fourier_embed(coords01: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """SamPositionalEmbedding: coords in [0,1]^2 (..., 2) -> (..., 2F)."""
    c = (2.0 * coords01 - 1.0) @ table * (2.0 * np.pi)
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


def sam_embed_boxes(params: Dict[str, Any], boxes: jnp.ndarray,
                    cfg: SamConfig) -> jnp.ndarray:
    """boxes: (B, nb, 4) xyxy in input-image pixels -> (B, nb, 2, C)
    (SamPromptEncoder._embed_boxes)."""
    s = cfg.prompt_image_size
    coords = (boxes + 0.5).reshape(*boxes.shape[:2], 2, 2) / jnp.asarray(
        [s, s], jnp.float32)
    emb = _fourier_embed(coords, params["shared_embedding"])
    pe = params["point_embed"]
    return emb + jnp.stack([pe[2], pe[3]])


def sam_image_pe(params: Dict[str, Any], cfg: SamConfig) -> jnp.ndarray:
    """get_image_wide_positional_embeddings -> (1, g, g, C)."""
    g = cfg.embedding_size
    r = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    yx = jnp.stack(jnp.meshgrid(r, r, indexing="ij"), -1)  # (g, g, [y, x])
    return _fourier_embed(yx[..., ::-1], params["shared_embedding"])[None]


# ---------------------------------------------------------------- decoder


def _attn(p, q, k, v, nh):
    """SamAttention on (B, P, N, C) token stacks."""
    b, pb, nq, _ = q.shape
    nk = k.shape[2]
    qp = q @ p["q_proj"]["kernel"] + p["q_proj"]["bias"]
    kp = k @ p["k_proj"]["kernel"] + p["k_proj"]["bias"]
    vp = v @ p["v_proj"]["kernel"] + p["v_proj"]["bias"]
    d = qp.shape[-1] // nh
    qp = qp.reshape(b, pb, nq, nh, d)
    kp = kp.reshape(b, pb, nk, nh, d)
    vp = vp.reshape(b, pb, nk, nh, d)
    logits = jnp.einsum("bpqhd,bpkhd->bphqk", qp, kp) / math.sqrt(d)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
    y = jnp.einsum("bphqk,bpkhd->bpqhd", probs, vp).reshape(b, pb, nq, -1)
    return y @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]


def _two_way_block(p, queries, keys, qpe, kpe, cfg: SamDecoderConfig,
                   skip_first: bool):
    eps = cfg.layer_norm_eps
    nh = cfg.num_attention_heads
    if skip_first:
        # torch: queries = self_attn(queries, queries, queries) — the
        # first block REPLACES the queries (no residual, no PE added)
        queries = _attn(p["self_attn"], queries, queries, queries, nh)
    else:
        q = queries + qpe
        queries = queries + _attn(p["self_attn"], q, q, queries, nh)
    queries = _ln(queries, p["layer_norm1"]["scale"],
                  p["layer_norm1"]["bias"], eps)
    q, k = queries + qpe, keys + kpe
    queries = queries + _attn(p["cross_attn_token_to_image"], q, k, keys, nh)
    queries = _ln(queries, p["layer_norm2"]["scale"],
                  p["layer_norm2"]["bias"], eps)
    # SamMaskDecoderConfig.hidden_act defaults to "relu" (unlike the
    # vision encoder's gelu)
    queries = queries + _mlp_block(p["mlp"], queries, act="relu")
    queries = _ln(queries, p["layer_norm3"]["scale"],
                  p["layer_norm3"]["bias"], eps)
    q, k = queries + qpe, keys + kpe
    keys = keys + _attn(p["cross_attn_image_to_token"], k, q, queries, nh)
    keys = _ln(keys, p["layer_norm4"]["scale"], p["layer_norm4"]["bias"], eps)
    return queries, keys


def sam_mask_decoder(params: Dict[str, Any], image_embeddings: jnp.ndarray,
                     image_pe: jnp.ndarray, sparse: jnp.ndarray,
                     dense: jnp.ndarray, cfg: SamConfig,
                     multimask_output: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """image_embeddings: (B, g, g, C) NHWC; image_pe: (1, g, g, C);
    sparse: (B, P, n, C); dense: (B, g, g, C) -> (masks (B, P, M, 4g, 4g),
    iou (B, P, M))."""
    dc = cfg.decoder
    b, g, _, c = image_embeddings.shape
    pb = sparse.shape[1]
    out_tokens = jnp.concatenate([params["iou_token"],
                                  params["mask_tokens"]], axis=0)
    n_mask = params["mask_tokens"].shape[0]
    tokens = jnp.broadcast_to(out_tokens,
                              (b, pb, out_tokens.shape[0], c))
    tokens = jnp.concatenate([tokens, sparse], axis=2)

    img = (image_embeddings + dense)[:, None]             # (B, 1, g, g, C)
    img = jnp.broadcast_to(img, (b, pb, g, g, c)).reshape(b, pb, g * g, c)
    kpe = jnp.broadcast_to(image_pe[:, None], (b, pb, g, g, c)
                           ).reshape(b, pb, g * g, c)

    queries, keys = tokens, img
    for i in range(dc.num_hidden_layers):
        queries, keys = _two_way_block(params[f"block_{i}"], queries, keys,
                                       tokens, kpe, dc, skip_first=(i == 0))
    q = queries + tokens
    k = keys + kpe
    queries = queries + _attn(params["final_attn"], q, k, keys,
                              dc.num_attention_heads)
    queries = _ln(queries, params["final_norm"]["scale"],
                  params["final_norm"]["bias"], dc.layer_norm_eps)

    iou_out = queries[:, :, 0]
    mask_out = queries[:, :, 1:1 + n_mask]

    # upscale (ConvTranspose k2 s2 as matmul+reshape), per (B*P)
    up = keys.reshape(b * pb, g, g, c)

    def upconv(x, p, f=2):
        y = jnp.einsum("bhwc,dkco->bhwdko", x, p["kernel"])
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            x.shape[0], x.shape[1] * f, x.shape[2] * f, -1)
        return y + p["bias"]

    up = upconv(up, params["upscale_conv1"])
    up = jax.nn.gelu(_ln2d(params["upscale_layer_norm"], up),
                     approximate=False)
    up = jax.nn.gelu(upconv(up, params["upscale_conv2"]), approximate=False)
    gh, gw, cu = up.shape[1], up.shape[2], up.shape[3]
    up = up.reshape(b, pb, gh * gw, cu)

    hyper = jnp.stack(
        [_ffn(params["hyper_mlps"][i], mask_out[:, :, i])
         for i in range(n_mask)], axis=2)                  # (B, P, M, cu)
    masks = jnp.einsum("bpmc,bpnc->bpmn", hyper, up).reshape(
        b, pb, n_mask, gh, gw)
    iou_pred = _ffn(params["iou_head"], iou_out)
    sl = slice(1, None) if multimask_output else slice(0, 1)
    return masks[:, :, sl], iou_pred[:, :, sl]


def _ffn(p, x):
    y = jax.nn.relu(x @ p["proj_in"]["kernel"] + p["proj_in"]["bias"])
    for layer in p["layers"]:
        y = jax.nn.relu(y @ layer["kernel"] + layer["bias"])
    return y @ p["proj_out"]["kernel"] + p["proj_out"]["bias"]


def sam_predict_boxes(params: Dict[str, Any], pixels: jnp.ndarray,
                      boxes: jnp.ndarray, cfg: SamConfig,
                      multimask_output: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full box-prompted forward (SamModel.forward with input_boxes):
    pixels (B, S, S, 3) normalized; boxes (B, nb, 4) in input pixels ->
    (low-res masks (B, nb, M, 4g, 4g), iou (B, nb, M))."""
    emb = sam_vision_forward(params["vision"], pixels, cfg.vision)
    sparse = sam_embed_boxes(params["prompt"], boxes, cfg)
    dense = params["prompt"]["no_mask_embed"][None, None, None, :]
    dense = jnp.broadcast_to(
        dense, (emb.shape[0], cfg.embedding_size, cfg.embedding_size,
                dense.shape[-1]))
    pe = sam_image_pe(params["prompt"], cfg)
    return sam_mask_decoder(params["decoder"], emb, pe, sparse, dense, cfg,
                            multimask_output)


# ---------------------------------------------------------------- import


def _t(state, name):
    v = state[name]
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      np.float32)


def _lin(state, name):
    return {"kernel": _t(state, name + ".weight").T,
            "bias": _t(state, name + ".bias")}


def _norm(state, name):
    return {"scale": _t(state, name + ".weight"),
            "bias": _t(state, name + ".bias")}


def _conv(state, name, transpose_conv=False, bias=True):
    w = _t(state, name + ".weight")
    p = {"kernel": w.transpose(2, 3, 0, 1) if transpose_conv
         else w.transpose(2, 3, 1, 0)}
    if bias:
        p["bias"] = _t(state, name + ".bias")
    return p


def _ffn_import(state, base, depth):
    return {"proj_in": _lin(state, base + ".proj_in"),
            "layers": [_lin(state, f"{base}.layers.{i}")
                       for i in range(depth - 2)],
            "proj_out": _lin(state, base + ".proj_out")}


def import_hf_sam(state: Dict[str, Any], cfg: SamConfig) -> Dict[str, Any]:
    """Map a ``transformers.SamModel.state_dict()`` onto the params pytree."""
    v: Dict[str, Any] = {
        "patch_proj": _conv(state, "vision_encoder.patch_embed.projection"),
        "neck": {
            "conv1": _conv(state, "vision_encoder.neck.conv1", bias=False),
            "layer_norm1": _norm(state, "vision_encoder.neck.layer_norm1"),
            "conv2": _conv(state, "vision_encoder.neck.conv2", bias=False),
            "layer_norm2": _norm(state, "vision_encoder.neck.layer_norm2"),
        },
    }
    if cfg.vision.use_abs_pos:
        v["pos_embed"] = _t(state, "vision_encoder.pos_embed")
    for i in range(cfg.vision.num_hidden_layers):
        base = f"vision_encoder.layers.{i}."
        attn = {"qkv": _lin(state, base + "attn.qkv"),
                "proj": _lin(state, base + "attn.proj")}
        if cfg.vision.use_rel_pos:
            attn["rel_pos_h"] = _t(state, base + "attn.rel_pos_h")
            attn["rel_pos_w"] = _t(state, base + "attn.rel_pos_w")
        v[f"layer_{i}"] = {
            "norm1": _norm(state, base + "layer_norm1"),
            "norm2": _norm(state, base + "layer_norm2"),
            "attn": attn,
            "mlp": {"lin1": _lin(state, base + "mlp.lin1"),
                    "lin2": _lin(state, base + "mlp.lin2")},
        }

    prompt = {
        "shared_embedding": _t(
            state, "shared_image_embedding.positional_embedding"),
        "point_embed": np.stack([
            _t(state, f"prompt_encoder.point_embed.{i}.weight")[0]
            for i in range(4)]),
        "no_mask_embed": _t(state, "prompt_encoder.no_mask_embed.weight")[0],
    }

    dc = cfg.decoder
    d: Dict[str, Any] = {
        "iou_token": _t(state, "mask_decoder.iou_token.weight"),
        "mask_tokens": _t(state, "mask_decoder.mask_tokens.weight"),
        "upscale_conv1": _conv(state, "mask_decoder.upscale_conv1",
                               transpose_conv=True),
        "upscale_conv2": _conv(state, "mask_decoder.upscale_conv2",
                               transpose_conv=True),
        "upscale_layer_norm": _norm(state, "mask_decoder.upscale_layer_norm"),
        "final_attn": {
            k: _lin(state,
                    "mask_decoder.transformer.final_attn_token_to_image."
                    + k)
            for k in ("q_proj", "k_proj", "v_proj", "out_proj")},
        "final_norm": _norm(
            state, "mask_decoder.transformer.layer_norm_final_attn"),
        "hyper_mlps": [
            _ffn_import(state,
                        f"mask_decoder.output_hypernetworks_mlps.{i}", 3)
            for i in range(dc.num_multimask_outputs + 1)],
        "iou_head": _ffn_import(state, "mask_decoder.iou_prediction_head",
                                dc.iou_head_depth),
    }
    for i in range(dc.num_hidden_layers):
        base = f"mask_decoder.transformer.layers.{i}."
        blk = {}
        for a in ("self_attn", "cross_attn_token_to_image",
                  "cross_attn_image_to_token"):
            blk[a] = {k: _lin(state, base + a + "." + k)
                      for k in ("q_proj", "k_proj", "v_proj", "out_proj")}
        for j in range(1, 5):
            blk[f"layer_norm{j}"] = _norm(state, base + f"layer_norm{j}")
        blk["mlp"] = {"lin1": _lin(state, base + "mlp.lin1"),
                      "lin2": _lin(state, base + "mlp.lin2")}
        d[f"block_{i}"] = blk

    return {"vision": v, "prompt": prompt, "decoder": d}


def config_from_hf_sam(hf_cfg: Any) -> SamConfig:
    vc, dc, pc = (hf_cfg.vision_config, hf_cfg.mask_decoder_config,
                  hf_cfg.prompt_encoder_config)
    return SamConfig(
        vision=SamVisionConfig(
            hidden_size=vc.hidden_size,
            num_hidden_layers=vc.num_hidden_layers,
            num_attention_heads=vc.num_attention_heads,
            image_size=vc.image_size, patch_size=vc.patch_size,
            window_size=vc.window_size,
            global_attn_indexes=tuple(vc.global_attn_indexes),
            output_channels=vc.output_channels, mlp_dim=vc.mlp_dim,
            layer_norm_eps=vc.layer_norm_eps,
            use_abs_pos=vc.use_abs_pos, use_rel_pos=vc.use_rel_pos),
        decoder=SamDecoderConfig(
            hidden_size=dc.hidden_size,
            num_attention_heads=dc.num_attention_heads,
            num_hidden_layers=dc.num_hidden_layers, mlp_dim=dc.mlp_dim,
            attention_downsample_rate=dc.attention_downsample_rate,
            num_multimask_outputs=dc.num_multimask_outputs,
            iou_head_depth=dc.iou_head_depth,
            iou_head_hidden_dim=dc.iou_head_hidden_dim,
            layer_norm_eps=dc.layer_norm_eps),
        prompt_image_size=pc.image_size,
        embedding_size=pc.image_embedding_size,
    )

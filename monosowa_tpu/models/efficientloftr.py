"""EfficientLoFTR detector-free matcher in pure JAX (TPU stitching matcher).

Role in the framework (SURVEY.md §2.1 P22): the reference's Waymo panorama
stitching matches keypoints between cameras with kornia LoFTR
(pseudo_label_generator/3d/scripts/stitching.py:29-151) and fits RANSAC
homographies on the matches.  ``sowa/stitching.py`` exposes a pluggable
matcher protocol; this module is its TPU-served implementation — the
EfficientLoFTR (CVPR'24) successor of LoFTR, forward-compatible with the
HuggingFace ``EfficientLoFTRForKeypointMatching`` checkpoint via
``import_hf_efficientloftr``.  Differentially tested against the installed
transformers torch implementation in ``tests/test_efficientloftr_parity.py``.

TPU-first notes:
* the RepVGG backbone is structurally reparameterized AT IMPORT (3x3+1x1+
  identity branches and their BatchNorms folded into one biased 3x3 conv
  per block — the architecture's own deploy-time transform), so the TPU
  runs a single conv per block;
* 2D RoPE tables are compile-time constants for the static coarse grid;
* the aggregated attention, dual-softmax coarse matching and both fine
  refinement stages are batched einsums/gathers with fixed shapes (the
  full coarse grid is matched; unmatched slots carry score 0 and index -1,
  mirroring the reference output contract).

Documented divergence from the installed transformers implementation
(4.57.6): its ``_get_first_stage_fine_matching`` gathers the sub-pixel
delta with ``torch.gather(grid, 1, ...)`` over the *keypoint* axis of an
expanded constant — every delta degenerates to the constant first grid
cell — and its first-stage dual-softmax normalizes over (keypoint, win0)
instead of (win0, win1).  Both contradict the surrounding docstrings and
the architecture; this port implements the consistent semantics (gather
over the window axis, dual-softmax over the two windows).
``tests/test_efficientloftr_parity.py`` therefore checks the coarse path
against stock transformers and the fine path against an oracle subclass
with exactly those two lines corrected.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.ops.resize import resize_bilinear_torch


@dataclasses.dataclass(frozen=True)
class EfficientLoFTRConfig:
    stage_num_blocks: Sequence[int] = (1, 2, 4, 14)
    out_features: Sequence[int] = (64, 64, 128, 256)
    stage_stride: Sequence[int] = (2, 1, 2, 2)
    hidden_size: int = 256
    q_aggregation_kernel_size: int = 4
    q_aggregation_stride: int = 4
    kv_aggregation_kernel_size: int = 4
    kv_aggregation_stride: int = 4
    num_attention_layers: int = 4
    num_attention_heads: int = 8
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 4.0
    coarse_matching_threshold: float = 0.2
    coarse_matching_temperature: float = 0.1
    coarse_matching_border_removal: int = 2
    coarse_matching_skip_softmax: bool = False
    fine_kernel_size: int = 8
    fine_matching_slice_dim: int = 8
    fine_matching_regress_temperature: float = 10.0

    @property
    def intermediate_size(self) -> int:
        return self.hidden_size * 2

    @property
    def fine_fusion_dims(self) -> Tuple[int, ...]:
        return tuple(reversed(self.out_features))[:-1]


def _conv(x, kernel, stride=1, pad=0, bias=None, groups=1):
    y = jax.lax.conv_general_dilated(
        x, kernel, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    return y if bias is None else y + bias


def _ln(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * p["scale"]
            + p["bias"]).astype(x.dtype)


# ---------------------------------------------------------------- backbone


def repvgg_forward(params: List[List[Dict[str, Any]]], x: jnp.ndarray,
                   cfg: EfficientLoFTRConfig) -> List[jnp.ndarray]:
    """(B, H, W, 1) -> [stage2, stage3, stage4] NHWC features (stage 1 is
    dropped, as in EfficientLoFTRepVGG.forward).  Each block is the fused
    single 3x3 conv + ReLU."""
    outs = []
    for si, stage in enumerate(params):
        for bi, blk in enumerate(stage):
            stride = cfg.stage_stride[si] if bi == 0 else 1
            x = jax.nn.relu(_conv(x, blk["kernel"], stride=stride, pad=1,
                                  bias=blk["bias"]))
        outs.append(x)
    return outs[1:]


# ------------------------------------------------------------- transformer


def _rope_tables(cfg: EfficientLoFTRConfig, h: int, w: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """compute_embeddings + repeat_interleave(2): (h*w, hidden) f32 cos/sin.
    Note the reference indices start at 1 (cumsum of ones)."""
    head_dim = cfg.hidden_size // cfg.num_attention_heads
    dim = int(head_dim * cfg.partial_rotary_factor)
    inv_freq = 1.0 / cfg.rope_theta ** (np.arange(0, dim, 2,
                                                  dtype=np.float64) / dim)
    i_idx = np.arange(1, h + 1, dtype=np.float64)[:, None, None]
    j_idx = np.arange(1, w + 1, dtype=np.float64)[None, :, None]
    emb = np.zeros((h, w, cfg.hidden_size // 2), np.float64)
    emb[..., 0::2] = i_idx * inv_freq
    emb[..., 1::2] = j_idx * inv_freq
    cos = np.repeat(np.cos(emb), 2, axis=-1).reshape(h * w, -1)
    sin = np.repeat(np.sin(emb), 2, axis=-1).reshape(h * w, -1)
    return cos.astype(np.float32), sin.astype(np.float32)


def _rotate_half(x):
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _apply_rope(q, k, cos, sin):
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    qe = qf * cos + _rotate_half(qf) * sin
    ke = kf * cos + _rotate_half(kf) * sin
    return qe.astype(q.dtype), ke.astype(k.dtype)


def _agg_attention(p, x, kv, rope, cfg: EfficientLoFTRConfig):
    """EfficientLoFTRAggregatedAttention: x, kv (B, h, w, C) -> (B, h, w, C).
    rope = (cos, sin) for the aggregated grid, or None for cross-attn."""
    b, h, w, c = x.shape
    ks, st = cfg.q_aggregation_kernel_size, cfg.q_aggregation_stride
    q = _conv(x, p["q_aggregation"]["kernel"], stride=st, groups=c)
    ah, aw = q.shape[1], q.shape[2]
    # kv max-pool (kernel == stride == 4, VALID)
    kv_a = jax.lax.reduce_window(
        kv, -jnp.inf, jax.lax.max,
        (1, cfg.kv_aggregation_kernel_size, cfg.kv_aggregation_kernel_size,
         1),
        (1, cfg.kv_aggregation_stride, cfg.kv_aggregation_stride, 1),
        "VALID")
    q = _ln(q, p["norm"]).reshape(b, ah * aw, c)
    kv_a = _ln(kv_a, p["norm"]).reshape(b, -1, c)

    nh = cfg.num_attention_heads
    d = c // nh
    qs = q @ p["attn"]["q_proj"]
    ksx = kv_a @ p["attn"]["k_proj"]
    vs = kv_a @ p["attn"]["v_proj"]
    if rope is not None:
        cos, sin = rope
        qs, ksx = _apply_rope(qs, ksx, cos, sin)
    qs = qs.reshape(b, -1, nh, d)
    ksx = ksx.reshape(b, -1, nh, d)
    vs = vs.reshape(b, -1, nh, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qs, ksx) / math.sqrt(d)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    y = jnp.einsum("bhqk,bkhd->bqhd", probs, vs).reshape(b, -1, c)
    y = y @ p["attn"]["o_proj"]

    y = y.reshape(b, ah, aw, c)
    y = resize_bilinear_torch(y, (ah * ks, aw * ks))[:, :h, :w]
    z = jnp.concatenate([x, y], axis=-1)
    z = jax.nn.leaky_relu(z @ p["mlp"]["fc1"], 0.01) @ p["mlp"]["fc2"]
    z = _ln(z, p["mlp"]["layer_norm"])
    return x + z


def local_feature_transformer(params, feats, rope, cfg):
    """feats: (B, 2, h, w, C) coarse features; applies num_attention_layers
    of (self, cross) aggregated attention incl. the reference's sequential
    cross-attention quirk (features_1 attends to the UPDATED features_0)."""
    b = feats.shape[0]
    h, w, c = feats.shape[2], feats.shape[3], feats.shape[4]
    for layer in params:
        x = feats.reshape(b * 2, h, w, c)
        x = _agg_attention(layer["self_attention"], x, x, rope, cfg)
        f0, f1 = x.reshape(b, 2, h, w, c)[:, 0], x.reshape(b, 2, h, w, c)[:, 1]
        f0 = _agg_attention(layer["cross_attention"], f0, f1, None, cfg)
        f1 = _agg_attention(layer["cross_attention"], f1, f0, None, cfg)
        feats = jnp.stack([f0, f1], axis=1)
    return feats


# ------------------------------------------------------------ fine fusion


def _out_conv_block(p, hidden, residual):
    r = _conv(residual, p["out_conv1"])
    r = r + hidden
    r = _conv(r, p["out_conv2"]["kernel"], pad=1, bias=p["out_conv2"]["bias"])
    r = jax.nn.leaky_relu(r, 0.01)
    r = _conv(r, p["out_conv3"], pad=1)
    return resize_bilinear_torch(r, (r.shape[1] * 2, r.shape[2] * 2))


def fine_fusion(params, coarse, residuals, cfg: EfficientLoFTRConfig):
    """coarse (B2, h, w, C) + residuals [stage3, stage2] -> fine features
    (B2, H, W, fine_dim) then unfolded windows (EfficientLoFTRFineFusionLayer):
    returns (feat0 (B, L, k*k, D), feat1 (B, L, (k+2)^2, D))."""
    x = _conv(coarse, params["out_conv"])
    x = resize_bilinear_torch(x, (x.shape[1] * 2, x.shape[2] * 2))
    for p, r in zip(params["out_conv_layers"], residuals):
        x = _out_conv_block(p, x, r)
    b2, fh, fw, d = x.shape
    k = cfg.fine_kernel_size
    x = x.reshape(b2 // 2, 2, fh, fw, d)
    f0, f1 = x[:, 0], x[:, 1]
    stride = fh // coarse.shape[1]

    # image0: kernel == stride -> plain block reshape, channel-major order
    b = f0.shape[0]
    f0 = f0.reshape(b, fh // k, k, fw // k, k, d)
    f0 = f0.transpose(0, 1, 3, 5, 2, 4).reshape(b, -1, d, k * k)
    f0 = f0.transpose(0, 1, 3, 2)                       # (B, L, k*k, D)

    # image1: kernel k+2, stride k, padding 1 — lax patches (C-major like
    # torch unfold)
    patches = jax.lax.conv_general_dilated_patches(
        f1.transpose(0, 3, 1, 2), (k + 2, k + 2), (stride, stride),
        ((1, 1), (1, 1)))                               # (B, D*(k+2)^2, h', w')
    l = patches.shape[2] * patches.shape[3]
    f1 = patches.reshape(b, d, (k + 2) ** 2, l).transpose(0, 3, 2, 1)
    return f0, f1


# ---------------------------------------------------------------- matching


def _coarse_scores(feats, cfg: EfficientLoFTRConfig):
    b, _, h, w, c = feats.shape
    f = feats.reshape(b, 2, h * w, c) / math.sqrt(c)
    sim = jnp.einsum("bld,bmd->blm", f[:, 0], f[:, 1])
    sim = sim / cfg.coarse_matching_temperature
    if cfg.coarse_matching_skip_softmax:
        return sim
    s1 = jax.nn.softmax(sim.astype(jnp.float32), axis=1)
    s2 = jax.nn.softmax(sim.astype(jnp.float32), axis=2)
    return (s1 * s2).astype(feats.dtype)


def _border_mask(h, w, margin) -> np.ndarray:
    m = np.zeros((h, w), bool)
    if margin > 0:
        m[:margin] = True
        m[-margin:] = True
        m[:, :margin] = True
        m[:, -margin:] = True
    return m


def _get_matches(scores, h, w, cfg: EfficientLoFTRConfig):
    """_get_matches_from_scores: (B, L0, L1) -> indices (B, 2, L), scores
    (B, 2, L) with -1 / 0 for unmatched slots."""
    b, l0, l1 = scores.shape
    mask = scores > cfg.coarse_matching_threshold
    bm = _border_mask(h, w, cfg.coarse_matching_border_removal).reshape(-1)
    mask = mask & ~bm[None, :, None] & ~bm[None, None, :]
    max0 = scores.max(2, keepdims=True)
    max1 = scores.max(1, keepdims=True)
    mask = mask & (scores == max0) & (scores == max1)
    masked = scores * mask
    sc0, idx0 = masked.max(1), masked.argmax(1)
    sc1, idx1 = masked.max(2), masked.argmax(2)
    indices = jnp.stack([idx0, idx1], axis=1)
    sc = jnp.stack([sc0, sc1], axis=1)
    indices = jnp.where(sc > 0, indices, -1)
    return indices, sc


def _spatial_expectation_3x3(heat):
    """heat (..., 3, 3) prob -> (..., 2) expected (x, y) in [-1, 1]."""
    lin = jnp.asarray([-1.0, 0.0, 1.0], heat.dtype)
    ex = (heat.sum(-2) * lin).sum(-1)
    ey = (heat.sum(-1) * lin).sum(-1)
    return jnp.stack([ex, ey], axis=-1)


def match_pair(params: Dict[str, Any], pixels: jnp.ndarray,
               cfg: EfficientLoFTRConfig):
    """Full EfficientLoFTRForKeypointMatching.forward.

    pixels: (B, 2, H, W) grayscale in the processor's normalized space.
    Returns (keypoints (B, 2, L, 2) normalized to [0,1], matching_scores
    (B, 2, L), matches (B, 2, L) with -1 for unmatched), L = coarse cells.
    """
    b, _, hh, ww = pixels.shape
    x = pixels.reshape(b * 2, hh, ww, 1)
    feats = repvgg_forward(params["backbone"], x, cfg)
    coarse = feats[-1]
    ch, cw, c = coarse.shape[1], coarse.shape[2], coarse.shape[3]
    ah = (ch - cfg.q_aggregation_kernel_size) // cfg.q_aggregation_stride + 1
    aw = (cw - cfg.q_aggregation_kernel_size) // cfg.q_aggregation_stride + 1
    cos, sin = _rope_tables(cfg, ah, aw)
    rope = (jnp.asarray(cos), jnp.asarray(sin))

    coarse = coarse.reshape(b, 2, ch, cw, c).transpose(0, 1, 2, 3, 4)
    coarse = local_feature_transformer(params["transformer"], coarse, rope,
                                       cfg)

    scores = _coarse_scores(coarse, cfg)
    matched_indices, matching_scores = _get_matches(scores, ch, cw, cfg)
    coarse_scale = hh / ch
    kp = jnp.stack([matched_indices % cw, matched_indices // cw], axis=-1)
    kp = kp.astype(jnp.float32) * coarse_scale

    # fine refinement ((k+2)-window features gathered at the matched cells)
    coarse_n = (coarse / math.sqrt(cfg.hidden_size)).reshape(
        b * 2, ch, cw, c)
    f0, f1 = fine_fusion(params["fine_fusion"], coarse_n,
                         [feats[1], feats[0]], cfg)  # already split per pair
    l = f0.shape[1]
    # unmatched slots are -1: torch's negative indexing wraps to the last
    # cell, mirrored here with % l (their outputs are discarded by callers)
    gather0 = jnp.take_along_axis(
        f0, (matched_indices[:, 0] % l)[:, :, None, None], axis=1)
    gather1 = jnp.take_along_axis(
        f1, (matched_indices[:, 1] % l)[:, :, None, None], axis=1)

    fine_height = int(ch * coarse_scale)
    fine_scale = hh / fine_height
    fine_kp = _fine_matching(gather0, gather1, kp, fine_scale, cfg)
    fine_kp = fine_kp / jnp.asarray([ww, hh], jnp.float32)
    return fine_kp, matching_scores, matched_indices


def _fine_matching(f0, f1, coarse_kp, fine_scale, cfg: EfficientLoFTRConfig):
    """_fine_matching + both fine stages.  f0 (B, L, k*k, D), f1 (B, L,
    (k+2)^2, D); coarse_kp (B, 2, L, 2) -> fine keypoints (B, 2, L, 2)."""
    b, l, win, d = f0.shape
    k = cfg.fine_kernel_size
    sd = cfg.fine_matching_slice_dim
    a0, s0 = f0[..., :d - sd], f0[..., d - sd:]
    a1, s1 = f1[..., :d - sd], f1[..., d - sd:]
    a0 = a0 / math.sqrt(d - sd)
    a1 = a1 / math.sqrt(d - sd)
    conf = jnp.einsum("blpc,blqc->blpq", a0, a1)
    conf = (jax.nn.softmax(conf.astype(jnp.float32), 2)
            * jax.nn.softmax(conf.astype(jnp.float32), 3))
    conf = conf.reshape(b, l, win, k + 2, k + 2)[..., 1:-1, 1:-1]
    conf = conf.reshape(b, l, win * win)

    idx = conf.argmax(-1)
    i0, i1 = idx // win, idx % win
    # grid of per-cell pixel offsets (x, y), centered
    gx, gy = np.meshgrid(np.arange(k), np.arange(k))
    grid = np.stack([gx, gy], -1).reshape(-1, 2).astype(np.float32) \
        - (k // 2) + 0.5
    grid = jnp.asarray(grid)
    d0 = grid[i0]
    d1 = grid[i1]
    m0 = coarse_kp[:, 0] + d0 * fine_scale
    m1 = coarse_kp[:, 1] + d1 * fine_scale

    # second stage: 3x3 neighborhood around (i1) in the UNCROPPED window,
    # replicating the reference's python-negative-index wrap semantics
    i1i, i1j = i1 // k, i1 % k
    s1 = s1 / math.sqrt(sd)
    conf2 = jnp.einsum("blpc,blqc->blpq", s0, s1)   # (B, L, win, (k+2)^2)
    conf2 = conf2.reshape(b, l, win, k + 2, k + 2)
    conf2 = jnp.take_along_axis(conf2, i0[..., None, None, None],
                                axis=2)[:, :, 0]    # (B, L, k+2, k+2)
    neigh = _gather_3x3(conf2, i1i, i1j, k)
    heat = jax.nn.softmax(
        (neigh / cfg.fine_matching_regress_temperature
         ).reshape(b, l, 9).astype(jnp.float32), -1).reshape(b, l, 3, 3)
    delta = _spatial_expectation_3x3(heat)
    m1 = m1 + delta * (3 // 2) * fine_scale
    return jnp.stack([m0, m1], axis=1)


def _gather_3x3(conf2, ci, cj, k):
    """conf2 (B, L, K, K) with K = k+2; gather the 3x3 patch around
    (ci, cj) with wrap-around for index -1 (torch negative indexing)."""
    dk = jnp.arange(-1, 2)
    ii = (ci[..., None] + dk) % (k + 2)                 # (B, L, 3)
    jj = (cj[..., None] + dk) % (k + 2)
    rows = jnp.take_along_axis(conf2, ii[..., :, None],
                               axis=2)                  # (B, L, 3, K)
    return jnp.take_along_axis(rows, jj[..., None, :], axis=3)


# ---------------------------------------------------------------- import


def _t(state, name):
    v = state[name]
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      np.float32)


def _fuse_conv_bn(w, state, bn_prefix, eps=1e-5):
    """Fold an eval-mode BatchNorm into the preceding bias-free conv.
    w: OIHW numpy."""
    gamma = _t(state, bn_prefix + ".weight")
    beta = _t(state, bn_prefix + ".bias")
    mean = _t(state, bn_prefix + ".running_mean")
    var = _t(state, bn_prefix + ".running_var")
    scale = gamma / np.sqrt(var + eps)
    return w * scale[:, None, None, None], beta - mean * scale


def import_hf_efficientloftr(state: Dict[str, Any],
                             cfg: EfficientLoFTRConfig,
                             prefix: str = "efficientloftr."
                             ) -> Dict[str, Any]:
    """Map ``EfficientLoFTRForKeypointMatching.state_dict()`` onto the
    params pytree, fusing each RepVGG block's three branches (+BN) into one
    biased 3x3 conv (the architecture's deploy-time reparameterization) and
    folding the fine-fusion BatchNorm into its conv."""
    backbone: List[List[Dict[str, Any]]] = []
    in_ch = [1] + list(cfg.out_features[:-1])
    for si, nblocks in enumerate(cfg.stage_num_blocks):
        stage = []
        for bi in range(nblocks):
            base = f"{prefix}backbone.stages.{si}.blocks.{bi}."
            cin = in_ch[si] if bi == 0 else cfg.out_features[si]
            cout = cfg.out_features[si]
            stride = cfg.stage_stride[si] if bi == 0 else 1
            w3, b3 = _fuse_conv_bn(_t(state, base + "conv1.conv.weight"),
                                   state, base + "conv1.norm")
            w1, b1 = _fuse_conv_bn(_t(state, base + "conv2.conv.weight"),
                                   state, base + "conv2.norm")
            w = w3.copy()
            w[:, :, 1:2, 1:2] += w1
            bias = b3 + b1
            if cin == cout and stride == 1:
                ident = np.zeros_like(w3)
                ident[np.arange(cout), np.arange(cout), 1, 1] = 1.0
                wi, bi_ = _fuse_conv_bn(ident, state, base + "identity")
                w += wi
                bias += bi_
            stage.append({"kernel": w.transpose(2, 3, 1, 0), "bias": bias})
        backbone.append(stage)

    def agg(base):
        return {
            "q_aggregation": {"kernel": _t(
                state, base + "aggregation.q_aggregation.weight"
            ).transpose(2, 3, 1, 0)},
            "norm": {"scale": _t(state, base + "aggregation.norm.weight"),
                     "bias": _t(state, base + "aggregation.norm.bias")},
            "attn": {k: _t(state, base + f"attention.{k}.weight").T
                     for k in ("q_proj", "k_proj", "v_proj", "o_proj")},
            "mlp": {"fc1": _t(state, base + "mlp.fc1.weight").T,
                    "fc2": _t(state, base + "mlp.fc2.weight").T,
                    "layer_norm": {
                        "scale": _t(state, base + "mlp.layer_norm.weight"),
                        "bias": _t(state, base + "mlp.layer_norm.bias")}},
        }

    transformer = []
    for i in range(cfg.num_attention_layers):
        base = f"{prefix}local_feature_transformer.layers.{i}."
        transformer.append({
            "self_attention": agg(base + "self_attention."),
            "cross_attention": agg(base + "cross_attention.")})

    out_layers = []
    dims = cfg.fine_fusion_dims
    for i in range(1, len(dims)):
        base = f"refinement_layer.out_conv_layers.{i - 1}."
        w2, b2 = _fuse_conv_bn(_t(state, base + "out_conv2.weight"),
                               state, base + "batch_norm")
        out_layers.append({
            "out_conv1": _t(state, base + "out_conv1.weight"
                            ).transpose(2, 3, 1, 0),
            "out_conv2": {"kernel": w2.transpose(2, 3, 1, 0), "bias": b2},
            "out_conv3": _t(state, base + "out_conv3.weight"
                            ).transpose(2, 3, 1, 0)})
    fine = {"out_conv": _t(state, "refinement_layer.out_conv.weight"
                           ).transpose(2, 3, 1, 0),
            "out_conv_layers": out_layers}
    return {"backbone": backbone, "transformer": transformer,
            "fine_fusion": fine}


def config_from_hf_efficientloftr(hf_cfg: Any) -> EfficientLoFTRConfig:
    return EfficientLoFTRConfig(
        stage_num_blocks=tuple(hf_cfg.stage_num_blocks),
        out_features=tuple(hf_cfg.out_features),
        stage_stride=tuple(hf_cfg.stage_stride),
        hidden_size=hf_cfg.hidden_size,
        q_aggregation_kernel_size=hf_cfg.q_aggregation_kernel_size,
        q_aggregation_stride=hf_cfg.q_aggregation_stride,
        kv_aggregation_kernel_size=hf_cfg.kv_aggregation_kernel_size,
        kv_aggregation_stride=hf_cfg.kv_aggregation_stride,
        num_attention_layers=hf_cfg.num_attention_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        rope_theta=hf_cfg.rope_theta,
        partial_rotary_factor=hf_cfg.partial_rotary_factor,
        coarse_matching_threshold=hf_cfg.coarse_matching_threshold,
        coarse_matching_temperature=hf_cfg.coarse_matching_temperature,
        coarse_matching_border_removal=hf_cfg.coarse_matching_border_removal,
        coarse_matching_skip_softmax=hf_cfg.coarse_matching_skip_softmax,
        fine_kernel_size=hf_cfg.fine_kernel_size,
        fine_matching_slice_dim=hf_cfg.fine_matching_slice_dim,
        fine_matching_regress_temperature=(
            hf_cfg.fine_matching_regress_temperature),
    )

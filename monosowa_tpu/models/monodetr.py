"""MonoDETR-equivalent monocular 3D detector (Flax, NHWC, batch-first).

Behavioral contract (MonoDETR/lib/models/monodetr/monodetr.py:34-299):

* input projections of C3/C4/C5 to hidden_dim + one extra stride-64 level
  (:84-105);
* 50 queries x 11 Group-DETR groups during training, first group at
  inference (:200-216);
* initial 2-dof reference points from a linear over the query pos embedding
  (depthaware_transformer.py:123, :283-287);
* per-decoder-layer heads with iterative 6-dof box refinement (:219-274):
  class logits, (cx, cy, l, r, t, b) boxes, 3D dims, 24-channel angle
  (12-bin cls + res), (depth, log-sigma) regression;
* fused depth = average of regression depth 1/sigmoid(d)-1, geometric depth
  f*h3d/h2d, and the bilinearly-sampled weighted depth map (:246-263);
* aux outputs per intermediate decoder layer (:289-297).

Cited line numbers document parity; the implementation is an independent
JAX design (static shapes, no padding masks — the pipeline runs fixed
1280x384 inputs where the reference's masks are identically all-valid).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.models.backbone import ResNet50
from monosowa_tpu.models.depth_predictor import DepthPredictor
from monosowa_tpu.models.layers import MLP, inverse_sigmoid, resolve_dtype
from monosowa_tpu.models.position_encoding import (LearnedPositionEmbedding,
                                                   sine_position_encoding)
from monosowa_tpu.models.transformer import (
    DepthAwareDecoderLayer, VisualEncoder)


def _focal_bias_init(prior_prob: float = 0.01):
    value = -math.log((1 - prior_prob) / prior_prob)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


class BBoxEmbed(nn.Module):
    """3-layer MLP to 6-dof; first clone's final bias[2:] starts at -2
    (monodetr.py:136)."""

    d_model: int
    init_minus_two: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.d_model)(x))
        x = nn.relu(nn.Dense(self.d_model)(x))

        def bias_init(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            if self.init_minus_two:
                b = b.at[2:].set(-2.0)
            return b

        return nn.Dense(6, bias_init=bias_init)(x)


class MonoDETR(nn.Module):
    num_classes: int = 3
    num_queries: int = 50
    group_num: int = 11
    d_model: int = 256
    d_ffn: int = 256
    nheads: int = 8
    enc_layers: int = 3
    dec_layers: int = 3
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    dropout: float = 0.1
    num_depth_bins: int = 80
    depth_min: float = 1e-3
    depth_max: float = 60.0
    msda_backend: str = "auto"   # "pallas" = ops/msda_pallas VMEM kernel
    two_stage: bool = False     # encoder-proposal branch (monodetr.py:234+)
    position_embedding: str = "sine"   # "sine" | "learned" (:644-660)
    use_depth: bool = False     # 4-channel RGB-D input (backbone.py:109-111)
    use_dab: bool = False       # DAB-DETR anchor queries (:255-259, 518-585)
    # mixed-precision compute dtype ("auto" = bf16 on TPU, f32 elsewhere);
    # params, heads, norms and softmax logits stay f32
    compute_dtype: str = "auto"

    @nn.compact
    def __call__(self, images: jnp.ndarray, calibs: jnp.ndarray,
                 img_sizes: jnp.ndarray, training: bool = False,
                 dn_queries=None) -> Dict[str, Any]:
        """images (B, H, W, 3) normalized (4 channels with use_depth);
        calibs (B, 3, 4) P2; img_sizes (B, 2) as (width, height).  Returns
        the reference's output dict."""
        deterministic = not training
        b = images.shape[0]
        dtype = resolve_dtype(self.compute_dtype)

        feats = ResNet50(depth_input=self.use_depth, dtype=dtype,
                         name="backbone")(images.astype(dtype))  # C3, C4, C5

        srcs = []
        for i, f in enumerate(feats):
            y = nn.Conv(self.d_model, (1, 1), dtype=dtype,
                        name=f"input_proj{i}")(f)
            srcs.append(nn.GroupNorm(num_groups=32, epsilon=1e-5)(y))
        y = nn.Conv(self.d_model, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), dtype=dtype,
                    name="input_proj3")(feats[-1])
        srcs.append(nn.GroupNorm(num_groups=32, epsilon=1e-5)(y))

        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        if self.position_embedding == "learned":
            lpe = LearnedPositionEmbedding(self.d_model // 2,
                                           name="position_embedding")
            pos = [lpe(h, w) for h, w in spatial_shapes]
        else:
            pos = [jnp.asarray(sine_position_encoding(h, w,
                                                      self.d_model // 2))
                   for h, w in spatial_shapes]

        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (self.num_feature_levels, self.d_model))

        src_flat = jnp.concatenate(
            [s.reshape(b, -1, self.d_model) for s in srcs], axis=1)
        pos_flat = jnp.concatenate(
            [(p.reshape(1, -1, self.d_model) + level_embed[i][None, None, :])
             for i, p in enumerate(pos)], axis=1)
        pos_flat = jnp.broadcast_to(pos_flat, src_flat.shape)

        # ------- depth predictor (stride-16 grid) ----------------------
        depth_logits, depth_embed, weighted_depth, _ = DepthPredictor(
            self.d_model, self.num_depth_bins, self.depth_min, self.depth_max,
            dtype=dtype,
            name="depth_predictor")(srcs[:3], pos[1], deterministic)
        h16, w16 = spatial_shapes[1]
        depth_embed_seq = depth_embed.reshape(b, h16 * w16, self.d_model)

        # ------- encoder ----------------------------------------------
        memory = VisualEncoder(
            self.enc_layers, self.d_model, self.d_ffn, self.dropout,
            self.num_feature_levels, self.nheads, self.enc_n_points,
            self.msda_backend, dtype,
            name="encoder")(src_flat, pos_flat, spatial_shapes, deterministic)

        # ------- queries ----------------------------------------------
        nq = self.num_queries * self.group_num if training else self.num_queries
        enc_outputs = None
        if self.two_stage:
            # two-stage branch (depthaware_transformer.py:234-257): encoder
            # tokens propose 6-dof boxes; top-k by class score seed the
            # decoder queries and reference points.
            proposals = _encoder_proposals(spatial_shapes)         # (S, 6)
            enc_mem = nn.LayerNorm(epsilon=1e-5, name="enc_output_norm")(
                nn.Dense(self.d_model, name="enc_output")(memory))
            enc_logits = nn.Dense(self.num_classes,
                                  bias_init=_focal_bias_init(),
                                  name="enc_class")(enc_mem)
            enc_delta = BBoxEmbed(self.d_model, name="enc_bbox")(enc_mem)
            enc_unact = enc_delta + inverse_sigmoid(proposals)[None]
            enc_outputs = {"pred_logits": enc_logits,
                           "pred_boxes": jax.nn.sigmoid(enc_unact)}
            k = min(nq, enc_logits.shape[1])
            _, top_idx = jax.lax.top_k(enc_logits[..., 0], k)      # (B, k)
            top_unact = jax.lax.stop_gradient(jnp.take_along_axis(
                enc_unact, top_idx[..., None], axis=1))            # (B,k,6)
            ref = jax.nn.sigmoid(top_unact)
            # proposal positional encoding -> (query_pos, tgt)
            pos4 = jnp.concatenate(
                [top_unact[..., :2],
                 top_unact[..., 2:3] + top_unact[..., 3:4],
                 top_unact[..., 4:5] + top_unact[..., 5:6]], -1)
            sine = _proposal_pos_embed(pos4, self.d_model // 2)
            trans = nn.LayerNorm(epsilon=1e-5, name="pos_trans_norm")(
                nn.Dense(2 * self.d_model, name="pos_trans")(sine))
            query_pos = trans[..., :self.d_model]
            tgt = trans[..., self.d_model:]
            if k < nq:
                padq = jnp.zeros((b, nq - k, self.d_model))
                query_pos = jnp.concatenate([query_pos, padq], 1)
                tgt = jnp.concatenate([tgt, padq], 1)
                ref = jnp.concatenate(
                    [ref, jnp.full((b, nq - k, 6), 0.5)], 1)
        elif self.use_dab:
            # DAB-DETR: learnable content embeddings + 6-dof anchor boxes;
            # query_pos is re-derived per decoder layer from the CURRENT
            # reference points (monodetr.py:188-198,
            # depthaware_transformer.py:255-259, 568-585)
            tgt_table = self.param("tgt_embed", nn.initializers.normal(1.0),
                                   (self.num_queries * self.group_num,
                                    self.d_model))
            ref_table = self.param("refpoint_embed",
                                   nn.initializers.normal(1.0),
                                   (self.num_queries * self.group_num, 6))
            tgt = jnp.broadcast_to(tgt_table[None, :nq],
                                   (b, nq, self.d_model))
            ref = jnp.broadcast_to(jax.nn.sigmoid(ref_table[None, :nq]),
                                   (b, nq, 6))
            query_pos = jnp.zeros((b, nq, self.d_model))
        else:
            query_table = self.param("query_embed",
                                     nn.initializers.normal(1.0),
                                     (self.num_queries * self.group_num,
                                      2 * self.d_model))
            qe = query_table[:nq]
            query_pos = jnp.broadcast_to(qe[None, :, :self.d_model],
                                         (b, nq, self.d_model))
            tgt = jnp.broadcast_to(qe[None, :, self.d_model:],
                                   (b, nq, self.d_model))
            ref = jax.nn.sigmoid(
                nn.Dense(2, name="reference_points")(query_pos))  # (B,nq,2)

        # ------- optional DN-DETR denoising queries ---------------------
        # (models/dn_components.py; reference dn_components.py:44-232 with
        # use_dn — noised GT label embeddings + 6-dof refpoints prepended,
        # block attention mask instead of the group fold)
        num_dn = 0
        self_attn_mask = None
        if dn_queries is not None and training:
            from monosowa_tpu.models.dn_components import build_joint_attn_mask
            num_dn = dn_queries.num_dn
            label_table = self.param(
                "label_enc", nn.initializers.normal(1.0),
                (self.num_classes + 1, self.d_model - 1))
            dn_emb = label_table[dn_queries.label_ids]          # (B,N,d-1)
            indicator = jnp.ones(dn_emb.shape[:-1] + (1,))
            dn_tgt = jnp.concatenate([dn_emb, indicator], -1)
            # matchable queries carry a zero indicator in their last channel
            tgt = jnp.concatenate([dn_tgt, tgt.at[..., -1:].set(0.0)], 1)
            query_pos = jnp.concatenate(
                [jnp.zeros_like(dn_tgt), query_pos], 1)
            # 6-dof refs everywhere: matchable edges start at sigmoid(-2)
            # (two_stage refs are already 6-dof proposals — keep them)
            if ref.shape[-1] == 2:
                ref = jnp.concatenate(
                    [ref, jnp.full(ref.shape[:-1] + (4,),
                                   jax.nn.sigmoid(-2.0))], -1)
            ref = jnp.concatenate([dn_queries.refpoints, ref], 1)
            n_dn_groups = dn_queries.num_groups
            self_attn_mask = build_joint_attn_mask(
                n_dn_groups, num_dn // n_dn_groups, self.group_num,
                self.num_queries)

        # ------- decoder with iterative refinement ---------------------
        heads_class = [nn.Dense(self.num_classes,
                                bias_init=_focal_bias_init(),
                                name=f"class_embed{i}")
                       for i in range(self.dec_layers)]
        heads_bbox = [BBoxEmbed(self.d_model, init_minus_two=(i == 0),
                                name=f"bbox_embed{i}")
                      for i in range(self.dec_layers)]
        heads_dim = [MLP(self.d_model, 3, 2, name=f"dim_embed{i}")
                     for i in range(self.dec_layers)]
        heads_angle = [MLP(self.d_model, 24, 2, name=f"angle_embed{i}")
                       for i in range(self.dec_layers)]
        heads_depth = [MLP(self.d_model, 2, 2, name=f"depth_embed{i}")
                       for i in range(self.dec_layers)]

        # DAB per-layer query positions from the current anchors
        # (decoder-level shared heads, depthaware_transformer.py:530-533)
        if self.use_dab:
            dab_ref_head = MLP(self.d_model, self.d_model, 2,
                               name="dab_ref_point_head")
            dab_query_scale = MLP(self.d_model, self.d_model, 2,
                                  name="dab_query_scale")

        output = tgt
        refs_before = []      # reference entering each layer
        hs = []
        for lid in range(self.dec_layers):
            l = self.num_feature_levels
            if self.use_dab:
                sine = _dab_sine_embed(ref, self.d_model // 2)
                raw_qp = dab_ref_head(sine)
                query_pos = (raw_qp if lid == 0
                             else dab_query_scale(output) * raw_qp)
            if ref.shape[-1] == 6:
                ref_input = jnp.tile(ref[:, :, None, :], (1, 1, l, 1))
            else:
                ref_input = jnp.tile(ref[:, :, None, :], (1, 1, l, 1))
            output = DepthAwareDecoderLayer(
                self.d_model, self.d_ffn, self.dropout,
                self.num_feature_levels, self.nheads, self.dec_n_points,
                self.group_num, self.msda_backend, dtype,
                name=f"decoder_layer{lid}")(
                output, query_pos, ref_input, memory, spatial_shapes,
                depth_embed_seq, training, deterministic,
                self_attn_mask=self_attn_mask)
            refs_before.append(ref)
            hs.append(output)
            # in-decoder refinement (detached, depthaware_transformer.py:601-613)
            tmp = heads_bbox[lid](output)
            if ref.shape[-1] == 6:
                new_ref = jax.nn.sigmoid(tmp + inverse_sigmoid(ref))
            else:
                new_ref = jax.nn.sigmoid(
                    tmp.at[..., :2].add(inverse_sigmoid(ref)))
            ref = jax.lax.stop_gradient(new_ref)

        # ------- per-layer heads (monodetr.py:219-274) ------------------
        outputs = []
        for lid in range(self.dec_layers):
            reference = inverse_sigmoid(refs_before[lid])
            tmp = heads_bbox[lid](hs[lid])
            if reference.shape[-1] == 6:
                tmp = tmp + reference
            else:
                tmp = tmp.at[..., :2].add(reference)
            coord = jax.nn.sigmoid(tmp)                      # (B, nq, 6)
            logits = heads_class[lid](hs[lid])
            size3d = heads_dim[lid](hs[lid])
            angle = heads_angle[lid](hs[lid])
            depth_reg = heads_depth[lid](hs[lid])

            box2d_h = jnp.clip((coord[..., 4] + coord[..., 5])
                               * img_sizes[:, 1:2], 1.0, None)
            depth_geo = size3d[..., 0] / box2d_h * calibs[:, 0, 0][:, None]

            center = jax.lax.stop_gradient(coord[..., :2])
            depth_map_s = _sample_depth_map(weighted_depth, center)

            depth_val = ((1.0 / (jax.nn.sigmoid(depth_reg[..., 0:1]) + 1e-6)
                          - 1.0) + depth_geo[..., None]
                         + depth_map_s[..., None]) / 3.0
            depth = jnp.concatenate([depth_val, depth_reg[..., 1:2]], -1)

            outputs.append({"pred_logits": logits, "pred_boxes": coord,
                            "pred_3d_dim": size3d, "pred_angle": angle,
                            "pred_depth": depth})

        if num_dn:
            # split denoising slots off every layer's outputs
            dn_outputs = [{k: o[k][:, :num_dn] for k in
                           ("pred_logits", "pred_boxes")} for o in outputs]
            outputs = [{k: (v[:, num_dn:] if k != "pred_depth_map_logits"
                            else v) for k, v in o.items()} for o in outputs]

        out = dict(outputs[-1])
        out["pred_depth_map_logits"] = depth_logits
        out["aux_outputs"] = outputs[:-1]
        out["weighted_depth"] = weighted_depth
        if num_dn:
            out["dn_outputs"] = dn_outputs
        if enc_outputs is not None:
            out["enc_outputs"] = enc_outputs
        return out


def _encoder_proposals(spatial_shapes) -> jnp.ndarray:
    """Per-token 6-dof proposals: grid centers + 0.05*2^lvl half-extents
    (gen_encoder_output_proposals semantics)."""
    rows = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        half = 0.05 * (2.0 ** lvl) / 2.0
        n = h * w
        rows.append(np.stack(
            [gx.reshape(-1), gy.reshape(-1)] + [np.full(n, half)] * 4, -1))
    prop = np.concatenate(rows, 0).astype(np.float32)
    return jnp.asarray(np.clip(prop, 0.01, 0.99))


def _dab_sine_embed(ref6: jnp.ndarray, num_feats: int = 128,
                    temperature: float = 10000.0) -> jnp.ndarray:
    """(B, Q, 6) anchors in [0,1] -> (B, Q, 6*num_feats) sine embedding in
    the reference's [y, x, l, r, t, b] channel order
    (gen_sineembed_for_position, depthaware_transformer.py:29-65)."""
    scale = 2 * jnp.pi
    dim_t = temperature ** (2 * (jnp.arange(num_feats) // 2) / num_feats)

    def emb(coord):
        p = coord[..., None] * scale / dim_t
        return jnp.stack([jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])],
                         -1).reshape(coord.shape + (num_feats,))

    parts = [emb(ref6[..., 1]), emb(ref6[..., 0])]
    parts += [emb(ref6[..., i]) for i in range(2, 6)]
    return jnp.concatenate(parts, -1)


def _proposal_pos_embed(pos4: jnp.ndarray, num_feats: int = 128,
                        temperature: float = 10000.0) -> jnp.ndarray:
    """Sine embedding of 4-dof proposals -> (..., 4 * num_feats)
    (get_proposal_pos_embed)."""
    scale = 2 * jnp.pi
    dim_t = temperature ** (2 * (jnp.arange(num_feats) // 2) / num_feats)
    x = pos4[..., None] * scale / dim_t                 # (..., 4, F)
    emb = jnp.stack([jnp.sin(x[..., 0::2]), jnp.cos(x[..., 1::2])], -1)
    return emb.reshape(pos4.shape[:-1] + (4 * num_feats,))


def _sample_depth_map(depth_map: jnp.ndarray, centers: jnp.ndarray
                      ) -> jnp.ndarray:
    """Bilinear sample (B, H, W) at normalized centers (B, Q, 2) in [0, 1]
    with torch grid_sample align_corners=True semantics (monodetr.py:251-257
    uses grid (2c-1), align_corners=True)."""
    bsz, h, w = depth_map.shape
    x = centers[..., 0] * (w - 1)
    y = centers[..., 1] * (h - 1)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    dx = jnp.clip(x - x0, 0.0, 1.0)
    dy = jnp.clip(y - y0, 0.0, 1.0)

    flat = depth_map.reshape(bsz, h * w)

    def take(yc, xc):
        idx = (yc * w + xc).astype(jnp.int32)
        return jnp.take_along_axis(flat, idx, axis=1)

    v00 = take(y0, x0)
    v01 = take(y0, x1)
    v10 = take(y1, x0)
    v11 = take(y1, x1)
    return (v00 * (1 - dx) * (1 - dy) + v01 * dx * (1 - dy)
            + v10 * (1 - dx) * dy + v11 * dx * dy)


def build_monodetr(cfg: Dict[str, Any]) -> MonoDETR:
    """Construct from a reference-style model config dict
    (configs/monodetr.yaml model section)."""
    return MonoDETR(
        num_classes=cfg.get("num_classes", 3),
        num_queries=cfg.get("num_queries", 50),
        group_num=11,
        d_model=cfg.get("hidden_dim", 256),
        d_ffn=cfg.get("dim_feedforward", 256),
        nheads=cfg.get("nheads", 8),
        enc_layers=cfg.get("enc_layers", 3),
        dec_layers=cfg.get("dec_layers", 3),
        num_feature_levels=cfg.get("num_feature_levels", 4),
        enc_n_points=cfg.get("enc_n_points", 4),
        dec_n_points=cfg.get("dec_n_points", 4),
        dropout=cfg.get("dropout", 0.1),
        num_depth_bins=cfg.get("num_depth_bins", 80),
        depth_min=float(cfg.get("depth_min", 1e-3)),
        depth_max=float(cfg.get("depth_max", 60.0)),
        msda_backend=cfg.get("msda_backend", "auto"),
        two_stage=bool(cfg.get("two_stage", False)),
        position_embedding=cfg.get("position_embedding", "sine"),
        use_depth=bool(cfg.get("use_depth", False)),
        use_dab=bool(cfg.get("use_dab", False)),
        compute_dtype=str(cfg.get("compute_dtype", "auto")),
    )

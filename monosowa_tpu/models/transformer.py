"""Depth-aware transformer: visual encoder + depth-aware decoder (Flax).

Behavioral contract (MonoDETR/lib/models/monodetr/depthaware_transformer.py):

* ``MSDeformAttnModule`` = ops/modules/ms_deform_attn.py:70-163: learned
  sampling offsets (zero weight, ring-pattern bias init :106-121), attention
  weights softmaxed over levels x points, value/output projections; 2-dof
  reference points offset by offsets/(W,H), 6-dof (cx,cy,l,r,t,b) boxes
  offset by offsets/n_points * (l+r, t+b)/2 (:144-152).
* ``VisualEncoderLayer``/``VisualEncoder`` = :315-384 — deformable self-attn
  over the flattened 4-level feature pyramid, reference points at pixel
  centers.
* ``DepthAwareDecoderLayer`` = :387-516 — depth cross-attention (queries
  attend to the stride-16 depth embedding), group-wise self-attention
  (Group-DETR: groups attend only within themselves, implemented by folding
  groups into the batch axis — the reference's seq-split/cat trick :480-498),
  deformable cross-attention, FFN.  The reference projects q/k through
  sa_*_proj then feeds torch MultiheadAttention (whose in-proj applies its
  own projections; the sa_v_proj result is discarded at :409 — we reproduce
  the effective computation).

All sequences are batch-first; padding masks are dropped because the
reference runs fixed 1280x384 inputs where masks are always all-valid
(valid_ratios == 1).
"""

from __future__ import annotations

import math
import os
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.models.layers import MultiHeadAttention
from monosowa_tpu.ops.msda import ms_deform_attn


def _ring_bias_init(n_heads: int, n_levels: int, n_points: int):
    thetas = np.arange(n_heads, dtype=np.float32) * (2 * np.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1

    def init(key, shape, dtype=jnp.float32):
        return jnp.asarray(grid.reshape(-1), dtype)

    return init


class MSDeformAttnModule(nn.Module):
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    backend: str = "xla"   # "xla"/"onehot" (gather/one-hot XLA cores),
    # "mxu" (fused Pallas one-hot kernel), "pallas" (scalar VMEM kernel,
    # retired from the train path), "auto" (mxu on TPU, xla elsewhere)
    dtype: Any = None

    @nn.compact
    def __call__(self, query, reference_points, src_flat,
                 spatial_shapes: Sequence[Tuple[int, int]]):
        """query (B, Q, D); reference_points (B, Q, L, 2|6) in [0,1];
        src_flat (B, sum HW, D)."""
        b, lq, _ = query.shape
        m, l, p = self.n_heads, self.n_levels, self.n_points
        dh = self.d_model // m

        value = nn.Dense(self.d_model, kernel_init=nn.initializers.xavier_uniform(),
                         dtype=self.dtype, name="value_proj")(src_flat)
        value = value.reshape(b, -1, m, dh)

        # offsets/weights heads stay f32: sampling locations need the
        # mantissa (loc * W - 0.5 at W=160 is unit-resolution in bf16)
        offsets = nn.Dense(m * l * p * 2,
                           kernel_init=nn.initializers.zeros,
                           bias_init=_ring_bias_init(m, l, p),
                           name="sampling_offsets")(query.astype(jnp.float32))
        offsets = offsets.reshape(b, lq, m, l, p, 2)
        weights = nn.Dense(m * l * p, kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros,
                           name="attention_weights")(
            query.astype(jnp.float32))
        weights = jax.nn.softmax(weights.reshape(b, lq, m, l * p), axis=-1)
        weights = weights.reshape(b, lq, m, l, p)

        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray(
                [[w, h] for h, w in spatial_shapes], jnp.float32)
            loc = (reference_points[:, :, None, :, None, :]
                   + offsets / normalizer[None, None, None, :, None, :])
        else:
            wh = (reference_points[:, :, None, :, None, 2::2]
                  + reference_points[:, :, None, :, None, 3::2])
            loc = (reference_points[:, :, None, :, None, :2]
                   + offsets / p * wh * 0.5)

        backend = self.backend
        if backend == "auto":
            # dense row fetches beat serialized gathers on TPU but are a
            # dense-FLOP disaster on CPU — resolve per platform at trace
            # time.  On a single TPU the fused Pallas one-hot kernel
            # ("mxu", measured 269 -> 73 ms per encoder-layer forward on
            # v5e) is the default; under a multi-device mesh GSPMD cannot
            # partition the Mosaic custom call (measured: it replicates
            # the region — correct but 8x redundant on a v5e-8), so
            # multi-chip stays on the partitionable XLA one-hot fetch
            # until the op is shard_map-wrapped.  MSDA_TPU_BACKEND
            # overrides both ways (bench.py sets =onehot automatically if
            # the Pallas toolchain fails the first step).
            if jax.default_backend() == "tpu":
                default = "mxu" if jax.device_count() == 1 else "onehot"
                backend = os.environ.get("MSDA_TPU_BACKEND", default)
            else:
                backend = "xla"
        if backend == "mxu":
            out = ms_deform_attn(value, spatial_shapes, loc, weights,
                                 gather_mode="mxu",
                                 onehot_dtype="bfloat16")
        elif backend == "pallas":
            from monosowa_tpu.ops.msda_pallas import ms_deform_attn_pallas
            out = ms_deform_attn_pallas(value, tuple(spatial_shapes), loc,
                                        weights)
        elif backend == "onehot":
            # MXU one-hot-matmul row fetch (ops/msda.py _onehot_rows) with
            # bf16 operands/f32 accumulation — fewer serialized gathers
            out = ms_deform_attn(value, spatial_shapes, loc, weights,
                                 gather_mode="onehot",
                                 onehot_dtype="bfloat16")
        else:
            out = ms_deform_attn(value, spatial_shapes, loc, weights)
        return nn.Dense(self.d_model,
                        kernel_init=nn.initializers.xavier_uniform(),
                        dtype=self.dtype, name="output_proj")(out)


class VisualEncoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 256
    dropout: float = 0.1
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    msda_backend: str = "auto"
    dtype: Any = None

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes,
                 deterministic: bool = True):
        attn = MSDeformAttnModule(self.d_model, self.n_levels, self.n_heads,
                                  self.n_points, self.msda_backend,
                                  dtype=self.dtype, name="self_attn")(
            src + pos, reference_points, src, spatial_shapes)
        src = src + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src)
        ff = nn.Dense(self.d_ffn, dtype=self.dtype)(src)
        ff = nn.Dropout(self.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(self.d_model, dtype=self.dtype)(ff)
        src = src + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src)


def encoder_reference_points(spatial_shapes: Sequence[Tuple[int, int]]
                             ) -> np.ndarray:
    """(sum HW, L, 2) pixel-center reference points in [0, 1]
    (depthaware_transformer.py:366-378 with valid_ratios == 1)."""
    pts = []
    for h, w in spatial_shapes:
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref = np.concatenate(pts, 0)
    return np.tile(ref[:, None, :], (1, len(spatial_shapes), 1))


class VisualEncoder(nn.Module):
    num_layers: int = 3
    d_model: int = 256
    d_ffn: int = 256
    dropout: float = 0.1
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    msda_backend: str = "auto"
    dtype: Any = None

    @nn.compact
    def __call__(self, src, pos, spatial_shapes, deterministic: bool = True):
        ref = jnp.asarray(encoder_reference_points(spatial_shapes))[None]
        ref = jnp.broadcast_to(ref, (src.shape[0],) + ref.shape[1:])
        for i in range(self.num_layers):
            src = VisualEncoderLayer(
                self.d_model, self.d_ffn, self.dropout, self.n_levels,
                self.n_heads, self.n_points, self.msda_backend, self.dtype,
                name=f"layer{i}")(
                src, pos, ref, spatial_shapes, deterministic)
        return src


class DepthAwareDecoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 256
    dropout: float = 0.1
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    group_num: int = 11
    msda_backend: str = "auto"
    dtype: Any = None

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src, spatial_shapes,
                 depth_embed_seq, training: bool = False,
                 deterministic: bool = True, self_attn_mask=None):
        # --- depth cross-attention -------------------------------------
        d_attn = MultiHeadAttention(self.n_heads, self.dropout,
                                    dtype=self.dtype,
                                    name="cross_attn_depth")(
            tgt, depth_embed_seq, depth_embed_seq, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(d_attn,
                                             deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm_depth")(tgt)

        # --- group-wise self-attention ---------------------------------
        qk = tgt + query_pos
        q_in = (nn.Dense(self.d_model, dtype=self.dtype,
                         name="sa_qcontent_proj")(qk)
                + nn.Dense(self.d_model, dtype=self.dtype,
                           name="sa_qpos_proj")(qk))
        k_in = (nn.Dense(self.d_model, dtype=self.dtype,
                         name="sa_kcontent_proj")(qk)
                + nn.Dense(self.d_model, dtype=self.dtype,
                           name="sa_kpos_proj")(qk))
        v_in = tgt
        if self_attn_mask is not None:
            # DN-DETR path: the block mask encodes both group isolation and
            # denoising-group isolation (models/dn_components.py)
            s_attn = MultiHeadAttention(self.n_heads, self.dropout,
                                        dtype=self.dtype, name="self_attn")(
                q_in, k_in, v_in, attn_mask=self_attn_mask,
                deterministic=deterministic)
        elif training and self.group_num > 1:
            b, gq, d = q_in.shape
            g = self.group_num
            qn = gq // g

            def fold(x):
                return x.reshape(b, g, qn, d).reshape(b * g, qn, d)

            def unfold(x):
                return x.reshape(b, g, qn, d).reshape(b, gq, d)

            s_attn = MultiHeadAttention(self.n_heads, self.dropout,
                                        dtype=self.dtype, name="self_attn")(
                fold(q_in), fold(k_in), fold(v_in),
                deterministic=deterministic)
            s_attn = unfold(s_attn)
        else:
            s_attn = MultiHeadAttention(self.n_heads, self.dropout,
                                        dtype=self.dtype, name="self_attn")(
                q_in, k_in, v_in, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(s_attn,
                                             deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)

        # --- deformable cross-attention --------------------------------
        c_attn = MSDeformAttnModule(self.d_model, self.n_levels, self.n_heads,
                                    self.n_points, self.msda_backend,
                                    dtype=self.dtype, name="cross_attn")(
            tgt + query_pos, reference_points, src, spatial_shapes)
        tgt = tgt + nn.Dropout(self.dropout)(c_attn,
                                             deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)

        # --- FFN -------------------------------------------------------
        ff = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(tgt)
        ff = nn.Dropout(self.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ff)
        tgt = tgt + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)

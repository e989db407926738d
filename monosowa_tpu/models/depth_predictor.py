"""Foreground depth predictor + depth encoder.

Behavioral contract (MonoDETR depth_predictor/depth_predictor.py:7-104):
LID depth bins (num_bins+1 values, quadratic spacing, depth_predictor.py:21-24);
fuse the stride 8/16/32 projected features to the stride-16 grid; conv head;
(bins+1)-way logits; softmax-weighted expected depth map; one transformer
encoder layer over the depth features; learned per-meter depth positional
embedding sampled by linear interpolation at the predicted depth
(interpolate_depth_embed, :93-104).

Layout: NHWC; the depth embedding sequence is batch-first.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.models.layers import MultiHeadAttention


def lid_bin_values(num_bins: int, depth_min: float, depth_max: float) -> np.ndarray:
    """(num_bins + 1,) LID bin centers + the depth_max sentinel."""
    bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
    indice = np.arange(num_bins, dtype=np.float32)
    value = (indice + 0.5) ** 2 * bin_size / 2 - bin_size / 8 + depth_min
    return np.concatenate([value, [depth_max]]).astype(np.float32)


def lid_bin_index(depth: jnp.ndarray, num_bins: int, depth_min: float,
                  depth_max: float) -> jnp.ndarray:
    """Depth map -> integer LID bin index (ddn_loss.py:68-103 'LID' mode):
    indices = -0.5 + 0.5*sqrt(1 + 8*(d - dmin)/bin_size); out-of-range maps
    to num_bins (the background bin)."""
    bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
    indices = -0.5 + 0.5 * jnp.sqrt(1 + 8 * (depth - depth_min) / bin_size)
    indices = jnp.floor(indices)
    oob = (depth < depth_min) | (depth > depth_max) | ~jnp.isfinite(indices)
    return jnp.where(oob, num_bins, jnp.clip(indices, 0, num_bins)).astype(jnp.int32)


class DepthEncoderLayer(nn.Module):
    """One post-norm transformer encoder layer (depth_predictor/transformer.py)."""

    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 256
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, src, pos, deterministic: bool = True):
        q = k = src + pos
        attn = MultiHeadAttention(self.nhead, self.dropout, dtype=self.dtype,
                                  name="self_attn")(
            q, k, src, deterministic=deterministic)
        src = src + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype)(src)
        ff = nn.Dropout(self.dropout)(nn.relu(ff), deterministic=deterministic)
        ff = nn.Dense(self.d_model, dtype=self.dtype)(ff)
        src = src + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src)


class DepthPredictor(nn.Module):
    d_model: int = 256
    num_depth_bins: int = 80
    depth_min: float = 1e-3
    depth_max: float = 60.0
    dtype: Any = None

    @nn.compact
    def __call__(self, features, pos_16, deterministic: bool = True):
        """features: [stride8, stride16, stride32] NHWC (d_model each, after
        input_proj); pos_16: (H16, W16, d_model) sine embedding.

        Returns (depth_logits NHWC, depth_embed NHWC, weighted_depth (B,H,W),
        depth_pos_embed_ip NHWC), all on the stride-16 grid."""
        f8, f16, f32 = features
        h16, w16 = f16.shape[1], f16.shape[2]

        def gn(x):
            return nn.GroupNorm(num_groups=32, epsilon=1e-5)(x)

        src16 = gn(nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                           name="proj")(f16))
        f32u = jax.image.resize(f32, (f32.shape[0], h16, w16, f32.shape[3]),
                                method="bilinear")
        src32 = gn(nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                           name="upsample")(f32u))
        src8 = gn(nn.Conv(self.d_model, (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)), dtype=self.dtype,
                          name="downsample")(f8))
        src = (src8 + src16 + src32) / 3.0

        y = nn.Conv(self.d_model, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="head1")(src)
        y = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5)(y))
        y = nn.Conv(self.d_model, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="head2")(y)
        y = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5)(y))

        # classifier logits in f32 (feeds the DDN focal loss + softmax)
        depth_logits = nn.Conv(self.num_depth_bins + 1, (1, 1),
                               name="classifier")(y)
        bin_values = jnp.asarray(lid_bin_values(
            self.num_depth_bins, self.depth_min, self.depth_max))
        probs = jax.nn.softmax(depth_logits, axis=-1)
        weighted_depth = jnp.sum(probs * bin_values, axis=-1)  # (B, H, W)

        b = y.shape[0]
        seq = y.reshape(b, h16 * w16, self.d_model)
        pos_seq = pos_16.reshape(1, h16 * w16, self.d_model)
        depth_embed = DepthEncoderLayer(
            self.d_model, dtype=self.dtype,
            name="encoder")(seq, pos_seq, deterministic=deterministic)
        depth_embed = depth_embed.reshape(b, h16, w16, self.d_model)

        # learned per-meter depth embedding, linearly interpolated
        table = self.param("depth_pos_embed",
                           nn.initializers.normal(1.0),
                           (int(self.depth_max) + 1, self.d_model))
        d = jnp.clip(weighted_depth, 0.0, self.depth_max)
        lo = jnp.floor(d)
        delta = (d - lo)[..., None]
        lo_i = lo.astype(jnp.int32)
        hi_i = jnp.minimum(lo_i + 1, table.shape[0] - 1)
        ip = table[lo_i] * (1 - delta) + table[hi_i] * delta  # (B,H,W,D)

        depth_embed = depth_embed + ip
        return depth_logits, depth_embed, weighted_depth, ip

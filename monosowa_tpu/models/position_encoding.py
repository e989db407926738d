"""2D positional embeddings: sine (default) and learned (flag-selectable).

Behavioral contract: MonoDETR position_encoding.py:20-99.  Sine =
PositionEmbeddingSine with normalize=True, scale=2pi, N_steps =
hidden_dim / 2; the reference's padding masks are always all-valid at fixed
1280x384 resolution, so the cumsum over the mask reduces to row/column
indices.  Learned = PositionEmbeddingLearned (:62-99): 50-entry row/col
embedding tables linearly interpolated at coords scaled into [0, 49],
concatenated [x_emb, y_emb].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sine_position_encoding(h: int, w: int, num_pos_feats: int = 128,
                           temperature: float = 10000.0) -> np.ndarray:
    """(H, W, 2*num_pos_feats) sine/cosine embedding, precomputed on host.

    y_embed/x_embed run 1..H, 1..W then are normalized by (max + eps) * 2pi —
    identical to the reference with an all-valid mask."""
    eps = 1e-6
    scale = 2 * np.pi
    y = np.arange(1, h + 1, dtype=np.float32)[:, None].repeat(w, 1)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :].repeat(h, 0)
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale

    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])],
                     axis=3).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=2)


class LearnedPositionEmbedding(nn.Module):
    """PositionEmbeddingLearned (position_encoding.py:62-99): 50-entry
    row/col tables, linear interpolation at coord * 49 / extent, channel
    order [x_emb, y_emb] (the reference keeps this swapped vs sine)."""

    num_pos_feats: int = 128
    table_size: int = 50

    @nn.compact
    def __call__(self, h: int, w: int) -> jnp.ndarray:
        row = nn.Embed(self.table_size, self.num_pos_feats, name="row_embed")
        col = nn.Embed(self.table_size, self.num_pos_feats, name="col_embed")

        def interp(coord, emb):
            f = jnp.floor(coord)
            delta = (coord - f)[:, None]
            fi = f.astype(jnp.int32)
            ci = jnp.clip(fi + 1, 0, self.table_size - 1)
            return emb(fi) * (1 - delta) + emb(ci) * delta

        i = jnp.arange(w, dtype=jnp.float32) / w * (self.table_size - 1)
        j = jnp.arange(h, dtype=jnp.float32) / h * (self.table_size - 1)
        x_emb = interp(i, col)                            # (w, N)
        y_emb = interp(j, row)                            # (h, N)
        return jnp.concatenate([
            jnp.broadcast_to(x_emb[None], (h, w, self.num_pos_feats)),
            jnp.broadcast_to(y_emb[:, None], (h, w, self.num_pos_feats)),
        ], axis=-1)

"""2D sine positional embeddings.

Behavioral contract: MonoDETR position_encoding.py:20-99 (PositionEmbeddingSine
with normalize=True, scale=2pi, N_steps = hidden_dim / 2).  The reference's
padding masks are always all-valid at fixed 1280x384 resolution, so the
cumsum over the mask reduces to row/column indices.
"""

from __future__ import annotations

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

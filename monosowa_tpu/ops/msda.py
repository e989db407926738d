"""Multi-scale deformable attention — pure-XLA core.

Behavioral spec: the reference's pure-pytorch oracle
``ms_deform_attn_core_pytorch`` (MonoDETR/lib/models/monodetr/ops/functions/
ms_deform_attn_func.py:41-61): per level, ``F.grid_sample(value_l, grid,
bilinear, zeros, align_corners=False)`` of sampling locations given in [0, 1]
(grid = 2*loc - 1), weighted by softmaxed attention weights and summed over
levels x points.  The CUDA extension (ms_deform_attn_cuda.cu) implements the
same math; its parity test (ops/test.py:30-89) is mirrored by
tests/test_msda.py against a torch oracle.

TPU design notes: bilinear sampling = 4 gathers + lerp, fully vectorized;
gathers are flattened per level into one take_along_axis on a (B, H*W, M*D)
table so XLA emits a single fused gather per level.  Autodiff provides the
backward pass (the reference ships a hand-written col2im kernel; XLA derives
the scatter automatically).  Static level shapes are compile-time constants —
no level_start_index bookkeeping survives tracing.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(value_l: jnp.ndarray, loc: jnp.ndarray,
                     h: int, w: int) -> jnp.ndarray:
    """Sample one level.

    value_l: (B, H*W, M, D); loc: (B, Q, M, P, 2) in [0, 1] (x, y);
    returns (B, Q, M, P, D).  Matches grid_sample(align_corners=False,
    padding_mode='zeros'): pixel x = loc_x * W - 0.5.
    """
    b, hw, m, d = value_l.shape
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def corner(xc, yc):
        inb = (xc >= 0) & (xc < w) & (yc >= 0) & (yc < h)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        flat = yi * w + xi                                   # (B, Q, M, P)
        bq = flat.shape[1] * flat.shape[2] * flat.shape[3]
        # gather rows of (B, H*W, M*D) at per-(query,head) positions:
        # index by head too, so flatten value to (B, H*W * M, D)
        vflat = value_l.reshape(b, hw * m, d)
        midx = jax.lax.broadcasted_iota(jnp.int32, flat.shape, 2)
        rows = flat * m + midx
        out = jnp.take_along_axis(
            vflat, rows.reshape(b, bq, 1), axis=1).reshape(flat.shape + (d,))
        return out * inb[..., None]

    v00 = corner(x0, y0)
    v01 = corner(x0 + 1, y0)
    v10 = corner(x0, y0 + 1)
    v11 = corner(x0 + 1, y0 + 1)
    wx0, wx1 = (1 - dx)[..., None], dx[..., None]
    wy0, wy1 = (1 - dy)[..., None], dy[..., None]
    return (v00 * wx0 * wy0 + v01 * wx1 * wy0
            + v10 * wx0 * wy1 + v11 * wx1 * wy1)


def _msda_core(value: jnp.ndarray,
               spatial_shapes: Sequence[Tuple[int, int]],
               sampling_locations: jnp.ndarray,
               attention_weights: jnp.ndarray) -> jnp.ndarray:
    b, _, m, d = value.shape
    q = sampling_locations.shape[1]
    outputs = []
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(value, start, h * w, axis=1)
        start += h * w
        sampled = _bilinear_gather(value_l, sampling_locations[:, :, :, lvl],
                                   h, w)                    # (B, Q, M, P, D)
        outputs.append(jnp.einsum("bqmpd,bqmp->bqmd", sampled,
                                  attention_weights[:, :, :, lvl]))
    out = sum(outputs)
    return out.reshape(b, q, m * d)


def ms_deform_attn(value: jnp.ndarray,
                   spatial_shapes: Sequence[Tuple[int, int]],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray,
                   chunk_q: int = 1024) -> jnp.ndarray:
    """Pure-XLA multi-scale deformable attention core.

    value: (B, sum(H*W), M, D) flattened multi-level features;
    spatial_shapes: static [(H, W), ...] per level;
    sampling_locations: (B, Q, M, L, P, 2) in [0, 1];
    attention_weights: (B, Q, M, L, P), softmaxed over (L, P).
    Returns (B, Q, M*D).

    chunk_q bounds the gather staging temps: the (B, Q*M*P, D) corner
    gathers pad their D=32 minor dim to 128 lanes (4x HBM expansion), so at
    encoder Q (~10k) an unchunked pass allocates multi-GB temps and OOMs a
    16 GB chip at batch 8.  Queries are swept in chunk_q slices under
    lax.map, which reuses one chunk-sized buffer across iterations.
    """
    b, _, m, d = value.shape
    q = sampling_locations.shape[1]
    if q <= chunk_q:
        return _msda_core(value, spatial_shapes, sampling_locations,
                          attention_weights)
    pad = (-q) % chunk_q
    if pad:
        sampling_locations = jnp.concatenate(
            [sampling_locations,
             jnp.zeros((b, pad) + sampling_locations.shape[2:],
                       sampling_locations.dtype)], 1)
        attention_weights = jnp.concatenate(
            [attention_weights,
             jnp.zeros((b, pad) + attention_weights.shape[2:],
                       attention_weights.dtype)], 1)
    n = (q + pad) // chunk_q
    locs = jnp.moveaxis(sampling_locations.reshape(
        (b, n, chunk_q) + sampling_locations.shape[2:]), 1, 0)
    wts = jnp.moveaxis(attention_weights.reshape(
        (b, n, chunk_q) + attention_weights.shape[2:]), 1, 0)
    # remat the chunk body: without it autodiff stacks every chunk's
    # (B, chunk, M, P, D) gather residuals across the map — the same
    # multi-GB footprint chunking is here to avoid.
    core = jax.checkpoint(
        lambda lw: _msda_core(value, spatial_shapes, lw[0], lw[1]))
    out = jax.lax.map(core, (locs, wts))            # (n, B, chunk_q, M*D)
    out = jnp.moveaxis(out, 0, 1).reshape(b, q + pad, m * d)
    return out[:, :q]

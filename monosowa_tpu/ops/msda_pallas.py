"""Pallas TPU kernel for multi-scale deformable attention.

Motivation: the pure-XLA core (ops/msda.py) is gather-bound — XLA serializes
TPU gathers at ~1e8 elements/s, and MSDA samples Q x M x L x P x 4 corners
x D elements per layer (~1.6e8 per image for the encoder's ~10k tokens),
making the XLA path minutes-per-step at training shapes.  This kernel keeps
the whole flattened value pyramid for one image resident in VMEM (bf16,
~5 MB at detector shapes) and issues per-sample dynamic row loads directly
from VMEM, orchestrated by an on-chip loop over the query block.

Semantics match ms_deform_attn_core_pytorch exactly (align_corners=False,
zero padding) — parity-tested against ops.msda in tests/test_msda_pallas.py.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(spatial_shapes, m_heads, d_head, block_q, n_levels,
                 n_points):
    starts = []
    acc = 0
    for h, w in spatial_shapes:
        starts.append(acc)
        acc += h * w

    def kernel(loc_ref, w_ref, value_ref, out_ref):
        # loc_ref (1, BQ, M, L, P, 2); w_ref (1, BQ, M, L, P)
        # value_ref (1, S, M, D) bf16; out_ref (1, BQ, M, D) f32
        def q_body(q, _):
            for m in range(m_heads):
                acc_v = jnp.zeros((d_head,), jnp.float32)
                for l, (h, w) in enumerate(spatial_shapes):
                    for p in range(n_points):
                        x = loc_ref[0, q, m, l, p, 0] * w - 0.5
                        y = loc_ref[0, q, m, l, p, 1] * h - 0.5
                        x0 = jnp.floor(x)
                        y0 = jnp.floor(y)
                        dx = x - x0
                        dy = y - y0
                        aw = w_ref[0, q, m, l, p]
                        for cx, cy, cw in (
                                (x0, y0, (1 - dx) * (1 - dy)),
                                (x0 + 1, y0, dx * (1 - dy)),
                                (x0, y0 + 1, (1 - dx) * dy),
                                (x0 + 1, y0 + 1, dx * dy)):
                            inb = ((cx >= 0) & (cx < w)
                                   & (cy >= 0) & (cy < h))
                            xi = jnp.clip(cx, 0, w - 1).astype(jnp.int32)
                            yi = jnp.clip(cy, 0, h - 1).astype(jnp.int32)
                            idx = starts[l] + yi * w + xi
                            v = value_ref[0, idx, m, :].astype(jnp.float32)
                            gate = jnp.where(inb, aw * cw, 0.0)
                            acc_v = acc_v + gate * v
                out_ref[0, q, m, :] = acc_v
            return 0

        jax.lax.fori_loop(0, block_q, q_body, 0)

    return kernel


@partial(jax.jit, static_argnames=("spatial_shapes", "block_q", "interpret"))
def ms_deform_attn_pallas(value: jnp.ndarray,
                          spatial_shapes: Tuple[Tuple[int, int], ...],
                          sampling_locations: jnp.ndarray,
                          attention_weights: jnp.ndarray,
                          block_q: int = 64,
                          interpret: bool = False) -> jnp.ndarray:
    """Same contract as ops.msda.ms_deform_attn.

    value (B, S, M, D); sampling_locations (B, Q, M, L, P, 2) in [0, 1];
    attention_weights (B, Q, M, L, P).  Returns (B, Q, M*D) float32.
    """
    b, s, m, d = value.shape
    q = sampling_locations.shape[1]
    n_levels = len(spatial_shapes)
    n_points = sampling_locations.shape[4]

    pad_q = (-q) % block_q
    if pad_q:
        zl = jnp.zeros((b, pad_q) + sampling_locations.shape[2:],
                       sampling_locations.dtype)
        sampling_locations = jnp.concatenate([sampling_locations, zl], 1)
        zw = jnp.zeros((b, pad_q) + attention_weights.shape[2:],
                       attention_weights.dtype)
        attention_weights = jnp.concatenate([attention_weights, zw], 1)
    qp = q + pad_q
    n_qblocks = qp // block_q

    value_bf16 = value.astype(jnp.bfloat16)

    out = pl.pallas_call(
        _make_kernel(spatial_shapes, m, d, block_q, n_levels, n_points),
        grid=(b, n_qblocks),
        in_specs=[
            pl.BlockSpec((1, block_q, m, n_levels, n_points, 2),
                         lambda i, j: (i, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, m, n_levels, n_points),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, m, d), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, m, d),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, qp, m, d), jnp.float32),
        interpret=interpret,
    )(sampling_locations, attention_weights, value_bf16)

    return out[:, :q].reshape(b, q, m * d)

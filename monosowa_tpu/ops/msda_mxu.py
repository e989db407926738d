"""MSDA forward as a fused one-hot-matmul Pallas TPU kernel.

The XLA one-hot formulation (ops/msda.py ``gather_mode="onehot"``) beats
serialized gathers by fetching sample rows with MXU dots, but XLA stages
the (J, T) one-hot operand and the (J, 4D) row tensor through HBM between
fusions; at encoder shapes the op runs ~5x above its dense-FLOP floor.
This kernel keeps the whole chain in VMEM: per (batch, head, query-block)
grid step it builds the one-hot tile, dots it against the level's quad
rows, folds the bilinear-slot coefficients, and accumulates the output —
one HBM read of the quad bank per (b, m) and one HBM write of the final
(BQ, D) block.

Behavioral contract: identical to ``_msda_core``'s one-hot branch
(reference semantics: MonoDETR ops/functions/ms_deform_attn_func.py:41-61,
the pure-pytorch MSDA spec).  Parity-tested in interpret mode on CPU and
against the XLA path on device.

Layout notes (pallas_guide.md):
* lane dim = 128: the quad row payload 4*D = 128 exactly fills a lane
  tile; the one-hot tile (BQ, T_chunk) is bf16 (16, 128)-tileable.
* the T axis is cut into ``block_t`` chunks so the one-hot tile stays
  ~1 MB; the dot accumulates over chunks.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehot_rows_swept(ii, quadv_ref, t0: int, tl: int, block_t: int,
                       bq: int, d4: int, skip_chunks: bool):
    """One-hot row fetch for one sample column: sweep the level's token
    span in block_t chunks, dotting the (BQ, ct) one-hot tile against the
    quad rows.  With skip_chunks, each chunk's dot is predicated on the
    block's anchor [min, max] range actually overlapping the chunk —
    deformable samples are local, so raster-consecutive query blocks
    touch only a few chunks of the big levels; skipped chunks contribute
    exactly zero, so the result is unchanged.

    Default OFF: measured on v5e at encoder shapes the full step is
    0.69 s with skipping vs 0.68 s without (ring-init offsets = best-case
    locality), i.e. the lax.cond lowers to predicated execution that
    still pays the dot.  Kept for re-evaluation if Mosaic grows real
    scalar branching around MXU ops."""
    if skip_chunks:
        # padding queries carry idx -1: exclude them from the min only
        # (-1 never raises the max)
        lo = jnp.min(jnp.where(ii < 0, jnp.int32(2 ** 30), ii))
        hi = jnp.max(ii)
    rows = jnp.zeros((bq, d4), jnp.float32)
    for c0 in range(t0, t0 + tl, block_t):
        ct = min(block_t, t0 + tl - c0)

        def add_chunk(r, c0=c0, ct=ct):
            iota = c0 + jax.lax.broadcasted_iota(jnp.int32, (bq, ct), 1)
            oh = (ii[:, None] == iota).astype(jnp.bfloat16)
            return r + jnp.dot(oh, quadv_ref[c0:c0 + ct, :],
                               preferred_element_type=jnp.float32)

        if skip_chunks:
            rows = jax.lax.cond((hi >= c0) & (lo < c0 + ct),
                                add_chunk, lambda r: r, rows)
        else:
            rows = add_chunk(rows)
    return rows                                           # (BQ, 4D)


def _fwd_kernel(idx_ref, coef_ref, quadv_ref, out_ref, *,
                level_spans: Tuple[Tuple[int, int], ...], n_points: int,
                block_t: int, d_head: int, skip_chunks: bool):
    """Grid step (b, m, qi): out (BQ, 4D) slot-major accumulator.

    idx_ref (BQ, L*P) int32 GLOBAL anchor rows (level offsets folded in);
    coef_ref (BQ, L*P*4) f32 bilinear-slot coefficients (aw folded in);
    quadv_ref (T_total, 4D) bf16 quad rows for this (b, m).
    """
    bq = idx_ref.shape[0]
    acc = jnp.zeros((bq, 4 * d_head), jnp.float32)
    # slot-coefficient expansion (BQ, 4) -> (BQ, 4D) as a tiny
    # block-diagonal-ones matmul: jnp.repeat/broadcast+reshape on the
    # lane axis fail Mosaic lowering (remote compile helper exit 1),
    # but an iota-built constant dot lowers fine and rides the MXU.
    r4 = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * d_head), 0)
    c4l = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * d_head), 1) // d_head
    expand = (r4 == c4l).astype(jnp.float32)              # (4, 4D)
    for li, (t0, tl) in enumerate(level_spans):
        for p in range(n_points):
            s = li * n_points + p
            ii = idx_ref[:, s]                                # (BQ,)
            rows = _onehot_rows_swept(ii, quadv_ref, t0, tl, block_t,
                                      bq, 4 * d_head, skip_chunks)
            # fold the 4 bilinear slot coefficients (lane-replicated)
            cexp = jnp.dot(coef_ref[:, s * 4:(s + 1) * 4], expand,
                           preferred_element_type=jnp.float32)  # (BQ, 4D)
            acc = acc + cexp * rows
    out_ref[:] = acc


def _gdot_kernel(idx_ref, do_ref, quadv_ref, out_ref, *,
                 level_spans: Tuple[Tuple[int, int], ...], n_points: int,
                 block_t: int, d_head: int, skip_chunks: bool):
    """Grid step (b, m, qi): per-sample row-gradient dots for the
    analytic dLoc/dW backward.

    idx_ref (BQ, L*P) int32 GLOBAL anchor rows; do_ref (BQ, D) incoming
    gradient rows; quadv_ref (T_total, 4D) bf16 quad rows.  Writes
    out (BQ, L*P*4): out[:, s*4+slot] = <quad_row[idx[s], slot], dout>.
    """
    bq, d4 = idx_ref.shape[0], 4 * d_head
    # dout tiled 4x on the lane axis via an iota-built selector matmul
    # (jnp.repeat/broadcast+reshape fail Mosaic lane lowering)
    rT = jax.lax.broadcasted_iota(jnp.int32, (d_head, d4), 0)
    cT = jax.lax.broadcasted_iota(jnp.int32, (d_head, d4), 1)
    tile4 = (cT - (cT // d_head) * d_head == rT).astype(jnp.float32)
    do4 = jnp.dot(do_ref[...].astype(jnp.float32), tile4,
                  preferred_element_type=jnp.float32)     # (BQ, 4D)
    # slot-sum selector: (4D, 4) block-diag ones (transpose of the
    # forward's expand) — folds lane groups of D into per-slot sums
    rS = jax.lax.broadcasted_iota(jnp.int32, (d4, 4), 0) // d_head
    cS = jax.lax.broadcasted_iota(jnp.int32, (d4, 4), 1)
    fold = (rS == cS).astype(jnp.float32)                 # (4D, 4)
    for li, (t0, tl) in enumerate(level_spans):
        for p in range(n_points):
            s = li * n_points + p
            ii = idx_ref[:, s]                            # (BQ,)
            rows = _onehot_rows_swept(ii, quadv_ref, t0, tl, block_t,
                                      bq, d4, skip_chunks)
            out_ref[:, s * 4:(s + 1) * 4] = jnp.dot(
                rows * do4, fold, preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("spatial_shapes", "block_q", "block_t", "interpret",
                     "skip_chunks"))
def msda_gdot_mxu(value: jnp.ndarray,
                  spatial_shapes: Tuple[Tuple[int, int], ...],
                  sampling_locations: jnp.ndarray,
                  dout: jnp.ndarray,
                  block_q: int = 256,
                  block_t: int = 2048,
                  interpret=None,
                  skip_chunks: bool = False) -> jnp.ndarray:
    """Per-sample slot-row gradient dots on the MXU.

    Returns gdot (B, Q, M, L, P, 4) with
    gdot[..., slot] = <quad_value[anchor, slot], dout_row> — the shared
    contraction of the analytic dLoc/dW backward (ops/msda.py
    ``locw_chunk``'s ``gdot`` einsum), fused so the (BQ, 4D) gathered
    rows never stage through HBM.  dout is (B, Q, M, D).
    """
    from monosowa_tpu.ops.msda import _quad_slot_geometry, _quad_value

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t_total, m, d = value.shape
    q = sampling_locations.shape[1]
    n_levels = len(spatial_shapes)
    n_points = sampling_locations.shape[4]

    quads, spans, start = [], [], 0
    for h, w in spatial_shapes:
        value_l = jax.lax.dynamic_slice_in_dim(value, start, h * w, axis=1)
        qv = _quad_value(value_l, w)
        quads.append(jnp.moveaxis(qv, 2, 1).reshape(b, m, h * w, 4 * d))
        spans.append((start, h * w))
        start += h * w
    quadv = jnp.concatenate(quads, axis=2).astype(jnp.bfloat16)

    idxs = []
    for li, (h, w) in enumerate(spatial_shapes):
        flat00, _, _, _ = _quad_slot_geometry(
            sampling_locations[:, :, :, li], h, w, with_derivs=False)
        idxs.append(flat00 + spans[li][0])
    idx = jnp.stack(idxs, 3)                              # (B, Q, M, L, P)
    idx = jnp.moveaxis(idx, 2, 1).reshape(b, m, q, n_levels * n_points)
    do = jnp.moveaxis(dout, 2, 1)                         # (B, M, Q, D)

    qp = -(-q // block_q) * block_q
    if qp != q:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, qp - q), (0, 0)),
                      constant_values=-1)
        do = jnp.pad(do, ((0, 0), (0, 0), (0, qp - q), (0, 0)))

    kernel = functools.partial(
        _gdot_kernel, level_spans=tuple(spans), n_points=n_points,
        block_t=block_t, d_head=d, skip_chunks=skip_chunks)
    out = pl.pallas_call(
        kernel,
        grid=(b, m, qp // block_q),
        in_specs=[
            pl.BlockSpec((None, None, block_q, n_levels * n_points),
                         lambda bi, mi, qi: (bi, mi, qi, 0)),
            pl.BlockSpec((None, None, block_q, d),
                         lambda bi, mi, qi: (bi, mi, qi, 0)),
            pl.BlockSpec((None, None, t_total, 4 * d),
                         lambda bi, mi, qi: (bi, mi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, None, block_q,
                                n_levels * n_points * 4),
                               lambda bi, mi, qi: (bi, mi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (b, m, qp, n_levels * n_points * 4), jnp.float32),
        interpret=interpret,
    )(idx, do, quadv)

    out = out[:, :, :q].reshape(b, m, q, n_levels, n_points, 4)
    return jnp.moveaxis(out, 1, 2)                        # (B,Q,M,L,P,4)


@functools.partial(
    jax.jit,
    static_argnames=("spatial_shapes", "block_q", "block_t", "interpret",
                     "skip_chunks"))
def ms_deform_attn_mxu(value: jnp.ndarray,
                       spatial_shapes: Tuple[Tuple[int, int], ...],
                       sampling_locations: jnp.ndarray,
                       attention_weights: jnp.ndarray,
                       block_q: int = 256,
                       block_t: int = 2048,
                       interpret=None,
                       skip_chunks: bool = False) -> jnp.ndarray:
    """Pallas-MXU MSDA forward.

    value (B, sum HW, M, D); sampling_locations (B, Q, M, L, P, 2) in
    [0, 1]; attention_weights (B, Q, M, L, P).  Returns (B, Q, M*D).

    interpret=None resolves to True off-TPU (Mosaic kernels only lower
    for TPU; CPU tests and accidental CPU use run the interpreter).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from monosowa_tpu.ops.msda import _quad_slot_geometry, _quad_value

    b, t_total, m, d = value.shape
    q = sampling_locations.shape[1]
    n_levels = len(spatial_shapes)
    n_points = sampling_locations.shape[4]

    # quad rows per level, concatenated on the token axis: (B, M, T, 4D)
    quads, spans, start = [], [], 0
    for h, w in spatial_shapes:
        value_l = jax.lax.dynamic_slice_in_dim(value, start, h * w, axis=1)
        qv = _quad_value(value_l, w)                  # (B, T_l, M, 4, D)
        quads.append(jnp.moveaxis(qv, 2, 1).reshape(b, m, h * w, 4 * d))
        spans.append((start, h * w))
        start += h * w
    quadv = jnp.concatenate(quads, axis=2).astype(jnp.bfloat16)

    # global anchor indices + slot coefficients per (level, point)
    idxs, coefs = [], []
    for li, (h, w) in enumerate(spatial_shapes):
        flat00, slot_w, _, _ = _quad_slot_geometry(
            sampling_locations[:, :, :, li], h, w, with_derivs=False)
        coef = slot_w * attention_weights[:, :, :, li][..., None]
        idxs.append(flat00 + spans[li][0])            # (B, Q, M, P)
        coefs.append(coef)                            # (B, Q, M, P, 4)
    idx = jnp.stack(idxs, 3)                          # (B, Q, M, L, P)
    coef = jnp.stack(coefs, 3)                        # (B, Q, M, L, P, 4)
    # -> (B, M, Q, L*P[*4]) blocks for the kernel
    idx = jnp.moveaxis(idx, 2, 1).reshape(b, m, q, n_levels * n_points)
    coef = jnp.moveaxis(coef, 2, 1).reshape(
        b, m, q, n_levels * n_points * 4).astype(jnp.float32)

    qp = -(-q // block_q) * block_q
    if qp != q:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, qp - q), (0, 0)),
                      constant_values=-1)
        coef = jnp.pad(coef, ((0, 0), (0, 0), (0, qp - q), (0, 0)))

    kernel = functools.partial(
        _fwd_kernel, level_spans=tuple(spans), n_points=n_points,
        block_t=block_t, d_head=d, skip_chunks=skip_chunks)
    out = pl.pallas_call(
        kernel,
        grid=(b, m, qp // block_q),
        in_specs=[
            pl.BlockSpec((None, None, block_q, n_levels * n_points),
                         lambda bi, mi, qi: (bi, mi, qi, 0)),
            pl.BlockSpec((None, None, block_q, n_levels * n_points * 4),
                         lambda bi, mi, qi: (bi, mi, qi, 0)),
            pl.BlockSpec((None, None, t_total, 4 * d),
                         lambda bi, mi, qi: (bi, mi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, None, block_q, 4 * d),
                               lambda bi, mi, qi: (bi, mi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m, qp, 4 * d), jnp.float32),
        interpret=interpret,
    )(idx, coef, quadv)

    # slot-major (BQ, 4D) -> sum the 4 bilinear slots -> (B, Q, M*D)
    out = out.reshape(b, m, qp, 4, d).sum(3)[:, :, :q]
    return jnp.moveaxis(out, 1, 2).reshape(b, q, m * d)

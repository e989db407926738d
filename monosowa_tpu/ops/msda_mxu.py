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

Why the one-hot window (win2) is the shipped floor, and not a true
sparse gather (measured, 2026-08-20, v5e via axon):

* ``tpu.dynamic_gather`` (the only per-element gather Mosaic lowers,
  via ``jnp.take_along_axis`` on 2D) refuses any operand whose gather
  dimension spans more than ONE vreg: "Not implemented: Multiple
  source vregs along gather dimension".  Sublane-gathering a
  (block_q=256, 4D) row window therefore cannot lower (8 f32 sublanes
  per vreg); only 8-row windows would, which is useless.  The
  "gatherK" mode below implements the design anyway — exact, parity-
  tested in interpret mode — so it can be A/B'd the day Mosaic lifts
  the restriction.
* the lane-gather workaround (transpose the window so tokens ride the
  128-lane axis, gather per 128-query tile) is legal but VPU-bound:
  ~16 vreg-gathers + selects per (sample, window, query-tile) puts it
  within ~2x of the win2 MXU time at best, for a large Mosaic-edge-case
  risk surface.
* reformulating the fetch as one combined coefficient matrix per level
  (W[q,t] = sum_{p,slot} coef * [t == idx]) cuts the MXU MACs 16x but
  *quadruples* the VPU compare/mul work that builds the sparse operand
  — and at win2 the one-hot build is already ~20% of the kernel, so
  the VPU becomes the new wall at roughly the same wall-clock.  The
  one-hot *build* (one compare+cast per swept (q, t) cell on the VPU),
  not the MXU dot it feeds, is the actual floor of every
  sparse-emulation scheme on this generation.
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
                       bq: int, d4: int, skip_chunks):
    """One-hot row fetch for one sample column: sweep the level's token
    span in block_t chunks, dotting the (BQ, ct) one-hot tile against the
    quad rows.  Skipped chunks contribute exactly zero (ii can only match
    an iota inside its own chunk), so every mode returns the same result.

    skip_chunks modes:

    * False — dense static sweep of all ceil(tl / block_t) chunks.
    * "cond" (legacy True) — each chunk's dot wrapped in lax.cond on the
      block's anchor [min, max] range.  Measured useless on v5e (full
      step 0.69 s vs 0.68 s dense): Mosaic lowers the cond to predicated
      execution that still pays the MXU dot.
    * "dynamic" — a data-dependent fori_loop over ONLY the chunks inside
      the anchor [min, max] range.  Deformable samples are local, so a
      raster-consecutive query block touches a handful of chunks of the
      big levels; a real loop (not predication) skips the rest.  Needs
      the quad bank padded so fixed-size chunk reads stay in bounds
      (_build_quadv) — padding rows are never matched by a one-hot.
    * "winK" (e.g. "win2") — K statically-unrolled chunks anchored at
      the anchor-min's chunk (dynamic start, static trip count: Mosaic
      can schedule the dots, unlike the dynamic-bound loop) + a residual
      dynamic loop for spans wider than the window (usually zero trips).
      The base is clamped so the K window chunks are distinct and
      in-span; chunks below the span contribute exact zeros.
    * "gatherK" (e.g. "gather4") — the winK coverage scheme, but each
      window chunk is fetched with a TRUE sublane gather
      (``tpu.dynamic_gather`` via ``jnp.take_along_axis`` on a
      (block_t, 4D) VMEM window) instead of a one-hot MXU dot: O(BQ*4D)
      VPU work per window vs O(BQ*block_t*4D) MACs — this is the row
      fetch below the one-hot FLOP floor.  Requires block_t == BQ (the
      dynamic_gather lowering constrains operand/index/output to one
      shape).  Residual spans fall back to the one-hot chunk dot, so
      every index is still covered exactly once.
    """
    if isinstance(skip_chunks, str) and skip_chunks.startswith("gather"):
        k_win = int(skip_chunks[6:] or 4)
        if block_t != bq:
            raise ValueError("gather mode needs block_t == block_q "
                             f"(got {block_t} != {bq})")
        n_chunks = -(-tl // block_t)
        lo = jnp.min(jnp.where(ii < 0, jnp.int32(2 ** 30), ii))
        hi = jnp.max(ii)
        base = jnp.clip((lo - t0) // block_t, 0,
                        max(n_chunks - k_win, 0))
        rows = jnp.zeros((bq, d4), jnp.float32)
        for k in range(min(k_win, n_chunks)):
            w0 = t0 + (base + k) * block_t
            win = quadv_ref[pl.dslice(w0, block_t), :].astype(jnp.float32)
            il = ii - w0
            inwin = (il >= 0) & (il < block_t)
            ilc = jnp.clip(il, 0, block_t - 1)
            g = jnp.take_along_axis(
                win, jnp.broadcast_to(ilc[:, None], (bq, d4)), axis=0)
            rows = rows + jnp.where(inwin[:, None], g, 0.0)
        if k_win < n_chunks:
            def chunk_dot(c, r):
                c0 = t0 + c * block_t
                iota = c0 + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, block_t), 1)
                oh = (ii[:, None] == iota).astype(jnp.bfloat16)
                return r + jnp.dot(oh, quadv_ref[pl.dslice(c0, block_t), :],
                                   preferred_element_type=jnp.float32)
            c_hi = (hi - t0) // block_t
            rows = jax.lax.fori_loop(base + k_win, c_hi + 1, chunk_dot,
                                     rows)
        return rows
    if isinstance(skip_chunks, str) and skip_chunks.startswith("win"):
        k_win = int(skip_chunks[3:] or 2)
        n_chunks = -(-tl // block_t)
        lo = jnp.min(jnp.where(ii < 0, jnp.int32(2 ** 30), ii))
        hi = jnp.max(ii)
        base = jnp.clip((lo - t0) // block_t, 0,
                        max(n_chunks - k_win, 0))

        def chunk_dot(c, r):
            c0 = t0 + c * block_t
            iota = c0 + jax.lax.broadcasted_iota(jnp.int32, (bq, block_t), 1)
            oh = (ii[:, None] == iota).astype(jnp.bfloat16)
            return r + jnp.dot(oh, quadv_ref[pl.dslice(c0, block_t), :],
                               preferred_element_type=jnp.float32)

        rows = jnp.zeros((bq, d4), jnp.float32)
        for k in range(min(k_win, n_chunks)):
            rows = chunk_dot(base + k, rows)
        if k_win < n_chunks:
            c_hi = (hi - t0) // block_t
            rows = jax.lax.fori_loop(base + k_win, c_hi + 1, chunk_dot,
                                     rows)
        return rows

    if skip_chunks == "dynamic":
        # padding queries carry idx -1: exclude them from the min only
        # (-1 never raises the max).  An all-padding block yields
        # c_lo >> c_hi => zero loop trips.
        lo = jnp.min(jnp.where(ii < 0, jnp.int32(2 ** 30), ii))
        hi = jnp.max(ii)
        c_lo = (lo - t0) // block_t
        c_hi = (hi - t0) // block_t

        def body(c, r):
            c0 = t0 + c * block_t
            iota = c0 + jax.lax.broadcasted_iota(jnp.int32, (bq, block_t), 1)
            oh = (ii[:, None] == iota).astype(jnp.bfloat16)
            chunk = quadv_ref[pl.dslice(c0, block_t), :]
            return r + jnp.dot(oh, chunk,
                               preferred_element_type=jnp.float32)

        return jax.lax.fori_loop(
            c_lo, c_hi + 1, body, jnp.zeros((bq, d4), jnp.float32))

    if skip_chunks:
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


def _padded_spans(spatial_shapes: Tuple[Tuple[int, int], ...],
                  block_t: int):
    """Level spans ((t0, tl), ...) on a padded token axis + its length.

    Every level start t0 is 8-aligned (so block_t-strided dynamic slices
    stay sublane-aligned) and the tail is padded so any level's
    ceil(tl / block_t) fixed-size chunk sweep stays in bounds."""
    spans, t0 = [], 0
    for h, w in spatial_shapes:
        spans.append((t0, h * w))
        t0 += -(-(h * w) // 8) * 8
    need = max(s0 + -(-tl // block_t) * block_t for s0, tl in spans)
    return tuple(spans), max(-(-need // 8) * 8, t0)


def _build_quadv(value: jnp.ndarray,
                 spatial_shapes: Tuple[Tuple[int, int], ...],
                 block_t: int):
    """Quad rows per level on the shared padded token axis
    (_padded_spans).  Returns (quadv (B, M, T_pad, 4D) bf16, spans).
    Pad rows are zero and no real anchor index ever points at them."""
    from monosowa_tpu.ops.msda import _quad_value

    spans, t_pad = _padded_spans(spatial_shapes, block_t)
    b, _, m, d = value.shape
    quads, start = [], 0
    for h, w in spatial_shapes:
        value_l = jax.lax.dynamic_slice_in_dim(value, start, h * w, axis=1)
        qv = _quad_value(value_l, w)                  # (B, T_l, M, 4, D)
        ql = jnp.moveaxis(qv, 2, 1).reshape(b, m, h * w, 4 * d)
        tl8 = -(-(h * w) // 8) * 8
        if tl8 != h * w:
            ql = jnp.pad(ql, ((0, 0), (0, 0), (0, tl8 - h * w), (0, 0)))
        quads.append(ql)
        start += h * w
    quadv = jnp.concatenate(quads, axis=2)
    if t_pad > quadv.shape[2]:
        quadv = jnp.pad(
            quadv, ((0, 0), (0, 0), (0, t_pad - quadv.shape[2]), (0, 0)))
    return quadv.astype(jnp.bfloat16), spans


def _fwd_kernel(idx_ref, coef_ref, quadv_ref, out_ref, *,
                level_spans: Tuple[Tuple[int, int], ...], n_points: int,
                block_t: int, d_head: int, skip_chunks):
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
                 block_t: int, d_head: int, skip_chunks):
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
                  skip_chunks=False) -> jnp.ndarray:
    """Per-sample slot-row gradient dots on the MXU.

    Returns gdot (B, Q, M, L, P, 4) with
    gdot[..., slot] = <quad_value[anchor, slot], dout_row> — the shared
    contraction of the analytic dLoc/dW backward (ops/msda.py
    ``locw_chunk``'s ``gdot`` einsum), fused so the (BQ, 4D) gathered
    rows never stage through HBM.  dout is (B, Q, M, D).
    """
    from monosowa_tpu.ops.msda import _quad_slot_geometry

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t_total, m, d = value.shape
    q = sampling_locations.shape[1]
    n_levels = len(spatial_shapes)
    n_points = sampling_locations.shape[4]

    quadv, spans = _build_quadv(value, spatial_shapes, block_t)

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
            pl.BlockSpec((None, None, quadv.shape[2], 4 * d),
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
                       skip_chunks=False) -> jnp.ndarray:
    """Pallas-MXU MSDA forward.

    value (B, sum HW, M, D); sampling_locations (B, Q, M, L, P, 2) in
    [0, 1]; attention_weights (B, Q, M, L, P).  Returns (B, Q, M*D).

    interpret=None resolves to True off-TPU (Mosaic kernels only lower
    for TPU; CPU tests and accidental CPU use run the interpreter).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from monosowa_tpu.ops.msda import _quad_slot_geometry

    b, t_total, m, d = value.shape
    q = sampling_locations.shape[1]
    n_levels = len(spatial_shapes)
    n_points = sampling_locations.shape[4]

    # quad rows per level on the shared padded token axis: (B, M, T_pad, 4D)
    quadv, spans = _build_quadv(value, spatial_shapes, block_t)

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
            pl.BlockSpec((None, None, quadv.shape[2], 4 * d),
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


def _dvalue_kernel(idx_ref, coef_ref, do_ref, out_ref, *,
                   level_spans: Tuple[Tuple[int, int], ...], n_points: int,
                   block_t: int, d_head: int, skip_chunks):
    """Grid step (b, m, qi): scatter-add dValue as transposed one-hot dots.

    idx_ref (BQ, L*P) int32 GLOBAL anchor rows; coef_ref (BQ, L*P*4) f32
    bilinear-slot coefficients (aw folded in); do_ref (BQ, D) incoming
    gradient rows.  out_ref (T_pad, 4D) f32 slot-major anchor gradients,
    VMEM-resident across the qi grid axis (constant index map): zeroed at
    qi == 0, accumulated by every step, flushed to HBM once per (b, m).
    out[t, slot*D:(slot+1)*D] = sum over samples with anchor t of
    coef[slot] * dout_row — the Pallas twin of ops/msda.py
    _msda_dvalue's dv_chunk_quad (the anchor-only one-hot formulation);
    the caller folds the 4 slots back to tokens by the inverse shifts.
    """
    bq, d4 = idx_ref.shape[0], 4 * d_head
    if isinstance(skip_chunks, str) and skip_chunks.startswith("gather"):
        # scatter-add has no dynamic_gather analogue; the winK coverage
        # scheme with the same K/block_t is the matching exact sweep
        skip_chunks = "win" + (skip_chunks[6:] or "4")

    @pl.when(pl.program_id(2) == 0)
    def _zero():
        out_ref[:] = jnp.zeros_like(out_ref)

    # dout tiled 4x on the lane axis (iota selector — see _gdot_kernel)
    rT = jax.lax.broadcasted_iota(jnp.int32, (d_head, d4), 0)
    cT = jax.lax.broadcasted_iota(jnp.int32, (d_head, d4), 1)
    tile4 = (cT - (cT // d_head) * d_head == rT).astype(jnp.float32)
    do4 = jnp.dot(do_ref[...].astype(jnp.float32), tile4,
                  preferred_element_type=jnp.float32)     # (BQ, 4D)
    # slot-coefficient expansion selector (see _fwd_kernel)
    r4 = jax.lax.broadcasted_iota(jnp.int32, (4, d4), 0)
    c4l = jax.lax.broadcasted_iota(jnp.int32, (4, d4), 1) // d_head
    expand = (r4 == c4l).astype(jnp.float32)              # (4, 4D)

    for li, (t0, tl) in enumerate(level_spans):
        for p in range(n_points):
            s = li * n_points + p
            ii = idx_ref[:, s]                            # (BQ,)
            cexp = jnp.dot(coef_ref[:, s * 4:(s + 1) * 4], expand,
                           preferred_element_type=jnp.float32)
            payload = (cexp * do4).astype(jnp.bfloat16)   # (BQ, 4D)

            def body(c, _, ii=ii, payload=payload, t0=t0):
                c0 = t0 + c * block_t
                iota = c0 + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, block_t), 1)
                oh = (ii[:, None] == iota).astype(jnp.bfloat16)
                contrib = jax.lax.dot_general(
                    oh, payload, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (bt, 4D)
                out_ref[pl.dslice(c0, block_t), :] = (
                    out_ref[pl.dslice(c0, block_t), :] + contrib)
                return 0

            if isinstance(skip_chunks, str) and skip_chunks.startswith("win"):
                # static K-chunk window at the anchor-min's chunk +
                # residual dynamic loop (see _onehot_rows_swept)
                k_win = int(skip_chunks[3:] or 2)
                n_chunks = -(-tl // block_t)
                lo = jnp.min(jnp.where(ii < 0, jnp.int32(2 ** 30), ii))
                hi = jnp.max(ii)
                base = jnp.clip((lo - t0) // block_t, 0,
                                max(n_chunks - k_win, 0))
                for k in range(min(k_win, n_chunks)):
                    body(base + k, 0)
                if k_win < n_chunks:
                    c_hi = (hi - t0) // block_t
                    jax.lax.fori_loop(base + k_win, c_hi + 1, body, 0)
            elif skip_chunks == "dynamic":
                lo = jnp.min(jnp.where(ii < 0, jnp.int32(2 ** 30), ii))
                hi = jnp.max(ii)
                c_lo = (lo - t0) // block_t
                c_hi = (hi - t0) // block_t
                jax.lax.fori_loop(c_lo, c_hi + 1, body, 0)
            else:
                for c0 in range(t0, t0 + tl, block_t):
                    ct = min(block_t, t0 + tl - c0)
                    iota = c0 + jax.lax.broadcasted_iota(
                        jnp.int32, (bq, ct), 1)
                    oh = (ii[:, None] == iota).astype(jnp.bfloat16)
                    contrib = jax.lax.dot_general(
                        oh, payload, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    out_ref[c0:c0 + ct, :] = out_ref[c0:c0 + ct, :] + contrib


@functools.partial(
    jax.jit,
    static_argnames=("spatial_shapes", "block_q", "block_t", "interpret",
                     "skip_chunks", "out_dtype_name"))
def msda_dvalue_mxu(spatial_shapes: Tuple[Tuple[int, int], ...],
                    sampling_locations: jnp.ndarray,
                    attention_weights: jnp.ndarray,
                    dout: jnp.ndarray,
                    block_q: int = 256,
                    block_t: int = 2048,
                    interpret=None,
                    skip_chunks=False,
                    out_dtype_name: str = "float32") -> jnp.ndarray:
    """Pallas-MXU dValue: the scatter-add backward of MSDA.

    sampling_locations (B, Q, M, L, P, 2) in [0, 1]; attention_weights
    (B, Q, M, L, P); dout (B, Q, M, D) incoming gradient rows.  Returns
    dValue (B, sum HW, M, D).

    Replaces the XLA dense one-hot scan (ops/msda.py _msda_dvalue): the
    (J, T) one-hot and the (T, 4D) accumulator never stage through HBM —
    one HBM write of the anchor-gradient bank per (b, m) — and the
    "dynamic" skip mode sweeps only each sample's anchor chunk range.
    Semantics match _msda_dvalue's quad branch (anchor-only one-hot,
    slot payload folded to tokens by the inverse shifts); reference spec:
    MonoDETR ops/src/cuda/ms_deform_attn_cuda.cu backward col2im.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from monosowa_tpu.ops.msda import _quad_slot_geometry

    b, q, m, d = dout.shape
    n_levels = len(spatial_shapes)
    n_points = sampling_locations.shape[4]
    spans, t_pad = _padded_spans(spatial_shapes, block_t)

    idxs, coefs = [], []
    for li, (h, w) in enumerate(spatial_shapes):
        flat00, slot_w, _, _ = _quad_slot_geometry(
            sampling_locations[:, :, :, li], h, w, with_derivs=False)
        coef = slot_w * attention_weights[:, :, :, li][..., None]
        idxs.append(flat00 + spans[li][0])            # (B, Q, M, P)
        coefs.append(coef)                            # (B, Q, M, P, 4)
    idx = jnp.stack(idxs, 3)                          # (B, Q, M, L, P)
    coef = jnp.stack(coefs, 3)
    idx = jnp.moveaxis(idx, 2, 1).reshape(b, m, q, n_levels * n_points)
    coef = jnp.moveaxis(coef, 2, 1).reshape(
        b, m, q, n_levels * n_points * 4).astype(jnp.float32)
    do = jnp.moveaxis(dout, 2, 1)                     # (B, M, Q, D)

    qp = -(-q // block_q) * block_q
    if qp != q:
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, qp - q), (0, 0)),
                      constant_values=-1)
        coef = jnp.pad(coef, ((0, 0), (0, 0), (0, qp - q), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, 0), (0, qp - q), (0, 0)))

    kernel = functools.partial(
        _dvalue_kernel, level_spans=spans, n_points=n_points,
        block_t=block_t, d_head=d, skip_chunks=skip_chunks)
    dvq = pl.pallas_call(
        kernel,
        grid=(b, m, qp // block_q),
        in_specs=[
            pl.BlockSpec((None, None, block_q, n_levels * n_points),
                         lambda bi, mi, qi: (bi, mi, qi, 0)),
            pl.BlockSpec((None, None, block_q, n_levels * n_points * 4),
                         lambda bi, mi, qi: (bi, mi, qi, 0)),
            pl.BlockSpec((None, None, block_q, d),
                         lambda bi, mi, qi: (bi, mi, qi, 0)),
        ],
        out_specs=pl.BlockSpec((None, None, t_pad, 4 * d),
                               lambda bi, mi, qi: (bi, mi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m, t_pad, 4 * d), jnp.float32),
        interpret=interpret,
    )(idx, coef, do)

    # fold the 4 anchor slots back to tokens by the inverse shifts
    # (quad row at anchor t holds [v[t], v[t+1], v[t+w], v[t+w+1]]);
    # contributions past each level's end vanish (the forward zero-fills
    # those rows) — matching ops/msda.py _msda_dvalue's fold.
    dvq = dvq.reshape(b, m, t_pad, 4, d)
    levels = []
    for (h, w_l), (t0, tl) in zip(spatial_shapes, spans):
        dv = jax.lax.dynamic_slice_in_dim(dvq, t0, tl, axis=2)

        def shifted(slot, k):
            if k == 0:
                return dv[:, :, :, slot]
            pad = jnp.zeros((b, m, k, d), jnp.float32)
            return jnp.concatenate([pad, dv[:, :, :-k, slot]], 2)

        dv_l = (shifted(0, 0) + shifted(1, 1)
                + shifted(2, w_l) + shifted(3, w_l + 1))
        levels.append(jnp.moveaxis(dv_l, 1, 2))       # (B, T_l, M, D)
    return jnp.concatenate(levels, 1).astype(jnp.dtype(out_dtype_name))

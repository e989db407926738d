"""Multi-scale deformable attention — pure-XLA core with a custom TPU VJP.

Behavioral spec: the reference's pure-pytorch oracle
``ms_deform_attn_core_pytorch`` (MonoDETR/lib/models/monodetr/ops/functions/
ms_deform_attn_func.py:41-61): per level, ``F.grid_sample(value_l, grid,
bilinear, zeros, align_corners=False)`` of sampling locations given in [0, 1]
(grid = 2*loc - 1), weighted by softmaxed attention weights and summed over
levels x points.  The CUDA extension (ms_deform_attn_cuda.cu) implements the
same math; its parity test (ops/test.py:30-89) is mirrored by
tests/test_msda.py against a torch oracle.

TPU design notes: bilinear sampling = 4 gathers + lerp, fully vectorized;
gathers are flattened per level into one take_along_axis per corner.  The
backward is a hand-written custom_vjp (the reference ships a hand-written
col2im CUDA kernel for the same reason): XLA's derived scatter-add for the
value gradient serializes on TPU (~1e8 rows/s; measured 1.7 s/layer/step at
training shapes), so dValue is instead accumulated with chunked one-hot
MATMULS on the MXU — the same scatter->matmul trick as the template-fitting
histogram in ops/tfl.py — while dLoc/dW come from an analytic bilinear
derivative over regathered corner values.  Static level shapes are
compile-time constants — no level_start_index bookkeeping survives tracing.
"""

from __future__ import annotations

import functools
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
    vflat = value_l.reshape(b, hw * m, d)
    out = None
    for flat, cw, _, _, inb in _corner_geometry(loc, h, w):
        v = _gather_rows(vflat, flat, m, d)
        term = v * (cw * inb)[..., None]
        out = term if out is None else out + term
    return out


def _corner_geometry(loc: jnp.ndarray, h: int, w: int):
    """The four bilinear corners of each sample.

    loc (..., 2) in [0, 1] -> per corner: (flat_index, weight, dweight/dx,
    dweight/dy, in_bounds) with grid_sample(align_corners=False) semantics.
    """
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    corners = []
    for cx, cy, cw, dwx, dwy in (
            (x0, y0, (1 - dx) * (1 - dy), -(1 - dy), -(1 - dx)),
            (x0 + 1, y0, dx * (1 - dy), (1 - dy), -dx),
            (x0, y0 + 1, (1 - dx) * dy, -dy, (1 - dx)),
            (x0 + 1, y0 + 1, dx * dy, dy, dx)):
        inb = ((cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)).astype(loc.dtype)
        xi = jnp.clip(cx, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(cy, 0, h - 1).astype(jnp.int32)
        corners.append((yi * w + xi, cw, dwx, dwy, inb))
    return corners


def _gather_rows(vflat: jnp.ndarray, flat: jnp.ndarray, m: int, d: int
                 ) -> jnp.ndarray:
    """vflat (B, HW*M, D); flat (B, ..., M, P) level-local token indices ->
    (B, ..., M, P, D) rows indexed per head."""
    b = vflat.shape[0]
    midx = jax.lax.broadcasted_iota(jnp.int32, flat.shape, flat.ndim - 2)
    rows = flat * m + midx
    n = rows.size // b
    out = jnp.take_along_axis(vflat, rows.reshape(b, n, 1), axis=1)
    return out.reshape(flat.shape + (d,))


def _quad_slot_geometry(loc: jnp.ndarray, h: int, w: int,
                        with_derivs: bool = True):
    """Quad-gather geometry: all 4 bilinear corners of a sample live in one
    pre-concatenated row (see _quad_value), so ONE gather per sample fetches
    them — gathers on TPU are row-rate-bound (~1e8 rows/s), so folding the
    corners 4x-widens rows instead of 4x-ing row count.

    The quad is anchored at (bx, by) = clip(x0, 0, w-2/h-2) so its 4 slots
    are always valid memory (no row wrap); each corner maps to slot
    (y0+b-by)*2 + (x0+a-bx), clipped — out-of-range slots belong exactly to
    out-of-bounds corners, whose weight is already zero.

    Returns (flat00, slot_w, slot_dwx, slot_dwy): the anchor's flat token
    index and per-slot bilinear weights / x- and y-derivative weights,
    each (..., 4), in-bounds masking folded in.
    """
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    bx = jnp.clip(x0, 0, max(w - 2, 0))
    by = jnp.clip(y0, 0, max(h - 2, 0))
    flat00 = (by * w + bx).astype(jnp.int32)

    slot_w = slot_dwx = slot_dwy = 0.0
    for a, b, cw, dwx, dwy in (
            (0, 0, (1 - dx) * (1 - dy), -(1 - dy), -(1 - dx)),
            (1, 0, dx * (1 - dy), (1 - dy), -dx),
            (0, 1, (1 - dx) * dy, -dy, (1 - dx)),
            (1, 1, dx * dy, dy, dx)):
        cx = x0 + a
        cy = y0 + b
        inb = ((cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)).astype(loc.dtype)
        sx = jnp.clip(cx - bx, 0, 1).astype(jnp.int32)
        sy = jnp.clip(cy - by, 0, 1).astype(jnp.int32)
        oh = jax.nn.one_hot(sy * 2 + sx, 4, dtype=loc.dtype)
        slot_w = slot_w + oh * (cw * inb)[..., None]
        if with_derivs:
            slot_dwx = slot_dwx + oh * (dwx * inb)[..., None]
            slot_dwy = slot_dwy + oh * (dwy * inb)[..., None]
    return flat00, slot_w, slot_dwx, slot_dwy


def _quad_value(value_l: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, T, M, D) -> (B, T, M, 4, D) rows [v, v+1, v+w, v+w+1]
    (token-shifted copies; zero fill past the level end)."""
    b, t, m, d = value_l.shape

    def shift(k):
        return jnp.concatenate(
            [value_l[:, k:], jnp.zeros((b, k, m, d), value_l.dtype)], 1)

    return jnp.stack([value_l, shift(1), shift(w), shift(w + 1)], 3)


def _bilinear_gather_quad(quad_flat: jnp.ndarray, loc: jnp.ndarray,
                          aw: jnp.ndarray, h: int, w: int, m: int, d: int
                          ) -> jnp.ndarray:
    """quad_flat (B, T*M, 4D); loc (B, Q, M, P, 2); aw (B, Q, M, P) ->
    (B, Q, M, D): one gather + slot-weighted contraction per sample."""
    flat00, slot_w, _, _ = _quad_slot_geometry(loc, h, w, with_derivs=False)
    rows = _gather_rows(quad_flat, flat00, m, 4 * d)
    rows = rows.reshape(rows.shape[:-1] + (4, d))       # (B,Q,M,P,4,D)
    coef = slot_w * aw[..., None]
    return jnp.einsum("bqmps,bqmpsd->bqmd", coef, rows)


def _onehot_rows(quadv_bm: jnp.ndarray, flat00: jnp.ndarray, dtype
                 ) -> jnp.ndarray:
    """MXU row fetch: quadv_bm (B, M, T, 4D); flat00 (B, C, M, P) anchor
    token indices -> (B, C, M, P, 4, D) quad rows via a (one-hot @ value)
    dot_general.

    TPU gathers are row-rate-serialized (~1e8 rows/s); a (J, T) one-hot
    contraction against (T, 4D) runs on the MXU at matmul rates and XLA
    fuses the iota-compare into the dot operand, so the one-hot is never
    materialized in HBM.  This is the forward/dLoc twin of the dValue
    scatter->matmul trick below."""
    b, m, t, d4 = quadv_bm.shape
    d = d4 // 4
    c, p = flat00.shape[1], flat00.shape[3]
    rows_idx = jnp.moveaxis(flat00, 2, 1).reshape(b, m, c * p)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, t), 3)
    onehot = (rows_idx[..., None] == iota_t).astype(dtype)   # (B,M,J,T)
    out4 = jax.lax.dot_general(
        onehot, quadv_bm.astype(dtype),
        (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32)                   # (B,M,J,4D)
    out4 = out4.reshape(b, m, c, p, 4, d)
    return jnp.moveaxis(out4, 2, 1)                           # (B,C,M,P,4,D)


def _bilinear_onehot(quadv_bm: jnp.ndarray, loc: jnp.ndarray,
                     aw: jnp.ndarray, h: int, w: int, dtype) -> jnp.ndarray:
    """One-hot-matmul forward for one level: (B, Q, M, D)."""
    flat00, slot_w, _, _ = _quad_slot_geometry(loc, h, w, with_derivs=False)
    rows = _onehot_rows(quadv_bm, flat00, dtype)      # (B,Q,M,P,4,D)
    coef = slot_w * aw[..., None]
    return jnp.einsum("bqmps,bqmpsd->bqmd", coef, rows)


def _msda_core(value: jnp.ndarray,
               spatial_shapes: Sequence[Tuple[int, int]],
               sampling_locations: jnp.ndarray,
               attention_weights: jnp.ndarray,
               quads=None, gather_mode: str = "quad",
               onehot_dtype=jnp.float32) -> jnp.ndarray:
    b, _, m, d = value.shape
    q = sampling_locations.shape[1]
    outputs = []
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        if quads is not None and gather_mode == "onehot":
            outputs.append(_bilinear_onehot(
                quads[lvl], sampling_locations[:, :, :, lvl],
                attention_weights[:, :, :, lvl], h, w, onehot_dtype))
            continue
        if quads is not None:
            outputs.append(_bilinear_gather_quad(
                quads[lvl], sampling_locations[:, :, :, lvl],
                attention_weights[:, :, :, lvl], h, w, m, d))
            continue
        value_l = jax.lax.dynamic_slice_in_dim(value, start, h * w, axis=1)
        start += h * w
        sampled = _bilinear_gather(value_l, sampling_locations[:, :, :, lvl],
                                   h, w)                    # (B, Q, M, P, D)
        outputs.append(jnp.einsum("bqmpd,bqmp->bqmd", sampled,
                                  attention_weights[:, :, :, lvl]))
    out = sum(outputs)
    return out.reshape(b, q, m * d)


def _make_quads(value: jnp.ndarray,
                spatial_shapes: Sequence[Tuple[int, int]],
                gather_mode: str = "quad"):
    """Per-level quad tensors, built once per call and shared by every
    query chunk: (B, T*M, 4D) for gather mode "quad", (B, M, T, 4D) for
    the one-hot-matmul mode."""
    b, _, m, d = value.shape
    quads = []
    start = 0
    for h, w in spatial_shapes:
        value_l = jax.lax.dynamic_slice_in_dim(value, start, h * w, axis=1)
        start += h * w
        qv = _quad_value(value_l, w)                  # (B, T, M, 4, D)
        if gather_mode == "onehot":
            quads.append(jnp.moveaxis(qv, 2, 1).reshape(b, m, h * w, 4 * d))
        else:
            quads.append(qv.reshape(b, h * w * m, 4 * d))
    return tuple(quads)


def _chunk_leading_q(arrs, q, chunk_q):
    """Pad axis 1 to a chunk_q multiple and reshape to (n, B, chunk_q, ...)
    for lax.map sweeps."""
    b = arrs[0].shape[0]
    pad = (-q) % chunk_q
    out = []
    for a in arrs:
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((b, pad) + a.shape[2:], a.dtype)], 1)
        n = (q + pad) // chunk_q
        out.append(jnp.moveaxis(
            a.reshape((b, n, chunk_q) + a.shape[2:]), 1, 0))
    return out


def _msda_fwd_chunked(value, spatial_shapes, loc, w, chunk_q,
                      gather_mode="quad", onehot_dtype=jnp.float32):
    b, _, m, d = value.shape
    q = loc.shape[1]
    quads = (_make_quads(value, spatial_shapes, gather_mode)
             if gather_mode in ("quad", "onehot") else None)
    if q <= chunk_q:
        return _msda_core(value, spatial_shapes, loc, w, quads, gather_mode,
                          onehot_dtype)
    locs, wts = _chunk_leading_q((loc, w), q, chunk_q)
    out = jax.lax.map(
        lambda lw: _msda_core(value, spatial_shapes, lw[0], lw[1], quads,
                              gather_mode, onehot_dtype),
        (locs, wts))                                # (n, B, chunk_q, M*D)
    qp = locs.shape[0] * chunk_q
    out = jnp.moveaxis(out, 0, 1).reshape(b, qp, m * d)
    return out[:, :q]


def _msda_bwd(value, spatial_shapes, loc, w, dout, chunk_q, dv_chunk_q,
              onehot_dtype, gather_mode="quad"):
    """Hand-written VJP.  dout (B, Q, M*D) -> (dvalue, dloc, dw).

    dLoc/dW: analytic bilinear derivatives over regathered corner values
    (one quad gather per sample, see _quad_slot_geometry), swept in chunk_q
    query chunks.  dValue: per level, samples are folded into
    (token-one-hot x coefficient) matrices and contracted against the
    incoming gradient rows on the MXU in dv_chunk_q query chunks — a dense
    formulation of the scatter-add that XLA would otherwise serialize.
    """
    b, s, m, d = value.shape
    q = loc.shape[1]
    n_levels = len(spatial_shapes)
    n_points = loc.shape[4]
    dout_r = dout.reshape(b, q, m, d)

    locs, wts, douts = _chunk_leading_q((loc, w, dout_r), q, chunk_q)
    starts = []
    acc = 0
    for h, w_l in spatial_shapes:
        starts.append(acc)
        acc += h * w_l
    quads = (_make_quads(value, spatial_shapes, gather_mode)
             if gather_mode in ("quad", "onehot") else None)

    # ---- dLoc / dW ------------------------------------------------------
    if gather_mode == "mxu":
        # fused Pallas regather: the (BQ, 4D) row fetch + dout contraction
        # never stage through HBM (ops/msda_mxu.py msda_gdot_mxu); the
        # bilinear-derivative folds below are cheap elementwise einsums
        from monosowa_tpu.ops.msda_mxu import msda_gdot_mxu
        gdot = msda_gdot_mxu(value, tuple(tuple(x) for x in spatial_shapes),
                             loc, dout_r, **_mxu_tuning())  # (B,Q,M,L,P,4)
        dls, dws = [], []
        for lvl, (h, w_l) in enumerate(spatial_shapes):
            _, slot_w, slot_dwx, slot_dwy = _quad_slot_geometry(
                loc[:, :, :, lvl], h, w_l)
            g = gdot[:, :, :, lvl]
            aw_l = w[:, :, :, lvl]
            dw_l = jnp.einsum("bqmps,bqmps->bqmp", slot_w, g)
            dx_l = aw_l * w_l * jnp.einsum("bqmps,bqmps->bqmp",
                                           slot_dwx, g)
            dy_l = aw_l * h * jnp.einsum("bqmps,bqmps->bqmp", slot_dwy, g)
            dls.append(jnp.stack([dx_l, dy_l], -1))
            dws.append(dw_l)
        dloc = jnp.stack(dls, 3)
        dw = jnp.stack(dws, 3)
        import os
        if os.environ.get("MSDA_MXU_DVALUE", "1") == "1":
            # fused Pallas dValue (scatter-add as transposed one-hot dots,
            # accumulator VMEM-resident per (b, m)): measured 96.3 (XLA
            # scan) -> 64.9 ms per encoder layer at win2/block_t=512.
            # MSDA_MXU_DVALUE=0 falls back to the XLA scan.
            from monosowa_tpu.ops.msda_mxu import msda_dvalue_mxu
            dv = msda_dvalue_mxu(
                tuple(tuple(x) for x in spatial_shapes), loc, w, dout_r,
                out_dtype_name=str(value.dtype), **_mxu_tuning())
            return dv, dloc, dw
        return _msda_dvalue(value, spatial_shapes, loc, w, dout_r,
                            dv_chunk_q, onehot_dtype), dloc, dw
    def locw_chunk(args):
        loc_c, aw_c, do_c = args      # (B,C,M,L,P,2) (B,C,M,L,P) (B,C,M,D)
        dls, dws = [], []
        for lvl, (h, w_l) in enumerate(spatial_shapes):
            aw_l = aw_c[:, :, :, lvl]
            if quads is not None:
                flat00, slot_w, slot_dwx, slot_dwy = _quad_slot_geometry(
                    loc_c[:, :, :, lvl], h, w_l)
                if gather_mode == "onehot":
                    rows = _onehot_rows(quads[lvl], flat00, onehot_dtype)
                else:
                    rows = _gather_rows(quads[lvl], flat00, m, 4 * d)
                    rows = rows.reshape(rows.shape[:-1] + (4, d))
                gdot = jnp.einsum("bqmpsd,bqmd->bqmps", rows, do_c)
                dw_l = jnp.einsum("bqmps,bqmps->bqmp", slot_w, gdot)
                dx_l = aw_l * w_l * jnp.einsum("bqmps,bqmps->bqmp",
                                               slot_dwx, gdot)
                dy_l = aw_l * h * jnp.einsum("bqmps,bqmps->bqmp",
                                             slot_dwy, gdot)
                dls.append(jnp.stack([dx_l, dy_l], -1))
                dws.append(dw_l)
                continue
            value_l = jax.lax.dynamic_slice_in_dim(
                value, starts[lvl], h * w_l, axis=1)
            vflat = value_l.reshape(b, h * w_l * m, d)
            g = []
            geom = _corner_geometry(loc_c[:, :, :, lvl], h, w_l)
            for flat, cw, dwx, dwy, inb in geom:
                v = _gather_rows(vflat, flat, m, d)
                g.append(jnp.einsum("bqmpd,bqmd->bqmp", v, do_c)
                         * inb)                          # (B,C,M,P)
            dw_l = sum(geom[i][1] * g[i] for i in range(4))
            dx_l = aw_l * w_l * sum(geom[i][2] * g[i] for i in range(4))
            dy_l = aw_l * h * sum(geom[i][3] * g[i] for i in range(4))
            dls.append(jnp.stack([dx_l, dy_l], -1))      # (B,C,M,P,2)
            dws.append(dw_l)
        return jnp.stack(dls, 3), jnp.stack(dws, 3)      # (B,C,M,L,P,*)

    dl_chunks, dw_chunks = jax.lax.map(locw_chunk, (locs, wts, douts))
    qp = locs.shape[0] * chunk_q
    dloc = jnp.moveaxis(dl_chunks, 0, 1).reshape(
        (b, qp) + dl_chunks.shape[3:])[:, :q]
    dw = jnp.moveaxis(dw_chunks, 0, 1).reshape(
        (b, qp) + dw_chunks.shape[3:])[:, :q]

    return (_msda_dvalue(value, spatial_shapes, loc, w, dout_r, dv_chunk_q,
                         onehot_dtype, gather_mode), dloc, dw)


def _msda_dvalue(value, spatial_shapes, loc, w, dout_r, dv_chunk_q,
                 onehot_dtype, gather_mode="quad"):
    """dValue: dense one-hot formulation of the scatter-add (see
    _msda_bwd docstring); the anchor-only quad variant serves the
    "quad"/"onehot"/"mxu" modes, per-corner serves the rest."""
    b, _, m, d = value.shape
    q = loc.shape[1]
    n_points = loc.shape[4]
    locs_v, wts_v, douts_v = _chunk_leading_q((loc, w, dout_r), q, dv_chunk_q)
    dvalue_levels = []
    for lvl, (h, w_l) in enumerate(spatial_shapes):
        t_l = h * w_l
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, t_l), 3)

        def dv_chunk_quad(args, lvl=lvl, t_l=t_l, iota_t=iota_t, h=h,
                          w_l=w_l):
            """Quad dValue: one-hot the ANCHOR index only (4x fewer samples
            than per-corner), payload = slot_coef x dout rows (4D wide);
            the (B, M, T, 4, D) result is folded to tokens by the inverse
            shifts after the scan."""
            loc_c, aw_c, do_c = args
            flat00, slot_w, _, _ = _quad_slot_geometry(
                loc_c[:, :, :, lvl], h, w_l, with_derivs=False)
            coef = slot_w * aw_c[:, :, :, lvl][..., None]  # (B,C,M,P,4)
            cq = loc_c.shape[1]
            j = cq * n_points
            rows = jnp.moveaxis(flat00, 2, 1).reshape(b, m, j)
            coef = jnp.moveaxis(coef, 2, 1).reshape(b, m, j, 4)
            onehot = (rows[..., None] == iota_t).astype(onehot_dtype)
            do_s = jnp.moveaxis(do_c, 2, 1)
            do_s = jnp.broadcast_to(
                do_s[:, :, :, None, :],
                (b, m, cq, n_points, d)).reshape(b, m, j, d)
            payload = (coef[..., None] * do_s[..., None, :]) \
                .reshape(b, m, j, 4 * d)
            return jax.lax.dot_general(
                onehot, payload.astype(onehot_dtype),
                (((2,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32)       # (B,M,T,4D)

        def dv_chunk(args, lvl=lvl, t_l=t_l, iota_t=iota_t):
            loc_c, aw_c, do_c = args
            geom = _corner_geometry(loc_c[:, :, :, lvl], h, w_l)
            rows = jnp.stack([c[0] for c in geom], 3)     # (B,C,M,4,P)?
            coef = jnp.stack([c[1] * c[4] for c in geom], 3)
            # (B, C, M, 4, P) -> samples j = (q, corner, p) per (b, m)
            rows = jnp.moveaxis(rows, 2, -1)              # (B,C,4,P,M)
            coef = jnp.moveaxis(coef, 2, -1) * jnp.moveaxis(
                aw_c[:, :, :, lvl], 2, -1)[:, :, None]
            cq = rows.shape[1]
            j = cq * 4 * n_points
            rows = jnp.moveaxis(rows, -1, 1).reshape(b, m, j)
            coef = jnp.moveaxis(coef, -1, 1).reshape(b, m, j)
            onehot = (rows[..., None] == iota_t).astype(onehot_dtype) \
                * coef[..., None].astype(onehot_dtype)    # (B,M,J,T)
            # dO rows per sample: (B,C,M,D) -> (B,M,C,1,D) tiled over (4,P)
            do_s = jnp.moveaxis(do_c, 2, 1)[:, :, :, None, :]
            do_s = jnp.broadcast_to(
                do_s, (b, m, cq, 4 * n_points, d)).reshape(b, m, j, d)
            return jax.lax.dot_general(
                onehot, do_s.astype(onehot_dtype),
                (((2,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32)       # (B,M,T,D)

        # scan (not map): accumulate into one carry instead of stacking
        # n_chunks copies of it
        if gather_mode in ("quad", "onehot"):
            dvq, _ = jax.lax.scan(
                lambda acc, args: (acc + dv_chunk_quad(args), None),
                jnp.zeros((b, m, t_l, 4 * d), jnp.float32),
                (locs_v, wts_v, douts_v))
            dvq = dvq.reshape(b, m, t_l, 4, d)

            def shifted(slot, k):
                if k == 0:
                    return dvq[:, :, :, slot]
                pad = jnp.zeros((b, m, k, d), jnp.float32)
                return jnp.concatenate([pad, dvq[:, :, :-k, slot]], 2)

            dv_l = (shifted(0, 0) + shifted(1, 1)
                    + shifted(2, w_l) + shifted(3, w_l + 1))
        else:
            dv_l, _ = jax.lax.scan(
                lambda acc, args: (acc + dv_chunk(args), None),
                jnp.zeros((b, m, t_l, d), jnp.float32),
                (locs_v, wts_v, douts_v))
        dvalue_levels.append(jnp.moveaxis(dv_l, 1, 2))    # (B,T,M,D)
    return jnp.concatenate(dvalue_levels, 1).astype(value.dtype)


def _mxu_tuning() -> dict:
    """Pallas MXU kernel knobs, env-overridable for on-chip measurement.

    Defaults = the measured-best v5e configuration: "win2" chunk skipping
    at block_t=512 (two statically-scheduled 512-row chunks anchored at
    each sample's anchor-min chunk + a residual loop; exact — see
    ops/msda_mxu.py).  Measured per encoder layer at realistic local
    sampling: fwd 74.5 -> 53.9 ms, gdot 69.1 -> 53.7 ms vs the dense
    block_t=2048 sweep.

    MSDA_MXU_SKIP: "none" (dense sweep), "dynamic" (data-dependent chunk
    loop: 65.5/62.9 ms — loses static scheduling), "cond" (legacy
    predicated variant, measured useless), "winK", "gatherK" (true
    dynamic_gather row fetch; blocked on current Mosaic — sublane
    gathers are single-vreg only — so it only runs in interpret mode;
    see ops/msda_mxu.py header for the full analysis).
    MSDA_MXU_BLOCK_T: chunk length of the token sweep; smaller chunks
    skip at finer grain but pay more loop/one-hot-build overhead.
    """
    import os

    skip = os.environ.get("MSDA_MXU_SKIP", "win2")
    return {"skip_chunks": False if skip in ("", "none") else skip,
            "block_t": int(os.environ.get("MSDA_MXU_BLOCK_T", "512"))}


@functools.lru_cache(maxsize=None)
def _make_msda(spatial_shapes: Tuple[Tuple[int, int], ...], chunk_q: int,
               dv_chunk_q: int, onehot_dtype_name: str,
               gather_mode: str = "quad", bwd_gather_mode: str = ""):
    onehot_dtype = jnp.dtype(onehot_dtype_name)
    if gather_mode == "mxu":
        # Pallas fused one-hot-MXU forward (ops/msda_mxu.py); the analytic
        # backward regathers with a row-fetch formulation of its own —
        # "quad" measured best, so it is the default bwd under mxu.
        from monosowa_tpu.ops.msda_mxu import ms_deform_attn_mxu

        def fwd_fn(value, loc, w):
            return ms_deform_attn_mxu(value, spatial_shapes, loc, w,
                                      **_mxu_tuning())
        bwd_mode = bwd_gather_mode or "mxu"
    else:
        def fwd_fn(value, loc, w):
            return _msda_fwd_chunked(value, spatial_shapes, loc, w, chunk_q,
                                     gather_mode, onehot_dtype)
        bwd_mode = bwd_gather_mode or gather_mode

    @jax.custom_vjp
    def f(value, loc, w):
        return fwd_fn(value, loc, w)

    def f_fwd(value, loc, w):
        return fwd_fn(value, loc, w), (value, loc, w)

    def f_bwd(res, dout):
        value, loc, w = res
        return _msda_bwd(value, spatial_shapes, loc, w, dout, chunk_q,
                         dv_chunk_q, onehot_dtype, bwd_mode)

    f.defvjp(f_fwd, f_bwd)
    return f


def ms_deform_attn(value: jnp.ndarray,
                   spatial_shapes: Sequence[Tuple[int, int]],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray,
                   chunk_q: int = 1024,
                   dv_chunk_q: int = 256,
                   onehot_dtype: str = "float32",
                   custom_vjp: bool = True,
                   gather_mode: str = "quad",
                   bwd_gather_mode: str = "") -> jnp.ndarray:
    """Pure-XLA multi-scale deformable attention core.

    value: (B, sum(H*W), M, D) flattened multi-level features;
    spatial_shapes: static [(H, W), ...] per level;
    sampling_locations: (B, Q, M, L, P, 2) in [0, 1];
    attention_weights: (B, Q, M, L, P), softmaxed over (L, P).
    Returns (B, Q, M*D).

    chunk_q bounds the gather staging temps (the (B, Q*M*P, D) corner
    gathers pad D=32 to 128 lanes, 4x HBM expansion — unchunked encoder
    passes OOM a 16 GB chip at batch 8); dv_chunk_q bounds the one-hot
    dValue matrices in the custom backward; onehot_dtype="bfloat16" halves
    their bandwidth at ~0.5% gradient error.  custom_vjp=False falls back
    to XLA autodiff (the serialized scatter) — kept for parity testing.

    gather_mode="quad" (default) fetches all 4 bilinear corners of a sample
    in ONE gather from pre-concatenated [v, v+1, v+w, v+w+1] rows — TPU
    gathers are row-rate-bound, so this is ~4x fewer serialized rows than
    the per-corner mode ("corner", kept for parity testing).
    gather_mode="mxu" runs the forward through the fused Pallas one-hot
    kernel (ops/msda_mxu.py; measured 269 -> 73 ms per encoder layer on
    v5e) with the same analytic backward (bwd defaults to "quad").
    bwd_gather_mode overrides the row-fetch mode in the custom backward
    only (empty = same as gather_mode): the forward and the dLoc/dW
    regather have different optimal formulations on TPU.
    """
    if not custom_vjp:
        if gather_mode == "mxu":
            from monosowa_tpu.ops.msda_mxu import ms_deform_attn_mxu
            return ms_deform_attn_mxu(value, tuple(tuple(s) for s in
                                                   spatial_shapes),
                                      sampling_locations, attention_weights)
        q = sampling_locations.shape[1]
        quads = (_make_quads(value, spatial_shapes, gather_mode)
                 if gather_mode in ("quad", "onehot") else None)
        odt = jnp.dtype(onehot_dtype)
        if q <= chunk_q:
            return _msda_core(value, spatial_shapes, sampling_locations,
                              attention_weights, quads, gather_mode, odt)
        # remat the chunk body: without it autodiff stacks every chunk's
        # (B, chunk, M, P, D) gather residuals across the map.
        b, _, m, d = value.shape
        locs, wts = _chunk_leading_q(
            (sampling_locations, attention_weights), q, chunk_q)
        core = jax.checkpoint(
            lambda lw: _msda_core(value, spatial_shapes, lw[0], lw[1],
                                  quads, gather_mode, odt))
        out = jax.lax.map(core, (locs, wts))
        qp = locs.shape[0] * chunk_q
        return jnp.moveaxis(out, 0, 1).reshape(b, qp, m * d)[:, :q]
    fn = _make_msda(tuple(tuple(s) for s in spatial_shapes), chunk_q,
                    dv_chunk_q, onehot_dtype, gather_mode, bwd_gather_mode)
    return fn(value, sampling_locations, attention_weights)

"""Pallas TPU kernel for the exact binary two-way TFL evaluator.

Computes, for a batch of posed templates, the two coverage counts of
loss.py:70-75 (template points with a scan neighbor within r; scan points
with a template neighbor within r) in one fused kernel: the (tile_t, S)
distance tile never leaves VMEM, template-side hits reduce inside the tile,
and the per-scan min-distance accumulates in a VMEM scratch across template
tiles.

Replaces the XLA path of ops.tfl.binary_both_way_counts for the fine theta
pass where P x T x S distance matrices dominate HBM traffic; the XLA
implementation remains the parity oracle (tests/test_tfl_pallas.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9


def _kernel(template_ref, scan_x_ref, scan_y_ref, scan_z_ref, mask_ref,
            t_count_ref, s_count_ref, smin_ref, *, radius, t_tiles):
    """Grid (P, t_tiles); template_ref (1, tile_t, 3); scan planes (1, S);
    outputs per pose (1, 1); smin scratch (1, S)."""
    j = pl.program_id(1)
    r2 = radius * radius

    sx = scan_x_ref[0, :]
    sy = scan_y_ref[0, :]
    sz = scan_z_ref[0, :]
    valid = mask_ref[0, :] > 0.5

    tx = template_ref[0, :, 0:1]                # (tile_t, 1)
    ty = template_ref[0, :, 1:2]
    tz = template_ref[0, :, 2:3]

    dx = tx - sx[None, :]
    dy = ty - sy[None, :]
    dz = tz - sz[None, :]
    d2 = dx * dx + dy * dy + dz * dz            # (tile_t, S)
    d2 = jnp.where(valid[None, :], d2, BIG)

    t_hits = jnp.sum((jnp.min(d2, axis=1) < r2).astype(jnp.float32))

    @pl.when(j == 0)
    def _():
        t_count_ref[0, 0] = 0.0
        smin_ref[0, :] = jnp.full_like(smin_ref[0, :], BIG)

    t_count_ref[0, 0] += t_hits
    smin_ref[0, :] = jnp.minimum(smin_ref[0, :], jnp.min(d2, axis=0))

    @pl.when(j == t_tiles - 1)
    def _():
        hits = (smin_ref[0, :] < r2) & valid
        s_count_ref[0, 0] = jnp.sum(hits.astype(jnp.float32))


@partial(jax.jit, static_argnames=("radius", "interpret"))
def binary_both_way_counts_pallas(scan: jnp.ndarray, scan_mask: jnp.ndarray,
                                  templates: jnp.ndarray, radius: float,
                                  interpret: bool = False
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """scan (S, 3); scan_mask (S,); templates (P, T, 3) posed.

    Returns (t_frac, s_frac), each (P,) — same contract as
    ops.tfl.binary_both_way_counts (padded template rows sit at BIG and
    never register hits).
    """
    p, t, _ = templates.shape
    s = scan.shape[0]
    tile_t = min(t, 256)
    t_tiles = pl.cdiv(t, tile_t)
    pad_t = t_tiles * tile_t - t
    if pad_t:
        far = jnp.full((p, pad_t, 3), BIG, templates.dtype)
        templates = jnp.concatenate([templates, far], axis=1)

    t_count, s_count = pl.pallas_call(
        partial(_kernel, radius=radius, t_tiles=t_tiles),
        grid=(p, t_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_t, 3), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((p, 1), jnp.float32),
            jax.ShapeDtypeStruct((p, 1), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((1, s), jnp.float32)],
        interpret=interpret,
    )(templates,
      scan[:, 0][None, :], scan[:, 1][None, :], scan[:, 2][None, :],
      scan_mask.astype(jnp.float32)[None, :])

    n_scan = jnp.maximum(jnp.sum(scan_mask), 1).astype(jnp.float32)
    t_frac = t_count[:, 0] / t
    s_frac = s_count[:, 0] / n_scan
    return t_frac, s_frac


def binary_both_way_loss_pallas(scan, scan_mask, templates, radius,
                                interpret=False):
    t_frac, s_frac = binary_both_way_counts_pallas(scan, scan_mask,
                                                   templates, radius,
                                                   interpret)
    return -(t_frac + s_frac)

"""Template Fitting Loss (TFL) kernels.

The reference's hottest path is the binary two-way TFL evaluated over a
64 000-pose grid per car via faiss IVF range_search
(pseudo_label_generator/3d/scripts/loss.py:70-75, optimizer.py:53-112).

TPU-native design (no faiss): two complementary evaluators.

1. ``binary_both_way_counts`` — exact brute force for a *batch of posed
   templates*: pairwise squared distances ride the MXU (|a|^2+|b|^2-2ab) and
   the two coverage fractions come from masked min-reductions.  Used for the
   fine 360-step theta pass, rescoring, and as the parity oracle in tests.

2. membership fields — for the dense coarse translation x theta grid.  The
   scan is scattered once into a boolean voxel field ("is any scan point
   within ``radius`` of this voxel center"); each template likewise once
   per model in its canonical frame.  A pose evaluation then costs one
   gather per point instead of a T x S distance matrix, turning the
   64k-pose grid into ~2e8 int8 gathers per car, fully vmappable over cars.
   Quantization error is bounded by half a voxel diagonal and only affects
   the coarse argmin, which the exact fine pass re-anchors.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

BIG = 1e9


# ---------------------------------------------------------------------------
# Exact evaluator
# ---------------------------------------------------------------------------

def pairwise_sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., N, K) x (..., M, K) -> (..., N, M) squared Euclidean distances.

    For K <= 4 (3-D point clouds) the cross terms are component-wise outer
    sums on the VPU: a K=3 matmul pads the contraction dim to the 128-wide
    MXU (~40x wasted work) and, with HIGHEST precision, compiles
    pathologically slowly on TPU.  Larger K uses the |a|^2+|b|^2-2ab matmul
    form in full f32.
    """
    k = a.shape[-1]
    if k <= 4:
        d2 = jnp.zeros(a.shape[:-1] + (b.shape[-2],), a.dtype)
        for i in range(k):
            diff = a[..., :, None, i] - b[..., None, :, i]
            d2 = d2 + diff * diff
        return d2
    aa = jnp.sum(a * a, axis=-1)[..., :, None]
    bb = jnp.sum(b * b, axis=-1)[..., None, :]
    ab = jnp.matmul(a, b.swapaxes(-1, -2), precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(aa + bb - 2.0 * ab, 0.0)


def binary_both_way_counts(scan: jnp.ndarray, scan_mask: jnp.ndarray,
                           templates: jnp.ndarray,
                           radius: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact two-way coverage fractions.

    scan: (S, 3) padded, scan_mask: (S,) bool, templates: (..., T, 3) posed.
    Returns (t_frac, s_frac) with shape (...,):
      t_frac = fraction of template points with a scan point within radius,
      s_frac = fraction of valid scan points with a template point within
      radius — the two terms of loss.py:70-75's binary2way loss.
    """
    d2 = pairwise_sq_dists(templates, scan)  # (..., T, S)
    d2 = jnp.where(scan_mask[..., None, :], d2, BIG)
    r2 = radius * radius
    t_hit = jnp.min(d2, axis=-1) < r2                     # (..., T)
    s_hit = (jnp.min(d2, axis=-2) < r2) & scan_mask       # (..., S)
    n_scan = jnp.maximum(jnp.sum(scan_mask, axis=-1), 1)
    t_frac = jnp.mean(t_hit.astype(jnp.float32), axis=-1)
    s_frac = jnp.sum(s_hit.astype(jnp.float32), axis=-1) / n_scan
    return t_frac, s_frac


def binary_both_way_loss(scan, scan_mask, templates, radius) -> jnp.ndarray:
    t_frac, s_frac = binary_both_way_counts(scan, scan_mask, templates, radius)
    return -(t_frac + s_frac)


def chamfer_loss(scan, scan_mask, templates) -> jnp.ndarray:
    """sqrt of (sum NN dist^2 both ways, each normalized) — loss.py:25-34."""
    d2 = pairwise_sq_dists(templates, scan)
    d2s = jnp.where(scan_mask[..., None, :], d2, BIG)
    n_scan = jnp.maximum(jnp.sum(scan_mask, axis=-1), 1)
    t_term = jnp.sum(jnp.min(d2s, axis=-1), axis=-1) / n_scan
    s_term = jnp.sum(jnp.where(scan_mask, jnp.min(d2, axis=-2), 0.0),
                     axis=-1) / templates.shape[-2]
    return jnp.sqrt(t_term + s_term)


def sigmoid_binary_loss(scan, scan_mask, templates, steepness=10.0) -> jnp.ndarray:
    """Differentiable TFL variant ('diffbin', loss.py:77-87)."""
    d = jnp.sqrt(pairwise_sq_dists(templates, scan) + 1e-12)
    d = jnp.where(scan_mask[..., None, :], d, BIG)
    n_scan = jnp.maximum(jnp.sum(scan_mask, axis=-1), 1)
    t_term = jax.nn.sigmoid(steepness * jnp.min(d, axis=-1)) - 0.5
    s_min = jnp.min(d, axis=-2)
    s_term = jnp.where(scan_mask, jax.nn.sigmoid(steepness * s_min) - 0.5, 0.0)
    return (jnp.sum(t_term, -1) / templates.shape[-2]
            + jnp.sum(s_term, -1) / n_scan)


# ---------------------------------------------------------------------------
# Membership fields
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static geometry of a membership voxel field (local coordinates)."""

    origin: Tuple[float, float, float]
    voxel: float
    shape: Tuple[int, int, int]

    @property
    def flat_size(self) -> int:
        x, y, z = self.shape
        return x * y * z


# Field covering the coarse pose grid around a car's median center:
# x: +-(l/2 + |dx|max + r), z: dz in [-1,3] plus reach, y: template half-height.
CAR_FIELD = FieldSpec(origin=(-4.48, -1.28, -3.52), voxel=0.08,
                      shape=(112, 32, 116))
# Canonical-frame template field (x=width, y=height, z=length).
TEMPLATE_FIELD = FieldSpec(origin=(-1.28, -1.28, -2.24), voxel=0.08,
                           shape=(32, 32, 56))


def _neighbor_offsets(radius: float, voxel: float) -> np.ndarray:
    k = int(np.ceil(radius / voxel)) + 1
    r = np.arange(-k, k + 1)
    offs = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    # keep offsets whose voxel could possibly be within radius of the point
    min_d = np.maximum(np.abs(offs) - 1.0, 0.0) * voxel
    keep = (min_d ** 2).sum(-1) <= radius * radius
    return offs[keep].astype(np.int32)


def _ball_kernel(radius: float, voxel: float) -> np.ndarray:
    """Odd-sized (K, K, K) 0/1 mask of voxel offsets whose center-to-center
    distance is within ``radius``."""
    k = int(np.ceil(radius / voxel))
    r = np.arange(-k, k + 1)
    dx, dy, dz = np.meshgrid(r, r, r, indexing="ij")
    d2 = (dx * dx + dy * dy + dz * dz) * voxel * voxel
    return (d2 <= radius * radius).astype(np.float32)


def occupancy_histogram(pts: jnp.ndarray, mask: jnp.ndarray,
                        spec: FieldSpec) -> jnp.ndarray:
    """(N, 3) points -> (X, Y, Z) per-voxel point counts, scatter-free.

    TPU note: XLA lowers scatter to a SERIAL per-update loop on TPU (the
    previous scatter-max field build cost ~3 s per car).  The histogram is
    instead one MXU matmul of per-axis one-hot indicators:
    C[x, (y,z)] = onehot_x (X, N) @ onehot_yz (N, Y*Z).
    """
    sx, sy, sz = spec.shape
    origin = jnp.asarray(spec.origin)
    idx = jnp.floor((pts - origin) / spec.voxel).astype(jnp.int32)   # (N, 3)
    in_b = jnp.all((idx >= 0) & (idx < jnp.asarray(spec.shape)), axis=-1)
    valid = in_b & mask
    ix = jnp.where(valid, idx[:, 0], -1)
    iyz = jnp.where(valid, idx[:, 1] * sz + idx[:, 2], -1)

    ax = (ix[None, :] == jnp.arange(sx)[:, None]).astype(jnp.float32)
    ayz = (iyz[:, None] == jnp.arange(sy * sz)[None, :]).astype(jnp.float32)
    counts = jnp.matmul(ax, ayz, precision=jax.lax.Precision.DEFAULT)
    return counts.reshape(sx, sy, sz)


def build_membership_field(pts: jnp.ndarray, mask: jnp.ndarray,
                           spec: FieldSpec, radius: float) -> jnp.ndarray:
    """int8 field[v] = 1 iff some valid point lies within ~``radius`` of the
    center of voxel v.  pts are in the field's local frame.

    Scatter-free: occupancy histogram (MXU matmul) dilated by the voxel
    ball kernel (conv).  Membership quantizes the point to its voxel
    center, so the test radius carries up to +-voxel*sqrt(3)/2 error on top
    of the query-side quantization of ``sample_membership`` — bounded well
    under the 0.2 m threshold at the default 0.08 m voxel, and the fine
    pass re-scores poses exactly.
    """
    counts = occupancy_histogram(pts, mask, spec)
    kern = _ball_kernel(radius, spec.voxel)
    ksize = kern.shape[0]
    # 3D dilation as ksize 2D convs over (x, z), shifting y
    x, y, z = spec.shape
    half = ksize // 2
    acc = jnp.zeros((x, y, z))
    img = jnp.transpose(counts, (1, 0, 2))[:, None, :, :]   # (Y, 1, X, Z)
    for j in range(ksize):
        dy = j - half
        rolled = jnp.roll(img, -dy, axis=0)
        if dy > 0:
            rolled = rolled.at[y - dy:].set(0.0)
        elif dy < 0:
            rolled = rolled.at[:-dy].set(0.0)
        k2d = jnp.asarray(kern[:, j, :])[None, None]        # (1, 1, K, K)
        out = jax.lax.conv_general_dilated(
            rolled, k2d, window_strides=(1, 1), padding="SAME")
        acc = acc + jnp.transpose(out[:, 0], (1, 0, 2))
    return (acc.reshape(-1) > 0.5).astype(jnp.int8)


def sample_membership(field_flat: jnp.ndarray, spec: FieldSpec,
                      pts: jnp.ndarray) -> jnp.ndarray:
    """Nearest-voxel membership lookup; (..., 3) -> (...,) int8 (0 outside)."""
    origin = jnp.asarray(spec.origin)
    idx = jnp.floor((pts - origin) / spec.voxel).astype(jnp.int32)
    shape = jnp.asarray(spec.shape)
    in_bounds = jnp.all((idx >= 0) & (idx < shape), axis=-1)
    cidx = jnp.clip(idx, 0, shape - 1)
    flat = (cidx[..., 0] * (spec.shape[1] * spec.shape[2])
            + cidx[..., 1] * spec.shape[2] + cidx[..., 2])
    return jnp.where(in_bounds, jnp.take(field_flat, flat, axis=0), 0)


def build_template_field(template_pts: np.ndarray,
                         radius: float,
                         spec: FieldSpec = TEMPLATE_FIELD) -> jnp.ndarray:
    """Precompute (once per template model) the canonical-frame field."""
    pts = jnp.asarray(template_pts)
    mask = jnp.ones(pts.shape[0], bool)
    return build_membership_field(pts, mask, spec, radius)


# ---------------------------------------------------------------------------
# Fused coarse grid evaluation
# ---------------------------------------------------------------------------

def _sample_membership_xyz(field_flat: jnp.ndarray, spec: FieldSpec,
                           x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray
                           ) -> jnp.ndarray:
    """Component-wise membership lookup.

    TPU layout note: coordinates arrive as separate (..., N) planes so every
    tensor's minor dimension is the (128-aligned) point axis — a packed
    (..., N, 3) layout would pad the size-3 minor dim toward the 128-lane
    register width and blow memory/bandwidth ~40x (measured 64x slowdown).
    """
    ox, oy, oz = spec.origin
    inv = 1.0 / spec.voxel
    ix = jnp.floor((x - ox) * inv).astype(jnp.int32)
    iy = jnp.floor((y - oy) * inv).astype(jnp.int32)
    iz = jnp.floor((z - oz) * inv).astype(jnp.int32)
    sx, sy, sz = spec.shape
    inb = ((ix >= 0) & (ix < sx) & (iy >= 0) & (iy < sy)
           & (iz >= 0) & (iz < sz))
    flat = (jnp.clip(ix, 0, sx - 1) * (sy * sz)
            + jnp.clip(iy, 0, sy - 1) * sz + jnp.clip(iz, 0, sz - 1))
    return jnp.where(inb, jnp.take(field_flat, flat, axis=0), 0)


@partial(jax.jit, static_argnames=("radius", "car_spec", "tmpl_spec"))
def grid_pose_losses(scan_local: jnp.ndarray, scan_mask: jnp.ndarray,
                     template: jnp.ndarray, template_field: jnp.ndarray,
                     thetas: jnp.ndarray, trans: jnp.ndarray,
                     radius: float,
                     car_spec: FieldSpec = CAR_FIELD,
                     tmpl_spec: FieldSpec = TEMPLATE_FIELD) -> jnp.ndarray:
    """Approximate binary2way TFL over a (theta x translation) pose grid.

    scan_local: (S, 3) scan points relative to the car center; scan_mask (S,);
    template: (T, 3) canonical; template_field: flat int8 field of the same
    template; thetas: (NT,); trans: (P, 3) translations (dy usually 0).
    Returns losses (NT, P) = -(t_frac + s_frac).

    All per-pose tensors are component-planes (P, N) — see
    ``_sample_membership_xyz`` for why.
    """
    scan_field = build_membership_field(scan_local, scan_mask, car_spec, radius)
    n_scan = jnp.maximum(jnp.sum(scan_mask), 1).astype(jnp.float32)

    px, py, pz = template[:, 0], template[:, 1], template[:, 2]     # (T,)
    sx_, sy_, sz_ = scan_local[:, 0], scan_local[:, 1], scan_local[:, 2]
    tx, ty, tz = trans[:, 0:1], trans[:, 1:2], trans[:, 2:3]        # (P, 1)
    maskf = scan_mask.astype(jnp.float32)

    def per_theta(theta):
        c, s = jnp.cos(theta), jnp.sin(theta)
        # posed template: R_y @ p + t  (rows: x' = c x + s z; z' = -s x + c z)
        rx = c * px + s * pz                                        # (T,)
        rz = -s * px + c * pz
        t_hits = _sample_membership_xyz(
            scan_field, car_spec, rx[None, :] + tx, py[None, :] + ty,
            rz[None, :] + tz)                                       # (P, T)
        t_frac = jnp.mean(t_hits.astype(jnp.float32), axis=-1)
        # scan -> canonical frame: q = R^T (s - t)
        dx = sx_[None, :] - tx                                      # (P, S)
        dz = sz_[None, :] - tz
        qx = c * dx - s * dz
        qz = s * dx + c * dz
        s_hits = _sample_membership_xyz(
            template_field, tmpl_spec, qx, sy_[None, :] - ty, qz)   # (P, S)
        s_frac = jnp.sum(s_hits.astype(jnp.float32) * maskf[None, :],
                         axis=-1) / n_scan
        return -(t_frac + s_frac)

    return jax.lax.map(per_theta, thetas)  # (NT, P)

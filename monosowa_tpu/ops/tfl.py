"""Template Fitting Loss (TFL) kernels.

The reference's hottest path is the binary two-way TFL evaluated over a
64 000-pose grid per car via faiss IVF range_search
(pseudo_label_generator/3d/scripts/loss.py:70-75, optimizer.py:53-112).

TPU-native design (no faiss): two complementary evaluators.

1. ``binary_both_way_counts`` — exact brute force for a *batch of posed
   templates*: pairwise squared distances ride the MXU (|a|^2+|b|^2-2ab) and
   the two coverage fractions come from masked min-reductions.  Used for the
   fine 360-step theta pass, rescoring, and as the parity oracle in tests.

2. membership fields — gather formulation of the dense coarse grid: the
   scan becomes a boolean voxel field and each pose costs one lookup per
   point.  Kept as the readable oracle; XLA serializes TPU gathers
   (~1.3e8 elem/s measured) so it is not the production path.

3. ``grid_pose_losses_conv`` — the MXU formulation (ConvGridSpec below):
   occupancy histograms built by one-hot matmuls and per-theta rotated
   template kernels turn the whole (theta x dx x dz) grid into two
   cross-correlations; 16 cars x 64k poses evaluate in ~90 ms on one v5e
   chip.  Voxel quantization is bounded by one voxel diagonal and the
   exact fine pass re-anchors theta.
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


def binary_one_way_loss(scan, scan_mask, templates, radius) -> jnp.ndarray:
    """'binary1way' (loss.py:62-69): -(template points within radius of the
    scan) / |T| — one directional count only."""
    d2 = pairwise_sq_dists(templates, scan)
    d2 = jnp.where(scan_mask[..., None, :], d2, BIG)
    hits = jnp.sum(jnp.min(d2, axis=-1) < radius * radius, axis=-1)
    return -hits.astype(jnp.float32) / templates.shape[-2]


def chamfer_loss(scan, scan_mask, templates) -> jnp.ndarray:
    """'chamfer' (avg_chamfer_distance, loss.py:24-33):
    sqrt(sum(min d2 scan->temp)/|S| + sum(min d2 temp->scan)/|T|) — each
    direction normalized by ITS OWN cloud size."""
    d2 = pairwise_sq_dists(templates, scan)
    d2s = jnp.where(scan_mask[..., None, :], d2, BIG)
    n_scan = jnp.maximum(jnp.sum(scan_mask, axis=-1), 1)
    t_term = jnp.sum(jnp.min(d2s, axis=-1), axis=-1) / templates.shape[-2]
    s_term = jnp.sum(jnp.where(scan_mask, jnp.min(d2, axis=-2), 0.0),
                     axis=-1) / n_scan
    return jnp.sqrt(t_term + s_term)


def _masked_median(vals, valid) -> jnp.ndarray:
    """Median over the VALID entries only (numpy semantics: mean of the two
    middle order statistics for even counts).  vals (..., N), valid (..., N)
    boolean; invalid entries sort to the end."""
    big = jnp.where(valid, vals, BIG)
    s = jnp.sort(big, axis=-1)
    n = jnp.maximum(jnp.sum(valid, axis=-1), 1)
    lo = (n - 1) // 2
    hi = n // 2
    take = lambda i: jnp.take_along_axis(s, i[..., None], axis=-1)[..., 0]
    return 0.5 * (take(lo) + take(hi))


def median_one_way_loss(scan, scan_mask, templates) -> jnp.ndarray:
    """'med1way' (avg_med_distance_only_temp_to_scan, loss.py:35-42):
    median(min d2 temp->scan) / |T| (yes, a median divided by a count —
    the reference's exact formula)."""
    d2 = pairwise_sq_dists(templates, scan)
    d2 = jnp.where(scan_mask[..., None, :], d2, BIG)
    med = jnp.median(jnp.min(d2, axis=-1), axis=-1)
    return med / templates.shape[-2]


def median_both_loss(scan, scan_mask, templates) -> jnp.ndarray:
    """'medboth' (avg_med_distance, loss.py:13-22):
    sqrt(median(min d2 scan->temp)/|S| + median(min d2 temp->scan)/|T|)."""
    d2 = pairwise_sq_dists(templates, scan)
    d2s = jnp.where(scan_mask[..., None, :], d2, BIG)
    n_scan = jnp.maximum(jnp.sum(scan_mask, axis=-1), 1)
    t_med = jnp.median(jnp.min(d2s, axis=-1), axis=-1)
    s_med = _masked_median(jnp.min(d2, axis=-2),
                           jnp.broadcast_to(scan_mask,
                                            d2.shape[:-2] + scan.shape[:-1]))
    return jnp.sqrt(s_med / n_scan + t_med / templates.shape[-2])


def _trim_mean(vals, valid, proportion_cut_high) -> jnp.ndarray:
    """custom_trim_mean (loss.py:56-60): sort ascending, mean of the first
    int((1 - p) * n) entries; masked entries sort to the end."""
    big = jnp.where(valid, vals, BIG)
    s = jnp.sort(big, axis=-1)
    n_valid = jnp.sum(valid, axis=-1)
    n_use = jnp.maximum((
        (1.0 - proportion_cut_high) * n_valid).astype(jnp.int32), 1)
    idx = jnp.arange(s.shape[-1])
    keep = idx < n_use[..., None]
    return jnp.sum(jnp.where(keep, s, 0.0), axis=-1) / n_use


def trimmed_loss(scan, scan_mask, templates, trim) -> jnp.ndarray:
    """'trimmed' (avg_trim_distance, loss.py:44-54): EUCLIDEAN distances,
    high-trimmed means of both directions, unnormalized sum."""
    d = jnp.sqrt(pairwise_sq_dists(templates, scan) + 1e-12)
    ds = jnp.where(scan_mask[..., None, :], d, BIG)
    t_min = jnp.min(ds, axis=-1)                               # per template
    s_min = jnp.min(d, axis=-2)                                # per scan pt
    t_full = jnp.ones(t_min.shape, bool)
    s_valid = jnp.broadcast_to(scan_mask, s_min.shape)
    return (_trim_mean(s_min, s_valid, trim)
            + _trim_mean(t_min, t_full, trim))


def tfl_loss(scan, scan_mask, templates, kind: str, radius: float = 0.2,
             steepness: float = 10.0, trim: float = 0.2) -> jnp.ndarray:
    """The reference's ``loss_function`` config dispatch (compute_loss,
    loss.py:98-116).  ``kind`` is trace-static."""
    if kind == "binary2way":
        return binary_both_way_loss(scan, scan_mask, templates, radius)
    if kind == "binary1way":
        return binary_one_way_loss(scan, scan_mask, templates, radius)
    if kind == "chamfer":
        return chamfer_loss(scan, scan_mask, templates)
    if kind == "diffbin":
        return sigmoid_binary_loss(scan, scan_mask, templates, steepness)
    if kind == "med1way":
        return median_one_way_loss(scan, scan_mask, templates)
    if kind == "medboth":
        return median_both_loss(scan, scan_mask, templates)
    if kind == "trimmed":
        return trimmed_loss(scan, scan_mask, templates, trim)
    raise ValueError(f"unknown loss_function {kind!r} "
                     "(loss.py:98-116 dispatch)")


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


# ---------------------------------------------------------------------------
# Convolutional coarse-grid evaluation (MXU formulation)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ConvGridSpec:
    """Static geometry tying the translation grid to a voxel lattice.

    The translation steps equal the voxel size AND the grid endpoints are
    integer multiples of it (n_dx/n_dz are auto-bumped by
    ``ConvGridSpec.aligned`` — e.g. the reference's 40-step 4 m range
    becomes 41 steps of 0.10 m), so evaluating the TFL over the whole
    (theta x dx x dz) grid becomes, per theta, one VALID cross-correlation
    between a scan field and a precomputed rotated template kernel — pure
    MXU work, no gathers or scatters (both of which XLA serializes on TPU).
    Voxel-center quantization error is bounded by one voxel diagonal and
    the exact fine pass re-anchors theta.
    """

    @staticmethod
    def aligned(dx_min, dx_max, dz_min, dz_max, n_dx, n_dz, n_theta, radius,
                reach=2.3):
        """Bump the step counts until the endpoints sit on the step lattice
        (finer grid = strict superset quality-wise)."""
        def fix(lo, hi, n):
            for nn in range(n, n + 8):
                h = (hi - lo) / (nn - 1)
                if abs(lo / h - round(lo / h)) < 1e-6:
                    return nn
            return n
        return ConvGridSpec(dx_min=dx_min, dx_max=dx_max, dz_min=dz_min,
                            dz_max=dz_max, n_dx=fix(dx_min, dx_max, n_dx),
                            n_dz=fix(dz_min, dz_max, n_dz),
                            n_theta=n_theta, radius=radius, reach=reach)

    dx_min: float = -2.0
    dx_max: float = 2.0
    dz_min: float = -1.0
    dz_max: float = 3.0
    n_dx: int = 40
    n_dz: int = 40
    n_theta: int = 40
    radius: float = 0.2
    reach: float = 2.3          # template circumradius + radius margin

    @property
    def h(self) -> float:
        return (self.dx_max - self.dx_min) / (self.n_dx - 1)

    @property
    def k_half(self) -> int:
        return int(np.ceil(self.reach / self.h))

    @property
    def k_size(self) -> int:
        return 2 * self.k_half + 1

    @property
    def y_half(self) -> int:
        # template half-height + radius
        return int(np.ceil(1.0 / self.h))

    @property
    def y_size(self) -> int:
        return 2 * self.y_half + 1

    @property
    def x_size(self) -> int:
        return self.n_dx - 1 + self.k_size

    @property
    def z_size(self) -> int:
        return self.n_dz - 1 + self.k_size

    @property
    def origin(self):
        return (self.dx_min - (self.k_half + 0.5) * self.h,
                -(self.y_half + 0.5) * self.h,
                self.dz_min - (self.k_half + 0.5) * self.h)


def conv_translations(spec: "ConvGridSpec") -> np.ndarray:
    """(n_dx * n_dz, 3) translation table in the conv output's x-major
    order."""
    tx = spec.dx_min + np.arange(spec.n_dx) * spec.h
    tz = spec.dz_min + np.arange(spec.n_dz) * spec.h
    gx, gz = np.meshgrid(tx, tz, indexing="ij")
    return np.stack([gx.reshape(-1), np.zeros(gx.size), gz.reshape(-1)],
                    -1).astype(np.float32)


def rotated_template_kernels(template: np.ndarray,
                             spec: ConvGridSpec) -> tuple:
    """Precompute, per theta, the occupancy-count kernel (for the
    template->scan coverage term) and the ball-dilated membership kernel
    (for the scan->template term).  Host-side numpy, once per template.

    Returns (occ (NT, Y, K, K) float32, memb (NT, Y, K, K) float32).
    """
    import scipy.ndimage

    h = spec.h
    k = spec.k_half
    ky = spec.y_half
    ksz, ysz = spec.k_size, spec.y_size
    thetas = np.linspace(0.0, 2 * np.pi - 2 * np.pi / spec.n_theta,
                         spec.n_theta)

    ball = _ball_kernel(spec.radius, h).astype(bool)
    occ_all = np.zeros((spec.n_theta, ysz, ksz, ksz), np.float32)
    memb_all = np.zeros_like(occ_all)
    for ti, th in enumerate(thetas):
        c, s = np.cos(th), np.sin(th)
        rx = c * template[:, 0] + s * template[:, 2]
        rz = -s * template[:, 0] + c * template[:, 2]
        ay = np.floor(template[:, 1] / h + 0.5).astype(int) + ky
        ax = np.floor(rx / h + 0.5).astype(int) + k
        az = np.floor(rz / h + 0.5).astype(int) + k
        ok = ((ay >= 0) & (ay < ysz) & (ax >= 0) & (ax < ksz)
              & (az >= 0) & (az < ksz))
        np.add.at(occ_all[ti], (ay[ok], ax[ok], az[ok]), 1.0)
        memb_all[ti] = scipy.ndimage.binary_dilation(
            occ_all[ti] > 0, structure=np.transpose(ball, (1, 0, 2))
        ).astype(np.float32)
    return occ_all, memb_all


def _conv_fields(scan_local: jnp.ndarray, scan_mask: jnp.ndarray,
                 spec: ConvGridSpec):
    """Scan counts + ball-dilated membership on the conv lattice."""
    fspec = FieldSpec(origin=spec.origin, voxel=spec.h,
                      shape=(spec.x_size, spec.y_size, spec.z_size))
    counts = occupancy_histogram(scan_local, scan_mask, fspec)  # (X, Y, Z)
    kern = _ball_kernel(spec.radius, spec.h)
    ksize = kern.shape[0]
    half = ksize // 2
    x, y, z = fspec.shape
    img = jnp.transpose(counts, (1, 0, 2))[:, None, :, :]       # (Y,1,X,Z)
    acc = jnp.zeros((y, x, z))
    for j in range(ksize):
        dy = j - half
        rolled = jnp.roll(img, -dy, axis=0)
        if dy > 0:
            rolled = rolled.at[y - dy:].set(0.0)
        elif dy < 0:
            rolled = rolled.at[:-dy].set(0.0)
        k2d = jnp.asarray(kern[:, j, :])[None, None]
        out = jax.lax.conv_general_dilated(
            rolled, k2d, window_strides=(1, 1), padding="SAME")
        acc = acc + out[:, 0]
    membership = (acc > 0.5).astype(jnp.float32)                # (Y, X, Z)
    return jnp.transpose(counts, (1, 0, 2)), membership


@partial(jax.jit, static_argnames=("spec", "n_template"))
def grid_pose_losses_conv(scan_local: jnp.ndarray, scan_mask: jnp.ndarray,
                          occ_kernels: jnp.ndarray,
                          memb_kernels: jnp.ndarray,
                          spec: ConvGridSpec,
                          n_template: int) -> jnp.ndarray:
    """binary2way TFL over the full pose grid as two convolutions.

    Returns losses (NT, n_dx * n_dz) matching grid_pose_losses's layout
    (translations ordered x-major to align with fitting._pose_grids).
    """
    counts_yxz, memb_yxz = _conv_fields(scan_local, scan_mask, spec)
    n_scan = jnp.maximum(jnp.sum(scan_mask), 1).astype(jnp.float32)

    def corr(img_yxz, kernels):
        out = jax.lax.conv_general_dilated(
            img_yxz[None],                     # (1, Y, X, Z)
            kernels,                           # (NT, Y, K, K)
            window_strides=(1, 1), padding="VALID",
            preferred_element_type=jnp.float32)
        return out[0]                          # (NT, n_dx, n_dz)

    count_t = corr(memb_yxz, occ_kernels)
    count_s = corr(counts_yxz, memb_kernels)
    t_frac = count_t / n_template
    s_frac = count_s / n_scan
    loss = -(t_frac + s_frac)
    return loss.reshape(loss.shape[0], -1)

"""Grid-search 3D template fitting (the reference's Optimizer, TPU-batched).

Behavioral contract (pseudo_label_generator/3d/scripts/optimizer.py):

* standing car (optimize_coarse:53-93 + optimize_fine:95-112): coarse grid
  over dx in [-2, 2] x dz in [-1, 3] x theta in [0, 2pi) (40 steps each)
  around the scan median, minimizing the binary2way TFL; then a fine pass of
  360 theta steps at the chosen (x, z).
* moving car (optimize_moving:293-345): theta fixed from the trajectory
  median arctan2 (estimate_angle_from_movement_tracked:347-424) when
  available, translation grid with dz shifted +1.
* template posing (get_template:426-488): yaw about camera-y, then translate.

TPU design: one car = one fused pose-grid evaluation using membership fields
(ops/tfl.py) followed by an exact fine pass; cars are vmapped into a padded
batch (arrays-not-objects, SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.ops import tfl
from monosowa_tpu.ops.geometry import masked_median, rot_y


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Grid geometry; defaults = reference configs/config.yaml optimization.*"""

    dx_min: float = -2.0
    dx_max: float = 2.0
    dz_min: float = -1.0
    dz_max: float = 3.0
    n_dx: int = 40
    n_dz: int = 40
    n_theta: int = 40
    n_theta_fine: int = 360
    radius: float = 0.2          # binary_loss_threshold
    moving_dz_shift: float = 1.0  # optimize_moving shifts the z range by +1
    fine_chunk: int = 24          # theta chunking for the exact fine pass
    # the conv-grid coarse loss is a field-quantized approximation; re-score
    # the top-K candidate translations with the EXACT binary loss before the
    # fine pass (0 disables).  Aligns the selected cell with the reference's
    # exact-loss grid argmin (optimizer.py:53-93) at negligible cost vs the
    # fine pass.
    exact_topk: int = 8
    # exact losses are evaluated at each candidate's conv-argmin theta row
    # +- this many rows (the conv kernels are exact per-theta rotations —
    # only the translation axis is voxel-quantized, so theta ranking within
    # a translation is already trustworthy; +-2 rows = +-18 deg at nt=40).
    # The standing-car theta itself always comes from the exact 360-step
    # fine pass.  Set >= n_theta//2 for the full theta set.
    rescore_theta_window: int = 2
    # loss_functions.loss_function dispatch (loss.py:98-116): binary2way
    # (default, conv/MXU path) or binary1way / chamfer / diffbin / med1way /
    # medboth / trimmed — the non-default kinds run an EXACT chunked grid
    # sweep instead of the membership-field conv coarse (which approximates
    # binary2way only)
    loss_function: str = "binary2way"
    sigmoid_steepness: float = 10.0   # loss_functions.sigmoid_steepness
    # loss_functions yaml ships trim_threshold: 0.3 but compute_loss reads
    # the MISSPELLED trim_treshold key (loss.py:100), which is absent ->
    # None -> the shipped 'trimmed' branch crashes; we honor the yaml value
    trim_threshold: float = 0.3
    # pose-chunk size for the exact full-grid sweep of non-default losses
    exact_grid_chunk: int = 16

    def loss_kwargs(self) -> dict:
        return dict(kind=self.loss_function, radius=self.radius,
                    steepness=self.sigmoid_steepness,
                    trim=self.trim_threshold)


class FitResult(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    theta: jnp.ndarray
    loss: jnp.ndarray


def _pose_grids(cfg: FitConfig):
    thetas = np.linspace(0.0, 2 * np.pi - 2 * np.pi / cfg.n_theta,
                         cfg.n_theta, dtype=np.float32)
    dx = np.linspace(cfg.dx_min, cfg.dx_max, cfg.n_dx, dtype=np.float32)
    dz = np.linspace(cfg.dz_min, cfg.dz_max, cfg.n_dz, dtype=np.float32)
    gx, gz = np.meshgrid(dx, dz, indexing="ij")
    trans = np.stack([gx.reshape(-1), np.zeros(gx.size, np.float32),
                      gz.reshape(-1)], -1)
    return jnp.asarray(thetas), jnp.asarray(trans)


def _plateau_theta(thetas: jnp.ndarray, losses: jnp.ndarray) -> jnp.ndarray:
    """Circular centroid of the minimal-loss plateau.

    The binary TFL saturates over a band of thetas (radius-tolerant); plain
    argmin returns the band edge.  The centroid of the tied minimum is a
    strictly better point estimate with the same minimizer set."""
    lmin = jnp.min(losses)
    on = (losses <= lmin + 1e-6).astype(jnp.float32)
    c = jnp.sum(on * jnp.cos(thetas))
    s = jnp.sum(on * jnp.sin(thetas))
    return jnp.mod(jnp.arctan2(s, c), 2 * jnp.pi)


def _fine_thetas(cfg: FitConfig):
    return jnp.asarray(np.linspace(
        0.0, 2 * np.pi - 2 * np.pi / cfg.n_theta_fine, cfg.n_theta_fine,
        dtype=np.float32))


def exact_theta_losses(scan_local: jnp.ndarray, scan_mask: jnp.ndarray,
                       template: jnp.ndarray, trans: jnp.ndarray,
                       thetas: jnp.ndarray, radius: float,
                       chunk: int = 24, loss_kwargs: dict = None
                       ) -> jnp.ndarray:
    """Exact TFL (default binary2way; any loss.py:98-116 kind via
    ``loss_kwargs``) for all thetas at one fixed translation.

    Chunked over theta so the (chunk*T, S) distance matrix stays VMEM-sized.
    """
    kw = loss_kwargs or dict(kind="binary2way", radius=radius)
    n = thetas.shape[0]
    pad = (-n) % chunk
    th = jnp.concatenate([thetas, jnp.zeros(pad, thetas.dtype)])
    th = th.reshape(-1, chunk)

    def per_chunk(th_c):
        rot = rot_y(th_c)                                   # (chunk, 3, 3)
        posed = jnp.einsum("tj,cij->cti", template, rot) + trans
        return tfl.tfl_loss(scan_local, scan_mask, posed, **kw)

    losses = jax.lax.map(per_chunk, th).reshape(-1)
    return losses[:n]


def exact_grid_losses(scan_local, scan_mask, template, trans, thetas,
                      cfg: "FitConfig") -> jnp.ndarray:
    """EXACT loss over the full (theta x translation) pose grid, chunked —
    the coarse pass for non-binary2way loss kinds (the reference evaluates
    its selected loss at every grid pose, optimizer.py:67-84; the conv
    membership fields approximate only binary2way).  Returns (nt, G)."""
    nt, g = thetas.shape[0], trans.shape[0]
    th_rep = jnp.repeat(thetas, g)
    tr_rep = jnp.tile(trans, (nt, 1))
    n = nt * g
    chunk = cfg.exact_grid_chunk
    pad = (-n) % chunk
    th_rep = jnp.concatenate([th_rep, jnp.zeros(pad, th_rep.dtype)])
    tr_rep = jnp.concatenate([tr_rep, jnp.zeros((pad, 3), tr_rep.dtype)])
    kw = cfg.loss_kwargs()

    def per_chunk(args):
        th_c, tr_c = args
        rot = rot_y(th_c)
        posed = jnp.einsum("tj,cij->cti", template, rot) + tr_c[:, None]
        return tfl.tfl_loss(scan_local, scan_mask, posed, **kw)

    losses = jax.lax.map(per_chunk, (th_rep.reshape(-1, chunk),
                                     tr_rep.reshape(-1, chunk, 3)))
    return losses.reshape(-1)[:n].reshape(nt, g)


@partial(jax.jit, static_argnames=("cfg",))
def fit_standing_car(scan_local: jnp.ndarray, scan_mask: jnp.ndarray,
                     template: jnp.ndarray, template_field: jnp.ndarray,
                     cfg: FitConfig = FitConfig()) -> FitResult:
    """Coarse grid (membership fields) + exact fine theta pass.

    scan_local: (S, 3) points relative to the car median center.
    Returns the pose offset relative to the center (x/z are deltas; y = 0).
    """
    thetas, trans = _pose_grids(cfg)
    losses = tfl.grid_pose_losses(scan_local, scan_mask, template,
                                  template_field, thetas, trans, cfg.radius)
    flat = losses.reshape(-1)
    best = jnp.argmin(flat)
    bi_theta = best // trans.shape[0]
    bi_trans = best % trans.shape[0]
    t_best = trans[bi_trans]

    fine = exact_theta_losses(scan_local, scan_mask, template, t_best,
                              _fine_thetas(cfg), cfg.radius, cfg.fine_chunk)
    return FitResult(x=t_best[0], y=jnp.float32(0.0), z=t_best[2],
                     theta=_plateau_theta(_fine_thetas(cfg), fine),
                     loss=jnp.min(fine))


@partial(jax.jit, static_argnames=("cfg",))
def fit_moving_car(scan_local: jnp.ndarray, scan_mask: jnp.ndarray,
                   template: jnp.ndarray, template_field: jnp.ndarray,
                   theta_est: jnp.ndarray, theta_valid: jnp.ndarray,
                   cfg: FitConfig = FitConfig()) -> FitResult:
    """Moving car: translation grid (dz +1 shifted) at fixed trajectory theta;
    if no reliable trajectory angle, falls back to the full theta grid
    (optimize_moving:306-311)."""
    thetas_full, trans = _pose_grids(cfg)
    trans = trans + jnp.array([0.0, 0.0, cfg.moving_dz_shift])

    thetas = jnp.where(theta_valid,
                       jnp.full_like(thetas_full, theta_est),
                       thetas_full)
    losses = tfl.grid_pose_losses(scan_local, scan_mask, template,
                                  template_field, thetas, trans, cfg.radius)
    # when theta is fixed all rows are identical; argmin picks row 0
    flat = losses.reshape(-1)
    best = jnp.argmin(flat)
    bi_theta = best // trans.shape[0]
    bi_trans = best % trans.shape[0]
    return FitResult(x=trans[bi_trans, 0], y=jnp.float32(0.0),
                     z=trans[bi_trans, 2], theta=thetas[bi_theta],
                     loss=flat[best])


@partial(jax.jit, static_argnames=("cfg",))
def fit_loc_only(scan_local: jnp.ndarray, scan_mask: jnp.ndarray,
                 template: jnp.ndarray, theta_est: jnp.ndarray,
                 cfg: FitConfig = FitConfig()) -> FitResult:
    """Translation-only grid at a fixed estimated yaw (optimize_loc_only,
    optimizer.py:114-155): (dx, dz) linspace grid x theta in
    {theta_est, theta_est + pi}, template at its default size, scored with
    the configured loss kind."""
    thetas = jnp.stack([theta_est, theta_est + jnp.pi])
    _, trans = _pose_grids(cfg)
    losses = exact_grid_losses(scan_local, scan_mask, template, trans,
                               thetas, cfg)
    flat = losses.reshape(-1)
    best = jnp.argmin(flat)
    t = trans[best % trans.shape[0]]
    th = thetas[best // trans.shape[0]]
    return FitResult(x=t[0], y=jnp.float32(0.0), z=t[2], theta=th,
                     loss=flat[best])


@partial(jax.jit, static_argnames=("cfg", "spec"))
def fit_cars_robust(batch: CarBatch, template: jnp.ndarray,
                    occ_k: jnp.ndarray, memb_k: jnp.ndarray, spec,
                    cfg: FitConfig, theta_robust: jnp.ndarray,
                    robust_valid: jnp.ndarray) -> "BatchFitResult":
    """The robust_optimization branch (optimize_car_robust,
    optimizer.py:27-44): standing cars with a valid dims-estimator yaw run
    the translation-only grid at that yaw; NaN estimates fall back to the
    standard coarse+fine; moving cars keep optimize_moving.  (The
    estimator's dims themselves are clamped to template dims by the
    reference's ``or True``, dimension_estimator.py:115 — only the yaw and
    location survive.)"""
    base = fit_cars_conv(batch, template, occ_k, memb_k, spec, cfg)

    def one(points, mask, th):
        center = masked_median(points, mask)
        return fit_loc_only(points - center, mask, template, th, cfg), center

    loc, centers = jax.vmap(one)(batch.points, batch.mask, theta_robust)
    use = robust_valid & ~batch.moving & batch.car_valid
    pick = lambda a, b: jnp.where(use, a, b)
    return BatchFitResult(
        x=pick(centers[:, 0] + loc.x, base.x),
        y=pick(centers[:, 1], base.y),
        z=pick(centers[:, 2] + loc.z, base.z),
        theta=pick(loc.theta, base.theta),
        loss=pick(loc.loss, base.loss),
        center=jnp.where(use[:, None], centers, base.center))


def estimate_angle_from_track(locations: np.ndarray, valid: np.ndarray,
                              ref_idx: int, min_dist: float = 3.0,
                              kitti_convention: bool = True) -> Optional[float]:
    """Trajectory yaw estimate (optimizer.py:347-424): median arctan2 of
    displacements from the reference frame to up to 5 sufficiently-distant
    neighbours on each side; odd-length median; mapped into the fitting
    frame with theta = -angle + pi/2 for camera-frame datasets.

    locations: (F, 3) per-frame car centers (camera coords), valid: (F,) bool.
    Returns None when fewer than 3 usable displacement angles exist.
    """
    if valid.sum() < 3 or not valid[ref_idx]:
        return None
    ref = locations[ref_idx]
    angles = []

    def scan(indices):
        count = 0
        for i in indices:
            if count >= 5:
                break
            if not valid[i]:
                continue
            d = np.hypot(locations[i][0] - ref[0], locations[i][2] - ref[2])
            if d > min_dist:
                if i < ref_idx:
                    a = np.arctan2(ref[2] - locations[i][2],
                                   ref[0] - locations[i][0])
                else:
                    a = np.arctan2(locations[i][2] - ref[2],
                                   locations[i][0] - ref[0])
                angles.append(a)
                count += 1

    scan(range(ref_idx - 1, -1, -1))
    scan(range(ref_idx + 1, len(locations)))
    if len(angles) < 3:
        return None
    if len(angles) % 2 == 0:
        angles.append(angles[-1])
    pred = float(np.median(np.array(angles)))
    if pred > np.pi:
        pred -= 2 * np.pi
    if kitti_convention:
        pred = -pred + np.pi / 2
    return pred


# ---------------------------------------------------------------------------
# Batched car fitting
# ---------------------------------------------------------------------------

class CarBatch(NamedTuple):
    """Padded SoA batch of car point clouds ready for fitting.

    points: (B, S, 3) camera-frame aggregated points; mask: (B, S);
    moving: (B,) bool; theta_est/theta_valid: (B,) trajectory angles;
    car_valid: (B,) bool.
    """

    points: jnp.ndarray
    mask: jnp.ndarray
    moving: jnp.ndarray
    theta_est: jnp.ndarray
    theta_valid: jnp.ndarray
    car_valid: jnp.ndarray


class BatchFitResult(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    theta: jnp.ndarray
    loss: jnp.ndarray
    center: jnp.ndarray  # (B, 3) medians the offsets are relative to


@partial(jax.jit, static_argnames=("cfg",))
def fit_cars(batch: CarBatch, template: jnp.ndarray,
             template_field: jnp.ndarray,
             cfg: FitConfig = FitConfig()) -> BatchFitResult:
    """Fit every car in a padded batch: one vmap, no python per-car loop.

    Both standing and moving paths are evaluated through the same grid
    kernel (they differ only in theta set and dz shift), selected per car
    with jnp.where — no data-dependent control flow under jit.
    """

    def fit_one(points, mask, moving, theta_est, theta_valid):
        center = masked_median(points, mask)
        local = points - center
        standing = fit_standing_car(local, mask, template, template_field, cfg)
        mov = fit_moving_car(local, mask, template, template_field,
                             theta_est, theta_valid, cfg)
        pick = lambda a, b: jnp.where(moving, b, a)
        return (pick(standing.x, mov.x), pick(standing.z, mov.z),
                pick(standing.theta, mov.theta), pick(standing.loss, mov.loss),
                center)

    xs, zs, thetas, losses, centers = jax.vmap(fit_one)(
        batch.points, batch.mask, batch.moving, batch.theta_est,
        batch.theta_valid)
    return BatchFitResult(
        x=centers[:, 0] + xs, y=centers[:, 1],
        z=centers[:, 2] + zs, theta=thetas, loss=losses, center=centers)


# ---------------------------------------------------------------------------
# Convolutional (MXU) fitting path
# ---------------------------------------------------------------------------

def make_conv_kernels(template: np.ndarray, cfg: FitConfig = FitConfig()):
    """Precompute the per-theta rotated template kernels (host, once).

    Returns (spec, occ_kernels, memb_kernels) for grid_pose_losses_conv.
    """
    spec = tfl.ConvGridSpec.aligned(
        cfg.dx_min, cfg.dx_max, cfg.dz_min, cfg.dz_max,
        cfg.n_dx, cfg.n_dz, cfg.n_theta, cfg.radius)
    occ, memb = tfl.rotated_template_kernels(np.asarray(template), spec)
    return spec, jnp.asarray(occ), jnp.asarray(memb)


def _coarse_thetas(nt: int) -> jnp.ndarray:
    return jnp.asarray(np.linspace(0.0, 2 * np.pi - 2 * np.pi / nt, nt,
                                   dtype=np.float32))


def _exact_losses_at(scan_local, scan_mask, template, trans_set, theta_set,
                     radius):
    """Exact binary2way TFL over an explicit pose set in ONE dispatch.

    trans_set (N, 3); theta_set (N, Wn) per-translation thetas ->
    (N, Wn).  The pose count here is small (top-K x theta window), so the
    whole set is one fused distance sweep instead of a serialized
    lax.map per translation."""
    n, wn = theta_set.shape
    rot = rot_y(theta_set.reshape(-1))                  # (N*Wn, 3, 3)
    posed = jnp.einsum("tj,cij->cti", template, rot) \
        + jnp.repeat(trans_set, wn, axis=0)[:, None]
    losses = tfl.binary_both_way_loss(scan_local, scan_mask, posed, radius)
    return losses.reshape(n, wn)


def _exact_rescore_translations(scan_local, scan_mask, template, losses,
                                trans, thetas, cfg: FitConfig, pitch):
    """Pick the best translation by EXACT binary loss among the conv grid's
    top-K candidates, then refine at half-pitch around the winner — the conv
    lattice is voxel-aligned, so sub-cell refinement recovers the accuracy
    of the reference's continuous linspace grid (optimizer.py:71-75) and
    better.

    ``losses`` (nt, G) are the conv losses with fixed-theta row masking
    already applied; ``thetas`` (nt,) are the PER-ROW theta values (a
    broadcast constant for moving cars with a trajectory angle).  Exact
    losses are evaluated in a +-rescore_theta_window row window around each
    candidate's conv-argmin row (see FitConfig).

    Returns (t_best (3,), theta_best (), loss_best ())."""
    nt = losses.shape[0]
    per_trans = jnp.min(losses, axis=0)                 # (G,)
    k = min(cfg.exact_topk, per_trans.shape[0])
    _, cand = jax.lax.top_k(-per_trans, k)
    cand_trans = trans[cand]                            # (K, 3)
    cand_row = jnp.argmin(losses[:, cand], axis=0)      # (K,)
    w = min(cfg.rescore_theta_window, (nt - 1) // 2)
    win = jnp.arange(-w, w + 1)
    rows = (cand_row[:, None] + win) % nt               # (K, Wn)
    cand_losses = _exact_losses_at(scan_local, scan_mask, template,
                                   cand_trans, thetas[rows], cfg.radius)
    ci = jnp.argmin(jnp.min(cand_losses, axis=1))
    t0 = cand_trans[ci]
    row0 = rows[ci, jnp.argmin(cand_losses[ci])]

    # 3x3 half-pitch refinement: the +-1-pitch lattice neighbours are
    # already ranked by the conv top-K above; only sub-cell offsets add
    # information beyond it.
    px, pz = pitch
    offs = np.array([-0.5, 0.0, 0.5], np.float32)
    gx, gz = np.meshgrid(offs * px, offs * pz, indexing="ij")
    ref_offs = jnp.asarray(np.stack(
        [gx.reshape(-1), np.zeros(gx.size, np.float32), gz.reshape(-1)], -1))
    ref_trans = t0 + ref_offs                           # (9, 3)
    rrows = jnp.broadcast_to((row0 + win) % nt,
                             (ref_trans.shape[0], win.shape[0]))
    ref_losses = _exact_losses_at(scan_local, scan_mask, template,
                                  ref_trans, thetas[rrows], cfg.radius)
    ri = jnp.argmin(jnp.min(ref_losses, axis=1))
    wi = jnp.argmin(ref_losses[ri])
    return ref_trans[ri], thetas[rrows[ri, wi]], jnp.min(ref_losses)


def _fit_one_conv(scan_local, scan_mask, moving, theta_est, theta_valid,
                  template, occ_k, memb_k, spec, cfg: FitConfig):
    """Shared per-car conv fit: standing and moving evaluated through ONE
    grid pass + ONE rescore (the two reference paths, optimize_coarse:53-93
    and optimize_moving:293-345, differ only in a -moving_dz_shift scan
    shift and the theta policy — merged branchlessly with jnp.where so the
    batched path does half the work of running both).

    Returns (x, z, theta, loss) as pose offsets in the local frame."""
    shift = jnp.where(moving, cfg.moving_dz_shift, 0.0)
    local_eff = scan_local - jnp.stack(
        [jnp.float32(0.0), jnp.float32(0.0), shift])

    if cfg.loss_function != "binary2way":
        # non-default loss kinds (loss.py:98-116): exact sweep over the
        # reference's continuous linspace grid — the conv membership
        # fields approximate binary2way only, and the reference evaluates
        # its selected loss at every grid pose (optimizer.py:67-84)
        thetas_c, trans_ref = _pose_grids(cfg)
        nt = thetas_c.shape[0]
        fixed = moving & theta_valid
        row = jnp.round(theta_est / (2 * jnp.pi / nt)).astype(jnp.int32) % nt
        # the reference's optimize_moving evaluates the loss exactly at
        # estimated_angle (opt_param3_range=[estimated_angle]) — substitute
        # theta_est into the selected row so the masked sweep scores the
        # translation grid at the exact angle, not the nearest lattice theta
        thetas_c = jnp.where((jnp.arange(nt) == row) & fixed,
                             theta_est, thetas_c)
        losses = exact_grid_losses(local_eff, scan_mask, template,
                                   trans_ref, thetas_c, cfg)
        row_mask = (jnp.arange(nt) == row) | ~fixed
        masked = jnp.where(row_mask[:, None], losses, jnp.inf)
        th_set = jnp.where(fixed, jnp.broadcast_to(theta_est, thetas_c.shape),
                           thetas_c)
        flat = masked.reshape(-1)
        best = jnp.argmin(flat)
        t_best = trans_ref[best % trans_ref.shape[0]]
        th_best = th_set[best // trans_ref.shape[0]]
        loss_best = flat[best]
        fine = exact_theta_losses(local_eff, scan_mask, template, t_best,
                                  _fine_thetas(cfg), cfg.radius,
                                  cfg.fine_chunk, cfg.loss_kwargs())
        theta = jnp.where(moving, th_best,
                          _plateau_theta(_fine_thetas(cfg), fine))
        loss = jnp.where(moving, loss_best, jnp.min(fine))
        return t_best[0], t_best[2] + shift, theta, loss

    trans = jnp.asarray(tfl.conv_translations(spec))
    losses = tfl.grid_pose_losses_conv(local_eff, scan_mask, occ_k, memb_k,
                                       spec, template.shape[0])
    nt = losses.shape[0]
    thetas_grid = _coarse_thetas(nt)
    # with a reliable trajectory angle only the nearest-theta kernel row
    # competes and the output theta is the exact trajectory estimate
    fixed = moving & theta_valid
    row = jnp.round(theta_est / (2 * jnp.pi / nt)).astype(jnp.int32) % nt
    row_mask = (jnp.arange(nt) == row) | ~fixed
    masked = jnp.where(row_mask[:, None], losses, jnp.inf)
    th_set = jnp.where(fixed,
                       jnp.broadcast_to(theta_est, thetas_grid.shape),
                       thetas_grid)
    if cfg.exact_topk > 0:
        pitch = ((spec.dx_max - spec.dx_min) / (spec.n_dx - 1),
                 (spec.dz_max - spec.dz_min) / (spec.n_dz - 1))
        t_best, th_best, loss_best = _exact_rescore_translations(
            local_eff, scan_mask, template, masked, trans, th_set, cfg,
            pitch)
    else:
        flat = masked.reshape(-1)
        best = jnp.argmin(flat)
        t_best = trans[best % trans.shape[0]]
        th_best = th_set[best // trans.shape[0]]
        loss_best = flat[best]

    fine = exact_theta_losses(local_eff, scan_mask, template, t_best,
                              _fine_thetas(cfg), cfg.radius, cfg.fine_chunk)
    theta = jnp.where(moving, th_best,
                      _plateau_theta(_fine_thetas(cfg), fine))
    loss = jnp.where(moving, loss_best, jnp.min(fine))
    return t_best[0], t_best[2] + shift, theta, loss


@partial(jax.jit, static_argnames=("cfg", "spec"))
def fit_standing_car_conv(scan_local: jnp.ndarray, scan_mask: jnp.ndarray,
                          template: jnp.ndarray, occ_k: jnp.ndarray,
                          memb_k: jnp.ndarray, spec,
                          cfg: FitConfig = FitConfig()) -> FitResult:
    """Coarse grid via the conv kernels + exact fine theta pass."""
    x, z, theta, loss = _fit_one_conv(
        scan_local, scan_mask, jnp.asarray(False), jnp.float32(0.0),
        jnp.asarray(False), template, occ_k, memb_k, spec, cfg)
    return FitResult(x=x, y=jnp.float32(0.0), z=z, theta=theta, loss=loss)


@partial(jax.jit, static_argnames=("cfg", "spec"))
def fit_moving_car_conv(scan_local: jnp.ndarray, scan_mask: jnp.ndarray,
                        template: jnp.ndarray, occ_k: jnp.ndarray,
                        memb_k: jnp.ndarray, spec,
                        theta_est: jnp.ndarray, theta_valid: jnp.ndarray,
                        cfg: FitConfig = FitConfig()) -> FitResult:
    """Moving car on the conv grid: the scan shifts by -moving_dz_shift so
    the shifted translation range stays lattice-aligned (optimize_moving
    semantics: theta fixed from the trajectory when available, translation
    searched)."""
    x, z, theta, loss = _fit_one_conv(
        scan_local, scan_mask, jnp.asarray(True), theta_est, theta_valid,
        template, occ_k, memb_k, spec, cfg)
    return FitResult(x=x, y=jnp.float32(0.0), z=z, theta=theta, loss=loss)


@partial(jax.jit, static_argnames=("cfg", "spec"))
def fit_cars_conv(batch: CarBatch, template: jnp.ndarray,
                  occ_k: jnp.ndarray, memb_k: jnp.ndarray, spec,
                  cfg: FitConfig = FitConfig()) -> BatchFitResult:
    """Conv-path equivalent of fit_cars (one vmap over the padded batch)."""

    def fit_one(points, mask, moving, theta_est, theta_valid):
        center = masked_median(points, mask)
        local = points - center
        x, z, theta, loss = _fit_one_conv(
            local, mask, moving, theta_est, theta_valid,
            template, occ_k, memb_k, spec, cfg)
        return x, z, theta, loss, center

    xs, zs, thetas, losses, centers = jax.vmap(fit_one)(
        batch.points, batch.mask, batch.moving, batch.theta_est,
        batch.theta_valid)
    return BatchFitResult(
        x=centers[:, 0] + xs, y=centers[:, 1],
        z=centers[:, 2] + zs, theta=thetas, loss=losses, center=centers)

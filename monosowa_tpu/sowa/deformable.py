"""Deformable mesh refinement (optax batched fit).

Behavioral contract (pseudo_label_generator/3d/scripts/deformable_mesh.py):

* ``deformable_mesh_fit_lim_dof_batch`` (:330-517): batched AdamW fit (1000
  iterations) of a car mesh to each standing car's aggregated points over
  per-vertex y-offsets + 7 global DoF (xyz translation, 3 axis scales, yaw
  delta), dims clipped to [0.6, 1.25] x template;
* losses (:519-817), implemented REFERENCE-EXACT and differentially tested
  against the reference's own functions (tests/test_deformable_reference_parity.py):
  - ``tfl_knn_ref``    = tfl_knn_batch (:769-781): K=10 kNN scan->mesh on
    SQUARED distances, sigmoid(10 d^2)-0.5, validity-weighted;
  - ``tfl_new_ref``    = tfl_new_batch (:783-812): yaw-aligned two-plane
    projections, K=10 mean squared distances mesh->scan, summed;
  - ``edge_loss_ref``  = mesh_edge_loss_v2_batch (:566-612): per-coordinate
    abs-deviation norm + |edge length - mean| about per-mesh means, 1/E
    weighting;
  - ``symmetry_ref``   = symmetry_loss (:814-817): L1 on the Y coordinate
    between each vertex and its Hungarian-matched mirror partner;
  - ``laplacian_ref``  = pytorch3d mesh_laplacian_smoothing(method=
    "uniform"): mean over vertices of || mean(neighbors) - v ||.
  Weights and schedule follow the driver (:417-483): w_chamfer 5, w_edge 1,
  w_laplacian 10, w_symmetry 1, w_tfl_new 2.5; AdamW lr 0.025, 1000 iters;
  scales frozen for the first 100 iterations, per-vertex y-offsets (x10)
  released at iteration 250; scale/dim clipping applied only to the final
  result, not inside the loop.

Documented deviation: the reference re-samples 10 000 random surface points
from the mesh every iteration (sample_points_from_meshes) as its "mesh
point set"; the jitted fit uses the deterministic vertex set instead, which
keeps the loop stochastic-free and XLA-compilable.

The mesh is procedural (same parametric car surface as sowa.templates) —
the reference loads fiat_deformed2.obj; any (verts, faces) pair works.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from monosowa_tpu.ops.tfl import pairwise_sq_dists
from monosowa_tpu.sowa.templates import (_car_profile_height, _PROFILES,
                                         TEMPLATE_H, TEMPLATE_L, TEMPLATE_W)


def make_car_mesh(nu: int = 24, nv: int = 12, profile_idx: int = 0
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Procedural closed-ish car surface mesh: (V, 3) verts, (F, 3) faces.

    A parametric grid wraps the car cross-section: for each z-slice the
    cross-section is a rounded rectangle whose height follows the cabin
    profile.  Axes match templates.py (x=width, y=height-down, z=length).
    """
    profile = _PROFILES[profile_idx]
    zs = np.linspace(-0.5, 0.5, nu)
    heights = _car_profile_height(zs, profile)

    verts = []
    for zi, z in enumerate(zs):
        h = heights[zi]
        for k in range(nv):
            t = k / nv * 2 * np.pi
            # superellipse cross-section: rounded box
            cx = 0.5 * np.sign(np.cos(t)) * np.abs(np.cos(t)) ** 0.5
            cy = np.sign(np.sin(t)) * np.abs(np.sin(t)) ** 0.5
            y = (cy * 0.5 + 0.5) * h       # 0..h
            verts.append([cx, y, z])
    verts = np.asarray(verts, np.float64)

    faces = []
    for zi in range(nu - 1):
        for k in range(nv):
            a = zi * nv + k
            b = zi * nv + (k + 1) % nv
            c = (zi + 1) * nv + k
            d = (zi + 1) * nv + (k + 1) % nv
            faces.append([a, b, c])
            faces.append([b, d, c])
    faces = np.asarray(faces, np.int32)

    # normalize to template dims, center, flip y down (camera frame)
    for axis, target in ((0, TEMPLATE_W), (1, TEMPLATE_H), (2, TEMPLATE_L)):
        lo, hi = verts[:, axis].min(), verts[:, axis].max()
        verts[:, axis] = ((verts[:, axis] - lo) / max(hi - lo, 1e-9)
                          - 0.5) * target
    verts[:, 1] *= -1.0
    return verts.astype(np.float32), faces


def load_car_mesh_obj(path: str, target_dims_whl=None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Load a reference deformed car mesh (data/*_deformed*.obj — the
    meshes the reference's pytorch3d load_objs_as_meshes consumes,
    loader.py:3541-3543): already centered in the fitting frame at
    near-template scale.  ``target_dims_whl`` optionally rescales extents
    to exact (w, h, l)."""
    from monosowa_tpu.sowa.mesh_io import load_obj

    v, f = load_obj(path)
    v = v - (v.min(0) + v.max(0)) / 2.0
    if target_dims_whl is not None:
        v = v * (np.asarray(target_dims_whl, np.float64)
                 / np.maximum(np.ptp(v, axis=0), 1e-9))
    return v.astype(np.float32), f.astype(np.int32)


def mesh_edges(faces: np.ndarray) -> np.ndarray:
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                        faces[:, [2, 0]]], 0)
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0)


def vertex_adjacency(faces: np.ndarray, n_verts: int,
                     max_degree: int = 12) -> np.ndarray:
    """(V, max_degree) neighbor indices padded with self (for the uniform
    laplacian)."""
    adj = [[] for _ in range(n_verts)]
    for a, b in mesh_edges(faces):
        adj[a].append(b)
        adj[b].append(a)
    out = np.zeros((n_verts, max_degree), np.int32)
    for v in range(n_verts):
        nb = adj[v][:max_degree]
        out[v, :len(nb)] = nb
        out[v, len(nb):] = v
    return out


def vertex_degrees(faces: np.ndarray, n_verts: int) -> np.ndarray:
    """(V,) true neighbor counts (for the exact uniform laplacian — the
    self-padded rows of ``vertex_adjacency`` must not dilute the mean)."""
    deg = np.zeros(n_verts, np.int32)
    for a, b in mesh_edges(faces):
        deg[a] += 1
        deg[b] += 1
    return deg


# ---------------------------------------------------------------------------
# Reference-exact loss terms (deformable_mesh.py:519-817)
# ---------------------------------------------------------------------------

def _knn_sq_dists(a: jnp.ndarray, b: jnp.ndarray, k: int) -> jnp.ndarray:
    """(..., Na, k) smallest SQUARED distances from each a-point to b
    (pytorch3d ``knn_points().dists`` contract: squared, ascending)."""
    d2 = pairwise_sq_dists(a, b)
    return -jax.lax.top_k(-d2, k)[0]


def tfl_knn_ref(scan: jnp.ndarray, mesh_pts: jnp.ndarray,
                weights: jnp.ndarray, k: int = 10,
                steepness: float = 10.0) -> jnp.ndarray:
    """tfl_knn_batch (:769-781): scan->mesh K-NN on squared distances,
    sigmoid(steepness * d^2) - 0.5, per-point validity weights."""
    nn = jax.vmap(lambda a, b: _knn_sq_dists(a, b, k))(scan, mesh_pts)
    s = jax.nn.sigmoid(steepness * nn) - 0.5            # (B, S, k)
    per_pt = jnp.mean(s, axis=2) * weights
    return jnp.mean(jnp.mean(per_pt, axis=1))


def tfl_new_ref(scan: jnp.ndarray, mesh_pts: jnp.ndarray,
                thetas: jnp.ndarray, k: int = 10) -> jnp.ndarray:
    """tfl_new_batch (:783-812): project both clouds onto the yaw-aligned
    horizontal axes paired with y; mesh->scan K-NN mean squared distance in
    each plane, summed."""
    c, s = jnp.cos(thetas), jnp.sin(thetas)
    zeros = jnp.zeros_like(thetas)
    loss = 0.0
    for e in (jnp.stack([c, zeros, s], 1), jnp.stack([-s, zeros, c], 1)):
        scan_p = jnp.stack([jnp.einsum("bsd,bd->bs", scan, e),
                            scan[:, :, 1]], 2)
        mesh_p = jnp.stack([jnp.einsum("bmd,bd->bm", mesh_pts, e),
                            mesh_pts[:, :, 1]], 2)
        nn = jax.vmap(lambda a, b: _knn_sq_dists(a, b, k))(mesh_p, scan_p)
        loss = loss + jnp.mean(nn, axis=2)              # (B, M)
    return jnp.mean(jnp.mean(loss, axis=1))


def edge_loss_ref(verts_b: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """mesh_edge_loss_v2_batch (:566-612) for shared-topology meshes."""
    diffs = verts_b[:, edges[:, 0]] - verts_b[:, edges[:, 1]]   # (B, E, 3)
    da = jnp.abs(diffs)
    shifted = da - jnp.mean(da, axis=1, keepdims=True)
    loss = jnp.linalg.norm(shifted, axis=2)
    norms = jnp.linalg.norm(diffs, axis=2)
    loss = loss + jnp.abs(norms - jnp.mean(norms, axis=1, keepdims=True))
    return jnp.mean(loss)   # == sum * (1/E) / B


def symmetry_ref(verts_b: jnp.ndarray, mirror_idx: jnp.ndarray
                 ) -> jnp.ndarray:
    """symmetry_loss (:814-817): L1 between each vertex's Y and its
    mirror partner's Y (partner indices from a Hungarian match of the
    template against its x-mirrored self, :399-405)."""
    return jnp.mean(jnp.abs(verts_b[:, :, 1]
                            - verts_b[:, mirror_idx, 1]))


def laplacian_ref(verts_b: jnp.ndarray, adj: jnp.ndarray,
                  degree: jnp.ndarray) -> jnp.ndarray:
    """pytorch3d mesh_laplacian_smoothing(method="uniform"): per vertex
    || mean(true neighbors) - v ||, averaged.  ``adj`` is self-padded, so
    the pad contribution (max_degree - degree) * v is subtracted."""
    d = degree.astype(verts_b.dtype)[None, :, None]
    pad = adj.shape[1] - degree.astype(verts_b.dtype)
    nbr_sum = jnp.sum(verts_b[:, adj], axis=2)          # (B, V, 3)
    true_mean = (nbr_sum - pad[None, :, None] * verts_b) / jnp.maximum(d, 1)
    return jnp.mean(jnp.linalg.norm(true_mean - verts_b, axis=-1))


@dataclasses.dataclass(frozen=True)
class DeformConfig:
    """Reference driver constants (deformable_mesh.py:414-421, 409, 455-474)."""
    iterations: int = 1000
    lr: float = 0.025                 # AdamW lr (:409)
    weight_decay: float = 0.01        # torch AdamW default
    steepness: float = 10.0
    knn_k: int = 10
    w_chamfer: float = 5.0            # w_chamfer (:417)
    w_tfl: float = 2.5                # w_tfl_new (:421)
    w_edge: float = 1.0               # w_edge (:418)
    w_laplacian: float = 10.0         # w_laplacian (:419)
    w_symmetry: float = 1.0           # w_symmetry (:420)
    scale_release_iter: int = 100     # scales active when i > 100 (:455)
    yoff_release_iter: int = 250      # y-offsets active when i >= 250 (:461)
    yoff_gain: float = 10.0           # off * 10 (:463)
    scale_min: float = 0.6            # final dim clip (:508-510)
    scale_max: float = 1.25


class DeformResult(NamedTuple):
    verts: jnp.ndarray       # (B, V, 3) fitted world-frame vertices
    translation: jnp.ndarray  # (B, 3)
    scales: jnp.ndarray       # (B, 3)
    dtheta: jnp.ndarray       # (B,)
    loss: jnp.ndarray         # (B,)


def _apply_dof(verts0, y_offsets, dof2, center, theta0, it, cfg):
    """verts0 (V, 3); y_offsets (V,); dof2 = [dx,dy,dz, sx,sy,sz, dtheta]
    (reference ``deform_verts2``, init [0,0,0,1,1,1,0]); pose deltas are
    relative to the grid-fit (center, theta0).

    Reference staging (:455-463): scales act only after iteration 100;
    per-vertex y-offsets (x10) only from iteration 250.  The y-offset is
    added post-rotation in the reference (world frame) — equal to a
    canonical-frame add since yaw rotations leave y invariant.
    """
    scales = jnp.where(it > cfg.scale_release_iter, dof2[3:6],
                       jnp.ones(3, verts0.dtype))
    v = verts0 * scales
    theta = theta0 + dof2[6]
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    v = v @ rot.T + center + dof2[:3]
    y_gate = jnp.where(it >= cfg.yoff_release_iter, cfg.yoff_gain, 0.0)
    return v.at[:, 1].add(y_gate * y_offsets)


def _losses_batch(vb, scans, weights, thetas_total, edges, adj, degree,
                  mirror_idx, cfg):
    """Per-car decomposition of the reference total (:472-478); the batch
    mean of the returned vector equals the reference scalar loss."""
    nn = jax.vmap(lambda a, b: _knn_sq_dists(a, b, cfg.knn_k))(scans, vb)
    s = jax.nn.sigmoid(cfg.steepness * nn) - 0.5
    chamfer = jnp.mean(jnp.mean(s, 2) * weights, 1)           # (B,)

    c, sn = jnp.cos(-thetas_total), jnp.sin(-thetas_total)
    zeros = jnp.zeros_like(thetas_total)
    tfl = 0.0
    for e in (jnp.stack([c, zeros, sn], 1),
              jnp.stack([-sn, zeros, c], 1)):
        scan_p = jnp.stack([jnp.einsum("bsd,bd->bs", scans, e),
                            scans[:, :, 1]], 2)
        mesh_p = jnp.stack([jnp.einsum("bmd,bd->bm", vb, e),
                            vb[:, :, 1]], 2)
        nn2 = jax.vmap(lambda a, b: _knn_sq_dists(a, b, cfg.knn_k))(
            mesh_p, scan_p)
        tfl = tfl + jnp.mean(nn2, axis=2)
    tfl = jnp.mean(tfl, axis=1)                               # (B,)

    diffs = vb[:, edges[:, 0]] - vb[:, edges[:, 1]]
    da = jnp.abs(diffs)
    shifted = da - jnp.mean(da, axis=1, keepdims=True)
    el = jnp.linalg.norm(shifted, axis=2)
    norms = jnp.linalg.norm(diffs, axis=2)
    el = el + jnp.abs(norms - jnp.mean(norms, axis=1, keepdims=True))
    edge = jnp.mean(el, axis=1)                               # (B,)

    sym = jnp.mean(jnp.abs(vb[:, :, 1] - vb[:, mirror_idx, 1]), axis=1)

    d = jnp.maximum(degree.astype(vb.dtype), 1)[None, :, None]
    pad = adj.shape[1] - degree.astype(vb.dtype)
    nbr_sum = jnp.sum(vb[:, adj], axis=2)
    true_mean = (nbr_sum - pad[None, :, None] * vb) / d
    lap = jnp.mean(jnp.linalg.norm(true_mean - vb, axis=-1), axis=1)

    return (cfg.w_chamfer * chamfer + cfg.w_tfl * tfl + cfg.w_edge * edge
            + cfg.w_laplacian * lap + cfg.w_symmetry * sym)


@partial(jax.jit, static_argnames=("cfg",))
def fit_deformable_batch(verts0: jnp.ndarray, edges: jnp.ndarray,
                         adj: jnp.ndarray, mirror_idx: jnp.ndarray,
                         scans: jnp.ndarray, scan_masks: jnp.ndarray,
                         centers: jnp.ndarray, thetas: jnp.ndarray,
                         cfg: DeformConfig = DeformConfig(),
                         init_dims: jnp.ndarray = None) -> DeformResult:
    """Batched mesh fit (deformable_mesh_fit_lim_dof_batch :330-517).

    verts0 (V, 3) canonical mesh; scans (B, S, 3) camera-frame points,
    zero-padded like the reference (:355-358) with ``scan_masks`` marking
    real rows (they become the tfl_knn validity weights; tfl_new runs
    unmasked, as in the reference); centers (B, 3) + thetas (B,) initial
    poses from the grid fit.

    ``init_dims`` (B, 3) optional per-car (length, width, height) from the
    grid fit: the reference scales the template to EACH car's fitted dims
    before optimizing (deformable_mesh.py:368-392) — critical because the
    dof2 scales are frozen for the first ``scale_release_iter`` iterations,
    so an unscaled template would optimize against wrongly-sized geometry.
    With ``init_dims`` the returned ``scales`` are relative to the car's
    initial dims (the reference frame); without it they are relative to
    the template's own extents.

    The reference's final re-pose uses the negated yaw (:496-503) — harmless
    there because only the y-extent (rotation-invariant) is consumed for
    ``car.height``; here the returned vertices keep the optimized pose.
    """
    import optax

    b = scans.shape[0]
    nv = verts0.shape[0]
    if init_dims is not None:
        # mesh axis convention (templates.py): x = width, y = height,
        # z = length; init_dims is (l, w, h)
        ext = (jnp.max(verts0, axis=0) - jnp.min(verts0, axis=0))
        dims_xyz = jnp.stack([init_dims[:, 1], init_dims[:, 2],
                              init_dims[:, 0]], axis=1)
        verts0_b = verts0[None] * (dims_xyz / ext)[:, None, :]   # (B, V, 3)
    else:
        verts0_b = jnp.broadcast_to(verts0, (b, nv, 3))
    degree = jnp.sum(adj != jnp.arange(nv)[:, None], axis=1)
    weights = scan_masks.astype(scans.dtype)

    def init_params():
        return {"y_off": jnp.zeros((b, nv)),
                "dof2": jnp.tile(jnp.asarray(
                    [0., 0., 0., 1., 1., 1., 0.], scans.dtype), (b, 1))}

    def loss_fn(params, it):
        vb = jax.vmap(
            lambda v0, y, d, cen, th: _apply_dof(v0, y, d, cen, th, it, cfg)
        )(verts0_b, params["y_off"], params["dof2"], centers, thetas)
        per = _losses_batch(vb, scans, weights,
                            thetas + params["dof2"][:, 6],
                            edges, adj, degree, mirror_idx, cfg)
        return jnp.mean(per), per

    tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
    params = init_params()
    opt_state = tx.init(params)

    def step(carry, it):
        params, opt_state = carry
        (_, per), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, it)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), per

    (params, _), per_hist = jax.lax.scan(
        step, (params, opt_state), jnp.arange(cfg.iterations))

    def final(v0, y_off, dof2, cen, th):
        return _apply_dof(v0, y_off, dof2, cen, th,
                          jnp.asarray(cfg.iterations), cfg)

    verts = jax.vmap(final)(verts0_b, params["y_off"], params["dof2"],
                            centers, thetas)
    scales = jnp.clip(params["dof2"][:, 3:6], cfg.scale_min, cfg.scale_max)
    return DeformResult(verts=verts,
                        translation=centers + params["dof2"][:, :3],
                        scales=scales,
                        dtheta=params["dof2"][:, 6],
                        loss=per_hist[-1])


def mirror_indices(verts: np.ndarray) -> np.ndarray:
    """Hungarian match of each vertex to its x-mirrored position
    (deformable_mesh.py:399-405: linear_sum_assignment over the cdist of
    the template vs its x-negated clone)."""
    from scipy.optimize import linear_sum_assignment

    m = verts * np.array([-1.0, 1.0, 1.0])
    d = np.sqrt(((verts[:, None, :] - m[None, :, :]) ** 2).sum(-1))
    row, col = linear_sum_assignment(d)
    out = np.empty(len(verts), np.int32)
    out[row] = col
    return out

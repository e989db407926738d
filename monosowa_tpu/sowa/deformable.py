"""Deformable mesh refinement (optax batched fit).

Behavioral contract (pseudo_label_generator/3d/scripts/deformable_mesh.py):

* ``deformable_mesh_fit_lim_dof_batch`` (:330-517): batched AdamW fit (1000
  iterations) of a car mesh to each standing car's aggregated points over
  per-vertex y-offsets + 7 global DoF (xyz translation, 3 axis scales, yaw
  delta), dims clipped to [0.6, 1.25] x template;
* losses (:519-817): sigmoid-kNN chamfer (tfl_knn_batch :747-781),
  projected two-axis TFL (tfl_new_batch :783-812), edge-length-variance
  (mesh_edge_loss_v2 :519-612), uniform laplacian smoothing, y-symmetry via
  matched mirrored vertices (:814-817 — Hungarian in the reference,
  nearest-neighbor matching here: equivalent on near-symmetric meshes).

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


@dataclasses.dataclass(frozen=True)
class DeformConfig:
    iterations: int = 1000
    lr: float = 1e-2
    steepness: float = 10.0
    w_chamfer: float = 1.0
    w_tfl: float = 1.0
    w_edge: float = 1.0
    w_laplacian: float = 0.3
    w_symmetry: float = 0.5
    scale_min: float = 0.6
    scale_max: float = 1.25


class DeformResult(NamedTuple):
    verts: jnp.ndarray       # (B, V, 3) fitted world-frame vertices
    translation: jnp.ndarray  # (B, 3)
    scales: jnp.ndarray       # (B, 3)
    dtheta: jnp.ndarray       # (B,)
    loss: jnp.ndarray         # (B,)


def _apply_dof(verts0, y_offsets, dof, cfg):
    """verts0 (V, 3); y_offsets (V,); dof = [tx,ty,tz, sx,sy,sz, theta].

    Returns (world_verts, local_verts) — the symmetry loss acts on the
    canonical (pre-pose) frame; mirroring in world coordinates would drag
    the whole car toward the camera's x=0 plane."""
    scales = jnp.clip(1.0 + dof[3:6], cfg.scale_min, cfg.scale_max)
    v = verts0 * scales
    v = v.at[:, 1].add(y_offsets)
    c, s = jnp.cos(dof[6]), jnp.sin(dof[6])
    rot = jnp.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
    return v @ rot.T + dof[:3], v


def _losses(v, v_local, scan, scan_mask, edges, adj, mirror_idx, cfg):
    d2 = pairwise_sq_dists(v, scan)
    d2 = jnp.where(scan_mask[None, :], d2, 1e9)
    d = jnp.sqrt(d2 + 1e-12)
    n_scan = jnp.maximum(jnp.sum(scan_mask), 1)
    # sigmoid-kNN chamfer (both directions, tfl_knn_batch)
    v2s = jax.nn.sigmoid(cfg.steepness * jnp.min(d, axis=1)) - 0.5
    s2v = jax.nn.sigmoid(cfg.steepness * jnp.min(d, axis=0)) - 0.5
    s2v = jnp.where(scan_mask, s2v, 0.0)
    chamfer = jnp.mean(v2s) + jnp.sum(s2v) / n_scan
    # projected two-axis TFL (tfl_new_batch): xz / zy plane distances
    for axes in ((0, 2), (2, 1)):
        dv = pairwise_sq_dists(v[:, list(axes)], scan[:, list(axes)])
        dv = jnp.sqrt(jnp.where(scan_mask[None, :], dv, 1e9) + 1e-12)
        chamfer = chamfer + 0.5 * jnp.mean(
            jax.nn.sigmoid(cfg.steepness * jnp.min(dv, axis=1)) - 0.5)
    # edge-length variance
    el = jnp.linalg.norm(v[edges[:, 0]] - v[edges[:, 1]], axis=1)
    edge_loss = jnp.var(el)
    # uniform laplacian
    nbrs = v[adj]                                    # (V, D, 3)
    lap = jnp.mean(jnp.sum((jnp.mean(nbrs, axis=1) - v) ** 2, -1))
    # y-symmetry in the canonical frame: mirrored-x vertex matches partner
    mirrored = v_local * jnp.array([-1.0, 1.0, 1.0])
    sym = jnp.mean(jnp.sum((mirrored - v_local[mirror_idx]) ** 2, -1))
    return (cfg.w_chamfer * chamfer + cfg.w_edge * edge_loss
            + cfg.w_laplacian * lap + cfg.w_symmetry * sym)


@partial(jax.jit, static_argnames=("cfg",))
def fit_deformable_batch(verts0: jnp.ndarray, edges: jnp.ndarray,
                         adj: jnp.ndarray, mirror_idx: jnp.ndarray,
                         scans: jnp.ndarray, scan_masks: jnp.ndarray,
                         centers: jnp.ndarray, thetas: jnp.ndarray,
                         cfg: DeformConfig = DeformConfig()) -> DeformResult:
    """Batched mesh fit.

    verts0 (V, 3) canonical mesh; scans (B, S, 3) camera-frame points;
    centers (B, 3) + thetas (B,) initial poses from the grid fit.
    """
    import optax

    b = scans.shape[0]
    nv = verts0.shape[0]

    def init_params():
        return {"y_off": jnp.zeros((b, nv)),
                "dof": jnp.concatenate(
                    [centers, jnp.zeros((b, 3)), thetas[:, None]], 1)}

    def loss_fn(params):
        # dof[6] holds the absolute yaw, initialized to the grid-fit theta
        def one(y_off, dof, scan, m):
            v, v_local = _apply_dof(verts0, y_off, dof, cfg)
            return _losses(v, v_local, scan, m, edges, adj, mirror_idx, cfg)

        per = jax.vmap(one)(params["y_off"], params["dof"], scans,
                            scan_masks)
        return jnp.mean(per), per

    tx = optax.adamw(cfg.lr)
    params = init_params()
    opt_state = tx.init(params)

    def step(carry, _):
        params, opt_state = carry
        (_, per), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), per

    (params, _), per_hist = jax.lax.scan(
        step, (params, opt_state), None, length=cfg.iterations)

    def final(y_off, dof):
        return _apply_dof(verts0, y_off, dof, cfg)[0]

    verts = jax.vmap(final)(params["y_off"], params["dof"])
    scales = jnp.clip(1.0 + params["dof"][:, 3:6], cfg.scale_min,
                      cfg.scale_max)
    return DeformResult(verts=verts, translation=params["dof"][:, :3],
                        scales=scales, dtheta=params["dof"][:, 6] - thetas,
                        loss=per_hist[-1])


def mirror_indices(verts: np.ndarray) -> np.ndarray:
    """Nearest-vertex match of each vertex to its x-mirrored position."""
    m = verts * np.array([-1.0, 1.0, 1.0])
    d = ((m[:, None, :] - verts[None, :, :]) ** 2).sum(-1)
    return np.argmin(d, axis=1).astype(np.int32)

"""Deformable mesh: procedural mesh validity + batched fit convergence."""

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.ops.geometry import rot_y
from monosowa_tpu.sowa import deformable


def test_car_mesh_geometry():
    verts, faces = deformable.make_car_mesh()
    assert verts.shape[1] == 3 and faces.shape[1] == 3
    assert faces.max() < len(verts)
    # normalized to template dims
    assert verts[:, 0].max() - verts[:, 0].min() == pytest.approx(1.63, 1e-3)
    assert verts[:, 1].max() - verts[:, 1].min() == pytest.approx(1.526, 1e-3)
    assert verts[:, 2].max() - verts[:, 2].min() == pytest.approx(3.88, 1e-3)
    edges = deformable.mesh_edges(faces)
    assert len(edges) > len(verts)  # connected surface
    adj = deformable.vertex_adjacency(faces, len(verts))
    assert adj.shape[0] == len(verts)


def test_mirror_indices_symmetric():
    verts, _ = deformable.make_car_mesh()
    mi = deformable.mirror_indices(verts)
    mirrored = verts * np.array([-1.0, 1.0, 1.0])
    err = np.linalg.norm(mirrored - verts[mi], axis=1)
    assert np.median(err) < 0.1


def test_fit_deformable_batch_converges():
    verts, faces = deformable.make_car_mesh(nu=16, nv=8)
    edges = jnp.asarray(deformable.mesh_edges(faces))
    adj = jnp.asarray(deformable.vertex_adjacency(faces, len(verts)))
    mi = jnp.asarray(deformable.mirror_indices(verts))

    rng = np.random.default_rng(0)
    theta = 0.5
    center = np.array([1.0, 0.8, 12.0], np.float32)
    rot = np.asarray(rot_y(jnp.float32(theta)))
    scan = (verts * np.array([1.0, 1.0, 1.1])) @ rot.T + center
    scan = scan + rng.normal(scale=0.02, size=scan.shape).astype(np.float32)
    S = 256
    pts = np.zeros((1, S, 3), np.float32)
    pts[0, :len(scan)] = scan[:S]
    mask = np.zeros((1, S), bool)
    mask[0, :min(len(scan), S)] = True

    cfg = deformable.DeformConfig(iterations=150)
    res = deformable.fit_deformable_batch(
        jnp.asarray(verts), edges, adj, mi,
        jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray(center[None]), jnp.asarray([theta], jnp.float32), cfg)

    assert np.isfinite(float(res.loss[0]))
    # fitted vertices should hug the scan: mean NN distance small
    v = np.asarray(res.verts[0])
    d = np.sqrt(((v[:, None] - scan[None, :len(scan)]) ** 2).sum(-1)).min(1)
    assert np.mean(d) < 0.25
    # scales stay inside the clip range
    assert np.all(np.asarray(res.scales) >= cfg.scale_min - 1e-6)
    assert np.all(np.asarray(res.scales) <= cfg.scale_max + 1e-6)

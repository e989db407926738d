"""CAD-mesh template bank: glTF loading without open3d, reference-exact
sampling semantics, and end-to-end fitting with the CAD templates."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.sowa import mesh_io
from monosowa_tpu.sowa.templates import TemplateBank

REF_DATA = "/root/reference/pseudo_label_generator/3d/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DATA),
                                reason="reference meshes not present")


def test_load_gltf_embedded_and_external_buffers():
    v, f = mesh_io.load_gltf(os.path.join(REF_DATA, "fiat2.gltf"))
    assert v.shape[1] == 3 and f.shape[1] == 3
    assert len(v) > 1000 and f.max() < len(v)
    v2, f2 = mesh_io.load_gltf(os.path.join(REF_DATA, "suv.gltf"))
    assert len(v2) > 1000


def test_sample_mesh_surface_uniform():
    # unit right triangle in the z=0 plane: samples stay inside
    v = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])
    f = np.array([[0, 1, 2]])
    pts = mesh_io.sample_mesh_surface(v, f, 500, seed=1)
    assert (pts[:, 0] >= 0).all() and (pts[:, 1] >= 0).all()
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-9).all()
    assert np.abs(pts[:, 2]).max() == 0
    # mean of a uniform triangle sample ~ centroid
    np.testing.assert_allclose(pts.mean(0)[:2], [1 / 3, 1 / 3], atol=0.05)


def test_rotation_zxy_matches_composition():
    z, x, y = 0.3, -0.7, 1.1
    got = mesh_io.rotation_zxy(z, x, y)
    cz, sz = np.cos(z), np.sin(z)
    cx, sx = np.cos(x), np.sin(x)
    cy, sy = np.cos(y), np.sin(y)
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    np.testing.assert_allclose(got, rz @ rx @ ry, atol=1e-12)


@pytest.fixture(scope="module")
def cad_bank():
    return TemplateBank.from_gltf(REF_DATA)


def test_cad_bank_geometry(cad_bank):
    assert cad_bank.points.shape == (4, 1000, 3)
    for i in range(4):
        ext = np.ptp(cad_bank.points[i], axis=0)
        # sampled extents approach the configured dims (w, h, l)
        assert ext[0] <= 1.63 + 1e-5 and ext[0] > 1.63 * 0.85
        assert ext[1] <= 1.526 + 1e-5 and ext[1] > 1.526 * 0.85
        assert ext[2] <= 3.88 + 1e-5 and ext[2] > 3.88 * 0.9
    # car orientation: the fiat's ground side (+y, camera down-axis) is
    # wider than its roof
    pts = cad_bank.points[0]
    y = pts[:, 1]
    wide_ground = np.ptp(pts[y > np.percentile(y, 70)][:, 0])
    wide_roof = np.ptp(pts[y < np.percentile(y, 30)][:, 0])
    assert wide_ground > wide_roof


def test_deformable_fit_with_reference_mesh():
    """Deformable refinement driven by the reference's own deformed car
    mesh instead of the procedural grid."""
    import jax

    from monosowa_tpu.sowa import deformable

    verts, faces = deformable.load_car_mesh_obj(
        os.path.join(REF_DATA, "fiat_deformed2.obj"),
        target_dims_whl=(1.63, 1.526, 3.88))
    assert np.allclose(np.ptp(verts, 0), [1.63, 1.526, 3.88], atol=1e-4)

    edges = jnp.asarray(deformable.mesh_edges(faces))
    adj = jnp.asarray(deformable.vertex_adjacency(faces, len(verts)))
    mi = jnp.asarray(deformable.mirror_indices(verts))

    rng = np.random.default_rng(0)
    center = np.array([0.5, 1.0, 12.0], np.float32)
    scan = verts[rng.choice(len(verts), 700)] + center
    scan = (scan + rng.normal(scale=0.02, size=scan.shape)) \
        .astype(np.float32)
    res = deformable.fit_deformable_batch(
        jnp.asarray(verts), edges, adj, mi,
        jnp.asarray(scan[None]), jnp.ones((1, 700), bool),
        jnp.asarray(center[None]), jnp.zeros(1, jnp.float32),
        deformable.DeformConfig(iterations=60))
    assert np.isfinite(float(res.loss[0]))
    # an already-aligned scan keeps the fitted pose near the initializer
    assert np.linalg.norm(np.asarray(res.translation[0]) - center) < 0.4
    assert np.all(np.asarray(res.scales[0]) > 0.6)
    assert np.all(np.asarray(res.scales[0]) < 1.25)


def test_fit_recovers_pose_with_cad_templates(cad_bank):
    from monosowa_tpu.ops.geometry import rot_y
    from monosowa_tpu.sowa.fitting import (CarBatch, FitConfig,
                                           fit_cars_conv, make_conv_kernels)

    rng = np.random.default_rng(0)
    true = dict(x=0.8, y=1.1, z=13.0, theta=1.1)
    rot = np.asarray(rot_y(jnp.float32(true["theta"])))
    scan = cad_bank.points[0] @ rot.T + np.array(
        [true["x"], true["y"], true["z"]])
    scan = (scan + rng.normal(scale=0.02, size=scan.shape)).astype(np.float32)

    cfg = FitConfig(n_dx=20, n_dz=20, n_theta=24, n_theta_fine=180,
                    fine_chunk=12)
    spec, occ_k, memb_k = make_conv_kernels(cad_bank.points[0], cfg)
    n_pts = 1024
    pts = np.zeros((1, n_pts, 3), np.float32)
    mask = np.zeros((1, n_pts), bool)
    pts[0, :len(scan)] = scan
    mask[0, :len(scan)] = True
    res = fit_cars_conv(
        CarBatch(points=jnp.asarray(pts), mask=jnp.asarray(mask),
                 moving=jnp.zeros(1, bool),
                 theta_est=jnp.zeros(1, jnp.float32),
                 theta_valid=jnp.zeros(1, bool),
                 car_valid=jnp.ones(1, bool)),
        jnp.asarray(cad_bank.points[0]), occ_k, memb_k, spec, cfg)
    assert abs(float(res.x[0]) - true["x"]) < 0.3
    assert abs(float(res.z[0]) - true["z"]) < 0.3
    d = (float(res.theta[0]) - true["theta"] + np.pi) % (2 * np.pi) - np.pi
    assert min(abs(d), abs(abs(d) - np.pi)) < np.deg2rad(6)

"""Detector TFL auxiliary loss tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.models import tfl_aux
from monosowa_tpu.sowa.templates import TemplateBank


def _setup(offset=0.0, seed=0):
    rng = np.random.default_rng(seed)
    bank = TemplateBank.default()
    car_pts = bank.points[0] + np.array([2.0, 1.0, 15.0])
    C, P = 2, 1200
    pts = np.zeros((C, P, 3), np.float32)
    pmask = np.zeros((C, P), bool)
    pts[0, :1000] = car_pts
    pmask[0, :1000] = True
    valid = np.array([True, False])
    moving = np.zeros(C, bool)

    Q = 4
    boxes7 = np.zeros((Q, 7), np.float32)
    # query 0: perfect pose on the car (theta = -pi/2 so ry+pi/2 = 0)
    boxes7[0] = [2.0 + offset, 1.0, 15.0, 1.526, 1.63, 3.88, -np.pi / 2]
    boxes7[1] = [50.0, 1.0, 40.0, 1.5, 1.6, 3.9, 0.0]   # unmatched (far)
    matched = np.array([True, True, False, False])
    return (jnp.asarray(boxes7), jnp.asarray(matched), jnp.asarray(pts),
            jnp.asarray(pmask), jnp.asarray(valid), jnp.asarray(moving),
            jnp.asarray(bank.points), jnp.asarray([1.526, 1.63, 3.88],
                                                  jnp.float32))


def test_perfect_pose_low_loss():
    args = _setup(0.0)
    loss_good = float(tfl_aux.loss_tfl_aux(*args))
    args_bad = _setup(1.0)
    loss_bad = float(tfl_aux.loss_tfl_aux(*args_bad))
    assert loss_good < loss_bad
    assert np.isfinite(loss_good) and np.isfinite(loss_bad)


def test_gradients_flow_through_pose():
    import jax
    args = _setup(0.5)

    def f(boxes):
        return tfl_aux.loss_tfl_aux(boxes, *args[1:])

    g = jax.grad(f)(args[0])
    g = np.asarray(g)
    # matched query 0 gets gradients on its position
    assert np.abs(g[0, :3]).max() > 0
    # unmatched queries get none
    assert np.abs(g[2]).max() == 0


def test_decode_pred_boxes7_geometry():
    Q = 3
    boxes = jnp.asarray(np.array([[0.5, 0.5, 0, 0, 0, 0]] * Q, np.float32))
    depth = jnp.asarray(np.array([[20.0, 0.0]] * Q, np.float32))
    dims = jnp.zeros((Q, 3))
    angle = jnp.zeros((Q, 24))
    calib = jnp.asarray(np.array([[700.0, 0, 320, 0], [0, 700.0, 180, 0],
                                  [0, 0, 1, 0]], np.float32))
    out = np.asarray(tfl_aux.decode_pred_boxes7(
        boxes, depth, dims, angle, calib, jnp.asarray([640.0, 360.0]),
        jnp.float32(2.0), jnp.asarray([1.5, 1.6, 3.9], jnp.float32)))
    # canonical_scale 2 -> depth 10; center pixel -> x = 0, y = 0 (center y,
    # no +h/2 — decode_preds :1110 keeps the projected 3D center)
    assert out[0, 2] == pytest.approx(10.0)
    assert out[0, 0] == pytest.approx(0.0, abs=1e-5)
    assert out[0, 1] == pytest.approx(0.0, abs=1e-5)
    assert out[0, 3:6] == pytest.approx([1.5, 1.6, 3.9])
    assert out[0, 6] == pytest.approx(0.0, abs=1e-5)


def test_decode_pred_boxes7_affine_flip():
    """Inverse-affine + un-flip path (decode_preds :1085-1151)."""
    q = 2
    boxes = np.zeros((q, 6), np.float32)
    boxes[:, 0], boxes[:, 1] = 0.25, 0.5       # u_res=160, v_res=180
    boxes[:, 2:] = 0.05
    depth = np.tile(np.array([[20.0, 0.0]], np.float32), (q, 1))
    dims = np.tile(np.array([[1.5, 1.6, 3.9]], np.float32), (q, 1))
    angle = np.zeros((q, 24), np.float32)
    calib = jnp.asarray(np.array([[700.0, 0, 320, 0], [0, 700.0, 180, 0],
                                  [0, 0, 1, 0]], np.float32))
    res = jnp.asarray([640.0, 360.0])
    # affine: original -> resolution is a plain x2 downscale, so inverse
    # doubles coordinates: u_img = 2 * u_res
    tinv = jnp.asarray(np.array([[2.0, 0, 0], [0, 2.0, 0]], np.float32))
    img_w = jnp.float32(1280.0)

    out = np.asarray(tfl_aux.decode_pred_boxes7(
        jnp.asarray(boxes), jnp.asarray(depth), jnp.asarray(dims),
        jnp.asarray(angle), calib, res, jnp.float32(1.0), jnp.zeros(3),
        trans_inv=tinv, flip=jnp.asarray(False), img_w=img_w))
    # u_img = 320 = cu -> x = 0
    assert out[0, 0] == pytest.approx(0.0, abs=1e-4)

    out_f = np.asarray(tfl_aux.decode_pred_boxes7(
        jnp.asarray(boxes), jnp.asarray(depth), jnp.asarray(dims),
        jnp.asarray(angle), calib, res, jnp.float32(1.0), jnp.zeros(3),
        trans_inv=tinv, flip=jnp.asarray(True), img_w=img_w))
    # flipped: u = 1280 - 320 = 960 -> x = (960-320)*20/700
    assert out_f[0, 0] == pytest.approx((960 - 320) * 20 / 700, abs=1e-3)
    # heading mirrored: -0 + pi + ray
    ray = np.arctan2(960 - 320, 700)
    assert out_f[0, 6] == pytest.approx(np.pi + ray, abs=1e-4)


def test_gather_matched_queries():
    midx = jnp.asarray(np.array([-1, 3, -1, 0, 2, -1], np.int32))
    qidx, valid = tfl_aux.gather_matched_queries(midx, 4)
    assert list(np.asarray(qidx)) == [1, 3, 4, 0]
    assert list(np.asarray(valid)) == [True, True, True, False]

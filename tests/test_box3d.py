"""Rotated box IoU / NMS tests against analytic cases and a shapely-free
numpy oracle (axis-aligned + known-rotation cases)."""

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.ops import box3d


def _iou_bev_single(ca, lwa, ra, cb, lwb, rb):
    out = box3d.iou_bev(jnp.asarray([ca], jnp.float32),
                        jnp.asarray([lwa], jnp.float32),
                        jnp.asarray([ra], jnp.float32),
                        jnp.asarray([cb], jnp.float32),
                        jnp.asarray([lwb], jnp.float32),
                        jnp.asarray([rb], jnp.float32))
    return float(out[0, 0])


def test_bev_identical_boxes():
    assert _iou_bev_single([0, 0], [4, 2], 0.3, [0, 0], [4, 2], 0.3) \
        == pytest.approx(1.0, abs=1e-5)


def test_bev_disjoint():
    assert _iou_bev_single([0, 0], [4, 2], 0.0, [10, 0], [4, 2], 0.0) == 0.0


def test_bev_axis_aligned_half_overlap():
    # two 4x2 boxes offset by 2 in x: inter = 2*2=4, union = 8+8-4=12
    got = _iou_bev_single([0, 0], [4, 2], 0.0, [2, 0], [4, 2], 0.0)
    assert got == pytest.approx(4.0 / 12.0, abs=1e-5)


def test_bev_rotation_invariance():
    # rotate both boxes by the same angle: IoU unchanged
    base = _iou_bev_single([0, 0], [4, 2], 0.0, [1.0, 0.5], [3, 2], 0.0)
    for ang in [0.3, 1.2, 2.5]:
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[c, s], [-s, c]])
        ca = rot @ np.array([0.0, 0.0])
        cb = rot @ np.array([1.0, 0.5])
        got = _iou_bev_single(ca, [4, 2], ang, cb, [3, 2], ang)
        assert got == pytest.approx(base, abs=1e-4)


def test_bev_cross_45_degrees():
    # unit squares, one rotated 45 deg, same center: intersection is the
    # regular octagon with area 8*(sqrt(2)-1)/2... known value 2*(sqrt(2)-1)
    inter_analytic = 2 * (np.sqrt(2) - 1)
    union = 2.0 - inter_analytic
    got = _iou_bev_single([0, 0], [1, 1], 0.0, [0, 0], [1, 1], np.pi / 4)
    assert got == pytest.approx(inter_analytic / union, abs=1e-4)


def test_bev_containment():
    # small box fully inside large: inter = small area
    got = _iou_bev_single([0, 0], [4, 4], 0.2, [0.3, 0.2], [1, 1], 1.0)
    assert got == pytest.approx(1.0 / (16 + 1 - 1), abs=1e-4)


def test_bev_criterion_modes():
    a = (jnp.asarray([[0.0, 0.0]]), jnp.asarray([[4.0, 2.0]]), jnp.asarray([0.0]))
    b = (jnp.asarray([[2.0, 0.0]]), jnp.asarray([[4.0, 2.0]]), jnp.asarray([0.0]))
    i_union = float(box3d.iou_bev(*a, *b, criterion=-1)[0, 0])
    i_a = float(box3d.iou_bev(*a, *b, criterion=0)[0, 0])
    i_b = float(box3d.iou_bev(*a, *b, criterion=1)[0, 0])
    assert i_union == pytest.approx(4 / 12, abs=1e-5)
    assert i_a == pytest.approx(4 / 8, abs=1e-5)
    assert i_b == pytest.approx(4 / 8, abs=1e-5)


def test_iou3d_axis_aligned():
    # boxes stacked with half vertical overlap
    ca = jnp.asarray([[0.0, 0.0, 0.0]])
    cb = jnp.asarray([[0.0, 0.5, 0.0]])
    lwh = jnp.asarray([[2.0, 2.0, 1.0]])
    got = float(box3d.iou_3d(ca, lwh, jnp.asarray([0.0]),
                             cb, lwh, jnp.asarray([0.0]))[0, 0])
    # inter = 4 * 0.5 = 2, union = 4+4-2 = 6
    assert got == pytest.approx(2.0 / 6.0, abs=1e-5)


def test_nms_merges_overlapping():
    center = jnp.asarray([[0.0, 0.0, 10.0], [0.3, 0.0, 10.1],
                          [8.0, 0.0, 20.0]])
    lwh = jnp.asarray([[3.9, 1.6, 1.5]] * 3)
    ry = jnp.asarray([0.0, 0.05, 1.0])
    score = jnp.asarray([0.9, 0.5, 0.8])
    valid = jnp.asarray([True, True, True])
    keep, merged = box3d.nms_3d(center, lwh, ry, score, valid,
                                jnp.float32(0.1))
    assert list(np.asarray(keep)) == [True, False, True]
    assert int(merged[1]) == 0           # suppressed by box 0
    assert int(merged[0]) == 0 and int(merged[2]) == 2


def test_nms_respects_validity():
    center = jnp.asarray([[0.0, 0.0, 10.0], [0.1, 0.0, 10.0]])
    lwh = jnp.asarray([[3.9, 1.6, 1.5]] * 2)
    ry = jnp.asarray([0.0, 0.0])
    keep, _ = box3d.nms_3d(center, lwh, ry, jnp.asarray([0.5, 0.9]),
                           jnp.asarray([True, False]), jnp.float32(0.1))
    assert list(np.asarray(keep)) == [True, False]

"""Matcher + criterion tests: LAP backends vs scipy, matching sanity,
loss behavior (perfect predictions vs perturbed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from monosowa_tpu.models import criterion as crit
from monosowa_tpu.models.matcher import (
    MatcherConfig, box_cxcylrtb_to_xyxy, generalized_box_iou, hungarian_match)
from monosowa_tpu.ops.lap import solve_lap_auction, solve_lap_host


def test_lap_host_matches_scipy():
    rng = np.random.default_rng(0)
    cost = rng.normal(size=(10, 6)).astype(np.float32)
    got = np.asarray(solve_lap_host(jnp.asarray(cost), jnp.int32(6)))
    rows, cols = linear_sum_assignment(cost)
    want = np.full(10, -1, np.int32)
    want[rows] = cols
    np.testing.assert_array_equal(got, want)


def test_lap_host_respects_valid_count():
    rng = np.random.default_rng(1)
    cost = rng.normal(size=(8, 5)).astype(np.float32)
    got = np.asarray(solve_lap_host(jnp.asarray(cost), jnp.int32(3)))
    assert (got >= 0).sum() == 3
    assert set(got[got >= 0]) == {0, 1, 2}


def test_lap_jv_matches_scipy_exactly():
    from monosowa_tpu.ops.lap import solve_lap_jv
    rng = np.random.default_rng(5)
    for _ in range(25):
        m = int(rng.integers(1, 51))
        scale = 10 ** rng.uniform(-2, 2)
        cost = (rng.normal(size=(50, 50)) * scale).astype(np.float32)
        got = np.asarray(solve_lap_jv(jnp.asarray(cost), jnp.int32(m)))
        rows, cols = linear_sum_assignment(cost[:, :m].astype(np.float64))
        assert (got >= 0).sum() == m
        assert set(got[got >= 0]) == set(range(m))
        sel = np.where(got >= 0)[0]
        val = cost[sel, got[sel]].astype(np.float64).sum()
        opt = cost[rows, cols].astype(np.float64).sum()
        assert val == pytest.approx(opt, rel=1e-6, abs=1e-5)


def test_lap_auction_near_optimal():
    rng = np.random.default_rng(2)
    for _ in range(3):
        cost = rng.normal(size=(12, 7)).astype(np.float32)
        got = np.asarray(solve_lap_auction(jnp.asarray(cost), jnp.int32(7)))
        assert (got >= 0).sum() == 7
        rows, cols = linear_sum_assignment(cost)
        opt = cost[rows, cols].sum()
        sel_rows = np.where(got >= 0)[0]
        val = cost[sel_rows, got[sel_rows]].sum()
        assert val <= opt + 0.05 * max(1.0, abs(opt))


def test_giou_identity_and_disjoint():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [5.0, 5.0, 6.0, 6.0]])
    g = np.asarray(generalized_box_iou(a, b))
    assert g[0, 0] == pytest.approx(1.0)
    assert g[0, 1] < 0  # disjoint boxes have negative GIoU


def _perfect_setup(b=2, q=20, m=3, seed=0):
    rng = np.random.default_rng(seed)
    tgt_boxes = np.zeros((b, m, 6), np.float32)
    tgt_boxes[..., :2] = rng.uniform(0.2, 0.8, (b, m, 2))
    tgt_boxes[..., 2:] = rng.uniform(0.02, 0.15, (b, m, 4))
    labels = np.zeros((b, m), np.int64)
    valid = np.ones((b, m), bool)

    logits = np.full((b, q, 3), -4.0, np.float32)
    boxes = rng.uniform(0.3, 0.7, (b, q, 6)).astype(np.float32)
    # plant perfect predictions at query slots 2, 7, 11
    slots = [2, 7, 11]
    for bi in range(b):
        for mi, s in enumerate(slots[:m]):
            boxes[bi, s] = tgt_boxes[bi, mi]
            logits[bi, s, 0] = 4.0
    return (jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(labels),
            jnp.asarray(tgt_boxes), jnp.asarray(valid), slots)


def test_hungarian_match_finds_planted_assignment():
    logits, boxes, labels, tgt_boxes, valid, slots = _perfect_setup()
    idx = np.asarray(hungarian_match(logits, boxes, labels, tgt_boxes, valid,
                                     MatcherConfig(), group_num=1,
                                     num_queries=logits.shape[1]))
    for bi in range(2):
        for mi, s in enumerate(slots):
            assert idx[bi, s] == mi
    # exactly M matches per image
    assert (idx >= 0).sum(axis=1).tolist() == [3, 3]


def test_hungarian_match_groups_independent():
    logits, boxes, labels, tgt_boxes, valid, _ = _perfect_setup(q=20)
    # duplicate queries into 2 groups
    logits2 = jnp.concatenate([logits, logits], axis=1)
    boxes2 = jnp.concatenate([boxes, boxes], axis=1)
    idx = np.asarray(hungarian_match(logits2, boxes2, labels, tgt_boxes,
                                     valid, MatcherConfig(), group_num=2,
                                     num_queries=20))
    # each group matches all 3 targets
    assert (idx[:, :20] >= 0).sum(axis=1).tolist() == [3, 3]
    assert (idx[:, 20:] >= 0).sum(axis=1).tolist() == [3, 3]


def _targets_for(tgt_boxes, labels, valid, b, m, rng):
    return crit.Targets(
        labels=jnp.asarray(labels),
        boxes_3d=jnp.asarray(tgt_boxes),
        boxes_2d=jnp.asarray(np.concatenate(
            [tgt_boxes[..., :2],
             tgt_boxes[..., 2:3] + tgt_boxes[..., 3:4],
             tgt_boxes[..., 4:5] + tgt_boxes[..., 5:6]], -1)),
        depth=jnp.asarray(rng.uniform(5, 50, (b, m)).astype(np.float32)),
        size_3d=jnp.asarray(rng.uniform(-0.3, 0.3, (b, m, 3)).astype(np.float32)),
        heading_bin=jnp.asarray(rng.integers(0, 12, (b, m))),
        heading_res=jnp.asarray(rng.uniform(-0.2, 0.2, (b, m)).astype(np.float32)),
        valid=jnp.asarray(valid))


def test_criterion_outputs_and_perfect_lower_loss():
    b, q, m = 2, 20, 3
    rng = np.random.default_rng(3)
    logits, boxes, labels, tgt_boxes, valid, slots = _perfect_setup()
    targets = _targets_for(np.asarray(tgt_boxes), np.asarray(labels),
                           np.asarray(valid), b, m, rng)

    depth_map_logits = jnp.zeros((b, 6, 10, 81), jnp.float32)
    outputs = {"pred_logits": logits, "pred_boxes": boxes,
               "pred_3d_dim": targets.size_3d.mean() * jnp.ones((b, q, 3)),
               "pred_angle": jnp.zeros((b, q, 24)),
               "pred_depth": jnp.concatenate(
                   [20.0 * jnp.ones((b, q, 1)), jnp.zeros((b, q, 1))], -1),
               "pred_depth_map_logits": depth_map_logits}
    cfg = crit.CriterionConfig(group_num=1, num_queries=q)
    losses = crit.criterion(outputs, targets, cfg, training=False)
    assert "loss_total" in losses and np.isfinite(float(losses["loss_total"]))
    for k in ("loss_ce", "loss_center", "loss_bbox", "loss_giou",
              "loss_depth", "loss_dim", "loss_angle", "loss_depth_map"):
        assert np.isfinite(float(losses[k])), k

    # perturbing the planted boxes must increase the box losses
    boxes_bad = boxes + 0.05
    out_bad = dict(outputs, pred_boxes=boxes_bad)
    losses_bad = crit.criterion(out_bad, targets, cfg, training=False)
    assert float(losses_bad["loss_bbox"]) > float(losses["loss_bbox"])
    assert float(losses_bad["loss_center"]) > float(losses["loss_center"])


def test_criterion_aux_outputs_add_terms():
    b, q, m = 1, 10, 2
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(b, q, 3)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0.2, 0.8, (b, q, 6)).astype(np.float32))
    tgt_boxes = np.asarray(rng.uniform(0.3, 0.6, (b, m, 6)), np.float32)
    targets = _targets_for(tgt_boxes, np.zeros((b, m), np.int64),
                           np.ones((b, m), bool), b, m, rng)
    layer = {"pred_logits": logits, "pred_boxes": boxes,
             "pred_3d_dim": jnp.zeros((b, q, 3)),
             "pred_angle": jnp.zeros((b, q, 24)),
             "pred_depth": jnp.zeros((b, q, 2))}
    outputs = dict(layer, pred_depth_map_logits=jnp.zeros((b, 4, 6, 81)),
                   aux_outputs=[dict(layer)])
    cfg = crit.CriterionConfig(group_num=1, num_queries=q)
    losses = crit.criterion(outputs, targets, cfg, training=False)
    assert "loss_ce_0" in losses
    assert "loss_depth_map_0" not in losses  # aux layers skip depth_map


def test_ddn_gt_map_nearest_box_wins():
    # two overlapping boxes, different depths: overlap pixels = nearer depth
    b, h, w = 1, 8, 12
    boxes2d = np.zeros((b, 2, 4), np.float32)
    boxes2d[0, 0] = [0.4, 0.5, 0.5, 0.8]   # cx cy w h normalized
    boxes2d[0, 1] = [0.6, 0.5, 0.5, 0.8]
    targets = crit.Targets(
        labels=jnp.zeros((b, 2), jnp.int32),
        boxes_3d=jnp.zeros((b, 2, 6)),
        boxes_2d=jnp.asarray(boxes2d),
        depth=jnp.asarray([[40.0, 10.0]]),
        size_3d=jnp.zeros((b, 2, 3)),
        heading_bin=jnp.zeros((b, 2), jnp.int32),
        heading_res=jnp.zeros((b, 2)),
        valid=jnp.ones((b, 2), bool))
    logits = jnp.zeros((b, h, w, 81))
    loss = crit.ddn_depth_map_loss(logits, targets, crit.CriterionConfig())
    assert np.isfinite(float(loss)) and float(loss) > 0

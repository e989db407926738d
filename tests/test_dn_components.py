"""DN-DETR denoising machinery tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monosowa_tpu.models import dn_components as dn


def _targets(b=2, m=4, seed=0):
    rng = np.random.default_rng(seed)
    labels = jnp.asarray(rng.integers(0, 3, (b, m)))
    boxes = np.zeros((b, m, 6), np.float32)
    boxes[..., :2] = rng.uniform(0.3, 0.7, (b, m, 2))
    boxes[..., 2:] = rng.uniform(0.05, 0.2, (b, m, 4))
    valid = np.ones((b, m), bool)
    valid[:, -1] = False
    return labels, jnp.asarray(boxes), jnp.asarray(valid)


def test_attn_mask_block_structure():
    mask = np.asarray(dn.build_dn_attn_mask(2, 3, 5))
    assert mask.shape == (11, 11)
    # matchable queries (rows 6..10) cannot see any dn slot
    assert mask[6:, :6].all()
    # matchable see each other
    assert not mask[6:, 6:].any()
    # group 0 sees itself, not group 1
    assert not mask[0:3, 0:3].any()
    assert mask[0:3, 3:6].all()
    # group 1 sees itself, not group 0
    assert not mask[3:6, 3:6].any()
    assert mask[3:6, 0:3].all()
    # dn groups may see matchable part? reference blocks only dn<->dn and
    # match->dn; dn->match stays open
    assert not mask[0:3, 6:].any()


def test_prepare_dn_shapes_and_noise():
    labels, boxes, valid = _targets()
    q = dn.prepare_dn(jax.random.PRNGKey(0), labels, boxes, valid,
                      num_queries=10)
    g, m = 5, 4
    assert q.label_ids.shape == (2, g * m)
    assert q.refpoints.shape == (2, g * m, 6)
    assert q.valid.shape == (2, g * m)
    assert q.attn_mask.shape == (g * m + 10, g * m + 10)
    # boxes stay in [0, 1]
    assert float(jnp.min(q.refpoints)) >= 0.0
    assert float(jnp.max(q.refpoints)) <= 1.0
    # noise actually perturbs most boxes
    tiled = jnp.tile(boxes, (1, g, 1))
    moved = jnp.abs(q.refpoints - tiled).sum(-1) > 1e-6
    assert float(moved.mean()) > 0.9
    # some labels flipped, most kept (scale 0.2)
    tiled_l = jnp.tile(labels, (1, g))
    flip_rate = float((q.label_ids != tiled_l).mean())
    assert 0.02 < flip_rate < 0.35


def test_dn_loss_perfect_predictions_low():
    labels, boxes, valid = _targets()
    g, m = 5, 4
    onehot_logits = (jax.nn.one_hot(jnp.tile(labels, (1, g)), 3) * 12.0
                     - 6.0)
    out = {"pred_logits": onehot_logits,
           "pred_boxes": jnp.tile(boxes, (1, g, 1))}
    losses = dn.dn_loss(out, labels, boxes, valid)
    assert float(losses["tgt_loss_bbox"]) == pytest.approx(0.0, abs=1e-6)
    perfect_ce = float(losses["tgt_loss_ce"])

    bad = {"pred_logits": -onehot_logits,
           "pred_boxes": jnp.tile(boxes, (1, g, 1)) + 0.1}
    losses_bad = dn.dn_loss(bad, labels, boxes, valid)
    assert float(losses_bad["tgt_loss_ce"]) > perfect_ce
    assert float(losses_bad["tgt_loss_bbox"]) > 0.1

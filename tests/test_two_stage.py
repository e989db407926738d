"""Two-stage (encoder-proposal) branch: forward shapes + enc outputs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from monosowa_tpu.models.monodetr import MonoDETR

B, H, W = 2, 96, 160


def _inputs():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    calibs = jnp.asarray(np.tile(np.array(
        [[700.0, 0, W / 2, 0], [0, 700.0, H / 2, 0], [0, 0, 1, 0]],
        np.float32), (B, 1, 1)))
    sizes = jnp.asarray(np.tile([W * 1.0, H * 1.0], (B, 1)))
    return images, calibs, sizes


def test_two_stage_forward():
    model = MonoDETR(enc_layers=1, dec_layers=2, group_num=2, d_model=64,
                     d_ffn=64, nheads=4, num_queries=10, num_depth_bins=16,
                     two_stage=True)
    images, calibs, sizes = _inputs()
    variables = model.init(jax.random.PRNGKey(0), images, calibs, sizes,
                           training=True)
    out = model.apply(variables, images, calibs, sizes, training=True,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    assert out["pred_logits"].shape == (B, 20, 3)
    assert out["pred_boxes"].shape == (B, 20, 6)
    enc = out["enc_outputs"]
    assert enc["pred_logits"].shape[0] == B
    assert enc["pred_boxes"].shape[-1] == 6
    assert np.isfinite(np.asarray(enc["pred_boxes"])).all()
    assert (np.asarray(enc["pred_boxes"]) >= 0).all()
    assert (np.asarray(enc["pred_boxes"]) <= 1).all()

    # eval path
    out_e = model.apply(variables, images, calibs, sizes, training=False)
    assert out_e["pred_logits"].shape == (B, 10, 3)


def test_two_stage_criterion():
    from monosowa_tpu.models.criterion import CriterionConfig, Targets, \
        criterion
    rng = np.random.default_rng(1)
    B_, Q, M, C, S = 2, 8, 3, 3, 32
    out = {
        "pred_logits": jnp.asarray(rng.normal(size=(B_, Q, C)) * 0.1),
        "pred_boxes": jnp.asarray(rng.uniform(0.1, 0.4, (B_, Q, 6))),
        "pred_depth": jnp.asarray(rng.normal(size=(B_, Q, 2))),
        "pred_3d_dim": jnp.asarray(rng.uniform(1, 4, (B_, Q, 3))),
        "pred_angle": jnp.asarray(rng.normal(size=(B_, Q, 24)) * 0.1),
        "pred_depth_map_logits": jnp.asarray(
            rng.normal(size=(B_, 12, 20, 17)) * 0.1),
        "enc_outputs": {
            "pred_logits": jnp.asarray(rng.normal(size=(B_, S, C)) * 0.1),
            "pred_boxes": jnp.asarray(rng.uniform(0.1, 0.4, (B_, S, 6))),
        },
    }
    tg = Targets(
        labels=jnp.asarray(rng.integers(0, C, (B_, M))),
        boxes_3d=jnp.asarray(rng.uniform(0.1, 0.4, (B_, M, 6))),
        boxes_2d=jnp.asarray(rng.uniform(0.1, 0.4, (B_, M, 4))),
        depth=jnp.asarray(rng.uniform(5, 40, (B_, M))),
        size_3d=jnp.asarray(rng.uniform(1, 4, (B_, M, 3))),
        heading_bin=jnp.asarray(rng.integers(0, 12, (B_, M))),
        heading_res=jnp.asarray(rng.uniform(-0.2, 0.2, (B_, M))),
        valid=jnp.asarray(np.ones((B_, M), bool)),
    )
    cfg = CriterionConfig(num_classes=C, num_queries=Q, group_num=1)
    losses = criterion(out, tg, cfg, training=True)
    assert "loss_ce_enc" in losses and "loss_giou_enc" in losses
    assert np.isfinite(float(losses["loss_total"]))


@pytest.mark.slow
def test_two_stage_with_dn():
    from monosowa_tpu.models import dn_components as dn
    model = MonoDETR(enc_layers=1, dec_layers=2, group_num=2, d_model=64,
                     d_ffn=64, nheads=4, num_queries=10, num_depth_bins=16,
                     two_stage=True)
    images, calibs, sizes = _inputs()
    rng = np.random.default_rng(0)
    M = 3
    labels = jnp.asarray(rng.integers(0, 3, (B, M)))
    boxes = np.zeros((B, M, 6), np.float32)
    boxes[..., :2] = rng.uniform(0.3, 0.7, (B, M, 2))
    boxes[..., 2:] = rng.uniform(0.05, 0.2, (B, M, 4))
    q = dn.prepare_dn(jax.random.PRNGKey(0), labels, jnp.asarray(boxes),
                      jnp.asarray(np.ones((B, M), bool)), num_queries=10,
                      cfg=dn.DNConfig(scalar=2))
    variables = model.init(jax.random.PRNGKey(1), images, calibs, sizes,
                           training=True, dn_queries=q)
    out = model.apply(variables, images, calibs, sizes, training=True,
                      dn_queries=q, rngs={"dropout": jax.random.PRNGKey(2)})
    assert out["pred_boxes"].shape == (B, 20, 6)
    assert out["dn_outputs"][-1]["pred_boxes"].shape == (B, 2 * M, 6)
    assert "enc_outputs" in out

"""DN-DETR model wiring: forward with denoising queries."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monosowa_tpu.models import dn_components as dn
from monosowa_tpu.models.monodetr import MonoDETR

B, H, W, M = 2, 96, 160, 4


@pytest.mark.slow
def test_forward_with_dn_queries():
    model = MonoDETR(enc_layers=1, dec_layers=2, group_num=2, d_model=64,
                     d_ffn=64, nheads=4, num_queries=10, num_depth_bins=16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    calibs = jnp.asarray(np.tile(np.array(
        [[700.0, 0, W / 2, 0], [0, 700.0, H / 2, 0], [0, 0, 1, 0]],
        np.float32), (B, 1, 1)))
    sizes = jnp.asarray(np.tile([W * 1.0, H * 1.0], (B, 1)))

    labels = jnp.asarray(rng.integers(0, 3, (B, M)))
    boxes = np.zeros((B, M, 6), np.float32)
    boxes[..., :2] = rng.uniform(0.3, 0.7, (B, M, 2))
    boxes[..., 2:] = rng.uniform(0.05, 0.2, (B, M, 4))
    valid = jnp.asarray(np.ones((B, M), bool))
    q = dn.prepare_dn(jax.random.PRNGKey(0), labels, jnp.asarray(boxes),
                      valid, num_queries=10, cfg=dn.DNConfig(scalar=3))

    variables = model.init(jax.random.PRNGKey(1), images, calibs, sizes,
                           training=True, dn_queries=q)
    out = model.apply(variables, images, calibs, sizes, training=True,
                      dn_queries=q, rngs={"dropout": jax.random.PRNGKey(2)})
    # matchable outputs keep their nominal shape
    assert out["pred_logits"].shape == (B, 10 * 2, 3)
    assert out["pred_boxes"].shape == (B, 10 * 2, 6)
    # dn outputs present per decoder layer
    assert len(out["dn_outputs"]) == 2
    assert out["dn_outputs"][-1]["pred_logits"].shape == (B, 3 * M, 3)
    assert out["dn_outputs"][-1]["pred_boxes"].shape == (B, 3 * M, 6)

    # dn losses compute and are finite
    losses = dn.dn_loss(out["dn_outputs"][-1], labels, jnp.asarray(boxes),
                        valid, dn.DNConfig(scalar=3))
    assert np.isfinite(float(losses["tgt_loss_ce"]))
    assert np.isfinite(float(losses["tgt_loss_bbox"]))

    # eval path (no dn) unaffected
    out_eval = model.apply(variables, images, calibs, sizes, training=False)
    assert out_eval["pred_logits"].shape == (B, 10, 3)
    assert "dn_outputs" not in out_eval

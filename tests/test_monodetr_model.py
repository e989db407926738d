"""MonoDETR forward smoke tests: shapes, aux outputs, train vs eval query
counts, gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monosowa_tpu.models.monodetr import MonoDETR, build_monodetr

B, H, W = 2, 96, 160


def _inputs(b=B):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(b, H, W, 3)).astype(np.float32))
    calibs = jnp.asarray(np.tile(np.array(
        [[700.0, 0, W / 2, 0], [0, 700.0, H / 2, 0], [0, 0, 1, 0]],
        np.float32), (b, 1, 1)))
    img_sizes = jnp.asarray(np.tile(np.array([W, H], np.float32), (b, 1)))
    return images, calibs, img_sizes


@pytest.fixture(scope="module")
def model_and_vars():
    model = MonoDETR(enc_layers=1, dec_layers=2, group_num=2)
    images, calibs, img_sizes = _inputs()
    variables = model.init(jax.random.PRNGKey(0), images, calibs, img_sizes,
                           training=False)
    return model, variables


def test_eval_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    images, calibs, img_sizes = _inputs()
    out = model.apply(variables, images, calibs, img_sizes, training=False)
    nq = model.num_queries
    assert out["pred_logits"].shape == (B, nq, 3)
    assert out["pred_boxes"].shape == (B, nq, 6)
    assert out["pred_3d_dim"].shape == (B, nq, 3)
    assert out["pred_angle"].shape == (B, nq, 24)
    assert out["pred_depth"].shape == (B, nq, 2)
    # stride-16 depth map: H/16 x W/16, bins+1 channels
    assert out["pred_depth_map_logits"].shape == (B, H // 16, W // 16, 81)
    assert len(out["aux_outputs"]) == model.dec_layers - 1
    # boxes are sigmoided into [0, 1]
    assert float(jnp.min(out["pred_boxes"])) >= 0.0
    assert float(jnp.max(out["pred_boxes"])) <= 1.0
    assert np.isfinite(np.asarray(out["pred_depth"])).all()


def test_train_forward_uses_query_groups(model_and_vars):
    model, variables = model_and_vars
    images, calibs, img_sizes = _inputs()
    out = model.apply(variables, images, calibs, img_sizes, training=True,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    assert out["pred_logits"].shape == (B, model.num_queries * model.group_num, 3)


@pytest.mark.slow
def test_gradients_flow_to_backbone(model_and_vars):
    model, variables = model_and_vars
    images, calibs, img_sizes = _inputs()

    def loss_fn(params):
        out = model.apply({"params": params, "frozen": variables["frozen"]},
                          images, calibs, img_sizes, training=False)
        return jnp.sum(out["pred_logits"] ** 2) + jnp.sum(out["pred_depth"] ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # backbone conv1 must receive gradient (end-to-end differentiability)
    g0 = np.asarray(grads["backbone"]["conv1"]["kernel"])
    assert np.abs(g0).max() > 0


def test_build_from_config_dict():
    cfg = {"num_classes": 3, "hidden_dim": 64, "dim_feedforward": 64,
           "nheads": 4, "enc_layers": 1, "dec_layers": 1, "num_queries": 10}
    model = build_monodetr(cfg)
    assert model.d_model == 64 and model.num_queries == 10

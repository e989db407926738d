"""Differential parity: the pure-JAX SAM port vs transformers' torch SAM.

The mask-refinement capability (SURVEY.md §2.1 P6, reference
filtering.py:112-148 ``run_SAM_batch``) is served by
``monosowa_tpu/models/sam.py``.  This test instantiates the installed
``transformers.SamModel`` at a tiny configuration (random weights, eval
mode), imports its state dict through ``import_hf_sam``, and asserts the
box-prompted forward agrees — pinning the windowed/global ViT attention
with decomposed relative positions, the neck's channels-first layernorms,
the tied Fourier prompt table, box corner embeddings, the two-way
transformer (incl. the no-residual first self-attention and the decoder's
ReLU MLPs), mask upscaling and the hypernetwork heads.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from monosowa_tpu.models import sam as sm  # noqa: E402


def _tiny_hf_config():
    return transformers.SamConfig(
        vision_config=dict(
            hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
            image_size=32, patch_size=8, window_size=2,
            global_attn_indexes=[1], output_channels=16, mlp_dim=64,
            num_pos_feats=8),
        prompt_encoder_config=dict(
            hidden_size=16, image_size=32, patch_size=8,
            image_embedding_size=4, num_pos_feats=8),
        mask_decoder_config=dict(
            hidden_size=16, num_attention_heads=2, num_hidden_layers=2,
            mlp_dim=32, iou_head_depth=3, iou_head_hidden_dim=16,
            num_pos_feats=8),
    )


@pytest.fixture(scope="module")
def models():
    hf_cfg = _tiny_hf_config()
    torch.manual_seed(0)
    tm = transformers.SamModel(hf_cfg).eval()
    cfg = sm.config_from_hf_sam(hf_cfg)
    params = sm.import_hf_sam(tm.state_dict(), cfg)
    return tm, cfg, params


def test_vision_encoder_matches_torch(models):
    tm, cfg, params = models
    g = torch.Generator().manual_seed(1)
    x = torch.randn(2, 3, 32, 32, generator=g)
    with torch.no_grad():
        ref = tm.vision_encoder(x).last_hidden_state.numpy()  # (B,C,g,g)
    got = np.asarray(sm.sam_vision_forward(
        params["vision"], jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        cfg.vision)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_box_prompted_masks_match_torch(models):
    tm, cfg, params = models
    g = torch.Generator().manual_seed(2)
    x = torch.randn(2, 3, 32, 32, generator=g)
    boxes = torch.tensor([[[2.0, 3.0, 20.0, 28.0], [8.0, 1.0, 30.0, 12.0]],
                          [[0.0, 0.0, 31.0, 31.0], [5.0, 5.0, 9.0, 22.0]]])
    with torch.no_grad():
        out = tm(pixel_values=x, input_boxes=boxes, multimask_output=False)
    ref_masks = out.pred_masks.numpy()
    ref_iou = out.iou_scores.numpy()

    got_masks, got_iou = sm.sam_predict_boxes(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(boxes.numpy()), cfg, multimask_output=False)
    np.testing.assert_allclose(np.asarray(got_iou), ref_iou,
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_masks), ref_masks,
                               atol=5e-4, rtol=1e-4)


def test_multimask_output_matches_torch(models):
    tm, cfg, params = models
    g = torch.Generator().manual_seed(3)
    x = torch.randn(1, 3, 32, 32, generator=g)
    boxes = torch.tensor([[[4.0, 4.0, 28.0, 24.0]]])
    with torch.no_grad():
        out = tm(pixel_values=x, input_boxes=boxes, multimask_output=True)
    got_masks, got_iou = sm.sam_predict_boxes(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(boxes.numpy()), cfg, multimask_output=True)
    assert got_masks.shape == out.pred_masks.shape  # 3 multimask channels
    np.testing.assert_allclose(np.asarray(got_masks),
                               out.pred_masks.numpy(), atol=5e-4, rtol=1e-4)


def test_refine_backend_contract(models):
    """FlaxSamRefineBackend satisfies MaskRefineBackend: N boxes in ->
    N full-resolution bool masks out, usable through refine_masks."""
    _, cfg, params = models
    from monosowa_tpu.sowa.masks import FlaxSamRefineBackend, refine_masks

    backend = FlaxSamRefineBackend(params, cfg, max_boxes=3)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (24, 40, 3), dtype=np.uint8)
    boxes = np.array([[2, 2, 20, 18], [10, 4, 38, 22], [0, 0, 39, 23],
                      [5, 5, 12, 12]], np.int64)
    masks = backend.refine(img, boxes)
    assert len(masks) == 4
    assert all(m.shape == (24, 40) and m.dtype == bool for m in masks)

    # integration: only above-threshold detections get refined
    coarse = [np.zeros((24, 40), bool) for _ in range(3)]
    for i, b in enumerate(boxes[:3]):
        coarse[i][b[1]:b[3], b[0]:b[2]] = True
    out = refine_masks(coarse, [0.9, 0.5, 0.95], img, backend)
    assert out[1] is coarse[1]          # low score passes through
    assert out[0].shape == (24, 40)

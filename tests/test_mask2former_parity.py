"""Differential parity: the pure-JAX Swin + Mask2Former vs transformers.

The instance-segmentation capability (SURVEY.md §2.1 P6; the reference
runs Detectron2 cascade Mask R-CNN offline and keeps car masks with
score > 0.7) is served by ``monosowa_tpu/models/mask2former.py`` on a
``models/swin.py`` trunk.  This test instantiates the installed torch
models at a tiny configuration (random weights, eval mode), imports the
state dicts through the shipped importers, and asserts agreement — pinning
the shifted-window attention with relative position bias, patch merging,
the deformable-attention pixel decoder (through the repo's tuned
``ops.msda`` kernel), the FPN tail, the masked-attention decoder with its
per-layer binarized attention masks, and the class/mask heads.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from monosowa_tpu.models import mask2former as m2f  # noqa: E402
from monosowa_tpu.models import swin as sw  # noqa: E402


def _tiny_swin():
    return transformers.SwinConfig(
        embed_dim=8, depths=[1, 1, 1, 1], num_heads=[1, 2, 4, 8],
        window_size=2, patch_size=4, image_size=64,
        out_features=["stage1", "stage2", "stage3", "stage4"])


def _tiny_m2f():
    return transformers.Mask2FormerConfig(
        backbone_config=_tiny_swin(), feature_size=32, mask_feature_size=32,
        hidden_dim=32, encoder_layers=2, decoder_layers=4,
        num_attention_heads=2, encoder_feedforward_dim=64,
        dim_feedforward=64, num_queries=10, num_labels=5)


def test_swin_backbone_matches_torch():
    hf_cfg = _tiny_swin()
    torch.manual_seed(0)
    tm = transformers.SwinBackbone(hf_cfg).eval()
    cfg = sw.config_from_hf_swin(hf_cfg)
    params = sw.import_hf_swin_backbone(tm.state_dict(), cfg)
    g = torch.Generator().manual_seed(1)
    # non-square input exercises padding + shifted windows at every stage
    x = torch.randn(2, 3, 64, 48, generator=g)
    with torch.no_grad():
        ref = tm(x).feature_maps
    got = sw.swin_backbone(params,
                           jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), cfg)
    assert len(got) == len(ref) == 4
    for g_, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g_).transpose(0, 3, 1, 2),
                                   r.numpy(), atol=5e-5, rtol=1e-4)


def test_mask2former_matches_torch():
    hf_cfg = _tiny_m2f()
    torch.manual_seed(0)
    tm = transformers.Mask2FormerForUniversalSegmentation(hf_cfg).eval()
    cfg = m2f.config_from_hf_mask2former(hf_cfg)
    params = m2f.import_hf_mask2former(tm.state_dict(), cfg)
    g = torch.Generator().manual_seed(2)
    x = torch.randn(2, 3, 64, 64, generator=g)
    with torch.no_grad():
        ref = tm(pixel_values=x)
    classes, masks = m2f.mask2former_forward(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(np.asarray(classes),
                               ref.class_queries_logits.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(masks),
                               ref.masks_queries_logits.numpy(),
                               atol=5e-3, rtol=1e-3)


def test_mask2former_bf16_forward_stays_bf16():
    """Serving regression: f32 constants (sine positional embeddings,
    reference grids) must not promote the bf16 stream back to f32 — the
    promotion crashed the FPN convs (f32 input x bf16 kernel) and silently
    doubled serving bandwidth before it was pinned here."""
    import jax

    # dtype-propagation only — an even smaller net than the parity tests'
    # (the property is per-layer; depth adds nothing but compile time)
    hf_cfg = transformers.Mask2FormerConfig(
        backbone_config=_tiny_swin(), feature_size=32, mask_feature_size=32,
        hidden_dim=32, encoder_layers=1, decoder_layers=2,
        num_attention_heads=2, encoder_feedforward_dim=32,
        dim_feedforward=32, num_queries=5, num_labels=5)
    torch.manual_seed(0)
    tm = transformers.Mask2FormerForUniversalSegmentation(hf_cfg).eval()
    cfg = m2f.config_from_hf_mask2former(hf_cfg)
    params = m2f.import_hf_mask2former(tm.state_dict(), cfg)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.bfloat16)
        if np.issubdtype(np.asarray(v).dtype, np.floating) else
        jnp.asarray(v), params)
    x = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    classes, masks = m2f.mask2former_forward(params, x, cfg)
    assert classes.dtype == jnp.bfloat16
    assert masks.dtype == jnp.bfloat16


def test_mask_backend_contract():
    """FlaxMask2FormerBackend satisfies MaskBackend: image -> list of bool
    masks at the original resolution, gated by class-prob score."""
    from monosowa_tpu.sowa.masks import FlaxMask2FormerBackend

    hf_cfg = _tiny_m2f()
    torch.manual_seed(1)
    tm = transformers.Mask2FormerForUniversalSegmentation(hf_cfg).eval()
    cfg = m2f.config_from_hf_mask2former(hf_cfg)
    params = m2f.import_hf_mask2former(tm.state_dict(), cfg)

    backend = FlaxMask2FormerBackend(params, cfg, car_label_ids=(2,),
                                     score_threshold=0.0, input_hw=(64, 64))
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (50, 90, 3), dtype=np.uint8)
    masks, scores = backend.predict_masks_scores(img)
    assert len(masks) == len(scores)
    for m in masks:
        assert m.shape == (50, 90) and m.dtype == bool
    # threshold 1.0 filters everything
    backend.score_threshold = 1.1
    assert backend.predict_masks(img) == []

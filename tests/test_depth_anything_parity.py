"""Differential parity: the JAX DINOv2+DPT depth stack vs transformers.

The pseudo-label pipeline's depth capability (SURVEY.md §2.4.8, P5) is a
frozen DINOv2-trunk depth network.  ``monosowa_tpu.models.depth_anything``
is the TPU-served implementation; this test runs the installed
``transformers`` torch models (randomly initialized, eval mode) at a tiny
configuration, imports their state dicts through the shipped importers, and
asserts output agreement — pinning the patch embed, bicubic position
resampling (plain and antialiased), pre-norm attention with layer scale,
GELU/SwiGLU FFNs, the DPT reassemble/fusion/head (incl. the
align_corners=True bilinear semantics), and both OIHW->HWIO conv and
IOHW->HWIO transposed-conv weight mappings.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from monosowa_tpu.models import depth_anything as da  # noqa: E402
from monosowa_tpu.models import dinov2 as dn  # noqa: E402


def _tiny_hf_dinov2(use_swiglu=False, image_size=28):
    return transformers.Dinov2Config(
        image_size=image_size, patch_size=14, hidden_size=32,
        num_hidden_layers=4, num_attention_heads=2, mlp_ratio=4,
        use_swiglu_ffn=use_swiglu, out_indices=[1, 2, 3, 4],
        apply_layernorm=True, reshape_hidden_states=False)


def _torch_input(shape, seed=0):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g)


def test_depth_anything_forward_matches_torch():
    hf_bb = _tiny_hf_dinov2()
    hf_cfg = transformers.DepthAnythingConfig(
        backbone_config=hf_bb, patch_size=14, reassemble_hidden_size=32,
        reassemble_factors=[4, 2, 1, 0.5], neck_hidden_sizes=[8, 16, 24, 32],
        fusion_hidden_size=16, head_hidden_size=8)
    torch.manual_seed(0)
    tm = transformers.DepthAnythingForDepthEstimation(hf_cfg).eval()

    # 56x70 -> 4x5 patch grid != the 2x2 stored pos grid: exercises the
    # torch-exact (A=-0.75) bicubic position resampling.
    x = _torch_input((2, 3, 56, 70))
    with torch.no_grad():
        ref = tm(pixel_values=x).predicted_depth.numpy()

    cfg = da.config_from_hf_depth_anything(hf_cfg)
    params = da.import_hf_depth_anything(tm.state_dict(), cfg)
    got = np.asarray(da.depth_anything_forward(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), cfg))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_depth_anything_no_pos_interp_path():
    """Square input matching the stored grid skips interpolation entirely
    (the torch fast path) — both paths must agree with torch."""
    hf_bb = _tiny_hf_dinov2()
    hf_cfg = transformers.DepthAnythingConfig(
        backbone_config=hf_bb, patch_size=14, reassemble_hidden_size=32,
        reassemble_factors=[4, 2, 1, 0.5], neck_hidden_sizes=[8, 16, 24, 32],
        fusion_hidden_size=16, head_hidden_size=8)
    torch.manual_seed(1)
    tm = transformers.DepthAnythingForDepthEstimation(hf_cfg).eval()
    x = _torch_input((1, 3, 28, 28), seed=3)
    with torch.no_grad():
        ref = tm(pixel_values=x).predicted_depth.numpy()
    cfg = da.config_from_hf_depth_anything(hf_cfg)
    params = da.import_hf_depth_anything(tm.state_dict(), cfg)
    got = np.asarray(da.depth_anything_forward(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), cfg))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_dinov2_swiglu_registers_matches_torch():
    """Metric3D-style trunk: SwiGLU FFN + register tokens + the antialiased
    (A=-0.5, weight-normalized) bicubic position resampling."""
    hf_cfg = transformers.Dinov2WithRegistersConfig(
        image_size=28, patch_size=14, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=2, mlp_ratio=4, use_swiglu_ffn=True,
        num_register_tokens=4)
    torch.manual_seed(2)
    tm = transformers.Dinov2WithRegistersModel(hf_cfg).eval()
    # non-square grid forces the AA interpolation path
    x = _torch_input((2, 3, 28, 42), seed=5)
    with torch.no_grad():
        ref = tm(pixel_values=x).last_hidden_state.numpy()

    cfg = dn.config_from_hf(hf_cfg)
    assert cfg.use_swiglu_ffn and cfg.num_register_tokens == 4
    params = dn.import_hf_dinov2(tm.state_dict(), cfg)
    got = np.asarray(dn.dinov2_features(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), cfg,
        out_indices=[cfg.num_hidden_layers], apply_layernorm=True)[0])
    assert got.shape == ref.shape  # cls + 4 registers + 2*3 patches
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_flax_depth_backend_canonical_contract():
    """The served backend satisfies the pipeline's canonical-depth contract
    (sowa/depth.py module docstring): metric = canonical * fx / 1000, at the
    original image resolution."""
    from monosowa_tpu.sowa.depth import (CANONICAL_FOCAL,
                                         FlaxDepthAnythingBackend,
                                         pseudo_lidar_from_depth)

    bb = dn.Dinov2Config(hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, pos_grid=2)
    cfg = da.DepthAnythingConfig(
        backbone=bb, out_indices=(1, 2), reassemble_factors=(4.0, 0.5),
        neck_hidden_sizes=(8, 16), fusion_hidden_size=16, head_hidden_size=8,
        depth_estimation_type="metric", max_depth=80.0)
    params = da.init_depth_anything_params(0, cfg)
    fx = 721.5
    backend = FlaxDepthAnythingBackend(params, cfg, fx=fx, input_size=56)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (75, 242, 3), dtype=np.uint8)
    canonical = backend.predict_depth(img)
    metric = backend.predict_metric_depth(img)
    assert canonical.shape == img.shape[:2]
    assert float(metric.min()) >= 0.0 and float(metric.max()) <= 80.0
    np.testing.assert_allclose(canonical * fx / CANONICAL_FOCAL, metric,
                               atol=1e-4)

    p2 = np.array([[fx, 0, 120.0, 0], [0, fx, 35.0, 0], [0, 0, 1, 0]],
                  np.float32)
    pts = pseudo_lidar_from_depth(canonical, p2)
    assert pts.shape[1] == 3 and len(pts) > 0

    relative = da.DepthAnythingConfig(
        backbone=bb, out_indices=(1, 2), reassemble_factors=(4.0, 0.5),
        neck_hidden_sizes=(8, 16), fusion_hidden_size=16, head_hidden_size=8)
    with pytest.raises(ValueError):
        FlaxDepthAnythingBackend(params, relative, fx=fx)


def test_resize_matrices_match_torch_exactly():
    g = torch.Generator().manual_seed(7)
    x = torch.randn(1, 4, 6, 9, generator=g)
    from monosowa_tpu.ops.resize import (resize_bicubic_torch,
                                         resize_bilinear_torch)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    for out_hw, mode, ac, aa in [
            ((11, 13), "bilinear", False, False),
            ((11, 13), "bilinear", True, False),
            ((3, 5), "bilinear", True, False),
            ((13, 17), "bicubic", False, False),
            ((4, 5), "bicubic", False, False),
            ((13, 17), "bicubic", False, True),
            ((4, 5), "bicubic", False, True)]:
        ref = torch.nn.functional.interpolate(
            x, size=out_hw, mode=mode, align_corners=ac or None,
            antialias=aa).numpy()
        fn = resize_bilinear_torch if mode == "bilinear" \
            else resize_bicubic_torch
        kw = {"align_corners": ac} if not aa else {"antialias": True}
        got = np.asarray(fn(xj, out_hw, **kw)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

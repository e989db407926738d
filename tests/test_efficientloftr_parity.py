"""Differential parity: the pure-JAX EfficientLoFTR vs transformers.

The stitching matcher capability (SURVEY.md §2.1 P22, reference
stitching.py:29-151 uses kornia LoFTR) is served by
``monosowa_tpu/models/efficientloftr.py``.  The coarse path (fused RepVGG
backbone, RoPE'd aggregated attention, dual-softmax mutual-nearest
matching) is tested against the STOCK transformers implementation.  The
fine refinement is tested against an oracle subclass that corrects two
internal inconsistencies in transformers 4.57.6 (see the module docstring
of the port): the first-stage delta gather over the wrong axis and the
first-stage dual-softmax over (keypoint, win0) instead of (win0, win1).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from monosowa_tpu.models import efficientloftr as elo  # noqa: E402


def _tiny_hf_config():
    return transformers.EfficientLoFTRConfig(
        stage_num_blocks=[1, 1, 1, 1], out_features=[4, 8, 16, 32],
        stage_stride=[2, 1, 2, 2], hidden_size=32, num_attention_heads=2,
        num_attention_layers=2, partial_rotary_factor=1.0,
        fine_kernel_size=8, fine_matching_slice_dim=4,
        coarse_matching_threshold=1e-6)  # random weights -> tiny dual-softmax



class _FixedFineLoFTR(
        transformers.EfficientLoFTRForKeypointMatching):
    """Oracle with the two fine-stage lines corrected (gather over the
    window axis; dual-softmax over the two window axes)."""

    def _get_first_stage_fine_matching(self, fine_confidence,
                                       coarse_matched_keypoints,
                                       fine_window_size, fine_scale):
        from transformers.models.efficientloftr.modeling_efficientloftr \
            import create_meshgrid
        batch_size, num_keypoints, _, _ = fine_confidence.shape
        fine_kernel_size = int(fine_window_size ** 0.5)
        fine_confidence = fine_confidence.reshape(batch_size, num_keypoints,
                                                  -1)
        _, indices = torch.max(fine_confidence, dim=-1)
        indices = indices[..., None]
        indices_0 = indices // fine_window_size
        indices_1 = indices % fine_window_size
        grid = create_meshgrid(fine_kernel_size, fine_kernel_size,
                               normalized_coordinates=False,
                               device=fine_confidence.device,
                               dtype=fine_confidence.dtype)
        grid = grid - (fine_kernel_size // 2) + 0.5
        grid = grid.reshape(1, 1, -1, 2).expand(batch_size, num_keypoints,
                                                -1, -1)
        # FIX: gather over the window axis (dim=2), not the keypoint axis
        delta_0 = torch.gather(
            grid, 2, indices_0.unsqueeze(-1).expand(-1, -1, -1, 2)
        ).squeeze(2)
        delta_1 = torch.gather(
            grid, 2, indices_1.unsqueeze(-1).expand(-1, -1, -1, 2)
        ).squeeze(2)
        fine_matches_0 = coarse_matched_keypoints[:, 0] + delta_0 * fine_scale
        fine_matches_1 = coarse_matched_keypoints[:, 1] + delta_1 * fine_scale
        indices = torch.stack([indices_0, indices_1], dim=1)
        fine_matches = torch.stack([fine_matches_0, fine_matches_1], dim=1)
        return indices, fine_matches

    def _fine_matching(self, fine_features_0, fine_features_1,
                       coarse_matched_keypoints, fine_scale):
        import torch.nn as nn
        batch_size, num_keypoints, fine_window_size, fine_embed_dim = \
            fine_features_0.shape
        slice_dim = self.config.fine_matching_slice_dim
        fine_kernel_size = int(fine_window_size ** 0.5)
        split_0 = torch.split(fine_features_0, fine_embed_dim - slice_dim, -1)
        split_1 = torch.split(fine_features_1, fine_embed_dim - slice_dim, -1)
        f0, f1 = split_0[0], split_1[0]
        f0 = f0 / f0.shape[-1] ** 0.5
        f1 = f1 / f1.shape[-1] ** 0.5
        conf = f0 @ f1.transpose(-1, -2)
        # FIX: dual-softmax over the two window axes (2, 3), not (1, 2)
        conf = nn.functional.softmax(conf, 2) * nn.functional.softmax(conf, 3)
        conf = conf.reshape(batch_size, num_keypoints, fine_window_size,
                            fine_kernel_size + 2, fine_kernel_size + 2)
        conf = conf[..., 1:-1, 1:-1]
        conf = conf.reshape(batch_size, num_keypoints, fine_window_size,
                            fine_window_size)
        fine_indices, fine_matches = self._get_first_stage_fine_matching(
            conf, coarse_matched_keypoints, fine_window_size, fine_scale)
        s0, s1 = split_0[1], split_1[1]
        s1 = s1 / slice_dim ** 0.5
        second = s0 @ s1.transpose(-1, -2)
        return self._get_second_stage_fine_matching(
            fine_indices, fine_matches, second, fine_window_size, fine_scale)


@pytest.fixture(scope="module")
def setup():
    hf_cfg = _tiny_hf_config()
    torch.manual_seed(0)
    stock = transformers.EfficientLoFTRForKeypointMatching(hf_cfg).eval()
    fixed = _FixedFineLoFTR(hf_cfg).eval()
    fixed.load_state_dict(stock.state_dict())
    cfg = elo.config_from_hf_efficientloftr(hf_cfg)
    params = elo.import_hf_efficientloftr(stock.state_dict(), cfg)
    g = torch.Generator().manual_seed(1)
    gray = torch.rand(1, 2, 1, 64, 64, generator=g)
    pixels = gray.expand(-1, -1, 3, -1, -1).contiguous()
    return stock, fixed, cfg, params, pixels


def test_backbone_and_transformer_match_stock(setup):
    stock, _, cfg, params, pixels = setup
    with torch.no_grad():
        feats = stock.efficientloftr(
            pixels).feature_maps  # (coarse(B,2,C,h,w), stage2, stage3)
    x = pixels[:, :, 0].reshape(2, 64, 64, 1).numpy()
    jf = elo.repvgg_forward(params["backbone"], jnp.asarray(x), cfg)
    # residual features vs stock (BN-folded conv => small tolerance)
    np.testing.assert_allclose(
        np.asarray(jf[0]).transpose(0, 3, 1, 2), feats[1].numpy(),
        atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(jf[1]).transpose(0, 3, 1, 2), feats[2].numpy(),
        atol=5e-4, rtol=1e-3)

    coarse = jf[-1].reshape(1, 2, 8, 8, 32)
    ah = (8 - cfg.q_aggregation_kernel_size) // cfg.q_aggregation_stride + 1
    cos, sin = elo._rope_tables(cfg, ah, ah)
    out = elo.local_feature_transformer(
        params["transformer"], coarse, (jnp.asarray(cos), jnp.asarray(sin)),
        cfg)
    ref = feats[0].numpy()  # (B, 2, C, h, w)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 1, 4, 2, 3), ref, atol=2e-3, rtol=1e-2)


def test_coarse_matching_matches_stock(setup):
    stock, _, cfg, params, pixels = setup
    with torch.no_grad():
        ref = stock(pixel_values=pixels)
    kp, scores, matches = elo.match_pair(
        params, jnp.asarray(pixels[:, :, 0].numpy()), cfg)
    np.testing.assert_array_equal(np.asarray(matches), ref.matches.numpy())
    np.testing.assert_allclose(np.asarray(scores),
                               ref.matching_scores.numpy(),
                               atol=1e-4, rtol=1e-3)


def test_fine_keypoints_match_fixed_oracle(setup):
    _, fixed, cfg, params, pixels = setup
    with torch.no_grad():
        ref = fixed(pixel_values=pixels)
    kp, scores, matches = elo.match_pair(
        params, jnp.asarray(pixels[:, :, 0].numpy()), cfg)
    m = ref.matches.numpy() >= 0
    got = np.asarray(kp)[m]
    want = ref.keypoints.numpy()[m]
    assert m.sum() > 0
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_matcher_backend_pairing(setup):
    """FlaxLoFTRMatcherBackend contract: the returned (src, dst) pairs are
    exactly the model's mutual-nearest matches paired through the match
    index (slot j in direction 0 pairs kp[0][j] with kp[1][matches[0][j]]),
    mapped back to original pixel coordinates.

    (A trained-weights functional check — recovering a known translation —
    is impossible here: random-weight RoPE features match by position.)"""
    _, _, cfg, params, _ = setup
    from monosowa_tpu.sowa.stitching import FlaxLoFTRMatcherBackend

    backend = FlaxLoFTRMatcherBackend(params, cfg, input_hw=(64, 64),
                                      min_confidence=1e-6)
    rng = np.random.default_rng(3)
    img_a = rng.integers(0, 255, (100, 130, 3), dtype=np.uint8)
    img_b = rng.integers(0, 255, (100, 130, 3), dtype=np.uint8)
    src, dst = backend.match(img_a, img_b)
    assert len(src) == len(dst) and len(src) >= 4

    # re-derive the expected pairs from the raw model outputs
    pair = np.stack([backend._gray(img_a), backend._gray(img_b)])[None]
    kp, scores, matches = elo.match_pair(params, jnp.asarray(pair), cfg)
    kp, scores, matches = (np.asarray(kp[0]), np.asarray(scores[0]),
                           np.asarray(matches[0]))
    keep = np.flatnonzero((matches[0] >= 0) & (scores[0] > 1e-6))
    want_src = kp[0][keep] * [130, 100]
    want_dst = kp[1][matches[0][keep]] * [130, 100]
    np.testing.assert_allclose(src, want_src, atol=1e-4)
    np.testing.assert_allclose(dst, want_dst, atol=1e-4)
    # NOTE: mutual-NN symmetry (matches[1][matches[0][j]] == j) holds for
    # trained confidence landscapes but not for random weights, whose
    # near-uniform dual-softmax scores tie everywhere — not asserted here.


def test_stock_fine_bug_is_real():
    """Regression guard for the documented divergence: if a future
    transformers release fixes the gather axis, this test will fail and the
    port's oracle patching should be removed."""
    from transformers.models.efficientloftr.modeling_efficientloftr import \
        create_meshgrid
    grid = create_meshgrid(4, 4, normalized_coordinates=False) - 2 + 0.5
    grid = grid.reshape(1, 1, -1, 2).expand(1, 30, -1, -1)
    idx = torch.arange(30).reshape(1, 30, 1) % 16
    out = torch.gather(grid, 1, idx.unsqueeze(-1).expand(-1, -1, -1, 2))
    assert torch.all(out == out[0, 0, 0])  # constant => still buggy

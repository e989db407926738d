"""Differential parity: ``sowa/depth.py`` vs the reference's own
``Metric3D.encode_img`` / ``decode_img`` / ``compute_pseudo_lidar``
(pseudo_label_generator/3d/scripts/metric3d.py:280-345) running the
reference's OWN code on torch CPU (``Tensor.cuda`` patched to identity;
the torch-hub ViT itself is replaced by a shared deterministic fake on
BOTH sides — the geometry/normalization math is what's under test).

Covers the round-2 bug this parity sweep caught: de-canonicalization uses
the SCALED intrinsic (``depth * fx*scale / 1000``), so a backend that
returns canonical depth at the original resolution must fold the encode
resize factor in MULTIPLICATIVELY (``d * scale``), not divide by it.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ref_pipeline_harness as harness

pytestmark = pytest.mark.skipif(not harness.reference_available(),
                                reason="reference checkout not present")

# KITTI raw cam2: odd size so resize/pad hit fractional scale + both-side pads
SIZES = [(375, 1242), (370, 1226)]
INTR = [721.5377, 721.5377, 609.5593, 172.854]


@pytest.fixture(scope="module")
def ref_metric3d():
    harness.install_stubs()
    if harness.REF_SCRIPTS not in sys.path:
        sys.path.insert(0, harness.REF_SCRIPTS)
    import metric3d as ref_mod

    import torch

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    obj = object.__new__(ref_mod.Metric3D)  # encode/decode use no self state
    yield obj
    torch.Tensor.cuda = orig_cuda


def _rand_img(h, w, seed):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8)


def _canonical_depth(seed, shape=(616, 1064)):
    """Smooth synthetic canonical depth with spatial structure."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float32)
    d = (30.0 + 20.0 * np.sin(x / 97.0 + rng.uniform(0, 6)) *
         np.cos(y / 53.0 + rng.uniform(0, 6)) + 0.01 * y)
    return d.astype(np.float32)


def test_encode_parity(ref_metric3d):
    from monosowa_tpu.sowa import depth as depth_mod

    for i, (h, w) in enumerate(SIZES):
        img = _rand_img(h, w, 7 + i)
        ref_t, ref_pad, ref_intr = ref_metric3d.encode_img(img, list(INTR))
        chw, pad_info, intr_s, scale = depth_mod.encode_image(img, INTR)
        assert pad_info == ref_pad
        np.testing.assert_allclose(intr_s, ref_intr, rtol=1e-12)
        np.testing.assert_allclose(chw, ref_t.squeeze(0).numpy(),
                                   rtol=0, atol=1e-5)
        assert scale == min(616 / h, 1064 / w)


def test_decode_lift_parity(ref_metric3d):
    import torch

    import jax.numpy as jnp

    from monosowa_tpu.sowa import depth as depth_mod

    for i, (h, w) in enumerate(SIZES):
        img = _rand_img(h, w, 11 + i)
        _, pad_info, intr_s, _ = depth_mod.encode_image(img, INTR)
        pred = _canonical_depth(23 + i)
        ref_pts, ref_metric = ref_metric3d.decode_img(
            torch.from_numpy(pred)[None, None], list(pad_info),
            list(intr_s), img, list(INTR))
        pts, metric = depth_mod.metric3d_decode_lift(
            jnp.asarray(pred), tuple(pad_info), (h, w),
            jnp.float32(intr_s[0]), jnp.asarray(INTR, jnp.float32))
        np.testing.assert_allclose(np.asarray(metric), ref_metric,
                                   rtol=2e-5, atol=2e-4)
        assert pts.shape == ref_pts.shape == (h * w, 3)
        np.testing.assert_allclose(np.asarray(pts), ref_pts,
                                   rtol=2e-5, atol=5e-4)


class _FakeViT:
    """Deterministic stand-in for the Metric3D model: canonical depth as a
    smooth function of the (already encoded+normalized) input tensor."""

    @staticmethod
    def depth_from_chw(chw):
        m = np.mean(np.asarray(chw, np.float32), axis=0)
        return (25.0 + 10.0 * np.tanh(m)).astype(np.float32)

    def inference(self, batch):
        import torch

        x = batch["input"].squeeze(0).cpu().numpy()
        return torch.from_numpy(self.depth_from_chw(x)), None, None


def test_compute_pseudo_lidar_parity(ref_metric3d):
    """End-to-end encode->model->decode vs the reference's
    compute_pseudo_lidar with the identical fake network on both sides."""
    from monosowa_tpu.sowa import depth as depth_mod

    ref_metric3d.metric3d_model = _FakeViT()
    for i, (h, w) in enumerate(SIZES):
        img = _rand_img(h, w, 31 + i)
        ref_pts, ref_metric = ref_metric3d.compute_pseudo_lidar(
            img, list(INTR))
        pts, metric = depth_mod.compute_pseudo_lidar(
            img, INTR, _FakeViT.depth_from_chw)
        np.testing.assert_allclose(metric, ref_metric, rtol=2e-5, atol=2e-4)
        np.testing.assert_allclose(pts, ref_pts, rtol=2e-5, atol=5e-4)


def test_torchhub_backend_decanonicalization(ref_metric3d):
    """predict_depth's contract: metric = predict_depth(img) * fx/1000 must
    equal the reference's upsampled * fx_scaled/1000 (catches the former
    d / scale direction bug: off by scale^2 ~ 0.63x on KITTI)."""
    from monosowa_tpu.sowa import depth as depth_mod

    backend = object.__new__(depth_mod.TorchHubMetric3DBackend)
    fake = _FakeViT()
    backend._infer_canonical = lambda chw: fake.depth_from_chw(chw)

    h, w = SIZES[0]
    img = _rand_img(h, w, 41)
    ref_metric3d.metric3d_model = fake
    _, ref_metric = ref_metric3d.compute_pseudo_lidar(img, list(INTR))

    d = backend.predict_depth(img)
    metric = np.clip(d * INTR[0] / depth_mod.CANONICAL_FOCAL, 0,
                     depth_mod.MAX_DEPTH)
    # predict_depth upsamples with cv2 (host path) vs the reference's torch
    # bilinear: same half-pixel sampling, different accumulation order ->
    # sub-mm disagreement on a handful of pixels. 1 mm tolerance (the
    # former direction bug this guards against is a 37% depth error).
    np.testing.assert_allclose(metric, ref_metric, rtol=0, atol=1e-3)

    p2 = np.array([[INTR[0], 0, INTR[2], 0], [0, INTR[1], INTR[3], 0],
                   [0, 0, 1, 0]])
    pts = depth_mod.pseudo_lidar_from_depth(d, p2)
    assert pts.shape[0] == h * w  # all synthetic depths positive
    ref_pts, _ = ref_metric3d.compute_pseudo_lidar(img, list(INTR))
    np.testing.assert_allclose(pts, ref_pts, rtol=0, atol=2e-3)

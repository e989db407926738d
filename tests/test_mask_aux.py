"""Silhouette splatting + mask loss tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monosowa_tpu.models import mask_aux
from monosowa_tpu.sowa.templates import TemplateBank

CALIB = jnp.asarray(np.array([[250.0, 0, 200, 0], [0, 250.0, 90, 0],
                              [0, 0, 1, 0]], np.float32))
# original 400x180 image px -> 100x45 mask grid (identity affine / stride 4)
GRID = jnp.asarray(np.array([[0.25, 0, 0], [0, 0.25, 0]], np.float32))
H, W = 45, 100


def _sil(offset_x=0.0):
    bank = TemplateBank.default()
    pts = bank.points[0] + np.array([offset_x, 0.9, 12.0])
    return mask_aux.splat_silhouette(jnp.asarray(pts[None].astype(np.float32)),
                                     CALIB, GRID, H, W)


def test_silhouette_covers_projection():
    sil = np.asarray(_sil())[0]
    assert sil.shape == (H, W)
    assert sil.max() > 0.9          # dense center saturates
    assert sil.mean() < 0.5         # but not everywhere
    # car at x=0, z=12 centered -> silhouette mass near image center cols
    cols = sil.sum(0)
    assert abs(np.argmax(cols) - W / 2) < W / 6


def test_mask_loss_prefers_aligned_pose():
    target = np.asarray(_sil(0.0))[0] > 0.5
    target = jnp.asarray(target[None].astype(np.float32))
    valid = jnp.asarray([True])
    for kind in ("BCE", "DICE"):
        l_good = float(mask_aux.mask_loss(_sil(0.0), target, valid, kind))
        l_bad = float(mask_aux.mask_loss(_sil(1.5), target, valid, kind))
        assert l_good < l_bad, kind


def test_mask_loss_gradient_flows():
    target = jnp.asarray((np.asarray(_sil(0.0))[0] > 0.5)[None]
                         .astype(np.float32))
    bank = TemplateBank.default()
    base = jnp.asarray((bank.points[0] + np.array([0.7, 0.9, 12.0]))[None]
                       .astype(np.float32))

    def f(offset):
        sil = mask_aux.splat_silhouette(base + offset, CALIB, GRID, H, W)
        return mask_aux.mask_loss(sil, target, jnp.asarray([True]))

    g = jax.grad(f)(jnp.zeros(3))
    # gradient should push x toward the target (negative x direction)
    assert float(g[0]) > 0

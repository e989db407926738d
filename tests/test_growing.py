"""CAAR growing: RANSAC plane + connected components on synthetic scenes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monosowa_tpu.sowa import growing


def test_ransac_recovers_ground_plane():
    rng = np.random.default_rng(0)
    ground = np.stack([rng.uniform(-10, 10, 800),
                       np.full(800, 1.65) + rng.normal(scale=0.02, size=800),
                       rng.uniform(0, 30, 800)], 1).astype(np.float32)
    car = np.stack([rng.uniform(-1, 1, 200),
                    rng.uniform(0.2, 1.4, 200),
                    rng.uniform(10, 14, 200)], 1).astype(np.float32)
    pts = np.concatenate([ground, car])
    mask = np.ones(len(pts), bool)
    abcd, inliers = growing.ransac_plane(jnp.asarray(pts), jnp.asarray(mask),
                                         jax.random.PRNGKey(0))
    abcd = np.asarray(abcd)
    # plane ~ y = 1.65: normal ~ (0, +-1, 0)
    assert abs(abcd[1]) > 0.99
    assert int(inliers) > 700
    keep = np.asarray(growing.remove_plane_points(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(abcd)))
    assert keep[:800].mean() < 0.1      # ground removed
    assert keep[800:].mean() > 0.8      # car survives


def test_connected_components_two_clusters():
    rng = np.random.default_rng(1)
    a = rng.normal(scale=0.1, size=(100, 3))
    b = rng.normal(scale=0.1, size=(100, 3)) + 5.0
    pts = np.concatenate([a, b]).astype(np.float32)
    mask = np.ones(200, bool)
    labels = np.asarray(growing.connected_components(
        jnp.asarray(pts), jnp.asarray(mask), 0.5))
    assert len(np.unique(labels[:100])) == 1
    assert len(np.unique(labels[100:])) == 1
    assert labels[0] != labels[150]


def test_grow_mask_keeps_car_component():
    rng = np.random.default_rng(2)
    car = rng.normal(scale=0.3, size=(150, 3)).astype(np.float32)
    wall = (rng.normal(scale=0.3, size=(150, 3))
            + np.array([8.0, 0, 0])).astype(np.float32)
    pts = np.concatenate([car, wall])
    mask = np.ones(300, bool)
    car_mask = np.zeros(300, bool)
    car_mask[:150] = True
    keep = np.asarray(growing.grow_mask(jnp.asarray(pts), jnp.asarray(mask),
                                        jnp.asarray(car_mask),
                                        jnp.float32(0.5)))
    assert keep[:150].all()
    assert not keep[150:].any()


def test_grow_mask_rejects_leaky_region():
    # car points bridged to a big background blob -> overlap < 0.95 -> drop
    rng = np.random.default_rng(3)
    car = rng.normal(scale=0.3, size=(50, 3)).astype(np.float32)
    bg = (rng.normal(scale=0.3, size=(500, 3))
          + np.array([0.8, 0, 0])).astype(np.float32)
    pts = np.concatenate([car, bg])
    mask = np.ones(550, bool)
    car_mask = np.zeros(550, bool)
    car_mask[:50] = True
    keep = np.asarray(growing.grow_mask(jnp.asarray(pts), jnp.asarray(mask),
                                        jnp.asarray(car_mask),
                                        jnp.float32(0.6)))
    assert keep.sum() == 0


def test_perform_growing_end_to_end():
    rng = np.random.default_rng(4)
    ground = np.stack([rng.uniform(-10, 10, 600),
                       np.full(600, 1.65) + rng.normal(scale=0.01, size=600),
                       rng.uniform(0, 30, 600)], 1).astype(np.float32)
    car = np.stack([rng.uniform(-0.8, 0.8, 200),
                    rng.uniform(0.3, 1.4, 200),
                    rng.uniform(10, 13.5, 200)], 1).astype(np.float32)
    pts = np.concatenate([ground, car])
    mask = np.ones(len(pts), bool)
    car_mask = np.zeros(len(pts), bool)
    # frustum covers 95% of the car; growing recovers the missed tail
    car_mask[600:790] = True
    keep = np.asarray(growing.perform_growing(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(car_mask),
        jax.random.PRNGKey(1)))
    assert keep[600:790].mean() > 0.9   # frustum points kept
    assert keep[790:].sum() > 0         # some non-frustum car points grown in
    assert keep[:600].mean() < 0.1      # ground gone

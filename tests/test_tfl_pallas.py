"""Pallas TFL kernel vs the XLA oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.ops import tfl
from monosowa_tpu.ops.tfl_pallas import binary_both_way_counts_pallas


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("t", [100, 256, 300])
def test_pallas_matches_xla_oracle(seed, t):
    rng = np.random.default_rng(seed)
    s = 512
    scan = rng.normal(scale=1.5, size=(s, 3)).astype(np.float32)
    mask = np.ones(s, bool)
    mask[400:] = False
    scan[400:] = 77.0  # padded garbage
    poses = rng.normal(scale=1.5, size=(4, t, 3)).astype(np.float32)
    # plant overlap so counts are non-trivial
    poses[0, :50] = scan[:50] + rng.normal(scale=0.05, size=(50, 3))

    tf_p, sf_p = binary_both_way_counts_pallas(
        jnp.asarray(scan), jnp.asarray(mask), jnp.asarray(poses), 0.2,
        interpret=True)
    tf_x, sf_x = tfl.binary_both_way_counts(
        jnp.asarray(scan), jnp.asarray(mask), jnp.asarray(poses), 0.2)
    np.testing.assert_allclose(np.asarray(tf_p), np.asarray(tf_x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sf_p), np.asarray(sf_x), atol=1e-6)
    assert float(tf_p[0]) > 0  # planted overlap registered

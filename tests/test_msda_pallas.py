"""Pallas MSDA vs the XLA core (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.ops.msda import ms_deform_attn
from monosowa_tpu.ops.msda_pallas import ms_deform_attn_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_msda_matches_xla(seed):
    rng = np.random.default_rng(seed)
    shapes = ((6, 8), (3, 4))
    b, m, d, q, p = 2, 4, 8, 10, 3
    total = sum(h * w for h, w in shapes)
    value = rng.normal(size=(b, total, m, d)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, size=(b, q, m, len(shapes), p, 2)
                      ).astype(np.float32)
    w_ = rng.uniform(size=(b, q, m, len(shapes), p)).astype(np.float32)
    w_ /= w_.reshape(b, q, m, -1).sum(-1).reshape(b, q, m, 1, 1)

    got = np.asarray(ms_deform_attn_pallas(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w_),
        block_q=4, interpret=True))
    want = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                     jnp.asarray(loc), jnp.asarray(w_)))
    # bf16 value quantization inside the kernel bounds the tolerance
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-2)


def test_pallas_msda_query_padding():
    rng = np.random.default_rng(3)
    shapes = ((4, 4),)
    b, m, d, q, p = 1, 2, 4, 5, 2   # q=5 pads to block_q=4 -> 8
    value = rng.normal(size=(b, 16, m, d)).astype(np.float32)
    loc = rng.uniform(0.2, 0.8, size=(b, q, m, 1, p, 2)).astype(np.float32)
    w_ = np.full((b, q, m, 1, p), 0.5, np.float32)
    got = ms_deform_attn_pallas(jnp.asarray(value), shapes, jnp.asarray(loc),
                                jnp.asarray(w_), block_q=4, interpret=True)
    assert got.shape == (b, q, m * d)
    want = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc),
                          jnp.asarray(w_))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2,
                               rtol=1e-2)

"""Pallas MXU one-hot MSDA forward vs the XLA core (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from monosowa_tpu.ops.msda import ms_deform_attn
from monosowa_tpu.ops.msda_mxu import ms_deform_attn_mxu

SHAPES = ((12, 20), (6, 10), (3, 5))


@pytest.mark.parametrize("q,skip", [(37, False), (256, False), (256, True),
                                    (37, "dynamic"), (256, "dynamic"),
                                    (37, "win2"), (256, "win2"),
                                    (37, "gather2"), (256, "gather4")])
def test_mxu_fwd_matches_xla(q, skip):
    rng = np.random.default_rng(0)
    b, m, d, p = 2, 4, 8, 4
    s = sum(h * w for h, w in SHAPES)
    value = jnp.asarray(rng.normal(size=(b, s, m, d)).astype(np.float32))
    loc = jnp.asarray(
        rng.uniform(-0.1, 1.1, (b, q, m, len(SHAPES), p, 2))
        .astype(np.float32))
    w = jnp.asarray(
        rng.uniform(0, 1, (b, q, m, len(SHAPES), p)).astype(np.float32))

    ref = ms_deform_attn(value, SHAPES, loc, w, gather_mode="onehot",
                         onehot_dtype="bfloat16", custom_vjp=False)
    out = ms_deform_attn_mxu(value, SHAPES, loc, w, block_q=64,
                             block_t=64, interpret=True, skip_chunks=skip)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("skip", [False, "dynamic", "win2", "gather4"])
def test_gdot_matches_einsum(skip):
    """msda_gdot_mxu vs the XLA quad-rows einsum it replaces."""
    import jax

    from monosowa_tpu.ops.msda import (_make_quads, _onehot_rows,
                                       _quad_slot_geometry)
    from monosowa_tpu.ops.msda_mxu import msda_gdot_mxu

    rng = np.random.default_rng(2)
    b, q, m, d, p = 2, 37, 4, 8, 4
    s = sum(h * w for h, w in SHAPES)
    value = jnp.asarray(rng.normal(size=(b, s, m, d)).astype(np.float32))
    loc = jnp.asarray(
        rng.uniform(-0.1, 1.1, (b, q, m, len(SHAPES), p, 2))
        .astype(np.float32))
    dout = jnp.asarray(rng.normal(size=(b, q, m, d)).astype(np.float32))

    out = msda_gdot_mxu(value, SHAPES, loc, dout, block_q=64, block_t=64,
                        interpret=True, skip_chunks=skip)

    quads = _make_quads(value, SHAPES, "onehot")
    refs = []
    for lvl, (h, w_l) in enumerate(SHAPES):
        flat00, _, _, _ = _quad_slot_geometry(loc[:, :, :, lvl], h, w_l,
                                              with_derivs=False)
        rows = _onehot_rows(quads[lvl], flat00, jnp.bfloat16)
        refs.append(jnp.einsum("bqmpsd,bqmd->bqmps", rows, dout))
    ref = jnp.stack(refs, 3)                          # (B,Q,M,L,P,4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("q,skip", [(37, False), (37, "dynamic"),
                                    (256, "dynamic"), (37, "win2"),
                                    (256, "win2"), (256, "gather4")])
def test_dvalue_matches_xla(q, skip):
    """msda_dvalue_mxu vs the XLA dense one-hot dValue scan."""
    from monosowa_tpu.ops.msda import _msda_dvalue
    from monosowa_tpu.ops.msda_mxu import msda_dvalue_mxu

    rng = np.random.default_rng(3)
    b, m, d, p = 2, 4, 8, 4
    s = sum(h * w for h, w in SHAPES)
    value = jnp.asarray(rng.normal(size=(b, s, m, d)).astype(np.float32))
    loc = jnp.asarray(
        rng.uniform(-0.1, 1.1, (b, q, m, len(SHAPES), p, 2))
        .astype(np.float32))
    w = jnp.asarray(
        rng.uniform(0, 1, (b, q, m, len(SHAPES), p)).astype(np.float32))
    dout = jnp.asarray(rng.normal(size=(b, q, m, d)).astype(np.float32))

    ref = _msda_dvalue(value, SHAPES, loc, w, dout, 64, jnp.bfloat16,
                       gather_mode="quad")
    out = msda_dvalue_mxu(SHAPES, loc, w, dout, block_q=64, block_t=64,
                          interpret=True, skip_chunks=skip)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_mxu_custom_vjp_path():
    """gather_mode="mxu" through the public API: Pallas forward (interpret
    off-TPU) + the analytic quad backward; grads match the all-XLA path."""
    import jax

    rng = np.random.default_rng(1)
    b, q, m, d, p = 2, 37, 4, 8, 4
    s = sum(h * w for h, w in SHAPES)
    value = jnp.asarray(rng.normal(size=(b, s, m, d)).astype(np.float32))
    # includes out-of-bounds samples: both paths must fetch the same
    # clipped rows and mask them through the same slot weights
    loc = jnp.asarray(
        rng.uniform(-0.15, 1.15, (b, q, m, len(SHAPES), p, 2))
        .astype(np.float32))
    w = jnp.asarray(
        rng.uniform(0, 1, (b, q, m, len(SHAPES), p)).astype(np.float32))

    def loss(fn):
        return lambda v, l, a: jnp.sum(fn(v, l, a).astype(jnp.float32) ** 2)

    mxu = lambda v, l, a: ms_deform_attn(v, SHAPES, l, a, gather_mode="mxu")
    ref = lambda v, l, a: ms_deform_attn(v, SHAPES, l, a, gather_mode="quad")

    np.testing.assert_allclose(np.asarray(mxu(value, loc, w)),
                               np.asarray(ref(value, loc, w)),
                               atol=2e-2, rtol=2e-2)
    g_mxu = jax.grad(loss(mxu), argnums=(0, 1, 2))(value, loc, w)
    g_ref = jax.grad(loss(ref), argnums=(0, 1, 2))(value, loc, w)
    for gm, gr in zip(g_mxu, g_ref):
        scale = max(float(jnp.abs(gr).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(gm) / scale,
                                   np.asarray(gr) / scale, atol=3e-2)

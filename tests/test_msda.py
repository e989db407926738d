"""MSDA parity vs a torch grid_sample oracle (mirrors the reference's
CUDA-vs-pytorch parity test, MonoDETR ops/test.py:30-89)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from monosowa_tpu.ops.msda import ms_deform_attn


def torch_oracle(value, shapes, loc, weights):
    """Reference semantics: per level grid_sample(bilinear, zeros,
    align_corners=False) with grid = 2*loc - 1, weighted sum."""
    b, _, m, d = value.shape
    q = loc.shape[1]
    splits = [h * w for h, w in shapes]
    vals = torch.split(value, splits, dim=1)
    grids = 2 * loc - 1
    out = torch.zeros(b, q, m, d)
    for lvl, (h, w) in enumerate(shapes):
        v = vals[lvl].flatten(2).transpose(1, 2).reshape(b * m, d, h, w)
        g = grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)  # (b*m, q, p, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)               # (b*m, d, q, p)
        s = s.reshape(b, m, d, q, -1).permute(0, 3, 1, 4, 2)  # (b,q,m,p,d)
        out += (s * weights[:, :, :, lvl].unsqueeze(-1)).sum(3)
    return out.reshape(b, q, m * d)


@pytest.mark.parametrize("seed", [0, 1])
def test_msda_matches_torch_oracle(seed):
    rng = np.random.default_rng(seed)
    shapes = [(6, 8), (3, 4), (2, 2)]
    b, m, d, q, p = 2, 4, 8, 10, 3
    total = sum(h * w for h, w in shapes)
    value = rng.normal(size=(b, total, m, d)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, size=(b, q, m, len(shapes), p, 2)
                      ).astype(np.float32)
    w_ = rng.uniform(size=(b, q, m, len(shapes), p)).astype(np.float32)
    w_ /= w_.reshape(b, q, m, -1).sum(-1).reshape(b, q, m, 1, 1)

    got = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                    jnp.asarray(loc), jnp.asarray(w_)))
    want = torch_oracle(torch.from_numpy(value), shapes,
                        torch.from_numpy(loc), torch.from_numpy(w_)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_msda_gradients_flow():
    import jax
    shapes = [(4, 4)]
    b, m, d, q, p = 1, 2, 4, 3, 2
    rng = np.random.default_rng(3)
    value = jnp.asarray(rng.normal(size=(b, 16, m, d)).astype(np.float32))
    loc = jnp.asarray(rng.uniform(0.2, 0.8, size=(b, q, m, 1, p, 2))
                      .astype(np.float32))
    w_ = jnp.full((b, q, m, 1, p), 1.0 / p, jnp.float32)

    def loss(v, l, w):
        return jnp.sum(ms_deform_attn(v, shapes, l, w) ** 2)

    gv, gl, gw = jax.grad(loss, argnums=(0, 1, 2))(value, loc, w_)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.abs(np.asarray(gl)).max() > 0     # sampling-location grads exist
    assert np.abs(np.asarray(gw)).max() > 0


def test_msda_chunked_matches_unchunked():
    import numpy as np
    import jax.numpy as jnp
    from monosowa_tpu.ops.msda import ms_deform_attn
    shapes = ((8, 16), (4, 8))
    b, m, d, p = 2, 4, 8, 3
    s = sum(h * w for h, w in shapes)
    q = 50   # not a multiple of chunk -> exercises padding
    r = np.random.default_rng(3)
    v = jnp.asarray(r.normal(size=(b, s, m, d)).astype(np.float32))
    loc = jnp.asarray(r.uniform(0, 1, (b, q, m, 2, p, 2)).astype(np.float32))
    w = jnp.asarray(r.uniform(size=(b, q, m, 2, p)).astype(np.float32))
    full = ms_deform_attn(v, shapes, loc, w, chunk_q=q)
    chunked = ms_deform_attn(v, shapes, loc, w, chunk_q=16)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               rtol=1e-5, atol=1e-5)


def test_msda_custom_vjp_matches_autodiff():
    """Hand-written backward (one-hot-matmul dValue + analytic bilinear
    dLoc/dW) vs XLA autodiff of the same forward."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from monosowa_tpu.ops.msda import ms_deform_attn
    shapes = ((6, 10), (3, 5))
    b, m, d, p, q = 2, 4, 8, 3, 45
    s = sum(h * w for h, w in shapes)
    r = np.random.default_rng(7)
    v = jnp.asarray(r.normal(size=(b, s, m, d)).astype(np.float32))
    # includes out-of-bounds samples (loc slightly outside [0, 1])
    loc = jnp.asarray(r.uniform(-0.1, 1.1, (b, q, m, 2, p, 2)).astype(np.float32))
    w = jnp.asarray(r.uniform(size=(b, q, m, 2, p)).astype(np.float32))

    def loss(fn_kwargs):
        return lambda v, l, w: jnp.sum(
            ms_deform_attn(v, shapes, l, w, **fn_kwargs) ** 2)

    out_c = ms_deform_attn(v, shapes, loc, w, chunk_q=16)
    out_a = ms_deform_attn(v, shapes, loc, w, custom_vjp=False)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_a),
                               rtol=1e-5, atol=1e-5)

    g_c = jax.grad(loss(dict(chunk_q=16, dv_chunk_q=8)), (0, 1, 2))(v, loc, w)
    g_a = jax.grad(loss(dict(custom_vjp=False)), (0, 1, 2))(v, loc, w)
    for gc, ga, name in zip(g_c, g_a, ("value", "loc", "w")):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(ga),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_msda_custom_vjp_bf16_onehot_close():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from monosowa_tpu.ops.msda import ms_deform_attn
    shapes = ((6, 10),)
    b, m, d, p, q = 1, 2, 8, 2, 20
    s = 60
    r = np.random.default_rng(3)
    v = jnp.asarray(r.normal(size=(b, s, m, d)).astype(np.float32))
    loc = jnp.asarray(r.uniform(0, 1, (b, q, m, 1, p, 2)).astype(np.float32))
    w = jnp.asarray(r.uniform(size=(b, q, m, 1, p)).astype(np.float32))
    loss = lambda kw: (lambda v_: jnp.sum(
        ms_deform_attn(v_, shapes, loc, w, **kw) ** 2))
    g16 = jax.grad(loss(dict(onehot_dtype="bfloat16", dv_chunk_q=8)))(v)
    g32 = jax.grad(loss(dict(custom_vjp=False)))(v)
    scale = float(jnp.max(jnp.abs(g32))) + 1e-6
    assert float(jnp.max(jnp.abs(g16 - g32))) / scale < 0.02

"""Mixed precision (compute_dtype="bfloat16"): same params, finite losses,
outputs near the f32 model, and a full train step that still learns.

The TPU production path resolves compute_dtype="auto" to bf16 at trace
time (models/layers.py resolve_dtype); tests force it explicitly because
the suite runs on CPU where "auto" stays f32.  Params/norms/softmax logits
and all heads remain f32 by design — only activations and matmul operands
drop to bf16 (backbone convs, encoder/decoder Dense + attention, MSDA
value path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny(dtype):
    from monosowa_tpu.models.monodetr import MonoDETR
    return MonoDETR(enc_layers=1, dec_layers=1, group_num=1, d_model=64,
                    d_ffn=64, nheads=4, num_queries=10, num_depth_bins=16,
                    compute_dtype=dtype)


def test_bf16_forward_matches_f32():
    import __graft_entry__
    batch = __graft_entry__._sample_batch(2, 96, 160)
    m32 = _tiny("float32")
    variables = m32.init(jax.random.PRNGKey(0), batch["image"][:1],
                         batch["calib"][:1], batch["img_size"][:1],
                         training=False)
    out32 = m32.apply(variables, batch["image"], batch["calib"],
                      batch["img_size"], training=False)
    # identical param tree (policy casts at compute time, never at init)
    m16 = _tiny("bfloat16")
    out16 = m16.apply(variables, batch["image"], batch["calib"],
                      batch["img_size"], training=False)
    for k in ("pred_logits", "pred_boxes", "pred_depth"):
        a, b = np.asarray(out32[k]), np.asarray(out16[k])
        assert a.dtype == b.dtype == np.float32, k      # heads stay f32
        assert np.isfinite(b).all(), k
        # bf16 has ~3 decimal digits; logits/boxes are O(1).  Depth is
        # O(10..60) m through 1/sigmoid and size3d/box2d_h quotients of
        # small random-init values, which amplify rounding — so the depth
        # check is distributional (bulk tight, tail bounded)
        err = np.abs(a - b) / (np.abs(a) + 1.0)
        if k == "pred_depth":
            assert np.quantile(err, 0.9) < 0.1, (k, np.quantile(err, 0.9))
            assert np.max(err) < 0.6, (k, np.max(err))
        else:
            assert np.max(err) < 0.15, (k, np.max(err))


@pytest.mark.slow
def test_bf16_train_step_learns():
    import __graft_entry__
    from monosowa_tpu.train.optim import make_optimizer
    from monosowa_tpu.train.trainer import init_state, make_train_step

    model = _tiny("bfloat16")
    batch = __graft_entry__._sample_batch(2, 96, 160)
    tx = make_optimizer(base_lr=1e-3, steps_per_epoch=100)
    state = init_state(model, tx,
                       {k: np.asarray(v) for k, v in batch.items()})
    # params are f32 even under the bf16 policy
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(state.params))
    step = make_train_step(model)
    first = None
    for i in range(6):
        state, losses = step(state, batch, jax.random.PRNGKey(i))
        if first is None:
            first = float(losses["loss_total"])
    last = float(losses["loss_total"])
    assert np.isfinite(last)
    assert last < first
    assert float(losses["grad_norm"]) > 0

"""Trainer: sharded train step over the 8-device CPU mesh; loss decreases
on a fixed batch; graft entry dryrun."""

import numpy as np
import jax
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8(monkeypatch):
    # run via the SPAWN path (a fresh interpreter, exactly how the driver
    # invokes it) at the tiny preset — the production XLA-CPU compile
    # alone is ~10 min of suite wall clock.  The in-process variant
    # intermittently SIGABRTed inside XLA:CPU when run late in a
    # ~250-test session (fine standalone); a child process is immune to
    # accumulated runtime state.  MONOSOWA_DRYRUN_CACHE lets the child
    # reuse the machine-keyed persistent cache so repeat suites stay
    # fast; the driver's own invocation stays cache-free.
    monkeypatch.delenv("_MONOSOWA_DRYRUN_CHILD", raising=False)
    monkeypatch.setenv("MONOSOWA_DRYRUN_PRESET", "tiny")
    monkeypatch.setenv("MONOSOWA_DRYRUN_CACHE", "1")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_train_step_decreases_loss():
    import __graft_entry__
    from monosowa_tpu.models.monodetr import MonoDETR
    from monosowa_tpu.train.optim import make_optimizer
    from monosowa_tpu.train.trainer import init_state, make_train_step

    model = MonoDETR(enc_layers=1, dec_layers=1, group_num=1, d_model=64,
                     d_ffn=64, nheads=4, num_queries=10, num_depth_bins=16)
    batch = __graft_entry__._sample_batch(2, 96, 160)
    tx = make_optimizer(base_lr=1e-3, steps_per_epoch=100)
    state = init_state(model, tx, {k: np.asarray(v) for k, v in batch.items()})
    step = make_train_step(model)

    losses0 = None
    state1 = state
    for i in range(8):
        state1, losses = step(state1, batch, jax.random.PRNGKey(i))
        if losses0 is None:
            losses0 = {k: float(v) for k, v in losses.items()}
    assert np.isfinite(float(losses["loss_total"]))
    assert float(losses["loss_total"]) < losses0["loss_total"]
    assert float(losses["grad_norm"]) > 0


def test_optimizer_weight_decay_mask():
    import jax.numpy as jnp
    from monosowa_tpu.train.optim import weight_decay_mask
    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones(4)},
              "norm": {"scale": jnp.ones(4)}}
    mask = weight_decay_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False
    assert mask["norm"]["scale"] is False


def test_lr_schedule_step_decay():
    from monosowa_tpu.train.optim import make_lr_schedule
    s = make_lr_schedule(2e-4, steps_per_epoch=10, decay_epochs=(5, 8))
    assert float(s(0)) == pytest.approx(2e-4)
    assert float(s(55)) == pytest.approx(2e-5, rel=1e-5)
    assert float(s(85)) == pytest.approx(2e-6, rel=1e-5)

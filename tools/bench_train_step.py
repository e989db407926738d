"""Benchmark the full MonoDETR train step at reference training shapes
(B=8, 384x1280) on the current default device (TPU under axon).

Usage: python tools/bench_train_step.py [batch] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import __graft_entry__ as ge
    from monosowa_tpu.models.monodetr import MonoDETR
    from monosowa_tpu.train.optim import make_optimizer
    from monosowa_tpu.train.trainer import init_state, make_train_step

    model = MonoDETR()
    h, w = 384, 1280
    batch = ge._sample_batch(batch_size, h, w)
    tx = make_optimizer(base_lr=2e-4, steps_per_epoch=100)
    t0 = time.perf_counter()
    state = init_state(model, tx, {k: np.asarray(v) for k, v in batch.items()})
    print(f"# init: {time.perf_counter() - t0:.1f}s")
    step = make_train_step(model)

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state, losses = step(state, batch, rng)
    total = float(losses["loss_total"])          # host pull = trustworthy sync
    print(f"# compile+first step: {time.perf_counter() - t0:.1f}s "
          f"(loss {total:.3f})")

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        state, losses = step(state, batch, rng)
        float(losses["loss_total"])
        times.append(time.perf_counter() - t0)
        print(f"# iter {i}: {times[-1]:.3f}s")
    t = float(np.median(times))
    print(f"train_step b{batch_size}: {t:.3f} s/step = "
          f"{batch_size / t:.2f} img/s")


if __name__ == "__main__":
    main()

"""Ablation profile of the MonoDETR train step on the current device.

Times the full production step and a set of one-change-at-a-time ablations
so the dominant stage is identified by subtraction (the axon tunnel's
profiler is unavailable; host-pull timing is the only trustworthy sync).

Usage: python tools/profile_train_step.py [batch] [iters] [ablation ...]
Ablations (default: all): full, no_enc, dec1, enc1, no_groups, f32, fwd
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_step(model, batch, iters, fwd_only=False):
    # jax only ever loads in the CHILD: a parent holding an idle tunnel
    # connection alongside the child's big program reliably fails the
    # child's execution with an opaque INVALID_ARGUMENT (bench.py keeps
    # its parent jax-free for the same reason)
    import jax

    from monosowa_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache("/tmp/jax_cache")
    from monosowa_tpu.train.optim import make_optimizer
    from monosowa_tpu.train.trainer import (init_state, make_eval_step,
                                            make_train_step)

    tx = make_optimizer(base_lr=2e-4, steps_per_epoch=100)
    state = init_state(model, tx,
                       {k: np.asarray(v) for k, v in batch.items()})
    step = make_eval_step(model) if fwd_only else make_train_step(model)
    rng = jax.random.PRNGKey(0)

    def run():
        if fwd_only:
            out = step(state, batch)
            return float(np.asarray(out).sum())
        s2, losses = step(state, batch, rng)
        return float(losses["loss_total"])

    t0 = time.perf_counter()
    run()
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), compile_s


CASE_NAMES = ("full", "no_enc", "enc1", "dec1", "no_groups", "f32", "fwd")


def make_cases():
    # imports flax/jax -- child only (see time_step)
    from monosowa_tpu.models.monodetr import MonoDETR
    return {
        "full": MonoDETR(),
        "no_enc": MonoDETR(enc_layers=0),
        "enc1": MonoDETR(enc_layers=1),
        "dec1": MonoDETR(dec_layers=1),
        "no_groups": MonoDETR(group_num=1),
        "f32": MonoDETR(compute_dtype="float32"),
        "fwd": MonoDETR(),
    }


def run_case(name, batch_size, iters):
    import __graft_entry__ as ge
    batch = ge._sample_batch(batch_size, 384, 1280)
    return time_step(make_cases()[name], batch, iters,
                     fwd_only=(name == "fwd"))


def main():
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    only = set(sys.argv[3:])

    child = os.environ.get("PROFILE_CHILD", "")
    if child:
        dt, compile_s = run_case(child, batch_size, iters)
        print(f"RESULT {child} {dt:.4f} {compile_s:.1f}", flush=True)
        return

    # each case in a CHILD with retries: a single axon execution fails with
    # an opaque INVALID_ARGUMENT ~10-20% of the time and poisons the client
    import subprocess
    base = None
    for name in CASE_NAMES:
        if only and name not in only:
            continue
        dt = compile_s = None
        for attempt in range(4):
            env = dict(os.environ, PROFILE_CHILD=name)
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     str(batch_size), str(iters)],
                    capture_output=True, text=True, timeout=1200, env=env)
            except subprocess.TimeoutExpired:
                print(f"# {name} attempt {attempt}: timeout", flush=True)
                continue
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("RESULT ")]
            if out.returncode == 0 and line:
                _, _, dt, compile_s = line[-1].split()
                dt, compile_s = float(dt), float(compile_s)
                break
            print(f"# {name} attempt {attempt}: rc={out.returncode} "
                  f"{out.stderr.strip()[-200:]}", flush=True)
        if dt is None:
            print(f"{name:10s}: FAILED", flush=True)
            continue
        delta = "" if base is None else f"  (full - this = {base - dt:+.3f}s)"
        if name == "full":
            base = dt
        print(f"{name:10s}: {dt:.3f} s/step  [compile {compile_s:.0f}s]"
              f"{delta}", flush=True)


if __name__ == "__main__":
    main()

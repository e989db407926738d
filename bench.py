"""Headline benchmark: pseudo-label template-fitting throughput on TPU.

Measures the hot path of the auto-labeller (SURVEY.md §3.1): the full
reference-size grid search per car — 40x40x40 coarse poses (binary two-way
TFL via membership fields) + 360-step exact fine theta pass — batched over
a frame's worth of cars, on real TPU hardware.

Baseline: the reference evaluates the same 64,360 poses per car through
per-pose faiss IVF range_search on CPU (loss.py:70-75, optimizer.py:53-112);
its per-frame timing prints (main_class.py:304-413) put optimization at
roughly 1 s per car on the paper's hardware.  vs_baseline is measured
cars/sec relative to that 1 car/s reference rate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax

    # persistent compile cache: end-of-round driver runs (and retries) skip
    # the multi-minute remote compile
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from monosowa_tpu.ops.geometry import rot_y
    from monosowa_tpu.sowa.fitting import (CarBatch, FitConfig,
                                           fit_cars_conv, make_conv_kernels)
    from monosowa_tpu.sowa.templates import TemplateBank

    import os
    n_cars = int(os.environ.get("BENCH_N_CARS", "32"))
    n_pts = 2048
    rng = np.random.default_rng(0)
    bank = TemplateBank.default()
    template = jnp.asarray(bank.points[0])
    cfg = FitConfig()
    spec, occ_k, memb_k = make_conv_kernels(bank.points[0], cfg)

    pts = np.zeros((n_cars, n_pts, 3), np.float32)
    mask = np.zeros((n_cars, n_pts), bool)
    for b in range(n_cars):
        theta = rng.uniform(0, 2 * np.pi)
        rot = np.asarray(rot_y(jnp.float32(theta)))
        t = np.array([rng.uniform(-10, 10), 1.0, rng.uniform(8, 40)])
        scan = bank.points[0] @ rot.T + t
        scan = scan + rng.normal(scale=0.03, size=scan.shape)
        reps = int(np.ceil(n_pts / scan.shape[0]))
        scan = np.tile(scan, (reps, 1))[:n_pts]
        pts[b] = scan
        mask[b] = True

    # distinct per-iteration batches: the remote execution service caches
    # results for bitwise-identical inputs, which fakes sub-ms timings
    def make_batch(seed):
        jitter = np.random.default_rng(seed).normal(
            scale=1e-3, size=pts.shape).astype(np.float32)
        return CarBatch(points=jnp.asarray(pts + jitter),
                        mask=jnp.asarray(mask),
                        moving=jnp.zeros(n_cars, bool),
                        theta_est=jnp.zeros(n_cars, jnp.float32),
                        theta_valid=jnp.zeros(n_cars, bool),
                        car_valid=jnp.ones(n_cars, bool))

    iters = 5
    batches = [make_batch(100 + i) for i in range(iters + 1)]

    import sys

    # compile + warmup.  Timing pulls a value to host (device_get): on the
    # remote-execution tunnel, block_until_ready alone can return at enqueue
    # time and fake sub-ms iterations.
    t0 = time.perf_counter()
    res = fit_cars_conv(batches[-1], template, occ_k, memb_k, spec, cfg)
    _ = float(np.asarray(res.theta).sum())
    print(f"# compile+warmup: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        res = fit_cars_conv(batches[i], template, occ_k, memb_k, spec, cfg)
        _ = float(np.asarray(res.theta).sum())
        times.append(time.perf_counter() - t0)
        print(f"# iter {i}: {times[-1]:.3f}s", file=sys.stderr, flush=True)
    dt = float(np.median(times))

    cars_per_sec = n_cars / max(dt, 1e-9)
    baseline_cars_per_sec = 1.0  # reference: ~1 car/s single CPU process
    print(json.dumps({
        "metric": "pseudo_label_fit_throughput",
        "value": round(cars_per_sec, 2),
        "unit": ("cars/sec (64k-pose TFL grid search per car; vs_baseline "
                 "divides by an ESTIMATED 1 car/s reference CPU rate)"),
        "vs_baseline": round(cars_per_sec / baseline_cars_per_sec, 2),
    }))


if __name__ == "__main__":
    main()

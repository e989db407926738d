"""Headline benchmarks (three metrics, one JSON line each).

1. pseudo_label_fit_throughput — the hot path of the auto-labeller
   (SURVEY.md §3.1): the full reference-size grid search per car —
   40x40x40 coarse poses (binary two-way TFL via membership fields) +
   360-step exact fine theta pass — batched over a frame's worth of cars.
   Baseline: the reference evaluates the same 64,360 poses per car through
   per-pose faiss IVF range_search on CPU (loss.py:70-75,
   optimizer.py:53-112); its per-frame timing prints (main_class.py:304-413)
   put optimization at roughly 1 s per car on the paper's hardware.
   MEASURED in-image (2026-08-20): running the reference's OWN optimizer
   on this host through the faiss-shim differential harness
   (tools/measure_ref_baseline_scaled.py; two reduced grids, affine fit
   in the pose count, r^2-exact since the coarse sweep is a per-pose
   loop) gives 2358 s/car at the shipped 64k grid = 0.00042 cars/s.
   The shim's matmul range_search is slower than real faiss, so the
   divisor stays clamped at the literature-derived 1 car/s — every
   vs_baseline ratio printed here is an UNDERestimate.

2. pseudo_label_e2e_throughput — PseudoLabeler.label_frames end-to-end on
   full-resolution synthetic KITTI frames (375x1242, ~460k-point dense
   pseudo-LiDAR, 6 cars) at the reference's PRODUCTION aggregation
   window: ±30 = 61 frames (nscans_before/after: 30, config.yaml:31-32)
   — candidates -> tracking -> moving/standing -> aggregation -> fit ->
   NMS -> writer.  Baseline: the reference's per-frame python loop at
   this window is ~0.11 frames/s clamped in its favor (6 cars x ~1 s/car
   + 61-neighbour extraction); MEASURED in-image: 7.1e-5 frames/s
   through the faiss-shim harness (candidates 2.0 s at 13 frames ->
   x61/13 = 9.4 s + 6 x 2358 s fit per frame).  A secondary
   pseudo_label_e2e_throughput_w13 line keeps the 13-frame shape for
   round-over-round comparability (divisor 0.15 as in rounds 2-4).

3. train_step_throughput — full MonoDETR train step (fwd+bwd+optimizer,
   Hungarian matching, DDN loss) at the reference training shape
   B=8, 384x1280.  Baseline: the reference's shipped single-GPU run logs
   ~60 min/epoch incl. per-epoch val on 3712 images => ~1.0 img/s
   (train.log timestamps, BASELINE.md).

Select a subset with BENCH_ONLY=fit|e2e|train.
"""

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "tools"))


def _emit(metric, value, unit, baseline, samples=None):
    """One JSON metric line.  ``samples``: per-iteration throughputs —
    emitted as min/median/max spread plus the host 1-min load average so
    round-over-round deltas are interpretable (host dispatch on this
    image's single core is the dominant noise source; see the
    bench-host-contention protocol in ROADMAP)."""
    rec = {
        "metric": metric,
        "value": round(value, 2),
        "unit": unit,
        "vs_baseline": round(value / baseline, 2),
    }
    if samples:
        rec.update(min=round(float(np.min(samples)), 2),
                   median=round(float(np.median(samples)), 2),
                   max=round(float(np.max(samples)), 2),
                   n_samples=len(samples))
    try:
        rec["host_load1m"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    print(json.dumps(rec), flush=True)


def bench_fit():
    import jax
    import jax.numpy as jnp

    from monosowa_tpu.ops.geometry import rot_y
    from monosowa_tpu.sowa.fitting import (CarBatch, FitConfig,
                                           fit_cars_conv, make_conv_kernels)
    from monosowa_tpu.sowa.templates import TemplateBank

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

    # compile + warmup.  Timing pulls a value to host (device_get): on the
    # remote-execution tunnel, block_until_ready alone can return at enqueue
    # time and fake sub-ms iterations.
    t0 = time.perf_counter()
    res = fit_cars_conv(batches[-1], template, occ_k, memb_k, spec, cfg)
    _ = float(np.asarray(res.theta).sum())
    print(f"# fit compile+warmup: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        res = fit_cars_conv(batches[i], template, occ_k, memb_k, spec, cfg)
        _ = float(np.asarray(res.theta).sum())
        times.append(time.perf_counter() - t0)
        print(f"# fit iter {i}: {times[-1]:.3f}s", file=sys.stderr, flush=True)
    dt = float(np.median(times))

    _emit("pseudo_label_fit_throughput", n_cars / max(dt, 1e-9),
          ("cars/sec (64k-pose TFL grid search per car; vs_baseline divides "
           "by 1 car/s — a conservative clamp in the reference's favor: the "
           "in-image measurement of the reference's own optimizer through "
           "the faiss-shim harness gives 0.00042 cars/s = 2358 s/car at the "
           "shipped 64k grid, tools/measure_ref_baseline_scaled.py)"), 1.0,
          samples=[n_cars / t for t in times])


def bench_e2e():
    """HEADLINE e2e at the reference's PRODUCTION window: ±30 frames = the
    61-frame aggregation (nscans_before/after: 30, config.yaml:31-32) —
    the shape the BASELINE.md north star is defined at."""
    import bench_pipeline

    # group size 8 = the production driver shape (bench_pipeline default);
    # smaller groups amortize the two per-group tunnel pulls over fewer
    # frames
    n_frames = int(os.environ.get("BENCH_E2E_FRAMES", "8"))
    window = int(os.environ.get("BENCH_E2E_WINDOW", "30"))
    # 12 groups x 8 labeled frames per stream: the 2*window edge frames
    # are extracted once per stream, so short streams overstate the edge
    # cost a production sequence (thousands of frames) amortizes away —
    # 96 labeled vs 60 edge frames keeps the measured extraction rate
    # within 1.6x of true steady state (still conservative)
    iters = int(os.environ.get("BENCH_E2E_ITERS", "12"))
    streams = int(os.environ.get("BENCH_E2E_STREAMS", "2"))
    fps, _ = bench_pipeline.run(n_frames=n_frames, quiet=False,
                                window=window, iters=iters,
                                streams=streams)
    _emit("pseudo_label_e2e_throughput", float(np.median(fps)),
          (f"frames/sec end-to-end at full KITTI sizes (375x1242, ~460k-pt "
           f"pseudo-LiDAR, 6 cars, production ±{window} = "
           f"{2 * window + 1}-frame aggregation windows; vs_baseline "
           "divides by 0.11 frames/s — a conservative clamp in the "
           "reference's favor at this window (6 cars x ~1 s/car fit + "
           "61-neighbour extraction at the measured 4.7x of the 13-frame "
           "scene's 0.7 s); the in-image measurement of the reference's "
           "own per-frame loop through the faiss-shim harness gives "
           "7.1e-5 frames/s at this window, "
           "tools/measure_ref_baseline_scaled.py)"),
          0.11, samples=fps)


def bench_e2e13():
    """Secondary e2e line at the previous rounds' 13-frame windows, for
    round-over-round comparability (BENCH_r02..r04 measured this shape)."""
    import bench_pipeline

    n_frames = int(os.environ.get("BENCH_E2E_FRAMES", "8"))
    fps, _ = bench_pipeline.run(n_frames=n_frames, quiet=False, window=6,
                                iters=2, streams=2)
    _emit("pseudo_label_e2e_throughput_w13", float(np.median(fps)),
          ("frames/sec end-to-end at full KITTI sizes (375x1242, ~460k-pt "
           "pseudo-LiDAR, 6 cars, 13-frame windows — the round-2..4 "
           "comparability shape; vs_baseline divides by 0.15 frames/s, "
           "the clamp used in those rounds; measured reference at this "
           "window: 7e-5 frames/s)"),
          0.15, samples=fps)


def bench_train():
    import jax

    import __graft_entry__ as ge
    from monosowa_tpu.models.monodetr import MonoDETR
    from monosowa_tpu.train.optim import make_optimizer
    from monosowa_tpu.train.trainer import init_state, make_train_step

    batch_size, iters = 8, 4
    # ablation hook: BENCH_TRAIN_MODEL='{"enc_layers": 0}' measures a
    # model variant through the same child/retry machinery (the ablation
    # profiler's subtraction method, but on the bench vehicle)
    abl = os.environ.get("BENCH_TRAIN_MODEL", "")
    model = MonoDETR(**json.loads(abl)) if abl else MonoDETR()
    batch = ge._sample_batch(batch_size, 384, 1280)
    tx = make_optimizer(base_lr=2e-4, steps_per_epoch=100)
    state = init_state(model, tx, {k: np.asarray(v) for k, v in batch.items()})
    step = make_train_step(model)

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    try:
        state, losses = step(state, batch, rng)
        total = float(losses["loss_total"])  # host pull = trustworthy sync
    except Exception as e:
        # the default TPU MSDA backend is the Pallas MXU kernel; the
        # remote Pallas compile service has a history of rejecting
        # programs wholesale (HTTP 500) — fall back to the pure-XLA
        # one-hot backend in-process rather than losing the metric
        print(f"# train first step FAILED ({str(e)[:160]}) — retrying "
              "with MSDA_TPU_BACKEND=onehot", file=sys.stderr, flush=True)
        os.environ["MSDA_TPU_BACKEND"] = "onehot"
        step = make_train_step(model)
        t0 = time.perf_counter()
        state, losses = step(state, batch, rng)
        total = float(losses["loss_total"])
    print(f"# train compile+first step: {time.perf_counter() - t0:.1f}s "
          f"(loss {total:.3f})", file=sys.stderr)

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        state, losses = step(state, batch, rng)
        float(losses["loss_total"])
        times.append(time.perf_counter() - t0)
        print(f"# train iter {i}: {times[-1]:.3f}s", file=sys.stderr,
              flush=True)
    dt = float(np.median(times))

    _emit("train_step_throughput", batch_size / dt,
          ("imgs/sec full MonoDETR train step at B=8 384x1280 single chip "
           "(vs_baseline divides by ~1.0 img/s from the reference's shipped "
           "single-GPU train.log, 60 min/epoch incl. val)"), 1.0,
          samples=[batch_size / t for t in times])


def _probe_platform(timeout_s: float = 60.0) -> str:
    """Initialize jax in a CHILD with a hard timeout.

    When the axon relay is down, ``jax.devices()`` blocks forever with no
    error (observed: >7 h); a hung bench would stall the driver's
    round-end sequence.  Probing in a subprocess bounds the damage — on
    timeout we exit nonzero immediately with a clear message.
    """
    import subprocess
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print("# bench ABORT: jax platform init hung "
              f"(> {timeout_s:.0f}s) — measurement tunnel down?",
              file=sys.stderr, flush=True)
        sys.exit(3)
    if out.returncode != 0:
        print(f"# bench ABORT: jax init failed: {out.stderr.strip()[-500:]}",
              file=sys.stderr, flush=True)
        sys.exit(3)
    return out.stdout.strip()


def _run_child(name: str, deadline: float, reserve_later: float,
               attempts: int = 2, max_first: float = 600.0,
               max_retry: float = 300.0) -> bool:
    """Run one metric in a CHILD process with a deadline-governed timeout.

    Each attempt's timeout is computed AT ATTEMPT TIME from the wall-clock
    deadline, minus ``reserve_later`` seconds kept back for metrics that
    still have to run — a slow cold compile on one metric can no longer
    starve the ones after it (the round-3 failure mode).

    The axon tunnel intermittently fails a single execution with an opaque
    INVALID_ARGUMENT (observed ~10-20% of runs on the big train program);
    the failure can poison the in-process client, so each metric gets a
    fresh process and a crashed attempt is simply retried."""
    import subprocess
    env = dict(os.environ, BENCH_CHILD=name)
    for attempt in range(attempts):
        cap = (deadline - time.perf_counter()) - reserve_later
        timeout_s = min(max_first if attempt == 0 else max_retry, cap)
        if timeout_s < 45:
            print(f"# bench {name} attempt {attempt}: skipped "
                  f"(only {timeout_s:.0f}s left in budget)",
                  file=sys.stderr, flush=True)
            continue
        t0 = time.perf_counter()
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True, text=True, timeout=timeout_s, env=env)
        except subprocess.TimeoutExpired as te:
            for stream in (te.stderr, te.stdout):
                if stream:
                    txt = stream if isinstance(stream, str) else \
                        stream.decode(errors="replace")
                    sys.stderr.write(txt[-1500:])
            print(f"# bench {name} attempt {attempt}: timeout "
                  f"({timeout_s:.0f}s)", file=sys.stderr, flush=True)
            # a timeout here means the child was killed mid-compile; a
            # killed compile writes NOTHING to the persistent cache, so a
            # shorter retry cannot succeed — move on and leave the budget
            # to the remaining metrics.  (Retries exist for the tunnel's
            # transient INVALID_ARGUMENT crashes, which return rc!=0.)
            break
        sys.stderr.write(out.stderr)
        line = [l for l in out.stdout.splitlines()
                if l.startswith("{")]
        if out.returncode == 0 and line:
            print(line[-1], flush=True)
            print(f"# bench {name}: ok in {time.perf_counter() - t0:.0f}s",
                  file=sys.stderr, flush=True)
            return True
        print(f"# bench {name} attempt {attempt}: rc={out.returncode} "
              f"{out.stdout.strip()[-200:]}", file=sys.stderr, flush=True)
    print(f"# bench {name} FAILED after {attempts} attempts",
          file=sys.stderr, flush=True)
    return False


def main():
    # importance order: two of round 3's three headline numbers went
    # unrecorded because `fit` burned the whole driver budget first
    # (VERDICT r3) — train and e2e now run before fit, and a global
    # deadline governor guarantees every metric gets at least one
    # bounded attempt inside the driver's timeout.
    suite = {"train": bench_train, "e2e": bench_e2e, "fit": bench_fit,
             "e2e13": bench_e2e13}

    child = os.environ.get("BENCH_CHILD", "")
    if child:
        # child mode: run exactly one metric in this process
        from monosowa_tpu.utils.jaxcache import enable_persistent_cache
        enable_persistent_cache("/tmp/jax_cache")
        suite[child]()
        return

    t_start = time.perf_counter()
    budget = float(os.environ.get("BENCH_BUDGET", "1020"))
    deadline = t_start + budget

    platform = _probe_platform()
    print(f"# bench platform: {platform}", file=sys.stderr)
    # NOTE on train-child hangs (2026-08-21): the tunnel intermittently
    # enters bad windows lasting tens of minutes in which the BIG train
    # program (82 MB executable) hangs at compile/load while the smaller
    # e2e/fit programs still run — a standalone child reproduces it, so
    # it is the service, not this harness.  The per-child timeout + the
    # budget governor bound the damage; the warm persistent cache makes a
    # healthy-window attempt succeed in ~90 s.

    # persistent compile cache: end-of-round driver runs (and retries) skip
    # the multi-minute remote compile; machine-keyed (utils/jaxcache.py) so
    # a VM migration can't feed stale XLA:CPU machine code (SIGABRT)
    only = os.environ.get("BENCH_ONLY", "")
    names = [n for n in suite if not only or n == only]
    # per-metric budget floors reserved for the not-yet-run metrics so a
    # hung compile on one metric cannot starve the rest (warm costs:
    # train ~90 s, e2e ~180 s incl. 60 s host scene build, fit ~50 s,
    # e2e13 ~120 s), and per-metric first-attempt caps so a tunnel
    # bad-window (train hangs are the observed mode) wastes at most one
    # bounded attempt
    reserves = {"train": 150.0, "e2e": 260.0, "fit": 60.0, "e2e13": 200.0}
    caps = {"train": 420.0, "e2e": 360.0, "fit": 300.0, "e2e13": 300.0}
    failed = []
    for i, name in enumerate(names):
        later = sum(reserves[n] for n in names[i + 1:])
        if not _run_child(name, deadline, later,
                          max_first=caps.get(name, 600.0)):
            failed.append(name)
    # second pass over failures with whatever budget remains: a first-pass
    # timeout often SEEDS the remote compile service's own cache, so a
    # later attempt compiles much faster (observed 600s -> 211s)
    for name in failed:
        if deadline - time.perf_counter() > 60:
            _run_child(name, deadline, 0.0, attempts=1)
    print(f"# bench total: {time.perf_counter() - t_start:.0f}s "
          f"of {budget:.0f}s budget", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()

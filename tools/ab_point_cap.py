"""A/B the per-car point cap: the pipeline's default max_points=2048 vs
the reference's 10,000-point cap (loader.py:188-192).

Two legs, one JSON line:

* accuracy — the fit-quality harness (tests/test_fit_accuracy.py
  _planted_batch): 10k-point camera-facing-occluded planted cars, fitted
  once from the FULL clouds and once from the pipeline's evenly-spaced
  2048-point subsample of the SAME clouds, mean 3D IoU for each.
* throughput — the e2e bench scene (tools/bench_pipeline.run) at both
  caps, steady-state frames/s for each.

Usage: python tools/ab_point_cap.py [--full-grid] [--skip-e2e]
  --full-grid uses the shipped 40x40x40+360 grid (TPU); default is the
  gate's reduced 24^3+120 grid (CPU-tractable).
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(os.path.dirname(HERE), "tests"))

import numpy as np


def accuracy_leg(full_grid: bool):
    import jax.numpy as jnp

    from monosowa_tpu.sowa import custom_dataset, fitting
    from monosowa_tpu.sowa.templates import (TEMPLATE_H, TEMPLATE_L,
                                             TEMPLATE_W)
    from test_fit_accuracy import _planted_batch

    rng = np.random.default_rng(7)
    n_cars, S = 8, 10000
    moving = np.zeros(n_cars, bool)
    moving[4:] = True
    theta_valid = moving.copy()
    theta_valid[7] = False
    batch10k, gt, tmpl = _planted_batch(rng, n_cars, S, moving, theta_valid)

    # the pipeline's subsample (aggregation.build_car_batch style: evenly
    # spaced indices over the aggregated cloud)
    cap = 2048
    idx = np.linspace(0, S - 1, cap).astype(int)
    batch2k = fitting.CarBatch(
        points=batch10k.points[:, idx], mask=batch10k.mask[:, idx],
        moving=batch10k.moving, theta_est=batch10k.theta_est,
        theta_valid=batch10k.theta_valid, car_valid=batch10k.car_valid)

    cfg = (fitting.FitConfig() if full_grid else
           fitting.FitConfig(n_dx=24, n_dz=24, n_theta=24,
                             n_theta_fine=120, fine_chunk=12))
    spec, occ, memb = fitting.make_conv_kernels(tmpl, cfg)

    out = {}
    for name, batch in (("iou_10000", batch10k), ("iou_2048", batch2k)):
        res = fitting.fit_cars_conv(batch, jnp.asarray(tmpl), occ, memb,
                                    spec, cfg)
        ious = []
        for b in range(n_cars):
            fitted = np.array([float(res.x[b]), float(res.y[b]),
                               float(res.z[b]), TEMPLATE_L, TEMPLATE_W,
                               TEMPLATE_H, float(res.theta[b])], np.float32)
            ious.append(custom_dataset.compute_pair_iou(fitted, gt[b]))
        out[name] = round(float(np.mean(ious)), 4)
        out[name + "_min"] = round(float(np.min(ious)), 4)
    out["iou_delta"] = round(out["iou_10000"] - out["iou_2048"], 4)
    return out


def throughput_leg():
    import bench_pipeline

    out = {}
    for cap in (2048, 10000):
        fps, _ = bench_pipeline.run(n_frames=4, iters=2, window=6,
                                    streams=1, quiet=True, max_points=cap)
        out[f"fps_{cap}"] = round(float(np.median(fps)), 2)
    return out


def main():
    out = {"grid": "full 40^3+360" if "--full-grid" in sys.argv
           else "reduced 24^3+120"}
    out.update(accuracy_leg("--full-grid" in sys.argv))
    if "--skip-e2e" not in sys.argv:
        out.update(throughput_leg())
    print("POINT_CAP_AB " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

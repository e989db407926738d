"""Measure the REFERENCE pipeline's throughput in this image (CPU).

Replaces the ESTIMATED divisors in bench.py / BASELINE.md with numbers
measured by running the reference's OWN code (main_kitti optimization path,
main_class.py:203-259) through the differential harness
(tests/ref_pipeline_harness.py): faiss is replaced by the harness's
matmul-exact range_search stand-in, everything else the pipeline computes
numerically is the reference's code at the SHIPPED config (full 40x40x40
coarse grid + 360-step fine pass, optimizer.py:53-112).

The scene is the exact bench scene (tools/bench_pipeline.make_sequence):
375x1242 frames, ~460k-point dense pseudo-LiDAR, 6 cars, 13-frame windows —
so the vs_baseline ratios in bench.py compare like against like.

Two metrics, printed as one JSON line:
  ref_fit_cars_per_s    — per-car grid-search fit rate (est_location_and_
                          downsample + optimize_car), measured over the
                          frame's cars (cap with MEAS_CARS).
  ref_e2e_frames_per_s  — one full frame end-to-end: candidates over the
                          13-frame window -> tracking -> moving/standing ->
                          aggregation -> per-car fit -> NMS(+reopt) -> writer.

Usage: python tools/measure_ref_baseline.py   (runtime: minutes; CPU-only)
"""

import json
import os
import sys
import tempfile
import time
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, HERE)


def main():
    import bench_pipeline
    import ref_pipeline_harness as harness

    if not harness.reference_available():
        print(json.dumps({"error": "reference not available"}))
        return

    window = 6
    n_cars_cap = int(os.environ.get("MEAS_CARS", "0"))

    frames, _ = bench_pipeline.make_sequence(n_frames=1, window=window)
    ref_idx = window                      # first (only) labelable frame
    ref_z = frames[ref_idx]["ego_z"]
    scene_frames = {}
    transforms = []
    for k in range(2 * window + 1):
        fr = frames[k]
        scene_frames[k] = {"points": fr["points"], "masks": fr["masks"]}
        t = np.eye(4)
        t[2, 3] = fr["ego_z"] - ref_z
        transforms.append(t)
    scene = dict(frames=scene_frames, ref_frame=ref_idx,
                 transforms=np.stack(transforms), p2=bench_pipeline.P2,
                 img_hw=(bench_pipeline.H, bench_pipeline.W))

    tmp = tempfile.mkdtemp()
    # SHIPPED grid (config.yaml:64-66) — the harness only shrinks it when
    # asked; total_frames covers the window
    from monosowa_tpu.sowa.templates import TemplateBank
    pipe = harness.build_reference_pipeline(
        tmp, window=window, grid=(40, 40, 40),
        total_frames=2 * window + 2,
        template=TemplateBank.default().points[0])

    # --- stage the caches exactly like run_reference_on_scene ------------
    import pickle
    import zstd as zstd_mod
    h, w = scene["img_hw"]
    ref = scene["ref_frame"]
    file_name = f"{ref:06d}"
    for num, fr in scene["frames"].items():
        np.savez(os.path.join(pipe.pseudo_lidar_folder,
                              str(num).zfill(10) + ".npz"),
                 array1=np.asarray(fr["points"], np.float32))
    masks_window = []
    for i in range(-window, window + 1):
        fr = scene["frames"].get(ref + i)
        masks_window.append(
            [] if fr is None else
            np.array([np.asarray(m, bool).T for m in fr["masks"]]))
    blob = zstd_mod.compress(pickle.dumps(masks_window,
                                          pickle.HIGHEST_PROTOCOL))
    with open(os.path.join(pipe.cfg.paths.merged_frames_path, "masks_raw",
                           file_name + ".zstd"), "wb") as f:
        f.write(blob)
    np.save(os.path.join(pipe.cfg.paths.merged_frames_path,
                         "transformations", file_name + ".npy"),
            np.asarray(scene["transforms"], np.float64))
    p2 = np.asarray(scene["p2"], np.float64)
    pipe.kitti_data = types.SimpleNamespace(
        oxts=[None] * pipe.total_frames,
        calib=types.SimpleNamespace(P_rect_00=p2))
    pipe.file_number = ref
    pipe.file_name = file_name
    pipe.pic_index = ref
    pipe.path_to_folder = os.path.join(pipe.pseudo_lidar_folder, "nothere/")
    pipe.img = np.zeros((3, h, w), np.uint8)

    # --- timed: main_kitti optimization path -----------------------------
    t0 = time.perf_counter()
    pipe.load_and_prepare_lidar_scan_from_multiple_pykittiV2(
        pipe.file_name, pipe.img, save=False)
    t_candidates = time.perf_counter() - t0
    print(f"# candidates/tracking/aggregation: {t_candidates:.1f}s "
          f"({len(pipe.cars)} cars)", file=sys.stderr, flush=True)

    t_fit = 0.0
    n_fit = 0
    t0 = time.perf_counter()
    for idx in range(len(pipe.cars)):
        if n_cars_cap and n_fit >= n_cars_cap:
            break
        tc = time.perf_counter()
        if not pipe.est_location_and_downsample(pipe.cars[idx]):
            continue
        pipe.cars[idx] = pipe.optimize_car(pipe.cars[idx])
        dt = time.perf_counter() - tc
        t_fit += dt
        n_fit += 1
        print(f"# ref optimize_car {idx}: {dt:.1f}s", file=sys.stderr,
              flush=True)
    # the cars the cap skipped would have cost the same per-car rate; the
    # e2e figure extrapolates them so the frame total stays honest
    n_cars_total = sum(
        1 for c in pipe.cars if getattr(c, "optimized", False)) or n_fit
    t_fit_full = (t_fit / max(n_fit, 1)) * len(pipe.cars)

    t0 = time.perf_counter()
    pipe.cars, to_be_reopt = pipe.non_maxima_surpression(pipe.cars)
    if pipe.cfg.optimization.nms_merge_and_reopt:
        for index in to_be_reopt:
            if not pipe.est_location_and_downsample(pipe.cars[index]):
                continue
            pipe.cars[index] = pipe.optimize_car(pipe.cars[index])
    pipe.writetxt_cars(pipe.cars)
    t_nms = time.perf_counter() - t0

    t_frame = t_candidates + t_fit_full + t_nms
    out = {
        "ref_fit_cars_per_s": round(n_fit / max(t_fit, 1e-9), 4),
        "ref_e2e_frames_per_s": round(1.0 / max(t_frame, 1e-9), 4),
        "detail": {
            "t_candidates_s": round(t_candidates, 2),
            "t_fit_s_measured": round(t_fit, 2),
            "cars_measured": n_fit,
            "cars_total": len(pipe.cars) if n_cars_total else n_fit,
            "t_fit_s_extrapolated": round(t_fit_full, 2),
            "t_nms_s": round(t_nms, 2),
            "t_frame_s": round(t_frame, 2),
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""End-to-end pseudo-label pipeline benchmark at KITTI-realistic sizes.

Builds a synthetic sequence (375x1242 frames, dense pseudo-LiDAR from a
rendered depth image = ~460k points/frame, ~6 cars), then times
PseudoLabeler.label_frames over a group of frames.

Usage: python tools/bench_pipeline.py [n_frames] [--profile]
"""

import cProfile
import os
import pstats
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H = int(os.environ.get("BENCH_H", "375"))
W = int(os.environ.get("BENCH_W", "1242"))
FU = 721.5 * W / 1242
P2 = np.array([[FU, 0, W / 2, 0], [0, FU, H / 2, 0], [0, 0, 1, 0]])
N_CARS = int(os.environ.get("BENCH_CARS", "6"))


def make_sequence(n_frames=8, window=6, seed=0):
    """Returns per-labeled-frame job kwargs for label_frames."""
    from monosowa_tpu.sowa.templates import TemplateBank

    rng = np.random.default_rng(seed)
    bank = TemplateBank.default()

    total = n_frames + 2 * window
    # static cars at CONSTANT density along the whole driven corridor
    # (ego drives +z at 0.8 m/frame): ~N_CARS visible per frame in the
    # 4-70 m band regardless of sequence length — a z in [8, 45] cluster
    # empties once the ego passes it, which silently deflated long-stream
    # per-frame fit work
    spacing = 66.0 / max(N_CARS, 1)
    road_end = total * 0.8 + 74.0
    cars = []
    for z0 in np.arange(8.0, road_end, spacing):
        cars.append(dict(
            x=rng.uniform(-8, 8), y=1.1,
            z=float(z0) + rng.uniform(-0.4 * spacing, 0.4 * spacing),
            theta=rng.uniform(0, 2 * np.pi)))
    frames = []
    ys, xs = np.mgrid[0:H, 0:W]
    for k in range(total):
        ego_z = k * 0.8
        # depth image: ground plane + car boxes
        depth = np.full((H, W), 300.0, np.float32)
        # ground: y = 1.65 -> depth = fu * 1.65 / (v - cv) for v > cv
        v_rel = ys - H / 2
        ground_d = np.where(v_rel > 1, FU * 1.65 / np.maximum(v_rel, 1), 300.0)
        depth = np.minimum(depth, ground_d)
        masks = []
        for car in cars:
            z = car["z"] - ego_z
            if z < 4 or z > 70:
                masks.append(None)
                continue
            u = FU * car["x"] / z + W / 2
            v = FU * car["y"] / z + H / 2
            wpx = FU * 4.0 / z
            hpx = FU * 1.6 / z
            x1, x2 = int(u - wpx / 2), int(u + wpx / 2)
            y1, y2 = int(v - hpx), int(v)
            if x2 < 0 or x1 >= W or y2 < 0 or y1 >= H:
                masks.append(None)
                continue
            x1, x2 = max(x1, 0), min(x2, W)
            y1, y2 = max(y1, 0), min(y2, H)
            m = np.zeros((H, W), bool)
            m[y1:y2, x1:x2] = True
            depth[m] = np.minimum(depth[m], z)
            masks.append(m)
        # back-project every pixel (Metric3D contract)
        pts = np.stack([(xs - W / 2) * depth / FU,
                        (ys - H / 2) * depth / FU,
                        depth], -1).reshape(-1, 3).astype(np.float32)
        pts += rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
        t = np.eye(4)
        t[2, 3] = -ego_z          # cur -> world-ish; per-job adjusted below
        frames.append(dict(points=pts, depth=depth,
                           masks=[m for m in masks if m is not None],
                           ego_z=ego_z))
    return frames, window


def run(n_frames=8, do_profile=False, quiet=False, iters=3, window=6,
        streams=1, max_points=2048):
    """Times a pipelined label_frames_stream over ``iters * n_frames``
    CONSECUTIVE full-size frames (group size n_frames) — the production
    driver shape, windows naturally shared between neighbouring groups.

    ``window``: half-window in frames (reference nscans_before/after —
    production config is 30 for the ±30 = 61-frame aggregation,
    config.yaml:31-32; 6 reproduces the earlier 13-frame scene).
    ``streams``: measured passes after the warmup stream; the returned
    list holds one steady-state frames/s per pass (spread for the bench
    JSON).  Returns (fps_list, n_frames_per_stream)."""
    from monosowa_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache("/tmp/jax_cache")
    from monosowa_tpu.sowa import pipeline
    from monosowa_tpu.sowa.fitting import FitConfig

    total_frames = n_frames * iters
    frames, _ = make_sequence(total_frames, window=window)
    cfg = pipeline.PipelineConfig(
        nscans_before=window, nscans_after=window, max_cars=16,
        max_points=max_points, min_standing_points=400,
        fit=FitConfig(fine_chunk=60))
    labeler = pipeline.PseudoLabeler(cfg)

    tmp = tempfile.mkdtemp()
    offsets = list(range(-window, window + 1))

    def jobs(tag, off=0.0, lo=0, hi=None):
        # ``off``: tiny per-stream depth offset (sub-mm) so repeated
        # streams are NOT bitwise-identical dispatches — the remote
        # execution service caches results for identical program+input
        # pairs, which fakes near-zero stream times (same defeat as
        # bench.py's per-iteration fit jitter)
        out = []
        for fi in range(window + lo, window + (hi if hi is not None
                                               else total_frames)):
            ref_z = frames[fi]["ego_z"]
            transforms = []
            for k in offsets:
                t = np.eye(4)
                t[2, 3] = frames[fi + k]["ego_z"] - ref_z
                transforms.append(t)
            out.append(dict(
                out_path=os.path.join(tmp, f"{tag}_{fi:06d}.txt"),
                window_frames=offsets,
                frame_ids=[(tag, fi - window + k)
                           for k in range(len(offsets))],
                get_points=(lambda k, fi=fi:
                            frames[fi - window + k]["points"]),
                get_depth=(lambda k, fi=fi, off=off:
                           frames[fi - window + k]["depth"] + off
                           if off else frames[fi - window + k]["depth"]),
                get_masks=(lambda k, fi=fi: frames[fi - window + k]["masks"]),
                transforms=np.stack(transforms), p2=P2, img_hw=(H, W)))
        return out

    # warmup: one full identical stream — compiles/loads every program the
    # stream shape needs (incl. the per-group car-count buckets) and pays
    # the once-per-process jaxpr lowering, which a production run over
    # thousands of frames amortizes to nothing
    t0 = time.perf_counter()
    labeler.label_frames_stream(jobs("warm"), group_size=n_frames)
    if not quiet:
        print(f"# warmup stream ({total_frames} frames, window "
              f"+-{window}, compiles): {time.perf_counter() - t0:.1f}s")

    if do_profile:
        pr = cProfile.Profile()
        pr.enable()
    # steady state = the production driver shape: one pipelined stream of
    # consecutive frames in n_frames-sized groups (cli.py labels a
    # sequence the same way) — group k+1's extraction overlaps group k's
    # fit pull, and overlapping windows share cached extractions
    fps = []
    for s in range(streams):
        t0 = time.perf_counter()
        n = labeler.label_frames_stream(jobs(f"run{s}", off=(s + 1) * 1e-3),
                                        group_size=n_frames)
        dt = time.perf_counter() - t0
        fps.append(n / dt)
        if not quiet:
            print(f"label_frames_stream[{s}]: {n} frames in {dt:.2f}s "
                  f"= {n / dt:.2f} frames/s")
    if do_profile:
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
    return fps, total_frames


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    n_frames = int(pos[0]) if pos else 8
    window = int(pos[1]) if len(pos) > 1 else 6
    run(n_frames, do_profile="--profile" in sys.argv, window=window)


if __name__ == "__main__":
    main()

"""Device candidate extraction vs the host (reference-exact) path.

The device extractor consumes depth maps + bit-packed masks and must agree
with candidates.extract_candidates_cam on the identical back-projected
cloud: same surviving masks, centers to ~1e-3 m (bisection vs np.median is
f32-exact; circle-filter boundary points may tie), member sets ~identical.
"""

import numpy as np
import pytest

from monosowa_tpu.sowa import candidates
from monosowa_tpu.sowa.candidates_device import DeviceExtractor

H, W = 96, 160
FU = 120.0
P2 = np.array([[FU, 0, W / 2, 0], [0, FU, H / 2, 0], [0, 0, 1, 0]],
              np.float32)


def _scene(seed=0, car_boxes=((40, 20, 30, 14, 12.0), (100, 40, 40, 22, 7.0)),
           far_box=None):
    """Depth image: 300 m background + ground + car boxes at given depth.
    car_boxes: (x1, y1, w, h, z)."""
    rng = np.random.default_rng(seed)
    depth = np.full((H, W), 300.0, np.float32)
    ys = np.arange(H)[:, None]
    vrel = np.maximum(ys - H / 2, 1)
    depth = np.minimum(depth, (FU * 1.6 / vrel).astype(np.float32)
                       * np.ones((H, W), np.float32))
    masks = []
    boxes = list(car_boxes) + ([far_box] if far_box else [])
    for (x1, y1, bw, bh, z) in boxes:
        m = np.zeros((H, W), bool)
        m[y1:y1 + bh, x1:x1 + bw] = True
        depth[m] = z + rng.normal(scale=0.01, size=int(m.sum())) \
            .astype(np.float32)
        masks.append(m)
    return depth, masks


def _backproject(depth):
    ys, xs = np.mgrid[0:H, 0:W]
    z = depth
    x = (xs - W / 2) * z / FU
    y = (ys - H / 2) * z / FU
    return np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)


def _host(depth, masks, cfg):
    return candidates.extract_candidates_cam(
        _backproject(depth), P2, (H, W), masks, cfg)


@pytest.mark.parametrize("seed", [0, 1])
def test_device_matches_host(seed):
    cfg = candidates.CandidateConfig(moving_detection_threshold=2,
                                     filter_diameter=4.0)
    depth, masks = _scene(seed)
    host = _host(depth, masks, cfg)
    dev = DeviceExtractor(P2, (H, W), cfg).extract_frames([depth], [masks])[0]

    assert dev is not None
    assert len(dev["points"]) == len(host["points"])
    assert dev["locations"].shape == host["locations"].shape
    np.testing.assert_allclose(dev["locations"], host["locations"],
                               atol=5e-3)
    for dp, hp in zip(dev["points"], host["points"]):
        # identical point sets up to circle-boundary ties
        ds = {tuple(np.round(p, 4)) for p in dp}
        hs = {tuple(np.round(p, 4)) for p in hp}
        inter = len(ds & hs)
        union = len(ds | hs)
        assert inter / union > 0.995, (len(ds), len(hs), inter)


def test_device_far_gate_and_fallbacks():
    cfg = candidates.CandidateConfig(moving_detection_threshold=2,
                                     filter_diameter=4.0,
                                     max_distance_pseudo_lidar=75.0)
    # a car beyond 75 m must be dropped; a 3x3 mask exercises the
    # erode-1 / raw fallbacks
    depth, masks = _scene(2, car_boxes=((30, 30, 3, 3, 10.0),),
                          far_box=(120, 10, 20, 10, 200.0))
    host = _host(depth, masks, cfg)
    dev = DeviceExtractor(P2, (H, W), cfg).extract_frames([depth], [masks])[0]
    assert len(dev["points"]) == len(host["points"])
    if len(host["points"]):
        np.testing.assert_allclose(dev["locations"], host["locations"],
                                   atol=5e-3)


def test_label_frames_device_vs_host_paths(tmp_path):
    """The full label_frames output must agree between the device extractor
    (jobs with get_depth) and the host extractor (points only)."""
    from monosowa_tpu.kittiio import read_label_file
    from monosowa_tpu.sowa import pipeline
    from monosowa_tpu.sowa.fitting import FitConfig

    window = 2
    n_frames = 3
    total = n_frames + 2 * window
    scenes = [_scene(seed=10 + k) for k in range(total)]
    offsets = list(range(-window, window + 1))

    cfg = pipeline.PipelineConfig(
        nscans_before=window, nscans_after=window, max_cars=4,
        max_points=1024, min_standing_points=200,
        fit=FitConfig(n_dx=16, n_dz=16, n_theta=16, n_theta_fine=90,
                      fine_chunk=10))
    labeler = pipeline.PseudoLabeler(cfg)

    def jobs(tag, with_depth):
        out = []
        for fi in range(window, window + n_frames):
            job = dict(
                out_path=str(tmp_path / f"{tag}_{fi:06d}.txt"),
                window_frames=offsets,
                frame_ids=[fi - window + k for k in range(len(offsets))],
                get_points=(lambda k, fi=fi:
                            _backproject(scenes[fi - window + k][0])),
                get_masks=(lambda k, fi=fi: scenes[fi - window + k][1]),
                transforms=np.tile(np.eye(4), (len(offsets), 1, 1)),
                p2=P2, img_hw=(H, W))
            if with_depth:
                job["get_depth"] = (lambda k, fi=fi:
                                    scenes[fi - window + k][0])
            out.append(job)
        return out

    assert labeler.label_frames(jobs("host", False)) == n_frames
    assert labeler.label_frames(jobs("dev", True)) == n_frames

    # The device path (bank mode) feeds the fitter an evenly-subsampled
    # slot batch rather than the host's concat-then-random-cap cloud; on
    # this deliberately degenerate fixture (flat constant-depth
    # rectangles) several symmetric poses tie, so compare counts/2D boxes
    # exactly, centers loosely, and poses by EXACT binary-loss
    # equivalence on the host-aggregated cloud.
    import jax.numpy as jnp

    from monosowa_tpu.ops import tfl
    from monosowa_tpu.ops.geometry import rot_y
    from monosowa_tpu.sowa import aggregation, lomm

    def host_clouds(fi):
        cands = [candidates.extract_candidates(
            _backproject(scenes[fi - window + k][0]), P2, (H, W),
            scenes[fi - window + k][1], np.eye(4), cfg.candidate)
            for k in range(len(offsets))]
        tracks = lomm.greedy_track(cands, offsets,
                                   cfg.dist_threshold_tracking)
        lomm.classify_all(tracks)
        _, pts, _ = aggregation.aggregate_tracks(
            tracks, np.tile(np.eye(4), (len(offsets), 1, 1)), offsets,
            cfg.keep_k_frames, cfg.min_standing_points)
        return pts

    tpl = labeler.template

    def exact_loss(cloud, row):
        x, y, z = row["pos"]
        th = row["ry"] + np.pi / 2
        rot = np.asarray(rot_y(jnp.float32(th)))
        posed_t = np.asarray(tpl) @ rot.T + np.array(
            [x, y - row["h"] / 2, z], np.float32)
        return float(tfl.binary_both_way_loss(
            jnp.asarray(cloud, jnp.float32),
            jnp.ones(cloud.shape[0], bool),
            jnp.asarray(posed_t, jnp.float32), 0.2))

    for fi in range(window, window + n_frames):
        lh = read_label_file(str(tmp_path / f"host_{fi:06d}.txt"))
        ld = read_label_file(str(tmp_path / f"dev_{fi:06d}.txt"))
        assert lh.names == ld.names, fi
        if not len(lh.names):
            continue
        np.testing.assert_allclose(ld.box2d, lh.box2d, atol=0.5)
        np.testing.assert_allclose(ld.pos[:, 1], lh.pos[:, 1], atol=0.1)
        np.testing.assert_allclose(ld.pos, lh.pos, atol=2.0)
        clouds = host_clouds(fi)
        assert len(clouds) == len(lh.names)
        for ci in range(len(lh.names)):
            cloud = clouds[ci]
            row_h = dict(pos=lh.pos[ci], ry=float(lh.ry[ci]),
                         h=float(lh.hwl[ci][0]))
            row_d = dict(pos=ld.pos[ci], ry=float(ld.ry[ci]),
                         h=float(ld.hwl[ci][0]))
            l_h = exact_loss(cloud, row_h)
            l_d = exact_loss(cloud, row_d)
            assert l_d <= l_h + 0.05, (fi, ci, l_d, l_h)


def test_device_empty_and_none_frames():
    cfg = candidates.CandidateConfig()
    depth, masks = _scene(3)
    ext = DeviceExtractor(P2, (H, W), cfg)
    out = ext.extract_frames([None, depth, depth], [[], masks, []])
    assert out[0] is None and out[2] is None
    assert out[1] is not None and len(out[1]["points"]) > 0

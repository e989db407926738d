"""LOMM tracking + moving classification + aggregation + candidates."""

import numpy as np
import pytest

from monosowa_tpu.sowa import aggregation, candidates, lomm

WINDOW = list(range(-10, 11))


def _make_candidates(paths):
    """paths: list of (W, 3) or None-per-frame location arrays."""
    cands = []
    for k in range(len(WINDOW)):
        locs, pts, masks = [], [], []
        for p in paths:
            if p[k] is None:
                continue
            locs.append(np.asarray(p[k], np.float64))
            pts.append(np.asarray(p[k], np.float64)[None, :].repeat(5, 0))
            masks.append(None)
        if locs:
            cands.append({"locations": np.stack(locs), "points": pts,
                          "masks": masks})
        else:
            cands.append(None)
    return cands


def test_tracker_separates_standing_and_moving():
    standing = [np.array([5.0, 1.0, 20.0]) + 0.05 * np.sin(k)
                for k in range(21)]
    moving = [np.array([-3.0, 1.0, 5.0 + 1.0 * k]) for k in range(21)]
    tracks = lomm.greedy_track(_make_candidates([standing, moving]), WINDOW)
    assert len(tracks) == 2
    assert all(len(t.frames) == 21 for t in tracks)
    lomm.classify_all(tracks)
    mov_flags = sorted(t.moving for t in tracks)
    assert mov_flags == [False, True]


def test_tracker_gates_large_jumps():
    # a "car" that teleports 50 m mid-window must split into two tracks
    jumpy = [np.array([0.0, 1.0, 10.0])] * 10 + \
            [np.array([50.0, 1.0, 10.0])] * 11
    tracks = lomm.greedy_track(_make_candidates([jumpy]), WINDOW)
    assert len(tracks) == 2


def test_tracker_velocity_extrapolation_bridges_detection_noise():
    # constant velocity with noise well under the 10 m gate stays one track
    rng = np.random.default_rng(3)
    path = [np.array([0.0, 1.0, 2.0 * k]) + rng.normal(scale=0.3, size=3)
            for k in range(21)]
    tracks = lomm.greedy_track(_make_candidates([path]), WINDOW)
    assert len(tracks) == 1
    lomm.classify_all(tracks)
    assert tracks[0].moving


def test_moving_classifier_small_jitter_standing():
    rng = np.random.default_rng(4)
    t = lomm.Track(frames=list(range(-10, 11)),
                   locations=[np.array([3.0, 1.0, 15.0])
                              + rng.normal(scale=0.2, size=3)
                              for _ in range(21)],
                   points=[None] * 21, masks=[None] * 21)
    assert lomm.classify_moving(t) is False
    # 'both' p-value variant agrees on obvious cases
    assert lomm.classify_moving(t, method="both") is False


def test_moving_classifier_requires_net_displacement():
    # oscillating car: deltas have signal but net displacement < 5 m
    locs = [np.array([0.0, 1.0, 10.0 + 2.0 * np.sin(k / 3.0)])
            for k in range(21)]
    t = lomm.Track(frames=list(range(-10, 11)), locations=locs,
                   points=[None] * 21, masks=[None] * 21)
    assert lomm.classify_moving(t) is False


def test_aggregate_standing_clever_picks_closest_frames():
    # identity transforms; car at z = 20 except 3 frames where ego was closer
    w = WINDOW
    transforms = np.tile(np.eye(4), (len(w), 1, 1))
    frames = list(range(-5, 6))
    locs = [np.array([0.0, 1.0, 20.0])] * len(frames)
    pts = [np.full((10, 3), float(f)) for f in frames]
    tr = lomm.Track(frames=frames, locations=locs, points=pts,
                    masks=[None] * len(frames))
    agg = aggregation.aggregate_standing_clever(tr, transforms, w, keep_k=3)
    # all frames have equal distance -> first three by argsort stability
    assert agg.shape == (30, 3)

    # now make frame +3's location closer (transform shifts it)
    transforms2 = transforms.copy()
    for i, f in enumerate(frames):
        tmat = np.eye(4)
        # inverse transform moves the car to z = 20 - |f| when mapped back
        tmat[2, 3] = -float(abs(f))
        transforms2[f - w[0]] = np.linalg.inv(tmat)
    agg2 = aggregation.aggregate_standing_clever(tr, transforms2, w, keep_k=2)
    # frames -5 and +5 (z=15 after inverse) are closest
    vals = sorted(set(agg2[:, 0]))
    assert vals == [-5.0, 5.0]


def test_moving_keeps_only_ref_frame_points():
    frames = [-2, 0, 2]
    pts = [np.full((4, 3), float(f)) for f in frames]
    tr = lomm.Track(frames=frames, locations=[np.zeros(3)] * 3, points=pts,
                    masks=[None] * 3, moving=True)
    ref = aggregation.moving_keep_ref(tr)
    assert np.all(ref == 0.0)
    tr2 = lomm.Track(frames=[-2, 2], locations=[np.zeros(3)] * 2,
                     points=pts[:2], masks=[None] * 2, moving=True)
    assert aggregation.moving_keep_ref(tr2) is None
    assert aggregation.filter_moving_not_visible([tr, tr2]) == [tr]


def test_candidate_extraction_basic():
    # synthetic frame: flat image 100x200, points of a car at (2, 1, 10)
    h, w = 100, 200
    p2 = np.array([[100.0, 0, 100.0, 0], [0, 100.0, 50.0, 0], [0, 0, 1, 0]])
    rng = np.random.default_rng(5)
    car_pts = np.array([2.0, 1.0, 10.0]) + rng.normal(scale=0.3, size=(300, 3))
    bg_pts = np.array([-5.0, 1.0, 30.0]) + rng.normal(scale=1.0, size=(200, 3))
    pts = np.concatenate([car_pts, bg_pts])

    # build the mask from the car points' true projection
    proj, _ = candidates.project_points(car_pts, p2, (h, w))
    mask = np.zeros((h, w), bool)
    mask[proj[:, 4].astype(int), proj[:, 3].astype(int)] = True
    mask = candidates.erode_mask(np.invert(mask), 3)  # dilate mask by 3
    mask = np.invert(mask)

    out = candidates.extract_candidates(pts, p2, (h, w), [mask], np.eye(4))
    assert out["locations"].shape == (1, 3)
    np.testing.assert_allclose(out["locations"][0], [2.0, 1.0, 10.0],
                               atol=0.25)
    assert out["points"][0].shape[0] >= 100


def test_candidate_rejects_behind_camera_and_far():
    h, w = 100, 200
    p2 = np.array([[100.0, 0, 100.0, 0], [0, 100.0, 50.0, 0], [0, 0, 1, 0]])
    rng = np.random.default_rng(6)
    car_pts = np.array([0.0, 1.0, 80.0]) + rng.normal(scale=0.3, size=(100, 3))
    proj, _ = candidates.project_points(car_pts, p2, (h, w))
    mask = np.zeros((h, w), bool)
    mask[proj[:, 4].astype(int), proj[:, 3].astype(int)] = True
    # 80 m > max_distance_pseudo_lidar
    out = candidates.extract_candidates(car_pts, p2, (h, w), [mask], np.eye(4))
    assert out["locations"].shape[0] == 0
    # behind camera after transform
    t = np.eye(4)
    t[2, 3] = -100.0
    out2 = candidates.extract_candidates(
        car_pts, p2, (h, w), [mask], t,
        candidates.CandidateConfig(use_pseudo_lidar=False))
    assert out2["locations"].shape[0] == 0


def test_aggregate_standing_all_concats_every_observation():
    # use_clever_aggregation: False (loader.py:773-781) — no frame
    # selection, every observation's points are concatenated
    w = WINDOW
    transforms = np.tile(np.eye(4), (len(w), 1, 1))
    frames = list(range(-5, 6))
    locs = [np.array([0.0, 1.0, 20.0])] * len(frames)
    pts = [np.full((10, 3), float(f)) for f in frames]
    masks = [np.ones((4, 4), bool) if f == 0 else None for f in frames]
    tr = lomm.Track(frames=frames, locations=locs, points=pts, masks=masks)
    agg = aggregation.aggregate_standing_all(tr)
    assert agg.shape == (110, 3)
    kept, points, _ = aggregation.aggregate_tracks(
        [tr], transforms, w, keep_k=3, min_points=1, clever=False)
    assert len(kept) == 1 and points[0].shape == (110, 3)
    kept_c, points_c, _ = aggregation.aggregate_tracks(
        [tr], transforms, w, keep_k=3, min_points=1, clever=True)
    assert points_c[0].shape == (30, 3)

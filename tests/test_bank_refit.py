"""Fused in-program NMS-merge re-fit (bank mode) vs the host merge path.

``_fit_nms_from_bank(refit_cap>0)`` re-optimizes NMS-merge winners inside
the one fused device program; it must write labels identical to the
host path (``bank_refit_cap=0``: pull NMS, build merge groups with
``merge_slots``, re-fit in a second device call), because both consume
the same slot union in the same count-descending order.  Reference
semantics: loader.py:2727-2800 (NMS + point merge) and
main_class.py:227-235 (re-optimize merged winners).
"""

import numpy as np
import pytest

from monosowa_tpu.kittiio import read_label_file
from monosowa_tpu.sowa import pipeline
from monosowa_tpu.sowa.fitting import FitConfig

H, W = 96, 160
FU = 120.0
P2 = np.array([[FU, 0, W / 2, 0], [0, FU, H / 2, 0], [0, 0, 1, 0]],
              np.float32)


def _scene(seed, dup_boxes):
    """Depth image with ground + car boxes; each box emits TWO nearly
    identical masks (1px inset) so their fitted boxes overlap and NMS
    merges one into the other."""
    rng = np.random.default_rng(seed)
    depth = np.full((H, W), 300.0, np.float32)
    ys = np.arange(H)[:, None]
    vrel = np.maximum(ys - H / 2, 1)
    depth = np.minimum(depth, (FU * 1.6 / vrel).astype(np.float32)
                       * np.ones((H, W), np.float32))
    masks = []
    for (x1, y1, bw, bh, z) in dup_boxes:
        m = np.zeros((H, W), bool)
        m[y1:y1 + bh, x1:x1 + bw] = True
        depth[m] = z + rng.normal(scale=0.01, size=int(m.sum())) \
            .astype(np.float32)
        m2 = np.zeros((H, W), bool)
        m2[y1 + 1:y1 + bh - 1, x1 + 1:x1 + bw - 1] = True
        masks.extend([m, m2])
    return depth, masks


def _label_with_cap(tmp_path, tag, refit_cap, dup_boxes, window=2,
                    n_frames=2):
    total = n_frames + 2 * window
    scenes = [_scene(5 + k, dup_boxes) for k in range(total)]
    offsets = list(range(-window, window + 1))
    cfg = pipeline.PipelineConfig(
        nscans_before=window, nscans_after=window, max_cars=8,
        max_points=1024, min_standing_points=150,
        bank_refit_cap=refit_cap,
        fit=FitConfig(n_dx=12, n_dz=12, n_theta=12, n_theta_fine=45,
                      fine_chunk=9))
    labeler = pipeline.PseudoLabeler(cfg)
    jobs = []
    for fi in range(window, window + n_frames):
        jobs.append(dict(
            out_path=str(tmp_path / f"{tag}_{fi:06d}.txt"),
            window_frames=offsets,
            frame_ids=[fi - window + k for k in range(len(offsets))],
            get_points=(lambda k, fi=fi: None),
            get_depth=(lambda k, fi=fi: scenes[fi - window + k][0]),
            get_masks=(lambda k, fi=fi: scenes[fi - window + k][1]),
            transforms=np.tile(np.eye(4), (len(offsets), 1, 1)),
            p2=P2, img_hw=(H, W)))
    assert labeler.label_frames(jobs) == n_frames
    return [read_label_file(str(tmp_path / f"{tag}_{fi:06d}.txt"))
            for fi in range(window, window + n_frames)]


BOXES_ONE = ((40, 20, 30, 14, 12.0),)
BOXES_TWO = ((30, 20, 26, 14, 12.0), (100, 40, 40, 22, 7.0))


def _assert_same(a, b):
    assert a.names == b.names
    if not len(a.names):
        return
    np.testing.assert_allclose(a.pos, b.pos, atol=1e-4)
    np.testing.assert_allclose(a.ry, b.ry, atol=1e-4)
    np.testing.assert_allclose(a.hwl, b.hwl, atol=1e-6)
    np.testing.assert_allclose(a.box2d, b.box2d, atol=1e-3)
    np.testing.assert_allclose(a.score, b.score, atol=1e-4)


def test_fused_refit_matches_host_merge(tmp_path):
    host = _label_with_cap(tmp_path, "host", 0, BOXES_ONE)
    dev = _label_with_cap(tmp_path, "dev", 8, BOXES_ONE)
    # the duplicate mask must actually have triggered a merge: one
    # surviving car from two candidate masks
    assert any(len(f.names) for f in host)
    for f in host:
        assert len(f.names) <= 1
    for a, b in zip(host, dev):
        _assert_same(a, b)


@pytest.mark.slow
def test_stream_matches_per_group(tmp_path):
    """label_frames_stream (2-deep pipelined groups) must write byte-
    identical labels to sequential per-group label_frames calls."""
    window, n_frames = 2, 4
    total = n_frames + 2 * window
    scenes = [_scene(5 + k, BOXES_TWO) for k in range(total)]
    offsets = list(range(-window, window + 1))
    cfg = pipeline.PipelineConfig(
        nscans_before=window, nscans_after=window, max_cars=8,
        max_points=1024, min_standing_points=150,
        fit=FitConfig(n_dx=12, n_dz=12, n_theta=12, n_theta_fine=45,
                      fine_chunk=9))
    labeler = pipeline.PseudoLabeler(cfg)

    def jobs(tag):
        out = []
        for fi in range(window, window + n_frames):
            out.append(dict(
                out_path=str(tmp_path / f"{tag}_{fi:06d}.txt"),
                window_frames=offsets,
                frame_ids=[fi - window + k for k in range(len(offsets))],
                get_points=(lambda k, fi=fi: None),
                get_depth=(lambda k, fi=fi: scenes[fi - window + k][0]),
                get_masks=(lambda k, fi=fi: scenes[fi - window + k][1]),
                transforms=np.tile(np.eye(4), (len(offsets), 1, 1)),
                p2=P2, img_hw=(H, W)))
        return out

    seq = jobs("seq")
    assert labeler.label_frames(seq[:2]) == 2
    assert labeler.label_frames(seq[2:]) == 2
    assert labeler.label_frames_stream(jobs("str"), group_size=2) == 4
    for fi in range(window, window + n_frames):
        a = (tmp_path / f"seq_{fi:06d}.txt").read_text()
        b = (tmp_path / f"str_{fi:06d}.txt").read_text()
        assert a == b, fi


@pytest.mark.slow
def test_fused_refit_overflow_falls_back(tmp_path):
    """Two merge targets with refit_cap=1: the second target re-fits via
    the host fallback and the labels still match the cap=0 path."""
    host = _label_with_cap(tmp_path, "host", 0, BOXES_TWO)
    over = _label_with_cap(tmp_path, "over", 1, BOXES_TWO)
    assert any(len(f.names) >= 2 for f in host)
    for a, b in zip(host, over):
        _assert_same(a, b)

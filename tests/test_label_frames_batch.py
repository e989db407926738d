"""Whole-sequence batched labelling parity with per-frame labelling."""

import numpy as np
import jax.numpy as jnp
import pytest

from monosowa_tpu.kittiio import read_label_file
from monosowa_tpu.sowa import pipeline
from monosowa_tpu.sowa.fitting import FitConfig
from tests.test_pipeline_e2e import H, P2, TRUE_POSE, W, _make_scene


@pytest.fixture(scope="module")
def labeler():
    # reduced grid (see test_label_frames_window.py) — batched-vs-per-frame
    # parity is grid-independent
    cfg = pipeline.PipelineConfig(
        nscans_before=3, nscans_after=3, max_cars=4, max_points=1024,
        min_standing_points=400,
        fit=FitConfig(n_dx=20, n_dz=20, n_theta=24, n_theta_fine=180,
                      fine_chunk=12))
    return pipeline.PseudoLabeler(cfg)


def test_label_frames_matches_per_frame(labeler, tmp_path):
    window = list(range(-3, 4))
    jobs = []
    for i, seed in enumerate((0, 1)):
        pts, masks, transforms = _make_scene(seed=seed)
        jobs.append(dict(
            out_path=str(tmp_path / f"b{i:06d}.txt"),
            window_frames=window,
            get_points=(lambda k, p=pts: p[k]),
            get_masks=(lambda k, m=masks: m[k]),
            transforms=transforms, p2=P2, img_hw=(H, W)))
    n = labeler.label_frames(jobs)
    assert n == 2

    for i, seed in enumerate((0, 1)):
        batched = read_label_file(str(tmp_path / f"b{i:06d}.txt"))
        assert batched.names == ["Car"]
        assert batched.pos[0][2] == pytest.approx(TRUE_POSE["z"], abs=0.4)

    # per-frame path produces matching poses
    pts, masks, transforms = _make_scene(seed=0)
    cars = labeler.label_frame(window, 3, lambda k: pts[k],
                               lambda k: masks[k], transforms, P2, (H, W))
    batched = read_label_file(str(tmp_path / "b000000.txt"))
    assert cars[0]["z"] + 0 == pytest.approx(batched.pos[0][2], abs=0.15)
    assert cars[0]["x"] == pytest.approx(batched.pos[0][0], abs=0.15)

    # skip-if-exists
    assert labeler.label_frames(jobs) == 0

"""Differential parity of ALL moving/standing classifier variants against
the reference's own code (loader.py:2247-2641) running via the stub
harness.  Random tracks (standing jitter, straight movers, slow creepers,
short tracks) are classified by both sides; decisions must agree exactly.
"""

import types

import numpy as np
import pytest

from monosowa_tpu.sowa.lomm import Track, classify_moving
from tests.ref_pipeline_harness import (build_reference_pipeline,
                                        reference_available)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree unavailable")

# (our method name, reference method name)
VARIANTS = [
    ("simple", "decide_if_standing_or_moving"),
    ("both", "decide_if_standing_or_moving_both"),
    ("both2", "decide_if_standing_or_moving_both2"),
    ("bothv3", "decide_if_standing_or_moving_bothv3"),
    ("both4", "decide_if_standing_or_moving_both4"),
    ("both5", "decide_if_standing_or_moving_both5"),
    ("both6", "decide_if_standing_or_moving_both6"),
]


@pytest.fixture(scope="module")
def ref_pipe(tmp_path_factory):
    return build_reference_pipeline(str(tmp_path_factory.mktemp("refmov")))


def _random_tracks(rng, n=40):
    """Mix of motion regimes; every track also carries a plausible LiDAR
    blob per observation for the bothv3 spread test."""
    tracks = []
    for i in range(n):
        kind = i % 4
        length = int(rng.integers(2, 14))
        if kind == 0:        # standing with jitter
            base = rng.uniform(-20, 20, 3)
            locs = base + rng.normal(scale=0.15, size=(length, 3))
        elif kind == 1:      # clear mover
            v = rng.uniform(0.5, 2.0, 3) * rng.choice([-1, 1], 3)
            locs = (rng.uniform(-5, 5, 3)
                    + np.arange(length)[:, None] * v
                    + rng.normal(scale=0.1, size=(length, 3)))
        elif kind == 2:      # slow creeper near the thresholds
            v = rng.uniform(0.1, 0.6, 3)
            locs = (rng.uniform(-5, 5, 3)
                    + np.arange(length)[:, None] * v
                    + rng.normal(scale=0.2, size=(length, 3)))
        else:                # short track
            length = int(rng.integers(1, 3))
            locs = rng.uniform(-20, 20, (length, 3))
        lidar = [loc + rng.normal(scale=rng.uniform(0.3, 4.0),
                                  size=(60, 3)) for loc in locs]
        tracks.append((locs.astype(np.float64), lidar))
    return tracks


def test_all_variants_match_reference(ref_pipe):
    ref_pipe.cfg.general.supress_debug_prints = True
    rng = np.random.default_rng(0)
    tracks = _random_tracks(rng)
    for ours, theirs in VARIANTS:
        for locs, lidar in tracks:
            if ours == "bothv3" and len(locs) == 0:
                continue
            car = types.SimpleNamespace(
                locations=[l.copy() for l in locs],
                lidar=[l.copy() for l in lidar], moving=None)
            with np.errstate(divide="ignore", invalid="ignore"):
                getattr(ref_pipe, theirs)([car], waymo=False)
            t = Track(frames=list(range(len(locs))),
                      locations=[l.copy() for l in locs],
                      points=[l.copy() for l in lidar],
                      masks=[None] * len(locs))
            got = classify_moving(t, method=ours)
            assert got == bool(car.moving), (ours, locs[:3], len(locs))

"""TFL loss_function dispatch (loss.py:98-116): every non-default kind is
differentially tested against the REFERENCE'S OWN loss implementations, and
the fitter is selectable from config with each kind."""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import ref_pipeline_harness as harness  # noqa: E402

from monosowa_tpu.ops import tfl  # noqa: E402
from monosowa_tpu.ops.geometry import rot_y  # noqa: E402
from monosowa_tpu.sowa import fitting  # noqa: E402
from monosowa_tpu.sowa.templates import TemplateBank  # noqa: E402


@pytest.fixture(scope="module")
def ref_losses():
    """The reference Losses mixin, importable thanks to the harness stubs."""
    if not harness.reference_available():
        pytest.skip("reference repo not present")
    harness.install_stubs()
    if harness.REF_SCRIPTS not in sys.path:
        sys.path.insert(0, harness.REF_SCRIPTS)
    import importlib
    return importlib.import_module("loss")


def _clouds(seed=0, n_scan=500, n_tmpl=300):
    rng = np.random.default_rng(seed)
    scan = rng.uniform(-2, 2, (n_scan, 3)).astype(np.float32)
    tmpl = (scan[rng.integers(0, n_scan, n_tmpl)]
            + rng.normal(scale=0.15, size=(n_tmpl, 3))).astype(np.float32)
    return scan, tmpl


def _ours(kind, scan, tmpl, **kw):
    mask = np.ones(len(scan), bool)
    return float(tfl.tfl_loss(jnp.asarray(scan), jnp.asarray(mask),
                              jnp.asarray(tmpl)[None], kind, **kw)[0])


def test_binary1way_parity(ref_losses):
    scan, tmpl = _clouds(1)
    self = type("S", (), {})()
    self.cfg = type("C", (), {})()
    self.cfg.loss_functions = type("L", (), {})()
    self.cfg.loss_functions.binary_loss_threshold = 0.2
    ref = ref_losses.Losses.binary_loss(self, scan, tmpl)
    assert _ours("binary1way", scan, tmpl, radius=0.2) == pytest.approx(
        ref, abs=1e-6)


def test_chamfer_parity(ref_losses):
    scan, tmpl = _clouds(2)
    self = type("S", (), {})()
    ref = ref_losses.Losses.avg_chamfer_distance(self, scan, tmpl)
    assert _ours("chamfer", scan, tmpl) == pytest.approx(ref, rel=1e-5)


def test_med1way_parity(ref_losses):
    scan, tmpl = _clouds(3)
    self = type("S", (), {})()
    ref = ref_losses.Losses.avg_med_distance_only_temp_to_scan(
        self, scan, tmpl)
    assert _ours("med1way", scan, tmpl) == pytest.approx(ref, rel=1e-5)


def test_medboth_parity(ref_losses):
    scan, tmpl = _clouds(4)
    self = type("S", (), {})()
    ref = ref_losses.Losses.avg_med_distance(self, scan, tmpl)
    assert _ours("medboth", scan, tmpl) == pytest.approx(ref, rel=1e-5)


def test_trimmed_parity(ref_losses):
    scan, tmpl = _clouds(5)
    self = type("S", (), {"custom_trim_mean":
                          ref_losses.Losses.custom_trim_mean})()
    ref = ref_losses.Losses.avg_trim_distance(self, scan, tmpl, 0.3)
    assert _ours("trimmed", scan, tmpl, trim=0.3) == pytest.approx(
        ref, rel=1e-4)


def test_diffbin_parity(ref_losses):
    import torch
    scan, tmpl = _clouds(6)
    self = type("S", (), {})()
    self.cfg = type("C", (), {})()
    self.cfg.loss_functions = type("L", (), {})()
    self.cfg.loss_functions.sigmoid_steepness = 10.0
    ref = float(ref_losses.Losses.binary_diff_loss_bothway(
        self, torch.from_numpy(scan), torch.from_numpy(tmpl)))
    assert _ours("diffbin", scan, tmpl, steepness=10.0) == pytest.approx(
        ref, rel=1e-4)


@pytest.mark.parametrize("kind", ["chamfer", "diffbin", "binary1way"])
def test_fit_recovers_car_with_alternate_loss(kind):
    """The fitter is config-selectable per kind and still recovers a
    planted standing car through the exact-grid path."""
    rng = np.random.default_rng(0)
    bank = TemplateBank.default()
    template = jnp.asarray(bank.points[0])
    true = dict(x=0.6, z=0.9, theta=1.1)
    rot = np.asarray(rot_y(jnp.float32(true["theta"])))
    scan = bank.points[0] @ rot.T + [true["x"], 0.0, true["z"]]
    scan = (scan + rng.normal(scale=0.02, size=scan.shape)).astype(np.float32)
    mask = np.ones(len(scan), bool)

    cfg = fitting.FitConfig(n_dx=12, n_dz=12, n_theta=16, n_theta_fine=90,
                            fine_chunk=10, loss_function=kind,
                            exact_grid_chunk=24)
    spec, occ_k, memb_k = fitting.make_conv_kernels(bank.points[0], cfg)
    batch = fitting.CarBatch(
        points=jnp.asarray(scan)[None], mask=jnp.asarray(mask)[None],
        moving=jnp.zeros(1, bool), theta_est=jnp.zeros(1, jnp.float32),
        theta_valid=jnp.zeros(1, bool), car_valid=jnp.ones(1, bool))
    res = fitting.fit_cars_conv(batch, template, occ_k, memb_k, spec, cfg)
    assert float(res.x[0]) == pytest.approx(true["x"], abs=0.4)
    assert float(res.z[0]) == pytest.approx(true["z"], abs=0.4)
    dth = (float(res.theta[0]) - true["theta"] + np.pi) % (2 * np.pi) - np.pi
    assert min(abs(dth), abs(abs(dth) - np.pi)) < np.deg2rad(10)


def test_moving_fixed_theta_scored_exactly_at_estimate():
    """A moving car with a valid trajectory angle is scored at EXACTLY
    theta_est in the non-binary2way path (optimize_moving evaluates the
    loss at opt_param3_range=[estimated_angle]), not at the nearest
    coarse lattice row — with nt=16 the lattice is 22.5 deg apart, so an
    off-lattice angle would otherwise bias the translation pick."""
    rng = np.random.default_rng(7)
    bank = TemplateBank.default()
    template = jnp.asarray(bank.points[0])
    # theta exactly between two lattice rows of the nt=16 grid
    theta = float(2 * np.pi / 16 * 3.5)
    true = dict(x=0.4, z=1.2, theta=theta)
    rot = np.asarray(rot_y(jnp.float32(theta)))
    scan = bank.points[0] @ rot.T + [true["x"], 0.0, true["z"]]
    scan = (scan + rng.normal(scale=0.02, size=scan.shape)).astype(np.float32)
    mask = np.ones(len(scan), bool)

    cfg = fitting.FitConfig(n_dx=12, n_dz=12, n_theta=16, n_theta_fine=90,
                            fine_chunk=10, loss_function="chamfer",
                            exact_grid_chunk=24, moving_dz_shift=0.0)
    spec, occ_k, memb_k = fitting.make_conv_kernels(bank.points[0], cfg)
    batch = fitting.CarBatch(
        points=jnp.asarray(scan)[None], mask=jnp.asarray(mask)[None],
        moving=jnp.ones(1, bool),
        theta_est=jnp.full(1, theta, jnp.float32),
        theta_valid=jnp.ones(1, bool), car_valid=jnp.ones(1, bool))
    res = fitting.fit_cars_conv(batch, template, occ_k, memb_k, spec, cfg)
    # reported theta is the exact estimate
    assert float(res.theta[0]) == pytest.approx(theta, abs=1e-6)
    # translation is recovered at the exact angle (the nearest-lattice
    # scoring is ~11 deg off and biases the chamfer minimum)
    assert float(res.x[0]) == pytest.approx(true["x"], abs=0.3)
    assert float(res.z[0]) == pytest.approx(true["z"], abs=0.3)

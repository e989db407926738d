"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run on virtual CPU devices (SURVEY.md §4e); the
real TPU chip is reserved for bench.py.  The axon sitecustomize registers the
TPU platform and overwrites ``jax_platforms`` at interpreter start, so env
vars alone are not enough — we must reset the jax config before any backend
initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Cap the CPU ISA: on AVX-512 hosts XLA:CPU appends synthetic
# "+prefer-no-scatter,+prefer-no-gather" target features to its AOT
# executables; the persistent-cache loader's host-feature check doesn't
# know them and warns — or SIGABRTs — when reloading entries THIS SAME
# machine wrote.  AVX2 codegen records no synthetic features, making the
# cache self-consistent (correctness tests don't need AVX-512 speed).
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA-CPU compiles dominate the suite's wall
# clock (train-step/MSDA tests compile for minutes); caching them across
# runs cuts repeat-suite time several-fold on this single-core image.
# The directory is keyed by a host-CPU fingerprint: cached XLA:CPU
# executables embed machine code and SIGABRT at execution time when the
# image migrates VMs between sessions (utils/jaxcache.py).
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from monosowa_tpu.utils.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(
    os.environ.get("MONOSOWA_TEST_JAX_CACHE", "/tmp/monosowa_jax_test_cache"),
    min_compile_secs=0.5)
# NOTE: do not enable jax_persistent_cache_enable_xla_caches="all" —
# shared XLA:CPU AOT kernel entries abort (SIGABRT) when the recorded
# machine features disagree with the loading process


# ---------------------------------------------------------------------------
# `slow` marker: the heaviest tests (production-scale fit accuracy,
# whole-model bf16 learning, full-model gradient flow) are opt-in so the
# default suite stays a fast gate.  Run them with RUN_SLOW=1 (the round's
# final full run does) or `-m slow`.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavyweight test, opt-in via RUN_SLOW=1 or -m slow")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_SLOW") == "1":
        return
    if config.getoption("-m", default=""):
        return      # explicit -m selection overrides the default skip
    skip = pytest.mark.skip(reason="slow; opt in with RUN_SLOW=1 or -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

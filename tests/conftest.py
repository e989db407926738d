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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

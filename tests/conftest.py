"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

This is the JAX idiom for exercising multi-device sharding without TPU
hardware; the driver separately dry-runs the multi-chip path via
``__graft_entry__.dryrun_multichip``."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may point at TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend via
# jax.config.update('jax_platforms', 'axon,cpu'), overriding the env var —
# override it back: tests are CPU-only, deterministic fp32.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

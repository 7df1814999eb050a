"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's test strategy (SURVEY.md §4): single-chip goldens +
multi-chip-on-one-host via the XLA host-platform device-count flag. Must set
env vars before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS; force the
# virtual-CPU mesh explicitly so tests never ride the single-chip tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)

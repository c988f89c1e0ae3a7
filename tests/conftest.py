"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the multi-chip test story the reference lacks (SURVEY §4): JAX's
fake-backend trick lets sharding/collective code paths execute on CPU.
XLA_FLAGS must be in the environment before backend init; the platform
override must go through jax.config (the axon TPU plugin ignores
JAX_PLATFORMS on this image).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the multi-chip test story the reference lacks (SURVEY §4): JAX's
fake-backend trick lets sharding/collective code paths execute on CPU.
Must run before the first `import jax`.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding paths are validated on a host-platform device mesh
(the JAX analogue of testing multi-node without a cluster); kernels run in
Pallas interpreter mode on CPU.  Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)

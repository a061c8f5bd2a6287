"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding paths are validated on a host-platform device mesh
(the JAX analogue of testing multi-node without a cluster); kernels run in
Pallas interpreter mode on CPU.  Must run before jax is imported anywhere.
"""

import os

# Force-override: the session environment may point JAX at a real accelerator
# (and a sitecustomize may have pre-set jax_platforms past env control);
# tests always run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)

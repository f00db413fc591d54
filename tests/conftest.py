"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; we validate sharding and
collectives on XLA's host platform with 8 virtual devices (the TPU-world
answer to testing multi-node without a cluster, see SURVEY.md section 4).
Must run before the first `import jax`.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell profile sets 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# the jaxtyping pytest plugin imports jax BEFORE this conftest runs, which
# latches jax_platforms from the original env ('axon' on this machine);
# config.update still works as long as no backend has been initialized
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no tests at all (SURVEY.md section 4); its multi-GPU logic was
only exercised via `--local_debug` single-process runs and live Azure jobs. We
instead validate multi-device sharding on fake CPU devices, the JAX-native
analogue of a fake process group. The env vars must be set before jax imports.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The image pins jax_platforms to "axon,cpu" regardless of JAX_PLATFORMS, so
# pin the config directly — tests must run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
